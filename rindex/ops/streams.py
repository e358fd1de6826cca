"""Sorted-stream merge join (SURVEY.md §2.4: innerJoin / leftOuterJoin).

Re-expresses the reference's streaming merge joins
(`solr/solrj/src/java/org/apache/solr/client/solrj/io/stream/
{InnerJoinStream,LeftOuterJoinStream}.java`): two streams ALREADY sorted on
the join key are merged without a hash-partition + re-sort round trip.

Ray shape (one all-to-all instead of hash-join's shuffle PLUS a sort):
  1. sample ~64 keys per block of the left stream (small take: blocks x 64
     rows on the driver) and derive `num_partitions - 1` range boundaries;
  2. tag both sides with the range-partition id via np.searchsorted
     (map_batches, vectorized; the per-batch sortedness of each input is
     asserted — the reference throws on unsorted streams too);
  3. union the schema-aligned sides and co-locate each key range with ONE
     groupby(partition id) — matching keys land in the same group by
     construction, and Ray's groupby emits groups in partition-id order,
     so the merged output stays globally key-sorted (the /export contract
     downstream reducers rely on);
  4. inside each group the two sorted runs are paired with pandas' merge
     kernel (vectorized, local).

Skew note: ranges are value-based, so one hot KEY still lands in one
partition — same as the reference's single-threaded merge; unlike a hash
join the co-partitioning preserves order, which is the point of this
operator.  At 100 TB the boundary sample is the only driver-side state
(#partitions x 64 keys).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from rindex.ops.util import read_table

QUERIES: dict = {}
ORACLE: dict = {}

_SIDE, _PART = "_mj_side", "_mj_part"


def _arrow_schema(ds) -> pa.Schema:
    """Dataset schema as a pyarrow.Schema regardless of block format
    (parquet reads carry pa.Schema; from_pandas carries PandasBlockSchema)."""
    s = ds.schema()
    base = getattr(s, "base_schema", None)
    if isinstance(base, pa.Schema):
        return base
    fields = []
    for name, typ in zip(s.names, s.types):
        if isinstance(typ, pa.DataType):
            fields.append(pa.field(name, typ))
        else:  # numpy dtype from a pandas block
            import numpy as _np

            typ = _np.dtype(typ)
            fields.append(
                pa.field(
                    name,
                    pa.string() if typ == _np.dtype("O")
                    else pa.from_numpy_dtype(typ),
                )
            )
    return pa.schema(fields)


def _boundaries(ds, on: str, num_partitions: int) -> np.ndarray:
    """Range boundaries from a bounded per-block key sample (<= 64 keys per
    block reach the driver — the same sample-based splitting Ray's own sort
    uses internally)."""

    def sample(t: pa.Table) -> pa.Table:
        keys = t[on].combine_chunks()
        if len(t) == 0:
            return pa.table({on: keys})
        idx = np.unique(np.linspace(0, len(t) - 1, 64).astype(np.int64))
        return pa.table({on: keys.take(pa.array(idx))})

    ks = np.sort(
        ds.select_columns([on])
        .map_batches(sample, batch_format="pyarrow")
        .to_pandas()[on]
        .to_numpy()
    )
    if len(ks) == 0:
        # empty sampled side: one partition, no boundaries (ks[qs] on an
        # empty array would IndexError instead of producing an empty join)
        return np.empty(0, dtype=np.int64)
    qs = np.linspace(0, len(ks) - 1, num_partitions + 1)[1:-1].astype(np.int64)
    return np.unique(ks[qs])


def _tag(bounds: np.ndarray, on: str, side: int):
    """Append the range-partition id + side tag; assert within-batch
    sortedness (InnerJoinStream's 'streams must be sorted on the join
    key' contract — fail loud, not wrong)."""

    def f(t: pa.Table) -> pa.Table:
        keys = t[on].to_numpy(zero_copy_only=False)
        if len(keys) > 1 and np.any(keys[1:] < keys[:-1]):
            raise ValueError(
                f"merge_join: input side {side} is not sorted on {on!r}"
            )
        part = np.searchsorted(bounds, keys, side="right").astype(np.int32)
        return t.append_column(_PART, pa.array(part)).append_column(
            _SIDE, pa.array(np.full(len(t), side, dtype=np.int8))
        )

    return f


def merge_join(
    left,
    right,
    on: str,
    right_on: str | None = None,
    how: str = "inner",
    num_partitions: int = 16,
):
    """Merge-join two key-sorted Datasets; returns a Dataset of joined rows
    in key order.  `how` in {"inner", "left"}."""
    right_on = right_on or on
    lschema, rschema = _arrow_schema(left), _arrow_schema(right)
    lcols, rcols = lschema.names, rschema.names
    dup = set(lcols) & set(rcols)
    if dup:
        raise ValueError(f"merge_join: overlapping column names {dup}")
    bounds = _boundaries(left, on, num_partitions)

    def align(cols_other, schema_other):
        # union both sides under one schema: the other side's columns ride
        # along as typed nulls (no object fallback)
        def f(t: pa.Table) -> pa.Table:
            n = len(t)
            for name in cols_other:
                t = t.append_column(
                    name, pa.nulls(n, schema_other.field(name).type)
                )
            return t

        return f

    ltag = left.map_batches(
        _tag(bounds, on, 0), batch_format="pyarrow"
    ).map_batches(align(rcols, rschema), batch_format="pyarrow")
    rtag = right.map_batches(
        _tag(bounds, right_on, 1), batch_format="pyarrow"
    ).map_batches(align(lcols, lschema), batch_format="pyarrow")
    # keep column order identical so union's schema check passes
    order = lcols + rcols + [_PART, _SIDE]
    ltag = ltag.select_columns(order)
    rtag = rtag.select_columns(order)

    # own-side dtypes: the union pads each side with typed nulls, and a
    # padded int64 column surfaces in pandas as float64+NaN for the WHOLE
    # group — cast each side's own columns back before merging (the real
    # values are NaN-free, so the downcast is exact; genuinely-null input
    # keys fail loudly in astype rather than joining as floats)
    ldt = lschema.empty_table().to_pandas().dtypes.to_dict()
    rdt = rschema.empty_table().to_pandas().dtypes.to_dict()

    def merge_group(g: pd.DataFrame) -> pd.DataFrame:
        ldf = g.loc[g[_SIDE] == 0, lcols].astype(ldt)
        rdf = g.loc[g[_SIDE] == 1, rcols].astype(rdt)
        out = ldf.sort_values(on, kind="stable").merge(
            rdf, left_on=on, right_on=right_on, how=how, sort=False
        )
        return out

    return (
        ltag.union(rtag)
        .groupby(_PART)
        .map_groups(merge_group, batch_format="pandas")
    )


def hash_outer_join(
    left,
    right,
    on: str,
    right_on: str | None = None,
    how: str = "left",
    num_buckets: int = 64,
):
    """Hash-bucketed join via union + groupby + per-bucket pandas merge —
    the OuterHashJoinStream family (`solr/solrj/.../io/stream/
    OuterHashJoinStream.java` is the LEFT variant; `how` in {"inner",
    "left", "right", "outer"}).

    Why not `Dataset.join`: Ray 2.49's hash-shuffle join aggregator builds
    a 0-column table for a partition that received NO shards from one side
    (e.g. a sparse filtered left against a dense right) and the Acero join
    then dies on the missing key field.  Bucketing by key hash into a
    groupby sidesteps that: groups only exist where keys exist, and a
    one-sided group is exactly the unmatched-row case pandas' merge
    handles.  Same single all-to-all cost as a hash join; no sortedness
    contract (unlike merge_join)."""
    right_on = right_on or on
    lschema, rschema = _arrow_schema(left), _arrow_schema(right)
    lcols, rcols = lschema.names, rschema.names
    dup = set(lcols) & set(rcols)
    if dup:
        raise ValueError(f"hash_outer_join: overlapping column names {dup}")

    def tag(key: str, side: int):
        def f(t: pa.Table) -> pa.Table:
            keys = t[key].to_numpy(zero_copy_only=False)
            part = (pd.util.hash_array(keys) % num_buckets).astype(np.int32)
            return t.append_column(_PART, pa.array(part)).append_column(
                _SIDE, pa.array(np.full(len(t), side, dtype=np.int8))
            )

        return f

    def align(cols_other, schema_other):
        def f(t: pa.Table) -> pa.Table:
            n = len(t)
            for name in cols_other:
                t = t.append_column(
                    name, pa.nulls(n, schema_other.field(name).type)
                )
            return t

        return f

    ltag = left.map_batches(tag(on, 0), batch_format="pyarrow").map_batches(
        align(rcols, rschema), batch_format="pyarrow"
    )
    rtag = right.map_batches(
        tag(right_on, 1), batch_format="pyarrow"
    ).map_batches(align(lcols, lschema), batch_format="pyarrow")
    order = lcols + rcols + [_PART, _SIDE]
    ltag = ltag.select_columns(order)
    rtag = rtag.select_columns(order)

    # see merge_join: cast each side's own columns back to their dtypes —
    # the typed-null union padding promotes them for the whole group
    ldt = lschema.empty_table().to_pandas().dtypes.to_dict()
    rdt = rschema.empty_table().to_pandas().dtypes.to_dict()
    # one FIXED Arrow output schema: pandas merge promotes unmatched int
    # columns to float64+NaN per group (so per-group schemas would
    # diverge), and a 0-row pandas return would survive as a pandas block
    # (Ray skips UDFs on empty blocks) poisoning Arrow-block downstream
    # ops — from_pandas(schema=) restores typed NULLS instead
    out_schema = pa.schema(
        [lschema.field(c) for c in lcols] + [rschema.field(c) for c in rcols]
    )

    def merge_group(g: pd.DataFrame) -> pa.Table:
        ldf = g.loc[g[_SIDE] == 0, lcols].astype(ldt)
        rdf = g.loc[g[_SIDE] == 1, rcols].astype(rdt)
        out = ldf.merge(
            rdf, left_on=on, right_on=right_on, how=how, sort=False
        )
        return pa.Table.from_pandas(out, schema=out_schema,
                                    preserve_index=False)

    return (
        ltag.union(rtag)
        .groupby(_PART)
        .map_groups(merge_group, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# Registered queries
# ---------------------------------------------------------------------------

def q_merge_join_orders_customers(sf_dir: str):
    """innerJoin(): orders and customer streams sorted on custkey (the
    /export handler shape), merge-joined without re-sort; one market
    segment selected post-join, output in (o_custkey, o_orderkey) order."""
    orders = read_table(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"]
    ).sort("o_custkey")
    cust = read_table(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).sort(
        "c_custkey"
    )
    joined = merge_join(orders, cust, on="o_custkey", right_on="c_custkey")
    out = joined.filter(expr="c_mktsegment == 'BUILDING'").to_pandas()
    out["o_totalprice"] = out["o_totalprice"].round(2)
    return out[
        ["o_custkey", "o_orderkey", "o_totalprice", "c_mktsegment"]
    ].sort_values(["o_custkey", "o_orderkey"]).reset_index(drop=True)


QUERIES["merge_join_orders_customers"] = q_merge_join_orders_customers
ORACLE["merge_join_orders_customers"] = """
    SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS o_totalprice,
           c_mktsegment
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment = 'BUILDING'
    ORDER BY o_custkey, o_orderkey
"""


def q_merge_left_outer_customer_orders(sf_dir: str):
    """leftOuterJoin(): every customer kept, order count (0 for customers
    with no orders) — the LeftOuterJoinStream contract that inner join
    can't express."""
    cust = read_table(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).sort(
        "c_custkey"
    )
    orders = read_table(sf_dir, "orders", ["o_orderkey", "o_custkey"]).sort(
        "o_custkey"
    )
    joined = merge_join(cust, orders, on="c_custkey", right_on="o_custkey", how="left")

    def add_hit(df: pd.DataFrame) -> pd.DataFrame:
        df["_hit"] = df["o_orderkey"].notna().astype(np.int64)
        return df

    from ray.data.aggregate import Sum

    out = (
        joined.map_batches(add_hit, batch_format="pandas")
        .groupby("c_custkey")
        .aggregate(Sum("_hit", alias_name="n_orders"))
        .to_pandas()
    )
    return out.sort_values("c_custkey").reset_index(drop=True)


QUERIES["merge_left_outer_customer_orders"] = q_merge_left_outer_customer_orders
ORACLE["merge_left_outer_customer_orders"] = """
    SELECT c_custkey, count(o_orderkey) AS n_orders
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    ORDER BY c_custkey
"""


# ---------------------------------------------------------------------------
# Outer HASH joins — OuterHashJoinStream + the right/full variants
# ---------------------------------------------------------------------------

def q_outer_hash_join_customer_orders(sf_dir: str):
    """outerHashJoin(): LEFT OUTER hash join (reference:
    `solr/solrj/.../io/stream/OuterHashJoinStream.java` — every left tuple
    survives; matched tuples gain the right stream's fields).  Ray shape:
    hash-bucketed `hash_outer_join` (one all-to-all, no sortedness
    contract — see its docstring for why not the native Dataset.join).
    Output restricted to a small high-balance customer slice so the row
    payload stays bounded; unmatched right fields surface as the
    reference's null tuple values (coalesced to -1 on BOTH sides for the
    exact integer compare)."""
    cust = read_table(sf_dir, "customer", ["c_custkey", "c_acctbal"]).filter(
        expr="c_acctbal > 9900.0"
    ).map_batches(lambda t: t.select(["c_custkey"]), batch_format="pyarrow")
    big = read_table(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"]).map_batches(
        lambda t: t.filter(
            pc.greater(t["o_totalprice"], pa.scalar(250000.0))
        ).select(["o_orderkey", "o_custkey"]),
        batch_format="pyarrow",
    )
    joined = hash_outer_join(cust, big, on="c_custkey", right_on="o_custkey",
                             how="left")

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "c_custkey": df["c_custkey"].astype(np.int64),
                "o_orderkey": df["o_orderkey"].fillna(-1).astype(np.int64),
            }
        )

    out = joined.map_batches(finish, batch_format="pandas").to_pandas()
    return out.sort_values(["c_custkey", "o_orderkey"]).reset_index(drop=True)


QUERIES["outer_hash_join_customer_orders"] = q_outer_hash_join_customer_orders
ORACLE["outer_hash_join_customer_orders"] = """
    SELECT c_custkey, coalesce(o_orderkey, -1) AS o_orderkey
    FROM (SELECT c_custkey FROM customer WHERE c_acctbal > 9900.0) c
    LEFT JOIN (SELECT o_orderkey, o_custkey FROM orders
               WHERE o_totalprice > 250000.0) o
      ON c_custkey = o_custkey
    ORDER BY c_custkey, o_orderkey
"""


def q_full_outer_join_customer_orders(sf_dir: str):
    """FULL OUTER hash join — the reference composes it from two
    outerHashJoin passes; `hash_outer_join(how="outer")` does it in one
    shuffle.  Both inputs are disjoint-heavy slices (high-balance
    customers vs big-ticket orders) so all three match classes
    (left-only / right-only / both) are populated; the output is the
    per-key match indicator pair, integer-exact."""
    cust = read_table(sf_dir, "customer", ["c_custkey", "c_acctbal"]).filter(
        expr="c_acctbal > 9000.0"
    ).map_batches(
        lambda t: t.select(["c_custkey"]), batch_format="pyarrow"
    )
    big = read_table(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"]
    ).map_batches(
        lambda t: t.filter(
            pc.greater(t["o_totalprice"], pa.scalar(250000.0))
        ).select(["o_orderkey", "o_custkey"]),
        batch_format="pyarrow",
    )
    joined = hash_outer_join(cust, big, on="c_custkey", right_on="o_custkey",
                             how="outer")

    def indic(df: pd.DataFrame) -> pd.DataFrame:
        ck = df["c_custkey"]
        return pd.DataFrame(
            {
                "custkey": ck.fillna(df["o_custkey"]).astype(np.int64),
                "has_cust": ck.notna().astype(np.int64),
                "has_order": df["o_orderkey"].notna().astype(np.int64),
            }
        )

    from ray.data.aggregate import Max, Sum

    out = (
        joined.map_batches(indic, batch_format="pandas")
        .groupby("custkey")
        .aggregate(
            Max("has_cust", alias_name="has_cust"),
            Sum("has_order", alias_name="n_orders"),
        )
        .to_pandas()
    )
    out["n_orders"] = out["n_orders"].astype(np.int64)
    out["has_cust"] = out["has_cust"].astype(np.int64)
    return out.sort_values("custkey").reset_index(drop=True)


QUERIES["full_outer_join_customer_orders"] = q_full_outer_join_customer_orders
ORACLE["full_outer_join_customer_orders"] = """
    SELECT coalesce(c.c_custkey, o.o_custkey) AS custkey,
           max(CASE WHEN c.c_custkey IS NULL THEN 0 ELSE 1 END)::BIGINT
             AS has_cust,
           sum(CASE WHEN o.o_orderkey IS NULL THEN 0 ELSE 1 END)::BIGINT
             AS n_orders
    FROM (SELECT c_custkey FROM customer WHERE c_acctbal > 9000.0) c
    FULL OUTER JOIN (SELECT o_orderkey, o_custkey FROM orders
                     WHERE o_totalprice > 250000.0) o
      ON c.c_custkey = o.o_custkey
    GROUP BY 1
    ORDER BY 1
"""


# ---------------------------------------------------------------------------
# having() — HavingStream
# ---------------------------------------------------------------------------

def having(ds, expr: str):
    """HavingStream analog (`solr/solrj/src/java/org/apache/solr/client/
    solrj/io/stream/HavingStream.java`): keep tuples where a BOOLEAN
    evaluator expression is true.  The predicate is compiled once by the
    evaluator-expression parser and applied per batch as a vectorized
    mask — the same whole-array kernels Solr's boolean evaluators map to,
    streaming with no materialization."""
    from rindex.ops.evaluators import eval_node, parse_expr

    # a pre-parsed evaluator node is accepted too (the streaming-expression
    # compiler hands having() its already-parsed predicate sub-tree)
    ast = parse_expr(expr) if isinstance(expr, str) else expr

    def _filter(b: pa.Table) -> pa.Table:
        cols = {n: b[n].combine_chunks() for n in b.schema.names}
        mask = np.asarray(eval_node(ast, cols), dtype=bool)
        return b.filter(pa.array(mask))

    return ds.map_batches(_filter, batch_format="pyarrow", zero_copy_batch=True)


HAVING_MIN_EVENTS = 67


def q_having_rollup_events(sf_dir: str):
    """having(rollup(events over user_id), gt(n, 67)): grouped count+sum
    followed by the evaluator-predicate filter on the AGGREGATE row —
    the classic post-rollup HAVING shape.  The rollup shuffles only
    (user_id, partial) rows; having() streams over the tiny aggregate."""
    from ray.data.aggregate import Count, Sum

    ev = read_table(sf_dir, "events", ["user_id", "value"])
    agg = ev.groupby("user_id").aggregate(
        Count(alias_name="n"), Sum("value", alias_name="sum_value")
    )
    out = having(agg, f"gt(n, {HAVING_MIN_EVENTS})").to_pandas()
    out["sum_value"] = out["sum_value"].round(6)
    return out.sort_values("user_id").reset_index(drop=True)


QUERIES["having_rollup_events"] = q_having_rollup_events
ORACLE["having_rollup_events"] = f"""
    SELECT user_id, count(*) AS n, round(sum(value), 6) AS sum_value
    FROM events
    GROUP BY user_id
    HAVING count(*) > {HAVING_MIN_EVENTS}
    ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# cartesianProduct() — CartesianProductStream
# ---------------------------------------------------------------------------

def cartesian_product(ds, list_col: str, value_col: str, idx_col: str = "idx"):
    """CartesianProductStream analog (`solr/solrj/src/java/org/apache/
    solr/client/solrj/io/stream/CartesianProductStream.java`): one output
    tuple per element of a multi-valued field, scalar fields replicated.
    Vectorized per batch: list_flatten for the values, np.repeat over the
    list lengths for the scalar columns, and a concatenated-arange for the
    within-list ordinal (Solr preserves value order the same way)."""

    def _explode(b: pa.Table) -> pa.Table:
        lst = b[list_col].combine_chunks()
        # null / empty lists emit no tuples (CartesianProductStream skips
        # tuples without the field)
        lens = pc.fill_null(pc.list_value_length(lst), 0).to_numpy().astype(np.int64)
        total = int(lens.sum())
        # ordinal within each list: arange(total) minus each row's start
        starts = np.repeat(np.cumsum(lens) - lens, lens)
        idx = np.arange(total, dtype=np.int64) - starts
        cols: dict = {}
        for n in b.schema.names:
            if n == list_col:
                continue
            cols[n] = pa.array(np.repeat(b[n].combine_chunks().to_numpy(
                zero_copy_only=False), lens))
        cols[idx_col] = pa.array(idx)
        cols[value_col] = pc.list_flatten(lst)
        return pa.table(cols)

    return ds.map_batches(_explode, batch_format="pyarrow", zero_copy_batch=True)


CARTESIAN_MAX_VEC = 8


def q_cartesian_product_embeddings(sf_dir: str):
    """cartesianProduct(search(embeddings, vec_id < 8), embedding):
    explode the list<float> embedding column into (vec_id, idx, val)
    tuples — the multi-valued-field-to-stream shape Solr uses to feed
    per-value downstream decorators."""
    emb = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
    emb = emb.filter(expr=f"vec_id < {CARTESIAN_MAX_VEC}")
    out = cartesian_product(emb, "embedding", "val").to_pandas()
    out["val"] = out["val"].astype(np.float64).round(6)
    return out.sort_values(["vec_id", "idx"]).reset_index(drop=True)


QUERIES["cartesian_product_embeddings"] = q_cartesian_product_embeddings
ORACLE["cartesian_product_embeddings"] = f"""
    SELECT vec_id,
           unnest(range(len(embedding))) AS idx,
           round(unnest(embedding)::DOUBLE, 6) AS val
    FROM embeddings
    WHERE vec_id < {CARTESIAN_MAX_VEC}
    ORDER BY vec_id, idx
"""
