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

    def merge_group(g: pd.DataFrame) -> pd.DataFrame:
        ldf = g.loc[g[_SIDE] == 0, lcols]
        rdf = g.loc[g[_SIDE] == 1, rcols]
        out = ldf.sort_values(on, kind="stable").merge(
            rdf, left_on=on, right_on=right_on, how=how, sort=False
        )
        return out

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
