"""Parallel SQL handler — Solr's /sql interface (`solr/core/src/java/org/
apache/solr/handler/SQLHandler.java` + the Calcite rules in
`solr/core/src/java/org/apache/solr/handler/sql/*.java`): SQL text
compiles onto the STREAMING EXPRESSION operators, never a bespoke
executor.  Same here — the planner below maps a SQL subset onto the
repo's streamlang builders, so a /sql query runs as the identical lazy
Ray pipeline a hand-written expression would:

    SELECT a, b, agg(c) AS x   ->  rollup(..., over="a,b", x=agg(c))
    WHERE col <op> literal     ->  having(table(...), <evaluator pred>)
                                   (pushed BELOW the rollup: a per-batch
                                   vectorized mask, the Calcite
                                   filter-pushdown rule)
    ORDER BY x DESC, a ASC     ->  sort(..., by="x desc,a asc")
    LIMIT n                    ->  top(... n=...) / limit

Supported subset (rejects loudly otherwise): single table, WHERE as an
AND-chain of `col <op> literal` (op in = != <> < <= > >=) or
`col IN (lit, ...)` (expanded to an or(eq,...) chain, Calcite's IN
expansion), optional
GROUP BY with count(*)/sum/avg/min/max aggregates (aliases required,
like the reference's field-naming contract), HAVING over the aggregate
aliases (Filter-on-Aggregate, compiled to a having() ABOVE the rollup),
SELECT DISTINCT -> unique(), count(DISTINCT c) -> rollup over a
unique() pre-stream (Aggregate-over-Distinct; sole aggregate only),
ORDER BY over output columns, LIMIT, LIMIT+OFFSET pagination (Calcite
Sort.fetch/Sort.offset; OFFSET without LIMIT is rejected — an unbounded
page).  No joins (the expression language has them; the reference's SQL
join support routes through the same stream operators).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

QUERIES: dict = {}
ORACLE: dict = {}

_SQL_RE = re.compile(
    r"^\s*SELECT\s+(?P<distinct>DISTINCT\s+)?(?P<select>.+?)"
    r"\s+FROM\s+(?P<table>\w+)"
    r"(?:\s+WHERE\s+(?P<where>.+?))?"
    r"(?:\s+GROUP\s+BY\s+(?P<group>.+?))?"
    r"(?:\s+HAVING\s+(?P<having>.+?))?"
    r"(?:\s+ORDER\s+BY\s+(?P<order>.+?))?"
    r"(?:\s+LIMIT\s+(?P<limit>\d+))?"
    r"(?:\s+OFFSET\s+(?P<offset>\d+))?\s*$",
    re.I | re.S,
)
_AGG_RE = re.compile(
    r"^(count)\(\s*\*\s*\)\s+AS\s+(\w+)$|^(sum|avg|min|max)\((\w+)\)\s+AS\s+(\w+)$",
    re.I,
)
_CNT_DIST_RE = re.compile(
    r"^count\(\s*DISTINCT\s+(\w+)\s*\)\s+AS\s+(\w+)$", re.I
)
_PRED_RE = re.compile(
    r"^(\w+)\s*(=|!=|<>|<=|>=|<|>)\s*('[^']*'|[-0-9.]+)$"
)
_IN_RE = re.compile(r"^(\w+)\s+IN\s*\((.+)\)$", re.I)


def _compile_pred(part: str) -> tuple[str, str]:
    """One WHERE predicate -> (column, evaluator expression).  `col <op>
    literal` or `col IN (lit, ...)` (Calcite expands IN to an OR chain;
    same here — nested or(eq, eq, ...) over the repo's evaluators)."""
    im = _IN_RE.match(part)
    if im:
        col = im.group(1)
        items = [i.strip() for i in im.group(2).split(",")]
        eqs = []
        for lit in items:
            if not re.fullmatch(r"'[^']*'|[-0-9.]+", lit):
                raise ValueError(f"unsupported IN literal {lit!r}")
            le = lit if not lit.startswith("'") else f'"{lit[1:-1]}"'
            eqs.append(f"eq({col}, {le})")
        expr = eqs[0]
        for e in eqs[1:]:
            expr = f"or({expr}, {e})"
        return col, expr
    pm = _PRED_RE.match(part)
    if not pm:
        raise ValueError(f"unsupported WHERE predicate {part!r}")
    col, op, lit = pm.groups()
    lit_expr = lit if not lit.startswith("'") else f'"{lit[1:-1]}"'
    return col, f"{_CMP_FN[op]}({col}, {lit_expr})"
_CMP_FN = {"=": "eq", "!=": "neq", "<>": "neq", "<": "lt",
           "<=": "lteq", ">": "gt", ">=": "gteq"}


def compile_sql(sql: str, sf_dir: str, views: dict | None = None):
    """Compile the SQL subset into a lazy Ray Dataset via streamlang
    builders; returns (dataset, output column order).  `views` maps
    table names to ctx->Dataset factories (streaming views)."""
    from rindex.ops.streamlang import parse_stream_expr

    m = _SQL_RE.match(sql)
    if not m:
        raise ValueError(f"unsupported SQL shape: {sql!r}")
    table = m.group("table")

    select_items = [s.strip() for s in m.group("select").split(",")]
    group_cols = (
        [c.strip() for c in m.group("group").split(",")]
        if m.group("group") else []
    )
    plain_cols, aggs = [], {}
    cnt_dist = None  # (source_col, alias)
    for item in select_items:
        dm = _CNT_DIST_RE.match(item)
        if dm:
            if cnt_dist is not None:
                raise ValueError("at most one count(DISTINCT) per query")
            cnt_dist = (dm.group(1), dm.group(2))
            continue
        am = _AGG_RE.match(item)
        if am:
            if am.group(1):  # count(*) AS alias
                aggs[am.group(2)] = "count(*)"
            else:
                aggs[am.group(5)] = f"{am.group(3).lower()}({am.group(4)})"
        elif re.fullmatch(r"\w+", item):
            plain_cols.append(item)
        else:
            raise ValueError(
                f"unsupported SELECT item {item!r} (aggregates need AS)"
            )
    if cnt_dist is not None and aggs:
        # the distinct-stream rewrite below dedups the input, which would
        # corrupt sibling row-level aggregates — the reference's planner
        # has the same single-distinct-aggregate restriction
        raise ValueError(
            "count(DISTINCT) cannot mix with other aggregates"
        )
    if m.group("distinct") and (aggs or cnt_dist):
        raise ValueError("SELECT DISTINCT cannot take aggregates")
    if (aggs or cnt_dist) and sorted(plain_cols) != sorted(group_cols):
        raise ValueError("non-aggregated SELECT columns must = GROUP BY")

    # source with column pruning
    need = set(plain_cols) | set(group_cols)
    for expr in aggs.values():
        cm = re.match(r"\w+\((\w+)\)", expr)
        if cm and cm.group(1) != "*":
            need.add(cm.group(1))
    preds = []
    if m.group("where"):
        for part in re.split(r"\s+AND\s+", m.group("where"), flags=re.I):
            col, expr_p = _compile_pred(part.strip())
            need.add(col)
            preds.append(expr_p)

    if cnt_dist is not None:
        need.add(cnt_dist[0])
    expr = f'table({table}, fl="{",".join(sorted(need))}")'
    for p in preds:  # filter pushdown below the rollup
        expr = f"having({expr}, {p})"
    if cnt_dist is not None:
        # count(DISTINCT c) GROUP BY g  ->  rollup(unique(s, over="g,c"),
        # over="g", alias=count(*))  — dedup first, then count rows
        # (Calcite's Aggregate-over-Distinct expansion)
        dcols = ",".join([*group_cols, cnt_dist[0]])
        expr = f'unique({expr}, over="{dcols}")'
        aggs = {cnt_dist[1]: "count(*)"}
    if m.group("distinct"):
        expr = f'unique({expr}, over="{",".join(plain_cols)}")'
    if aggs:
        metrics = ", ".join(f"{a}={e}" for a, e in aggs.items())
        if group_cols:
            expr = f'rollup({expr}, over="{",".join(group_cols)}", {metrics})'
        else:
            # global aggregate: SQLHandler plans it as a one-bucket rollup
            # (Calcite's Aggregate with no group key) — synthesize a
            # constant key, then strip it
            expr = f"select({expr}, _g=1)"
            expr = f'rollup({expr}, over="_g", {metrics})'
            expr = f'select({expr}, keep="{",".join(aggs)}")'
    elif plain_cols:
        expr = f'select({expr}, keep="{",".join(plain_cols)}")'
    if m.group("having"):
        # HAVING: the same predicate compiler, applied ABOVE the rollup
        # over aggregate aliases (Calcite's Filter-on-Aggregate rule)
        if not aggs:
            raise ValueError("HAVING requires GROUP BY aggregates")
        for part in re.split(r"\s+AND\s+", m.group("having"), flags=re.I):
            pm = _PRED_RE.match(part.strip())
            if not pm:
                raise ValueError(f"unsupported HAVING predicate {part!r}")
            col, op, lit = pm.groups()
            if col not in aggs and col not in group_cols:
                raise ValueError(
                    f"HAVING column {col!r} is not an output column"
                )
            lit_expr = lit if not lit.startswith("'") else f'"{lit[1:-1]}"'
            expr = f"having({expr}, {_CMP_FN[op]}({col}, {lit_expr}))"
    if m.group("order"):
        expr = f'sort({expr}, by="{m.group("order").strip()}")'
    node = parse_stream_expr(expr)
    from rindex.ops.streamlang import _build

    ds = _build(node, {"sf_dir": sf_dir, "views": views})
    if m.group("offset"):
        # Calcite LIMIT/OFFSET pagination: pull limit+offset rows of the
        # sorted stream, drop the first offset on the driver — the page
        # is small BY CONTRACT (OFFSET without LIMIT is the unbounded
        # materialization the engine refuses, same as the reference's
        # cursorMark guidance)
        if not m.group("limit"):
            raise ValueError("OFFSET requires LIMIT (bounded page)")
        import ray.data as rd

        off, lim = int(m.group("offset")), int(m.group("limit"))
        page = ds.limit(lim + off).to_pandas().iloc[off:]
        return (
            rd.from_pandas(page.reset_index(drop=True)),
            plain_cols + list(aggs),
        )
    if m.group("limit"):
        ds = ds.limit(int(m.group("limit")))
    return ds, plain_cols + list(aggs)


SQL_TEXT = (
    "SELECT c_mktsegment, o_orderpriority, count(*) AS n, "
    "min(o_totalprice) AS lo, max(o_totalprice) AS hi "
    "FROM orders_seg "
    "WHERE o_totalprice > 150000 AND o_orderstatus = 'O' "
    "GROUP BY c_mktsegment, o_orderpriority "
    "ORDER BY n DESC, c_mktsegment ASC, o_orderpriority ASC "
    "LIMIT 12"
)


def q_sql_handler_orders(sf_dir: str):
    """/sql end-to-end: the SQL string compiles onto streamlang
    (having-pushdown -> rollup -> sort -> limit, ONE lazy pipeline).
    The source 'table' is itself a streamlang-resolved view — here a
    pre-joined orders+customer table registered as orders_seg through
    the thread-safe ctx view registry, the way the reference's SQL
    collections are streaming views too."""

    def orders_seg(ctx):
        from rindex.ops.streamlang import _build, parse_stream_expr

        inner = parse_stream_expr(
            'hashJoin(table(orders, fl="o_custkey,o_totalprice,'
            'o_orderstatus,o_orderpriority"),'
            ' table(customer, fl="c_custkey,c_mktsegment"),'
            ' on="o_custkey=c_custkey")'
        )
        return _build(inner, ctx)

    ds, _cols = compile_sql(SQL_TEXT, sf_dir, views={"orders_seg": orders_seg})
    out = ds.to_pandas()
    return out.reset_index(drop=True)


QUERIES["sql_handler_orders"] = q_sql_handler_orders
ORACLE["sql_handler_orders"] = """
    SELECT c_mktsegment, o_orderpriority, count(*) AS n,
           min(o_totalprice) AS lo, max(o_totalprice) AS hi
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE o_totalprice > 150000 AND o_orderstatus = 'O'
    GROUP BY c_mktsegment, o_orderpriority
    ORDER BY n DESC, c_mktsegment ASC, o_orderpriority ASC
    LIMIT 12
"""


SQL_HAVING_TEXT = (
    "SELECT o_orderpriority, count(*) AS n, sum(o_totalprice) AS tot "
    "FROM orders "
    "GROUP BY o_orderpriority "
    "HAVING n > 100 "
    "ORDER BY tot DESC, o_orderpriority ASC"
)


def q_sql_handler_having_orders(sf_dir: str):
    """/sql with HAVING: the post-aggregation filter compiles to a
    having() stream ABOVE the rollup (Calcite Filter-on-Aggregate), the
    WHERE-pushdown path stays below — one lazy pipeline either way.
    Sum column rounded 2dp for the float-sum discipline."""
    ds, _cols = compile_sql(SQL_HAVING_TEXT, sf_dir)
    out = ds.to_pandas().reset_index(drop=True)
    out["tot"] = out["tot"].round(2)
    return out


QUERIES["sql_handler_having_orders"] = q_sql_handler_having_orders
ORACLE["sql_handler_having_orders"] = """
    SELECT o_orderpriority, count(*)::BIGINT AS n,
           round(sum(o_totalprice::DOUBLE), 2) AS tot
    FROM orders
    GROUP BY o_orderpriority
    HAVING count(*) > 100
    ORDER BY round(sum(o_totalprice::DOUBLE), 2) DESC, o_orderpriority ASC
"""


SQL_DISTINCT_TEXT = (
    "SELECT DISTINCT o_orderpriority, o_orderstatus FROM orders "
    "ORDER BY o_orderpriority ASC, o_orderstatus ASC"
)
SQL_CNT_DIST_TEXT = (
    "SELECT o_orderstatus, count(DISTINCT o_orderpriority) AS np "
    "FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus ASC"
)


def q_sql_handler_distinct_orders(sf_dir: str):
    """/sql SELECT DISTINCT -> unique() stream; and count(DISTINCT c)
    -> rollup over a unique() pre-stream (Calcite's
    Aggregate-over-Distinct expansion).  Both compile onto the same lazy
    streamlang pipeline; outputs concatenated long-form (which, value)."""
    d1, _ = compile_sql(SQL_DISTINCT_TEXT, sf_dir)
    d2, _ = compile_sql(SQL_CNT_DIST_TEXT, sf_dir)
    a = d1.to_pandas().reset_index(drop=True)
    b = d2.to_pandas().reset_index(drop=True)
    a["which"] = "distinct"
    a = a.rename(columns={"o_orderpriority": "k1", "o_orderstatus": "k2"})
    a["np"] = np.int64(0)
    b["which"] = "count_distinct"
    b = b.rename(columns={"o_orderstatus": "k1"})
    b["k2"] = ""
    b["np"] = b["np"].astype(np.int64)
    cols = ["which", "k1", "k2", "np"]
    return pd.concat([a[cols], b[cols]], ignore_index=True)


QUERIES["sql_handler_distinct_orders"] = q_sql_handler_distinct_orders
ORACLE["sql_handler_distinct_orders"] = """
    SELECT 'distinct' AS which, o_orderpriority AS k1,
           o_orderstatus AS k2, 0::BIGINT AS np
    FROM (SELECT DISTINCT o_orderpriority, o_orderstatus FROM orders)
    UNION ALL
    SELECT 'count_distinct', o_orderstatus, '',
           count(DISTINCT o_orderpriority)::BIGINT
    FROM orders GROUP BY o_orderstatus
"""


SQL_OFFSET_TEXT = (
    "SELECT o_orderpriority, count(*) AS n, sum(o_totalprice) AS tot "
    "FROM orders GROUP BY o_orderpriority "
    "ORDER BY o_orderpriority ASC LIMIT 2 OFFSET 2"
)


def q_sql_handler_offset_orders(sf_dir: str):
    """/sql pagination: LIMIT 2 OFFSET 2 over the sorted rollup (Calcite
    Sort.fetch/Sort.offset) — page rows 3-4 of the 5 priorities."""
    ds, _cols = compile_sql(SQL_OFFSET_TEXT, sf_dir)
    out = ds.to_pandas().reset_index(drop=True)
    out["tot"] = out["tot"].round(2)
    return out


QUERIES["sql_handler_offset_orders"] = q_sql_handler_offset_orders
ORACLE["sql_handler_offset_orders"] = """
    SELECT o_orderpriority, count(*)::BIGINT AS n,
           round(sum(o_totalprice::DOUBLE), 2) AS tot
    FROM orders GROUP BY o_orderpriority
    ORDER BY o_orderpriority ASC LIMIT 2 OFFSET 2
"""


SQL_IN_TEXT = (
    "SELECT o_orderstatus, count(*) AS n, avg(o_totalprice) AS avg_price "
    "FROM orders "
    "WHERE o_orderpriority IN ('1-URGENT', '2-HIGH') AND o_totalprice > 50000 "
    "GROUP BY o_orderstatus ORDER BY o_orderstatus ASC"
)


def q_sql_handler_in_orders(sf_dir: str):
    """/sql WHERE ... IN (...): the IN list compiles to an or(eq,eq)
    chain pushed below the rollup like every other predicate (Calcite's
    IN expansion)."""
    ds, _cols = compile_sql(SQL_IN_TEXT, sf_dir)
    out = ds.to_pandas().reset_index(drop=True)
    out["avg_price"] = out["avg_price"].round(4)
    return out.sort_values("o_orderstatus").reset_index(drop=True)


QUERIES["sql_handler_in_orders"] = q_sql_handler_in_orders
ORACLE["sql_handler_in_orders"] = """
    SELECT o_orderstatus, count(*)::BIGINT AS n,
           round(avg(o_totalprice::DOUBLE), 4) AS avg_price
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH') AND o_totalprice > 50000
    GROUP BY o_orderstatus ORDER BY o_orderstatus ASC
"""
