"""Stream evaluators (SURVEY.md §2.8): the scalar evaluator surface of the
reference's streaming expressions, vectorized over Arrow batches.

Reference: `solr/solrj/src/java/org/apache/solr/client/solrj/io/eval/*.java`
(AddEvaluator, IfThenElseEvaluator, ArcTangentEvaluator, ...) wired through
`Lang.java`'s function registry; `SelectStream.java` applies them per tuple.
Here each evaluator is a numpy / pyarrow.compute kernel applied per BATCH
(never per row), and `select_eval()` is the SelectStream analog: a
map_batches stage computing new columns from parsed expression strings.

Expression syntax (the streaming-expression scalar subset):

    round(mult(l_extendedprice, sub(1, l_discount)), 2)
    if(gt(l_quantity, 25), "big", "small")

identifiers = column refs, numbers = literals, double-quoted = string
literals, `name(...)` = evaluator call.  Unknown evaluators and columns
fail loudly at parse/eval time.

The matrix/ML evaluator families (~100 of the reference's ~150) are out of
scope per SURVEY.md §2.8 — the registry below is the extension hook.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from rindex.ops.util import read_table

QUERIES: dict = {}
ORACLE: dict = {}


# ---------------------------------------------------------------------------
# Expression parser (tiny recursive-descent; no eval())
# ---------------------------------------------------------------------------

_TOKEN = re.compile(
    r"""\s*(?:
        (?P<num>-?\d+\.?\d*(?:[eE][+-]?\d+)?) |
        (?P<str>"[^"]*") |
        (?P<ident>[A-Za-z_][A-Za-z0-9_]*) |
        (?P<punct>[(),])
    )""",
    re.X,
)


def parse_expr(s: str):
    """Parse an evaluator expression into ('call',name,args) / ('col',name)
    / ('lit',value) nodes."""
    toks = []
    pos = 0
    while pos < len(s):
        m = _TOKEN.match(s, pos)
        if not m or m.end() == pos:
            if s[pos:].strip():
                raise ValueError(f"bad token at {s[pos:]!r} in {s!r}")
            break
        pos = m.end()
        kind = m.lastgroup
        toks.append((kind, m.group(kind)))

    def parse(i):
        kind, val = toks[i]
        if kind == "num":
            return ("lit", float(val) if "." in val or "e" in val.lower() else int(val)), i + 1
        if kind == "str":
            return ("lit", val[1:-1]), i + 1
        if kind == "ident":
            if i + 1 < len(toks) and toks[i + 1] == ("punct", "("):
                name, args, j = val, [], i + 2
                if toks[j] == ("punct", ")"):
                    return ("call", name, args), j + 1
                while True:
                    node, j = parse(j)
                    args.append(node)
                    if toks[j] == ("punct", ")"):
                        return ("call", name, args), j + 1
                    if toks[j] != ("punct", ","):
                        raise ValueError(f"expected ',' or ')' in {s!r}")
                    j += 1
            return ("col", val), i + 1
        raise ValueError(f"unexpected {val!r} in {s!r}")

    try:
        node, end = parse(0)
    except IndexError:
        raise ValueError(f"unexpected end of expression in {s!r}") from None
    if end != len(toks):
        raise ValueError(f"trailing tokens in {s!r}")
    return node


# ---------------------------------------------------------------------------
# Evaluator registry — every kernel is whole-array numpy / Arrow compute
# ---------------------------------------------------------------------------

def _variadic(fn):
    def g(*xs):
        acc = xs[0]
        for x in xs[1:]:
            acc = fn(acc, x)
        return acc

    return g


def _if(cond, a, b):
    return np.where(np.asarray(cond, dtype=bool), a, b)


def _str_arr(x):
    # normalize scalars / numpy arrays to an Arrow string array for pc kernels
    if isinstance(x, pa.ChunkedArray):
        return x.combine_chunks()
    if isinstance(x, pa.Array):
        return x
    if isinstance(x, np.ndarray):
        return pa.array(x)
    return x  # python scalar


def _concat(*xs):
    # str is sized too — a literal longer than the batch's row count must
    # NOT win the length vote (it is broadcast, not element-wise)
    n = max(
        (len(x) for x in xs if hasattr(x, "__len__") and not isinstance(x, str)),
        default=1,
    )
    arrs = []
    for x in xs:
        if hasattr(x, "__len__") and not isinstance(x, str):
            a = _str_arr(x)
            if not pa.types.is_string(a.type) and not pa.types.is_large_string(a.type):
                a = pc.cast(a, pa.string())  # ConcatEvaluator coerces operands
            arrs.append(a)
        else:
            arrs.append(pa.array(np.full(n, str(x), dtype=object)))
    return pc.binary_join_element_wise(*arrs, "")


def _strdist(x, y):
    """StringDistanceEvaluator (`solr/solrj/.../io/eval/
    StringDistanceEvaluator.java`, edit-distance flavor): Levenshtein
    distance, vectorized by dictionary-encoding the column and running the
    whole-array DP (_levenshtein_vec) once per DISTINCT value — categorical
    columns pay O(uniques), not O(rows).  Supports column-vs-literal and
    column-vs-column (the latter grouped by distinct left value)."""
    from rindex.ops.multiterm import _levenshtein_vec

    xs = x if isinstance(x, str) else np.asarray(_str_arr(x)).astype(str)
    ys = y if isinstance(y, str) else np.asarray(_str_arr(y)).astype(str)
    if isinstance(xs, str) and isinstance(ys, str):
        return float(_levenshtein_vec(xs, np.array([ys]))[0])
    if isinstance(xs, str):
        xs, ys = ys, xs  # symmetric
    if isinstance(ys, str):
        uniq, inv = np.unique(xs, return_inverse=True)
        return _levenshtein_vec(ys, uniq).astype(np.float64)[inv]
    # column vs column: distinct (left, right) CODE pairs (integer pair
    # keys — numpy's fixed-width U dtype strips separator chars, so no
    # string concatenation), grouped by left code
    xu, xinv = np.unique(xs, return_inverse=True)
    yu, yinv = np.unique(ys, return_inverse=True)
    pair_u, pair_inv = np.unique(
        xinv.astype(np.int64) * len(yu) + yinv, return_inverse=True
    )
    li, ri = pair_u // len(yu), pair_u % len(yu)
    d = np.empty(len(pair_u), np.float64)
    for code in np.unique(li):
        m = li == code
        d[m] = _levenshtein_vec(xu[code], yu[ri[m]])
    return d[pair_inv]


EVALUATORS: dict = {
    # arithmetic (AddEvaluator, SubtractEvaluator, MultiplyEvaluator, ...)
    "add": _variadic(np.add),
    "sub": _variadic(np.subtract),
    "mult": _variadic(np.multiply),
    "div": np.divide,
    "mod": np.mod,
    "pow": np.power,
    "abs": np.abs,
    "ceiling": np.ceil,
    "floor": np.floor,
    "round": lambda x, n=0: np.round(x, int(n) if np.isscalar(n) else 0),
    "sqrt": np.sqrt,
    "cbrt": np.cbrt,
    "exp": np.exp,
    "log": np.log,        # NaturalLogEvaluator
    "log10": np.log10,
    # trig (SineEvaluator ... HyperbolicTangentEvaluator)
    "sin": np.sin, "cos": np.cos, "tan": np.tan,
    "asin": np.arcsin, "acos": np.arccos, "atan": np.arctan,
    "atan2": np.arctan2,
    "sinh": np.sinh, "cosh": np.cosh, "tanh": np.tanh,
    # comparison (GreaterThanEvaluator, EqualToEvaluator, ...)
    "gt": np.greater, "gteq": np.greater_equal,
    "lt": np.less, "lteq": np.less_equal,
    "eq": np.equal, "neq": np.not_equal,
    # boolean (AndEvaluator, OrEvaluator, NotEvaluator, ExclusiveOrEvaluator)
    "and": _variadic(np.logical_and),
    "or": _variadic(np.logical_or),
    "not": np.logical_not,
    "eor": np.logical_xor,
    # conditional (IfThenElseEvaluator, CoalesceEvaluator)
    "if": _if,
    "coalesce": lambda a, b: np.where(pd.isna(a), b, a),
    # string (ConcatEvaluator, UpperEvaluator, LowerEvaluator, TrimEvaluator,
    # LengthEvaluator) — Arrow kernels, zero-copy in
    "concat": _concat,
    "upper": lambda x: pc.utf8_upper(_str_arr(x)),
    "lower": lambda x: pc.utf8_lower(_str_arr(x)),
    "trim": lambda x: pc.utf8_trim_whitespace(_str_arr(x)),
    "length": lambda x: pc.utf8_length(_str_arr(x)).to_numpy(),
    # temporal (TemporalEvaluatorYear ... TemporalEvaluatorEpoch — Solr's
    # `year(col)` family over datetime columns; epoch() returns millis,
    # week() is the ISO week-of-week-based-year, both as in the reference)
    "year": lambda x: _dtidx(x).year.to_numpy().astype(np.int64),
    "month": lambda x: _dtidx(x).month.to_numpy().astype(np.int64),
    "day": lambda x: _dtidx(x).day.to_numpy().astype(np.int64),
    "hour": lambda x: _dtidx(x).hour.to_numpy().astype(np.int64),
    "minute": lambda x: _dtidx(x).minute.to_numpy().astype(np.int64),
    "second": lambda x: _dtidx(x).second.to_numpy().astype(np.int64),
    "epoch": lambda x: np.asarray(x, dtype="datetime64[ms]").astype(np.int64),
    "dayOfYear": lambda x: _dtidx(x).dayofyear.to_numpy().astype(np.int64),
    "quarter": lambda x: _dtidx(x).quarter.to_numpy().astype(np.int64),
    "week": lambda x: (
        _dtidx(x).isocalendar().week.to_numpy().astype(np.int64)
    ),
    # statistical (CorrelationEvaluator, CovarianceEvaluator,
    # RegressionEvaluator, PredictEvaluator) — whole-array reducers; the
    # registered op computes them DISTRIBUTED via per-batch moment
    # partials, these kernels serve expression-level use within a batch
    "corr": lambda x, y: _moments_corr(np.asarray(x, np.float64),
                                       np.asarray(y, np.float64)),
    "cov": lambda x, y: float(np.cov(np.asarray(x, np.float64),
                                     np.asarray(y, np.float64))[0, 1]),
    # regex (MatchesEvaluator / ReplaceEvaluator) — Arrow re2 kernels
    "matches": lambda x, p: pc.match_substring_regex(
        _str_arr(x), p if isinstance(p, str) else str(p)
    ),
    "strdist": _strdist,
    "replace": lambda x, p, r: pc.replace_substring_regex(
        _str_arr(x), p if isinstance(p, str) else str(p),
        replacement=r if isinstance(r, str) else str(r),
    ),
    # arrays (ArrayEvaluator / ValueAtEvaluator / ArrayMax... — Solr's
    # array() builds a per-tuple list; here fixed-arity columns stack into
    # an (n, k) matrix so the row-wise reducers stay whole-array)
    "array": lambda *cols: np.stack(
        [np.asarray(c, np.float64) for c in cols], axis=1
    ),
    "valueAt": lambda arr, i: np.asarray(arr)[:, int(i)],
    "arrayMax": lambda arr: np.asarray(arr).max(axis=1),
    "arrayMin": lambda arr: np.asarray(arr).min(axis=1),
    "arrayMean": lambda arr: np.asarray(arr).mean(axis=1),
    "arrayLength": lambda arr: np.full(
        len(np.asarray(arr)), np.asarray(arr).shape[1], dtype=np.int64
    ),
    # matrix family (MatrixEvaluator, TransposeEvaluator,
    # MatrixMultiplyEvaluator, RowAtEvaluator, ColumnAtEvaluator,
    # SumRowsEvaluator, SumColumnsEvaluator, EBEAddEvaluator...,
    # DotProductEvaluator, ScalarMultiplyEvaluator, UnitEvaluator) —
    # Solr's matrix evaluators run inside let() over COLLECTED (small)
    # streams, never per corpus row; same here: the wide aggregation is a
    # distributed groupby, the matrix algebra runs on its small result
    "matrix": lambda *rows: np.stack(
        [np.asarray(r, np.float64) for r in rows]
    ),
    "transpose": lambda m: np.asarray(m, np.float64).T,
    "matrixMult": lambda a, b: np.asarray(a, np.float64)
    @ np.asarray(b, np.float64),
    "rowAt": lambda m, i: np.asarray(m, np.float64)[int(i)],
    "columnAt": lambda m, i: np.asarray(m, np.float64)[:, int(i)],
    "sumRows": lambda m: np.asarray(m, np.float64).sum(axis=1),
    "sumColumns": lambda m: np.asarray(m, np.float64).sum(axis=0),
    "ebeAdd": lambda a, b: np.asarray(a, np.float64) + np.asarray(b, np.float64),
    "ebeSubtract": lambda a, b: np.asarray(a, np.float64)
    - np.asarray(b, np.float64),
    "ebeMultiply": lambda a, b: np.asarray(a, np.float64)
    * np.asarray(b, np.float64),
    "ebeDivide": lambda a, b: np.asarray(a, np.float64)
    / np.asarray(b, np.float64),
    "dotProduct": lambda a, b: float(
        np.dot(np.asarray(a, np.float64), np.asarray(b, np.float64))
    ),
    "scalarMultiply": lambda s, m: float(s) * np.asarray(m, np.float64),
    "unitize": lambda v: np.asarray(v, np.float64)
    / np.linalg.norm(np.asarray(v, np.float64)),
    # probability distributions (NormalDistributionEvaluator,
    # UniformRealDistributionEvaluator, EmpiricalDistributionEvaluator,
    # CumulativeProbabilityEvaluator, KolmogorovSmirnovEvaluator) — a
    # dist is a tagged tuple; ksTest takes the WEIGHTED sample (distinct
    # values + counts) so the corpus-side reduction stays a tiny groupby
    "normalDistribution": lambda mu, s: ("normal", float(mu), float(s)),
    "uniformDistribution": lambda a, b: ("uniform", float(a), float(b)),
    "empiricalDistribution": lambda v, c: (
        "empirical",
        np.asarray(v, np.float64),
        np.asarray(c, np.float64),
    ),
    "cumulativeProbability": lambda d, x: _cum_prob(d, x),
    "kolmogorovSmirnov": lambda d, v, c: _ks_d(d, v, c),
}


def _cum_prob(dist, x):
    """CDF of a distribution node at x (scalar or array)."""
    x = np.asarray(x, np.float64)
    kind = dist[0]
    if kind == "uniform":
        _, a, b = dist
        return np.clip((x - a) / (b - a), 0.0, 1.0)
    if kind == "normal":
        import math

        _, mu, s = dist
        z = (x - mu) / (s * math.sqrt(2.0))
        erf = np.vectorize(math.erf, otypes=[np.float64])
        return 0.5 * (1.0 + erf(z))
    if kind == "empirical":
        _, vals, cnts = dist
        cum = np.cumsum(cnts)
        pos = np.searchsorted(vals, x, side="right")
        return np.where(pos > 0, cum[np.maximum(pos - 1, 0)], 0.0) / cum[-1]
    raise KeyError(f"unknown distribution {kind!r}")


def _ks_d(dist, values, counts) -> float:
    """Kolmogorov-Smirnov D statistic of a weighted sample (distinct
    `values` with `counts`) against a fitted distribution: the max over
    step points of |ECDF± - F(x)| (both the pre- and post-step ECDF)."""
    v = np.asarray(values, np.float64)
    c = np.asarray(counts, np.float64)
    order = np.argsort(v)
    v, c = v[order], c[order]
    cum = np.cumsum(c)
    n = cum[-1]
    f = np.asarray(_cum_prob(dist, v), np.float64)
    return float(
        np.maximum(np.abs(cum / n - f), np.abs((cum - c) / n - f)).max()
    )


def let_eval(bindings: dict[str, str], scope: dict) -> dict:
    """LetStream analog (`solr/solrj/.../io/stream/LetStream.java`):
    evaluate `name=expression` bindings SEQUENTIALLY, each result joining
    the scope for later bindings (Solr's let() cell semantics).  Scope
    values are numpy arrays / matrices / distribution nodes — the small
    collected sides; corpus-scale reductions happen upstream as Dataset
    aggregates."""
    scope = dict(scope)
    for name, expr in bindings.items():
        scope[name] = eval_node(parse_expr(expr), scope)
    return scope


def _dtidx(x) -> pd.DatetimeIndex:
    return pd.DatetimeIndex(np.asarray(x, dtype="datetime64[us]"))


def _moments_corr(x: np.ndarray, y: np.ndarray) -> float:
    n = float(len(x))
    sx, sy = x.sum(), y.sum()
    num = n * (x * y).sum() - sx * sy
    den = np.sqrt((n * (x * x).sum() - sx * sx)
                  * (n * (y * y).sum() - sy * sy))
    return float(num / den)


def eval_node(node, cols: dict, memo: dict | None = None):
    kind = node[0]
    if kind == "lit":
        return node[1]
    if kind == "col":
        if node[1] not in cols:
            raise KeyError(f"unknown column {node[1]!r}")
        return cols[node[1]]
    _, name, args = node
    if name not in EVALUATORS:
        raise KeyError(f"unknown evaluator {name!r}")
    if memo is not None:
        # per-batch common-subexpression cache: several output expressions
        # over the same array(...) stack evaluate the shared subtree once
        key = repr(node)
        hit = memo.get(key)
        if hit is not None:
            return hit
        out = EVALUATORS[name](*(eval_node(a, cols, memo) for a in args))
        memo[key] = out
        return out
    return EVALUATORS[name](*(eval_node(a, cols) for a in args))


def select_eval(ds, exprs: dict[str, str], keep: list[str] | None = None):
    """SelectStream analog: add `name=expr` columns per Arrow batch; `keep`
    optionally projects the output (expression columns always kept)."""
    asts = {name: parse_expr(e) for name, e in exprs.items()}

    def f(t: pa.Table) -> pa.Table:
        cols = {
            c: t[c].to_numpy(zero_copy_only=False) for c in t.schema.names
        }
        memo: dict = {}  # shared across this batch's expressions (CSE)
        for name, ast in asts.items():
            out = eval_node(ast, cols, memo)
            arr = out if isinstance(out, (pa.Array, pa.ChunkedArray)) else pa.array(out)
            t = t.append_column(name, arr) if name not in t.schema.names else (
                t.set_column(t.schema.get_field_index(name), name, arr)
            )
            cols[name] = out if isinstance(out, np.ndarray) else arr.to_numpy(
                zero_copy_only=False
            )
        if keep is not None:
            t = t.select(list(dict.fromkeys(keep + list(asts))))
        return t

    return ds.map_batches(f, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Registered queries
# ---------------------------------------------------------------------------

def q_eval_select_lineitem(sf_dir: str):
    """select(... evaluators ...) -> rollup: discounted price and an
    if/gt bucket computed by the evaluator engine, then a grouped sum
    (SelectStream + RollupStream composition)."""
    from ray.data.aggregate import Count, Sum

    li = read_table(
        sf_dir, "lineitem", ["l_extendedprice", "l_discount", "l_quantity"]
    )
    sel = select_eval(
        li,
        {
            "disc_price": "mult(l_extendedprice, sub(1, l_discount))",
            "bucket": 'if(gt(l_quantity, 25), "big", "small")',
        },
        keep=[],
    )
    out = (
        sel.groupby("bucket")
        .aggregate(Count(alias_name="n"), Sum("disc_price", alias_name="sum_disc"))
        .to_pandas()
    )
    out["sum_disc"] = out["sum_disc"].round(2)
    return out.sort_values("bucket").reset_index(drop=True)


QUERIES["eval_select_lineitem"] = q_eval_select_lineitem
ORACLE["eval_select_lineitem"] = """
    SELECT CASE WHEN l_quantity > 25 THEN 'big' ELSE 'small' END AS bucket,
           count(*) AS n,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc
    FROM lineitem GROUP BY 1 ORDER BY 1
"""


def q_eval_math_funcs_events(sf_dir: str):
    """The math-evaluator family end-to-end (sqrt/log/atan2/tanh/abs/round)
    over the events stream, row-parallel, output bounded by a pre-filter."""
    ev = read_table(sf_dir, "events", ["event_id", "value"])
    sel = select_eval(
        ev.filter(expr="event_id < 2000"),
        {
            "s": "round(sqrt(abs(value)), 6)",
            "l": "round(log(add(abs(value), 1)), 6)",
            "t": "round(atan2(value, 2.0), 6)",
            "h": "round(tanh(div(value, 100)), 6)",
        },
        keep=["event_id"],
    )
    return sel.to_pandas().sort_values("event_id").reset_index(drop=True)


QUERIES["eval_math_funcs_events"] = q_eval_math_funcs_events
ORACLE["eval_math_funcs_events"] = """
    SELECT event_id,
           round(sqrt(abs(value)), 6) AS s,
           round(ln(abs(value) + 1), 6) AS l,
           round(atan2(value, 2.0), 6) AS t,
           -- this duckdb build has no tanh(); exp identity, same 6-decimal round
           round((exp(2 * value / 100) - 1) / (exp(2 * value / 100) + 1), 6) AS h
    FROM events WHERE event_id < 2000 ORDER BY event_id
"""


def q_eval_string_funcs_documents(sf_dir: str):
    """String-evaluator family (concat/upper/trim/length) over documents."""
    docs = read_table(sf_dir, "documents", ["doc_id", "lang", "source", "text"])
    sel = select_eval(
        docs.filter(expr="doc_id < 3000"),
        {
            "tag": 'concat(upper(lang), "-", trim(source))',
            "text_len": "length(text)",
        },
        keep=["doc_id"],
    )
    return sel.to_pandas().sort_values("doc_id").reset_index(drop=True)


QUERIES["eval_string_funcs_documents"] = q_eval_string_funcs_documents
ORACLE["eval_string_funcs_documents"] = """
    SELECT doc_id,
           concat(upper(lang), '-', trim(source)) AS tag,
           length(text) AS text_len
    FROM documents WHERE doc_id < 3000 ORDER BY doc_id
"""


def q_eval_temporal_events(sf_dir: str):
    """Temporal-evaluator family (year/month/day/hour/minute/second/
    quarter/dayOfYear/week/epoch — `solr/solrj/.../io/eval/
    TemporalEvaluator*.java`) over the events stream, composed with a
    rollup: every kernel feeds an aggregate so a wrong date part anywhere
    shifts a group or a sum."""
    from ray.data.aggregate import Count, Max, Min, Sum

    ev = read_table(sf_dir, "events", ["ts"])
    sel = select_eval(
        ev,
        {
            "y": "year(ts)", "q": "quarter(ts)", "mo": "month(ts)",
            "d": "day(ts)", "h": "hour(ts)", "mi": "minute(ts)",
            "s": "second(ts)", "doy": "dayOfYear(ts)", "wk": "week(ts)",
            "ep": "epoch(ts)",
        },
        keep=[],
    )
    out = (
        sel.groupby(["y", "q", "mo", "d"])
        .aggregate(
            Count(alias_name="n"),
            Sum("h", alias_name="sum_hour"),
            Sum("mi", alias_name="sum_min"),
            Sum("s", alias_name="sum_sec"),
            Min("doy", alias_name="min_doy"),
            Max("doy", alias_name="max_doy"),
            Sum("wk", alias_name="sum_week"),
            Min("ep", alias_name="min_epoch_ms"),
            Max("ep", alias_name="max_epoch_ms"),
        )
        .to_pandas()
    )
    return out.sort_values(["y", "q", "mo", "d"]).reset_index(drop=True)


QUERIES["eval_temporal_events"] = q_eval_temporal_events
ORACLE["eval_temporal_events"] = """
    SELECT year(ts) AS y, quarter(ts) AS q, month(ts) AS mo, day(ts) AS d,
           count(*) AS n,
           sum(hour(ts))::BIGINT AS sum_hour,
           sum(minute(ts))::BIGINT AS sum_min,
           sum(cast(floor(second(ts)) AS BIGINT))::BIGINT AS sum_sec,
           min(dayofyear(ts)) AS min_doy,
           max(dayofyear(ts)) AS max_doy,
           sum(weekofyear(ts))::BIGINT AS sum_week,
           min(epoch_ms(ts)) AS min_epoch_ms,
           max(epoch_ms(ts)) AS max_epoch_ms
    FROM events
    GROUP BY 1, 2, 3, 4 ORDER BY 1, 2, 3, 4
"""


def q_eval_regress_lineitem(sf_dir: str):
    """Statistical-evaluator family (corr/cov/regress/predict —
    `CorrelationEvaluator`, `CovarianceEvaluator`, `RegressionEvaluator`,
    `PredictEvaluator`): DISTRIBUTED via one-row-per-batch moment partials
    (n, Σx, Σy, Σxy, Σx², Σy²) — the whole table never leaves the workers,
    the driver combines a handful of partial rows (the same
    partial+combine shape as every facet/stats pushdown here)."""
    li = read_table(sf_dir, "lineitem", ["l_quantity", "l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        x = t["l_quantity"].to_numpy().astype(np.float64)
        y = t["l_extendedprice"].to_numpy().astype(np.float64)
        return pa.table(
            {
                "n": [float(len(x))],
                "sx": [x.sum()], "sy": [y.sum()],
                "sxy": [(x * y).sum()],
                "sxx": [(x * x).sum()], "syy": [(y * y).sum()],
            }
        )

    p = li.map_batches(partial, batch_format="pyarrow").to_pandas().sum()
    n, sx, sy, sxy, sxx, syy = (
        p["n"], p["sx"], p["sy"], p["sxy"], p["sxx"], p["syy"]
    )
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    corr = (n * sxy - sx * sy) / np.sqrt(
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )
    cov_samp = (sxy - sx * sy / n) / (n - 1.0)
    return pd.DataFrame(
        {
            "n": [int(n)],
            "corr_qty_price": [round(float(corr), 6)],
            "cov_qty_price": [round(float(cov_samp), 4)],
            "slope": [round(float(slope), 6)],
            "intercept": [round(float(intercept), 4)],
            "predict_at_30": [round(float(intercept + slope * 30.0), 4)],
        }
    )


QUERIES["eval_regress_lineitem"] = q_eval_regress_lineitem
ORACLE["eval_regress_lineitem"] = """
    SELECT count(*) AS n,
           round(corr(l_extendedprice, l_quantity), 6) AS corr_qty_price,
           round(covar_samp(l_extendedprice, l_quantity), 4) AS cov_qty_price,
           round(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
           round(regr_intercept(l_extendedprice, l_quantity)
                 + regr_slope(l_extendedprice, l_quantity) * 30.0, 4)
             AS predict_at_30
    FROM lineitem
"""


def q_eval_array_scale_lineitem(sf_dir: str):
    """Array + regex evaluators and the scale() function query
    (reference: `solr/solrj/.../io/eval/{ArrayEvaluator,ValueAtEvaluator,
    MatchesEvaluator}.java` + `lucene/queries/.../valuesource/
    ScaleFloatFunction.java`).  scale(field, 0, 1) needs the GLOBAL
    min/max — a real two-pass distributed shape: one tiny Dataset
    aggregate, constants inlined into the second-pass expression (the
    reference computes the same bounds in ScaleFloatFunction#createWeight
    before scoring).  Arrays are fixed-arity column stacks so every
    row-wise reducer stays whole-matrix numpy."""
    from ray.data.aggregate import Max, Min

    li = read_table(
        sf_dir, "lineitem",
        ["l_orderkey", "l_linenumber", "l_quantity", "l_discount",
         "l_tax", "l_extendedprice", "l_returnflag"],
    )
    # bounds pass reads ONLY the scaled column (its own pruned read)
    bounds = read_table(sf_dir, "lineitem", ["l_extendedprice"]).aggregate(
        Min("l_extendedprice"), Max("l_extendedprice")
    )
    lo = float(bounds["min(l_extendedprice)"])
    hi = float(bounds["max(l_extendedprice)"])
    def keep_mod(t: pa.Table) -> pa.Table:
        return t.filter(pa.array(t["l_orderkey"].to_numpy() % 100 == 0))

    sel = select_eval(
        li.map_batches(keep_mod, batch_format="pyarrow",
                       zero_copy_batch=True),
        {
            "arr_max": "arrayMax(array(l_quantity, mult(l_discount, 100), mult(l_tax, 100)))",
            "arr_mean": "round(arrayMean(array(l_quantity, mult(l_discount, 100), mult(l_tax, 100))), 6)",
            "mid": "valueAt(array(l_quantity, mult(l_discount, 100), mult(l_tax, 100)), 1)",
            "is_return": "matches(l_returnflag, \"R\")",
            "scaled_price": f"round(div(sub(l_extendedprice, {lo}), {hi - lo}), 6)",
        },
        keep=["l_orderkey", "l_linenumber"],
    )
    return (
        sel.sort(["l_orderkey", "l_linenumber"])
        .to_pandas()
        .reset_index(drop=True)
    )


QUERIES["eval_array_scale_lineitem"] = q_eval_array_scale_lineitem
ORACLE["eval_array_scale_lineitem"] = """
    WITH b AS (
      SELECT min(l_extendedprice) AS lo, max(l_extendedprice) AS hi
      FROM lineitem
    )
    SELECT l_orderkey, l_linenumber,
           greatest(l_quantity, l_discount * 100, l_tax * 100) AS arr_max,
           round((l_quantity + l_discount * 100 + l_tax * 100) / 3.0, 6)
             AS arr_mean,
           l_discount * 100 AS mid,
           l_returnflag = 'R' AS is_return,
           round((l_extendedprice - b.lo) / (b.hi - b.lo), 6) AS scaled_price
    FROM lineitem, b
    WHERE l_orderkey % 100 = 0
    ORDER BY l_orderkey, l_linenumber
"""


def q_eval_strdist_events(sf_dir: str):
    """select(events, strdist(event_type, "click")) -> rollup: the
    StringDistanceEvaluator over a categorical column (distance computed
    once per distinct value per batch), aggregated per event type.  Max()
    over the per-row distances checks every row carried the right value."""
    from ray.data.aggregate import Count, Max

    ev = read_table(sf_dir, "events", ["event_type"])
    sel = select_eval(ev, {"dist": 'strdist(event_type, "click")'})
    out = (
        sel.groupby("event_type")
        .aggregate(Count(alias_name="n"), Max("dist", alias_name="dist"))
        .to_pandas()
    )
    return out.sort_values("event_type").reset_index(drop=True)


QUERIES["eval_strdist_events"] = q_eval_strdist_events
ORACLE["eval_strdist_events"] = """
    SELECT event_type, count(*) AS n,
           levenshtein(event_type, 'click')::DOUBLE AS dist
    FROM events
    GROUP BY event_type
    ORDER BY event_type
"""

def q_eval_let_matrix_events(sf_dir: str):
    """let() + matrix evaluator family (LetStream + MatrixEvaluator /
    TransposeEvaluator / MatrixMultiplyEvaluator / SumRowsEvaluator,
    `solr/solrj/.../io/{stream/LetStream,eval/Matrix*Evaluator}.java`):
    the corpus reduces DISTRIBUTED to a (event_type x quarter) cell matrix
    (sum of floor(value) — integer cells, so the float64 matmul is exact),
    then the let() bindings run the matrix algebra on that small collected
    side exactly as Solr's let() does over collected streams: the Gram
    matrix P = M.M^T and row sums, emitted as (et_a, et_b) cells."""
    from ray.data.aggregate import Sum

    ev = read_table(sf_dir, "events", ["event_type", "ts", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": t["event_type"],
                "q": pa.array(
                    _dtidx(t["ts"].to_numpy(zero_copy_only=False))
                    .quarter.to_numpy()
                    .astype(np.int64)
                ),
                "fl": pc.cast(pc.floor(t["value"]), pa.int64()),
            }
        )

    leaf = (
        ev.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["event_type", "q"])
        .aggregate(Sum("fl", alias_name="c"))
        .to_pandas()
    )
    ets = np.sort(leaf["event_type"].unique())
    et_ix = {e: i for i, e in enumerate(ets)}
    M = np.zeros((len(ets), 4), np.float64)
    M[
        leaf["event_type"].map(et_ix).to_numpy(),
        leaf["q"].to_numpy(np.int64) - 1,
    ] = leaf["c"].to_numpy(np.float64)
    scope = let_eval(
        {
            "Mt": "transpose(M)",
            "P": "matrixMult(M, Mt)",
            "r": "sumRows(M)",
        },
        {"M": M},
    )
    n = len(ets)
    ii, jj = np.divmod(np.arange(n * n), n)
    return pd.DataFrame(
        {
            "et_a": ets[ii],
            "et_b": ets[jj],
            "p": scope["P"][ii, jj],
            "row_sum_a": scope["r"][ii],
        }
    ).sort_values(["et_a", "et_b"]).reset_index(drop=True)


QUERIES["eval_let_matrix_events"] = q_eval_let_matrix_events
ORACLE["eval_let_matrix_events"] = """
    WITH leaf AS (
      SELECT event_type, quarter(ts) AS q,
             sum(cast(floor(value) AS BIGINT))::BIGINT AS c
      FROM events GROUP BY 1, 2
    ),
    grid AS (
      SELECT et.event_type, qq.q, coalesce(leaf.c, 0) AS c
      FROM (SELECT DISTINCT event_type FROM events) et
      CROSS JOIN (SELECT unnest([1, 2, 3, 4]) AS q) qq
      LEFT JOIN leaf ON leaf.event_type = et.event_type AND leaf.q = qq.q
    ),
    p AS (
      SELECT a.event_type AS et_a, b.event_type AS et_b,
             sum(a.c * b.c)::DOUBLE AS p
      FROM grid a JOIN grid b ON a.q = b.q
      GROUP BY 1, 2
    ),
    r AS (SELECT event_type, sum(c)::DOUBLE AS row_sum FROM grid GROUP BY 1)
    SELECT et_a, et_b, p, r.row_sum AS row_sum_a
    FROM p JOIN r ON p.et_a = r.event_type
    ORDER BY et_a, et_b
"""


def q_eval_ks_uniform_lineitem(sf_dir: str):
    """Distribution-fit evaluators (UniformRealDistributionEvaluator +
    CumulativeProbabilityEvaluator + KolmogorovSmirnovEvaluator,
    `solr/solrj/.../io/eval/{UniformRealDistribution,CumulativeProbability,
    KolmogorovSmirnov}Evaluator.java`): l_quantity reduces distributed to
    a (distinct value, count) weighted sample — the KS statistic needs
    only that tiny side — then let() fits uniform(lo, hi) and evaluates
    the D statistic and the CDF at 25."""
    from ray.data.aggregate import Count

    li = read_table(sf_dir, "lineitem", ["l_quantity"])
    s = li.groupby("l_quantity").aggregate(Count(alias_name="c")).to_pandas()
    v = s["l_quantity"].to_numpy(np.float64)
    c = s["c"].to_numpy(np.float64)
    scope = let_eval(
        {
            "dist": "uniformDistribution(lo, hi)",
            "ks_d": "kolmogorovSmirnov(dist, v, c)",
            "cdf_q25": "cumulativeProbability(dist, 25.0)",
        },
        {"v": v, "c": c, "lo": float(v.min()), "hi": float(v.max())},
    )
    return pd.DataFrame(
        {
            "lo": [float(v.min())],
            "hi": [float(v.max())],
            "n_distinct": [np.int64(len(v))],
            "ks_d": [scope["ks_d"]],
            "cdf_q25": [float(scope["cdf_q25"])],
        }
    )


QUERIES["eval_ks_uniform_lineitem"] = q_eval_ks_uniform_lineitem
ORACLE["eval_ks_uniform_lineitem"] = """
    WITH s AS (
      SELECT l_quantity AS x, count(*) AS c FROM lineitem GROUP BY 1
    ),
    b AS (
      SELECT min(x)::DOUBLE AS lo, max(x)::DOUBLE AS hi,
             sum(c)::DOUBLE AS n, count(*)::BIGINT AS n_distinct
      FROM s
    ),
    e AS (SELECT x::DOUBLE AS x, c::DOUBLE AS c,
                 sum(c) OVER (ORDER BY x)::DOUBLE AS cum
          FROM s)
    SELECT lo, hi, n_distinct,
           max(greatest(abs(cum / n - (x - lo) / (hi - lo)),
                        abs((cum - c) / n - (x - lo) / (hi - lo)))) AS ks_d,
           (25.0 - lo) / (hi - lo) AS cdf_q25
    FROM e, b
    GROUP BY lo, hi, n_distinct
"""
