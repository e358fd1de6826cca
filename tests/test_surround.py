"""Surround parser (rindex/ops/surround.py): grammar round-trips, error
paths, and hand-computed semantics on an engineered corpus."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from rindex.ops.surround import _tree_sql, parse_surround


def test_parse_shapes():
    assert parse_surround("hash") == ("term", "hash")
    assert parse_surround("3W(a, b)") == ("near", 3, True, ("a", "b"))
    assert parse_surround("2N(a, b)") == ("near", 2, False, ("a", "b"))
    assert parse_surround("5W(a, b, c)") == ("near", 5, True, ("a", "b", "c"))
    t = parse_surround("AND(a, OR(b, c), NOT(d, e))")
    assert t[0] == "and" and len(t[1]) == 3
    assert t[1][1] == ("or", [("term", "b"), ("term", "c")])
    assert t[1][2] == ("not", [("term", "d"), ("term", "e")])


def test_parse_errors():
    for bad in ["AND(a", "3W(a)", "NOT(a)", "a b", "AND(a,)"]:
        with pytest.raises(ValueError):
            parse_surround(bad)


def test_sql_backend_matches_hand_semantics(tmp_path):
    import duckdb

    texts = [
        "hash x join other words",   # 0: hash..join within 2 (ordered)
        "join x x hash",             # 1: only unordered proximity
        "hash x x x x x join",       # 2: too far for 3W
        "hash join spark",           # 3: proximity but has spark
        "window sort",               # 4: no proximity
    ]
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(5, dtype=np.int64)),
            "text": pa.array(texts, pa.string()),
        }
    )
    p = os.path.join(str(tmp_path), "documents.parquet")
    pq.write_table(t, p)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{p}')")

    def run(q):
        sql = f"SELECT doc_id FROM ({_tree_sql(parse_surround(q))}) ORDER BY 1"
        return con.execute(sql).df()["doc_id"].tolist()

    assert run("3W(hash, join)") == [0, 3]          # ordered, width <= 4
    assert run("4N(hash, join)") == [0, 1, 3]       # unordered, width <= 5
    assert run("NOT(3W(hash, join), spark)") == [0]
    assert run("AND(4N(hash, join), OR(spark, other))") == [0, 3]
    assert run("OR(window, spark)") == [3, 4]
    # 3-term ordered chains: doc 0 = 'hash x join other words' has the
    # chain hash(1)..join(3)..words(5): width 5, slack 2
    assert run("3W(hash, join, words)") == [0]      # slop 2 == slack
    assert run("2W(hash, join, words)") == []       # slop 1 <  slack
    assert run("1W(hash, join, spark)") == [3]      # adjacent triple


def test_nary_unordered_min_cover(tmp_path):
    import duckdb

    texts = ["a x b x c", "c b a", "a x x x x b c", "a b"]
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(4, dtype=np.int64)),
            "text": pa.array(texts, pa.string()),
        }
    )
    p = os.path.join(str(tmp_path), "documents.parquet")
    pq.write_table(t, p)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{p}')")

    def run(q):
        sql = f"SELECT doc_id FROM ({_tree_sql(parse_surround(q))}) ORDER BY 1"
        return con.execute(sql).df()["doc_id"].tolist()

    # covering widths: d0=5, d1=3, d2=7; d3 lacks c
    assert run("5N(a, b, c)") == [0, 1, 2]   # slop 4 -> width <= 7
    assert run("3N(a, b, c)") == [0, 1]      # slop 2 -> width <= 5
    assert run("1N(a, b, c)") == [1]         # slop 0 -> width <= 3


# ---------------------------------------------------------------------------
# Property test: the tree -> SQL compiler agrees with a NAIVE evaluator on
# random trees over random corpora (the Ray plan is oracle-checked against
# the same SQL in test_ops_oracle, closing the triangle).
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_ALPHA = ["a", "b", "c", "x"]


def _naive_eval(tree, docs):
    def leaf_docs(leaf):
        out = set()
        for did, toks in docs:
            if leaf[0] == "term":
                if leaf[1] in toks:
                    out.add(did)
                continue
            _, n, ordered, terms = leaf
            slop = n - 1
            pos = {t: [i for i, x in enumerate(toks) if x == t]
                   for t in terms}
            if any(not pos[t] for t in terms):
                continue
            widths = []
            if ordered:
                for start in pos[terms[0]]:
                    cur = start
                    ok = True
                    for t in terms[1:]:
                        nxt = [p for p in pos[t] if p > cur]
                        if not nxt:
                            ok = False
                            break
                        cur = nxt[0]
                    if ok:
                        widths.append(cur - start + 1)
            else:
                import itertools

                for combo in itertools.product(*(pos[t] for t in terms)):
                    widths.append(max(combo) - min(combo) + 1)
            if widths and min(widths) - len(terms) <= slop:
                out.add(did)
        return out

    def ev(t):
        if t[0] == "and":
            s = ev(t[1][0])
            for k in t[1][1:]:
                s = s & ev(k)
            return s
        if t[0] == "or":
            s = ev(t[1][0])
            for k in t[1][1:]:
                s = s | ev(k)
            return s
        if t[0] == "not":
            return ev(t[1][0]) - ev(t[1][1])
        return leaf_docs(t)

    return sorted(ev(tree))


def _trees(depth):
    term = st.sampled_from(_ALPHA).map(lambda t: ("term", t))
    near = st.tuples(
        st.integers(1, 4),
        st.booleans(),
        st.lists(st.sampled_from(_ALPHA), min_size=2, max_size=3,
                 unique=True),
    ).map(lambda x: ("near", x[0], x[1], tuple(x[2])))
    leaf = st.one_of(term, near)
    if depth == 0:
        return leaf
    sub = _trees(depth - 1)
    return st.one_of(
        leaf,
        st.lists(sub, min_size=2, max_size=3).map(lambda ks: ("and", ks)),
        st.lists(sub, min_size=2, max_size=3).map(lambda ks: ("or", ks)),
        st.tuples(sub, sub).map(lambda ab: ("not", list(ab))),
    )


@settings(max_examples=40, deadline=None)
@given(
    tree=_trees(2),
    corpus=st.lists(
        st.lists(st.sampled_from(_ALPHA), min_size=0, max_size=8),
        min_size=1, max_size=12,
    ),
)
def test_sql_backend_matches_naive_on_random_trees(tree, corpus):
    import duckdb

    docs = [(i, toks) for i, toks in enumerate(corpus)]
    con = duckdb.connect()
    rows = ", ".join(
        f"({i}, '{' '.join(toks)}')" for i, toks in docs
    )
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM (VALUES {rows}) "
        "t(doc_id, text)"
    )
    sql = f"SELECT doc_id FROM ({_tree_sql(tree)}) ORDER BY 1"
    got = con.execute(sql).df()["doc_id"].tolist()
    assert got == _naive_eval(tree, docs), (tree, corpus)
