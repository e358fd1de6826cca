"""End-to-end index build + BM25 parity vs the naive oracle.

Mirrors the reference test strategy (SURVEY.md §5): golden equivalence
(BaseDistributedSearchTestCase — 1-partition vs many-partition builds),
rank-identical top-k with exact score equality vs the in-repo oracle
(TestBM25Similarity stand-in), and WAND == exhaustive (TestWANDScorer)."""

import glob
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from rindex.build import build_index
from rindex.fixtures import make_queries
from rindex.oracle import NaiveBM25Oracle
from rindex.search import IndexSearcher, search_queries


@pytest.fixture(scope="session")
def small_index(ray_session, small_corpus, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("idx") / "small")
    manifest = build_index(
        small_corpus, idx, num_segments=8, mode="local", salt_range=512
    )
    return idx, manifest


@pytest.fixture(scope="session")
def small_oracle(small_corpus):
    t = pq.read_table(small_corpus)
    return NaiveBM25Oracle(t)


def test_build_totals(small_index, small_corpus):
    _, manifest = small_index
    n_rows = pq.read_table(small_corpus).num_rows
    assert manifest["totals"]["doc_count"] == n_rows
    assert manifest["totals"]["n_segments"] == 8


def test_per_turn_text_equality(small_index, small_corpus):
    """Per-row invariant vs the reference: per-turn text equality under
    stable (conv_id, turn_idx) ordering (BASELINE.json input_hint)."""
    idx, manifest = small_index
    src = pq.read_table(small_corpus).sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending")]
    )
    parts = []
    for m in manifest["segments"]:
        parts.append(
            pq.read_table(
                os.path.join(idx, "segments", f"seg-{m['seg_id']:05d}", "docs.parquet")
            )
        )
    stored = pa.concat_tables(parts).sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending")]
    )
    assert stored.num_rows == src.num_rows
    assert stored["text"].to_pylist() == src["text"].to_pylist()
    assert stored["conv_id"].to_pylist() == src["conv_id"].to_pylist()
    assert stored["turn_idx"].to_pylist() == src["turn_idx"].to_pylist()


@pytest.mark.parametrize("algo", ["exhaustive", "wand"])
def test_oracle_parity_rank_and_score(small_index, small_oracle, algo):
    """Engine top-k is rank-identical to the oracle with EXACT float64 score
    equality (lossy-norm mode — the tested contract, FIXTURES.md §3)."""
    idx, _ = small_index
    searcher = IndexSearcher(idx, algo=algo)
    queries = make_queries()
    got = searcher.search_table(queries, algo=algo)
    want = small_oracle.search_table(queries)
    got_rows = list(zip(*[got[c].to_pylist() for c in got.column_names]))
    want_rows = list(zip(*[want[c].to_pylist() for c in want.column_names]))
    assert len(got_rows) == len(want_rows)
    for g, w in zip(got_rows, want_rows):
        assert g[:4] == w[:4], (g, w)
        assert g[4] == w[4], f"score mismatch {g} vs {w}"


def test_wand_equals_exhaustive(small_index):
    idx, _ = small_index
    s = IndexSearcher(idx)
    queries = make_queries()
    a = s.search_table(queries, algo="wand")
    b = s.search_table(queries, algo="exhaustive")
    assert a.equals(b)


def test_wand_equals_exhaustive_classic_similarity(small_index):
    """The block-max bounds must be recomputed from the PLUGGED similarity:
    with ClassicSimilarity the pruned path must still match the exhaustive
    one bit-for-bit (Similarity SPI — similarities/Similarity.java)."""
    idx, _ = small_index
    s = IndexSearcher(idx, similarity="classic")
    queries = make_queries()
    a = s.search_table(queries, algo="wand")
    b = s.search_table(queries, algo="exhaustive")
    assert a.equals(b)


def test_expression_similarity_replicates_bm25(small_index):
    """An ExpressionSimilarity compiled from BM25's own formulas must
    reproduce the built-in BM25 RANKING (scores agree to float tolerance —
    the expression evaluates the same math in a slightly different
    operation order, so bit-identity is not expected), and the WAND path
    must equal the exhaustive path under the compiled expression."""
    import numpy as np

    from rindex.similarity import ExpressionSimilarity

    expr_bm25 = ExpressionSimilarity(
        weight_expr="log(add(1, div(add(sub(n_docs, df), 0.5), add(df, 0.5))))",
        norm_expr="mult(1.2, add(0.25, mult(0.75, div(dl, avgdl))))",
        score_expr="div(mult(w, tf), add(tf, cv))",
        name="expr_bm25",
    )
    idx, _ = small_index
    queries = make_queries()
    a = IndexSearcher(idx, similarity="bm25").search_table(queries)
    b = IndexSearcher(idx, similarity=expr_bm25).search_table(queries)
    for col in a.schema.names:
        if col != "score":
            assert a[col].equals(b[col]), col
    np.testing.assert_allclose(
        a["score"].to_numpy(), b["score"].to_numpy(), rtol=1e-12
    )
    w = IndexSearcher(idx, similarity=expr_bm25).search_table(
        queries, algo="wand"
    )
    e = IndexSearcher(idx, similarity=expr_bm25).search_table(
        queries, algo="exhaustive"
    )
    assert w.equals(e)


def test_wand_equals_exhaustive_lmdirichlet_and_zero_clamp(small_index):
    """LMDirichlet's max(0,.) clamp can score a MATCHED doc exactly 0; the
    engine-wide hit contract (score > 0, mirroring every oracle's WHERE
    s > 0) must hold in EVERY kernel, keeping wand == exhaustive — the
    dense kernel's nonzero(acc) used to drop such docs while WAND kept
    them."""
    idx, _ = small_index
    s = IndexSearcher(idx, similarity="lmdirichlet")
    queries = make_queries()
    a = s.search_table(queries, algo="wand")
    b = s.search_table(queries, algo="exhaustive")
    assert a.equals(b)
    import numpy as np

    assert (a["score"].to_numpy() > 0).all()


def test_wand_equals_exhaustive_dfr(small_index):
    """DFR In/B/H2 rides the needs_cstats channel with a log2 norm cache;
    the recomputed block bounds must keep the pruned path bit-identical,
    and In > 0 must make every match a positive-score hit."""
    idx, _ = small_index
    s = IndexSearcher(idx, similarity="dfr")
    queries = make_queries()
    a = s.search_table(queries, algo="wand")
    b = s.search_table(queries, algo="exhaustive")
    assert a.equals(b)
    import numpy as np

    assert (a["score"].to_numpy() > 0).all()


def test_query_searcher_honors_similarity(small_index):
    """QuerySearcher must thread its similarity parameter through to the
    inner IndexSearcher (it used to silently score with bm25)."""
    from rindex.search import QuerySearcher

    idx, _ = small_index
    queries = make_queries()
    via_pool = QuerySearcher(idx, "wand", "classic")(queries)
    direct = IndexSearcher(idx, algo="wand", similarity="classic").search_table(
        queries
    )
    assert via_pool.equals(direct)


def test_boost_suffix_forms():
    from rindex.search import parse_query_string

    # '.5'-style boosts are valid float literals
    q = parse_query_string("foo^.5 bar^2")
    assert q.boosts["foo"] == 0.5 and q.boosts["bar"] == 2.0
    # numeric-looking but malformed ('1.2.3'): rejected LOUDLY with a
    # clear message, never silently analyzed into junk terms
    with pytest.raises(ValueError, match="malformed boost"):
        parse_query_string("foo^1.2.3 bar")
    # the phrase channel enforces the same contract (no shed '.3' term)
    with pytest.raises(ValueError, match="malformed boost"):
        parse_query_string('"big data"^1.2.3')
    assert parse_query_string('"big data"^1.5').phrases[0][1] == 1.5
    # a caret inside a non-numeric token is plain text, not a boost
    q2 = parse_query_string("a^b c")
    assert "c" in q2.terms and not q2.boosts.get("a^b")


def test_similarities_actually_differ(small_index):
    idx, _ = small_index
    queries = make_queries()
    a = IndexSearcher(idx, similarity="bm25").search_table(queries)
    b = IndexSearcher(idx, similarity="classic").search_table(queries)
    assert not a["score"].equals(b["score"])
    import pytest

    with pytest.raises(ValueError, match="unknown similarity"):
        IndexSearcher(idx, similarity="nope")


def test_distributed_query_serving(ray_session, small_index):
    import ray.data as rd

    idx, _ = small_index
    queries = make_queries()
    qds = rd.from_arrow(queries)
    out = search_queries(idx, qds, concurrency=(1, 2)).to_pandas()
    s = IndexSearcher(idx)
    direct = s.search_table(queries).to_pandas()
    out = out.sort_values(["query_id", "rank"]).reset_index(drop=True)
    direct = direct.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert out.equals(direct)


def test_parallelism_equivalence(ray_session, tiny_corpus, tmp_path):
    """N=1 vs N=8 input partitions -> byte-identical postings (golden
    equivalence, SURVEY.md §5e).  Also local vs term_shuffle mode."""
    import ray.data as rd

    t = pq.read_table(tiny_corpus)
    one = rd.from_arrow(t).repartition(1)
    many = rd.from_arrow(t).repartition(8)
    m1 = build_index(one, str(tmp_path / "i1"), num_segments=4, mode="local")
    m2 = build_index(many, str(tmp_path / "i2"), num_segments=4, mode="local")
    m3 = build_index(
        many, str(tmp_path / "i3"), num_segments=4, mode="term_shuffle", salt_range=64
    )
    assert m1["totals"] == m2["totals"] == m3["totals"]
    for s in range(4):
        p1 = pq.read_table(str(tmp_path / "i1" / "segments" / f"seg-{s:05d}" / "postings.parquet"))
        p2 = pq.read_table(str(tmp_path / "i2" / "segments" / f"seg-{s:05d}" / "postings.parquet"))
        p3 = pq.read_table(str(tmp_path / "i3" / "segments" / f"seg-{s:05d}" / "postings.parquet"))
        assert p1.equals(p2)
        assert p1.equals(p3)


def test_resume_skips_done_segments(ray_session, tiny_corpus, tmp_path):
    idx = str(tmp_path / "resume")
    m1 = build_index(tiny_corpus, idx, num_segments=4)
    # sabotage one segment: drop its _SUCCESS -> only that one rebuilds
    victim = os.path.join(idx, "segments", "seg-00002", "_SUCCESS")
    os.remove(victim)
    mtimes = {
        f: os.path.getmtime(f)
        for f in glob.glob(os.path.join(idx, "segments", "*", "postings.parquet"))
    }
    m2 = build_index(tiny_corpus, idx, num_segments=4)
    assert m2["totals"] == m1["totals"]
    for f, old in mtimes.items():
        if "seg-00002" in f:
            assert os.path.getmtime(f) > old  # rebuilt
        else:
            assert os.path.getmtime(f) == old  # untouched
    # config change invalidates checkpoints
    with open(os.path.join(idx, "segments", "seg-00001", "_SUCCESS")) as fh:
        lin = json.load(fh)
    assert lin["config_hash"] == m2["config_hash"]


def test_empty_and_absent_queries(small_index):
    idx, _ = small_index
    s = IndexSearcher(idx)
    assert s.search("zzzzabsent") == []
    assert s.search("") == []
    assert s.search("zzzzabsent the", mode="and") == []
    assert len(s.search("zzzzabsent the", mode="or", k=5)) == 5


def test_topk_k_variants(small_index, small_oracle):
    idx, _ = small_index
    s = IndexSearcher(idx)
    for k in (1, 3, 100):
        got = s.search("the w0001", k=k)
        want = small_oracle.search("the w0001", k=k)
        assert got == [(r[0], r[1], r[2], pytest.approx(r[3], abs=0)) for r in want]


def test_config_change_invalidates_checkpoints(ray_session, tiny_corpus, tmp_path):
    """Checkpoint keys include the config hash: a changed build config must
    rebuild every segment, not reuse stale ones (SURVEY.md §7.3.6)."""
    idx = str(tmp_path / "cfg-invalidate")
    build_index(tiny_corpus, idx, num_segments=4, salt_range=64)
    mtimes = {
        f: os.path.getmtime(f)
        for f in glob.glob(os.path.join(idx, "segments", "*", "postings.parquet"))
    }
    build_index(tiny_corpus, idx, num_segments=4, salt_range=128)
    for f, old in mtimes.items():
        assert os.path.getmtime(f) > old, f


def test_score_matches_dataset_equals_search(ray_session, small_index):
    """The distributed full-match-set path (per-segment scoring tasks ->
    Dataset) must be BIT-identical to the in-process exhaustive kernel at
    k=everything, including AND mode and the empty-plan short-circuit."""
    idx, _ = small_index
    s = IndexSearcher(idx, algo="exhaustive")
    for text, mode in [("the round", "or"), ("the round", "and"),
                       ("zzz_absent", "or")]:
        hits = s.search(text, k=10**9, mode=mode)
        ref = sorted((h[1:-1], h[-1]) for h in hits)
        ds = s.score_matches_dataset(text, mode=mode)
        got = sorted(
            (tuple(r[c] for c in s.id_cols), r["score"])
            for r in ds.to_pandas().to_dict("records")
        )
        assert got == ref, (text, mode, len(got), len(ref))


def test_synonym_query_blended_stats(small_index, small_corpus):
    """SynonymQuery semantics: per-doc tf = SUM of member tfs, docFreq =
    MAX of member global dfs — a synonym-only query must equal the hand
    computation over the oracle corpus, and an absent member must not
    change the result (its df=0 never wins the max; its postings add
    nothing)."""
    import re as _re

    import numpy as np

    from rindex.bm25 import idf as bm25_idf
    from rindex.codec import NORM_DECODE_TABLE, encode_norms
    from rindex.schema import B, K1
    from rindex.search import IndexSearcher, Query

    idx, _ = small_index
    s = IndexSearcher(idx, algo="exhaustive")
    group = ["data", "query"]
    got = s.search_query(Query(terms=[], mode="or", k=10**9,
                               synonyms=[(group, 1.0)]))
    # hand-compute over the raw corpus
    tok = _re.compile(r"[0-9a-z]+")
    docs = {}
    dls = {}
    dfs = {t: 0 for t in group}
    corpus = pq.read_table(small_corpus).to_pandas()
    for row in corpus.itertuples():
        toks = tok.findall(row.text.lower())
        dls[(row.conv_id, row.turn_idx)] = len(toks)
        tf = sum(toks.count(t) for t in group)
        for t in group:
            if t in toks:
                dfs[t] += 1
        if tf:
            docs[(row.conv_id, row.turn_idx)] = tf
    n_docs = len(corpus)
    avgdl = sum(dls.values()) / n_docs
    df_max = max(dfs.values())
    w = bm25_idf(df_max, n_docs)
    want = {}
    for key, tf in docs.items():
        ldl = float(NORM_DECODE_TABLE[encode_norms(np.array([dls[key]]))[0]])
        want[key] = w * tf / (tf + K1 * (1 - B + B * ldl / avgdl))
    assert len(got) == len(want)
    for _rank, conv_id, turn_idx, score in got:
        np.testing.assert_allclose(
            score, want[(conv_id, turn_idx)], rtol=1e-12
        )
    # absent member is a no-op
    got2 = s.search_query(Query(terms=[], mode="or", k=10**9,
                                synonyms=[(group + ["zzzmissing"], 1.0)]))
    assert got == got2


def test_boolean_query_parser_and_semantics(small_index):
    """Parenthesized boolean trees: grammar shapes, loud rejection of
    pure negation / NOT under OR, and match semantics vs a hand-computed
    doc set (score = sum of matching positive leaves only)."""
    from rindex.search import (
        IndexSearcher, Query, parse_boolean_query,
    )

    t = parse_boolean_query("(data OR query) AND row AND NOT sort")
    assert t[0] == "and"
    assert t[1][0] == ("or", [("term", "data"), ("term", "query")])
    assert t[1][2] == ("not", ("term", "sort"))
    for bad in ["NOT data", "data OR NOT query", "NOT data AND NOT query",
                "(data", "data)", "data AND"]:
        with pytest.raises(ValueError):
            parse_boolean_query(bad)

    idx, _ = small_index
    s = IndexSearcher(idx)
    got = s.search_boolean(t, k=10**9)
    got_ids = {r[1:-1] for r in got}
    # reference sets from single-term queries (k unbounded)
    def ids(term):
        return {r[1:-1] for r in s.search_query(
            Query(terms=[term], mode="or", k=10**9))}
    want = (ids("data") | ids("query")) & ids("row") - ids("sort")
    assert got_ids == want
    # scores: sum of the positive leaves' per-doc scores
    leaf = {}
    for term in ["data", "query", "row"]:
        for r in s.search_query(Query(terms=[term], mode="or", k=10**9)):
            leaf[(term, r[1:-1])] = r[-1]
    for r in got:
        key = r[1:-1]
        want_s = sum(leaf.get((term, key), 0.0)
                     for term in ["data", "query", "row"])
        np.testing.assert_allclose(r[-1], want_s, rtol=1e-9)


def test_phrase_synonym_kernel_honors_zero_clamp_contract(small_index):
    """The score>0 hit contract must hold on the phrase/synonym kernel too:
    under LMDirichlet (whose max(0,.) clamp can zero a matched doc) every
    returned hit scores > 0, like every other kernel and every oracle's
    WHERE s > 0."""
    from rindex.search import Query

    idx, _ = small_index
    s = IndexSearcher(idx, similarity="lmdirichlet")
    # a single-member synonym group must equal the plain term query
    # BIT-FOR-BIT under the clamping similarity: both kernels must drop
    # the same clamped-zero docs (the dense path used to keep zero-score
    # hits on the phrase/synonym channel)
    for term in ["data", "spark", "query"]:
        via_term = s.search_query(Query(terms=[term], mode="or", k=10**9))
        via_syn = s.search_query(
            Query(terms=[], mode="or", k=10**9,
                  synonyms=[([term], 1.0)])
        )
        assert via_term == via_syn, term
        assert all(r[-1] > 0 for r in via_syn)


def test_wand_equals_exhaustive_axiomatic(small_index):
    """AxiomaticF2EXP is registered purely as an ExpressionSimilarity —
    the compiled expressions must keep the pruned path bit-identical to
    the exhaustive one, with strictly positive scores (ratio form)."""
    idx, _ = small_index
    s = IndexSearcher(idx, similarity="axiomatic_f2exp")
    queries = make_queries()
    a = s.search_table(queries, algo="wand")
    b = s.search_table(queries, algo="exhaustive")
    assert a.equals(b)
    assert (a["score"].to_numpy() > 0).all()


def test_wand_equals_exhaustive_sweetspot_similarity(small_index):
    """SweetSpotSimilarity's plateau norm is flat then decreasing (min=1),
    so the block bound at block_min_norm stays valid: the pruned path must
    equal the exhaustive one bit-for-bit."""
    idx, _ = small_index
    s = IndexSearcher(idx, similarity="sweetspot")
    queries = make_queries()
    a = s.search_table(queries, algo="wand")
    b = s.search_table(queries, algo="exhaustive")
    assert a.equals(b)


def test_sweetspot_plateau_is_flat_then_decreasing():
    import numpy as np

    from rindex.similarity import SIMILARITIES

    sim = SIMILARITIES["sweetspot"]
    cache = sim.norm_cache(avgdl=30.0)
    from rindex.codec import NORM_DECODE_TABLE

    dl = np.maximum(NORM_DECODE_TABLE.astype(np.float64), 1.0)
    order = np.argsort(dl, kind="stable")
    dls, cs = dl[order], cache[order]
    # score divides by the cache: flat where dl <= MAX, increasing after
    flat = dls <= sim.MAX
    assert np.allclose(cs[flat], 1.0)
    tail = cs[~flat]
    assert (np.diff(tail) >= 0).all()


def test_similarity_conformance_matrix(small_index):
    """ALL registered Similarity SPI members sweep through WAND ==
    exhaustive on one query set (the r3 verdict's conformance-matrix
    item): the block-max bounds must be recomputed correctly from EVERY
    plugged similarity, and every score must be strictly positive and
    finite (the unclamped-WAND contract each class documents)."""
    import numpy as np

    from rindex.similarity import SIMILARITIES

    idx, _ = small_index
    queries = make_queries()
    for name in sorted(SIMILARITIES):
        s = IndexSearcher(idx, similarity=name)
        a = s.search_table(queries, algo="wand")
        b = s.search_table(queries, algo="exhaustive")
        assert a.equals(b), f"WAND != exhaustive under {name}"
        scores = a["score"].to_numpy(zero_copy_only=False)
        assert np.isfinite(scores).all(), name
        assert (scores > 0).all(), name
