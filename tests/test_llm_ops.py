"""Unit contracts for the LLM-pipeline ops added on top of the reference
surface: contamination n-gram hashing and int8 scalar quantization."""

import numpy as np


def test_gram_hashes_count_and_determinism():
    from rindex.ops.textstats import CONTAM_NGRAM, _gram_hashes

    text = "a b c d e f g"
    g = _gram_hashes(text)
    # 7 tokens -> 7 - 4 + 1 = 4 distinct 4-grams
    assert len(g) == 7 - CONTAM_NGRAM + 1
    assert (np.sort(g) == g).all()  # np.unique output is sorted
    np.testing.assert_array_equal(g, _gram_hashes(text))
    # shorter than n emits nothing
    assert len(_gram_hashes("a b c")) == 0
    # shifted window shares exactly the overlapping grams
    g2 = _gram_hashes("b c d e f g h")
    assert len(np.intersect1d(g, g2)) == len(g) - 1


def test_int8_quantization_reconstruction_bound():
    """Half-up symmetric quantization: |x - code/scale| <= 1/(2*scale),
    and the max-|x| element always hits full scale (|code| == 127)."""
    rng = np.random.Generator(np.random.PCG64(7))
    for _ in range(20):
        x = rng.normal(0, 0.3, 64)
        maxabs = np.abs(x).max()
        scale = 127.0 / maxabs
        codes = np.floor(x * scale + 0.5)
        assert np.abs(codes).max() == 127
        recon = codes / scale
        assert np.abs(x - recon).max() <= 0.5 / scale + 1e-12


# ---------------------------------------------------------------------------
# Boolean-tree property tests (hypothesis): parse -> evaluate vs a naive
# Python reference over random token sets
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_TERMS = ["alpha", "beta", "gamma", "delta"]


def _rand_tree(draw, depth):
    """Random VALID query string + its Python predicate (NOT only as an
    AND operand with a positive sibling — the parser's legality rule)."""
    if depth == 0 or draw(st.integers(0, 2)) == 0:
        t = draw(st.sampled_from(_TERMS))
        return t, (lambda toks, t=t: t in toks)
    kind = draw(st.sampled_from(["and", "or"]))
    n = draw(st.integers(2, 3))
    parts = [_rand_tree(draw, depth - 1) for _ in range(n)]
    if kind == "and" and draw(st.booleans()):
        # append a NOT operand (legal: positive siblings exist)
        nt, nf = _rand_tree(draw, depth - 1)
        s = " AND ".join(f"({p[0]})" for p in parts) + f" AND NOT ({nt})"
        fns = [p[1] for p in parts]
        return s, (lambda toks, fns=fns, nf=nf:
                   all(f(toks) for f in fns) and not nf(toks))
    op = " AND " if kind == "and" else " OR "
    s = op.join(f"({p[0]})" for p in parts)
    fns = [p[1] for p in parts]
    agg = all if kind == "and" else any
    return s, (lambda toks, fns=fns, agg=agg: agg(f(toks) for f in fns))


@settings(max_examples=60, deadline=None)
@given(st.data())
def test_boolean_tree_eval_matches_reference(data):
    from rindex.search import parse_boolean_query

    qs, ref = data.draw(st.composite(lambda draw: _rand_tree(draw, 3))())
    tree = parse_boolean_query(qs)

    def ev(node, toks):
        if node[0] == "term":
            return node[1] in toks
        if node[0] == "not":
            return not ev(node[1], toks)
        parts = [ev(ch, toks) for ch in node[1]]
        return all(parts) if node[0] == "and" else any(parts)

    subsets = data.draw(
        st.lists(st.sets(st.sampled_from(_TERMS)), min_size=4, max_size=8)
    )
    for toks in subsets:
        assert ev(tree, toks) == ref(toks), (qs, toks)


def test_range_facet_edge_semantics():
    """facet.range bucket assignment: lower-inclusive, upper-exclusive,
    hardend start arithmetic, before/after boundaries — exact values ON
    the edges must land per include=lower."""
    from rindex.ops.facets import RANGE_END, RANGE_GAP, RANGE_START

    edges = np.arange(RANGE_START, RANGE_END, RANGE_GAP, dtype=np.float64)
    edges_full = np.append(edges, float(RANGE_END))

    def label_of(v):
        idx = int(np.searchsorted(edges_full, [v], side="right")[0]) - 1
        if idx < 0:
            return "before"
        if idx >= len(edges):
            return "after"
        return str(int(edges[idx]))

    assert label_of(RANGE_START - 0.01) == "before"
    assert label_of(RANGE_START) == str(RANGE_START)          # lower incl
    assert label_of(RANGE_START + RANGE_GAP) == str(RANGE_START + RANGE_GAP)
    assert label_of(RANGE_START + RANGE_GAP - 0.01) == str(RANGE_START)
    assert label_of(RANGE_END - 0.01) == str(
        RANGE_START + ((RANGE_END - RANGE_START - 1) // RANGE_GAP) * RANGE_GAP
    )  # hardend: last bucket start is the last gap multiple
    assert label_of(RANGE_END) == "after"                     # upper excl


def test_c4_clean_batch_edge_cases():
    """C4 line-cleaner kernel vs a naive per-row reference on edge
    shapes the corpus never hits: empty text, every-line-dropped docs,
    exact width boundaries, blocklist hits in first/middle/last line."""
    import pyarrow as pa

    from rindex.ops.textstats import (
        C4_BAD_WORDS, C4_LINE_W, C4_MIN_LINES, C4_MIN_WORDS, c4_clean_batch,
    )

    def naive(text):
        toks = text.split(" ") if text else [""]
        lines = [toks[i:i + C4_LINE_W]
                 for i in range(0, len(toks), C4_LINE_W)]
        kept = [" ".join(ln) for ln in lines
                if len(ln) >= C4_MIN_WORDS
                and not any(w in C4_BAD_WORDS for w in ln)]
        return ("\n".join(kept), len(kept), len(lines) - len(kept),
                int(len(kept) >= C4_MIN_LINES))

    w = C4_LINE_W
    texts = [
        "",                                     # empty -> 1 empty line
        " ".join(["tok"] * w),                  # exactly one full line
        " ".join(["tok"] * (w + 1)),            # full line + 1-word tail
        " ".join(["tok"] * (2 * w)),            # two full lines
        " ".join([C4_BAD_WORDS[0]] * (3 * w)),  # all lines blocklisted
        " ".join(["tok"] * (w - 1) + [C4_BAD_WORDS[1]] + ["tok"] * w),
        " ".join(["a"] * (C4_MIN_WORDS - 1)),   # single short line
        " ".join(["tok"] * w + ["b"] * (C4_MIN_WORDS - 1)),
    ]
    t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    got = c4_clean_batch(t).to_pandas()
    for i, text in enumerate(texts):
        ct, nk, nd, kp = naive(text)
        row = got.iloc[i]
        assert row["clean_text"] == ct, (i, text)
        assert row["n_kept"] == nk and row["n_dropped"] == nd
        assert row["kept"] == kp


def test_unigram_nll_and_domain_cap(ray_session):
    """CCNet-style unigram LM: every bucket non-vacuous on the driver
    corpus, nll matches a naive per-doc recompute; domain cap keeps
    exactly CAP per source (all, when a source is smaller)."""
    import numpy as np
    import pyarrow.parquet as pq

    from rindex.ops.textstats import (
        DOMAIN_CAP,
        q_domain_cap_documents,
        q_unigram_nll_documents,
    )

    sf = "/root/testdata/sf0.001"
    got = q_unigram_nll_documents(sf).to_pandas().set_index("doc_id")
    assert set(got["ppl_bucket"]) == {"head", "middle", "tail"}

    # naive reference on a sample of docs
    import re

    from rindex.ops.fulltext import TOKEN_PY_RE

    docs = pq.read_table(
        f"{sf}/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas()
    tok = re.compile(TOKEN_PY_RE)
    from collections import Counter

    cnt: Counter = Counter()
    per_doc = {}
    for r in docs.itertuples():
        ts = tok.findall(r.text.lower())
        per_doc[int(r.doc_id)] = ts
        cnt.update(ts)
    T = float(sum(cnt.values()))
    for did in list(per_doc)[:25]:
        ts = per_doc[did]
        want = -np.mean([np.log(cnt[t] / T) for t in ts])
        assert abs(got.loc[did, "nll"] - round(want, 6)) < 2e-6
        assert got.loc[did, "n_tok"] == len(ts)

    kept = q_domain_cap_documents(sf).to_pandas()
    sizes = docs.join(
        pq.read_table(f"{sf}/documents.parquet", columns=["source"])
        .to_pandas()
    ).groupby("source").size()
    per_src = kept.groupby("source").size()
    for src, n in per_src.items():
        assert n == min(DOMAIN_CAP, sizes[src])


def test_boilerplate_removal_binds_and_reassembles(ray_session):
    """The df>=BP_DF filter provably binds on the driver corpus, kept +
    dropped re-adds to the doc's slot count, and clean_text holds
    exactly the surviving lines in order."""
    import numpy as np
    import pyarrow.parquet as pq

    from rindex.ops.textstats import (
        BP_DF,
        BP_W,
        q_boilerplate_removal_documents,
    )

    sf = "/root/testdata/sf0.001"
    got = q_boilerplate_removal_documents(sf).to_pandas().set_index("doc_id")
    assert (got["n_dropped"] > 0).any()          # binds
    assert (got["n_kept"] > 0).all()             # never empties a doc here

    docs = pq.read_table(
        f"{sf}/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas()
    from collections import Counter

    def lines_of(text):
        toks = (text or "").split(" ")
        return [
            " ".join(toks[k: k + BP_W]) for k in range(0, len(toks), BP_W)
        ]

    df_cnt: Counter = Counter()
    for r in docs.itertuples():
        for ln in set(lines_of(r.text)):
            df_cnt[ln] += 1
    bad = {ln for ln, c in df_cnt.items() if c >= BP_DF}
    assert bad  # the corpus really has boilerplate at this width
    for r in docs.sample(30, random_state=7).itertuples():
        ls = lines_of(r.text)
        keep = [ln for ln in ls if ln not in bad]
        row = got.loc[int(r.doc_id)]
        assert row["clean_text"] == "\n".join(keep)
        assert row["n_kept"] == len(keep)
        assert row["n_dropped"] == len(ls) - len(keep)


def test_chunk_windows_edge_cases(ray_session):
    """Overlap chunking: stride coverage, short-tail windows, tiny-doc
    chunk-0 guarantee, and overlap reconstruction."""
    from rindex.ops.textstats import (
        CHUNK_STRIDE,
        CHUNK_W,
        q_chunk_windows_documents,
    )

    sf = "/root/testdata/sf0.001"
    got = q_chunk_windows_documents(sf).to_pandas()
    import pyarrow.parquet as pq

    docs = pq.read_table(
        f"{sf}/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas().set_index("doc_id")
    g = got.groupby("doc_id")
    for did, grp in list(g)[:40]:
        toks = docs.loc[did, "text"].split(" ")
        n = len(toks)
        want_chunks = max(1, -(-n // CHUNK_STRIDE))
        grp = grp.sort_values("chunk_idx")
        assert grp["chunk_idx"].tolist() == list(range(want_chunks))
        for r in grp.itertuples():
            seg = toks[r.chunk_idx * CHUNK_STRIDE:
                       r.chunk_idx * CHUNK_STRIDE + CHUNK_W]
            assert r.chunk_text == " ".join(seg)
            assert r.n_tok == len(seg)


def test_bpe_merge_rounds_reference_semantics():
    """BPE kernel vs hand-worked example: greedy max-count merges,
    pair-asc ties, left-to-right non-overlapping replace (the 'aaa'
    case), multi-char symbols in later rounds."""
    from rindex.ops.textstats import bpe_merge_rounds

    rows = bpe_merge_rounds({"aaa": 2, "aab": 1}, 2)
    # round 0: pairs 'a a' = 2*2 + 1 = 5, 'a b' = 1 -> merge 'a a'
    assert rows[0] == (0, "a a", "aa", 5)
    # 'a a a' -> 'aa a' (non-overlapping), 'a a b' -> 'aa b'
    # round 1: 'aa a' = 2, 'aa b' = 1 -> merge 'aa a'
    assert rows[1] == (1, "aa a", "aaa", 2)

    # tie: 'ab'(x1) and 'cd'(x1) -> 'a b' vs 'c d' both 1; pair-asc wins
    rows = bpe_merge_rounds({"ab": 1, "cd": 1}, 1)
    assert rows[0][1] == "a b"


def test_bpe_boundary_rule_no_glue():
    """Sennrich boundary rule: a merge pair must match whole symbols —
    'a b' never glues into the multi-char symbol 'bc'; zero-width
    boundaries let chained occurrences all merge."""
    from rindex.ops.textstats import _bpe_apply, bpe_merge_rounds

    assert _bpe_apply("x a bc", "a b", "ab") == "x a bc"
    assert _bpe_apply("a b a b", "a b", "ab") == "ab ab"
    rows = bpe_merge_rounds({"ab": 5, "xabc": 1, "bc": 6}, 2)
    assert rows[0] == (0, "b c", "bc", 7)
    assert rows[1] == (1, "a b", "ab", 5)  # only whole-symbol sites


def test_substring_dedup_span_coverage_kernel():
    """Interval-union kernel: overlapping, touching, disjoint and
    cross-doc window starts."""
    import numpy as np

    from rindex.ops.dedup import _span_coverage, _window_hashes

    k = 4
    # doc 0: starts 0,2 overlap -> union [0,6) = 6; doc 1: disjoint
    # 0 and 10 -> 8; doc 2: touching 0 and 4 -> 8; doc 3: single -> 4
    starts = np.array([0, 2, 0, 10, 0, 4, 7], dtype=np.int64)
    docs = np.array([0, 0, 1, 1, 2, 2, 3], dtype=np.int64)
    d, cov = _span_coverage(starts, docs, k)
    np.testing.assert_array_equal(d, [0, 1, 2, 3])
    np.testing.assert_array_equal(cov, [6, 8, 8, 4])
    d, cov = _span_coverage(
        np.empty(0, np.int64), np.empty(0, np.int64), k
    )
    assert len(d) == 0 and len(cov) == 0
    # window hashes: in-order, one per start, shift shares k-1 windows
    toks = list("abcdefgh")
    h = _window_hashes(toks, k=4)
    assert len(h) == 5
    h2 = _window_hashes(list("bcdefgh"), k=4)
    np.testing.assert_array_equal(h[1:], h2)
    assert len(_window_hashes(list("abc"), k=4)) == 0


def test_sessionize_gap_semantics(ray_session):
    """Two users, crafted gaps: session breaks strictly-greater than the
    gap, ties on ts keep one session, per-user independence."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from rindex.ops.relational import SESSION_GAP_S, q_sessionize_events

    base = pd.Timestamp("2026-01-01")
    g = pd.Timedelta(seconds=SESSION_GAP_S)
    rows = [
        # user 1: exactly-gap stays, gap+1s breaks
        (1, 1, base), (2, 1, base + g), (3, 1, base + 2 * g + pd.Timedelta(seconds=1)),
        # user 2: tied timestamps in one session
        (4, 2, base), (5, 2, base), (6, 2, base + pd.Timedelta(seconds=5)),
    ]
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
        }
    )
    import tempfile, os
    d = tempfile.mkdtemp(prefix="sess_")
    pq.write_table(tbl, os.path.join(d, "events.parquet"))
    out = q_sessionize_events(d).to_pandas().sort_values(
        ["user_id", "session_idx"]).reset_index(drop=True)
    u1 = out[out.user_id == 1]
    assert list(u1.n_events) == [2, 1]          # gap==threshold stays
    assert list(u1.duration_s) == [SESSION_GAP_S, 0]
    u2 = out[out.user_id == 2]
    assert list(u2.n_events) == [3] and list(u2.duration_s) == [5]
