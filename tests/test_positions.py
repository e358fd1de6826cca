"""Positional postings (with_positions builds): codec round-trip, build-mode
equivalence, phrase search vs a naive full-scan oracle, and survival through
incremental append + forceMerge (docID remap).

Reference invariants mirrored: positions ascending within each doc run,
sum(run lengths) == ttf, phrase matching == ExactPhraseMatcher semantics
(`lucene/core/src/java/org/apache/lucene/search/ExactPhraseMatcher.java`).
"""

import re
import shutil

import numpy as np
import pyarrow.parquet as pq
import pytest

from rindex.analysis import standard_tokenize
from rindex.codec import decode_positions, encode_positions_batch


def _random_term_positions(rng, n_terms=40):
    all_pos, bounds, run_mask, per_term = [], [0], [], []
    for _ in range(n_terms):
        n_docs = int(rng.integers(1, 25))
        tfs = rng.integers(1, 7, n_docs)
        runs = []
        for tf in tfs:
            runs.append(np.sort(rng.choice(3000, size=int(tf), replace=False)))
            run_mask.extend([True] + [False] * (int(tf) - 1))
        flat = np.concatenate(runs)
        all_pos.append(flat)
        bounds.append(bounds[-1] + len(flat))
        per_term.append((tfs.astype(np.int64), flat))
    return (
        np.concatenate(all_pos),
        np.array(bounds, dtype=np.int64),
        np.array(run_mask, dtype=bool),
        per_term,
    )


def test_positions_codec_roundtrip():
    rng = np.random.default_rng(11)
    positions, bounds, mask, per_term = _random_term_positions(rng)
    packed, offsets, widths = encode_positions_batch(bounds, mask, positions)
    for t, (tfs, flat) in enumerate(per_term):
        blob = packed[offsets[t]: offsets[t + 1]].tobytes()
        dec = decode_positions(blob, int(widths[t]), tfs)
        assert np.array_equal(dec, flat)


def _naive_phrase(src, phrase):
    tbl = pq.read_table(src, columns=["doc_id", "text"])
    terms = phrase.split()
    out = []
    for did, txt in zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()):
        toks = standard_tokenize(txt or "")
        n = sum(
            1
            for i in range(len(toks) - len(terms) + 1)
            if toks[i: i + len(terms)] == terms
        )
        if n:
            out.append((did, n))
    out.sort()
    return out


SRC = "/root/testdata/sf0.001/documents.parquet"
PHRASES = ["hash join", "the value", "big order scan", "nosuchword here"]


@pytest.mark.parametrize("mode", ["local", "term_shuffle"])
def test_phrase_search_vs_naive_oracle(ray_session, tmp_path, mode):
    from rindex.build import build_index
    from rindex.search import IndexSearcher

    idx = str(tmp_path / f"pos-{mode}")
    build_index(
        SRC, idx, num_segments=4, mode=mode, id_cols=("doc_id",),
        text_col="text", keep_cols=("lang",), with_positions=True,
    )
    s = IndexSearcher(idx)
    for phrase in PHRASES:
        got = [(h[0], h[1]) for h in s.search_phrase(phrase)]
        assert got == _naive_phrase(SRC, phrase), (mode, phrase)


def test_phrase_after_append_and_force_merge(ray_session, tmp_path):
    import ray.data as rd

    from rindex.build import append_index, build_index
    from rindex.merge import run_merges
    from rindex.search import IndexSearcher

    idx = str(tmp_path / "pos-merge")
    shutil.rmtree(idx, ignore_errors=True)
    ids = pq.read_table(SRC, columns=["doc_id"])["doc_id"].to_numpy()
    cut = int(np.median(ids))
    kw = dict(
        num_segments=4, mode="term_shuffle", id_cols=("doc_id",),
        text_col="text", keep_cols=("lang",), with_positions=True,
    )
    build_index(rd.read_parquet(SRC).filter(expr=f"doc_id < {cut}"), idx, **kw)
    append_index(
        rd.read_parquet(SRC).filter(expr=f"doc_id >= {cut}"),
        idx, mode="term_shuffle",
    )
    run_merges(idx, force=True)
    s = IndexSearcher(idx)
    for phrase in PHRASES[:3]:
        got = [(h[0], h[1]) for h in s.search_phrase(phrase)]
        assert got == _naive_phrase(SRC, phrase), phrase


def test_positions_reader_errors_without_positions(ray_session, tmp_path):
    from rindex.build import build_index
    from rindex.search import IndexSearcher

    idx = str(tmp_path / "no-pos")
    build_index(
        SRC, idx, num_segments=2, mode="local", id_cols=("doc_id",),
        text_col="text", keep_cols=(), with_positions=False,
    )
    s = IndexSearcher(idx)
    with pytest.raises(ValueError, match="without positions"):
        s.readers[0].positions_for(["hash"])


def _naive_proximity(src, a, b, window):
    tbl = pq.read_table(src, columns=["doc_id", "text"])
    out = []
    for did, txt in zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()):
        toks = standard_tokenize(txt or "")
        pa_ = [i for i, t in enumerate(toks) if t == a]
        pb_ = [i for i, t in enumerate(toks) if t == b]
        if not pa_ or not pb_:
            continue
        span = min(abs(i - j) + 1 for i in pa_ for j in pb_)
        if span <= window:
            out.append((did, span))
    out.sort()
    return out


def test_proximity_search_vs_naive(ray_session, tmp_path):
    from rindex.build import build_index
    from rindex.search import IndexSearcher

    idx = str(tmp_path / "pos-prox")
    build_index(
        SRC, idx, num_segments=4, mode="term_shuffle", id_cols=("doc_id",),
        text_col="text", keep_cols=(), with_positions=True,
    )
    s = IndexSearcher(idx)
    for a, b, w in [("hash", "scan", 5), ("sort", "merge", 3)]:
        got = [(h[0], h[1]) for h in s.search_proximity(f"{a} {b}", window=w)]
        assert got == _naive_proximity(SRC, a, b, w), (a, b, w)


def _naive_proximity_k(src, terms, window):
    tbl = pq.read_table(src, columns=["doc_id", "text"])
    out = []
    for did, txt in zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()):
        toks = standard_tokenize(txt or "")
        pos = [[i for i, t in enumerate(toks) if t == term] for term in terms]
        if any(not p for p in pos):
            continue
        # brute-force min cover span over the cartesian product
        import itertools

        best = min(
            max(c) - min(c) + 1 for c in itertools.product(*pos)
        )
        if best <= window:
            out.append((did, best))
    out.sort()
    return out


def test_proximity_three_terms(ray_session, tmp_path):
    from rindex.build import build_index
    from rindex.search import IndexSearcher

    idx = str(tmp_path / "pos-prox3")
    build_index(
        SRC, idx, num_segments=4, mode="term_shuffle", id_cols=("doc_id",),
        text_col="text", keep_cols=(), with_positions=True,
    )
    s = IndexSearcher(idx)
    terms = ["hash", "scan", "sort"]
    got = [(h[0], h[1]) for h in s.search_proximity(" ".join(terms), window=8)]
    assert got == _naive_proximity_k(SRC, terms, 8)


def _naive_span_near(src, a, b, slop):
    t = pq.read_table(src, columns=["doc_id", "text"])
    out = []
    for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        toks = re.findall(r"[0-9a-z]+", (text or "").lower())
        best = None
        for i, x in enumerate(toks):
            if x != a:
                continue
            for j in range(i + 1, len(toks)):
                if toks[j] == b:
                    w = j - i + 1
                    best = w if best is None else min(best, w)
                    break
        if best is not None and best - 2 <= slop:
            out.append((did, best))
    out.sort()
    return out


def test_span_near_and_span_first_vs_naive(ray_session, tmp_path):
    from rindex.build import build_index
    from rindex.search import IndexSearcher

    idx = str(tmp_path / "pos-span")
    build_index(
        SRC, idx, num_segments=4, mode="local", id_cols=("doc_id",),
        text_col="text", keep_cols=("lang",), with_positions=True,
    )
    s = IndexSearcher(idx)
    got = [(h[0], h[1]) for h in s.search_span_near("hash join", slop=3)]
    assert got == _naive_span_near(SRC, "hash", "join", 3)
    # ordered != symmetric: the reversed query matches a different set
    rev = [(h[0], h[1]) for h in s.search_span_near("join hash", slop=3)]
    assert rev == _naive_span_near(SRC, "join", "hash", 3)
    assert got != rev
    # span_first vs naive first-position scan
    t = pq.read_table(SRC, columns=["doc_id", "text"])
    want = []
    for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        toks = re.findall(r"[0-9a-z]+", (text or "").lower())
        if "spark" in toks and toks.index("spark") < 6:
            want.append((did, toks.index("spark")))
    want.sort()
    assert [(h[0], h[1]) for h in s.search_span_first("spark", end=6)] == want


def _naive_span_near_unordered(src, a, b, slop):
    t = pq.read_table(src, columns=["doc_id", "text"])
    out = []
    for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        toks = re.findall(r"[0-9a-z]+", (text or "").lower())
        pa_ = [i for i, x in enumerate(toks) if x == a]
        pb_ = [j for j, x in enumerate(toks) if x == b]
        if not pa_ or not pb_:
            continue
        best = min(abs(i - j) + 1 for i in pa_ for j in pb_)
        if best - 2 <= slop:
            out.append((did, best))
    out.sort()
    return out


def _naive_span_not(src, a, b, exclude, slop):
    t = pq.read_table(src, columns=["doc_id", "text"])
    out = []
    for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        toks = re.findall(r"[0-9a-z]+", (text or "").lower())
        widths = []
        for i, x in enumerate(toks):
            if x != a:
                continue
            for j in range(i + 1, len(toks)):
                if toks[j] == b:
                    # minimal chain from this start only
                    if j - i + 1 - 2 <= slop and exclude not in toks[i:j + 1]:
                        widths.append(j - i + 1)
                    break
        if widths:
            out.append((did, min(widths)))
    out.sort()
    return out


def test_span_unordered_and_span_not_vs_naive(ray_session, tmp_path):
    from rindex.build import build_index
    from rindex.search import IndexSearcher

    idx = str(tmp_path / "pos-span-u")
    build_index(
        SRC, idx, num_segments=4, mode="local", id_cols=("doc_id",),
        text_col="text", keep_cols=(), with_positions=True,
    )
    s = IndexSearcher(idx)
    # unordered: symmetric — both argument orders give the identical set
    got = [(h[0], h[1])
           for h in s.search_span_near("join hash", slop=3, in_order=False)]
    assert got == _naive_span_near_unordered(SRC, "hash", "join", 3)
    rev = [(h[0], h[1])
           for h in s.search_span_near("hash join", slop=3, in_order=False)]
    assert rev == got
    # unordered is a superset of ordered at the same slop
    ordered = {h[0] for h in s.search_span_near("hash join", slop=3)}
    assert ordered <= {d for d, _ in got}
    # span_not: per-start minimal chains with the exclusion overlap killed
    sn = [(h[0], h[1])
          for h in s.search_span_not("hash join", exclude="spark", slop=3)]
    assert sn == _naive_span_not(SRC, "hash", "join", "spark", 3)
    # non-vacuous: the exclusion must actually prune vs the ordered op
    assert {d for d, _ in sn} < ordered
    # duplicate terms rejected loudly in unordered mode
    with pytest.raises(ValueError):
        s.search_span_near("hash hash", slop=1, in_order=False)
    with pytest.raises(ValueError):
        s.search_span_not("hash join", exclude="big data", slop=3)


def test_span_or_near_vs_naive(ray_session, tmp_path):
    """spanNear([spanOr(a, b), c]): the OR group's merged starts chain to
    the then-term; equals the UNION of the two single-start span_near
    result sets with per-doc min width."""
    from rindex.build import build_index
    from rindex.search import IndexSearcher

    idx = str(tmp_path / "pos-spanor")
    build_index(
        SRC, idx, num_segments=4, mode="local", id_cols=("doc_id",),
        text_col="text", keep_cols=("lang",), with_positions=True,
    )
    s = IndexSearcher(idx)
    got = [(h[0], h[1]) for h in s.search_span_or_near(
        "hash sort", "join", slop=3)]

    # naive: per doc take min width over both group members, same slop
    a = dict(_naive_span_near(SRC, "hash", "join", 10**9))
    b = dict(_naive_span_near(SRC, "sort", "join", 10**9))
    want = []
    for did in sorted(set(a) | set(b)):
        w = min(a.get(did, 10**9), b.get(did, 10**9))
        if w - 2 <= 3:
            want.append((did, w))
    assert got == want
    # strict superset relationship with each single-member query
    single = dict(_naive_span_near(SRC, "hash", "join", 3))
    assert set(single) <= {d for d, _ in got}
    with pytest.raises(ValueError):
        s.search_span_or_near("hash", "join", slop=3)
