"""Text Tagger overlap policy + CoveringQuery threshold edge cases on a
hand-built corpus (the registered ops' oracles check corpus-wide equality;
these pin the tricky overlap/threshold semantics doc by doc)."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def tag_index(ray_session, tmp_path_factory):
    from rindex.build import build_index

    rows = [
        # doc 0: "hash join" bigram + a free-standing "join"
        (0, 0, "hash join beats plain join here"),
        # doc 1: back-to-back bigrams; the middle "join merge" must NOT
        # produce a MERGE_JOIN (merge is followed by join, not preceded)
        (1, 0, "hash join merge join spark"),
        # doc 2: "join" at position 0 (no predecessor -> solo)
        (2, 0, "join first then spark spark"),
        # doc 3: merge join only
        (3, 0, "a merge join plan"),
    ]
    tmp = tmp_path_factory.mktemp("tagger")
    t = pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.int64()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "text": pa.array([r[2] for r in rows], pa.string()),
        }
    )
    src = tmp / "src"
    src.mkdir()
    pq.write_table(t, str(src / "part-0.parquet"))
    idx = str(tmp / "idx")
    build_index(
        str(src), idx, num_segments=2, mode="local", keep_cols=(),
        with_positions=True,
    )
    return idx


def _tag_counts(index_dir):
    """Run the tagger kernel over a custom index, keyed by (conv_id, tag)."""
    import numpy as np

    from rindex.ops import tagger as T
    from rindex.search import IndexSearcher
    from rindex.ops.lucene8 import _flat_doc_pos

    s = IndexSearcher(index_dir)
    out = {}
    terms = sorted({t for seq in T.TAG_DICT.values() for t in seq})
    for r in s.readers:
        posts = r.positions_for(terms)
        fd = {t: _flat_doc_pos(posts, [t]) for t in terms}
        maxp = max((int(p.max()) for _, p in fd.values() if len(p)),
                   default=0)
        stride = np.int64(maxp + 2)
        keyset = {t: np.sort(d * stride + p) for t, (d, p) in fd.items()}

        def adj(first, second):
            d, p = fd[first]
            if not len(d) or not len(keyset[second]):
                return np.empty(0, np.int64), np.empty(0, np.int64)
            want = d * stride + p + 1
            have = keyset[second]
            i = np.searchsorted(have, want)
            hit = (i < len(have)) & (
                have[np.minimum(i, len(have) - 1)] == want
            )
            return d[hit], p[hit]

        per_tag, covered = {}, []
        for tag, seq in T.TAG_DICT.items():
            if len(seq) == 2:
                d, p = adj(seq[0], seq[1])
                per_tag[tag] = (d, p)
                covered.append(d * stride + p)
                covered.append(d * stride + p + 1)
        ck = (np.sort(np.concatenate(covered)) if covered
              else np.empty(0, np.int64))
        for tag, seq in T.TAG_DICT.items():
            if len(seq) == 1:
                d, p = fd[seq[0]]
                if len(d) and len(ck):
                    free = ~np.isin(d * stride + p, ck)
                    d, p = d[free], p[free]
                per_tag[tag] = (d, p)
        for tag, (d, _) in per_tag.items():
            if not len(d):
                continue
            docs, cnt = np.unique(d, return_counts=True)
            ids = r.fetch_ids(docs, ["conv_id"])
            for local, c in zip(docs, cnt):
                key = (ids[int(local)][0], tag)
                out[key] = out.get(key, 0) + int(c)
    return out


def test_longest_dominant_right(tag_index):
    got = _tag_counts(tag_index)
    # doc 0: one HASH_JOIN; the second "join" is free-standing
    assert got[(0, "HASH_JOIN")] == 1
    assert got[(0, "JOIN")] == 1
    # doc 1: hash join + merge join; both "join"s consumed, no solo JOIN
    assert got[(1, "HASH_JOIN")] == 1
    assert got[(1, "MERGE_JOIN")] == 1
    assert (1, "JOIN") not in got
    assert got[(1, "SPARK")] == 1
    # doc 2: leading "join" has no predecessor -> solo; two SPARKs
    assert got[(2, "JOIN")] == 1
    assert got[(2, "SPARK")] == 2
    # doc 3: merge join only
    assert got[(3, "MERGE_JOIN")] == 1
    assert (3, "JOIN") not in got


def test_covering_threshold_semantics():
    """CoveringQuery per-doc threshold: the n_matched >= min_required gate
    (engine result already oracle-checked; pin the pandas filter logic on
    a synthetic frame to guard refactors)."""
    import pandas as pd

    from rindex.ops.lucene8 import CQ_MIN_EN, CQ_MIN_OTHER

    df = pd.DataFrame(
        {
            "lang": ["en", "en", "de", "de"],
            "n": [3, 2, 2, 1],
        }
    )
    need = df["lang"].map(lambda x: CQ_MIN_EN if x == "en" else CQ_MIN_OTHER)
    kept = df[df["n"] >= need]
    assert list(kept.index) == [0, 2]
