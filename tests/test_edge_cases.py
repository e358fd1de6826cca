"""Edge-geometry robustness: empty input, single-doc corpus, all-duplicate
ids at merge time, query terms absent everywhere."""

import numpy as np
import pyarrow as pa
import pytest


def _mini_table(rows):
    return pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array(["user"] * len(rows), pa.string()),
            "text": pa.array([r[2] for r in rows], pa.string()),
            "tool": pa.array([""] * len(rows), pa.string()),
            "ts": pa.array([0] * len(rows), pa.timestamp("us")),
        }
    )


def test_single_doc_build_and_query(ray_session, tmp_path):
    import ray.data as rd

    from rindex.build import build_index
    from rindex.search import IndexSearcher

    src = rd.from_arrow(_mini_table([("c0", 0, "hello world hello")]))
    idx = str(tmp_path / "one")
    build_index(src, idx, num_segments=2, mode="term_shuffle")
    s = IndexSearcher(idx)
    hits = s.search("hello", k=5)
    assert len(hits) == 1 and hits[0][1] == "c0"
    assert s.search("absentterm", k=5) == []
    assert s.search("hello absent", k=5, mode="and") == []


def test_empty_text_rows(ray_session, tmp_path):
    import ray.data as rd

    from rindex.build import build_index
    from rindex.search import IndexSearcher

    rows = [("c0", 0, ""), ("c0", 1, "only content row"), ("c1", 0, "...")]
    idx = str(tmp_path / "empties")
    build_index(
        rd.from_arrow(_mini_table(rows)), idx, num_segments=2,
        mode="term_shuffle",
    )
    s = IndexSearcher(idx)
    assert s.n_docs == 3  # empty-text docs still get docIDs/stored fields
    hits = s.search("content", k=5)
    assert len(hits) == 1 and hits[0][1] == "c0" and hits[0][2] == 1


def test_merge_all_duplicates(ray_session, tmp_path):
    """Append re-ingests EVERY doc; after forceMerge the newest generation
    fully supersedes and doc_count equals the distinct id count."""
    import ray.data as rd

    from rindex.build import append_index, build_index
    from rindex.merge import run_merges
    from rindex.search import IndexSearcher

    rows = [(f"c{i}", 0, f"token{i} shared") for i in range(20)]
    t = _mini_table(rows)
    idx = str(tmp_path / "alldup")
    build_index(rd.from_arrow(t), idx, num_segments=2, mode="term_shuffle")
    append_index(rd.from_arrow(t), idx, mode="term_shuffle")
    m = run_merges(idx, force=True)
    assert m["totals"]["doc_count"] == 20
    s = IndexSearcher(idx)
    hits = s.search("shared", k=100)
    assert len(hits) == 20
    assert len({h[1] for h in hits}) == 20  # no duplicate ids survive


def test_min_should_match(ray_session, tmp_path):
    """mm semantics: mm=1 == plain OR; mm=n_terms == AND (same doc set AND
    same scores); mm between excludes under-matching docs; mm conflicts
    with an explicit non-exhaustive kernel loudly."""
    import ray.data as rd

    from rindex.build import build_index
    from rindex.search import IndexSearcher

    rows = [
        ("c0", 0, "alpha beta gamma"),
        ("c1", 0, "alpha beta"),
        ("c2", 0, "alpha"),
        ("c3", 0, "delta"),
    ]
    src = rd.from_arrow(_mini_table(rows))
    idx = str(tmp_path / "mm")
    build_index(src, idx, num_segments=2, mode="term_shuffle")
    s = IndexSearcher(idx)

    q = "alpha beta gamma"
    plain = s.search(q, k=10, mode="or")
    mm1 = s.search(q, k=10, mode="or", min_match=1)
    assert [(h[1], round(h[3], 9)) for h in plain] == [
        (h[1], round(h[3], 9)) for h in mm1
    ]
    ids = lambda hits: sorted(h[1] for h in hits)
    assert ids(s.search(q, k=10, mode="or", min_match=2)) == ["c0", "c1"]
    mm3 = s.search(q, k=10, mode="or", min_match=3)
    and_hits = s.search(q, k=10, mode="and")
    assert [(h[1], round(h[3], 9)) for h in mm3] == [
        (h[1], round(h[3], 9)) for h in and_hits
    ]
    # bar above the matchable clause count -> empty
    assert s.search("alpha beta absent", k=10, mode="or", min_match=3) == []
    with pytest.raises(ValueError, match="exhaustive"):
        s.search(q, k=10, mode="or", min_match=2, algo="wand")
