"""Node-shared postings tables (search.py _SegTableRegistry).

Contracts: (a) shared-plasma reads are bit-identical to private reads;
(b) a segment file rewritten IN PLACE is never served stale (cache key
includes mtime+size); (c) the registry path degrades cleanly when
disabled via RINDEX_SHARED_SEG=0.
"""

import os

import pyarrow.parquet as pq
import pytest

from rindex.build import build_index
from rindex.fixtures import make_queries, write_corpus
from rindex.search import IndexSearcher


def _run_queries(idx):
    s = IndexSearcher(idx, algo="wand").warm()
    q = make_queries()
    return [
        s.search(t, k=int(k), mode="and" if qt == "and" else "or")
        for qt, t, k in zip(
            q["qtype"].to_pylist(), q["text"].to_pylist(),
            q["k"].to_pylist(),
        )
    ]


def test_shared_equals_private(ray_session, small_corpus, tmp_path,
                               monkeypatch):
    idx = str(tmp_path / "idx")
    build_index(small_corpus, idx, num_segments=4, mode="local")
    monkeypatch.setenv("RINDEX_SHARED_SEG", "1")
    shared = _run_queries(idx)
    monkeypatch.setenv("RINDEX_SHARED_SEG", "0")
    private = _run_queries(idx)
    assert shared == private


def test_rewritten_segment_not_served_stale(ray_session, tiny_corpus,
                                            tmp_path, monkeypatch):
    monkeypatch.setenv("RINDEX_SHARED_SEG", "1")
    idx = str(tmp_path / "idx")
    build_index(tiny_corpus, idx, num_segments=2, mode="local")
    before = _run_queries(idx)  # loads tables into the shared registry

    # rebuild IN PLACE over a corpus with every text doubled: same paths,
    # new bytes — df doubles, scores change
    import pyarrow as pa

    t = pq.read_table(os.path.join(tiny_corpus, os.listdir(tiny_corpus)[0])
                      if os.path.isdir(tiny_corpus) else tiny_corpus)
    mod_dir = str(tmp_path / "corpus2")
    os.makedirs(mod_dir, exist_ok=True)
    texts = [(x or "") + " zzzuniqueterm" for x in t["text"].to_pylist()]
    t2 = t.set_column(
        t.schema.get_field_index("text"), "text", pa.array(texts)
    )
    pq.write_table(t2, os.path.join(mod_dir, "part-0000.parquet"))
    build_index(mod_dir, idx, num_segments=2, mode="local")

    s = IndexSearcher(idx, algo="wand").warm()
    hits = s.search("zzzuniqueterm", k=5, mode="or")
    assert len(hits) > 0, "rewritten segment served stale from the registry"
    after = _run_queries(idx)
    assert isinstance(before, list) and isinstance(after, list)
