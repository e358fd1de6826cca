"""Nested-document blocks + multi-valued fields (SURVEY.md §1.2/§2.4).

Block join over REAL index blocks: the index is built parent-first
(id_cols=(thread_id, doc_id)) so each parent's children occupy one
contiguous docID run inside one segment — Lucene's index-time block
contract (`lucene/join/src/java/org/apache/lucene/search/join/
ToParentBlockJoinQuery.java`; parent boundaries are a cached per-segment
structure, the QueryBitSetProducer analog in rindex/search.py
parent_blocks()).  Contrast the groupby stand-in op in search_ext.py —
here the join happens against index-resident block structure.

Multi-valued stored fields (Solr `multiValued="true"`,
`solr/core/src/java/org/apache/solr/schema/FieldType.java`): a
`list<string>` column in the stored fields; FILTER clauses match ANY
element via the flatten+offsets kernel in _SegmentReader.docs_matching.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa

QUERIES: dict = {}
ORACLE: dict = {}

THREAD_SIZE = 8  # docs per synthetic parent block (deterministic: doc_id // 8)


def _thread_index_dir(sf_dir: str) -> str:
    from rindex.ops.util import cache_dir

    return cache_dir(sf_dir, "threads")


def _add_thread_cols(t: pa.Table) -> pa.Table:
    """URP-style pre-index stage: parent key thread_id = doc_id // 8 and a
    multi-valued tags = [lang, source] stored field (vectorized: interleave
    + ListArray offsets, no per-row Python)."""
    doc_id = t["doc_id"].to_numpy()
    thread = pa.array(doc_id // THREAD_SIZE, pa.int64())
    n = len(t)
    lang = t["lang"].to_numpy(zero_copy_only=False)
    source = t["source"].to_numpy(zero_copy_only=False)
    vals = np.empty(2 * n, dtype=object)
    vals[0::2] = lang
    vals[1::2] = source
    tags = pa.ListArray.from_arrays(
        pa.array(np.arange(0, 2 * n + 1, 2, dtype=np.int32)),
        pa.array(vals, pa.string()),
    )
    return t.append_column("thread_id", thread).append_column("tags", tags)


def thread_block_index(sf_dir: str) -> str:
    """Build (or reuse via checkpoint lineage) the parent-first documents
    index: hash-partitioned on thread_id (blocks never span segments),
    sorted (thread_id, doc_id) (children contiguous), tags stored
    multi-valued."""
    import ray.data as rd

    from rindex.build import build_index

    src = os.path.join(sf_dir, "documents.parquet")
    ds = rd.read_parquet(
        src, columns=["doc_id", "text", "lang", "source"]
    ).map_batches(_add_thread_cols, batch_format="pyarrow")
    idx = _thread_index_dir(sf_dir)
    build_index(
        ds,
        idx,
        num_segments=8,
        mode="local",
        id_cols=("thread_id", "doc_id"),
        text_col="text",
        keep_cols=("lang", "source", "tags"),
        input_files=[src],
    )
    return idx


def q_block_join_topk_threads(sf_dir: str):
    """Top-20 parent threads for the child query 'spark join' (OR), child
    scores aggregated with ScoreMode.Max through the real block structure."""
    from rindex.search import IndexSearcher

    idx = thread_block_index(sf_dir)
    searcher = IndexSearcher(idx, algo="wand")
    rows = searcher.search_block_join(
        "spark join", parent_col="thread_id", k=20, score_mode="max"
    )
    return pd.DataFrame(
        {
            "rank": np.array([r[0] for r in rows], dtype=np.int32),
            "thread_id": np.array([r[1] for r in rows], dtype=np.int64),
            "score": np.round([r[2] for r in rows], 6),
            "n_children": np.array([r[3] for r in rows], dtype=np.int64),
        }
    )


def _block_join_oracle_sql() -> str:
    from rindex.ops.fulltext import _bm25_ctes
    from rindex.schema import B, K1

    return f"""
    WITH {_bm25_ctes()},
    q(term) AS (VALUES ('spark'), ('join')),
    scores AS (
      SELECT tf.doc_id,
             sum(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
                 * tf / (tf + {K1} * (1.0 - {B} + {B} * ldl / avgdl))) AS s
      FROM q
      JOIN tf USING (term)
      JOIN df USING (term)
      JOIN lossy USING (doc_id)
      CROSS JOIN stats
      GROUP BY tf.doc_id
    ),
    parents AS (
      SELECT doc_id // {THREAD_SIZE} AS thread_id,
             max(s) AS score, count(*) AS n_children
      FROM scores GROUP BY 1
    ),
    ranked AS (
      SELECT thread_id, score, n_children,
             (row_number() OVER (ORDER BY score DESC, thread_id ASC)
              - 1)::INTEGER AS rank
      FROM parents
    )
    SELECT rank, thread_id, round(score, 6) AS score, n_children
    FROM ranked WHERE rank < 20
    """


QUERIES["block_join_topk_threads"] = q_block_join_topk_threads
ORACLE["block_join_topk_threads"] = _block_join_oracle_sql()


def q_multivalued_filter_topk(sf_dir: str):
    """BM25 term query with a FILTER clause on the multi-valued tags field
    (tags:src7 matches the SECOND element — proves element-level matching,
    not whole-list equality).  df/norms stay corpus-global: the filter is
    non-scoring, Solr fq semantics."""
    from rindex.search import IndexSearcher

    idx = thread_block_index(sf_dir)
    searcher = IndexSearcher(idx, algo="wand")
    rows = searcher.search("window", k=10, field_filter=("tags", "src7"))
    return pd.DataFrame(
        {
            "rank": np.array([r[0] for r in rows], dtype=np.int32),
            "thread_id": np.array([r[1] for r in rows], dtype=np.int64),
            "doc_id": np.array([r[2] for r in rows], dtype=np.int64),
            "score": np.round([r[-1] for r in rows], 6),
        }
    )


def _multivalued_oracle_sql() -> str:
    from rindex.ops.fulltext import _bm25_ctes
    from rindex.schema import B, K1

    return f"""
    WITH {_bm25_ctes()},
    scores AS (
      SELECT tf.doc_id,
             ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
               * tf / (tf + {K1} * (1.0 - {B} + {B} * ldl / avgdl)) AS s
      FROM tf
      JOIN df USING (term)
      JOIN lossy USING (doc_id)
      CROSS JOIN stats
      WHERE tf.term = 'window'
    ),
    kept AS (
      SELECT s.doc_id, s.s
      FROM scores s JOIN documents d USING (doc_id)
      WHERE list_contains([d.lang, d.source], 'src7')
    ),
    ranked AS (
      SELECT doc_id, s,
             (row_number() OVER (ORDER BY s DESC, doc_id ASC) - 1)::INTEGER
               AS rank
      FROM kept
    )
    SELECT rank, doc_id // {THREAD_SIZE} AS thread_id, doc_id,
           round(s, 6) AS score
    FROM ranked WHERE rank < 10
    """


QUERIES["multivalued_filter_topk"] = q_multivalued_filter_topk
ORACLE["multivalued_filter_topk"] = _multivalued_oracle_sql()


def q_block_join_children_threads(sf_dir: str):
    """ToChildBlockJoinQuery (`lucene/join/src/java/org/apache/lucene/
    search/join/ToChildBlockJoinQuery.java`): the parent query (top-10
    threads by child 'spark join' ScoreMode.Max) selects parent blocks,
    then EVERY child of a matched block is returned carrying its
    parent's score — ToChild propagates the parent score to all
    children, matching or not.  The matched-parent map is the designated
    small side (top-k by construction), broadcast once; the child
    expansion is one filtered corpus scan."""
    import ray

    from rindex.ops.util import read_table
    from rindex.search import IndexSearcher

    idx = thread_block_index(sf_dir)
    searcher = IndexSearcher(idx, algo="wand")
    rows = searcher.search_block_join(
        "spark join", parent_col="thread_id", k=10, score_mode="max"
    )
    pmap = {int(r[1]): round(float(r[2]), 6) for r in rows}
    pref = ray.put(pmap)

    def expand(t: pa.Table) -> pa.Table:
        pm = ray.get(pref)
        ids = t["doc_id"].to_numpy()
        tid = ids // THREAD_SIZE
        keep = np.fromiter((int(x) in pm for x in tid), bool, count=len(tid))
        ids, tid = ids[keep], tid[keep]
        return pa.table(
            {
                "thread_id": pa.array(tid.astype(np.int64)),
                "doc_id": pa.array(ids.astype(np.int64)),
                "score": pa.array(
                    np.array([pm[int(x)] for x in tid], np.float64)
                ),
            }
        )

    out = (
        read_table(sf_dir, "documents", ["doc_id"])
        .map_batches(expand, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
    )
    return out.sort_values(["thread_id", "doc_id"]).reset_index(drop=True)


def _block_join_children_oracle_sql() -> str:
    from rindex.ops.fulltext import _bm25_ctes
    from rindex.schema import B, K1

    return f"""
    WITH {_bm25_ctes()},
    q(term) AS (VALUES ('spark'), ('join')),
    scores AS (
      SELECT tf.doc_id,
             sum(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
                 * tf / (tf + {K1} * (1.0 - {B} + {B} * ldl / avgdl))) AS s
      FROM q
      JOIN tf USING (term)
      JOIN df USING (term)
      JOIN lossy USING (doc_id)
      CROSS JOIN stats
      GROUP BY tf.doc_id
    ),
    parents AS (
      SELECT doc_id // {THREAD_SIZE} AS thread_id, max(s) AS score
      FROM scores GROUP BY 1
    ),
    top_parents AS (
      SELECT thread_id, round(score, 6) AS score,
             (row_number() OVER (ORDER BY score DESC, thread_id ASC)
              - 1) AS rank
      FROM parents
    )
    SELECT p.thread_id, d.doc_id, p.score
    FROM top_parents p
    JOIN documents d ON d.doc_id // {THREAD_SIZE} = p.thread_id
    WHERE p.rank < 10
    ORDER BY p.thread_id, d.doc_id
    """


QUERIES["block_join_children_threads"] = q_block_join_children_threads
ORACLE["block_join_children_threads"] = _block_join_children_oracle_sql()
