"""Full-text ops over the driver `documents` table, served by the rindex
engine itself (index built once per sf_dir into /tmp, cached by fingerprint).

The BM25 oracle SQL reproduces the engine's scoring contract — including the
SmallFloat-lossy norm — in pure SQL: the 256 decodable norm lengths are
inlined as a VALUES list and dl is floored onto them, exactly what
`int_to_byte4` does (rindex/codec.py; reference `lucene/core/src/java/org/
apache/lucene/util/SmallFloat.java`).  The `documents` corpus contains only
simple lowercase tokens, so the SQL tokenizer regex equals the engine
analyzer on this corpus (asserted in tests/test_fulltext_ops.py).
"""

from __future__ import annotations

import hashlib
import os

import pyarrow as pa
import pyarrow.compute as pc

from rindex.codec import NORM_DECODE_TABLE
from rindex.schema import B, K1

QUERIES: dict = {}
ORACLE: dict = {}

# token pattern shared by engine analyzer and SQL oracle (documents corpus
# has no apostrophes / overlong tokens — the regexes coincide)
TOKEN_SQL_RE = "[0-9a-z]+"

# fixed reference query set over the documents vocabulary
DOC_QUERIES: list[tuple[str, str, str]] = [
    ("q00", "term", "spark"),
    ("q01", "term", "join"),
    ("q02", "term", "window"),
    ("q03", "or", "hash join"),
    ("q04", "or", "sort merge spill"),
    ("q05", "and", "filter scan"),
    ("q06", "and", "group agg"),
    ("q07", "or", "query query plan"),  # duplicate clause
]
TOP_K = 10


def _index_dir_for(sf_dir: str) -> str:
    key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:10]
    return os.path.join("/tmp", "rindex_cache", f"documents-{key}")


def documents_index(sf_dir: str) -> str:
    """Build (or reuse via checkpoint lineage) the documents index."""
    from rindex.build import build_index

    idx = _index_dir_for(sf_dir)
    build_index(
        os.path.join(sf_dir, "documents.parquet"),
        idx,
        num_segments=8,
        mode="local",
        id_cols=("doc_id",),
        text_col="text",
        keep_cols=("lang", "source"),
        input_files=[os.path.join(sf_dir, "documents.parquet")],
    )
    return idx


def q_bm25_topk_documents(sf_dir: str):
    """Flagship: BM25 (k1=1.2, b=0.75, lossy norms) top-k over documents for
    the fixed query set; rank-identical + score-identical (rounded to 6dp)
    to the SQL oracle."""
    from rindex.search import IndexSearcher

    idx = documents_index(sf_dir)
    searcher = IndexSearcher(idx, algo="wand")
    qtbl = pa.table(
        {
            "query_id": pa.array([q[0] for q in DOC_QUERIES]),
            "qtype": pa.array([q[1] for q in DOC_QUERIES]),
            "text": pa.array([q[2] for q in DOC_QUERIES]),
            "k": pa.array([TOP_K] * len(DOC_QUERIES), pa.int32()),
        }
    )
    out = searcher.search_table(qtbl)
    return out.set_column(
        out.schema.get_field_index("score"), "score", pc.round(out["score"], 6)
    )


def _bm25_oracle_sql() -> str:
    norm_vals = ",".join(str(int(v)) for v in sorted(set(NORM_DECODE_TABLE.tolist())))
    q_rows = []
    for qid, qtype, text in DOC_QUERIES:
        terms = text.split()
        for t in terms:
            q_rows.append(f"('{qid}', '{t}', {len(set(terms))}, '{qtype}')")
    q_values = ",".join(q_rows)
    return f"""
    WITH toks AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '{TOKEN_SQL_RE}')) AS term
      FROM documents
    ),
    tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM toks GROUP BY 1, 2),
    dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks GROUP BY 1),
    stats AS (
      SELECT (SELECT count(*) FROM documents)::DOUBLE AS n_docs,
             (SELECT sum(dl) FROM dl)::DOUBLE
               / (SELECT count(*) FROM documents) AS avgdl
    ),
    norm_table AS (SELECT unnest([{norm_vals}]) AS v),
    lossy AS (
      SELECT doc_id, (SELECT max(v) FROM norm_table WHERE v <= dl.dl)::DOUBLE AS ldl
      FROM dl
    ),
    df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
    q(query_id, term, n_required, qtype) AS (VALUES {q_values}),
    scores AS (
      SELECT q.query_id,
             tf.doc_id,
             sum(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
                 * tf / (tf + {K1} * (1.0 - {B} + {B} * ldl / avgdl))) AS s,
             count(DISTINCT tf.term) AS n_matched,
             max(q.n_required) AS n_required,
             max(q.qtype) AS qtype
      FROM q
      JOIN tf USING (term)
      JOIN df USING (term)
      JOIN lossy USING (doc_id)
      CROSS JOIN stats
      GROUP BY q.query_id, tf.doc_id
    ),
    ranked AS (
      SELECT query_id, doc_id, s,
             (row_number() OVER (PARTITION BY query_id
                                 ORDER BY s DESC, doc_id ASC) - 1)::INTEGER AS rank
      FROM scores
      WHERE qtype <> 'and' OR n_matched = n_required
    )
    SELECT query_id, rank, doc_id, round(s, 6) AS score
    FROM ranked WHERE rank < {TOP_K}
    """


QUERIES["bm25_topk_documents"] = q_bm25_topk_documents
ORACLE["bm25_topk_documents"] = _bm25_oracle_sql()


def q_bm25_incremental_merge_documents(sf_dir: str):
    """Incremental-index + tiered-merge lifecycle, validated against the
    SAME BM25 oracle as the one-shot build: gen0 indexes the low half of
    doc_ids, gen1 appends the high half PLUS a re-ingest of 50 gen0 docs
    (identical content — the update/reorder case), then forceMerge compacts
    each slot; supersession keeps the newest generation, so the merged
    index is byte-equivalent to a from-scratch build and the top-k must be
    rank+score identical to the oracle (reference lifecycle:
    soft-commit micro-batches + TieredMergePolicy compaction,
    `lucene/core/src/java/org/apache/lucene/index/TieredMergePolicy.java`)."""
    import shutil

    import numpy as np
    import pyarrow.parquet as pq
    import ray.data as rd

    from rindex.build import append_index, build_index
    from rindex.merge import run_merges
    from rindex.search import IndexSearcher

    src = os.path.join(sf_dir, "documents.parquet")
    ids = pq.read_table(src, columns=["doc_id"])["doc_id"].to_numpy()
    cut = int(np.median(ids))
    idx = _index_dir_for(sf_dir) + "-incr"
    shutil.rmtree(idx, ignore_errors=True)
    kwargs = dict(
        num_segments=8, mode="term_shuffle", id_cols=("doc_id",),
        text_col="text", keep_cols=("lang", "source"),
    )
    lo = rd.read_parquet(src).filter(expr=f"doc_id < {cut}")
    build_index(lo, idx, **kwargs)
    hi = rd.read_parquet(src).filter(expr=f"doc_id >= {cut}")
    redo = rd.read_parquet(src).filter(expr=f"doc_id < {min(ids) + 50}")
    append_index(hi.union(redo), idx, mode="term_shuffle")
    run_merges(idx, force=True)

    searcher = IndexSearcher(idx, algo="wand")
    qtbl = pa.table(
        {
            "query_id": pa.array([q[0] for q in DOC_QUERIES]),
            "qtype": pa.array([q[1] for q in DOC_QUERIES]),
            "text": pa.array([q[2] for q in DOC_QUERIES]),
            "k": pa.array([TOP_K] * len(DOC_QUERIES), pa.int32()),
        }
    )
    out = searcher.search_table(qtbl)
    return out.set_column(
        out.schema.get_field_index("score"), "score", pc.round(out["score"], 6)
    )


QUERIES["bm25_incremental_merge_documents"] = q_bm25_incremental_merge_documents
ORACLE["bm25_incremental_merge_documents"] = _bm25_oracle_sql()


def q_term_search_documents(sf_dir: str):
    """Single-term search: all matching doc ids (TermQuery as a filter,
    reference: `lucene/core/src/java/org/apache/lucene/search/TermQuery.java`
    — served from the inverted index postings, not a scan)."""
    from rindex.codec import decode_posting
    from rindex.search import IndexSearcher

    idx = documents_index(sf_dir)
    s = IndexSearcher(idx)
    docs = []
    for r in s.readers:
        row = r.postings_for(["spill"]).get("spill")
        if row is not None:
            d, _, _ = decode_posting(row)
            ids = r.fetch_ids(d.astype(np.int64), ["doc_id"])
            docs.extend(v[0] for v in ids.values())
    import pandas as pd

    return pd.DataFrame({"doc_id": sorted(docs)})


import numpy as np  # noqa: E402  (used above)

QUERIES["term_search_documents"] = q_term_search_documents
ORACLE["term_search_documents"] = f"""
    SELECT doc_id FROM documents
    WHERE list_contains(regexp_extract_all(lower(text), '{TOKEN_SQL_RE}'), 'spill')
"""


def q_phrase_search_documents(sf_dir: str):
    """Phrase query via conjunction candidates + stored-field verification
    (reference: PhraseQuery, `lucene/core/src/java/org/apache/lucene/search/
    PhraseQuery.java`; positions are not yet in the postings format, so
    candidates from the index are re-verified against stored text — the
    same two-phase approx-then-verify shape as ReRank)."""
    from rindex.search import IndexSearcher

    idx = documents_index(sf_dir)
    s = IndexSearcher(idx, algo="exhaustive")
    phrase = ["hash", "join"]
    # conjunction candidates from the inverted index (all matches: large k)
    cands = s.search(" ".join(phrase), k=10**9, mode="and")
    import pandas as pd
    import pyarrow.parquet as pq
    import re

    cand_ids = [c[1] for c in cands]
    if not cand_ids:
        return pd.DataFrame({"doc_id": []})
    tbl = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"],
        filters=[("doc_id", "in", cand_ids)],
    )
    rx = re.compile(TOKEN_SQL_RE)
    needle = " " + " ".join(phrase) + " "
    keep = [
        did
        for did, text in zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist())
        if needle in " " + " ".join(rx.findall((text or "").lower())) + " "
    ]
    return pd.DataFrame({"doc_id": sorted(keep)})


QUERIES["phrase_search_documents"] = q_phrase_search_documents
ORACLE["phrase_search_documents"] = f"""
    SELECT doc_id FROM documents
    WHERE ' ' || array_to_string(regexp_extract_all(lower(text), '{TOKEN_SQL_RE}'), ' ') || ' '
          LIKE '% hash join %'
"""
