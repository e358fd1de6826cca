"""Delete-by-query ops: soft deletes (live-docs sidecars) and the expunging
merge, each searched and DuckDB-oracle-checked.

The pair demonstrates the reference's exact two-phase delete semantics
(`lucene/core/src/java/org/apache/lucene/index/PendingDeletes.java`,
Solr deleteByQuery via `solr/core/src/java/org/apache/solr/update/
DirectUpdateHandler2.java`):

- SOFT (op 1): deleted docs vanish from results, but df/avgdl/maxDoc stay
  STALE — the oracle computes BM25 statistics over ALL docs and only
  filters the deleted docs out of the final ranking.
- EXPUNGED (op 2): after `run_merges(expunge=True)` (forceMergeDeletes)
  the segments are rewritten without the deleted docs and every statistic
  is recomputed — the oracle computes BM25 over the LIVE subset only.

The two ops return different scores for the same query — exactly the
stale-vs-recomputed gap the reference exhibits between a soft delete and a
forceMergeDeletes.  Each op owns a private index dir (a shared one would
make results depend on op execution order); a lineage marker keeps re-runs
idempotent (build_index's resume republishes a gen-0 manifest, which would
otherwise resurrect pre-merge state).
"""

from __future__ import annotations

import hashlib
import json
import os

import numpy as np
import pandas as pd

from rindex import segments as segio
from rindex.ops.fulltext import TOKEN_SQL_RE, _bm25_ctes
from rindex.schema import B, K1

QUERIES: dict = {}
ORACLE: dict = {}

DELETE_TERM = "window"
SEARCH_TEXT = "hash join"
TOP_K = 10


def _prepare(sf_dir: str, variant: str) -> str:
    """Build the private index, apply the delete (and the expunging merge
    for variant='expunge') exactly once per source lineage."""
    from rindex.build import build_index
    from rindex.deletes import delete_by_terms
    from rindex.merge import run_merges

    src = os.path.join(sf_dir, "documents.parquet")
    if not os.path.exists(src):
        raise FileNotFoundError(src)
    from rindex.ops.util import cache_dir

    idx = cache_dir(sf_dir, f"del-{variant}")
    stamp = {
        "fingerprint": segio.input_fingerprint([src]),
        "variant": variant,
        "delete_term": DELETE_TERM,
    }
    marker = os.path.join(idx, "_deletes_applied.json")
    if os.path.exists(marker):
        with open(marker) as fh:
            if json.load(fh) == stamp:
                return idx
    build_index(
        src, idx, num_segments=8, mode="local", id_cols=("doc_id",),
        text_col="text", keep_cols=("lang", "source"), input_files=[src],
    )
    delete_by_terms(idx, DELETE_TERM)
    if variant == "expunge":
        run_merges(idx, expunge=True)
    segio.atomic_write_json(marker, stamp)
    return idx


def _search_df(idx: str) -> pd.DataFrame:
    from rindex.search import IndexSearcher

    hits = IndexSearcher(idx).search(SEARCH_TEXT, k=TOP_K)
    return pd.DataFrame(
        {
            "rank": np.array([h[0] for h in hits], dtype=np.int32),
            "doc_id": np.array([h[1] for h in hits], dtype=np.int64),
            "score": np.round([h[2] for h in hits], 6),
        }
    )


def q_delete_soft_search_documents(sf_dir: str):
    """BM25 top-k AFTER delete_by_terms('window'), BEFORE any merge:
    deleted docs excluded from results, statistics stale (computed over
    maxDoc including the deleted docs)."""
    return _search_df(_prepare(sf_dir, "soft"))


def q_delete_expunge_search_documents(sf_dir: str):
    """Same query after run_merges(expunge=True): the deleted docs are
    physically gone and df/avgdl/n_docs are recomputed over live docs."""
    return _search_df(_prepare(sf_dir, "expunge"))


_SCORE = (
    f"sum(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))"
    f" * tf / (tf + {K1} * (1.0 - {B} + {B} * ldl / avgdl)))"
)
_QTERMS = "('hash'), ('join')"

QUERIES["delete_soft_search_documents"] = q_delete_soft_search_documents
ORACLE["delete_soft_search_documents"] = f"""
    WITH {_bm25_ctes()},
    deleted AS (
      SELECT DISTINCT doc_id FROM toks WHERE term = '{DELETE_TERM}'
    ),
    q(term) AS (VALUES {_QTERMS}),
    scores AS (
      SELECT tf.doc_id, {_SCORE} AS s
      FROM tf JOIN df USING (term) JOIN lossy USING (doc_id)
      CROSS JOIN stats
      WHERE tf.term IN (SELECT term FROM q)
      GROUP BY tf.doc_id
    ),
    ranked AS (
      SELECT doc_id, s,
             (row_number() OVER (ORDER BY s DESC, doc_id ASC) - 1)::INTEGER
               AS rank
      FROM scores
      WHERE doc_id NOT IN (SELECT doc_id FROM deleted)
    )
    SELECT rank, doc_id, round(s, 6) AS score
    FROM ranked WHERE rank < {TOP_K}
"""

# expunged: statistics recomputed over the LIVE subset only
QUERIES["delete_expunge_search_documents"] = q_delete_expunge_search_documents
ORACLE["delete_expunge_search_documents"] = f"""
    WITH all_toks AS (
      SELECT doc_id,
             unnest(regexp_extract_all(lower(text), '{TOKEN_SQL_RE}')) AS term
      FROM documents
    ),
    deleted AS (
      SELECT DISTINCT doc_id FROM all_toks WHERE term = '{DELETE_TERM}'
    ),
    live AS (
      SELECT * FROM documents
      WHERE doc_id NOT IN (SELECT doc_id FROM deleted)
    ),
    toks AS (
      SELECT doc_id,
             unnest(regexp_extract_all(lower(text), '{TOKEN_SQL_RE}')) AS term
      FROM live
    ),
    tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM toks GROUP BY 1, 2),
    dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks GROUP BY 1),
    stats AS (
      SELECT (SELECT count(*) FROM live)::DOUBLE AS n_docs,
             (SELECT sum(dl) FROM dl)::DOUBLE
               / (SELECT count(*) FROM live) AS avgdl
    ),
    norm_table AS (SELECT unnest([{{norms}}]) AS v),
    lossy AS (
      SELECT doc_id, (SELECT max(v) FROM norm_table WHERE v <= dl.dl)::DOUBLE AS ldl
      FROM dl
    ),
    df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
    q(term) AS (VALUES {_QTERMS}),
    scores AS (
      SELECT tf.doc_id, {_SCORE} AS s
      FROM tf JOIN df USING (term) JOIN lossy USING (doc_id)
      CROSS JOIN stats
      WHERE tf.term IN (SELECT term FROM q)
      GROUP BY tf.doc_id
    ),
    ranked AS (
      SELECT doc_id, s,
             (row_number() OVER (ORDER BY s DESC, doc_id ASC) - 1)::INTEGER
               AS rank
      FROM scores
    )
    SELECT rank, doc_id, round(s, 6) AS score
    FROM ranked WHERE rank < {TOP_K}
"""


def _norm_vals() -> str:  # thin alias kept for the {norms} splice below
    from rindex.ops.fulltext import norm_vals_sql

    return norm_vals_sql()


ORACLE["delete_expunge_search_documents"] = ORACLE[
    "delete_expunge_search_documents"
].replace("{norms}", _norm_vals())
