"""Multi-field dismax search ops (SURVEY.md §2.10 dismax/edismax qf+tie —
`solr/core/src/java/org/apache/solr/search/{DisMaxQParser,
ExtendedDismaxQParser}.java`).

Two doc-aligned field indexes over documents (per-field postings/norms/
stats — the Lucene FieldInfos shape): `body` = the full text, `title` = a
deterministic derived field (first 8 tokens), so the SQL oracle can
reproduce BOTH fields from the same table.  The engine combine is
DisjunctionMaxQuery: per term, max over fields + tie * rest, summed.
"""

from __future__ import annotations

import hashlib
import os
import re

import numpy as np
import pandas as pd
import pyarrow as pa

from rindex.ops.fulltext import TOKEN_PY_RE, TOKEN_SQL_RE

QUERIES: dict = {}
ORACLE: dict = {}

TITLE_TOKENS = 8
DISMAX_QUERY = "spark join window"
DISMAX_QF = {"title": 2.0, "body": 1.0}
DISMAX_TIE = 0.3


def _dirs(sf_dir: str) -> dict[str, str]:
    from rindex.ops.util import cache_dir

    return {
        "title": cache_dir(sf_dir, "dm-title"),
        "body": cache_dir(sf_dir, "dm-body"),
    }


def _add_title(t: pa.Table) -> pa.Table:
    rx = re.compile(TOKEN_PY_RE)
    titles = [
        " ".join(rx.findall((x or "").lower())[:TITLE_TOKENS])
        for x in t["text"].to_pylist()
    ]
    return t.append_column("title", pa.array(titles, pa.string()))


def field_indexes(sf_dir: str) -> dict[str, str]:
    """Build (or reuse) the two doc-aligned per-field indexes: same rows,
    same id_cols, same num_segments -> identical docID assignment."""
    import ray.data as rd

    from rindex.build import build_index

    src = os.path.join(sf_dir, "documents.parquet")
    dirs = _dirs(sf_dir)
    common = dict(
        num_segments=8, mode="local", id_cols=("doc_id",), keep_cols=(),
        input_files=[src],
    )
    build_index(
        rd.read_parquet(src, columns=["doc_id", "text"]),
        dirs["body"], text_col="text", **common,
    )
    build_index(
        rd.read_parquet(src, columns=["doc_id", "text"]).map_batches(
            _add_title, batch_format="pyarrow"
        ).select_columns(["doc_id", "title"]),
        dirs["title"], text_col="title", **common,
    )
    return dirs


def q_dismax_qf_documents(sf_dir: str):
    """dismax: qf='title^2 body', tie=0.3, OR over the query terms."""
    from rindex.search import DisMaxSearcher

    s = DisMaxSearcher(field_indexes(sf_dir), qf=DISMAX_QF, tie=DISMAX_TIE)
    rows = s.search(DISMAX_QUERY, k=10)
    return pd.DataFrame(
        {
            "rank": np.array([r[0] for r in rows], dtype=np.int32),
            "doc_id": np.array([r[1] for r in rows], dtype=np.int64),
            "score": np.round([r[2] for r in rows], 6),
        }
    )


def _dismax_oracle_sql() -> str:
    from rindex.ops.fulltext import norm_vals_sql
    from rindex.schema import B, K1

    norm_vals = norm_vals_sql()
    q_vals = ",".join(f"('{t}')" for t in DISMAX_QUERY.split())

    def field_ctes(fld: str, toks_expr: str) -> str:
        return f"""
    toks_{fld} AS ({toks_expr}),
    tf_{fld} AS (SELECT doc_id, term, count(*)::DOUBLE AS tf
                 FROM toks_{fld} GROUP BY 1, 2),
    dl_{fld} AS (SELECT doc_id, count(*)::BIGINT AS dl
                 FROM toks_{fld} GROUP BY 1),
    stats_{fld} AS (
      SELECT (SELECT count(*) FROM documents)::DOUBLE AS n_docs,
             (SELECT sum(dl) FROM dl_{fld})::DOUBLE
               / (SELECT count(*) FROM documents) AS avgdl
    ),
    lossy_{fld} AS (
      SELECT doc_id,
             (SELECT max(v) FROM norm_table WHERE v <= d.dl)::DOUBLE AS ldl
      FROM dl_{fld} d
    ),
    df_{fld} AS (SELECT term, count(*)::DOUBLE AS df
                 FROM tf_{fld} GROUP BY 1),
    score_{fld} AS (
      SELECT tf.doc_id, tf.term,
             {DISMAX_QF[fld]} * ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
               * tf / (tf + {K1} * (1.0 - {B} + {B} * ldl / avgdl)) AS s
      FROM tf_{fld} tf
      JOIN df_{fld} USING (term)
      JOIN lossy_{fld} USING (doc_id)
      CROSS JOIN stats_{fld}
      WHERE tf.term IN (SELECT term FROM q)
    )"""

    body_toks = f"""
      SELECT doc_id,
             unnest(regexp_extract_all(lower(text), '{TOKEN_SQL_RE}')) AS term
      FROM documents"""
    title_toks = f"""
      SELECT doc_id, unnest(l[1:{TITLE_TOKENS}]) AS term
      FROM (SELECT doc_id,
                   regexp_extract_all(lower(text), '{TOKEN_SQL_RE}') AS l
            FROM documents)"""

    return f"""
    WITH norm_table AS (SELECT unnest([{norm_vals}]) AS v),
    q(term) AS (VALUES {q_vals}),
    {field_ctes("body", body_toks)},
    {field_ctes("title", title_toks)},
    per_field AS (
      SELECT * FROM score_body UNION ALL SELECT * FROM score_title
    ),
    dm AS (
      SELECT doc_id, term,
             max(s) + {DISMAX_TIE} * (sum(s) - max(s)) AS s
      FROM per_field GROUP BY 1, 2
    ),
    total AS (SELECT doc_id, sum(s) AS s FROM dm GROUP BY 1),
    ranked AS (
      SELECT doc_id, s,
             (row_number() OVER (ORDER BY s DESC, doc_id ASC) - 1)::INTEGER
               AS rank
      FROM total
    )
    SELECT rank, doc_id, round(s, 6) AS score
    FROM ranked WHERE rank < 10
    """


QUERIES["dismax_qf_documents"] = q_dismax_qf_documents
ORACLE["dismax_qf_documents"] = _dismax_oracle_sql()
