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


BODY_TOKS_SQL = f"""
      SELECT doc_id,
             unnest(regexp_extract_all(lower(text), '{TOKEN_SQL_RE}')) AS term
      FROM documents"""
TITLE_TOKS_SQL = f"""
      SELECT doc_id, unnest(l[1:{TITLE_TOKENS}]) AS term
      FROM (SELECT doc_id,
                   regexp_extract_all(lower(text), '{TOKEN_SQL_RE}') AS l
            FROM documents)"""


def _field_stat_ctes(fld: str, toks_expr: str) -> str:
    """Per-field Lucene stats as CTEs (tf, dl, lossy norm, df, avgdl) —
    shared by the dismax and blended-term oracles; the score formula is
    composed by each oracle on top (they differ only in which df feeds
    idf)."""
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
                 FROM tf_{fld} GROUP BY 1)"""


def _field_score_cte(fld: str, df_cte: str, weight: float) -> str:
    """BM25 per-(doc, term) score over one field's stats, idf taken from
    `df_cte` (the field's own df for dismax, the blended max-df table for
    BlendedTermQuery — in both cases a field only scores docs/terms it
    actually contains because tf_{fld} drives the join)."""
    from rindex.schema import B, K1

    return f"""
    score_{fld} AS (
      SELECT tf.doc_id, tf.term,
             {weight} * ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
               * tf / (tf + {K1} * (1.0 - {B} + {B} * ldl / avgdl)) AS s
      FROM tf_{fld} tf
      JOIN {df_cte} USING (term)
      JOIN lossy_{fld} USING (doc_id)
      CROSS JOIN stats_{fld}
      WHERE tf.term IN (SELECT term FROM q)
    )"""


def _dismax_oracle_sql() -> str:
    from rindex.ops.fulltext import norm_vals_sql

    norm_vals = norm_vals_sql()
    q_vals = ",".join(f"('{t}')" for t in DISMAX_QUERY.split())

    return f"""
    WITH norm_table AS (SELECT unnest([{norm_vals}]) AS v),
    q(term) AS (VALUES {q_vals}),
    {_field_stat_ctes("body", BODY_TOKS_SQL)},
    {_field_stat_ctes("title", TITLE_TOKS_SQL)},
    {_field_score_cte("body", "df_body", DISMAX_QF["body"])},
    {_field_score_cte("title", "df_title", DISMAX_QF["title"])},
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


# ---------------------------------------------------------------------------
# BlendedTermQuery — cross-field term search with BLENDED docfreq
# ---------------------------------------------------------------------------

BLENDED_QUERY = "spark filter plan"
BLENDED_TIE = 0.3
BLENDED_K = 10


def q_blended_term_topk_documents(sf_dir: str):
    """BlendedTermQuery (`lucene/core/src/java/org/apache/lucene/search/
    BlendedTermQuery.java`, the ES cross_fields combine): per query term, a
    dismax over the doc-aligned title/body field indexes where every
    field's idf is computed from the BLENDED df — the MAX df across the
    fields (BlendedTermQuery#blend adjusts the per-field term contexts to
    the highest df so a term that is rare in `title` but common in `body`
    does not get an inflated title idf).  qf=1.0 on both fields so the df
    blend is the only difference from dismax_qf_documents."""
    from rindex.search import DisMaxSearcher

    s = DisMaxSearcher(
        field_indexes(sf_dir), qf={"title": 1.0, "body": 1.0},
        tie=BLENDED_TIE, blend_df=True,
    )
    rows = s.search(BLENDED_QUERY, k=BLENDED_K)
    return pd.DataFrame(
        {
            "rank": np.array([r[0] for r in rows], dtype=np.int32),
            "doc_id": np.array([r[1] for r in rows], dtype=np.int64),
            "score": np.round([r[2] for r in rows], 6),
        }
    )


def _blended_oracle_sql() -> str:
    from rindex.ops.fulltext import norm_vals_sql

    norm_vals = norm_vals_sql()
    q_vals = ",".join(f"('{t}')" for t in BLENDED_QUERY.split())

    return f"""
    WITH norm_table AS (SELECT unnest([{norm_vals}]) AS v),
    q(term) AS (VALUES {q_vals}),
    {_field_stat_ctes("body", BODY_TOKS_SQL)},
    {_field_stat_ctes("title", TITLE_TOKS_SQL)},
    df_blend AS (
      SELECT term, max(df) AS df FROM (
        SELECT term, df FROM df_body
        UNION ALL SELECT term, df FROM df_title
      ) GROUP BY 1
    ),
    {_field_score_cte("body", "df_blend", 1.0)},
    {_field_score_cte("title", "df_blend", 1.0)},
    per_field AS (
      SELECT * FROM score_body UNION ALL SELECT * FROM score_title
    ),
    dm AS (
      SELECT doc_id, term,
             max(s) + {BLENDED_TIE} * (sum(s) - max(s)) AS s
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
    FROM ranked WHERE rank < {BLENDED_K}
    """


QUERIES["blended_term_topk_documents"] = q_blended_term_topk_documents
ORACLE["blended_term_topk_documents"] = _blended_oracle_sql()


# ---------------------------------------------------------------------------
# BM25F — weighted-field-concatenation combined scoring
# ---------------------------------------------------------------------------

BM25F_TITLE_WEIGHT = 2  # integer boost => exact token-repetition encoding
BM25F_QUERIES: list[tuple[str, str, str]] = [
    ("f00", "or", "spark join"),
    ("f01", "or", "sort merge"),
    ("f02", "and", "filter scan"),
]
BM25F_K = 10


def _add_combined(t: pa.Table) -> pa.Table:
    """Derive the BM25F combined pseudo-field: title (first 8 tokens)
    repeated BM25F_TITLE_WEIGHT times + body (full text) once — Robertson's
    weighted-field concatenation makes integer field boosts EXACT tf/dl
    multipliers, so the standard single-field BM25 engine scores BM25F
    with no kernel changes."""
    rx = re.compile(TOKEN_PY_RE)
    combined = []
    for x in t["text"].to_pylist():
        toks = rx.findall((x or "").lower())
        combined.append(
            " ".join(toks[:TITLE_TOKENS] * BM25F_TITLE_WEIGHT + toks)
        )
    return pa.table(
        {"doc_id": t["doc_id"], "ftext": pa.array(combined, pa.string())}
    )


def combined_field_index(sf_dir: str) -> str:
    """Build (or reuse) the ONE index over the combined pseudo-field."""
    import ray.data as rd

    from rindex.build import build_index
    from rindex.ops.util import cache_dir

    src = os.path.join(sf_dir, "documents.parquet")
    idx = cache_dir(sf_dir, "bm25f-comb")
    build_index(
        rd.read_parquet(src, columns=["doc_id", "text"]).map_batches(
            _add_combined, batch_format="pyarrow"
        ),
        idx, num_segments=8, mode="local", id_cols=("doc_id",),
        keep_cols=(), text_col="ftext", input_files=[src],
    )
    return idx


def q_bm25f_combined_topk_documents(sf_dir: str):
    """BM25F top-k (Robertson, Zaragoza & Taylor, CIKM 2004 'Simple BM25
    extension to multiple weighted fields'; the Lucene analog is the
    sandbox CombinedFieldQuery, `lucene/sandbox/src/java/org/apache/
    lucene/sandbox/search/CombinedFieldQuery.java`): fields title^2 +
    body^1 merged into one pseudo-field whose tf/dl are the weighted sums,
    then standard BM25 with the combined stats — served by the SAME
    block-max WAND engine over the combined index."""
    from rindex.search import IndexSearcher

    idx = combined_field_index(sf_dir)
    searcher = IndexSearcher(idx, algo="wand")
    qtbl = pa.table(
        {
            "query_id": pa.array([q[0] for q in BM25F_QUERIES]),
            "qtype": pa.array([q[1] for q in BM25F_QUERIES]),
            "text": pa.array([q[2] for q in BM25F_QUERIES]),
            "k": pa.array([BM25F_K] * len(BM25F_QUERIES), pa.int32()),
        }
    )
    out = searcher.search_table(qtbl).to_pandas()
    out["score"] = out["score"].round(6)
    return out


def _bm25f_oracle_sql() -> str:
    from rindex.ops.fulltext import norm_vals_sql
    from rindex.schema import B, K1

    norm_vals = norm_vals_sql()
    title_cat = " || ".join([f"l[1:{TITLE_TOKENS}]"] * BM25F_TITLE_WEIGHT)
    q_rows = []
    for qid, qtype, text in BM25F_QUERIES:
        terms = text.split()
        for t in terms:
            q_rows.append(f"('{qid}', '{t}', {len(set(terms))}, '{qtype}')")
    q_values = ",".join(q_rows)
    return f"""
    WITH comb AS (
      SELECT doc_id, {title_cat} || l AS cl
      FROM (SELECT doc_id,
                   regexp_extract_all(lower(text), '{TOKEN_SQL_RE}') AS l
            FROM documents)
    ),
    toks AS (SELECT doc_id, unnest(cl) AS term FROM comb),
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
    FROM ranked WHERE rank < {BM25F_K}
    """


QUERIES["bm25f_combined_topk_documents"] = q_bm25f_combined_topk_documents
ORACLE["bm25f_combined_topk_documents"] = _bm25f_oracle_sql()


# ---------------------------------------------------------------------------
# edismax pf2/pf3 — automatic bigram/trigram phrase boosting
# ---------------------------------------------------------------------------

PF_QUERY = "fast hash join"
PF2_BOOST = 1.5
PF3_BOOST = 2.0


def q_edismax_pf_topk_documents(sf_dir: str):
    """edismax pf2/pf3 (`solr/core/src/java/org/apache/solr/search/
    ExtendedDismaxQParser.java#getQuery`, the pf2/pf3 params): on top of
    the per-term OR, EVERY adjacent word pair of the query becomes a
    boosted phrase SHOULD clause (pf2) and every adjacent triple another
    (pf3).  Scores follow the engine's PhraseWeight contract (tf = phrase
    freq, df = phrase-match doc count) and sum with the term clauses —
    the same combined kernel query_string_extended exercises, here with
    the clause set DERIVED from the query text the way edismax does."""
    from rindex.ops.fulltext import documents_index_pos
    from rindex.search import IndexSearcher, Query

    words = PF_QUERY.split()
    phrases = [(list(p), PF2_BOOST)
               for p in zip(words, words[1:])]
    phrases += [(list(p), PF3_BOOST)
                for p in zip(words, words[1:], words[2:])]
    idx = documents_index_pos(sf_dir)
    s = IndexSearcher(idx)
    hits = s.search_query(Query(terms=words, k=10, phrases=phrases))
    return pd.DataFrame(
        {
            "rank": pd.array([h[0] for h in hits], dtype="int32"),
            "doc_id": [h[1] for h in hits],
            "score": [round(h[2], 6) for h in hits],
        }
    )


QUERIES["edismax_pf_topk_documents"] = q_edismax_pf_topk_documents


def _pf_phrase_cte(tag: str, words: list[str], boost: float) -> str:
    from rindex.schema import B, K1

    cond = " AND ".join(
        f"l[i + {j}] = '{w}'" for j, w in enumerate(words)
    )
    n = len(words)
    return f"""
    pf_{tag} AS (
      SELECT doc_id,
             len(list_filter(range(1, len(l) - {n - 1} + 1),
                             i -> {cond}))::BIGINT AS phrase_freq
      FROM (SELECT doc_id,
                   regexp_extract_all(lower(text), '{TOKEN_SQL_RE}') AS l
            FROM documents)
    ),
    pm_{tag} AS (SELECT * FROM pf_{tag} WHERE phrase_freq > 0),
    ps_{tag} AS (SELECT count(*)::DOUBLE AS df_p FROM pm_{tag}),
    sc_{tag} AS (
      SELECT m.doc_id,
             {boost} * ln(1.0 + (s.n_docs - p.df_p + 0.5) / (p.df_p + 0.5))
                 * m.phrase_freq
                 / (m.phrase_freq
                    + {K1} * (1.0 - {B} + {B} * lo.ldl / s.avgdl)) AS s
      FROM pm_{tag} m
      JOIN lossy lo USING (doc_id)
      CROSS JOIN stats s CROSS JOIN ps_{tag} p
    )"""


def _edismax_pf_oracle() -> str:
    from rindex.ops.fulltext import _bm25_ctes
    from rindex.schema import B, K1

    words = PF_QUERY.split()
    pairs = list(zip(words, words[1:]))
    triples = list(zip(words, words[1:], words[2:]))
    ctes, unions = [], ["SELECT doc_id, s FROM tscores"]
    for i, p in enumerate(pairs):
        ctes.append(_pf_phrase_cte(f"p2_{i}", list(p), PF2_BOOST))
        unions.append(f"SELECT doc_id, s FROM sc_p2_{i}")
    for i, p in enumerate(triples):
        ctes.append(_pf_phrase_cte(f"p3_{i}", list(p), PF3_BOOST))
        unions.append(f"SELECT doc_id, s FROM sc_p3_{i}")
    q_terms = ", ".join(f"'{w}'" for w in words)
    return f"""
    WITH {_bm25_ctes()},
    tscores AS (
      SELECT tf.doc_id,
             sum(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
                 * tf / (tf + {K1} * (1.0 - {B} + {B} * ldl / avgdl))) AS s
      FROM tf JOIN df USING (term) JOIN lossy USING (doc_id)
      CROSS JOIN stats
      WHERE tf.term IN ({q_terms})
      GROUP BY tf.doc_id
    ),
    {",".join(ctes)},
    allscores AS (
      SELECT doc_id, sum(s) AS s
      FROM ({" UNION ALL ".join(unions)})
      GROUP BY doc_id
    ),
    ranked AS (
      SELECT doc_id, s,
             (row_number() OVER (ORDER BY s DESC, doc_id ASC) - 1)::INTEGER
               AS rank
      FROM allscores
    )
    SELECT rank, doc_id, round(s, 6) AS score
    FROM ranked WHERE rank < 10
"""


ORACLE["edismax_pf_topk_documents"] = _edismax_pf_oracle()
