"""Solr Text Tagger — dictionary-based entity tagging over indexed text.

Reference: `solr/core/src/java/org/apache/solr/handler/tagger/
TaggerRequestHandler.java` (the SolrTextTagger contribution, Solr 7.4+):
given a dictionary of (possibly multi-word) names, emit every occurrence
in the input text, resolving overlaps with the default
`overlaps=LONGEST_DOMINANT_RIGHT` policy (the sibling
text_tagger_documents in ops/search_ext.py is the no-overlap-policy
regex tagger; this one resolves dominated unigrams) — a longer tag starting at a
position dominates shorter tags inside its span.

Engine shape: the dictionary terms' POSITIONAL postings are probed per
segment (`positions_for` — never a corpus scan); multi-word entries
match by the same composite doc*stride+pos searchsorted adjacency kernel
the phrase family uses; dominated unigram occurrences are suppressed with
one np.isin against the covered-position key set.  All per-segment, all
vectorized — the tagger is a postings consumer exactly like the
reference (which runs the dictionary FST over the analyzed token
stream).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from rindex.ops.analysis_ext import TOKEN_SQL_RE

QUERIES: dict = {}
ORACLE: dict = {}

# tag name -> token sequence; bigrams dominate their constituent unigrams
TAG_DICT = {
    "HASH_JOIN": ("hash", "join"),
    "MERGE_JOIN": ("merge", "join"),
    "JOIN": ("join",),
    "SPARK": ("spark",),
}


def _keys(d: np.ndarray, p: np.ndarray, stride: np.int64) -> np.ndarray:
    return d * stride + p


def q_text_tagger_overlaps_documents(sf_dir: str):
    """See module docstring.  Output: (doc_id, tag, n) occurrence counts
    after LONGEST_DOMINANT_RIGHT suppression — 'join' occurrences consumed
    by a 'hash join' / 'merge join' bigram are not reported as JOIN."""
    from rindex.ops.fulltext import documents_index_pos
    from rindex.ops.lucene8 import _flat_doc_pos
    from rindex.search import IndexSearcher

    terms = sorted({t for seq in TAG_DICT.values() for t in seq})
    idx = documents_index_pos(sf_dir)
    s = IndexSearcher(idx)
    rows = []
    for r in s.readers:
        posts = r.positions_for(terms)
        fd = {t: _flat_doc_pos(posts, [t]) for t in terms}
        maxp = max((int(p.max()) for _, p in fd.values() if len(p)),
                   default=0)
        stride = np.int64(maxp + 2)
        keyset = {t: np.sort(_keys(d, p, stride)) for t, (d, p) in fd.items()}

        def _adj(first: str, second: str):
            """(doc, pos) of `first` where `second` sits at pos+1."""
            d, p = fd[first]
            if not len(d) or not len(keyset[second]):
                return np.empty(0, np.int64), np.empty(0, np.int64)
            want = _keys(d, p + 1, stride)
            have = keyset[second]
            i = np.searchsorted(have, want)
            hit = (i < len(have)) & (
                have[np.minimum(i, len(have) - 1)] == want
            )
            return d[hit], p[hit]

        per_tag: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        covered = []  # composite keys consumed by multi-word tags
        for tag, seq in TAG_DICT.items():
            if len(seq) == 2:
                d, p = _adj(seq[0], seq[1])
                per_tag[tag] = (d, p)
                covered.append(_keys(d, p, stride))
                covered.append(_keys(d, p + 1, stride))
        covered_keys = (
            np.sort(np.concatenate(covered))
            if covered else np.empty(0, np.int64)
        )
        for tag, seq in TAG_DICT.items():
            if len(seq) == 1:
                d, p = fd[seq[0]]
                if len(d) and len(covered_keys):
                    free = ~np.isin(_keys(d, p, stride), covered_keys)
                    d, p = d[free], p[free]
                per_tag[tag] = (d, p)

        for tag, (d, _) in per_tag.items():
            if not len(d):
                continue
            docs, cnt = np.unique(d, return_counts=True)
            docs2 = r.drop_deleted(docs)
            keep = np.isin(docs, docs2)
            docs, cnt = docs[keep], cnt[keep]
            ids = r.fetch_ids(docs, ["doc_id"])
            for local, c in zip(docs, cnt):
                rows.append((ids[int(local)][0], tag, int(c)))
    out = pd.DataFrame(rows, columns=["doc_id", "tag", "n"])
    out["n"] = out["n"].astype("int64")
    return out.sort_values(["doc_id", "tag"]).reset_index(drop=True)


QUERIES["text_tagger_overlaps_documents"] = q_text_tagger_overlaps_documents


def _tagger_oracle() -> str:
    return f"""
    WITH toks AS (
      SELECT doc_id,
             regexp_extract_all(lower(text), '{TOKEN_SQL_RE}') AS l
      FROM documents
    ),
    counts AS (
      SELECT doc_id,
        len(list_filter(range(1, len(l)),
            i -> l[i] = 'hash' AND l[i + 1] = 'join'))::BIGINT AS hash_join,
        len(list_filter(range(1, len(l)),
            i -> l[i] = 'merge' AND l[i + 1] = 'join'))::BIGINT AS merge_join,
        len(list_filter(range(1, len(l) + 1),
            i -> l[i] = 'join'
                 AND (i = 1 OR (l[i - 1] <> 'hash' AND l[i - 1] <> 'merge'))
            ))::BIGINT AS join_solo,
        len(list_filter(range(1, len(l) + 1),
            i -> l[i] = 'spark'))::BIGINT AS spark
      FROM toks
    ),
    unpivoted AS (
      SELECT doc_id, 'HASH_JOIN' AS tag, hash_join AS n FROM counts
      UNION ALL
      SELECT doc_id, 'MERGE_JOIN', merge_join FROM counts
      UNION ALL
      SELECT doc_id, 'JOIN', join_solo FROM counts
      UNION ALL
      SELECT doc_id, 'SPARK', spark FROM counts
    )
    SELECT doc_id, tag, n FROM unpivoted WHERE n > 0
    ORDER BY doc_id, tag
    """


ORACLE["text_tagger_overlaps_documents"] = _tagger_oracle()
