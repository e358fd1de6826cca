"""Lucene Monitor (percolator / reverse search): register a set of
queries ONCE, stream documents through, and report which registered
queries match each document.

Reference surface: `lucene/monitor/src/java/org/apache/lucene/monitor/
{Monitor,QueryIndex,TermFilteredPresearcher}.java` (the 8.2+ monitor
module, formerly Luwak).  The reference holds the registered queries in
an in-memory query index; its TermFilteredPresearcher extracts, per
query, a set of trigger terms such that any matching document MUST
contain at least one of them, and only runs the full query against
documents that hit the trigger index.

Ray-native shape: the registered query set is the DESIGNATED small side
(queries, not corpus) — compiled once into trigger-term hash arrays and
shipped in the actor-pool constructor (Ray broadcasts the closure via
the object store once per worker, never per batch).  Documents stream
through `map_batches`; per batch the presearcher intersects the BATCH
vocabulary with each query's trigger set and skips queries that cannot
match anything in the batch, then evaluates the surviving queries with
one vectorized membership pass per distinct query term (searchsorted +
per-doc reduceat — no per-row Python).  At 10^5 registered queries the
trigger map becomes a real inverted index (term-hash -> query ids,
the reference's QueryIndex); the per-term evaluation kernel is unchanged.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from rindex.ops.analysis_ext import TOKEN_SQL_RE
from rindex.schema import pool_cap
from rindex.ops.util import read_table

QUERIES: dict = {}
ORACLE: dict = {}

# The registered query set (MonitorQuery id -> parsed query).  Kinds:
# term / and / or / andnot (MUST + MUST_NOT) / phrase (exact, slop=0).
MONITOR_QUERIES: list[tuple[str, str, tuple[str, ...]]] = [
    ("q0", "term", ("dup",)),
    ("q1", "and", ("hash", "join")),
    ("q2", "or", ("spill", "window")),
    ("q3", "andnot", ("scan", "slow")),
    ("q4", "phrase", ("hash", "join")),
]


def _trigger_terms(kind: str, terms: tuple[str, ...]) -> tuple[str, ...]:
    """TermFilteredPresearcher contract: a matching doc must contain at
    least one trigger term.  AND/phrase: any single positive term works
    (pick all — cheapest superset); OR: all alternatives; NOT: only the
    positive clause (the negative term can never be required)."""
    if kind == "andnot":
        return terms[:1]
    return terms


def q_monitor_percolate_documents(sf_dir: str):
    """Percolate the documents stream through the registered query set;
    emit one (query_id, doc_id) row per match."""
    from rindex.ops.dedup import _MASK63, _token_hashes, _tokens

    ds = read_table(sf_dir, "documents", ["doc_id", "text"])
    _P = np.int64(0x9E3779B1)

    class _Percolate:
        def __init__(self):
            # compile the registered set once per worker: term hashes per
            # query + the presearcher trigger arrays
            self.compiled = []
            for qid, kind, terms in MONITOR_QUERIES:
                th = _token_hashes(list(terms))
                trig = _token_hashes(list(_trigger_terms(kind, terms)))
                self.compiled.append((qid, kind, terms, th, trig))

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_numpy()
            toks = [_tokens(x) for x in t["text"].to_pylist()]
            n = len(toks)
            lens = np.fromiter((len(x) for x in toks), np.int64, n)
            flat = (
                np.concatenate([_token_hashes(x) for x in toks if x])
                if lens.sum()
                else np.empty(0, np.int64)
            )
            doc_of = np.repeat(np.arange(n, dtype=np.int64), lens)
            starts = np.flatnonzero(
                np.r_[True, doc_of[1:] != doc_of[:-1]]
            ) if len(doc_of) else np.empty(0, np.int64)
            present_docs = doc_of[starts] if len(doc_of) else doc_of
            batch_vocab = np.unique(flat)

            def has_term(h: np.int64) -> np.ndarray:
                out = np.zeros(n, dtype=bool)
                if len(flat):
                    hit = flat == h
                    if hit.any():
                        out[present_docs] = (
                            np.add.reduceat(hit, starts) > 0
                        )
                return out

            # phrase support: batch bigram hashes (cross-doc boundaries
            # masked out)
            bg = None
            bg_doc = None
            if len(flat) > 1:
                same = doc_of[:-1] == doc_of[1:]
                bg = ((flat[:-1] * _P + flat[1:]) & _MASK63)[same]
                bg_doc = doc_of[:-1][same]

            out_q, out_d = [], []
            for qid, kind, terms, th, trig in self.compiled:
                # presearcher: skip queries with no trigger term in batch
                pos = np.searchsorted(batch_vocab, trig)
                inb = pos < len(batch_vocab)
                if not (inb & (batch_vocab[pos[inb]] == trig[inb])
                        if inb.any() else np.zeros(0, bool)).any():
                    continue
                if kind == "term":
                    m = has_term(th[0])
                elif kind == "and":
                    m = has_term(th[0])
                    for h in th[1:]:
                        m &= has_term(h)
                elif kind == "or":
                    m = has_term(th[0])
                    for h in th[1:]:
                        m |= has_term(h)
                elif kind == "andnot":
                    m = has_term(th[0]) & ~has_term(th[1])
                else:  # phrase (exact bigram chain for 2-term phrases)
                    m = np.zeros(n, dtype=bool)
                    if bg is not None and len(bg):
                        want = np.int64(
                            (th[0] * _P + th[1]) & _MASK63
                        )
                        hit = bg == want
                        if hit.any():
                            m[np.unique(bg_doc[hit])] = True
                for d in ids[m]:
                    out_q.append(qid)
                    out_d.append(d)
            return pa.table(
                {
                    "query_id": pa.array(out_q, pa.string()),
                    "doc_id": pa.array(np.asarray(out_d, np.int64)),
                }
            )

    res = ds.map_batches(
        _Percolate, batch_format="pyarrow", concurrency=pool_cap(min_cap=8)
    )
    return (
        res.to_pandas()
        .sort_values(["query_id", "doc_id"])
        .reset_index(drop=True)
    )


QUERIES["monitor_percolate_documents"] = q_monitor_percolate_documents
ORACLE["monitor_percolate_documents"] = f"""
    WITH t AS (
      SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_SQL_RE}') AS l
      FROM documents
    )
    SELECT 'q0' AS query_id, doc_id FROM t WHERE list_contains(l, 'dup')
    UNION ALL
    SELECT 'q1', doc_id FROM t
    WHERE list_contains(l, 'hash') AND list_contains(l, 'join')
    UNION ALL
    SELECT 'q2', doc_id FROM t
    WHERE list_contains(l, 'spill') OR list_contains(l, 'window')
    UNION ALL
    SELECT 'q3', doc_id FROM t
    WHERE list_contains(l, 'scan') AND NOT list_contains(l, 'slow')
    UNION ALL
    SELECT 'q4', doc_id FROM t
    WHERE len(list_filter(range(1, len(l)),
                          i -> l[i] = 'hash' AND l[i + 1] = 'join')) > 0
"""
