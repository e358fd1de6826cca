"""Naive full-scan BM25 oracle — the in-repo reference stand-in (no JVM).

Pure Python/numpy, float64, structurally independent of the engine's build
and search paths: dict-of-dicts postings, direct-form scoring, no codec, no
blocks, no pruning.  Defines the parity contract (FIXTURES.md §3): engine
top-k must be rank-identical with exact score equality in lossy-norm mode.
Tie-break: score desc, then (conv_id, turn_idx) asc — the global docID order
under the stable sort (Lucene: docID ascending, `TopDocs#merge` semantics).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from rindex.analysis import Analyzer, get_analyzer
from rindex.codec import byte4_to_int, int_to_byte4
from rindex.schema import B, K1


class NaiveBM25Oracle:
    def __init__(
        self,
        table: pa.Table,
        analyzer: Analyzer | None = None,
        lossy_norms: bool = True,
        text_col: str = "text",
        id_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    ):
        analyzer = analyzer or get_analyzer()
        table = table.sort_by([(c, "ascending") for c in id_cols])
        self.ids = [
            tuple(row) for row in zip(*(table[c].to_pylist() for c in id_cols))
        ]
        texts = table[text_col].to_pylist()
        self.n_docs = len(texts)
        self.postings: dict[str, dict[int, int]] = {}
        dls = np.zeros(self.n_docs, dtype=np.int64)
        for doc, text in enumerate(texts):
            tf = analyzer.term_freqs(text or "")
            dls[doc] = sum(tf.values())
            for term, f in tf.items():
                self.postings.setdefault(term, {})[doc] = f
        self.sum_dl = int(dls.sum())
        self.avgdl = self.sum_dl / max(1, self.n_docs)
        if lossy_norms:
            self.dl = np.array(
                [byte4_to_int(int_to_byte4(int(x))) for x in dls], dtype=np.float64
            )
        else:
            self.dl = dls.astype(np.float64)
        self.analyzer = analyzer

    def _term_scores(self, term: str) -> tuple[np.ndarray, np.ndarray]:
        post = self.postings.get(term)
        if not post:
            return np.zeros(0, dtype=np.int64), np.zeros(0)
        docs = np.fromiter(post.keys(), dtype=np.int64, count=len(post))
        tfs = np.fromiter(post.values(), dtype=np.float64, count=len(post))
        order = np.argsort(docs)
        docs, tfs = docs[order], tfs[order]
        df = len(docs)
        w = np.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))
        denom = tfs + K1 * (1.0 - B + B * self.dl[docs] / self.avgdl)
        return docs, w * tfs / denom

    def search(self, text: str, k: int = 10, mode: str = "or") -> list[tuple]:
        """Returns [(rank, *id_cols, score)] for top-k.  Duplicate query
        terms contribute once per occurrence (BooleanQuery clause sum)."""
        terms = self.analyzer.tokens(text)
        if not terms:
            return []
        acc = np.zeros(self.n_docs, dtype=np.float64)
        hit_count = np.zeros(self.n_docs, dtype=np.int64)
        for term in terms:
            docs, scores = self._term_scores(term)
            if len(docs):
                acc[docs] += scores
                hit_count[docs] += 1
        if mode == "and":
            mask = hit_count == len(terms)
        else:
            mask = hit_count > 0
        cand = np.nonzero(mask)[0]
        if len(cand) == 0:
            return []
        scores = acc[cand]
        # top-k with deterministic tie-break: score desc, docID asc.  docID
        # order == (conv_id, turn_idx) order by construction.
        order = np.lexsort((cand, -scores))[:k]
        return [
            (rank, *self.ids[int(cand[i])], float(scores[i]))
            for rank, i in enumerate(order)
        ]

    def search_table(self, queries: pa.Table) -> pa.Table:
        rows = []
        for qid, qtype, text, k in zip(
            queries["query_id"].to_pylist(),
            queries["qtype"].to_pylist(),
            queries["text"].to_pylist(),
            queries["k"].to_pylist(),
        ):
            mode = "and" if qtype == "and" else "or"
            for r in self.search(text, k=k, mode=mode):
                rows.append((qid, *r))
        if not rows:
            return pa.table(
                {
                    "query_id": pa.array([], pa.string()),
                    "rank": pa.array([], pa.int32()),
                    "conv_id": pa.array([], pa.string()),
                    "turn_idx": pa.array([], pa.int32()),
                    "score": pa.array([], pa.float64()),
                }
            )
        qid, rank, conv, turn, score = zip(*rows)
        return pa.table(
            {
                "query_id": pa.array(qid, pa.string()),
                "rank": pa.array(rank, pa.int32()),
                "conv_id": pa.array(conv, pa.string()),
                "turn_idx": pa.array(turn, pa.int32()),
                "score": pa.array(score, pa.float64()),
            }
        )
