"""Actor-resident suggester: the in-RAM compiled lookup of §2.3's
"suggester FST held in RAM" row.

Reference shape: `lucene/suggest/src/java/org/apache/lucene/search/
suggest/analyzing/{AnalyzingSuggester,AnalyzingInfixSuggester}.java` and
`lucene/suggest/.../spell/DirectSpellChecker.java` — the suggester builds
ONCE from the index term dictionary and serves every lookup from RAM (the
FST); rebuilding per query would re-pay the dictionary scan.

Ray translation: `Suggester` compiles the term dictionary into numpy
structures (sorted term array for prefix ranges, a character-trigram
inverted index for infix candidates, length buckets for the spellcheck
DP); `SuggesterActor` holds one compiled instance per actor — built in
`__init__` from the segment dictionaries (the scan stays the BUILDER),
lookups are searchsorted / intersect1d, never a rescan.  `get_suggester()`
hands out a per-index named actor (`get_if_exists`), so every query in a
driver session shares one resident copy — the high-QPS autocomplete
pattern.  At cluster scale you run one such actor per serving node; the
build input (the vocab) is bounded, not corpus-sized.
"""

from __future__ import annotations

import hashlib

import numpy as np

_EMPTY = np.empty(0, dtype=np.int64)


def rank_correction(
    word: str, terms: np.ndarray, dfs: np.ndarray, max_dist: int = 2
) -> tuple | None:
    """ONE correction-selection rule for spellcheck AND collation (min
    edit distance <= max_dist, ties df-desc then term asc —
    DirectSpellChecker's ranking).  Candidates are LENGTH-PRUNED first
    (|len diff| <= max_dist: distance >= length difference, so nothing
    prunable can win), honoring _levenshtein_vec's caller-prunes
    contract."""
    from rindex.ops.multiterm import _levenshtein_vec

    terms = np.asarray(terms)
    lp = np.abs(np.char.str_len(terms.astype(str)) - len(word)) <= max_dist
    terms, dfs = terms[lp], np.asarray(dfs)[lp]
    if len(terms) == 0:
        return None
    d = _levenshtein_vec(word, terms)
    m = d <= max_dist
    if not m.any():
        return None
    sel = np.lexsort((terms[m], -dfs[m], d[m]))[0]
    return (str(terms[m][sel]), int(d[m][sel]), int(dfs[m][sel]))


def _prefix_edit_vec(q: str, terms: np.ndarray) -> np.ndarray:
    """Vectorized PREFIX edit distance: min over j of lev(q, t[:j]) — the
    quantity FuzzySuggester's Levenshtein-automaton x FST intersection
    computes (`lucene/suggest/src/java/org/apache/lucene/search/suggest/
    analyzing/FuzzySuggester.java`): how close q is to SOME prefix of t.
    Same whole-array DP as _levenshtein_vec, but the answer is the masked
    min of the final row over valid columns j <= len(t)."""
    if len(terms) == 0:
        return np.zeros(0, dtype=np.int64)
    terms = terms.astype(str)
    lens = np.char.str_len(terms)
    L = int(lens.max())
    buf = np.zeros((len(terms), L), dtype=np.uint32)
    for i, t in enumerate(terms):
        buf[i, : len(t)] = np.frombuffer(t.encode("utf-32-le"), np.uint32)
    prev = np.tile(np.arange(L + 1, dtype=np.int64), (len(terms), 1))
    for qi, qc in enumerate(q, 1):
        cur = np.empty_like(prev)
        cur[:, 0] = qi
        ne = (buf != ord(qc)).astype(np.int64)
        for j in range(1, L + 1):
            cur[:, j] = np.minimum(
                np.minimum(prev[:, j] + 1, cur[:, j - 1] + 1),
                prev[:, j - 1] + ne[:, j - 1],
            )
        prev = cur
    valid = np.arange(L + 1) <= lens[:, None]
    return np.where(valid, prev, np.iinfo(np.int64).max).min(axis=1)


class Suggester:
    """Compiled term-dictionary lookup: build once, serve from RAM."""

    def __init__(self, terms, weights):
        terms = np.asarray(terms, dtype=str)
        weights = np.asarray(weights, dtype=np.int64)
        order = np.argsort(terms, kind="stable")
        self.terms = terms[order]
        self.weights = weights[order]
        # char-trigram inverted index for infix candidates: term id lists
        # per gram (the in-RAM analog of the infix suggester's n-gram
        # sidecar index)
        tri: dict[str, list[int]] = {}
        for i, t in enumerate(self.terms):
            for j in range(len(t) - 2):
                g = t[j: j + 3]
                lst = tri.get(g)
                if lst is None:
                    tri[g] = [i]
                elif lst[-1] != i:  # grams repeat within a term
                    lst.append(i)
        self.tri = {g: np.asarray(v, dtype=np.int64) for g, v in tri.items()}

    @classmethod
    def from_index(cls, idx: str) -> "Suggester":
        """BUILDER: the per-segment dictionary scan + df-sum reduce (the
        existing _global_term_dfs path) compiled into the lookup."""
        from rindex.ops.search_ext import _global_term_dfs

        acc = _global_term_dfs(idx)
        return cls(np.array(list(acc)), np.fromiter(
            acc.values(), dtype=np.int64, count=len(acc)
        ))

    def _topk(self, ids: np.ndarray, k: int) -> list[tuple[str, int]]:
        t, w = self.terms[ids], self.weights[ids]
        sel = np.lexsort((t, -w))[:k]
        return [(str(t[i]), int(w[i])) for i in sel]

    def suggest_prefix(self, prefix: str, k: int = 10) -> list[tuple]:
        """Weight-ordered prefix completion: one binary-searched range of
        the sorted term array (the FST arc walk analog)."""
        lo = int(np.searchsorted(self.terms, prefix))
        hi = int(np.searchsorted(self.terms, prefix + "￿"))
        return self._topk(np.arange(lo, hi), k)

    def suggest_infix(self, sub: str, k: int = 10) -> list[tuple]:
        """Infix completion: trigram postings intersect -> substring
        verify -> weight-ordered top-k.  Sub-trigram queries fall back to
        one vectorized scan of the in-RAM dictionary (still no IO)."""
        if len(sub) >= 3:
            cands: np.ndarray | None = None
            for j in range(len(sub) - 2):
                ids = self.tri.get(sub[j: j + 3], _EMPTY)
                cands = ids if cands is None else np.intersect1d(cands, ids)
                if len(cands) == 0:
                    return []
            pool = cands
        else:
            pool = np.arange(len(self.terms))
        m = np.char.find(self.terms[pool], sub) >= 0
        return self._topk(pool[m], k)

    def correct(self, word: str, max_dist: int = 2) -> tuple | None:
        """DirectSpellChecker lookup against the resident dictionary."""
        return rank_correction(word, self.terms, self.weights, max_dist)

    def correct_topk(
        self, word: str, k: int = 5, max_dist: int = 2
    ) -> list[tuple]:
        """extendedResults spellcheck: the TOP-K correction candidates
        (distance asc, df desc, term asc) with their frequencies —
        DirectSpellChecker's full suggestion list rather than only the
        winner.  Same length-pruned vectorized DP as correct()."""
        from rindex.ops.multiterm import _levenshtein_vec

        lp = np.abs(
            np.char.str_len(self.terms.astype(str)) - len(word)
        ) <= max_dist
        terms, dfs = self.terms[lp], self.weights[lp]
        if len(terms) == 0:
            return []
        d = _levenshtein_vec(word, terms)
        m = d <= max_dist
        terms, dfs, d = terms[m], dfs[m], d[m]
        sel = np.lexsort((terms, -dfs, d))[:k]
        return [
            (str(terms[i]), int(d[i]), int(dfs[i])) for i in sel
        ]

    def suggest_fuzzy(
        self,
        word: str,
        k: int = 10,
        max_edits: int = 1,
        min_fuzzy_len: int = 3,
    ) -> list[tuple]:
        """FuzzySuggester lookup: typo-tolerant completion.  Candidates
        share the first character (nonFuzzyPrefix=1 — one binary-searched
        range, like the exact path) and match when their PREFIX edit
        distance to the query is <= max_edits; ranked weight-desc, term
        asc.  Queries shorter than min_fuzzy_len fall back to exact prefix
        completion (FuzzySuggester's minFuzzyLength)."""
        if len(word) < min_fuzzy_len:
            return [
                (t, w, 0) for t, w in self.suggest_prefix(word, k)
            ]
        lo = int(np.searchsorted(self.terms, word[0]))
        hi = int(np.searchsorted(self.terms, word[0] + "￿"))
        ids = np.arange(lo, hi)
        d = _prefix_edit_vec(word, self.terms[ids])
        m = d <= max_edits
        ids, d = ids[m], d[m]
        t, w = self.terms[ids], self.weights[ids]
        sel = np.lexsort((t, -w))[:k]
        return [(str(t[i]), int(w[i]), int(d[i])) for i in sel]


def get_suggester(idx: str):
    """Per-index named SuggesterActor handle (get_if_exists): every
    caller in the driver session shares ONE resident build."""
    import ray

    @ray.remote
    class SuggesterActor:
        def __init__(self, idx_path: str):
            self.s = Suggester.from_index(idx_path)

        def suggest_prefix(self, prefix: str, k: int = 10):
            return self.s.suggest_prefix(prefix, k)

        def suggest_infix(self, sub: str, k: int = 10):
            return self.s.suggest_infix(sub, k)

        def correct(self, word: str, max_dist: int = 2):
            return self.s.correct(word, max_dist)

        def suggest_fuzzy(self, word: str, k: int = 10, max_edits: int = 1):
            return self.s.suggest_fuzzy(word, k, max_edits)

        def correct_topk(self, word: str, k: int = 5, max_dist: int = 2):
            return self.s.correct_topk(word, k, max_dist)

    name = "rindex-suggester-" + hashlib.md5(idx.encode()).hexdigest()[:10]
    return SuggesterActor.options(
        name=name, get_if_exists=True, num_cpus=1
    ).remote(idx)
