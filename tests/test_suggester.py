"""Actor-resident suggester (rindex/suggester.py): compiled-lookup
correctness vs brute force over a synthetic vocabulary, and the
build-once/serve-many latency contract (warm lookups must be far below
the build cost — the reason the FST lives in RAM)."""

import time

import numpy as np
import pytest

from rindex.suggester import Suggester, rank_correction


def _vocab(n=50_000, seed=7):
    rng = np.random.default_rng(seed)
    syll = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    lens = rng.integers(3, 12, n)
    terms = np.array(
        ["".join(rng.choice(syll, size=int(k))) for k in lens], dtype=str
    )
    uniq = np.unique(terms)
    weights = rng.integers(1, 1000, len(uniq)).astype(np.int64)
    return uniq, weights


@pytest.fixture(scope="module")
def sugg():
    terms, weights = _vocab()
    t0 = time.perf_counter()
    s = Suggester(terms, weights)
    build_s = time.perf_counter() - t0
    return s, terms, weights, build_s


def _brute_topk(terms, weights, mask, k):
    t, w = terms[mask], weights[mask]
    sel = np.lexsort((t, -w))[:k]
    return [(str(t[i]), int(w[i])) for i in sel]


def test_prefix_matches_brute_force(sugg):
    s, terms, weights, _ = sugg
    for p in ["ab", "qu", "zz", "a", "xyz"]:
        got = s.suggest_prefix(p, 10)
        want = _brute_topk(
            terms, weights, np.char.startswith(terms, p), 10
        )
        assert got == want, p


def test_infix_matches_brute_force(sugg):
    s, terms, weights, _ = sugg
    for sub in ["abc", "ing", "qua", "zzz", "ab"]:  # incl. sub-trigram
        got = s.suggest_infix(sub, 10)
        want = _brute_topk(
            terms, weights, np.char.find(terms, sub) >= 0, 10
        )
        assert got == want, sub


def test_correct_matches_dict_rule(sugg):
    s, terms, weights, _ = sugg
    word = str(terms[123])[:-1] + "q"  # 1 edit from a real term
    got = s.correct(word)
    want = rank_correction(word, terms, weights)
    assert got == want and got is not None and got[1] <= 2


def test_warm_lookups_beat_the_build(sugg):
    """The resident pattern's contract: after the one-time compile, a
    burst of lookups costs a small fraction of ONE build — if this fails,
    serving re-pays the scan and the actor is pointless."""
    s, terms, weights, build_s = sugg
    prefixes = [str(t)[:3] for t in terms[:: len(terms) // 200]]
    t0 = time.perf_counter()
    for p in prefixes:
        s.suggest_prefix(p, 10)
    per_lookup = (time.perf_counter() - t0) / len(prefixes)
    # generous 4x margin against CI noise: 200 warm lookups << 1 build
    assert per_lookup * len(prefixes) < build_s * 4
    # and each lookup is sub-10ms on a 50k vocab
    assert per_lookup < 0.010


def test_empty_and_miss_paths(sugg):
    s, _, _, _ = sugg
    assert s.suggest_prefix("nosuchprefix123", 10) == []
    assert s.suggest_infix("qqqqq", 10) == []
    assert s.correct("zzzzzzzzzzzz") is None


def _brute_prefix_edit(q: str, t: str) -> int:
    # textbook DP, min over all prefixes of t
    import itertools

    best = len(q)
    for j in range(len(t) + 1):
        p = t[:j]
        D = list(range(len(p) + 1))
        for i, qc in enumerate(q, 1):
            nD = [i]
            for jj, tc in enumerate(p, 1):
                nD.append(min(D[jj] + 1, nD[jj - 1] + 1,
                              D[jj - 1] + (qc != tc)))
            D = nD
        best = min(best, D[len(p)])
    return best


def test_prefix_edit_vec_matches_brute_force():
    from rindex.suggester import _prefix_edit_vec

    rng = np.random.default_rng(11)
    syll = np.array(list("abcd"))  # tiny alphabet -> many near-collisions
    terms = np.array(
        ["".join(rng.choice(syll, size=int(k)))
         for k in rng.integers(1, 9, 300)],
        dtype=str,
    )
    for q in ["abc", "dcba", "aaaa", "bd", "cabd"]:
        got = _prefix_edit_vec(q, terms)
        want = np.array([_brute_prefix_edit(q, t) for t in terms])
        assert (got == want).all(), q


def test_suggest_fuzzy_matches_brute_force(sugg):
    from rindex.suggester import _prefix_edit_vec

    s, terms, weights, _ = sugg
    for q in ["abcde", "quart", "zzyx"]:
        got = s.suggest_fuzzy(q, 10, 1)
        first = np.char.startswith(terms, q[0])
        d = _prefix_edit_vec(q, terms[first])
        m = d <= 1
        t, w, dd = terms[first][m], weights[first][m], d[m]
        sel = np.lexsort((t, -w))[:10]
        want = [(str(t[i]), int(w[i]), int(dd[i])) for i in sel]
        assert got == want, q


def test_suggest_fuzzy_short_query_falls_back_to_prefix(sugg):
    s, terms, weights, _ = sugg
    got = s.suggest_fuzzy("ab", 10, 1)
    want = [(t, w, 0) for t, w in s.suggest_prefix("ab", 10)]
    assert got == want
