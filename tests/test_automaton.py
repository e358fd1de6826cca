"""TermAutomatonQuery NFA evaluator vs a naive per-doc interpreter on
random corpora and random DAG automata (the BasePostingsFormat-style
randomized property discipline, here for the sandbox TermAutomatonQuery
semantics: freq = distinct accepting end positions)."""

import numpy as np
import pytest

from rindex.ops.automaton import TA_ACCEPT, TA_TRANSITIONS, run_term_automaton

VOCAB = ["a", "b", "c", "d", "e"]


class FakeReader:
    """Duck-typed positional segment: positions_for from token lists."""

    def __init__(self, docs_tokens):
        self.docs_tokens = docs_tokens

    def positions_for(self, terms):
        out = {}
        for t in terms:
            docs, tfs, pos = [], [], []
            for d, toks in enumerate(self.docs_tokens):
                p = [i for i, x in enumerate(toks) if x == t]
                if p:
                    docs.append(d)
                    tfs.append(len(p))
                    pos.extend(p)
            out[t] = (
                None
                if not docs
                else (
                    np.asarray(docs, np.int64),
                    np.asarray(tfs, np.int64),
                    np.asarray(pos, np.int64),
                    None,
                )
            )
        return out


def naive_freqs(docs_tokens, transitions, accept):
    n_states = max(t for _, _, t in transitions) + 1
    outs = [[] for _ in range(n_states)]
    for f, lab, t in transitions:
        outs[f].append((lab, t))
    freqs = {}
    for d, toks in enumerate(docs_tokens):
        ends = set()
        for start in range(len(toks)):
            stack = [(0, start)]
            while stack:
                q, i = stack.pop()
                if q in accept:
                    ends.add(i - 1)
                if i >= len(toks):
                    continue
                for lab, t in outs[q]:
                    if lab is None or toks[i] == lab:
                        stack.append((t, i + 1))
        # state 0 is never accepting in our automata; ends collected above
        if ends:
            freqs[d] = len(ends)
    return freqs


def rand_automaton(rng):
    n = int(rng.integers(3, 6))
    accept = {n - 1}
    transitions = []
    # spine guarantees accept reachable via term transitions
    for q in range(n - 1):
        transitions.append((q, VOCAB[int(rng.integers(len(VOCAB)))], q + 1))
    for _ in range(int(rng.integers(0, 5))):
        f = int(rng.integers(0, n - 1))
        t = int(rng.integers(f + 1, n))
        lab = VOCAB[int(rng.integers(len(VOCAB)))]
        if rng.random() < 0.3 and f != 0 and t not in accept:
            lab = None
        transitions.append((f, lab, t))
    return transitions, frozenset(accept)


@pytest.mark.parametrize("seed", range(8))
def test_random_automata_match_naive(seed):
    rng = np.random.default_rng(seed)
    docs = [
        [VOCAB[int(rng.integers(len(VOCAB)))] for _ in range(int(rng.integers(0, 30)))]
        for _ in range(40)
    ]
    transitions, accept = rand_automaton(rng)
    reader = FakeReader(docs)
    uniq, cnt = run_term_automaton(reader, transitions, accept)
    got = {int(d): int(c) for d, c in zip(uniq, cnt)}
    assert got == naive_freqs(docs, transitions, accept)


def test_headline_automaton_gap_semantics():
    docs = [
        ["hash", "join"],
        ["merge", "sort", "join"],
        ["hash", "x", "y", "join"],  # gap of 2: no match
        ["join", "hash"],
        ["hash", "join", "merge", "join"],  # two distinct ends
        ["hash"],  # ANY past end must not accept
        ["merge", "hash", "join"],  # ends at 2 via both paths -> freq 1
    ]
    uniq, cnt = run_term_automaton(
        FakeReader(docs), TA_TRANSITIONS, TA_ACCEPT
    )
    got = {int(d): int(c) for d, c in zip(uniq, cnt)}
    assert got == {0: 1, 1: 1, 4: 2, 6: 1}


def test_constraint_validation():
    with pytest.raises(ValueError):
        run_term_automaton(FakeReader([]), [(0, None, 1)], frozenset({1}))
    with pytest.raises(ValueError):
        run_term_automaton(
            FakeReader([]),
            [(0, "a", 1), (1, None, 2)],
            frozenset({2}),
        )
    with pytest.raises(ValueError):
        run_term_automaton(FakeReader([]), [(1, "a", 1)], frozenset({1}))
