"""Minimal-interval kernels vs naive enumeration (the algebra's
definition): candidates = all (start, end) containing a valid arrangement,
minimal = no other candidate properly nested inside."""

import numpy as np
import pytest

from rindex.ops.intervals import (
    filter_containing,
    minimal_ordered,
    minimal_unordered,
)


def _naive_minimal(cands):
    cands = sorted(set(cands))
    out = [
        (s, e)
        for (s, e) in cands
        if not any(
            s2 >= s and e2 <= e and (s2, e2) != (s, e) for (s2, e2) in cands
        )
    ]
    return out


def _naive_ordered(pa, pb):
    return _naive_minimal(
        [(a, b) for a in pa for b in pb if b > a]
    )


def _naive_unordered(pa, pb):
    return _naive_minimal(
        [(min(a, b), max(a, b)) for a in pa for b in pb if a != b]
    )


@pytest.mark.parametrize("seed", range(40))
def test_ordered_matches_naive(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(0, 12))
    m = int(rng.integers(0, 12))
    pos = rng.choice(60, size=min(60, n + m), replace=False)
    pa = np.sort(pos[:n]).astype(np.int64)
    pb = np.sort(pos[n:]).astype(np.int64)
    s, e = minimal_ordered(pa, pb)
    assert list(zip(s.tolist(), e.tolist())) == _naive_ordered(
        pa.tolist(), pb.tolist()
    )


@pytest.mark.parametrize("seed", range(40))
def test_unordered_matches_naive(seed):
    rng = np.random.default_rng(seed + 1000)
    n = int(rng.integers(0, 12))
    m = int(rng.integers(0, 12))
    pos = rng.choice(60, size=min(60, n + m), replace=False)
    pa = np.sort(pos[:n]).astype(np.int64)
    pb = np.sort(pos[n:]).astype(np.int64)
    s, e = minimal_unordered(pa, pb)
    assert list(zip(s.tolist(), e.tolist())) == _naive_unordered(
        pa.tolist(), pb.tolist()
    )


@pytest.mark.parametrize("seed", range(20))
def test_containing_filters(seed):
    rng = np.random.default_rng(seed + 2000)
    s = np.sort(rng.choice(50, size=8, replace=False)).astype(np.int64)
    e = s + rng.integers(1, 10, size=8)
    pc = np.sort(rng.choice(60, size=5, replace=False)).astype(np.int64)
    ks, ke = filter_containing(s, e, pc)
    ns, ne = filter_containing(s, e, pc, invert=True)
    for a, b in zip(ks.tolist(), ke.tolist()):
        assert any(a <= p <= b for p in pc.tolist())
    for a, b in zip(ns.tolist(), ne.tolist()):
        assert not any(a <= p <= b for p in pc.tolist())
    assert len(ks) + len(ns) == len(s)


def test_minimal_set_is_antichain():
    rng = np.random.default_rng(7)
    pa = np.sort(rng.choice(200, 30, replace=False)).astype(np.int64)
    pb = np.sort(rng.choice(200, 30, replace=False)).astype(np.int64)
    pb = np.setdiff1d(pb, pa)
    for fn in (minimal_ordered, minimal_unordered):
        s, e = fn(pa, pb)
        assert (np.diff(s) > 0).all() and (np.diff(e) > 0).all()
