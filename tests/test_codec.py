"""Codec conformance: round-trip + skip/impact invariants over random posting
lists (FIXTURES.md §4; reference model: BasePostingsFormatTestCase +
CheckIndex#checkImpacts)."""

import numpy as np
import pytest

from rindex import codec
from rindex.schema import BLOCK_SIZE


def random_posting(rng, n, clustered=False):
    if clustered:
        gaps = rng.choice([1, 1, 1, 2, 3, 50, 1000], size=n)
    else:
        gaps = rng.integers(1, 500, size=n)
    docs = np.cumsum(gaps) - 1
    tfs = rng.integers(1, 1000, size=n)
    norms = codec.encode_norms(rng.integers(1, 5000, size=n))
    return docs.astype(np.int64), tfs.astype(np.int64), norms


@pytest.mark.parametrize("n", [1, 2, 127, 128, 129, 1000, 10000])
@pytest.mark.parametrize("clustered", [False, True])
def test_roundtrip(n, clustered):
    rng = np.random.Generator(np.random.PCG64(n * 2 + clustered))
    docs, tfs, norms = random_posting(rng, n, clustered)
    enc = codec.encode_posting(docs, tfs, norms)
    d, t, nn = codec.decode_posting(enc)
    np.testing.assert_array_equal(d, docs)
    np.testing.assert_array_equal(t, tfs)
    np.testing.assert_array_equal(nn, norms)
    assert enc["df"] == n
    assert enc["ttf"] == int(tfs.sum())


def test_block_metadata_invariants():
    rng = np.random.Generator(np.random.PCG64(7))
    docs, tfs, norms = random_posting(rng, 5000, clustered=True)
    enc = codec.encode_posting(docs, tfs, norms)
    nb = len(enc["block_offset"])
    assert nb == (5000 + BLOCK_SIZE - 1) // BLOCK_SIZE
    prev_last = -1
    for i in range(nb):
        d, t, nn = codec.decode_block(enc["blob"], enc["block_offset"][i], prev_last)
        assert enc["block_first_doc"][i] == d[0]
        assert enc["block_last_doc"][i] == d[-1]
        # impacts are upper bounds (CheckIndex#checkImpacts analog)
        assert enc["block_max_tf"][i] == t.max()
        assert enc["block_min_norm"][i] == nn.min()
        assert np.all(np.diff(d) > 0)
        assert prev_last < d[0]
        prev_last = int(d[-1])


@pytest.mark.parametrize("n_parts", [2, 3, 7])
def test_concat_disjoint(n_parts):
    rng = np.random.Generator(np.random.PCG64(99))
    docs, tfs, norms = random_posting(rng, 3000)
    cuts = sorted(rng.integers(1, 3000, size=n_parts - 1))
    parts = []
    prev = 0
    for c in list(cuts) + [3000]:
        if c > prev:
            parts.append(codec.encode_posting(docs[prev:c], tfs[prev:c], norms[prev:c]))
        prev = c
    merged = codec.concat_postings(parts)
    d, t, nn = codec.decode_posting(merged)
    np.testing.assert_array_equal(d, docs)
    np.testing.assert_array_equal(t, tfs)
    np.testing.assert_array_equal(nn, norms)
    assert merged["df"] == 3000


def test_concat_interleaved_falls_back():
    rng = np.random.Generator(np.random.PCG64(5))
    docs, tfs, norms = random_posting(rng, 1000)
    even = codec.encode_posting(docs[::2], tfs[::2], norms[::2])
    odd = codec.encode_posting(docs[1::2], tfs[1::2], norms[1::2])
    merged = codec.concat_postings([even, odd])
    d, t, nn = codec.decode_posting(merged)
    np.testing.assert_array_equal(d, docs)
    np.testing.assert_array_equal(t, tfs)
    np.testing.assert_array_equal(nn, norms)


def test_smallfloat_matches_reference_semantics():
    # exact below 24; lossy, monotone, decode(encode(x)) <= x above
    for i in range(0, 40):
        assert codec.byte4_to_int(codec.int_to_byte4(i)) <= i
    for i in range(0, 24):
        assert codec.int_to_byte4(i) == i
    last = -1
    for i in [0, 1, 23, 24, 31, 32, 40, 41, 100, 1000, 10**6, 2**31 - 1]:
        b = codec.int_to_byte4(i)
        assert 0 <= b <= 255
        assert b >= last
        last = b
    assert codec.int_to_byte4(2**31 - 1) == 255
    # vectorized table encode == scalar encode
    vals = np.array([0, 1, 7, 23, 24, 25, 31, 32, 40, 63, 64, 100, 4096, 10**6])
    np.testing.assert_array_equal(
        codec.encode_norms(vals), [codec.int_to_byte4(int(v)) for v in vals]
    )


def test_bitpack_roundtrip():
    rng = np.random.Generator(np.random.PCG64(3))
    for w in [0, 1, 3, 8, 13, 27, 32]:
        n = int(rng.integers(1, 300))
        vals = rng.integers(0, 2**w if w else 1, size=n).astype(np.uint32)
        packed = codec.bitpack(vals, w)
        out = codec.bitunpack(packed, n, w)
        np.testing.assert_array_equal(out, vals)


def test_vectorized_tokenize_partials_byte_identical():
    """The Arrow-native combiner must emit byte-identical partial rows to
    the per-doc Python path, including apostrophe/overlong fallbacks."""
    import numpy as np
    import pyarrow as pa

    from rindex.build import (
        _make_tokenize_partials,
        _make_tokenize_partials_vec,
    )

    texts = [
        "the quick brown fox", "don't stop it's o'clock", "",
        "'leading trailing' '' x", "a " * 50 + "b",
        "x" * 700 + " plain", "dup dup dup value",
    ] * 3
    n = len(texts)
    batch = pa.table(
        {
            "seg": pa.array((np.arange(n) % 2).astype(np.int32)),
            "doc": pa.array(np.arange(n, dtype=np.int32)),
            "text": pa.array(texts),
        }
    )
    for salt_range in (None, 4):
        a = _make_tokenize_partials("standard", salt_range)(batch).to_pandas()
        b = _make_tokenize_partials_vec(salt_range)(batch).to_pandas()
        key = ["seg", "term", "salt"]
        a = a.sort_values(key).reset_index(drop=True)
        b = b.sort_values(key).reset_index(drop=True)
        assert len(a) == len(b)
        for c in a.columns:
            assert (a[c] == b[c]).all(), c


def test_decode_posting_fast_equivalence():
    import numpy as np

    from rindex.codec import (
        decode_posting, decode_posting_fast, encode_posting,
    )

    rng = np.random.default_rng(21)
    for _ in range(25):
        n = int(rng.integers(1, 3000))
        docs = np.sort(rng.choice(500000, size=n, replace=False))
        tfs = rng.integers(1, 60, n)
        norms = rng.integers(0, 256, n).astype(np.uint8)
        row = encode_posting(docs, tfs, norms)
        for x, y in zip(decode_posting(row), decode_posting_fast(row)):
            assert np.array_equal(
                np.asarray(x, dtype=np.int64), np.asarray(y, dtype=np.int64)
            )
