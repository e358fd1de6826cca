"""Property-based codec tests (hypothesis) — the randomized-testing layer of
the reference's test strategy (SURVEY.md §5: LuceneTestCase randomized runs,
BasePostingsFormatTestCase random corpora).  Hypothesis shrinks failures to
minimal posting lists, covering the edge geometry seeded-random tests miss
(df=1, single block, exact block-boundary lengths, zero-width deltas...)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from rindex.codec import (
    decode_positions,
    decode_posting,
    decode_posting_fast,
    encode_norms,
    encode_posting,
    encode_postings_batch,
    encode_positions_batch,
    int_to_byte4,
    byte4_to_int,
)


@st.composite
def posting_list(draw, max_doc=1 << 20, max_len=400):
    n = draw(st.integers(1, max_len))
    docs = draw(
        st.lists(
            st.integers(0, max_doc), min_size=n, max_size=n, unique=True
        )
    )
    docs = np.sort(np.asarray(docs, dtype=np.int64))
    tfs = np.asarray(
        draw(st.lists(st.integers(1, 1 << 15), min_size=n, max_size=n)),
        dtype=np.int64,
    )
    norms = np.asarray(
        draw(st.lists(st.integers(0, 255), min_size=n, max_size=n)),
        dtype=np.uint8,
    )
    return docs, tfs, norms


@settings(max_examples=60, deadline=None)
@given(posting_list())
def test_posting_roundtrip_both_decoders(pl):
    docs, tfs, norms = pl
    row = encode_posting(docs, tfs, norms)
    assert row["df"] == len(docs)
    assert row["ttf"] == int(tfs.sum())
    for dec in (decode_posting, decode_posting_fast):
        d, t, n = dec(row)
        np.testing.assert_array_equal(np.asarray(d, np.int64), docs)
        np.testing.assert_array_equal(np.asarray(t, np.int64), tfs)
        np.testing.assert_array_equal(np.asarray(n, np.uint8), norms)


@settings(max_examples=25, deadline=None)
@given(st.lists(posting_list(max_len=150), min_size=1, max_size=8))
def test_batch_encoder_byte_identical_to_per_term(lists):
    bounds = np.cumsum([0] + [len(d) for d, _, _ in lists])
    docs = np.concatenate([d for d, _, _ in lists])
    tfs = np.concatenate([t for _, t, _ in lists])
    norms = np.concatenate([n for _, _, n in lists])
    enc = encode_postings_batch(bounds, docs, tfs, norms)
    blk_bounds = np.concatenate([[0], np.cumsum(enc["block_counts"])])
    for i, (d, t, n) in enumerate(lists):
        single = encode_posting(d, t, n)
        blob = bytes(
            enc["blob_data"][enc["blob_offsets"][i]: enc["blob_offsets"][i + 1]]
        )
        assert blob == single["blob"]
        s, e = blk_bounds[i], blk_bounds[i + 1]
        assert list(enc["block_first_doc"][s:e]) == single["block_first_doc"]
        assert list(enc["block_offset"][s:e]) == single["block_offset"]


@st.composite
def positions_for_terms(draw, n_terms_max=5):
    n_terms = draw(st.integers(1, n_terms_max))
    all_pos, bounds, mask, per_term = [], [0], [], []
    for _ in range(n_terms):
        n_docs = draw(st.integers(1, 10))
        tfs, runs = [], []
        for _ in range(n_docs):
            tf = draw(st.integers(1, 6))
            ps = draw(
                st.lists(
                    st.integers(0, 5000), min_size=tf, max_size=tf,
                    unique=True,
                )
            )
            runs.append(np.sort(np.asarray(ps, dtype=np.int64)))
            tfs.append(tf)
            mask.extend([True] + [False] * (tf - 1))
        flat = np.concatenate(runs)
        all_pos.append(flat)
        bounds.append(bounds[-1] + len(flat))
        per_term.append((np.asarray(tfs, np.int64), flat))
    return (
        np.concatenate(all_pos),
        np.asarray(bounds, np.int64),
        np.asarray(mask, bool),
        per_term,
    )


@settings(max_examples=40, deadline=None)
@given(positions_for_terms())
def test_positions_roundtrip_property(data):
    positions, bounds, mask, per_term = data
    packed, offsets, widths = encode_positions_batch(bounds, mask, positions)
    for t, (tfs, flat) in enumerate(per_term):
        blob = packed[offsets[t]: offsets[t + 1]].tobytes()
        dec = decode_positions(blob, int(widths[t]), tfs)
        np.testing.assert_array_equal(dec, flat)


@settings(max_examples=100, deadline=None)
@given(st.integers(0, 2**31 - 1))
def test_smallfloat_norm_properties(v):
    b = int_to_byte4(v)
    assert 0 <= b <= 255
    dec = byte4_to_int(b)
    # lossy floor: decode(encode(x)) is the largest representable <= x
    assert dec <= v
    assert byte4_to_int(int_to_byte4(dec)) == dec  # idempotent on decoded
    # vectorized table encode agrees with the scalar path
    assert int(encode_norms(np.array([max(v, 0)]))[0]) == b
