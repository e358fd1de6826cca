"""Posting-list block codec: delta + FOR bit-packing, SmallFloat norms.

Re-implements the *semantics* of the reference's block postings format
(`lucene/core/src/java/org/apache/lucene/codecs/lucene84/{Lucene84PostingsWriter,
ForUtil,ForDeltaUtil}.java`): postings are split into blocks of up to
BLOCK_SIZE=128 entries; within a block docIDs are delta-encoded against the
previous entry and bit-packed at the block's max bit width (FOR).  Term
frequencies are FOR-packed too (the reference uses PFor with exceptions for
freqs; plain FOR is an intentional simplification with the same asymptotics).
Norm bytes ride inline (1 byte/entry) instead of a separate norms file so the
scoring kernel needs no per-doc gather — a deliberate columnar-layout change,
not a semantic one (the norm VALUE is byte-identical to Lucene's SmallFloat
encoding, see `intToByte4` below).

Per-block metadata (first_doc, last_doc, max_tf, min_norm) is stored outside
the blob (POSTINGS_SCHEMA list columns) and is the skip list + impacts
(`Lucene84SkipWriter` / `ImpactsEnum` analog) that block-max WAND consumes.

All kernels are vectorized numpy; no Python loops over postings.
"""

from __future__ import annotations

import struct

import numpy as np

from rindex.schema import BLOCK_SIZE

# ---------------------------------------------------------------------------
# SmallFloat norm encoding (reference: lucene/core/.../util/SmallFloat.java
# #intToByte4/#byte4ToInt).  Encodes a positive int (field length in tokens)
# into one lossy byte: values < 24 exact, larger values as a 4-bit-mantissa
# float.  BM25's dl comes from decoding this byte — score parity with the
# reference requires bit-identical behavior here.
# ---------------------------------------------------------------------------

_MAX_INT4 = None  # computed below
_NUM_FREE_VALUES = None


def long_to_int4(i: int) -> int:
    if i < 0:
        raise ValueError("only positive values")
    num_bits = i.bit_length()
    if num_bits < 4:
        # subnormal value
        return i
    # keep 4 significant bits, clear the implicit leading one, encode shift+1
    shift = num_bits - 4
    return ((i >> shift) & 0x07) | ((shift + 1) << 3)


def int4_to_long(i: int) -> int:
    bits = i & 0x07
    shift = (i >> 3) - 1
    if shift == -1:
        return bits
    return (bits | 0x08) << shift


_MAX_INT4 = long_to_int4(2**31 - 1)
_NUM_FREE_VALUES = 255 - _MAX_INT4  # == 24


def int_to_byte4(i: int) -> int:
    """Lossy-encode a positive int to an unsigned byte (0..255)."""
    if i < 0:
        raise ValueError("only positive values")
    if i < _NUM_FREE_VALUES:
        return i
    return _NUM_FREE_VALUES + long_to_int4(i - _NUM_FREE_VALUES)


def byte4_to_int(b: int) -> int:
    if b < _NUM_FREE_VALUES:
        return b
    return _NUM_FREE_VALUES + int4_to_long(b - _NUM_FREE_VALUES)


# Vectorized lookup tables: norms only take 256 decoded values, and encode is
# monotone, so both directions are table lookups.
NORM_DECODE_TABLE: np.ndarray = np.array(
    [byte4_to_int(b) for b in range(256)], dtype=np.int64
)


def encode_norms(dls: np.ndarray) -> np.ndarray:
    """Vectorized int_to_byte4 over an int array of field lengths -> uint8."""
    dls = np.asarray(dls, dtype=np.int64)
    # encode = searchsorted on the decode table (monotone, decode(encode(x))
    # is the largest representable value <= x).
    idx = np.searchsorted(NORM_DECODE_TABLE, dls, side="right") - 1
    return idx.astype(np.uint8)


def decode_norms(norms: np.ndarray) -> np.ndarray:
    return NORM_DECODE_TABLE[np.asarray(norms, dtype=np.uint8)]


# ---------------------------------------------------------------------------
# FOR bit-packing (numpy).  Packs n uint32 values at width w bits into bytes.
# ---------------------------------------------------------------------------


def bitpack(values: np.ndarray, width: int) -> bytes:
    """Pack uint32 values into `width` bits each (big-endian bit order)."""
    if width == 0:
        return b""
    v = np.asarray(values, dtype=np.uint32)
    shifts = np.arange(width - 1, -1, -1, dtype=np.uint32)
    bits = ((v[:, None] >> shifts[None, :]) & 1).astype(np.uint8)
    return np.packbits(bits.ravel()).tobytes()


def bitunpack(data: bytes, n: int, width: int) -> np.ndarray:
    """Inverse of bitpack -> uint32 array of length n."""
    if width == 0:
        return np.zeros(n, dtype=np.uint32)
    bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8), count=n * width)
    bits = bits.reshape(n, width).astype(np.uint32)
    weights = (np.uint32(1) << np.arange(width - 1, -1, -1, dtype=np.uint32))
    return bits @ weights


def _width(values: np.ndarray) -> int:
    if len(values) == 0:
        return 0
    m = int(values.max())
    return m.bit_length()


# ---------------------------------------------------------------------------
# Posting-list encode/decode.
#
# Blob layout per block:
#   header: <u16 n> <u8 w_doc> <u8 w_tf>
#   payload: bitpack(doc_deltas, w_doc) + bitpack(tfs - 1, w_tf) + norms(u8*n)
# Block 0's first delta is doc[0] - base (base = -1 for a fresh list, i.e.
# delta = doc[0] + 1); later blocks delta against the previous block's last
# doc.  Metadata arrays are returned separately (POSTINGS_SCHEMA columns).
# ---------------------------------------------------------------------------

_HEADER = struct.Struct("<HBB")


def encode_posting(
    docs: np.ndarray,
    tfs: np.ndarray,
    norms: np.ndarray,
    block_size: int = BLOCK_SIZE,
) -> dict:
    """Encode a full posting list (ascending unique docIDs) into blocks.

    Returns dict with keys: blob, block_first_doc, block_last_doc,
    block_max_tf, block_min_norm, block_offset, df, ttf.
    """
    docs = np.asarray(docs, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    norms = np.asarray(norms, dtype=np.uint8)
    n = len(docs)
    parts: list[bytes] = []
    first_doc: list[int] = []
    last_doc: list[int] = []
    max_tf: list[int] = []
    min_norm: list[int] = []
    offsets: list[int] = []
    pos = 0
    prev = -1
    for start in range(0, n, block_size):
        end = min(start + block_size, n)
        bd = docs[start:end]
        bt = tfs[start:end]
        bn = norms[start:end]
        deltas = np.empty(end - start, dtype=np.int64)
        deltas[0] = bd[0] - prev
        deltas[1:] = bd[1:] - bd[:-1]
        prev = int(bd[-1])
        w_doc = _width(deltas)
        w_tf = _width(bt - 1)
        payload = (
            _HEADER.pack(end - start, w_doc, w_tf)
            + bitpack(deltas.astype(np.uint32), w_doc)
            + bitpack((bt - 1).astype(np.uint32), w_tf)
            + bn.tobytes()
        )
        parts.append(payload)
        first_doc.append(int(bd[0]))
        last_doc.append(prev)
        max_tf.append(int(bt.max()))
        min_norm.append(int(bn.min()))
        offsets.append(pos)
        pos += len(payload)
    return {
        "blob": b"".join(parts),
        "block_first_doc": first_doc,
        "block_last_doc": last_doc,
        "block_max_tf": max_tf,
        "block_min_norm": min_norm,
        "block_offset": offsets,
        "df": n,
        "ttf": int(tfs.sum()) if n else 0,
    }


def _bits_to_widths(maxvals: np.ndarray) -> np.ndarray:
    """Vectorized bit_length over an int64 array (0 -> width 0)."""
    w = np.zeros(len(maxvals), dtype=np.int64)
    nz = maxvals > 0
    # frexp is exact for int64 magnitudes here (< 2^53 after deltas)
    w[nz] = np.frexp(maxvals[nz].astype(np.float64))[1]
    # guard against float rounding at exact powers of two boundaries
    bad = nz & ((maxvals >> np.clip(w, 0, 63)) > 0)
    w[bad] += 1
    return w


def _pack_region(
    values: np.ndarray,
    widths: np.ndarray,
    blk_of: np.ndarray,
    blk_starts: np.ndarray,
) -> tuple[np.ndarray, np.ndarray]:
    """Pack per-block bit regions for ALL blocks in one np.packbits call.

    values: int64 per entry; widths: bits per block; blk_of: block id per
    entry; blk_starts: entry index where each block starts.  Each block's
    region is byte-padded (== bitpack(values_of_block, width) layout).
    Returns (packed uint8 array, per-block byte offsets into it).
    """
    n_blocks = len(blk_starts)
    counts = np.diff(np.append(blk_starts, len(values)))
    region_bytes = (counts * widths + 7) // 8
    region_off = np.concatenate([[0], np.cumsum(region_bytes)])
    total_bits = int(region_bytes.sum()) * 8
    if total_bits == 0:
        return np.zeros(0, dtype=np.uint8), region_off
    w_of = widths[blk_of]
    keep = w_of > 0
    v = values[keep]
    w = w_of[keep]
    # bit position of each value's MSB within the global padded bit stream
    idx_in_blk = np.arange(len(values), dtype=np.int64) - blk_starts[blk_of]
    base_bit = region_off[blk_of] * 8 + idx_in_blk * w_of
    base_bit = base_bit[keep]
    # expand each value into w bits (MSB first), scattered into a flat array
    nbits_per_val = w
    out_pos = np.repeat(base_bit, nbits_per_val) + (
        np.arange(int(nbits_per_val.sum()), dtype=np.int64)
        - np.repeat(np.cumsum(nbits_per_val) - nbits_per_val, nbits_per_val)
    )
    shift = np.repeat(w - 1, nbits_per_val) - (
        out_pos - np.repeat(base_bit, nbits_per_val)
    )
    bits = np.zeros(total_bits, dtype=np.uint8)
    bits[out_pos] = (np.repeat(v, nbits_per_val) >> shift) & 1
    return np.packbits(bits), region_off


def encode_postings_batch(
    term_bounds: np.ndarray,
    docs: np.ndarray,
    tfs: np.ndarray,
    norms: np.ndarray,
    block_size: int = BLOCK_SIZE,
) -> dict:
    """Vectorized encode of MANY posting lists at once (the segment-writer
    hot kernel).  `term_bounds` are posting-array offsets per term
    (len = n_terms + 1); docs ascending within each term.  Byte-identical to
    per-term `encode_posting` (tests assert), but one np.packbits pass for
    the whole segment instead of 2 Python calls per block.

    Returns dict of numpy/pyarrow-ready columns:
      blob_data (uint8), blob_offsets (int64, per-term byte ranges),
      block_* (flat arrays) + block_counts (per-term #blocks),
      df, ttf (per-term).
    """
    docs = np.asarray(docs, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    norms = np.asarray(norms, dtype=np.uint8)
    term_bounds = np.asarray(term_bounds, dtype=np.int64)
    n = len(docs)
    n_terms = len(term_bounds) - 1
    dfs = np.diff(term_bounds)
    if n == 0:
        z = np.zeros(0, dtype=np.int64)
        return {
            "blob_data": np.zeros(0, dtype=np.uint8),
            "blob_offsets": np.zeros(n_terms + 1, dtype=np.int64),
            "block_first_doc": z, "block_last_doc": z,
            "block_max_tf": z, "block_min_norm": z, "block_offset": z,
            "block_counts": np.zeros(n_terms, dtype=np.int64),
            "df": dfs, "ttf": np.zeros(n_terms, dtype=np.int64),
        }
    term_of = np.repeat(np.arange(n_terms, dtype=np.int64), dfs)
    pos_in_term = np.arange(n, dtype=np.int64) - term_bounds[term_of]
    is_blk_start = (pos_in_term % block_size) == 0
    blk_starts = np.flatnonzero(is_blk_start)
    blk_of = np.cumsum(is_blk_start) - 1
    n_blocks = len(blk_starts)
    blk_counts = np.diff(np.append(blk_starts, n))
    blk_ends = blk_starts + blk_counts
    blk_term = term_of[blk_starts]
    # deltas: within block/term against previous posting; at each term's
    # first posting, delta = doc + 1 (base -1); at later block starts, the
    # delta still references the previous block's last doc (same formula).
    deltas = np.empty(n, dtype=np.int64)
    deltas[0] = docs[0] + 1
    deltas[1:] = docs[1:] - docs[:-1]
    firsts = term_bounds[:-1][dfs > 0]
    deltas[firsts] = docs[firsts] + 1
    # per-block stats
    b_first = docs[blk_starts]
    b_last = docs[blk_ends - 1]
    b_maxtf = np.maximum.reduceat(tfs, blk_starts)
    b_minnorm = np.minimum.reduceat(norms, blk_starts).astype(np.int64)
    w_doc = _bits_to_widths(np.maximum.reduceat(deltas, blk_starts))
    w_tf = _bits_to_widths(np.maximum.reduceat(tfs - 1, blk_starts))
    # regions
    doc_packed, doc_off = _pack_region(deltas, w_doc, blk_of, blk_starts)
    tf_packed, tf_off = _pack_region(tfs - 1, w_tf, blk_of, blk_starts)
    doc_sz = np.diff(doc_off)
    tf_sz = np.diff(tf_off)
    blk_bytes = _HEADER.size + doc_sz + tf_sz + blk_counts
    blk_off_global = np.concatenate([[0], np.cumsum(blk_bytes)])
    total_bytes = int(blk_off_global[-1])
    out = np.zeros(total_bytes, dtype=np.uint8)
    # headers: <u16 n><u8 w_doc><u8 w_tf> little-endian
    h = blk_off_global[:-1]
    out[h] = blk_counts & 0xFF
    out[h + 1] = blk_counts >> 8
    out[h + 2] = w_doc
    out[h + 3] = w_tf
    # scatter the three regions with flat fancy indexing
    def scatter(dst_base: np.ndarray, sizes: np.ndarray, src: np.ndarray):
        if len(src) == 0:
            return
        idx = np.repeat(dst_base, sizes) + (
            np.arange(int(sizes.sum()), dtype=np.int64)
            - np.repeat(np.cumsum(sizes) - sizes, sizes)
        )
        out[idx] = src

    scatter(h + _HEADER.size, doc_sz, doc_packed)
    scatter(h + _HEADER.size + doc_sz, tf_sz, tf_packed)
    scatter(h + _HEADER.size + doc_sz + tf_sz, blk_counts, norms)
    # per-term blob offsets + per-term block metadata layout
    term_first_blk = np.searchsorted(blk_term, np.arange(n_terms), side="left")
    term_blk_bounds = np.append(term_first_blk, n_blocks)
    blob_offsets = blk_off_global[term_blk_bounds]
    # block_offset is relative to the term's blob start
    block_offset = blk_off_global[:-1] - blob_offsets[blk_term]
    # reduceat misbehaves on empty ranges (df=0 terms): clamp + mask
    safe_starts = np.minimum(term_bounds[:-1], n - 1)
    ttf = np.add.reduceat(tfs, safe_starts) if n_terms else np.zeros(0)
    ttf = np.where(dfs > 0, ttf, 0).astype(np.int64)
    return {
        "blob_data": out,
        "blob_offsets": blob_offsets,
        "block_first_doc": b_first,
        "block_last_doc": b_last,
        "block_max_tf": b_maxtf,
        "block_min_norm": b_minnorm,
        "block_offset": block_offset,
        "block_counts": np.diff(term_blk_bounds),
        "df": dfs,
        "ttf": ttf,
    }


def decode_block(
    blob: bytes, offset: int, prev_doc: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode one block at `offset`; prev_doc is the previous block's last
    docID (-1 for the first block).  Returns (docs, tfs, norms)."""
    n, w_doc, w_tf = _HEADER.unpack_from(blob, offset)
    pos = offset + _HEADER.size
    len_doc = (n * w_doc + 7) // 8
    len_tf = (n * w_tf + 7) // 8
    deltas = bitunpack(blob[pos : pos + len_doc], n, w_doc).astype(np.int64)
    pos += len_doc
    tfs = bitunpack(blob[pos : pos + len_tf], n, w_tf).astype(np.int64) + 1
    pos += len_tf
    norms = np.frombuffer(blob[pos : pos + n], dtype=np.uint8)
    docs = np.cumsum(deltas) + prev_doc
    return docs, tfs, norms


def decode_posting(row: dict) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode all blocks of a posting row (dict with blob + metadata)."""
    blob = row["blob"]
    offs = row["block_offset"]
    lasts = row["block_last_doc"]
    out_d, out_t, out_n = [], [], []
    prev = -1
    for i, off in enumerate(offs):
        d, t, nn = decode_block(blob, int(off), prev)
        prev = int(lasts[i])
        out_d.append(d)
        out_t.append(t)
        out_n.append(nn)
    if not out_d:
        z = np.zeros(0, dtype=np.int64)
        return z, z.copy(), np.zeros(0, dtype=np.uint8)
    return np.concatenate(out_d), np.concatenate(out_t), np.concatenate(out_n)


def decode_posting_fast(row: dict) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized whole-posting decode (== decode_posting, tested): parse
    every block header in one pass, unpack each bit-width group with a
    single np.unpackbits + gather, and recover docIDs with one global
    cumsum (the first delta of each block chains against the previous
    block's last doc, so deltas cumsum across block boundaries).  ~10x the
    per-block path for long (stopword-class) posting lists — the decode
    hot path of both scoring kernels."""
    blob = row["blob"]
    offs = np.asarray(row["block_offset"], dtype=np.int64)
    n_blocks = len(offs)
    if n_blocks <= 4:  # setup cost beats the block loop only on long lists
        return decode_posting(row)
    u8 = np.frombuffer(blob, dtype=np.uint8)
    ns = u8[offs].astype(np.int64) | (u8[offs + 1].astype(np.int64) << 8)
    w_doc = u8[offs + 2].astype(np.int64)
    w_tf = u8[offs + 3].astype(np.int64)
    doc_start = offs + _HEADER.size
    doc_len = (ns * w_doc + 7) // 8
    tf_start = doc_start + doc_len
    tf_len = (ns * w_tf + 7) // 8
    nrm_start = tf_start + tf_len
    total = int(ns.sum())

    def unpack_regions(starts, lens, widths):
        out = np.zeros(total, dtype=np.int64)
        bounds = np.concatenate([[0], np.cumsum(ns)])
        # group blocks by (count, width): regions in a group are uniform, so
        # the whole group unpacks with ONE byte gather + reshape — no
        # bit-level indexing (typical term = 1-2 groups: full blocks at one
        # width + a tail block)
        keys = ns * 64 + widths  # widths < 64
        for key in np.unique(keys):
            sel = np.flatnonzero(keys == key)
            w = int(widths[sel[0]])
            n_in = int(ns[sel[0]])
            if w == 0:
                continue
            rb = int(lens[sel[0]])  # uniform region byte length
            byte_idx = (
                starts[sel][:, None] + np.arange(rb, dtype=np.int64)[None, :]
            ).ravel()
            bits = np.unpackbits(u8[byte_idx]).reshape(len(sel), rb * 8)
            m = bits[:, : n_in * w].reshape(-1, w)
            vals = np.zeros(len(m), dtype=np.int64)
            for j in range(w):
                vals = (vals << 1) | m[:, j]
            dst = (
                bounds[sel][:, None] + np.arange(n_in, dtype=np.int64)[None, :]
            ).ravel()
            out[dst] = vals
        return out

    deltas = unpack_regions(doc_start, doc_len, w_doc)
    docs = np.cumsum(deltas) - 1
    tfs = unpack_regions(tf_start, tf_len, w_tf) + 1
    nrm_idx = np.repeat(nrm_start, ns) + (
        np.arange(total, dtype=np.int64)
        - np.repeat(np.cumsum(ns) - ns, ns)
    )
    norms = u8[nrm_idx]
    return docs, tfs, norms


# ---------------------------------------------------------------------------
# Positional postings (opt-in, IndexOptions.DOCS_AND_FREQS_AND_POSITIONS
# analog — reference: the .pos stream of
# `lucene/core/src/java/org/apache/lucene/codecs/lucene84/
# Lucene84PostingsWriter.java#addPosition`).  Positions are within-doc token
# ordinals, stored per term as one flat delta-encoded bit-packed region in
# doc order; a doc's run is located via the prefix sum of the already-decoded
# tf array (the same sequential-skip shape as Lucene's .pos file).
# ---------------------------------------------------------------------------


def encode_positions_batch(
    occ_term_bounds: np.ndarray,
    occ_run_starts: np.ndarray,
    positions: np.ndarray,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Encode positions for MANY terms at once (one np.packbits pass).

    occ_term_bounds: int64 occurrence offsets per term (n_terms + 1);
    occ_run_starts: bool mask, True at the first occurrence of each
    (term, doc) run; positions: int64 within-doc positions, ascending per
    run.  Returns (packed uint8 data, per-term byte offsets (n_terms + 1),
    per-term bit widths).
    """
    occ_term_bounds = np.asarray(occ_term_bounds, dtype=np.int64)
    positions = np.asarray(positions, dtype=np.int64)
    n = len(positions)
    n_terms = len(occ_term_bounds) - 1
    if n == 0:
        return (
            np.zeros(0, dtype=np.uint8),
            np.zeros(n_terms + 1, dtype=np.int64),
            np.zeros(n_terms, dtype=np.int64),
        )
    deltas = positions.copy()
    deltas[1:] -= positions[:-1]
    deltas[occ_run_starts] = positions[occ_run_starts]
    ttf = np.diff(occ_term_bounds)
    term_of = np.repeat(np.arange(n_terms, dtype=np.int64), ttf)
    widths = _bits_to_widths(
        np.maximum.reduceat(deltas, np.minimum(occ_term_bounds[:-1], n - 1))
    )
    widths = np.where(ttf > 0, widths, 0)
    packed, offsets = _pack_region(
        deltas, widths, term_of, occ_term_bounds[:-1]
    )
    return packed, offsets, widths


def decode_positions(
    blob: bytes, width: int, tfs: np.ndarray
) -> np.ndarray:
    """Decode one term's position region.  `tfs` is the term's per-doc tf
    array (decoded from the doc postings); returns the flat positions array
    (sum(tfs) values, runs in doc order)."""
    tfs = np.asarray(tfs, dtype=np.int64)
    n = int(tfs.sum())
    deltas = bitunpack(blob, n, width).astype(np.int64)
    if n == 0:
        return deltas
    run_starts = np.concatenate([[0], np.cumsum(tfs)[:-1]])
    c = np.cumsum(deltas)
    base = c[run_starts] - deltas[run_starts]
    return c - np.repeat(base, tfs)


def concat_postings(parts: list[dict]) -> dict:
    """Merge partial posting encodings whose docID ranges are ascending and
    disjoint (the doc-range-salted shuffle guarantees this) by concatenating
    their block lists — no re-encode.  Falls back to decode+re-encode when
    ranges interleave (possible only for partials produced from arbitrary
    batch boundaries in the combiner path)."""
    parts = [p for p in parts if p["df"] > 0]
    if not parts:
        raise ValueError("no non-empty partials")
    if len(parts) == 1:
        return parts[0]
    parts = sorted(parts, key=lambda p: p["block_first_doc"][0])
    disjoint = all(
        parts[i]["block_last_doc"][-1] < parts[i + 1]["block_first_doc"][0]
        for i in range(len(parts) - 1)
    )
    if not disjoint:
        ds, ts, ns = zip(*(decode_posting(p) for p in parts))
        docs = np.concatenate(ds)
        order = np.argsort(docs, kind="stable")
        return encode_posting(
            docs[order], np.concatenate(ts)[order], np.concatenate(ns)[order]
        )
    # Fast path: fix up each part's first block so its first delta is against
    # the previous part's last doc, then splice blobs.
    blobs: list[bytes] = []
    first_doc: list[int] = []
    last_doc: list[int] = []
    max_tf: list[int] = []
    min_norm: list[int] = []
    offsets: list[int] = []
    pos = 0
    prev = -1
    for p in parts:
        blob = p["blob"]
        # re-delta the first block against `prev` (decode + re-encode just
        # that one block; remaining blocks splice verbatim).
        # Each part was encoded standalone (base -1), so decoding its first
        # block with prev_doc=-1 yields absolute docIDs.
        d, t, nn = decode_block(blob, int(p["block_offset"][0]), -1)
        deltas = np.empty(len(d), dtype=np.int64)
        deltas[0] = d[0] - prev
        deltas[1:] = d[1:] - d[:-1]
        w_doc = _width(deltas)
        w_tf = _width(t - 1)
        fixed = (
            _HEADER.pack(len(d), w_doc, w_tf)
            + bitpack(deltas.astype(np.uint32), w_doc)
            + bitpack((t - 1).astype(np.uint32), w_tf)
            + nn.tobytes()
        )
        n_blocks = len(p["block_offset"])
        rest_start = p["block_offset"][1] if n_blocks > 1 else len(blob)
        blobs.append(fixed)
        blobs.append(blob[int(rest_start) :])
        shift = pos - 0
        offsets.append(pos)
        for i in range(1, n_blocks):
            offsets.append(int(p["block_offset"][i]) - int(rest_start) + shift + len(fixed))
        pos += len(fixed) + (len(blob) - int(rest_start))
        first_doc.extend(int(x) for x in p["block_first_doc"])
        last_doc.extend(int(x) for x in p["block_last_doc"])
        max_tf.extend(int(x) for x in p["block_max_tf"])
        min_norm.extend(int(x) for x in p["block_min_norm"])
        prev = int(p["block_last_doc"][-1])
    return {
        "blob": b"".join(blobs),
        "block_first_doc": first_doc,
        "block_last_doc": last_doc,
        "block_max_tf": max_tf,
        "block_min_norm": min_norm,
        "block_offset": offsets,
        "df": int(sum(p["df"] for p in parts)),
        "ttf": int(sum(p["ttf"] for p in parts)),
    }
