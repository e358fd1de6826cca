"""Count-Min sketch heavy-hitter estimates + Bloom-filtered term dictionary.

Two classic mergeable structures the reference ships:

* Count-Min (the ubiquitous heavy-hitter sketch; Cormode & Muthukrishnan
  2005 — public algorithm): per-batch PARTIAL D x W count matrices built
  vectorized from token hashes, summed into one global sketch (matrices
  are linear, so partial+combine is exact), point queries take the
  row-wise min.  The analog of the reference's sharded approx aggregates
  (HLLAgg / PercentileAgg shard-partial-merge shape,
  `solr/core/src/java/org/apache/solr/search/facet/HLLAgg.java`).
* Bloom-filtered term dictionary (`lucene/codecs/src/java/org/apache/
  lucene/codecs/bloom/BloomFilteringPostingsFormat.java`): a per-segment
  bit set over the segment's terms lets a query skip segments that
  cannot contain a term — zero false negatives, tunable false positives.

Both ops are rows-only BY DESIGN (a sketch estimate has no SQL oracle);
tests/test_cms_bloom.py pins the CM overestimate invariant + error bound
and the Bloom zero-false-negative contract instead.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from rindex.ops.util import read_table

QUERIES: dict = {}
ORACLE: dict = {}

CMS_W = 2048          # width (counters per row)
CMS_D = 4             # depth (independent hash rows)
CMS_PROBE = (
    "hash", "join", "spark", "filter", "group", "query",
    "nosuchterm", "dup",
)

_H1_SEED = np.uint64(0x9E3779B97F4A7C15)
_H2_SEED = np.uint64(0xC2B2AE3D27D4EB4F)


def _hash2(tokens: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """Two independent 64-bit hashes per token (double hashing base)."""
    import hashlib

    h1 = np.empty(len(tokens), np.uint64)
    h2 = np.empty(len(tokens), np.uint64)
    for i, t in enumerate(tokens):
        d = hashlib.blake2b(t.encode("utf-8"), digest_size=16).digest()
        h1[i] = np.frombuffer(d[:8], np.uint64)[0]
        h2[i] = np.frombuffer(d[8:], np.uint64)[0]
    return h1, h2


def _cms_rows(h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
    """(D, n) column indexes via double hashing h1 + i*h2 (mod W)."""
    i = np.arange(CMS_D, dtype=np.uint64)[:, None]
    return ((h1[None, :] + i * h2[None, :]) % np.uint64(CMS_W)).astype(
        np.int64
    )


def build_cms(sf_dir: str) -> np.ndarray:
    """Global D x W sketch: per-batch partial matrices (vectorized
    bincount per hash row), combined by summation — linear, so the
    distributed combine is exact regardless of batching."""
    from rindex.analysis import get_analyzer

    ds = read_table(sf_dir, "documents", ["text"])

    def part(t: pa.Table) -> pa.Table:
        az = get_analyzer("standard")
        toks = [tok for x in t["text"].to_pylist()
                for tok in az.tokens(x or "")]
        m = np.zeros((CMS_D, CMS_W), np.int64)
        if toks:
            cols = _cms_rows(*_hash2(toks))
            for d in range(CMS_D):
                m[d] = np.bincount(cols[d], minlength=CMS_W)
        return pa.table({"cms": pa.array([m.ravel().tolist()],
                                         pa.list_(pa.int64()))})

    parts = ds.map_batches(
        part, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    # one flattened D*W row per BATCH (bounded by batch count, never by
    # corpus size) — summed into the single global sketch
    total = np.zeros(CMS_D * CMS_W, np.int64)
    for row in parts["cms"]:
        total += np.asarray(row, np.int64)
    return total.reshape(CMS_D, CMS_W)


def cms_estimate(cms: np.ndarray, terms: list[str]) -> np.ndarray:
    cols = _cms_rows(*_hash2(list(terms)))
    return np.min(
        cms[np.arange(CMS_D)[:, None], cols], axis=0
    ).astype(np.int64)


def q_cms_topterms_documents(sf_dir: str):
    """Count-Min point estimates for the fixed probe terms (rows-only:
    estimates carry sketch error by definition; the pytest pins
    est >= exact and est <= exact + 2N/W)."""
    cms = build_cms(sf_dir)
    est = cms_estimate(cms, list(CMS_PROBE))
    return pd.DataFrame({"term": list(CMS_PROBE), "est": est})


QUERIES["cms_topterms_documents"] = q_cms_topterms_documents


# --- Bloom-filtered term dictionary ----------------------------------------

BLOOM_BITS = 1 << 14   # per-segment bit-set size (m)
BLOOM_K = 7            # hash functions


def _bloom_positions(terms: list[str]) -> np.ndarray:
    h1, h2 = _hash2(terms)
    i = np.arange(BLOOM_K, dtype=np.uint64)[:, None]
    return ((h1[None, :] + i * h2[None, :])
            % np.uint64(BLOOM_BITS)).astype(np.int64)


def build_segment_blooms(index_dir: str) -> list[np.ndarray]:
    """One boolean bit set per segment over its term dictionary — ONE
    dictionary-column read per segment (the BloomFilteringPostingsFormat
    sidecar; at 100x persist it fingerprint-keyed next to the segment
    like the reversed dictionary artifact, rindex/ops/lucene8.py)."""
    import pyarrow.parquet as pq
    import os

    from rindex.search import IndexSearcher

    s = IndexSearcher(index_dir)
    blooms = []
    for r in s.readers:
        tbl = pq.read_table(
            os.path.join(r.sdir, "postings.parquet"), columns=["term"]
        )
        terms = tbl["term"].to_pylist()
        bits = np.zeros(BLOOM_BITS, bool)
        if terms:
            bits[_bloom_positions(terms).ravel()] = True
        blooms.append(bits)
    return blooms


def bloom_maybe_contains(blooms: list[np.ndarray], terms: list[str]):
    """(n_terms, n_segments) bool: False = segment provably lacks term."""
    pos = _bloom_positions(list(terms))  # (K, n)
    out = np.empty((len(terms), len(blooms)), bool)
    for j, bits in enumerate(blooms):
        out[:, j] = bits[pos].all(axis=0)
    return out


def q_bloom_segment_skip_documents(sf_dir: str):
    """Per probe term: segments the Bloom sidecar admits vs segments that
    actually contain the term (rows-only: maybe_segments depends on the
    hash layout; pytest pins maybe >= actual — zero false negatives —
    and that the absent term skips every segment)."""
    from rindex.ops.fulltext import documents_index
    from rindex.search import IndexSearcher

    idx = documents_index(sf_dir)
    blooms = build_segment_blooms(idx)
    maybe = bloom_maybe_contains(blooms, list(CMS_PROBE))
    s = IndexSearcher(idx)
    actual = np.zeros(len(CMS_PROBE), np.int64)
    for r in s.readers:
        posts = r.postings_for(list(CMS_PROBE))
        for i, t in enumerate(CMS_PROBE):
            if posts.get(t) is not None:
                actual[i] += 1
    return pd.DataFrame(
        {
            "term": list(CMS_PROBE),
            "maybe_segments": maybe.sum(axis=1).astype(np.int64),
            "actual_segments": actual,
        }
    )


QUERIES["bloom_segment_skip_documents"] = q_bloom_segment_skip_documents
