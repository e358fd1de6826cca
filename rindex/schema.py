"""Schemas and constants for the rindex engine.

Transcript input shape is authoritative from BASELINE.json `input_hint`:
(conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
ts:timestamp[us]).  Reference data-model analysis: SURVEY.md §1; the segment
file layout mirrors Lucene's codec split (postings / terms / stored fields /
norms — cf. lucene/core codecs lucene84 + compressing stored fields) but is
re-expressed as Parquet tables per immutable segment directory.
"""

from __future__ import annotations

import os

import pyarrow as pa

# --- BM25 constants (reference: BM25Similarity, k1=1.2, b=0.75) -------------
K1: float = 1.2
B: float = 0.75

# --- posting block layout (reference: Lucene84PostingsFormat BLOCK_SIZE=128)
BLOCK_SIZE: int = 128

# Doc-range width used to salt hot terms in the groupby(term) shuffle:
# salt = doc_id // SALT_RANGE.  Range-based (not hash-based) salting keeps the
# salted partial postings of one term in ascending, disjoint docID ranges, so
# the second-phase merge is a cheap ordered concatenation (SURVEY.md §7.1.5).
SALT_RANGE: int = 1 << 14

# Default number of segments an index build partitions into.  Fixed (not
# derived from cluster size) so segment contents are deterministic across
# parallelism levels — the N=1 ≡ N=8 golden-equivalence tests rely on it.
DEFAULT_NUM_SEGMENTS: int = 16

# Tokens longer than this are split (StandardTokenizer maxTokenLength).
MAX_TOKEN_LEN: int = 255

TRANSCRIPT_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

# Per-segment stored-fields / docmap table (docs.parquet).  `doc` is the
# segment-local ordinal assigned by stable sort on the id columns; global
# identity is (conv_id, turn_idx).  Keeping the original columns here is the
# stored-fields half of the reference's data model (fetch-by-docID after
# top-k) and powers the per-row invariant "per-turn text equality under
# stable turn ordering".
DOCS_SCHEMA = pa.schema(
    [
        ("doc", pa.int32()),
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
        ("dl", pa.int32()),  # exact field length (tokens); norm byte derives
    ]
)

# Partial-posting rows flowing through the build shuffle.  docs/tfs/norms are
# packed little-endian arrays (int32/int32/uint8) for compact shuffling; the
# segment writer merges and block-encodes them.
PARTIAL_SCHEMA = pa.schema(
    [
        ("seg", pa.int32()),
        ("term", pa.string()),
        ("salt", pa.int32()),
        ("first_doc", pa.int32()),
        ("df", pa.int64()),
        ("ttf", pa.int64()),
        ("docs", pa.binary()),
        ("tfs", pa.binary()),
        ("norms", pa.binary()),
    ]
)

# Per-segment postings table (postings.parquet), sorted by term so Parquet
# row-group statistics act as the coarse term-dictionary index (the FST/.tip
# analog — SURVEY.md §1.4).  Block metadata columns are the skip list +
# impacts: per block (first_doc, last_doc) bound the docID range and
# (max_tf, min_norm) upper-bound the BM25 score for block-max WAND.
POSTINGS_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("df", pa.int64()),
        ("ttf", pa.int64()),
        ("block_first_doc", pa.list_(pa.int32())),
        ("block_last_doc", pa.list_(pa.int32())),
        ("block_max_tf", pa.list_(pa.int32())),
        ("block_min_norm", pa.list_(pa.uint8())),
        ("block_offset", pa.list_(pa.int64())),
        ("blob", pa.binary()),
    ]
)

QUERY_SCHEMA = pa.schema(
    [
        ("query_id", pa.string()),
        ("qtype", pa.string()),
        ("text", pa.string()),
        ("k", pa.int32()),
    ]
)

TOPK_SCHEMA = pa.schema(
    [
        ("query_id", pa.string()),
        ("rank", pa.int32()),
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("score", pa.float64()),
    ]
)

# --- cluster-proportional sizing -------------------------------------------
# The reference sizes its parallelism from the hardware it lands on —
# HashQParserPlugin partitions its hash join by worker count
# (solr/core/src/java/org/apache/solr/search/HashQParserPlugin.java) and
# IndexSearcher#slices / ConcurrentMergeScheduler derive executor width from
# core count.  These helpers are the single place the repo does the same:
# every Dataset.join picks its reduce-partition count and every stateful
# actor pool picks its autoscale cap from the LIVE cluster's CPU total, so
# the identical pipeline that runs on a 4-cpu pytest session also spreads
# across a 1024-core cluster without editing code.  Env overrides exist for
# benchmarking and for pinning behavior in tests.


def _cluster_cpus() -> int:
    """Total CPUs in the connected Ray cluster (or this host pre-init)."""
    try:
        import ray

        if ray.is_initialized():
            cpus = int(ray.cluster_resources().get("CPU", 0))
            if cpus > 0:
                return cpus
    except Exception:
        pass
    return os.cpu_count() or 4


def join_partitions() -> int:
    """Reduce-partition count for Dataset.join sites (RINDEX_JOIN_PARTITIONS
    overrides).  cpus/2, floored at 8: scales with the cluster (the r4
    hard-coded 8 meant ~12 TB per reduce partition at 10^12 rows) while
    never oversubscribing — Ray 2.49's hash-shuffle join spins up one
    aggregator worker per partition, and a measured sweep on this box
    (32 cpus, sf0.1) showed wall 5.1/5.5/9.6/14.4 s at 8/16/32/64
    partitions: past ~cpus/2 the worker spin-up dominates the join.  For
    a known-huge join, set the env to input_bytes / ~1 GiB instead —
    partition count is ultimately a DATA-size knob; cores are only the
    floor the cluster gives us for free."""
    env = os.environ.get("RINDEX_JOIN_PARTITIONS")
    if env:
        return max(1, int(env))
    return max(8, _cluster_cpus() // 2)


def pool_cap(frac: float = 0.5, floor: int = 1, min_cap: int = 2) -> tuple:
    """Autoscale (min, max) for a stateful map_batches actor pool.

    `frac` is the share of cluster CPUs the stage may claim at full
    autoscale (it only gets there when it is the bottleneck); `floor`
    actors always start so small inputs don't pay autoscale latency.
    RINDEX_POOL_MAX caps the max for tests/benchmarks."""
    env = os.environ.get("RINDEX_POOL_MAX")
    hi = max(min_cap, int(_cluster_cpus() * frac))
    if env:
        hi = min(hi, max(floor, int(env)))
    return (floor, max(floor, hi))


# Positions jump by this between values of a multi-valued text field, so
# phrases/proximity can't match across value boundaries (Lucene FieldType
# positionIncrementGap; Solr TextField default).
POSITION_INCREMENT_GAP: int = 100
