"""Mergeable sketch aggregates (the distributed scale path for quantiles).

t-digest (Dunning's merging variant, public algorithm) re-implemented in
numpy as a Ray Data `AggregateFn`: per-block partial digests accumulate
vectorized, partials merge associatively in the reduce, and the final step
interpolates quantiles — the same partial→final combine shape as the
reference's PercentileAgg (`solr/core/src/java/org/apache/solr/search/facet/
PercentileAgg.java`, which shards AVLTreeDigest sketches and merges them on
the coordinator).  Error is bounded near the tails by the k1 (arcsine) scale
function; compression delta=100 keeps ≤ ~2*delta centroids per digest.

Determinism: centroids are sorted by mean before every compress, and block
accumulation folds values in sorted order, so equal multisets of inputs give
identical digests regardless of block arrival order ONLY when the grouping
shuffle delivers whole groups (Ray groupby does); across different block
*partitionings* the digest may differ slightly — that is inherent to
t-digest and why the op is registered rows-only (pytest asserts error
bounds vs the exact quantile instead of value equality).
"""

from __future__ import annotations

import numpy as np

DELTA = 100  # compression: max centroids ~ 2*delta


def _k1(q: np.ndarray) -> np.ndarray:
    """k1 scale function: delta/(2*pi) * asin(2q-1)."""
    return DELTA / (2 * np.pi) * np.arcsin(2 * q - 1)


def compress(means: np.ndarray, weights: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Merge sorted centroids greedily while the k1 size bound allows."""
    if len(means) == 0:
        return means, weights
    order = np.argsort(means, kind="stable")
    means, weights = means[order], weights[order]
    total = weights.sum()
    out_m, out_w = [], []
    cur_m, cur_w = float(means[0]), float(weights[0])
    w_so_far = 0.0
    for m, w in zip(means[1:], weights[1:]):
        q0 = w_so_far / total
        q2 = (w_so_far + cur_w + w) / total
        if _k1(np.array([q2]))[0] - _k1(np.array([q0]))[0] <= 1.0:
            # merge into current centroid (weighted mean)
            cur_m = (cur_m * cur_w + float(m) * float(w)) / (cur_w + float(w))
            cur_w += float(w)
        else:
            out_m.append(cur_m)
            out_w.append(cur_w)
            w_so_far += cur_w
            cur_m, cur_w = float(m), float(w)
    out_m.append(cur_m)
    out_w.append(cur_w)
    return np.asarray(out_m), np.asarray(out_w)


def digest_add(state: tuple, values: np.ndarray) -> tuple:
    """Vectorized block accumulate: pre-cluster the sorted raw values into
    k1-scale quantile chunks (one searchsorted + reduceat — no per-element
    Python), then merge the ~delta/2 chunk centroids into the state via
    compress.  Raw-value-count work is O(n log n) numpy; only centroid
    counts (~2*delta) ever reach the Python merge loop."""
    means, weights = state
    v = np.asarray(values, dtype=np.float64)
    v = np.sort(v[~np.isnan(v)])
    n = len(v)
    if n == 0:
        return state
    ks = np.arange(np.floor(-DELTA / 4), np.ceil(DELTA / 4) + 1)
    qcuts = (np.sin(2 * np.pi * ks / DELTA) + 1) / 2
    chunk = np.searchsorted(qcuts, (np.arange(n) + 0.5) / n)
    starts = np.flatnonzero(
        np.concatenate([[True], chunk[1:] != chunk[:-1]])
    )
    w = np.diff(np.append(starts, n)).astype(np.float64)
    m = np.add.reduceat(v, starts) / w
    return digest_merge(state, (m, w))


def digest_merge(a: tuple, b: tuple) -> tuple:
    return compress(
        np.concatenate([a[0], b[0]]), np.concatenate([a[1], b[1]])
    )


def digest_quantile(state: tuple, q: float) -> float:
    """Interpolated quantile from centroids (midpoint rule)."""
    means, weights = state
    if len(means) == 0:
        return float("nan")
    if len(means) == 1:
        return float(means[0])
    total = weights.sum()
    # centroid midpoints in cumulative-weight space
    cum = np.cumsum(weights) - weights / 2.0
    target = q * total
    if target <= cum[0]:
        return float(means[0])
    if target >= cum[-1]:
        return float(means[-1])
    i = int(np.searchsorted(cum, target) - 1)
    frac = (target - cum[i]) / (cum[i + 1] - cum[i])
    return float(means[i] + frac * (means[i + 1] - means[i]))


def empty_state() -> tuple:
    return (np.zeros(0), np.zeros(0))


def make_tdigest_aggregate(on: str, quantiles: dict[str, float]):
    """Ray Data AggregateFn: per-block vectorized accumulate, associative
    merge of centroid sets, finalize -> interpolated quantiles.  Returns one
    aggregator per output column (Ray aggregates are scalar-valued)."""
    from ray.data.aggregate import AggregateFn

    aggs = []
    for name, q in quantiles.items():
        aggs.append(
            AggregateFn(
                init=lambda k: empty_state(),
                accumulate_block=lambda st, block, _on=on: digest_add(
                    st, block[_on].to_numpy(zero_copy_only=False)
                ),
                merge=digest_merge,
                finalize=lambda st, _q=q: round(digest_quantile(st, _q), 6),
                name=name,
            )
        )
    return aggs


QUERIES: dict = {}
ORACLE: dict = {}


def q_percentile_tdigest_value_per_type(sf_dir: str):
    """Approximate grouped percentiles via the mergeable t-digest
    AggregateFn (partial digest per block -> associative merge -> final
    interpolation).  Rows-only: t-digest is approximate by design; pytest
    asserts p50/p90 land within 2% rank error of the exact quantile."""
    from rindex.ops.util import read_table

    ds = read_table(sf_dir, "events", ["event_type", "value"])
    return ds.groupby("event_type").aggregate(
        *make_tdigest_aggregate("value", {"p50": 0.5, "p90": 0.9})
    )


QUERIES["percentile_tdigest_value_per_type"] = q_percentile_tdigest_value_per_type
# no ORACLE: approximate sketch; bounded-error pytest coverage instead.


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct sketch — theta-sketch family
# ---------------------------------------------------------------------------

KMV_K = 64
_TWO63 = 9223372036854775808.0  # 2^63 as an exact double literal, both sides


def q_kmv_distinct_documents(sf_dir: str):
    """KMV distinct-count sketch (Bar-Yossef et al. 2002; the
    DataSketches theta-sketch family the reference exposes through
    percentile/unique agg plugins): keep the k smallest DISTINCT 63-bit
    hashes of the text; estimate = (k-1) / U(k) with U(k) = kth-min /
    2^63.  Hashing is the repo's md5-based _stable_hash64, which DuckDB
    reproduces exactly (md5_number_upper >> 1), so — unlike t-digest —
    the ENTIRE sketch state and the estimate are deterministic and
    oracle-checkable.  Shape: per-batch distinct-hash k-min partials
    (<= k rows leave each batch), one tiny driver combine — the
    mergeable-sketch partial/final contract at any scale."""
    import pyarrow as pa

    from rindex.ops.dedup import _stable_hash64
    from rindex.ops.util import read_table

    ds = read_table(sf_dir, "documents", ["text"])

    def partial(t: pa.Table) -> pa.Table:
        texts = set(t["text"].to_pylist())
        hs = np.unique(
            np.fromiter(
                ((_stable_hash64((x or "").encode())) for x in texts),
                np.int64,
                len(texts),
            )
        )
        return pa.table({"h": pa.array(np.sort(hs)[:KMV_K])})

    import pandas as pd

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    u = np.unique(parts["h"].to_numpy(np.int64))
    k = min(KMV_K, len(u))
    kth = float(u[k - 1])
    est = (k - 1) * _TWO63 / kth
    return pd.DataFrame(
        {
            "k": [int(k)],
            "kth_hash": [int(u[k - 1])],
            "est_distinct": [round(est, 4)],
        }
    )


QUERIES["kmv_distinct_documents"] = q_kmv_distinct_documents
ORACLE["kmv_distinct_documents"] = f"""
    WITH h AS (
      SELECT DISTINCT
             (md5_number_upper(coalesce(text, '')) >> 1)::BIGINT AS v
      FROM documents
    ),
    km AS (SELECT v FROM h ORDER BY v ASC LIMIT {KMV_K}),
    kth AS (SELECT count(*)::BIGINT AS k, max(v) AS kv FROM km)
    SELECT k, kv AS kth_hash,
           round((k - 1)::DOUBLE * {_TWO63!r} / kv::DOUBLE, 4)
             AS est_distinct
    FROM kth
"""
