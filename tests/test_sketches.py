"""t-digest mergeable quantile sketch: algebraic properties + bounded rank
error of the Ray AggregateFn against exact quantiles."""

import numpy as np

from rindex.ops.sketches import (
    compress, digest_add, digest_merge, digest_quantile, empty_state,
)


def test_digest_rank_error_single():
    rng = np.random.default_rng(3)
    data = rng.lognormal(0, 1, 20000)
    st = digest_add(empty_state(), data)
    g = np.sort(data)
    for q in [0.01, 0.1, 0.5, 0.9, 0.99]:
        approx = digest_quantile(st, q)
        rank = np.searchsorted(g, approx) / len(g)
        assert abs(rank - q) < 0.01, (q, rank)


def test_digest_merge_equals_combined_bounds():
    rng = np.random.default_rng(4)
    a, b = rng.normal(0, 1, 8000), rng.normal(5, 2, 8000)
    merged = digest_merge(
        digest_add(empty_state(), a), digest_add(empty_state(), b)
    )
    g = np.sort(np.concatenate([a, b]))
    for q in [0.1, 0.5, 0.9]:
        approx = digest_quantile(merged, q)
        rank = np.searchsorted(g, approx) / len(g)
        assert abs(rank - q) < 0.015, (q, rank)
    # centroid count bounded by the compression budget
    assert len(merged[0]) <= 2 * 100 + 2


def test_digest_weight_conservation():
    rng = np.random.default_rng(5)
    data = rng.uniform(0, 1, 5000)
    st = digest_add(empty_state(), data)
    assert st[1].sum() == 5000
    m, w = compress(st[0], st[1])
    assert w.sum() == 5000


def test_tdigest_aggregate_on_events(ray_session):
    import duckdb

    from rindex.ops.sketches import q_percentile_tdigest_value_per_type

    res = q_percentile_tdigest_value_per_type(
        "/root/testdata/sf0.001"
    ).to_pandas()
    vals = duckdb.sql(
        "SELECT event_type, value FROM "
        "read_parquet('/root/testdata/sf0.001/events.parquet')"
    ).fetchdf()
    for _, r in res.iterrows():
        g = np.sort(vals[vals.event_type == r.event_type]["value"].to_numpy())
        for col, q in [("p50", 0.5), ("p90", 0.9)]:
            rank = np.searchsorted(g, r[col]) / len(g)
            assert abs(rank - q) < 0.03, (r.event_type, col, rank)


def test_kmv_estimate_error_bound(ray_session):
    """KMV with k=64 has relative std ~ 1/sqrt(k-2) ~ 12.7%; the estimate
    on the sf0.001 corpus must land within 4 sigma of the true distinct
    text count."""
    import duckdb

    from rindex.ops.sketches import q_kmv_distinct_documents

    out = q_kmv_distinct_documents("/root/testdata/sf0.001")
    est = float(out["est_distinct"].iloc[0])
    truth = duckdb.sql(
        "SELECT count(DISTINCT coalesce(text,'')) FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    ).fetchone()[0]
    assert abs(est - truth) / truth < 4.0 / np.sqrt(64 - 2)
