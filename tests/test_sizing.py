"""Cluster-proportional sizing contracts (r5).

The reference derives its parallelism from the hardware it runs on —
HashQParserPlugin partitions its hash join by worker count and
IndexSearcher#slices sizes executor width from cores.  This repo's analogs
are rindex.schema.join_partitions() / pool_cap(); these tests keep literal
partition counts and actor caps from creeping back into the operator
modules, and pin the streamlang fetch() broadcast→hash-join auto-switch to
exact-equal results through both paths.
"""

import os
import re
from pathlib import Path

import pandas as pd
import pytest

OPS_DIR = Path(__file__).resolve().parents[1] / "rindex"


def _source_files():
    return sorted(OPS_DIR.rglob("*.py"))


def test_no_literal_join_partitions():
    """Every Dataset.join must size its shuffle from the cluster."""
    bad = []
    pat = re.compile(r"num_partitions\s*=\s*\d")
    for f in _source_files():
        for i, line in enumerate(f.read_text().splitlines(), 1):
            if pat.search(line):
                bad.append(f"{f.name}:{i}: {line.strip()}")
    assert not bad, f"hard-coded join partition counts: {bad}"


def test_no_literal_actor_pool_caps():
    """Stateful map_batches pools must autoscale from the cluster."""
    bad = []
    pat = re.compile(r"concurrency\s*=\s*\(\s*\d+\s*,\s*\d")
    for f in _source_files():
        for i, line in enumerate(f.read_text().splitlines(), 1):
            if pat.search(line):
                bad.append(f"{f.name}:{i}: {line.strip()}")
    assert not bad, f"hard-coded actor-pool caps: {bad}"


def test_join_partitions_scales_and_overrides(monkeypatch):
    from rindex import schema

    monkeypatch.delenv("RINDEX_JOIN_PARTITIONS", raising=False)
    monkeypatch.setattr(schema, "_cluster_cpus", lambda: 256)
    assert schema.join_partitions() == 128  # cpus/2: measured knee —
    # more aggregators than cores/2 pays worker spin-up, fewer stops
    # scaling with the cluster
    monkeypatch.setattr(schema, "_cluster_cpus", lambda: 2)
    assert schema.join_partitions() == 8  # floor for small sessions
    monkeypatch.setenv("RINDEX_JOIN_PARTITIONS", "3")
    assert schema.join_partitions() == 3


def test_pool_cap_scales_and_overrides(monkeypatch):
    from rindex import schema

    monkeypatch.delenv("RINDEX_POOL_MAX", raising=False)
    monkeypatch.setattr(schema, "_cluster_cpus", lambda: 512)
    assert schema.pool_cap() == (1, 256)
    assert schema.pool_cap(frac=0.25, floor=2) == (2, 128)
    monkeypatch.setattr(schema, "_cluster_cpus", lambda: 2)
    assert schema.pool_cap(min_cap=8) == (1, 8)  # small-host floor kept
    monkeypatch.setenv("RINDEX_POOL_MAX", "4")
    monkeypatch.setattr(schema, "_cluster_cpus", lambda: 512)
    assert schema.pool_cap() == (1, 4)


def test_pool_cap_uses_live_cluster(ray_session):
    """With Ray up, sizing reads cluster_resources, not the host."""
    import ray

    from rindex.schema import _cluster_cpus

    assert _cluster_cpus() == int(ray.cluster_resources()["CPU"])


def test_fetch_broadcast_and_hash_paths_identical(ray_session, monkeypatch):
    """fetch() must produce identical rows whether the right stream
    broadcasts (small) or takes the distributed left-outer hash join
    (above STREAM_BCAST_MAX_ROWS) — the auto-switch is invisible."""
    import ray.data as rd

    from rindex.ops import streamlang as sl

    tables = {
        "l": pd.DataFrame({"k": [1, 2, 3, 4, 5], "v": [10, 20, 30, 40, 50]}),
        "r": pd.DataFrame({"rk": [2, 4, 9], "extra": ["b", "d", "z"]}),
    }
    orig = sl.STREAM_BUILDERS["table"]
    sl.STREAM_BUILDERS["table"] = (
        lambda a, k, ctx: rd.from_pandas(tables[a[0][1]])
    )
    try:
        expr = sl.parse_stream_expr('fetch(table(l), table(r), on="k=rk")')

        def run():
            df = sl._build(expr, {"sf_dir": ""}).to_pandas()
            return df.sort_values("k").reset_index(drop=True)

        monkeypatch.setattr(sl, "STREAM_BCAST_MAX_ROWS", 10_000)
        via_broadcast = run()
        monkeypatch.setattr(sl, "STREAM_BCAST_MAX_ROWS", 0)
        via_hash = run()
    finally:
        sl.STREAM_BUILDERS["table"] = orig

    assert list(via_broadcast.columns) == list(via_hash.columns)
    pd.testing.assert_frame_equal(
        via_broadcast, via_hash, check_dtype=False
    )
    assert via_broadcast["k"].tolist() == [1, 2, 3, 4, 5]
    assert pd.isna(via_broadcast["extra"][0])
