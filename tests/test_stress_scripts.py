"""The 8x stress scripts stay importable and their audit logic stays
correct at pytest scale — scripts/merge_scale_stress.py's structural
CheckIndex audit must pass on a freshly built index and FAIL loudly on a
corrupted one (an audit that can't fail audits nothing)."""

import os

import pyarrow.parquet as pq
import pytest


def test_structural_audit_green_and_detects_corruption(
    ray_session, tmp_path
):
    from rindex.build import build_index
    from rindex.fixtures import make_transcripts
    from scripts.merge_scale_stress import structural_audit

    src = tmp_path / "corpus.parquet"
    pq.write_table(make_transcripts(40, 5, seed=7), str(src))
    idx = str(tmp_path / "idx")
    build_index([str(src)], idx, num_segments=2, input_files=[str(src)])

    out = structural_audit(idx)
    assert out["segments"] == 2 and out["docs"] > 0

    # corrupt one segment's doc_count in the manifest -> audit must raise
    import json

    man_path = os.path.join(idx, "manifest.json")
    man = json.load(open(man_path))
    man["segments"][0]["doc_count"] += 1
    json.dump(man, open(man_path, "w"))
    with pytest.raises(AssertionError):
        structural_audit(idx)


def test_relational_stress_tiler(tmp_path, monkeypatch):
    """_tile shifts key columns disjointly per tile and caches by count."""
    import numpy as np
    import pyarrow as pa

    import scripts.relational_scale_stress as rs

    src = tmp_path / "events.parquet"
    pq.write_table(
        pa.table({"event_id": pa.array([0, 1, 2], pa.int64()),
                  "user_id": pa.array([5, 5, 9], pa.int64()),
                  "v": pa.array([1.0, 2.0, 3.0])}),
        str(src),
    )
    monkeypatch.setattr(rs, "OUT", str(tmp_path / "out"))
    rs._tile(str(src), "events", 4, {"event_id": 1, "user_id": 1})
    got = pq.read_table(str(tmp_path / "out" / "events.parquet"))
    assert got.num_rows == 12
    eid = np.sort(got["event_id"].to_numpy())
    assert len(np.unique(eid)) == 12  # disjoint shifts, no collisions
    uid = got["user_id"].to_numpy()
    assert len(np.unique(uid)) == 8  # 2 distinct users x 4 tiles
