"""Generational append + tiered merge tests: policy unit tests, merged ==
from-scratch golden equality, supersession (`_version_` analog), CheckIndex
invariants post-merge (reference strategy: BaseMergePolicyTestCase +
TestAddIndexes-style golden equivalence — SURVEY.md §5)."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from rindex.build import append_index, build_index
from rindex.fixtures import make_transcripts
from rindex.merge import TieredMergePolicy, run_merges
from rindex.search import IndexSearcher
from rindex.segments import read_manifest, seg_dir

from tests.test_checkindex import audit_index


# ---------------- policy unit tests (no Ray) ----------------


def _meta(seg_id, gen, nbytes):
    return {"seg_id": seg_id, "gen": gen, "postings_bytes": nbytes}


def test_policy_no_merge_when_under_budget():
    pol = TieredMergePolicy(floor_segment_bytes=1024)
    metas = [_meta(0, g, 10_000) for g in range(3)]
    assert pol.find_merges_for_slot(metas) == []


def test_policy_merges_when_tier_overflows():
    pol = TieredMergePolicy(segs_per_tier=4.0, floor_segment_bytes=1024)
    metas = [_meta(0, g, 2048) for g in range(12)]
    merges = pol.find_merges_for_slot(metas)
    assert merges, "12 same-size segments with segsPerTier=4 must merge"
    assert all(2 <= len(g) <= pol.max_merge_at_once for g in merges)


def test_policy_respects_max_merged_size():
    pol = TieredMergePolicy(
        segs_per_tier=2.0, max_merged_segment_bytes=10_000,
        floor_segment_bytes=128,
    )
    metas = [_meta(0, g, 3_000) for g in range(10)]
    for group in pol.find_merges_for_slot(metas):
        assert sum(m["postings_bytes"] for m in group) <= 10_000


def test_policy_skips_oversized_segments():
    pol = TieredMergePolicy(
        segs_per_tier=2.0, max_merged_segment_bytes=10_000,
        floor_segment_bytes=128,
    )
    big = _meta(0, 0, 9_000)  # >= half max -> never a merge member
    metas = [big] + [_meta(0, g + 1, 1_000) for g in range(8)]
    for group in pol.find_merges_for_slot(metas):
        assert big not in group


def test_policy_prefers_uniform_merges():
    pol = TieredMergePolicy(segs_per_tier=1.0, floor_segment_bytes=1)
    metas = [_meta(0, g, s) for g, s in enumerate([1000] * 5 + [10])]
    merges = pol.find_merges_for_slot(metas)
    assert merges
    # best-scored merge is of the uniform large segments, not skewed
    sizes = sorted(m["postings_bytes"] for m in merges[0])
    assert sizes[0] == sizes[-1] == 1000 or len(set(sizes)) <= 2


# ---------------- end-to-end generational tests ----------------


@pytest.fixture(scope="module")
def gen_corpora(tmp_path_factory):
    d = tmp_path_factory.mktemp("gen")
    t0 = make_transcripts(60, 6, seed=100)
    t1 = make_transcripts(40, 6, seed=200)
    # rename t1 convs so they extend, not collide (append-only batch)
    c1 = pa.table({**{c: t1[c] for c in t1.column_names}}).drop_columns(["conv_id"])
    conv1 = pa.array(
        ["x" + v.as_py() for v in t1["conv_id"]], pa.string()
    )
    t1 = c1.add_column(0, "conv_id", conv1)
    p0, p1 = str(d / "gen0.parquet"), str(d / "gen1.parquet")
    pq.write_table(t0, p0)
    pq.write_table(t1, p1)
    # union corpus for the golden from-scratch rebuild
    pu = str(d / "union.parquet")
    pq.write_table(pa.concat_tables([t0, t1.select(t0.column_names)]), pu)
    return p0, p1, pu


def test_append_then_merge_equals_rebuild(ray_session, gen_corpora, tmp_path):
    p0, p1, pu = gen_corpora
    idx = str(tmp_path / "gen_idx")
    m0 = build_index([p0], idx, num_segments=4, salt_range=64)
    m1 = append_index([p1], idx)
    assert m1["totals"]["n_segments"] == 8  # 4 slots x 2 gens
    n0 = m0["totals"]["doc_count"]
    assert m1["totals"]["doc_count"] > n0

    # search across generations sees both batches
    s = IndexSearcher(idx)
    hits = s.search("w0000", k=1000)
    convs = {h[1] for h in hits}  # hit = (rank, conv_id, turn_idx, score)
    assert any(c.startswith("x") for c in convs)
    assert any(not c.startswith("x") for c in convs)

    # force merges: everything in one pass
    m2 = run_merges(idx, force=True)  # forceMerge/optimize path
    assert m2["totals"]["n_segments"] == 4  # back to one per slot
    assert m2["totals"]["doc_count"] == m1["totals"]["doc_count"]
    assert m2["totals"]["sum_dl"] == m1["totals"]["sum_dl"]
    audit_index(idx)

    # golden: merged postings byte-equal a from-scratch build of the union
    idx2 = str(tmp_path / "rebuild_idx")
    build_index([pu], idx2, num_segments=4, salt_range=64)
    man_m, man_r = read_manifest(idx), read_manifest(idx2)
    for mm, mr in zip(man_m["segments"], man_r["segments"]):
        assert mm["seg_id"] == mr["seg_id"]
        pm = pq.read_table(
            os.path.join(seg_dir(idx, mm["seg_id"], mm["gen"]), "postings.parquet")
        )
        pr = pq.read_table(
            os.path.join(seg_dir(idx2, mr["seg_id"], 0), "postings.parquet")
        )
        assert pm.equals(pr), f"slot {mm['seg_id']} merged != rebuilt"

    # rank+score identical query results
    r_m = IndexSearcher(idx).search("w0001 w0100", k=20, mode="or")
    r_r = IndexSearcher(idx2).search("w0001 w0100", k=20, mode="or")
    assert r_m == r_r


def test_merge_supersedes_duplicate_ids(ray_session, gen_corpora, tmp_path):
    p0, _p1, _pu = gen_corpora
    idx = str(tmp_path / "dup_idx")
    build_index([p0], idx, num_segments=4, salt_range=64)
    # re-ingest 10 turns of gen0 with REPLACED text (the update case)
    t = pq.read_table(p0).slice(0, 10)
    new_text = pa.array(["updatedtoken only"] * 10, pa.string())
    t = t.set_column(t.column_names.index("text"), "text", new_text)
    upd = str(tmp_path / "upd.parquet")
    pq.write_table(t, upd)
    m1 = append_index([upd], idx)
    before = m1["totals"]["doc_count"]

    m2 = run_merges(idx, force=True)
    # duplicates dropped: 10 superseded rows disappear
    assert m2["totals"]["doc_count"] == before - 10
    audit_index(idx)

    # newest version wins: the updated text is searchable, and the updated
    # (conv_id, turn_idx) rows no longer match their old unique tokens
    s = IndexSearcher(idx)
    hits = s.search("updatedtoken", k=100)
    assert len(hits) == 10
    ids = {(h[1], h[2]) for h in hits}
    want = set(
        zip(t["conv_id"].to_pylist(), t["turn_idx"].to_pylist())
    )
    assert ids == want


def test_run_merges_noop_under_budget(ray_session, gen_corpora, tmp_path):
    p0, _p1, _pu = gen_corpora
    idx = str(tmp_path / "noop_idx")
    build_index([p0], idx, num_segments=4, salt_range=64)
    man1 = read_manifest(idx)
    man2 = run_merges(idx)  # defaults: nothing to do for 1 gen
    assert man1["segments"] == man2["segments"]


def test_merge_gen_order_cannot_resurrect_stale_docs(ray_session, tmp_path):
    """Adversarial merge ordering: a merge of OLD generations allocated a
    HIGHER directory gen than a merge containing a newer update must not
    resurrect the stale document — supersession orders by member VERSION,
    not by output directory gen."""
    import pyarrow as pa
    import ray.data as rd

    from rindex.build import append_index, build_index
    from rindex.merge import merge_segments, run_merges
    from rindex.search import IndexSearcher
    from rindex import segments as segio

    def turns(text):
        return rd.from_arrow(pa.table({
            "conv_id": pa.array(["c0"]), "turn_idx": pa.array([0], pa.int32()),
            "role": pa.array(["user"]), "text": pa.array([text]),
            "tool": pa.array([""]), "ts": pa.array([0], pa.timestamp("us")),
        }))

    idx = str(tmp_path / "resurrect")
    build_index(turns("stalecontent alpha"), idx, num_segments=1)       # gen0
    append_index(turns("filler one"), idx)                              # gen1
    append_index(turns("filler two"), idx)                              # gen2
    append_index(turns("updatedcontent beta"), idx)                     # gen3 (update of c0/0)
    man = segio.read_manifest(idx)
    by_gen = {int(m.get("gen", 0)): m for m in man["segments"]}
    cfg = man["config"]
    # adversarial: old gens get the HIGHER output gen
    m_new = merge_segments(idx, [by_gen[2], by_gen[3]], new_gen=4, cfg=cfg)
    m_old = merge_segments(idx, [by_gen[0], by_gen[1]], new_gen=5, cfg=cfg)
    assert m_new["version"] == 3 and m_old["version"] == 1
    segio.write_manifest(idx, [m_new, m_old], cfg)
    run_merges(idx, force=True)
    s = IndexSearcher(idx)
    assert s.n_docs == 1  # every generation re-ingested the same (c0, 0)
    assert s.search("updatedcontent", k=5), "newest version must survive"
    assert not s.search("stalecontent", k=5), "stale gen-0 text resurrected"
