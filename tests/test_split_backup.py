"""Shard split (SPLITSHARD / PKIndexSplitter semantics) and
backup/restore (CoreAdmin BACKUP) — children must be disjoint, complete,
CheckIndex-clean, and stat-consistent with the parent."""

import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from rindex.build import build_index
from rindex.merge import split_index
from rindex.segments import backup_index, read_manifest, restore_index, seg_dir
from tests.test_checkindex import audit_index


@pytest.fixture(scope="module")
def parent_index(ray_session, tiny_corpus, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("split") / "idx")
    build_index(tiny_corpus, idx, num_segments=4, salt_range=64)
    return idx


def _all_ids(index_dir):
    man = read_manifest(index_dir)
    ids = []
    for m in man["segments"]:
        t = pq.read_table(
            os.path.join(
                seg_dir(index_dir, m["seg_id"], m.get("gen", 0)),
                "docs.parquet",
            )
        )
        ids.extend(
            zip(t["conv_id"].to_pylist(), t["turn_idx"].to_pylist())
        )
    return ids


def test_split_disjoint_complete_and_checkindex_clean(
    parent_index, tmp_path_factory
):
    out = tmp_path_factory.mktemp("children")
    a, b = str(out / "a"), str(out / "b")
    man_a, man_b = split_index(parent_index, [a, b])
    parent = read_manifest(parent_index)
    # every doc lands in exactly one child
    assert (
        man_a["totals"]["doc_count"] + man_b["totals"]["doc_count"]
        == parent["totals"]["doc_count"]
    )
    ids_a, ids_b = _all_ids(a), _all_ids(b)
    assert not (set(ids_a) & set(ids_b))
    assert set(ids_a) | set(ids_b) == set(_all_ids(parent_index))
    assert len(ids_a) and len(ids_b)  # the hash actually splits
    # token mass is conserved exactly
    assert (
        man_a["totals"]["sum_dl"] + man_b["totals"]["sum_dl"]
        == parent["totals"]["sum_dl"]
    )
    # children are full valid indexes
    audit_index(a)
    audit_index(b)
    # per-term df conservation across children
    from rindex.search import IndexSearcher

    sp = IndexSearcher(parent_index)
    sa, sb = IndexSearcher(a), IndexSearcher(b)
    terms = ["the", "scan", "dup", "join"]
    dfp, dfa, dfb = (
        s.global_df(terms) for s in (sp, sa, sb)
    )
    for t in terms:
        assert dfa[t] + dfb[t] == dfp[t]


def test_split_deterministic(parent_index, tmp_path_factory):
    out = tmp_path_factory.mktemp("children2")
    m1 = split_index(parent_index, [str(out / "x"), str(out / "y")])
    m2 = split_index(parent_index, [str(out / "x2"), str(out / "y2")])
    assert [m["totals"] for m in m1] == [m["totals"] for m in m2]


def test_backup_restore_roundtrip(parent_index, tmp_path_factory):
    import shutil

    d = tmp_path_factory.mktemp("bkp")
    bak, rest = str(d / "bak"), str(d / "rest")
    before = read_manifest(parent_index)
    backup_index(parent_index, bak)
    restore_index(bak, rest)
    after = read_manifest(rest)
    assert after["totals"] == before["totals"]
    assert _all_ids(rest) == _all_ids(parent_index)
    audit_index(rest)
    # a torn backup (manifest missing) is not restorable
    broken = str(d / "broken")
    shutil.copytree(bak, broken)
    os.remove(os.path.join(broken, "manifest.json"))
    with pytest.raises(FileNotFoundError):
        restore_index(broken, str(d / "rest2"))
