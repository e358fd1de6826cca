"""Segment directory IO, manifest with lineage/metrics, atomic publish.

Mirrors the reference's commit model (SURVEY.md §1.1): a segment is an
immutable directory of files; the index's durable "table version" is a
top-level manifest listing the live segment set, published with a 2-phase
write (tmp + fsync + atomic rename) — the `SegmentInfos#prepareCommit/
finishCommit` analog (`lucene/core/src/java/org/apache/lucene/index/
SegmentInfos.java`).  Per-segment `_SUCCESS` markers + lineage (input
fingerprint, config hash) are the checkpoint/resume unit: a rerun skips
segments whose marker matches the current config (tlog-replay analog —
inputs are immutable Parquet, so replay == re-read, SURVEY.md §2.9).

Segment layout:
    {index}/segments/seg-{id:05d}/
        docs.parquet       stored fields + docmap (doc -> conv_id, turn_idx, ...)
        postings.parquet   term-sorted postings (POSTINGS_SCHEMA)
        meta.json          stats, metrics, lineage
        _SUCCESS           commit marker (written last)
    {index}/manifest.json  live segment set + config + totals (atomic)
"""

from __future__ import annotations

import hashlib
import json
import os


def seg_dir(index_dir: str, seg_id: int, gen: int = 0) -> str:
    name = f"seg-{seg_id:05d}" if gen == 0 else f"seg-{seg_id:05d}-g{gen}"
    return os.path.join(index_dir, "segments", name)


def config_hash(config: dict) -> str:
    return hashlib.md5(
        json.dumps(config, sort_keys=True, default=str).encode()
    ).hexdigest()[:16]


def input_fingerprint(input_files: list[str] | None) -> str:
    if not input_files:
        return "adhoc"
    items = []
    for f in sorted(input_files):
        try:
            st = os.stat(f)
            # mtime included: a same-size in-place regeneration must
            # invalidate checkpoints, not serve stale segments on resume
            items.append((os.path.basename(f), st.st_size, st.st_mtime_ns))
        except OSError:
            items.append((os.path.basename(f), -1, -1))
    return hashlib.md5(json.dumps(items).encode()).hexdigest()[:16]


def atomic_write_json(path: str, obj: dict) -> None:
    # pid-unique tmp: two concurrent writers of the same JSON must not
    # interleave into one tmp file and publish truncated content
    tmp = f"{path}.tmp-{os.getpid()}"
    with open(tmp, "w") as fh:
        json.dump(obj, fh, indent=1, default=str)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, path)


def atomic_rename_file(tmp_path: str, final_path: str) -> None:
    os.replace(tmp_path, final_path)


def write_success(sdir: str, lineage: dict) -> None:
    atomic_write_json(os.path.join(sdir, "_SUCCESS"), lineage)


def segment_done(sdir: str, cfg_hash: str, fingerprint: str) -> bool:
    """True iff the segment committed under the SAME config + input — a
    config change invalidates stale checkpoints (SURVEY.md §7.3.6)."""
    marker = os.path.join(sdir, "_SUCCESS")
    if not os.path.exists(marker):
        return False
    try:
        with open(marker) as fh:
            lin = json.load(fh)
        return (
            lin.get("config_hash") == cfg_hash
            and lin.get("input_fingerprint") == fingerprint
        )
    except (json.JSONDecodeError, OSError):
        return False


def read_meta(sdir: str) -> dict:
    with open(os.path.join(sdir, "meta.json")) as fh:
        return json.load(fh)


def write_manifest(index_dir: str, segments: list[dict], config: dict) -> dict:
    manifest = {
        "format_version": 1,
        "config": config,
        "config_hash": config_hash(config),
        "segments": sorted(
            segments, key=lambda m: (m["seg_id"], m.get("gen", 0))
        ),
        "totals": {
            "doc_count": int(sum(m["doc_count"] for m in segments)),
            "sum_dl": int(sum(m["sum_dl"] for m in segments)),
            "n_terms_sum": int(sum(m["n_terms"] for m in segments)),
            "postings_bytes": int(sum(m["postings_bytes"] for m in segments)),
            "n_segments": len(segments),
        },
    }
    atomic_write_json(os.path.join(index_dir, "manifest.json"), manifest)
    return manifest


def read_manifest(index_dir: str) -> dict:
    with open(os.path.join(index_dir, "manifest.json")) as fh:
        return json.load(fh)


def backup_index(index_dir: str, dest: str) -> dict:
    """Snapshot the index's COMMITTED state: copy only the files the
    manifest references (segment dirs of listed (seg_id, gen) + their
    live-docs sidecars), manifest written LAST so a torn backup is never
    restorable — the CoreAdmin BACKUP contract (`solr/core/src/java/org/
    apache/solr/handler/admin/CoreAdminHandler.java` backup via
    `lucene/replicator`-style file-list snapshots: uncommitted segments
    and superseded generations are not part of the commit point and are
    not copied)."""
    import shutil

    man = read_manifest(index_dir)
    os.makedirs(dest, exist_ok=True)
    for m in man["segments"]:
        src = seg_dir(index_dir, int(m["seg_id"]), int(m.get("gen", 0)))
        dst = seg_dir(dest, int(m["seg_id"]), int(m.get("gen", 0)))
        if os.path.exists(dst):
            shutil.rmtree(dst)
        shutil.copytree(src, dst)
    atomic_write_json(os.path.join(dest, "manifest.json"), man)
    return man


def restore_index(backup_dir: str, dest: str) -> dict:
    """Restore a backup into a fresh index dir (RESTORE: the backup IS a
    complete commit point, so restore is a verbatim copy with the
    manifest last)."""
    return backup_index(backup_dir, dest)
