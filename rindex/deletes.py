"""Delete-by-query / delete-by-term with per-segment live-docs sidecars.

Mirrors the reference's soft-delete model (SURVEY.md §1 "Live docs";
reference: `lucene/core/src/java/org/apache/lucene/index/
{PendingDeletes,BufferedUpdatesStream}.java`, the `.liv` generation files of
`codecs/lucene50/Lucene50LiveDocsFormat.java`, and Solr's deleteByQuery in
`solr/core/src/java/org/apache/solr/update/DirectUpdateHandler2.java`):

- Segments stay IMMUTABLE.  A delete writes a new sidecar
  `seg-XXXXX[-gN]/_liv-g{del_gen}.parquet` holding the segment's deleted doc
  ordinals (the liveDocs complement — the deleted set is the small side) and
  bumps `del_gen`/`del_count` on the segment's manifest row; the manifest is
  republished atomically (2-phase, like a SegmentInfos commit).
- Deletes are SOFT: search filters deleted docs out of results, but index
  statistics (df, ttf, avgdl, maxDoc == n_docs for idf) intentionally stay
  STALE until a merge rewrites the segment — exactly Lucene's behavior
  (IndexReader.numDocs vs maxDoc; scores change only after the deleted docs
  are expunged).  `rindex.merge.merge_segments` drops deleted docs and
  recomputes every statistic; `run_merges(expunge=True)` is the
  forceMergeDeletes analog.
- Matching runs distributed: one Ray task per segment (the same
  Dataset-over-specs shape as `run_merges`) — each task runs the match
  against its own segment's postings/docmap, unions with the existing
  deleted set, and writes the sidecar.  Nothing corpus-sized ever reaches
  the driver; the manifest update is metadata-only.

Repeated deletes union (idempotent); delete generations are monotonic per
segment so a reader constructed from an old manifest row never sees a
half-written sidecar (sidecars are written tmp+rename before the manifest
names them).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from rindex import segments as segio


def _write_liv(sdir: str, del_gen: int, deleted: np.ndarray) -> str:
    path = os.path.join(sdir, f"_liv-g{del_gen}.parquet")
    tmp = f"{path}.tmp-{os.getpid()}"
    pq.write_table(
        pa.table({"doc": pa.array(np.sort(deleted).astype(np.int32))}), tmp
    )
    segio.atomic_rename_file(tmp, path)
    return path


def _segment_delete(spec: dict) -> dict:
    """Run one segment's match + sidecar write (executes inside a Ray
    task).  Returns the updated manifest-row fields."""
    from rindex.search import _SegmentReader

    meta = spec["meta"]
    sdir = segio.seg_dir(spec["index_dir"], meta["seg_id"], meta.get("gen", 0))
    reader = _SegmentReader(sdir, meta)
    kind = spec["kind"]
    if kind == "terms":
        # docs containing ANY of the (already-analyzed) terms
        posts = reader.postings_for(spec["terms"])
        parts = [
            reader.decoded(t, row)[0]
            for t, row in posts.items()
            if row is not None
        ]
        matched = (
            np.unique(np.concatenate(parts)).astype(np.int64)
            if parts
            else np.zeros(0, dtype=np.int64)
        )
    elif kind == "filter":
        matched = reader.docs_matching(spec["column"], spec["value"])
    else:
        raise ValueError(f"unknown delete kind {kind!r}")
    old = reader.deleted_docs()
    new = (
        np.union1d(old, matched) if old is not None else np.unique(matched)
    )
    old_n = 0 if old is None else len(old)
    if len(new) == old_n:
        # nothing newly deleted: keep the current generation (idempotence)
        return {
            "seg_id": int(meta["seg_id"]),
            "gen": int(meta.get("gen", 0)),
            "del_gen": int(meta.get("del_gen", 0) or 0),
            "del_count": old_n,
        }
    del_gen = int(meta.get("del_gen", 0) or 0) + 1
    _write_liv(sdir, del_gen, new)
    return {
        "seg_id": int(meta["seg_id"]),
        "gen": int(meta.get("gen", 0)),
        "del_gen": del_gen,
        "del_count": int(len(new)),
    }


def _apply(index_dir: str, spec_base: dict) -> dict:
    """Fan the delete out across segments as a Dataset (one task per
    segment), then republish the manifest with the new del_gen/del_count
    rows.  Returns the new manifest."""
    import ray.data as rd

    manifest = segio.read_manifest(index_dir)
    metas = manifest["segments"]
    specs = [
        {"spec": json.dumps({**spec_base, "index_dir": index_dir, "meta": m})}
        for m in metas
    ]

    def do(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            [_segment_delete(json.loads(raw)) for raw in batch["spec"]]
        )

    res = (
        rd.from_items(specs)
        .repartition(len(specs))
        .map_batches(do, batch_size=1, batch_format="pandas")
        .to_pandas()
    )
    upd = {
        (int(r.seg_id), int(r.gen)): (int(r.del_gen), int(r.del_count))
        for r in res.itertuples()
    }
    segments = []
    for m in metas:
        key = (int(m["seg_id"]), int(m.get("gen", 0)))
        dg, dc = upd[key]
        m = dict(m)
        if dg > 0:
            m["del_gen"], m["del_count"] = dg, dc
        segments.append(m)
    return segio.write_manifest(index_dir, segments, manifest["config"])


def delete_by_terms(index_dir: str, text: str) -> dict:
    """Delete every doc containing ANY analyzed term of `text` (the
    deleteByQuery analog for a term query)."""
    from rindex.analysis import get_analyzer

    manifest = segio.read_manifest(index_dir)
    analyzer = manifest["config"].get("analyzer", "standard")
    terms = sorted(set(get_analyzer(analyzer).tokens(text)))
    if not terms:
        return manifest
    return _apply(index_dir, {"kind": "terms", "terms": terms})


def delete_by_filter(index_dir: str, column: str, value) -> dict:
    """Delete every doc whose stored field `column` == value (the
    deleteByQuery analog for a filter clause)."""
    return _apply(index_dir, {"kind": "filter", "column": column, "value": value})


def num_docs(index_dir: str) -> tuple[int, int]:
    """(live docs, max docs) — IndexReader.numDocs() vs maxDoc()."""
    manifest = segio.read_manifest(index_dir)
    max_doc = int(manifest["totals"]["doc_count"])
    deleted = sum(int(m.get("del_count", 0) or 0) for m in manifest["segments"])
    return max_doc - deleted, max_doc
