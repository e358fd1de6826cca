"""Atomic updates with optimistic concurrency — Solr's in-place document
update semantics re-expressed over immutable segment generations.

Reference surfaces:
- Atomic update modifiers (set / inc): `solr/core/src/java/org/apache/
  solr/update/processor/AtomicUpdateDocumentMerger.java` — read the
  CURRENT stored document, apply the field modifiers, reindex the whole
  document (Lucene docs are immutable; so are our segments).
- Optimistic concurrency (`_version_` precondition, HTTP 409 on
  mismatch): `solr/core/src/java/org/apache/solr/update/
  DocBasedVersionConstraintsProcessorFactory.java` +
  `VersionInfo.java` — an update carrying an expected version is REJECTED
  when the document's current version differs.

Mapping: a document's current version is the max segment generation that
holds a live copy of it (fresh build == gen 0 everywhere — computed from
the manifest + docmaps, not assumed).  Accepted updates are read-modify-
reindexed as the next generation via append_index, then a forced merge
resolves the supersession exactly like Solr's eventual segment merge —
the gen-1 copy wins by version order (rindex/merge.py:207).  The final
stored state is read back from the POST-MERGE index (the engine is the
source of truth; the oracle recomputes the expected state in SQL).

Scale note: the UPDATE BATCH here is demo-sized on purpose (~54% of the
corpus so the oracle has teeth), and its construction — touched-id list,
pushdown `in` filters, pandas modifier application — is driver-side
because an atomic-update batch is the SMALL side of this operation in any
real deployment (a trickle against the corpus).  At a 10^12-doc corpus
with a large batch, the same chain runs batch-distributed: updates arrive
as a Dataset, the current-state fetch becomes a hash join against the
docmaps on doc_id, modifiers apply per Arrow batch, and append_index +
the supersession merge already ARE distributed.  No engine semantics
change — only the batch plumbing.

Deterministic update batch over the documents table:
  - doc_id %% 7 == 0                          -> set  lang   = 'xx'   (expected = current  -> ACCEPTED)
  - else doc_id %% 5 == 0                     -> inc  n_chars += 1000 (expected = current  -> ACCEPTED)
  - else doc_id %% 3 == 0                     -> set  source = 'oops' (expected = STALE 999 -> REJECTED 409)
"""

from __future__ import annotations

import hashlib
import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from rindex import segments as segio

QUERIES: dict = {}
ORACLE: dict = {}

_INC_BY = 1000
_STALE_VERSION = 999


def _classify(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(set_mask, inc_mask, reject_mask) for the deterministic batch."""
    set_m = ids % 7 == 0
    inc_m = ~set_m & (ids % 5 == 0)
    rej_m = ~set_m & ~inc_m & (ids % 3 == 0)
    return set_m, inc_m, rej_m


def _current_versions(idx: str, ids: np.ndarray) -> dict[int, int]:
    """doc_id -> max generation holding a live copy (the _version_ read:
    VersionInfo#getVersionFromIndex).  Pushdown-filtered docmap reads —
    only the touched ids leave parquet."""
    manifest = segio.read_manifest(idx)
    cur: dict[int, int] = {}
    for m in manifest["segments"]:
        t = pq.read_table(
            os.path.join(segio.seg_dir(idx, m["seg_id"], m.get("gen", 0)),
                         "docs.parquet"),
            columns=["doc_id"],
            filters=[("doc_id", "in", ids.tolist())],
        )
        g = int(m.get("version", m.get("gen", 0)))
        for d in t["doc_id"].to_pylist():
            cur[d] = max(cur.get(d, 0), g)
    return cur


def _prepare(sf_dir: str) -> tuple[str, pd.DataFrame]:
    """Build the private index and apply the update batch exactly once per
    source lineage; returns (index_dir, touched-ids frame with status)."""
    from rindex.build import append_index, build_index
    from rindex.merge import run_merges

    src = os.path.join(sf_dir, "documents.parquet")
    if not os.path.exists(src):
        raise FileNotFoundError(src)
    key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:10]
    idx = os.path.join("/tmp", "rindex_cache", f"atom-{key}")
    stamp = {
        "fingerprint": segio.input_fingerprint([src]),
        "inc_by": _INC_BY,
        "stale": _STALE_VERSION,
    }
    marker = os.path.join(idx, "_atomic_applied.json")
    if os.path.exists(marker):
        with open(marker) as fh:
            if json.load(fh) == stamp:
                return idx, _touched(src)

    build_index(
        src, idx, num_segments=8, mode="local", id_cols=("doc_id",),
        text_col="text", keep_cols=("lang", "source", "n_chars"),
        input_files=[src],
    )

    touched = _touched(src)
    ids = touched["doc_id"].to_numpy()
    set_m, inc_m, rej_m = _classify(ids)
    cur = _current_versions(idx, ids)

    # the optimistic check: accepted updates carry the doc's current
    # version, the rejected batch carries a stale one — compare for real
    expected = np.where(rej_m, _STALE_VERSION, [cur[d] for d in ids])
    accepted = np.array([expected[i] == cur[d] for i, d in enumerate(ids)])
    assert (accepted == (set_m | inc_m)).all()  # 409s are exactly the stale batch

    # read-modify-reindex the ACCEPTED docs: fetch their CURRENT stored
    # fields (pushdown realtime-get read), apply the modifiers, append as
    # the next generation
    acc_ids = ids[accepted].tolist()
    manifest = segio.read_manifest(idx)
    parts = [
        pq.read_table(
            os.path.join(segio.seg_dir(idx, m["seg_id"], m.get("gen", 0)),
                         "docs.parquet"),
            columns=["doc_id", "text", "lang", "source", "n_chars"],
            filters=[("doc_id", "in", acc_ids)],
        )
        for m in manifest["segments"]
    ]
    docs = pa.concat_tables(parts).to_pandas().sort_values("doc_id")
    a_ids = docs["doc_id"].to_numpy()
    a_set, a_inc, _ = _classify(a_ids)
    docs.loc[a_set, "lang"] = "xx"
    docs.loc[a_inc, "n_chars"] = docs.loc[a_inc, "n_chars"] + _INC_BY

    upd_path = os.path.join(idx, "_atomic_updates.parquet")
    pq.write_table(pa.Table.from_pandas(docs, preserve_index=False), upd_path)
    append_index(upd_path, idx, mode="local", input_files=[upd_path])
    run_merges(idx, force=True)  # supersession: gen-1 copies win by version
    segio.atomic_write_json(marker, stamp)
    return idx, touched


def _touched(src: str) -> pd.DataFrame:
    ids = pq.read_table(src, columns=["doc_id"])["doc_id"].to_numpy()
    set_m, inc_m, rej_m = _classify(ids)
    m = set_m | inc_m | rej_m
    return pd.DataFrame(
        {
            "doc_id": ids[m],
            "status": np.where(
                rej_m[m], "rejected_conflict", "updated"
            ),
        }
    )


def q_atomic_update_documents(sf_dir: str):
    """Final stored state of every touched doc AFTER the atomic-update
    batch + supersession merge, read back from the index (pushdown docmap
    read — the /get handler path), joined with the per-update outcome.
    The oracle recomputes the expected end state in SQL, so any engine
    bug in the read-modify-reindex-merge chain surfaces as a mismatch."""
    idx, touched = _prepare(sf_dir)
    manifest = segio.read_manifest(idx)
    parts = [
        pq.read_table(
            os.path.join(segio.seg_dir(idx, m["seg_id"], m.get("gen", 0)),
                         "docs.parquet"),
            columns=["doc_id", "lang", "source", "n_chars"],
            filters=[("doc_id", "in", touched["doc_id"].tolist())],
        )
        for m in manifest["segments"]
    ]
    state = pa.concat_tables(parts).to_pandas()
    out = state.merge(touched, on="doc_id").sort_values("doc_id")
    if len(out) != len(touched):
        raise RuntimeError(
            f"atomic update read-back: {len(out)} rows for "
            f"{len(touched)} touched docs — supersession merge failed"
        )
    return out.reset_index(drop=True)


QUERIES["atomic_update_documents"] = q_atomic_update_documents
ORACLE["atomic_update_documents"] = f"""
    SELECT doc_id,
           CASE WHEN doc_id % 7 = 0 THEN 'xx' ELSE lang END AS lang,
           source,
           CASE WHEN doc_id % 7 <> 0 AND doc_id % 5 = 0
                THEN n_chars + {_INC_BY} ELSE n_chars END AS n_chars,
           CASE WHEN doc_id % 7 = 0 OR (doc_id % 7 <> 0 AND doc_id % 5 = 0)
                THEN 'updated' ELSE 'rejected_conflict' END AS status
    FROM documents
    WHERE doc_id % 7 = 0 OR doc_id % 5 = 0
          OR (doc_id % 7 <> 0 AND doc_id % 5 <> 0 AND doc_id % 3 = 0)
"""
