"""CDCR — cross-data-center replication, bounded Ray-native form.

Reference: `solr/core/src/java/org/apache/solr/handler/CdcrRequestHandler
.java` + `CdcrReplicator.java` — the source cluster forwards its update
log to a target cluster, tracking a replication checkpoint so forwarding
resumes (never replays) after restarts, and exposes per-collection
bootstrap/queue stats.

Ray-native shape: the "update log" is the ordered document stream; the
forward is a partition-parallel `write_parquet` into the TARGET
collection directory (each output file one tlog batch), the checkpoint an
atomically-written JSON beside the target recording totals + last doc_id.
A second invocation sees the checkpoint and forwards NOTHING (the
exactly-once contract topic() implements for queries, applied to
replication).  Verification reads the TARGET — counts, byte sums and a
doc_id checksum per source — never the source table, so a broken forward
cannot vacuously pass.  At scale the forward is N independent partition
writes (resumable per partition via _SUCCESS lineage like
scripts/ray_job.py); the verify rollup is one distributed groupby.
"""

from __future__ import annotations

import json
import os
import shutil

import pyarrow as pa

from rindex.ops.util import cache_dir, read_table

QUERIES: dict = {}
ORACLE: dict = {}


def _cdcr_target(sf_dir: str) -> tuple[str, str]:
    tgt = cache_dir(sf_dir, "cdcr_target")
    return tgt, tgt + ".ck.json"


def cdcr_forward(sf_dir: str) -> dict:
    """Forward the update log to the target collection once; later calls
    return the stored checkpoint without moving data."""
    tgt, ck = _cdcr_target(sf_dir)
    if os.path.exists(ck):
        with open(ck) as fh:
            return json.load(fh)
    if os.path.isdir(tgt):  # partial forward from a dead run: restart clean
        shutil.rmtree(tgt)
    ds = read_table(sf_dir, "documents", ["doc_id", "source", "n_chars"])
    ds.write_parquet(tgt)
    totals = {
        "forwarded_docs": int(ds.count()),
        "last_doc_id": int(ds.max("doc_id")),
    }
    tmp = ck + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(totals, fh)
    os.replace(tmp, ck)  # checkpoint lands only AFTER the data
    return totals


def q_cdcr_replicate_documents(sf_dir: str):
    """CDCR forward + target-side verification: per-source doc counts,
    char sums and a doc_id checksum read back FROM THE TARGET after the
    checkpointed forward."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    cdcr_forward(sf_dir)
    tgt, _ = _cdcr_target(sf_dir)
    out = (
        rd.read_parquet(tgt)
        .groupby("source")
        .aggregate(
            Count(alias_name="n_docs"),
            Sum(on="n_chars", alias_name="sum_chars"),
            Sum(on="doc_id", alias_name="id_checksum"),
        )
    )
    return out.sort("source")


QUERIES["cdcr_replicate_documents"] = q_cdcr_replicate_documents
ORACLE["cdcr_replicate_documents"] = """
    SELECT source, count(*) AS n_docs,
           sum(n_chars)::BIGINT AS sum_chars,
           sum(doc_id)::BIGINT AS id_checksum
    FROM documents GROUP BY source ORDER BY source
"""
