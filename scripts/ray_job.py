#!/usr/bin/env python
"""`ray job submit` entrypoint for the north-star pipeline: resumable
inverted-index build over a transcript Parquet corpus + BM25 top-k serving.

On a real cluster:

    ray job submit --working-dir . -- python scripts/ray_job.py \
        --corpus s3://bucket/transcripts/ --index-dir /shared/index \
        --queries-parquet s3://bucket/queries.parquet

In this sandbox it runs against the local synthetic corpus.  The job:

  1. builds (or RESUMES) the index — per-segment `_SUCCESS` lineage
     (config hash + input fingerprint) lets a re-submitted job skip every
     finished partition (rindex/build.py), which is the cluster-restart
     story: re-submit the same job, only missing segments rebuild;
  2. prints per-partition lineage + metrics (doc counts, term counts,
     postings bytes, docfreq extrema) from each segment's meta.json;
  3. serves the reference query set and prints ONE JSON result line
     (same shape bench.py uses) to stdout for the job log.

Owns its Ray session (guarded — under `ray job submit` the cluster is
attached via RAY_ADDRESS; standalone it starts local mode).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", default=None,
                    help="parquet dir of transcripts (conv_id, turn_idx, "
                         "role, text, tool, ts); default: synthetic sf0.01")
    ap.add_argument("--index-dir", default="/tmp/rindex_job/index")
    ap.add_argument("--num-segments", default="auto")
    ap.add_argument("--no-resume", action="store_true",
                    help="force a from-scratch build")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--num-cpus", type=int, default=None,
                    help="standalone only; under ray job submit the "
                         "cluster size is the cluster's")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        kw = {"include_dashboard": False}
        if args.num_cpus:
            kw["num_cpus"] = args.num_cpus
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"), **kw)

    from rindex.build import build_index
    from rindex.fixtures import make_queries, make_transcripts
    from rindex.search import IndexSearcher

    corpus = args.corpus
    if corpus is None:
        import pyarrow.parquet as pq

        corpus = "/tmp/rindex_job/corpus"
        if not os.path.exists(os.path.join(corpus, "_DONE")):
            os.makedirs(corpus, exist_ok=True)
            t = make_transcripts(8000, 8)
            per = (t.num_rows + 31) // 32
            for f in range(32):
                chunk = t.slice(f * per, per)
                if chunk.num_rows:
                    pq.write_table(
                        chunk, os.path.join(corpus, f"part-{f:04d}.parquet")
                    )
            open(os.path.join(corpus, "_DONE"), "w").write("ok\n")

    nseg = (args.num_segments if args.num_segments == "auto"
            else int(args.num_segments))
    # count finished partitions BEFORE the build so the job log reports
    # what resume actually skipped (not just that the mode was on)
    pre = len(glob.glob(os.path.join(args.index_dir, "**", "_SUCCESS"),
                        recursive=True))
    t0 = time.perf_counter()
    manifest = build_index(
        corpus, args.index_dir,
        mode="term_shuffle", num_segments=nseg,
        resume=not args.no_resume,
    )
    build_s = time.perf_counter() - t0

    # per-partition lineage + metrics (the checkpoint story the job log
    # carries: a resumed run shows the same lineage with ~0s build)
    parts = []
    for mpath in sorted(
        glob.glob(
            os.path.join(args.index_dir, "segments", "seg-*", "meta.json")
        )
    ):
        m = json.load(open(mpath))
        parts.append(
            {
                "seg_id": m["seg_id"],
                "gen": m["gen"],
                "docs": m["doc_count"],
                "terms": m["n_terms"],
                "postings_bytes": m["postings_bytes"],
                "max_df": m["max_df"],
                "lineage": m["lineage"],
            }
        )
        print(
            f"[partition seg-{m['seg_id']:04d}] gen={m['gen']} "
            f"docs={m['doc_count']} terms={m['n_terms']} "
            f"postings={m['postings_bytes']}B max_df={m['max_df']} "
            f"lineage={m['lineage']['config_hash'][:10]}/"
            f"{m['lineage']['input_fingerprint'][:10]}",
            file=sys.stderr,
        )

    searcher = IndexSearcher(args.index_dir, algo="wand")
    searcher.warm()
    queries = make_queries()
    lat = []
    for qtype, text, k in zip(
        queries["qtype"].to_pylist(),
        queries["text"].to_pylist(),
        queries["k"].to_pylist(),
    ):
        q0 = time.perf_counter()
        searcher.search(
            text, k=int(k), mode="and" if qtype == "and" else "or"
        )
        lat.append(time.perf_counter() - q0)
    lat.sort()

    n_docs = sum(p["docs"] for p in parts)
    print(json.dumps({
        "job": "index_build_and_serve",
        "resume_enabled": not args.no_resume,
        "partitions_preexisting": pre,
        "build_sec": round(build_s, 3),
        "docs": n_docs,
        "docs_per_sec": round(n_docs / build_s, 1) if build_s > 0 else None,
        "partitions": len(parts),
        "postings_bytes": sum(p["postings_bytes"] for p in parts),
        "n_queries": len(lat),
        "query_p50_ms": round(1000 * lat[len(lat) // 2], 2),
        "manifest_gen": manifest.get("generation", 0),
    }))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
