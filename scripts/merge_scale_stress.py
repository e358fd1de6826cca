"""Merge-policy re-stress at 8x with the r4 segment layouts (VERDICT r4
item #10): auto-sized segments + gen-stacked deletes, then forceMerge with
docID remap + supersession, then a structural CheckIndex audit.

Flow (all on the 2.88M-doc tiled documents corpus that
scripts/relational_scale_stress.py builds — run that first or let this
script build it):

  1. build_index(num_segments="auto")                        -> timed
  2. delete_by_terms("w0001") — a gen-stacked .liv on every segment
  3. run_merges(force=True) — forceMerge all slots               -> timed
  4. structural audit (CheckIndex invariants minus the per-doc analyzer
     ground-truth recompute, which is O(corpus) driver Python — the full
     analyzer-backed audit runs at pytest scale in tests/test_checkindex):
     per segment: terms sorted+unique, df==len(postings)==block coverage,
     ttf==sum(tf), postings ascending in [0,max_doc), block bounds
     consistent + impacts are true per-block maxima, norms present;
     manifest totals consistent; deleted term gone from post-merge search.

Usage:  python scripts/merge_scale_stress.py [num_cpus]
Prints one JSON line; record in BASELINE.md.
"""

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow.parquet as pq

IDX = "/tmp/rindex_merge_stress_idx"


def structural_audit(index_dir: str) -> dict:
    from rindex.codec import decode_posting
    from rindex.segments import read_manifest, seg_dir

    manifest = read_manifest(index_dir)
    total_docs = 0
    n_terms = 0
    for m in manifest["segments"]:
        sdir = seg_dir(index_dir, m["seg_id"], m.get("gen", 0))
        docs_tbl = pq.read_table(
            os.path.join(sdir, "docs.parquet"), columns=["doc"]
        )
        postings = pq.read_table(os.path.join(sdir, "postings.parquet"))
        max_doc = m["max_doc"]
        total_docs += m["doc_count"]
        assert docs_tbl.num_rows == m["doc_count"] == max_doc
        d = docs_tbl["doc"].to_numpy()
        assert d[0] == 0 and d[-1] == max_doc - 1 and len(d) == max_doc

        terms = postings["term"].to_pylist()
        assert terms == sorted(terms) and len(set(terms)) == len(terms)
        assert m["n_terms"] == len(terms)
        n_terms += len(terms)

        sum_ttf = 0
        for row in postings.to_pylist():
            docs_arr, tfs, norms = decode_posting(row)
            assert np.all(np.diff(docs_arr) > 0)
            assert row["df"] == len(docs_arr)
            assert row["ttf"] == int(tfs.sum())
            sum_ttf += row["ttf"]
            assert docs_arr[0] >= 0 and docs_arr[-1] < max_doc
            nb = len(row["block_offset"])
            bf, bl = row["block_first_doc"], row["block_last_doc"]
            assert all(bf[i] <= bl[i] for i in range(nb))
            assert all(bl[i] < bf[i + 1] for i in range(nb - 1))
            pos = 0
            for i in range(nb):
                in_block = (docs_arr >= bf[i]) & (docs_arr <= bl[i])
                assert row["block_max_tf"][i] == int(tfs[in_block].max())
                assert row["block_min_norm"][i] == int(norms[in_block].min())
                pos += int(in_block.sum())
            assert pos == row["df"]
        assert m["sum_dl"] == sum_ttf
    assert total_docs == manifest["totals"]["doc_count"]
    return {"segments": len(manifest["segments"]), "docs": total_docs,
            "terms_total": n_terms}


def _transcript_corpus(n_turns_target: int = 2_880_000) -> tuple:
    """The r2-comparable corpus: make_transcripts synthetic turns (229k
    full Zipf vocab, ~60 tokens/turn) — the SAME shape the r2 8x
    build+merge stress measured, so walls are apples-to-apples.  Written
    in 32 seeded shards (cached)."""
    out = "/tmp/rindex_merge_stress_corpus"
    done = os.path.join(out, "_DONE")
    import pyarrow.parquet as _pq

    from rindex.fixtures import make_transcripts

    n_convs = n_turns_target // 3  # E[turns/conv] with max_turns=5 is ~3
    per_shard = n_convs // 32
    if not (os.path.exists(done)
            and open(done).read().strip() == str(n_convs)):
        shutil.rmtree(out, ignore_errors=True)
        os.makedirs(out, exist_ok=True)
        total = 0
        for s in range(32):
            t = make_transcripts(per_shard, 5, seed=1000 + s)
            # disambiguate conv ids across shards
            import pyarrow as _pa

            conv = _pa.array(
                [f"s{s:02d}-{v}" for v in t["conv_id"].to_pylist()],
                _pa.string(),
            )
            t = t.set_column(
                t.schema.get_field_index("conv_id"), "conv_id", conv
            )
            total += t.num_rows
            _pq.write_table(t, os.path.join(out, f"part-{s:02d}.parquet"))
        with open(done, "w") as fh:
            fh.write(str(n_convs))
        print(f"corpus: {total} turns", file=sys.stderr)
    parts = sorted(
        os.path.join(out, f) for f in os.listdir(out)
        if f.endswith(".parquet")
    )
    n_rows = sum(_pq.read_metadata(p).num_rows for p in parts)
    return parts, n_rows


def main() -> None:
    use_transcripts = "--transcripts" in sys.argv
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    num_cpus = int(args[0]) if args else 32
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus,
                 include_dashboard=False)

    from rindex.build import append_index, build_index
    from rindex.deletes import delete_by_terms, num_docs
    from rindex.merge import run_merges
    from rindex.search import IndexSearcher

    import glob

    if use_transcripts:
        # r2-comparable corpus (full Zipf vocab, default transcript cols)
        parts, n_docs = _transcript_corpus()
        build_kwargs = {}
        # mid-Zipf body word: present in a few % of turns, so the merge
        # still remaps essentially the whole live corpus (the r2 shape)
        del_term, live_term = "w0100", "w0002"
    else:
        from scripts.relational_scale_stress import (
            DOC_TILES,
            build_corpora,
        )

        sf_dir = build_corpora()
        corpus = os.path.join(sf_dir, "documents.parquet")
        n_docs = 5_000 * DOC_TILES
        parts = sorted(glob.glob(os.path.join(corpus, "part-*.parquet")))
        build_kwargs = {"id_cols": ("doc_id",), "text_col": "text",
                        "keep_cols": ()}
        del_term, live_term = "spark", "join"

    # most shards in the base build, the last two appended as a second
    # GENERATION so every slot is gen-stacked and forceMerge has real
    # cross-generation work (the r4 layout the re-stress must exercise)
    base, extra = parts[:-2], parts[-2:]
    shutil.rmtree(IDX, ignore_errors=True)
    t0 = time.perf_counter()
    build_index(
        base, IDX, num_segments="auto", mode="local",
        input_files=base, **build_kwargs,
    )
    build_sec = round(time.perf_counter() - t0, 2)
    print(f"build: {build_sec}s", file=sys.stderr)

    t0 = time.perf_counter()
    append_index(extra, IDX, input_files=extra)
    append_sec = round(time.perf_counter() - t0, 2)
    print(f"append: {append_sec}s", file=sys.stderr)

    t0 = time.perf_counter()
    delete_by_terms(IDX, del_term)
    del_sec = round(time.perf_counter() - t0, 2)
    live, max_docs = num_docs(IDX)
    print(f"delete_by_terms: {del_sec}s, live {live}/{max_docs}",
          file=sys.stderr)
    assert live < max_docs, "delete_by_terms matched nothing"

    t0 = time.perf_counter()
    m = run_merges(IDX, force=True)
    merge_sec = round(time.perf_counter() - t0, 2)
    print(f"forceMerge: {merge_sec}s -> {m['totals']['n_segments']} segs",
          file=sys.stderr)

    t0 = time.perf_counter()
    audit = structural_audit(IDX)
    audit_sec = round(time.perf_counter() - t0, 2)

    # post-merge: the deleted term is expunged, a live term still matches
    s = IndexSearcher(IDX)
    assert len(s.search(del_term, k=5)) == 0, "deleted term survived merge"
    assert len(s.search(live_term, k=5)) > 0

    print(
        json.dumps(
            {
                "metric": "merge_scale_stress",
                "corpus": "transcripts" if use_transcripts else "documents",
                "n_docs": n_docs,
                "num_cpus": num_cpus,
                "build_sec": build_sec,
                "append_sec": append_sec,
                "build_docs_per_sec": round(n_docs / build_sec),
                "delete_sec": del_sec,
                "live_docs_after_delete": live,
                "force_merge_sec": merge_sec,
                "audit_sec": audit_sec,
                "audit": audit,
                "segments_after_merge": m["totals"]["n_segments"],
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
