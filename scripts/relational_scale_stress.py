"""Scale-stress the relational / streaming-expression families (VERDICT r4
item #9): the asof/band/window event operators, the /sql handler, and the
compiled search()→hashJoin→rollup expression, at the same 8x data mass the
index-build and conversation families were stressed at.

Corpora (tiled from sf0.1 with shifted keys, cached under /tmp):
  events  x80  -> 8M rows   (event_id AND user_id shifted per tile: user
                             count scales, per-user density stays real)
  orders  x53  -> 7.95M rows (o_orderkey shifted; group keys unchanged so
                             the rollup groups grow 53x)
  documents x576 -> 2.88M docs (the conv-stress corpus; search_rollup
                             builds a full index over it first)

Usage:  python scripts/relational_scale_stress.py [num_cpus]
Prints one JSON line; record in BASELINE.md.
"""

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.1"
OUT = "/tmp/rindex_rel_stress"

EVENT_TILES = 80
ORDER_TILES = 53
DOC_TILES = 576


def _tile(src: str, name: str, n_tiles: int, shift_cols: dict) -> None:
    """Tile `src` n_tiles times into OUT/name.parquet/, adding
    tile*stride to each column in shift_cols (stride = its max+1)."""
    dest = os.path.join(OUT, f"{name}.parquet")
    done = os.path.join(dest, "_DONE")
    if os.path.exists(done) and open(done).read().strip() == str(n_tiles):
        return
    shutil.rmtree(dest, ignore_errors=True)
    os.makedirs(dest, exist_ok=True)
    base = pq.read_table(src)
    strides = {
        c: int(base[c].to_numpy(zero_copy_only=False).max()) + 1
        for c in shift_cols
    }
    tiles_per_file = max(1, n_tiles // 32)
    f = 0
    for start in range(0, n_tiles, tiles_per_file):
        chunk = []
        for t in range(start, min(start + tiles_per_file, n_tiles)):
            tab = base
            for c in shift_cols:
                vals = tab[c].to_numpy(zero_copy_only=False)
                tab = tab.set_column(
                    tab.schema.get_field_index(c), c,
                    pa.array(vals + t * strides[c], pa.int64()),
                )
            chunk.append(tab)
        pq.write_table(
            pa.concat_tables(chunk),
            os.path.join(dest, f"part-{f:04d}.parquet"),
        )
        f += 1
    with open(done, "w") as fh:
        fh.write(str(n_tiles))


def build_corpora() -> str:
    _tile(f"{SF}/events.parquet", "events", EVENT_TILES,
          {"event_id": 1, "user_id": 1})
    _tile(f"{SF}/orders.parquet", "orders", ORDER_TILES, {"o_orderkey": 1})
    # documents reuses the conv-stress tiling (doc_id shift only)
    _tile(f"{SF}/documents.parquet", "documents", DOC_TILES, {"doc_id": 1})
    return OUT


def main() -> None:
    num_cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus,
                 include_dashboard=False)
    sf_dir = build_corpora()

    import ray.data as rd

    from rindex.ops.relational import (
        q_asof_join_events,
        q_range_join_events,
        q_sliding_window_events,
    )
    from rindex.ops.sqlhandler import q_sql_handler_having_orders
    from rindex.ops.streamlang import q_stream_expr_search_rollup

    rows_in = {
        "asof_join": 100_000 * EVENT_TILES,
        "range_join": 100_000 * EVENT_TILES,
        "sliding_window": 100_000 * EVENT_TILES,
        "sql_having": 150_000 * ORDER_TILES,
        "search_rollup": 5_000 * DOC_TILES,
    }
    results = {}
    for name, fn in [
        ("asof_join", q_asof_join_events),
        ("range_join", q_range_join_events),
        ("sliding_window", q_sliding_window_events),
        ("sql_having", q_sql_handler_having_orders),
        ("search_rollup", q_stream_expr_search_rollup),
    ]:
        t0 = time.perf_counter()
        res = fn(sf_dir)
        rows = res.count() if isinstance(res, rd.Dataset) else len(res)
        wall = round(time.perf_counter() - t0, 2)
        results[name] = {
            "wall_sec": wall,
            "rows": int(rows),
            "rows_in_per_sec": round(rows_in[name] / wall),
        }
        print(f"{name}: {wall}s, {rows} rows", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "relational_scale_stress",
                "events_rows": rows_in["asof_join"],
                "orders_rows": rows_in["sql_having"],
                "documents_rows": rows_in["search_rollup"],
                "num_cpus": num_cpus,
                "ops": results,
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
