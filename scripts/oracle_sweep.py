"""Driver-style oracle sweep: run EVERY registered query against its DuckDB
oracle at a given scale and report failures (what CORRECTNESS_r{N}.json
does, minus sampling).

Usage:  python scripts/oracle_sweep.py [--exact] [sf_dir] [name1,name2,...]

Defaults to /root/testdata/sf0.01 and all queries.  Owns its own Ray
session (the library never calls ray.init).

--exact mimics the driver's hash gate: dtype-identical frames compared
with check_exact=True (no rtol, no astype coercion) — catches the
HUGEINT->float64 / int-vs-float drift the default rtol sweep masks."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> int:
    import duckdb
    import numpy as np
    import pandas as pd
    import ray

    ray.init(address="local", include_dashboard=False,
             ignore_reinit_error=True)
    import __ray_entry__ as E

    argv = [a for a in sys.argv[1:] if a != "--exact"]
    exact = "--exact" in sys.argv[1:]
    sys.argv = [sys.argv[0]] + argv
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    queries, oracles = E.queries(), E.oracle_sql()
    names = (
        sys.argv[2].split(",") if len(sys.argv) > 2 else list(queries)
    )
    fails, t0 = [], time.time()
    for name in names:
        try:
            res = queries[name](sf)
            df = res if isinstance(res, pd.DataFrame) else res.to_pandas()
            if name not in oracles:
                print(f"{name}: rows_only {len(df)}", flush=True)
                continue
            con = duckdb.connect()
            for t in TABLES:
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf}/{t}.parquet')"
                )
            odf = con.execute(oracles[name]).df()
            cols = sorted(df.columns)
            assert cols == sorted(odf.columns), (
                f"schema {cols} vs {sorted(odf.columns)}"
            )
            a = df[cols].sort_values(cols).reset_index(drop=True)
            b = odf[cols].sort_values(cols).reset_index(drop=True)
            assert len(a) == len(b), f"rows {len(a)} vs {len(b)}"
            if exact:
                # driver-hash discipline: dtypes AND values must match
                # exactly, no coercion (object cols may differ in kind
                # e.g. str vs large_string — normalize only those)
                bad = [
                    c for c in cols
                    if a[c].dtype.kind != b[c].dtype.kind
                ]
                assert not bad, (
                    f"dtype drift {[(c, str(a[c].dtype), str(b[c].dtype)) for c in bad]}"
                )
                pd.testing.assert_frame_equal(
                    a, b.astype(a.dtypes.to_dict()), check_exact=True
                )
            else:
                pd.testing.assert_frame_equal(
                    a, b.astype(a.dtypes.to_dict()), rtol=1e-5,
                    check_exact=False,
                )
            print(f"{name}: OK {len(a)}", flush=True)
        except Exception as e:  # noqa: BLE001 — report and continue
            fails.append(name)
            print(f"{name}: FAIL {str(e)[:200]}", flush=True)
    print(
        f"\n{len(names)} queries, {len(fails)} failures "
        f"in {time.time() - t0:.0f}s: {json.dumps(fails)}"
    )
    ray.shutdown()
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
