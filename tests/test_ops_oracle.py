"""Driver-style DuckDB oracle comparison for every SQL-backed ops entry.

Emulates the graft driver's check: run the Ray pipeline and the oracle SQL
on the same parquet tables, then compare row count, column names, and
order-insensitive values."""

import glob
import os

import duckdb
import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype(np.float64)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype(np.int64)
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _to_df(res) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def compare(ray_res, sql_df):
    a = _normalize(_to_df(ray_res))
    b = _normalize(sql_df)
    assert list(a.columns) == list(b.columns), (list(a.columns), list(b.columns))
    assert len(a) == len(b), (len(a), len(b))
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)


def _all_ops():
    from rindex.ops import registry

    q, o = registry.all_queries(), registry.all_oracle_sql()
    return q, o


def sql_backed_names():
    _, o = _all_ops()
    return sorted(o)


@pytest.mark.parametrize("name", sql_backed_names())
def test_ops_vs_duckdb(ray_session, name):
    queries, oracle = _all_ops()
    con = _duck(SF_DIR)
    sql_df = con.execute(oracle[name]).df()
    ray_res = queries[name](SF_DIR)
    compare(ray_res, sql_df)


def test_rows_only_ops_run(ray_session):
    queries, oracle = _all_ops()
    for name in sorted(set(queries) - set(oracle)):
        res = _to_df(queries[name](SF_DIR))
        assert len(res) >= 0 and len(res.columns) > 0
