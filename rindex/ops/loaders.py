"""Source/sink format coverage (SURVEY.md §2.1): JSON and CSV loaders fed
through `ray.data.read_json` / `ray.data.read_csv`, validated against the
same rows from the parquet view.

The reference ingests update streams as JSON/CSV/XML
(`solr/core/src/java/org/apache/solr/handler/loader/{JsonLoader,
CSVLoaderBase}.java`); here the wire format is materialized once per sf_dir
under /tmp (cache keyed by path) and read back with the Ray-native readers —
the Dataset that results is identical to the parquet-sourced one, which the
oracle (running on the parquet view) asserts."""

from __future__ import annotations

import hashlib
import os

import pandas as pd

QUERIES: dict = {}
ORACLE: dict = {}


def _cache_dir(sf_dir: str) -> str:
    # keyed by path + source parquet (mtime, size): regenerated input data
    # must invalidate the cached wire files, not serve them stale
    src = os.path.join(sf_dir, "events.parquet")
    st = os.stat(src)
    key = hashlib.md5(
        f"{os.path.abspath(sf_dir)}|{st.st_mtime_ns}|{st.st_size}".encode()
    ).hexdigest()[:12]
    d = os.path.join("/tmp", "rindex_cache", f"wire-{key}")
    os.makedirs(d, exist_ok=True)
    return d


def _ensure_wire_files(sf_dir: str) -> tuple[str, str]:
    """events.parquet -> events.jsonl + events.csv (once, cached)."""
    import pyarrow.parquet as pq

    d = _cache_dir(sf_dir)
    jpath = os.path.join(d, "events.jsonl")
    cpath = os.path.join(d, "events.csv")
    done = os.path.join(d, "_DONE")
    if not os.path.exists(done):
        t = pq.read_table(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_id", "event_type", "user_id", "value"],
        )
        df = t.to_pandas()
        # json.dumps formats floats with repr() -> EXACT float64
        # round-trip (pandas to_json double_precision is decimal PLACES
        # capped at 15, which still flips ~0.3% of doubles by 1 ulp);
        # pid-unique tmp names so concurrent first runs cannot interleave
        tmp = f".tmp-{os.getpid()}"
        import json as _json

        with open(jpath + tmp, "w") as fh:
            for rec in df.to_dict("records"):
                fh.write(_json.dumps(rec) + "\n")
        os.replace(jpath + tmp, jpath)
        df.to_csv(cpath + tmp, index=False)
        os.replace(cpath + tmp, cpath)
        with open(done, "w") as fh:
            fh.write("ok")
    return jpath, cpath


def q_json_loader_events(sf_dir: str):
    """JsonLoader analog: read the JSON-lines update stream with
    `ray.data.read_json`, then the standard facet pipeline.  Proves the
    loader produces the same Dataset as the parquet source (oracle runs on
    parquet)."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    jpath, _ = _ensure_wire_files(sf_dir)
    ds = rd.read_json(jpath)
    out = (
        ds.groupby("event_type")
        .aggregate(Count(), Sum("value"))
        .to_pandas()
        .rename(columns={"count()": "n", "sum(value)": "sum_value"})
    )
    out["n"] = out["n"].astype("int64")
    out["sum_value"] = out["sum_value"].round(4)
    return out.sort_values("event_type").reset_index(drop=True)


QUERIES["json_loader_events"] = q_json_loader_events
ORACLE["json_loader_events"] = """
    SELECT event_type, count(*)::BIGINT AS n,
           round(sum(value), 4) AS sum_value
    FROM events GROUP BY event_type ORDER BY event_type
"""


def q_csv_loader_events(sf_dir: str):
    """CSVLoaderBase analog via `ray.data.read_csv` (same validation
    shape as the JSON loader, distinct wire format + type inference)."""
    import ray.data as rd
    from ray.data.aggregate import Max, Min

    _, cpath = _ensure_wire_files(sf_dir)
    ds = rd.read_csv(cpath)
    out = (
        ds.groupby("event_type")
        .aggregate(Min("event_id"), Max("event_id"))
        .to_pandas()
        .rename(
            columns={"min(event_id)": "min_id", "max(event_id)": "max_id"}
        )
    )
    out["min_id"] = out["min_id"].astype("int64")
    out["max_id"] = out["max_id"].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


QUERIES["csv_loader_events"] = q_csv_loader_events
ORACLE["csv_loader_events"] = """
    SELECT event_type, min(event_id)::BIGINT AS min_id,
           max(event_id)::BIGINT AS max_id
    FROM events GROUP BY event_type ORDER BY event_type
"""


def _ensure_sql_db(sf_dir: str) -> str:
    """events.parquet -> a DuckDB database file (once, cached) — the
    stand-in for the reference's JDBC source (DataImportHandler /
    JdbcDataSource, `solr/contrib/dataimporthandler/src/java/org/apache/
    solr/handler/dataimport/JdbcDataSource.java`).  No network in this
    environment, so the "database server" is a local DuckDB file; the
    Ray-side shape (read_sql + connection factory per read task, sharded
    by key range) is the real one."""
    import duckdb

    d = _cache_dir(sf_dir)
    dbpath = os.path.join(d, "events.duckdb")
    done = os.path.join(d, "_DONE_SQL")
    if not os.path.exists(done):
        tmp = dbpath + f".tmp-{os.getpid()}"
        if os.path.exists(tmp):
            os.remove(tmp)
        con = duckdb.connect(tmp)
        con.execute(
            "CREATE TABLE events AS SELECT event_id, event_type, user_id, "
            f"value FROM read_parquet('{os.path.join(sf_dir, 'events.parquet')}')"
        )
        con.close()
        os.replace(tmp, dbpath)
        with open(done, "w") as fh:
            fh.write("ok")
    return dbpath


SQL_SHARDS = 8


def q_sql_loader_events(sf_dir: str):
    """JDBC-ingest analog: `ray.data.read_sql` with a per-task connection
    factory against the cached DuckDB file, sharded into EXPLICIT
    numPartitions/partitionColumn key-range queries (`WHERE event_id % N =
    i`, one read_sql per shard, unioned) so the read genuinely
    parallelizes — Ray's built-in shard_keys probe uses
    MOD(ABS(MD5(col))) which DuckDB cannot bind (md5 is VARCHAR-only), so
    it silently fell back to ONE task; the explicit shards are the same
    predicate a JDBC partitioned import issues.  Then the standard facet
    pipeline."""
    import duckdb
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    dbpath = _ensure_sql_db(sf_dir)

    def factory():
        return duckdb.connect(dbpath, read_only=True)

    shards = [
        rd.read_sql(
            f"SELECT event_type, value FROM events WHERE event_id % {SQL_SHARDS} = {i}",
            factory,
        )
        for i in range(SQL_SHARDS)
    ]
    ds = shards[0].union(*shards[1:])
    out = (
        ds.groupby("event_type")
        .aggregate(Count(), Sum("value"))
        .to_pandas()
        .rename(columns={"count()": "n", "sum(value)": "sum_value"})
    )
    out["n"] = out["n"].astype("int64")
    out["sum_value"] = out["sum_value"].round(4)
    return out.sort_values("event_type").reset_index(drop=True)


QUERIES["sql_loader_events"] = q_sql_loader_events
ORACLE["sql_loader_events"] = """
    SELECT event_type, count(*)::BIGINT AS n,
           round(sum(value), 4) AS sum_value
    FROM events GROUP BY event_type ORDER BY event_type
"""


def _ensure_xml_files(sf_dir: str, n_shards: int = 8) -> list[str]:
    """events.parquet -> Solr XML update format (`<add><doc><field
    name=...>` — the XMLLoader wire format), sharded for parallel read."""
    import pyarrow.parquet as pq
    from xml.sax.saxutils import escape

    d = _cache_dir(sf_dir)
    paths = [os.path.join(d, f"events-{i}.xml") for i in range(n_shards)]
    done = os.path.join(d, "_DONE_XML")
    if not os.path.exists(done):
        t = pq.read_table(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_id", "event_type", "user_id", "value"],
        ).to_pandas()
        tmp = f".tmp-{os.getpid()}"
        for i, p in enumerate(paths):
            part = t[t["event_id"] % n_shards == i]
            with open(p + tmp, "w") as fh:
                fh.write("<add>\n")
                for r in part.itertuples(index=False):
                    fh.write(
                        "<doc>"
                        f'<field name="event_id">{r.event_id}</field>'
                        f'<field name="event_type">{escape(r.event_type)}</field>'
                        f'<field name="user_id">{r.user_id}</field>'
                        # repr() round-trips float64 exactly
                        f'<field name="value">{r.value!r}</field>'
                        "</doc>\n"
                    )
                fh.write("</add>\n")
            os.replace(p + tmp, p)
        with open(done, "w") as fh:
            fh.write("ok")
    return paths


def q_xml_loader_events(sf_dir: str):
    """XMLLoader analog (`solr/core/src/java/org/apache/solr/handler/
    loader/XMLLoader.java` — the classic `<add><doc>` update format): the
    sharded XML files are read with `ray.data.read_binary_files` (one
    task per shard) and parsed with ElementTree inside map_batches, then
    the same Dataset-equivalence validation as the JSON/CSV loaders
    (count + avg per event_type; oracle runs on the parquet view)."""
    import xml.etree.ElementTree as ET

    import pyarrow as pa
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    paths = _ensure_xml_files(sf_dir)
    ds = rd.read_binary_files(paths)

    def parse(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for blob in batch["bytes"]:
            root = ET.fromstring(blob)
            for doc in root.iter("doc"):
                f = {
                    el.attrib["name"]: el.text
                    for el in doc.iter("field")
                }
                rows.append(
                    (f["event_type"], float(f["value"]))
                )
        return pd.DataFrame(rows, columns=["event_type", "value"])

    out = (
        ds.map_batches(parse, batch_format="pandas")
        .groupby("event_type")
        .aggregate(Count(alias_name="n"), Sum("value", alias_name="sv"))
        .to_pandas()
    )
    out["avg_value"] = (out["sv"] / out["n"]).round(6)
    out["n"] = out["n"].astype("int64")
    return out[["event_type", "n", "avg_value"]].sort_values(
        "event_type"
    ).reset_index(drop=True)


QUERIES["xml_loader_events"] = q_xml_loader_events
ORACLE["xml_loader_events"] = """
    SELECT event_type, count(*)::BIGINT AS n,
           round(avg(value), 6) AS avg_value
    FROM events GROUP BY event_type ORDER BY event_type
"""
