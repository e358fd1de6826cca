"""Similarity search over the embeddings table.

Brute-force cosine top-k is the exact baseline (numpy matmul per batch
against a broadcast query matrix — `ray.put` once, read per actor); the
SRP-LSH and IVF variants are the approximate scale paths and are backed by
a PERSISTED, PARTITIONED index built once per sf_dir under /tmp (same
fingerprint-lineage caching as the text index): IVF writes hive-partitioned
parquet keyed by coarse-centroid list id and queries read ONLY probed list
directories; SRP-LSH writes per-table bucket-sorted parquet with small row
groups and queries read ONLY the row groups whose bucket-stat range
intersects the probe set (parquet min/max pruning — the FAISS-IVF /
inverted-file shape, IO proportional to nprobe, not corpus size).
Reference anchor: the reranking/top-k collector shapes of SURVEY.md §2.6;
ANN itself is a training-data-pipeline addition required by the build
brief.
"""

from __future__ import annotations

import hashlib
import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa

from rindex.schema import join_partitions
from rindex.ops.util import read_table

QUERIES: dict = {}
ORACLE: dict = {}

# probe-IO telemetry of the most recent probed read, driver-visible for
# tests and ds.stats()-style inspection: {"read": n, "total": m} in units
# of row groups (SRP) / list partitions (IVF)
LAST_SCAN: dict = {}

N_QUERIES = 10  # vec_id 0..9 are the query vectors
TOP_K = 5


def _query_matrix(sf_dir: str):
    import pyarrow.parquet as pq
    import os

    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", N_QUERIES)],
    )
    ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
    Q = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    order = np.argsort(ids)
    return ids[order], Q[order]




def _merge_topk(parts: pd.DataFrame) -> pd.DataFrame:
    """Shared final reduce for all ANN variants: per query, sort UNROUNDED
    cosines (desc, neighbor asc tie-break), take TOP_K, round, rank — one
    definition so tie semantics cannot drift between variants.  Duplicate
    (query, neighbor) rows (a vector matching in several LSH tables) carry
    identical scores and collapse to one slot."""
    if len(parts) == 0:
        return pd.DataFrame(
            columns=["query_id", "rank", "neighbor_id", "cosine"]
        )
    parts = parts.drop_duplicates(subset=["query_id", "neighbor_id"])
    out = []
    for _qid, g in parts.groupby("query_id"):
        g = g.sort_values(
            ["cosine", "neighbor_id"], ascending=[False, True]
        ).head(TOP_K).reset_index(drop=True)
        g["rank"] = np.arange(len(g), dtype=np.int64)
        out.append(g)
    df = pd.concat(out, ignore_index=True)
    df["cosine"] = df["cosine"].round(6)
    return df[["query_id", "rank", "neighbor_id", "cosine"]]


# ---------------------------------------------------------------------------
# persisted index plumbing (shared by the SRP-LSH and IVF variants)

def _ann_cache_dir(sf_dir: str, kind: str) -> str:
    from rindex.ops.util import cache_dir

    return cache_dir(sf_dir, f"ann-{kind}")


def _emb_fingerprint(sf_dir: str, params: str) -> str:
    st = os.stat(os.path.join(sf_dir, "embeddings.parquet"))
    return hashlib.md5(
        f"{st.st_size}:{st.st_mtime_ns}:{params}".encode()
    ).hexdigest()[:16]


def _ensure_index(path: str, fingerprint: str, build_fn) -> str:
    """Fingerprint-gated build-once with FINGERPRINT-VERSIONED publish:
    the live directory name embeds the fingerprint, so a stale rebuild
    creates a NEW directory instead of rmtree-ing one that concurrent
    readers may be mid-scan in, and two concurrent builders race only on
    the final rename — the loser discards its tmp and adopts the winner's
    dir (rename onto an existing non-empty dir fails, which IS the
    detection).  Old generations linger under /tmp until regeneration
    churn cleans them — the manifest-swap discipline of segments.py."""
    final = f"{path}-{fingerprint}"
    done = os.path.join(final, "_DONE")
    if os.path.exists(done):
        return final
    tmp = f"{final}.tmp.{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    build_fn(tmp)
    with open(os.path.join(tmp, "_DONE"), "w") as fh:
        fh.write(fingerprint)
    try:
        os.rename(tmp, final)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
        if not os.path.exists(done):
            raise
    return final

def q_ann_cosine_topk(sf_dir: str):
    """Exact brute-force cosine top-k: per-batch matmul partial top-k,
    driver-side final merge (the per-partition-topk + reduce pattern of
    TopDocs#merge)."""
    import ray

    qids, Q = _query_matrix(sf_dir)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    ref = ray.put((qids, Qn))

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        qids_, Qn_ = ray.get(ref)
        ids = batch["vec_id"].to_numpy()
        V = np.array(batch["embedding"].tolist(), dtype=np.float64)
        V /= np.linalg.norm(V, axis=1, keepdims=True)
        S = Qn_ @ V.T  # (n_queries, batch)
        rows = []
        for qi in range(len(qids_)):
            s = S[qi]
            m = ids != qids_[qi]
            cand_ids, cand_s = ids[m], s[m]
            if len(cand_ids) > TOP_K:
                sel = np.lexsort((cand_ids, -cand_s))[:TOP_K]
                cand_ids, cand_s = cand_ids[sel], cand_s[sel]
            for i, sc in zip(cand_ids, cand_s):
                rows.append((int(qids_[qi]), int(i), float(sc)))
        return pd.DataFrame(rows, columns=["query_id", "neighbor_id", "cosine"])

    emb = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
    parts = emb.map_batches(partial, batch_format="pandas", batch_size=1024).to_pandas()
    return _merge_topk(parts)


QUERIES["ann_cosine_topk"] = q_ann_cosine_topk
ORACLE["ann_cosine_topk"] = f"""
    WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe
               FROM embeddings WHERE vec_id < {N_QUERIES}),
    scored AS (
      SELECT q.query_id, e.vec_id AS neighbor_id,
             list_cosine_similarity(q.qe, e.embedding::DOUBLE[]) AS s
      FROM q JOIN embeddings e ON e.vec_id <> q.query_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id, s,
             (row_number() OVER (PARTITION BY query_id
                                 ORDER BY s DESC, neighbor_id ASC) - 1)::BIGINT AS rank
      FROM scored
    )
    SELECT query_id, rank, neighbor_id, round(s, 6) AS cosine
    FROM ranked WHERE rank < {TOP_K}
"""


N_PLANES = 8  # bits per table -> 256 buckets/table
N_TABLES = 8  # independent hash tables (recall amplification, MinHash-band style)


SRP_SEED = 77
SRP_BG_SHIFT = 3  # bucket-group = bucket >> 3: 32 hive dirs per table


def _srp_planes(dim: int) -> np.ndarray:
    rng = np.random.Generator(np.random.PCG64(SRP_SEED))
    return rng.standard_normal((N_TABLES, N_PLANES, dim))


def _srp_buckets(V: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """(n, dim) -> (L, n) bucket ids: sign pattern of the k hyperplanes."""
    pw = 1 << np.arange(N_PLANES)
    return np.stack(
        [((V @ planes[t].T > 0).astype(np.int64) * pw).sum(axis=1)
         for t in range(N_TABLES)]
    )


def srp_index(sf_dir: str) -> str:
    """Build (once, fingerprint-cached) the persisted SRP-LSH layout:
    hive-partitioned by (hash table, bucket-group) — `pt=T/pg=G/` where
    G = bucket >> SRP_BG_SHIFT — so a probed read opens ONLY the
    directories whose bucket-group intersects the probe set (exact,
    FAISS-inverted-list-style partition pruning), with parquet row-group
    bucket stats pruning inside each directory on top.  The partitioned
    write is the build's one-time shuffle; queries never re-hash the
    corpus."""
    import pyarrow as pa

    path = _ann_cache_dir(sf_dir, "srp")
    fp = _emb_fingerprint(
        sf_dir, f"srp:{N_TABLES}:{N_PLANES}:{SRP_SEED}:{SRP_BG_SHIFT}"
    )

    def build(tmp: str) -> None:
        emb = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
        planes_cached: dict = {}

        def explode(t: pa.Table) -> pa.Table:
            V = np.array(t["embedding"].to_pylist(), dtype=np.float64)
            Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
            if "p" not in planes_cached:  # once per worker
                planes_cached["p"] = _srp_planes(V.shape[1])
            buckets = _srp_buckets(Vn, planes_cached["p"])  # (L, n)
            n = len(t)
            tt = np.repeat(np.arange(N_TABLES, dtype=np.int32), n)
            b = buckets.reshape(-1).astype(np.int32)
            return pa.table(
                {
                    "pt": pa.array(tt),
                    "pg": pa.array(b >> SRP_BG_SHIFT),
                    "tt": pa.array(tt),
                    "bucket": pa.array(b),
                    "vec_id": pa.concat_arrays(
                        [t["vec_id"].combine_chunks()] * N_TABLES
                    ),
                    "embedding": pa.concat_arrays(
                        [t["embedding"].combine_chunks()] * N_TABLES
                    ),
                }
            )

        # SORT BY BUCKET before the partitioned write: each output file is
        # a contiguous bucket range, so row-group min/max stats are tight
        # and _pruned_rg_specs actually prunes (corpus-order rows made
        # every row group span ~the whole bucket space)
        (
            emb.map_batches(explode, batch_format="pyarrow")
            .sort(["pt", "bucket"])
            .write_parquet(tmp, partition_cols=["pt", "pg"])
        )
        # row-group census once at build time — the per-query telemetry
        # read was a full-index footer sweep per query
        import json as _json

        import pyarrow.parquet as _pq

        n_total = 0
        for root, _dirs, files in os.walk(tmp):
            for f in files:
                if f.endswith(".parquet"):
                    n_total += _pq.ParquetFile(
                        os.path.join(root, f)
                    ).metadata.num_row_groups
        with open(os.path.join(tmp, "_RG_TOTAL"), "w") as fh:
            _json.dump({"rg_total": n_total}, fh)

    return _ensure_index(path, fp, build)


def _pruned_rg_specs(index_dir: str, wanted_by_part: dict):
    """Two-level probe pruning, driver-side (metadata only — the reads
    themselves are distributed tasks): open only hive dirs `pt=T/pg=G`
    whose bucket-group G contains a wanted bucket, then within each file
    keep only row groups whose bucket min/max stats intersect the wanted
    set.  Returns (specs, rg_read, rg_total); rg_total (row groups across
    ALL partitions) comes from the build-time census in _RG_TOTAL — a
    per-query full-index footer sweep just for telemetry was driver-side
    IO proportional to the INDEX, not the probe set."""
    import json as _json

    import pyarrow.parquet as pq

    with open(os.path.join(index_dir, "_RG_TOTAL")) as fh:
        n_total = int(_json.load(fh)["rg_total"])

    specs, n_read = [], 0
    for tdir in sorted(os.listdir(index_dir)):
        if not tdir.startswith("pt="):
            continue
        part = int(tdir.split("=")[1])
        wanted = np.asarray(
            sorted(wanted_by_part.get(part, ())), dtype=np.int64
        )
        for gdir in sorted(os.listdir(os.path.join(index_dir, tdir))):
            if not gdir.startswith("pg="):
                continue
            pdir = os.path.join(index_dir, tdir, gdir)
            g = int(gdir.split("=")[1])
            in_group = wanted[(wanted >> SRP_BG_SHIFT) == g]
            if len(in_group) == 0:
                continue  # whole directory pruned
            for fname in sorted(os.listdir(pdir)):
                if not fname.endswith(".parquet"):
                    continue
                fpath = os.path.join(pdir, fname)
                md = pq.ParquetFile(fpath).metadata
                col_idx = {
                    md.schema.column(i).name: i
                    for i in range(md.num_columns)
                }["bucket"]
                keep = []
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(col_idx).statistics
                    if st is None:
                        keep.append(rg)  # no stats: cannot prune, must read
                        continue
                    lo = np.searchsorted(in_group, st.min)
                    if lo < len(in_group) and in_group[lo] <= st.max:
                        keep.append(rg)
                n_read += len(keep)
                if keep:
                    specs.append({"file": fpath, "part": part, "rgs": keep})
    return specs, n_read, n_total


def q_ann_srp_lsh_topk(sf_dir: str):
    """Approximate ANN: multi-table sign-random-projection LSH over the
    PERSISTED bucket-sorted index.  Each of L=8 independent tables buckets
    vectors by the sign pattern of k=8 random hyperplanes; a query probes
    its own bucket plus all hamming-1 neighbors in EVERY table and unions
    the candidates (OR over tables = the same amplification as MinHash
    banding).  IO is proportional to the probe set: only row groups whose
    bucket-stat range intersects the probes are read (LAST_SCAN records
    read/total).  Deterministic given the seeded planes, so fully
    SQL-oracle-checked: the oracle re-derives buckets/probes/candidates
    from the same plane literals via list_dot_product (recall vs exact is
    additionally asserted in pytest)."""
    import ray
    import ray.data as rd

    qids, Q = _query_matrix(sf_dir)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    planes = _srp_planes(Q.shape[1])
    qb = _srp_buckets(Qn, planes)  # (L, nq)
    # per-table probe sets: own bucket + hamming-1 neighbors, sorted
    probe = np.empty((len(qids), N_TABLES, N_PLANES + 1), dtype=np.int64)
    for t in range(N_TABLES):
        probe[:, t, 0] = qb[t]
        for b in range(N_PLANES):
            probe[:, t, b + 1] = qb[t] ^ (1 << b)
    probe.sort(axis=2)

    idx = srp_index(sf_dir)
    wanted_by_part = {
        t: set(np.unique(probe[:, t, :]).tolist()) for t in range(N_TABLES)
    }
    specs, n_read, n_total = _pruned_rg_specs(idx, wanted_by_part)
    LAST_SCAN["ann_srp_lsh"] = {"read": n_read, "total": n_total}
    ref = ray.put((qids, Qn, probe))

    def scan(spec: pd.DataFrame) -> pd.DataFrame:
        import pyarrow.parquet as pq

        qids_, Qn_, probe_ = ray.get(ref)
        rows = []
        for file, part, rgs in zip(spec["file"], spec["part"], spec["rgs"]):
            t = pq.ParquetFile(file).read_row_groups(
                list(rgs), columns=["bucket", "vec_id", "embedding"]
            )
            buckets = t["bucket"].to_numpy().astype(np.int64)
            ids = t["vec_id"].to_numpy()
            V = np.array(t["embedding"].to_pylist(), dtype=np.float64)
            V /= np.linalg.norm(V, axis=1, keepdims=True)
            for qi in range(len(qids_)):
                ok = np.isin(buckets, probe_[qi, part]) & (ids != qids_[qi])
                if not ok.any():
                    continue
                s = Qn_[qi] @ V[ok].T
                cid = ids[ok]
                sel = np.lexsort((cid, -s))[:TOP_K]
                rows.append(
                    pd.DataFrame(
                        {
                            "query_id": np.full(len(sel), qids_[qi]),
                            "neighbor_id": cid[sel],
                            "cosine": s[sel],
                        }
                    )
                )
        if not rows:
            return pd.DataFrame(
                {"query_id": pd.Series(dtype=np.int64),
                 "neighbor_id": pd.Series(dtype=np.int64),
                 "cosine": pd.Series(dtype=np.float64)}
            )
        return pd.concat(rows, ignore_index=True)

    if not specs:
        return _merge_topk(pd.DataFrame())
    parts = (
        rd.from_items(specs)
        .map_batches(scan, batch_format="pandas", batch_size=1)
        .to_pandas()
    )
    return _merge_topk(parts)


QUERIES["ann_srp_lsh_topk"] = q_ann_srp_lsh_topk


def _srp_plane_values(dim: int = 64) -> str:
    """SQL VALUES rows `(tbl, bit, [plane floats])` for the seeded SRP
    planes.  repr() round-trips float64 exactly, so DuckDB's sign
    decisions match numpy's (sign of a dot product is scale-invariant,
    so the oracle can hash UNNORMALIZED embeddings)."""
    planes = _srp_planes(dim)
    rows = []
    for t in range(N_TABLES):
        for b in range(N_PLANES):
            vec = ",".join(repr(float(x)) for x in planes[t, b])
            rows.append(f"({t},{b},[{vec}])")
    return ",\n      ".join(rows)


# The oracle re-derives the ENTIRE approximate pipeline in SQL from the
# same seeded plane literals: bucket = sign-pattern integer per (vector,
# table); probe set = own bucket + all hamming-1 flips; candidates = union
# over tables of probed-bucket members; exact cosine top-k on candidates.
ORACLE["ann_srp_lsh_topk"] = f"""
    WITH planes(tbl, bit, vec) AS (VALUES
      {_srp_plane_values()}),
    emb AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    buckets AS (
      SELECT m.vec_id, p.tbl,
             sum(CASE WHEN list_dot_product(m.e, p.vec) > 0
                 THEN 1 << p.bit ELSE 0 END)::BIGINT AS bucket
      FROM emb m CROSS JOIN planes p
      GROUP BY 1, 2
    ),
    qb AS (SELECT vec_id AS query_id, tbl, bucket
           FROM buckets WHERE vec_id < {N_QUERIES}),
    bits(bit) AS (VALUES {",".join(f"({b})" for b in range(N_PLANES))}),
    probes AS (
      SELECT query_id, tbl, bucket FROM qb
      UNION
      SELECT query_id, tbl, xor(bucket, 1 << bit) FROM qb CROSS JOIN bits
    ),
    cands AS (
      SELECT DISTINCT p.query_id, b.vec_id AS neighbor_id
      FROM probes p
      JOIN buckets b ON b.tbl = p.tbl AND b.bucket = p.bucket
      WHERE b.vec_id <> p.query_id
    ),
    scored AS (
      SELECT c.query_id, c.neighbor_id,
             list_cosine_similarity(q.e, n.e) AS s
      FROM cands c
      JOIN emb q ON q.vec_id = c.query_id
      JOIN emb n ON n.vec_id = c.neighbor_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id, s,
             (row_number() OVER (PARTITION BY query_id
                                 ORDER BY s DESC, neighbor_id ASC)
              - 1)::BIGINT AS rank
      FROM scored
    )
    SELECT query_id, rank, neighbor_id, round(s, 6) AS cosine
    FROM ranked WHERE rank < {TOP_K}
"""


IVF_K = 16       # coarse centroids
IVF_NPROBE = 8   # probed lists per query (synthetic embeddings are
#   near-uniform — no cluster structure — so recall needs a wide probe)
IVF_TRAIN = 2048  # deterministic training sample: lowest vec_ids
IVF_ITERS = 10


def _ivf_centroids(sf_dir: str) -> np.ndarray:
    """Deterministic coarse quantizer: seeded Lloyd k-means on the lowest
    IVF_TRAIN vec_ids (spherical: centroids renormalized each step, so
    assignment = max dot product).  Train is driver-side on a bounded
    sample — at 10^12 scale the sample stays bounded and training cost is
    constant; only assignment scales with the data."""
    import os

    import pyarrow.parquet as pq

    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", IVF_TRAIN)],
    )
    order = np.argsort(np.asarray(t["vec_id"].to_pylist(), dtype=np.int64))
    X = np.array(t["embedding"].to_pylist(), dtype=np.float64)[order]
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    # init = the lowest IVF_K vec_ids: deterministic AND data-size-free,
    # so the DuckDB oracle can re-derive the whole quantizer (a seeded
    # random choice would depend on the table's row count)
    C = X[:IVF_K].copy()
    for _ in range(IVF_ITERS):
        assign = np.argmax(X @ C.T, axis=1)
        for k in range(IVF_K):
            m = assign == k
            if m.any():
                c = X[m].mean(axis=0)
                n = np.linalg.norm(c)
                if n > 0:
                    C[k] = c / n
    return C


def ivf_index(sf_dir: str) -> str:
    """Build (once, fingerprint-cached) the persisted IVF layout: vectors
    hive-partitioned by coarse-centroid list id (`lid=K/`), the FAISS
    inverted-file shape.  Assignment is a broadcast-quantizer map_batches;
    the partitioned write is the one-time shuffle.  `lid` is ALSO kept as
    a physical column so probed reads of individual partitions keep it."""
    import pyarrow as pa

    path = _ann_cache_dir(sf_dir, "ivf")
    fp = _emb_fingerprint(
        sf_dir, f"ivf:{IVF_K}:{IVF_TRAIN}:{IVF_ITERS}:init-low"
    )

    def build(tmp: str) -> None:
        import ray

        C = _ivf_centroids(sf_dir)
        cref = ray.put(C)

        def assign(t: pa.Table) -> pa.Table:
            C_ = ray.get(cref)
            V = np.array(t["embedding"].to_pylist(), dtype=np.float64)
            V /= np.linalg.norm(V, axis=1, keepdims=True)
            lid = np.argmax(V @ C_.T, axis=1).astype(np.int32)
            return pa.table(
                {
                    "lid": pa.array(lid),
                    "lid_part": pa.array(lid),
                    "vec_id": t["vec_id"],
                    "embedding": t["embedding"],
                }
            )

        emb = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
        emb.map_batches(assign, batch_format="pyarrow").write_parquet(
            tmp, partition_cols=["lid_part"]
        )
        np.save(os.path.join(tmp, "centroids.npy"), C)

    return _ensure_index(path, fp, build)


def q_ann_ivf_topk(sf_dir: str):
    """Approximate ANN, IVF (inverted-file) variant over the PERSISTED
    list-partitioned index: a query reads ONLY its IVF_NPROBE nearest list
    partitions (directory-level pruning; LAST_SCAN records read/total
    partitions) and scans them with a broadcast query matrix.  The
    quantizer is trained once on a bounded deterministic sample and stored
    with the index.  Approximate -> no SQL oracle; recall vs the exact
    brute-force op asserted in pytest."""
    import ray
    import ray.data as rd

    qids, Q = _query_matrix(sf_dir)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    idx = ivf_index(sf_dir)
    C = np.load(os.path.join(idx, "centroids.npy"))
    # per-query probed lists
    # stable sort: an exact centroid-score tie must probe the LOWER list
    # id, matching the oracle's (s DESC, cid ASC) row_number ordering
    probes = np.argsort(-(Qn @ C.T), axis=1, kind="stable")[:, :IVF_NPROBE]
    probes.sort(axis=1)
    wanted = np.unique(probes)
    paths = [
        os.path.join(p, f)
        for v in wanted.tolist()
        if os.path.isdir(p := os.path.join(idx, f"lid_part={v}"))
        for f in sorted(os.listdir(p)) if f.endswith(".parquet")
    ]
    n_read = sum(
        1 for v in wanted.tolist()
        if os.path.isdir(os.path.join(idx, f"lid_part={v}"))
    )
    n_total = sum(
        1 for d in os.listdir(idx) if d.startswith("lid_part=")
    )
    LAST_SCAN["ann_ivf"] = {"read": n_read, "total": n_total}
    ref = ray.put((qids, Qn, probes))

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        qids_, Qn_, probes_ = ray.get(ref)
        ids = batch["vec_id"].to_numpy()
        lid = batch["lid"].to_numpy()
        V = np.array(batch["embedding"].tolist(), dtype=np.float64)
        V /= np.linalg.norm(V, axis=1, keepdims=True)
        rows = []
        for qi in range(len(qids_)):
            ok = np.isin(lid, probes_[qi]) & (ids != qids_[qi])
            if not ok.any():
                continue
            s = Qn_[qi] @ V[ok].T
            cid = ids[ok]
            sel = np.lexsort((cid, -s))[:TOP_K]
            rows.append(
                pd.DataFrame(
                    {
                        "query_id": np.full(len(sel), qids_[qi]),
                        "neighbor_id": cid[sel],
                        "cosine": s[sel],
                    }
                )
            )
        if not rows:
            return pd.DataFrame(
                {"query_id": pd.Series(dtype=np.int64),
                 "neighbor_id": pd.Series(dtype=np.int64),
                 "cosine": pd.Series(dtype=np.float64)}
            )
        return pd.concat(rows, ignore_index=True)

    if not paths:
        return _merge_topk(pd.DataFrame())
    parts = (
        rd.read_parquet(paths, columns=["lid", "vec_id", "embedding"])
        .map_batches(partial, batch_format="pandas", batch_size=1024)
        .to_pandas()
    )
    return _merge_topk(parts)


QUERIES["ann_ivf_topk"] = q_ann_ivf_topk


def _ivf_kmeans_ctes() -> tuple[str, str]:
    """Shared SQL re-derivation of the IVF quantizer — TRAINING included:
    normalized long-form embeddings, init = lowest IVF_K vec_ids,
    IVF_ITERS unrolled Lloyd steps (assign by max dot, spherical mean
    renormalize, empty clusters carry the previous centroid), final list
    assignment of every vector.  Returns (with_body, final_centroid_cte):
    with_body defines emb/el/xl/c0..cN/lists; reused by the ANN-IVF oracle
    and the k-means clustering oracle so the two can never diverge."""
    it_ctes = []
    for n in range(IVF_ITERS):
        it_ctes.append(f"""
    d{n} AS MATERIALIZED (
      SELECT x.vec_id, c.cid, sum(x.v * c.cv) AS s
      FROM xl x JOIN c{n} c USING (i) GROUP BY 1, 2
    ),
    a{n} AS MATERIALIZED (
      SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY s DESC, cid ASC) AS rn
        FROM d{n}) WHERE rn = 1
    ),
    m{n} AS MATERIALIZED (
      SELECT a.cid, x.i, avg(x.v) AS mv
      FROM a{n} a JOIN xl x USING (vec_id) GROUP BY 1, 2
    ),
    nm{n} AS MATERIALIZED (SELECT cid, sqrt(sum(mv * mv)) AS nrm FROM m{n} GROUP BY 1),
    c{n + 1} AS MATERIALIZED (
      SELECT c.cid, c.i,
             CASE WHEN nm.nrm IS NULL OR nm.nrm <= 0 THEN c.cv
                  ELSE m.mv / nm.nrm END AS cv
      FROM c{n} c
      LEFT JOIN m{n} m ON m.cid = c.cid AND m.i = c.i
      LEFT JOIN nm{n} nm ON nm.cid = c.cid
    )""")
    final = f"c{IVF_ITERS}"
    body = f"""emb AS MATERIALIZED (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    el AS MATERIALIZED (  -- normalized long form of EVERY embedding
      SELECT vec_id, unnest(range(1, len(e) + 1)) AS i,
             unnest(e) / sqrt(list_dot_product(e, e)) AS v
      FROM emb
    ),
    xl AS MATERIALIZED (  -- training sample: the lowest {IVF_TRAIN} vec_ids
      SELECT * FROM el WHERE vec_id < {IVF_TRAIN}
    ),
    c0 AS MATERIALIZED (  -- init: the lowest {IVF_K} vec_ids, one cid per rank
      SELECT dense_rank() OVER (ORDER BY vec_id) - 1 AS cid, i, v AS cv
      FROM xl
      WHERE vec_id IN (SELECT vec_id FROM xl GROUP BY 1
                       ORDER BY vec_id LIMIT {IVF_K})
    ),{",".join(it_ctes)},
    lists AS MATERIALIZED (  -- final assignment of EVERY vector
      SELECT vec_id, cid AS lid FROM (
        SELECT e.vec_id, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY sum(e.v * c.cv) DESC, c.cid ASC)
                 AS rn
        FROM el e JOIN {final} c USING (i) GROUP BY e.vec_id, c.cid)
      WHERE rn = 1
    )"""
    return body, final


def _ivf_oracle_sql() -> str:
    """ANN-IVF oracle: the shared quantizer re-derivation + per-query
    NPROBE nearest lists + exact cosine top-k over probed candidates.
    Nothing engine-computed is embedded — independent end-to-end."""
    body, final = _ivf_kmeans_ctes()
    return f"""
    WITH {body},
    probes AS (  -- per query: the {IVF_NPROBE} nearest lists
      SELECT vec_id AS query_id, cid AS lid FROM (
        SELECT e.vec_id, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY sum(e.v * c.cv) DESC, c.cid ASC)
                 AS rn
        FROM el e JOIN {final} c USING (i)
        WHERE e.vec_id < {N_QUERIES} GROUP BY e.vec_id, c.cid)
      WHERE rn <= {IVF_NPROBE}
    ),
    cands AS (
      SELECT p.query_id, l.vec_id AS neighbor_id
      FROM probes p JOIN lists l USING (lid)
      WHERE l.vec_id <> p.query_id
    ),
    scored AS (
      SELECT c.query_id, c.neighbor_id,
             list_cosine_similarity(q.e, n.e) AS s
      FROM cands c
      JOIN emb q ON q.vec_id = c.query_id
      JOIN emb n ON n.vec_id = c.neighbor_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id, s,
             (row_number() OVER (PARTITION BY query_id
                                 ORDER BY s DESC, neighbor_id ASC)
              - 1)::BIGINT AS rank
      FROM scored
    )
    SELECT query_id, rank, neighbor_id, round(s, 6) AS cosine
    FROM ranked WHERE rank < {TOP_K}
"""


ORACLE["ann_ivf_topk"] = _ivf_oracle_sql()


# ---------------------------------------------------------------------------
# k-means clustering — the clustering stage of a training-data pipeline
# (and the Solr clustering-component analog), on the persisted IVF layout
# ---------------------------------------------------------------------------

def q_kmeans_clusters_embeddings(sf_dir: str):
    """Distributed k-means clustering summary: every vector's cluster comes
    from the persisted IVF quantizer (trained once on a bounded sample —
    constant cost at any corpus size; assignment was the one distributed
    pass that built the layout), and this op computes per-cluster size,
    mean cosine-to-centroid (cohesion) and the lowest member id (a
    deterministic exemplar).  Reference shape: the document-clustering
    component (`solr/contrib/clustering/src/java/org/apache/solr/handler/
    clustering/ClusteringComponent.java`) re-expressed as partition-local
    partials + one tiny groupby: the per-batch cosine is a vectorized
    row-wise dot with the broadcast centroid matrix, and the shuffle
    carries only (lid, count, sum_cos, min_id) partials."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Count, Min, Sum

    idx = ivf_index(sf_dir)
    C = np.load(os.path.join(idx, "centroids.npy"))
    cref = ray.put(C)
    paths = [
        os.path.join(p, f)
        for d in sorted(os.listdir(idx))
        if d.startswith("lid_part=")
        and os.path.isdir(p := os.path.join(idx, d))
        for f in sorted(os.listdir(p)) if f.endswith(".parquet")
    ]

    def partial(t):
        import pyarrow as pa

        C_ = ray.get(cref)
        lid = t["lid"].to_numpy()
        V = np.array(t["embedding"].to_pylist(), dtype=np.float64)
        V /= np.linalg.norm(V, axis=1, keepdims=True)
        cos = np.einsum("ij,ij->i", V, C_[lid])
        return pa.table(
            {"lid": pa.array(lid.astype(np.int64)),
             "cos": pa.array(cos),
             "vec_id": t["vec_id"]}
        )

    agg = (
        rd.read_parquet(paths, columns=["lid", "vec_id", "embedding"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("lid")
        .aggregate(
            Count(alias_name="n"),
            Sum("cos", alias_name="sum_cos"),
            Min("vec_id", alias_name="exemplar"),
        )
        .to_pandas()
    )
    agg["avg_cos"] = (agg["sum_cos"] / agg["n"]).round(6)
    agg["n"] = agg["n"].astype(np.int64)
    agg["exemplar"] = agg["exemplar"].astype(np.int64)
    return agg[["lid", "n", "avg_cos", "exemplar"]]


def _kmeans_oracle_sql() -> str:
    body, final = _ivf_kmeans_ctes()
    return f"""
    WITH {body},
    sims AS (
      SELECT l.vec_id, l.lid, sum(e.v * c.cv) AS cos
      FROM lists l
      JOIN el e USING (vec_id)
      JOIN {final} c ON c.cid = l.lid AND c.i = e.i
      GROUP BY 1, 2
    )
    SELECT lid::BIGINT AS lid, count(*)::BIGINT AS n,
           round(avg(cos), 6) AS avg_cos,
           min(vec_id)::BIGINT AS exemplar
    FROM sims GROUP BY 1
    """


QUERIES["kmeans_clusters_embeddings"] = q_kmeans_clusters_embeddings
ORACLE["kmeans_clusters_embeddings"] = _kmeans_oracle_sql()


# ---------------------------------------------------------------------------
# int8 scalar quantization (vector compression for the 100-TB embedding path)
# ---------------------------------------------------------------------------

Q_BITS_MAX = 127.0


def q_embedding_quantize_int8(sf_dir: str):
    """Per-vector symmetric int8 scalar quantization (the
    ScalarQuantizer shape of FAISS / Lucene 9 KnnVectorsFormat, applied
    per vector): scale = 127/max(|x|), code = floor(x*scale + 0.5)
    (explicit half-up — np.rint's half-to-even and SQL's round() disagree
    on exact .5 products).  One vectorized pass: per-vector max|x| and
    code sums via reduceat over the flattened list column, then a native
    integer groupby per label — integer outputs make the oracle compare
    exact end-to-end (no float accumulation order anywhere).  n_full is
    the count of codes hitting ±127 (>= 1 per non-zero vector by
    construction — the max element quantizes to full scale)."""
    from ray.data.aggregate import Count, Sum

    ds = read_table(sf_dir, "embeddings", ["vec_id", "embedding", "label"])

    def quant(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        lst = t["embedding"].combine_chunks()
        lens = pc.list_value_length(lst).to_numpy().astype(np.int64)
        flat = pc.list_flatten(lst).to_numpy().astype(np.float64)
        starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
        maxabs = np.maximum.reduceat(np.abs(flat), starts)
        scale = np.where(maxabs > 0, Q_BITS_MAX / np.where(maxabs > 0, maxabs, 1.0), 0.0)
        codes = np.floor(flat * np.repeat(scale, lens) + 0.5)
        sum_abs = np.add.reduceat(np.abs(codes), starts).astype(np.int64)
        full = np.add.reduceat(
            (np.abs(codes) == Q_BITS_MAX).astype(np.int64), starts
        )
        return pa.table(
            {
                "label": t["label"],
                "sum_abs_codes": pa.array(sum_abs),
                "n_full": pa.array(full),
            }
        )

    out = (
        ds.map_batches(quant, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("label")
        .aggregate(
            Count(alias_name="n_vecs"),
            Sum("sum_abs_codes", alias_name="sum_abs_codes"),
            Sum("n_full", alias_name="n_full"),
        )
        .to_pandas()
    )
    out["label"] = out["label"].astype("int64")
    return out.sort_values("label").reset_index(drop=True)


QUERIES["embedding_quantize_int8"] = q_embedding_quantize_int8
ORACLE["embedding_quantize_int8"] = """
    WITH el AS (
      SELECT vec_id, label,
             unnest(embedding)::DOUBLE AS x
      FROM embeddings
    ),
    scaled AS (
      SELECT vec_id, label, x,
             CASE WHEN max(abs(x)) OVER (PARTITION BY vec_id) > 0
                  THEN 127.0 / max(abs(x)) OVER (PARTITION BY vec_id)
                  ELSE 0.0 END AS scale
      FROM el
    ),
    codes AS (
      SELECT vec_id, label, floor(x * scale + 0.5) AS code FROM scaled
    ),
    per_vec AS (
      SELECT vec_id, max(label) AS label,
             sum(abs(code))::BIGINT AS sum_abs,
             sum(CASE WHEN abs(code) = 127 THEN 1 ELSE 0 END)::BIGINT AS n_full
      FROM codes GROUP BY vec_id
    )
    SELECT label, count(*) AS n_vecs,
           sum(sum_abs)::BIGINT AS sum_abs_codes,
           sum(n_full)::BIGINT AS n_full
    FROM per_vec
    GROUP BY label
    ORDER BY label
"""


# ---------------------------------------------------------------------------
# Hybrid retrieval: BM25 x embedding-cosine blend
# ---------------------------------------------------------------------------

HYBRID_QUERY = "hash join"
HYBRID_QVEC = 0       # the query's embedding = vec_id 0 (ANN convention)
HYBRID_W = 10.0       # cosine weight in the linear blend
HYBRID_K = 10


def q_hybrid_bm25_cosine_topk(sf_dir: str):
    """Hybrid lexical+dense retrieval (the RRF/linear-blend shape of
    modern search stacks; Lucene anchor: a RankQuery re-scoring the
    lexical match set): the DISTRIBUTED BM25 full match set
    (score_matches_dataset — per-segment scoring tasks, bit-identical to
    the exhaustive kernel) hash-joins the embeddings table on
    doc_id = vec_id, each batch blends score = bm25 + W * cosine(query
    vector) with the normalized query vector broadcast once, and only the
    blended top-k reaches the driver.  Rounded-rank discipline as usual."""
    import pyarrow as pa
    import ray

    from rindex.ops.fulltext import documents_index
    from rindex.search import IndexSearcher

    idx = documents_index(sf_dir)
    searcher = IndexSearcher(idx)
    bm = searcher.score_matches_dataset(HYBRID_QUERY, mode="or")

    qrow = (
        read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
        .filter(expr=f"vec_id == {HYBRID_QVEC}")
        .to_pandas()
    )
    qv = np.asarray(qrow["embedding"].iloc[0], dtype=np.float64)
    qn = ray.put(qv / np.linalg.norm(qv))

    # dense side: one vectorized cosine pass over the embedding scan
    # (scalar output — Ray's hash join cannot carry list<float> payload
    # columns, and shipping (id, float) pairs through the shuffle beats
    # shipping vectors anyway; the ANN-pruned variant of this stage is
    # the persisted IVF index above)
    def cos_batch(batch: pd.DataFrame) -> pd.DataFrame:
        qn_ = ray.get(qn)
        V = np.array(batch["embedding"].tolist(), dtype=np.float64)
        V /= np.linalg.norm(V, axis=1, keepdims=True)
        return pd.DataFrame(
            {"vec_id": batch["vec_id"].to_numpy(), "cos": V @ qn_}
        )

    emb = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
    cos_ds = emb.map_batches(cos_batch, batch_format="pandas",
                             batch_size=1024)
    joined = bm.join(
        cos_ds, "inner", num_partitions=join_partitions(),
        on=("doc_id",), right_on=("vec_id",),
    )

    def blend(batch: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy(),
                "score": batch["score"].to_numpy(np.float64)
                + HYBRID_W * batch["cos"].to_numpy(np.float64),
            }
        )
        # per-batch partial top-k: only candidates cross the driver
        if len(out) > HYBRID_K + 16:
            out = out.sort_values(
                ["score", "doc_id"], ascending=[False, True],
                kind="mergesort",
            ).head(HYBRID_K + 16)
        return out

    parts = joined.map_batches(blend, batch_format="pandas").to_pandas()
    parts["score"] = parts["score"].round(6)
    parts = (
        parts.sort_values(["score", "doc_id"], ascending=[False, True],
                          kind="mergesort")
        .head(HYBRID_K)
        .reset_index(drop=True)
    )
    parts["rank"] = np.arange(len(parts), dtype=np.int32)
    parts["doc_id"] = parts["doc_id"].astype(np.int64)
    return parts[["rank", "doc_id", "score"]]


QUERIES["hybrid_bm25_cosine_topk"] = q_hybrid_bm25_cosine_topk


def _hybrid_oracle_sql() -> str:
    from rindex.ops.fulltext import TOKEN_SQL_RE, norm_vals_sql
    from rindex.schema import B, K1

    terms = HYBRID_QUERY.split()
    tvals = ", ".join(f"'{t}'" for t in terms)
    return f"""
    WITH toks AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '{TOKEN_SQL_RE}')) AS term
      FROM documents
    ),
    tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM toks GROUP BY 1, 2),
    dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks GROUP BY 1),
    stats AS (
      SELECT (SELECT count(*) FROM documents)::DOUBLE AS n_docs,
             (SELECT sum(dl) FROM dl)::DOUBLE
               / (SELECT count(*) FROM documents) AS avgdl
    ),
    norm_table AS (SELECT unnest([{norm_vals_sql()}]) AS v),
    lossy AS (
      SELECT doc_id, (SELECT max(v) FROM norm_table WHERE v <= dl.dl)::DOUBLE AS ldl
      FROM dl
    ),
    df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
    bm AS (
      SELECT tf.doc_id,
             sum(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
                 * tf / (tf + {K1} * (1.0 - {B} + {B} * ldl / avgdl))) AS s
      FROM tf
      JOIN df USING (term)
      JOIN lossy USING (doc_id)
      CROSS JOIN stats
      WHERE term IN ({tvals})
      GROUP BY tf.doc_id
    ),
    q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings
          WHERE vec_id = {HYBRID_QVEC}),
    blended AS (
      SELECT bm.doc_id,
             bm.s + {HYBRID_W} * list_cosine_similarity(
               q.qe, e.embedding::DOUBLE[]) AS s
      FROM bm
      JOIN embeddings e ON e.vec_id = bm.doc_id
      CROSS JOIN q
      WHERE bm.s > 0
    ),
    ranked AS (
      SELECT doc_id, round(s, 6) AS s,
             (row_number() OVER (ORDER BY round(s, 6) DESC, doc_id ASC)
              - 1)::INTEGER AS rank
      FROM blended
    )
    SELECT rank, doc_id, s AS score FROM ranked WHERE rank < {HYBRID_K}
    """


ORACLE["hybrid_bm25_cosine_topk"] = _hybrid_oracle_sql()


# ---------------------------------------------------------------------------
# Product quantization (PQ) — vector compression for the 100-TB embedding
# path (FAISS IndexPQ shape; Lucene 9's vector quantization is the scalar
# variant already implemented above as embedding_quantize_int8)
# ---------------------------------------------------------------------------

PQ_M = 4        # subspaces
PQ_DSUB = 16    # dims per subspace (4 x 16 = 64)
PQ_K = 16       # codewords per subspace (4-bit codes)
PQ_TRAIN = 128  # training sample: the lowest vec_ids (bounded, id-keyed)
PQ_ITERS = 5    # unrolled Lloyd steps
PQ_OUT = 200    # vec_ids emitted by the op


def _pq_codebooks(sf_dir: str) -> np.ndarray:
    """Deterministic PQ training: per-subspace EUCLIDEAN Lloyd k-means on
    the lowest PQ_TRAIN vec_ids, init = the lowest PQ_K vectors' slices,
    empty clusters carry the previous codeword.  Same bounded-sample
    contract as the IVF coarse quantizer: training cost is constant in
    corpus size, only encoding scales."""
    import pyarrow.parquet as pq

    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", PQ_TRAIN)],
    )
    order = np.argsort(np.asarray(t["vec_id"].to_pylist(), dtype=np.int64))
    X = np.array(t["embedding"].to_pylist(), dtype=np.float64)[order]
    books = np.empty((PQ_M, PQ_K, PQ_DSUB), np.float64)
    for m in range(PQ_M):
        S = X[:, m * PQ_DSUB:(m + 1) * PQ_DSUB]
        C = S[:PQ_K].copy()
        for _ in range(PQ_ITERS):
            d2 = ((S[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)  # ties -> lowest cid, like SQL
            for k in range(PQ_K):
                sel = assign == k
                if sel.any():
                    C[k] = S[sel].mean(axis=0)
        books[m] = C
    return books


def q_embedding_pq_codes(sf_dir: str):
    """Product-quantization encoding: every embedding splits into PQ_M
    subvectors, each mapped to its nearest per-subspace codeword —
    64 floats become 4 4-bit codes (64x compression).  Training is the
    bounded deterministic sample; ENCODING is the distributed stage
    (codebooks broadcast once via ray.put, one argmin matmul per batch).
    Integer code outputs compare exact; the oracle re-derives the entire
    training with unrolled Lloyd CTEs keyed by (subspace, codeword)."""
    import ray

    books = _pq_codebooks(sf_dir)
    bref = ray.put(books)

    def encode(t: pa.Table) -> pa.Table:
        B = ray.get(bref)
        V = np.array(t["embedding"].to_pylist(), dtype=np.float64)
        cols = {"vec_id": t["vec_id"]}
        for m in range(PQ_M):
            S = V[:, m * PQ_DSUB:(m + 1) * PQ_DSUB]
            d2 = ((S[:, None, :] - B[m][None, :, :]) ** 2).sum(axis=2)
            cols[f"code{m}"] = pa.array(
                np.argmin(d2, axis=1).astype(np.int64)
            )
        return pa.table(cols)

    emb = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = emb.map_batches(encode, batch_format="pyarrow")
    return out.filter(expr=f"vec_id < {PQ_OUT}")


def _pq_oracle_sql() -> str:
    it = []
    for n in range(PQ_ITERS):
        it.append(f"""
    d{n} AS MATERIALIZED (
      SELECT x.vec_id, x.m, c.cid,
             sum((x.v - c.cv) * (x.v - c.cv)) AS d2
      FROM xt x JOIN c{n} c ON c.m = x.m AND c.j = x.j
      GROUP BY 1, 2, 3
    ),
    a{n} AS MATERIALIZED (
      SELECT vec_id, m, cid FROM (
        SELECT vec_id, m, cid,
               row_number() OVER (PARTITION BY vec_id, m
                                  ORDER BY d2 ASC, cid ASC) AS rn
        FROM d{n}) WHERE rn = 1
    ),
    m{n} AS MATERIALIZED (
      SELECT a.m, a.cid, x.j, avg(x.v) AS mv
      FROM a{n} a JOIN xt x ON x.vec_id = a.vec_id AND x.m = a.m
      GROUP BY 1, 2, 3
    ),
    c{n + 1} AS MATERIALIZED (
      SELECT c.m, c.cid, c.j, coalesce(m.mv, c.cv) AS cv
      FROM c{n} c
      LEFT JOIN m{n} m ON m.m = c.m AND m.cid = c.cid AND m.j = c.j
    )""")
    final = f"c{PQ_ITERS}"
    return f"""
    WITH emb AS MATERIALIZED (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    sub AS MATERIALIZED (  -- long form, keyed by (subspace m, local dim j)
      SELECT vec_id,
             (i - 1) // {PQ_DSUB} AS m, (i - 1) % {PQ_DSUB} AS j, v
      FROM (SELECT vec_id, unnest(range(1, len(e) + 1)) AS i,
                   unnest(e) AS v FROM emb)
    ),
    xt AS MATERIALIZED (SELECT * FROM sub WHERE vec_id < {PQ_TRAIN}),
    c0 AS MATERIALIZED (  -- init: the lowest PQ_K vectors' slices
      SELECT m, vec_id AS cid, j, v AS cv FROM xt WHERE vec_id < {PQ_K}
    ),{",".join(it)},
    codes AS (
      SELECT vec_id, m, cid FROM (
        SELECT s.vec_id, s.m, c.cid,
               row_number() OVER (PARTITION BY s.vec_id, s.m
                 ORDER BY sum((s.v - c.cv) * (s.v - c.cv)) ASC, c.cid ASC)
                 AS rn
        FROM sub s JOIN {final} c ON c.m = s.m AND c.j = s.j
        GROUP BY s.vec_id, s.m, c.cid)
      WHERE rn = 1
    )
    SELECT vec_id,
           max(CASE WHEN m = 0 THEN cid END)::BIGINT AS code0,
           max(CASE WHEN m = 1 THEN cid END)::BIGINT AS code1,
           max(CASE WHEN m = 2 THEN cid END)::BIGINT AS code2,
           max(CASE WHEN m = 3 THEN cid END)::BIGINT AS code3
    FROM codes WHERE vec_id < {PQ_OUT}
    GROUP BY vec_id ORDER BY vec_id
    """


QUERIES["embedding_pq_codes"] = q_embedding_pq_codes
ORACLE["embedding_pq_codes"] = _pq_oracle_sql()


# ---------------------------------------------------------------------------
# Reciprocal Rank Fusion — the rank-based hybrid combiner (Cormack et al.
# 2009; the shape Solr >=9 exposes as the "combiner" for hybrid search —
# anchor: the RankQuery SPI, `solr/core/src/java/org/apache/solr/search/
# RankQuery.java`).  Linear-blend hybrid above fuses SCORES; RRF fuses
# RANKS, so the two systems need no score calibration.
# ---------------------------------------------------------------------------

RRF_K = 60        # the standard RRF damping constant
RRF_POOL = 50     # per-system candidate pool (top-POOL each side)
RRF_TOPK = 10


def q_rrf_fusion_topk(sf_dir: str):
    """Reciprocal rank fusion of the BM25 ranking and the embedding-cosine
    ranking: each system contributes 1/(RRF_K + rank) for its top-RRF_POOL
    docs, fused score = sum of contributions (0 when absent from a pool).
    Both pools reduce DISTRIBUTED: per-batch partial top-POOL under the
    rounded-score total order (round 6, doc_id tiebreak), so only
    2*RRF_POOL scalar rows ever reach the driver; the fuse itself is an
    outer merge over those constant-size pools.  Rank discipline matches
    the oracle's row_number ordering exactly."""
    import ray

    from rindex.ops.fulltext import documents_index
    from rindex.search import IndexSearcher

    idx = documents_index(sf_dir)
    searcher = IndexSearcher(idx)
    bm = searcher.score_matches_dataset(HYBRID_QUERY, mode="or")

    def bm_part(batch: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy(np.int64),
                "s": batch["score"].to_numpy(np.float64).round(6),
            }
        )
        return out.sort_values(
            ["s", "doc_id"], ascending=[False, True], kind="mergesort"
        ).head(RRF_POOL)

    bm_pool = (
        bm.map_batches(bm_part, batch_format="pandas")
        .to_pandas()
        .sort_values(["s", "doc_id"], ascending=[False, True],
                     kind="mergesort")
        .head(RRF_POOL)
        .reset_index(drop=True)
    )
    bm_pool["r_bm"] = np.arange(1, len(bm_pool) + 1, dtype=np.int64)

    qrow = (
        read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
        .filter(expr=f"vec_id == {HYBRID_QVEC}")
        .to_pandas()
    )
    qv = np.asarray(qrow["embedding"].iloc[0], dtype=np.float64)
    qn = ray.put(qv / np.linalg.norm(qv))

    def cos_part(batch: pd.DataFrame) -> pd.DataFrame:
        qn_ = ray.get(qn)
        V = np.array(batch["embedding"].tolist(), dtype=np.float64)
        V /= np.linalg.norm(V, axis=1, keepdims=True)
        out = pd.DataFrame(
            {
                "vec_id": batch["vec_id"].to_numpy(np.int64),
                "c": (V @ qn_).round(6),
            }
        )
        return out.sort_values(
            ["c", "vec_id"], ascending=[False, True], kind="mergesort"
        ).head(RRF_POOL)

    cos_pool = (
        read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
        .map_batches(cos_part, batch_format="pandas", batch_size=1024)
        .to_pandas()
        .sort_values(["c", "vec_id"], ascending=[False, True],
                     kind="mergesort")
        .head(RRF_POOL)
        .reset_index(drop=True)
    )
    cos_pool["r_cos"] = np.arange(1, len(cos_pool) + 1, dtype=np.int64)

    m = bm_pool[["doc_id", "r_bm"]].merge(
        cos_pool[["vec_id", "r_cos"]],
        how="outer", left_on="doc_id", right_on="vec_id",
    )
    ids = m["doc_id"].fillna(m["vec_id"]).to_numpy(np.int64)
    c_bm = np.where(
        m["r_bm"].notna(), 1.0 / (RRF_K + m["r_bm"].fillna(0.0)), 0.0
    )
    c_cos = np.where(
        m["r_cos"].notna(), 1.0 / (RRF_K + m["r_cos"].fillna(0.0)), 0.0
    )
    out = pd.DataFrame(
        {"doc_id": ids, "rrf": np.round(c_bm + c_cos, 9)}
    )
    out = (
        out.sort_values(["rrf", "doc_id"], ascending=[False, True],
                        kind="mergesort")
        .head(RRF_TOPK)
        .reset_index(drop=True)
    )
    out.insert(0, "rank", np.arange(len(out), dtype=np.int64))
    return out


QUERIES["rrf_fusion_topk"] = q_rrf_fusion_topk


def _rrf_oracle_sql() -> str:
    from rindex.ops.fulltext import TOKEN_SQL_RE, norm_vals_sql
    from rindex.schema import B, K1

    terms = HYBRID_QUERY.split()
    tvals = ", ".join(f"'{t}'" for t in terms)
    return f"""
    WITH toks AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '{TOKEN_SQL_RE}')) AS term
      FROM documents
    ),
    tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM toks GROUP BY 1, 2),
    dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks GROUP BY 1),
    stats AS (
      SELECT (SELECT count(*) FROM documents)::DOUBLE AS n_docs,
             (SELECT sum(dl) FROM dl)::DOUBLE
               / (SELECT count(*) FROM documents) AS avgdl
    ),
    norm_table AS (SELECT unnest([{norm_vals_sql()}]) AS v),
    lossy AS (
      SELECT doc_id, (SELECT max(v) FROM norm_table WHERE v <= dl.dl)::DOUBLE AS ldl
      FROM dl
    ),
    df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
    bm AS (
      SELECT tf.doc_id,
             sum(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
                 * tf / (tf + {K1} * (1.0 - {B} + {B} * ldl / avgdl))) AS s
      FROM tf
      JOIN df USING (term)
      JOIN lossy USING (doc_id)
      CROSS JOIN stats
      WHERE term IN ({tvals})
      GROUP BY tf.doc_id
    ),
    bm_pool AS (
      SELECT doc_id, row_number() OVER (
               ORDER BY round(s, 6) DESC, doc_id ASC)::BIGINT AS r
      FROM bm WHERE s > 0
      QUALIFY r <= {RRF_POOL}
    ),
    q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings
          WHERE vec_id = {HYBRID_QVEC}),
    cos_pool AS (
      SELECT vec_id, row_number() OVER (
               ORDER BY round(c, 6) DESC, vec_id ASC)::BIGINT AS r
      FROM (SELECT e.vec_id,
                   list_cosine_similarity(q.qe, e.embedding::DOUBLE[]) AS c
            FROM embeddings e CROSS JOIN q)
      QUALIFY r <= {RRF_POOL}
    ),
    fused AS (
      SELECT coalesce(b.doc_id, c.vec_id) AS doc_id,
             round(coalesce(1.0 / ({RRF_K} + b.r), 0.0)
                   + coalesce(1.0 / ({RRF_K} + c.r), 0.0), 9) AS rrf
      FROM bm_pool b FULL OUTER JOIN cos_pool c ON c.vec_id = b.doc_id
    ),
    ranked AS (
      SELECT doc_id, rrf,
             (row_number() OVER (ORDER BY rrf DESC, doc_id ASC)
              - 1)::BIGINT AS rank
      FROM fused
    )
    SELECT rank, doc_id, rrf FROM ranked WHERE rank < {RRF_TOPK}
    """


ORACLE["rrf_fusion_topk"] = _rrf_oracle_sql()


# ---------------------------------------------------------------------------
# MMR diversity re-ranking (Carbonell & Goldstein 1998 — the diversity
# pass a retrieval-augmented training pipeline runs over a dense top-k;
# Solr anchor: the RankQuery re-scoring hook, `solr/core/src/java/org/
# apache/solr/search/RankQuery.java`)
# ---------------------------------------------------------------------------

MMR_LAMBDA = 0.5
MMR_POOL = 20
MMR_K = 5


def q_mmr_rerank_embeddings(sf_dir: str):
    """Maximal Marginal Relevance: the candidate pool is the distributed
    rounded-cosine top-MMR_POOL vs vec 0 (per-batch partial top-k, scalar
    rows only through the exchange), then the MMR selection loop runs
    driver-side over the POOL x POOL sim matrix (constant size by
    construction; pool vectors come back via ONE row-group-pruned
    filtered read).  score = LAMBDA*rel - (1-LAMBDA)*max_sim_to_selected,
    rel/sims rounded 6 BEFORE the objective so both sides derive
    identical doubles; ties to the lower vec_id."""
    import pyarrow.parquet as pq
    import ray

    qrow = (
        read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
        .filter(expr=f"vec_id == {HYBRID_QVEC}")
        .to_pandas()
    )
    qv = np.asarray(qrow["embedding"].iloc[0], dtype=np.float64)
    qn = ray.put(qv / np.linalg.norm(qv))

    def cos_part(batch: pd.DataFrame) -> pd.DataFrame:
        qn_ = ray.get(qn)
        V = np.array(batch["embedding"].tolist(), dtype=np.float64)
        V /= np.linalg.norm(V, axis=1, keepdims=True)
        out = pd.DataFrame(
            {
                "vec_id": batch["vec_id"].to_numpy(np.int64),
                "rel": (V @ qn_).round(6),
            }
        )
        return out.sort_values(
            ["rel", "vec_id"], ascending=[False, True], kind="mergesort"
        ).head(MMR_POOL)

    pool = (
        read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
        .map_batches(cos_part, batch_format="pandas", batch_size=1024)
        .to_pandas()
        .sort_values(["rel", "vec_id"], ascending=[False, True],
                     kind="mergesort")
        .head(MMR_POOL)
        .reset_index(drop=True)
    )

    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "in", pool["vec_id"].tolist())],
    ).to_pandas().set_index("vec_id").loc[pool["vec_id"]]
    V = np.array(t["embedding"].tolist(), dtype=np.float64)
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    sim = np.round(V @ V.T, 6)

    ids = pool["vec_id"].to_numpy(np.int64)
    rel = pool["rel"].to_numpy(np.float64)
    chosen: list[int] = []
    scores: list[float] = []
    remaining = np.ones(len(ids), dtype=bool)
    for _ in range(MMR_K):
        if chosen:
            max_sim = sim[:, chosen].max(axis=1)
        else:
            max_sim = np.zeros(len(ids))
        obj = MMR_LAMBDA * rel - (1.0 - MMR_LAMBDA) * max_sim
        obj[~remaining] = -np.inf
        # argmax with the lower-vec_id tiebreak (ids are pool-ordered by
        # (rel desc, vec_id asc), which is NOT vec_id order)
        best_val = obj[remaining].max()
        cand = np.flatnonzero(remaining & (obj == best_val))
        pick = cand[np.argmin(ids[cand])]
        chosen.append(pick)
        scores.append(float(obj[pick]))
        remaining[pick] = False
    return pd.DataFrame(
        {
            "rank": np.arange(MMR_K, dtype=np.int64),
            "vec_id": ids[chosen],
            "mmr": np.asarray(scores),
        }
    )


QUERIES["mmr_rerank_embeddings"] = q_mmr_rerank_embeddings


def _mmr_oracle_sql() -> str:
    lam, om = MMR_LAMBDA, 1.0 - MMR_LAMBDA
    rounds = []
    prev_union = "SELECT vec_id FROM sel0"
    for i in range(1, MMR_K):
        rounds.append(f"""
    sel{i} AS MATERIALIZED (
      SELECT vec_id, {i}::BIGINT AS rank, score AS mmr FROM (
        SELECT c.vec_id,
               {lam} * c.rel - {om} * max(s.s) AS score
        FROM pv c
        JOIN sim s ON s.ia = c.vec_id
                  AND s.ib IN ({prev_union})
        WHERE c.vec_id NOT IN ({prev_union})
        GROUP BY c.vec_id, c.rel)
      QUALIFY row_number() OVER (ORDER BY score DESC, vec_id ASC) = 1
    )""")
        prev_union += f" UNION ALL SELECT vec_id FROM sel{i}"
    sels = " UNION ALL ".join(
        f"SELECT rank, vec_id, mmr FROM sel{i}" for i in range(MMR_K)
    )
    return f"""
    WITH q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings
               WHERE vec_id = {HYBRID_QVEC}),
    rel AS MATERIALIZED (
      SELECT e.vec_id,
             round(list_cosine_similarity(q.qe, e.embedding::DOUBLE[]), 6)
               AS rel
      FROM embeddings e CROSS JOIN q
    ),
    pool AS MATERIALIZED (
      SELECT vec_id, rel FROM rel
      QUALIFY row_number() OVER (ORDER BY rel DESC, vec_id ASC)
        <= {MMR_POOL}
    ),
    pv AS MATERIALIZED (
      SELECT p.vec_id, p.rel, e.embedding::DOUBLE[] AS v
      FROM pool p JOIN embeddings e USING (vec_id)
    ),
    sim AS MATERIALIZED (
      SELECT a.vec_id AS ia, b.vec_id AS ib,
             round(list_cosine_similarity(a.v, b.v), 6) AS s
      FROM pv a JOIN pv b ON a.vec_id <> b.vec_id
    ),
    sel0 AS MATERIALIZED (
      SELECT vec_id, 0::BIGINT AS rank, {lam} * rel AS mmr FROM pv
      QUALIFY row_number() OVER (ORDER BY rel DESC, vec_id ASC) = 1
    ),{",".join(rounds)}
    SELECT rank, vec_id, mmr FROM ({sels}) ORDER BY rank
    """


ORACLE["mmr_rerank_embeddings"] = _mmr_oracle_sql()


# ---------------------------------------------------------------------------
# SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
# web-scale through semantic deduplication"): k-means-cluster the
# embedding space, then drop near-duplicate members WITHIN each cluster
# (cosine >= SEMDEDUP_TAU to an earlier-kept member; keep-lowest-id, the
# paper's "keep one representative per epsilon-ball" rule made
# deterministic).  Engine shape: cluster assignment comes FREE from the
# persisted IVF layout (the same partitioned artifact the ANN ops probe),
# the pairwise pass runs per cluster via groupby(lid).map_groups — the
# paper's exact computation; cluster sizes are bounded by construction
# (at 10^12 vectors you raise IVF_K so clusters stay ~|X|/K, which is the
# paper's knob too).  Only (vec_id, lid, dropped) rows leave the workers.
# ---------------------------------------------------------------------------

SEMDEDUP_TAU = 0.35


def q_semdedup_embeddings(sf_dir: str):
    """Per-vector SemDeDup verdict: (vec_id, lid, dropped) — dropped=1
    iff some same-cluster vector with a SMALLER vec_id has rounded
    cosine >= SEMDEDUP_TAU."""
    import ray.data as rd

    idx = ivf_index(sf_dir)
    paths = [
        os.path.join(p, f)
        for d in sorted(os.listdir(idx))
        if d.startswith("lid_part=")
        and os.path.isdir(p := os.path.join(idx, d))
        for f in sorted(os.listdir(p)) if f.endswith(".parquet")
    ]
    ds = rd.read_parquet(paths, columns=["vec_id", "lid", "embedding"])

    def dedup_cluster(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("vec_id").reset_index(drop=True)
        V = np.array(g["embedding"].tolist(), dtype=np.float64)
        V /= np.linalg.norm(V, axis=1, keepdims=True)
        cos = np.round(V @ V.T, 6)
        # dropped_i = any j < i with cos >= tau (keep-lowest-id; matches
        # the oracle's a.vec_id < b.vec_id pair rule)
        dom = np.tril(cos >= SEMDEDUP_TAU, k=-1).any(axis=1)
        return pd.DataFrame(
            {
                "vec_id": g["vec_id"].to_numpy(np.int64),
                "lid": g["lid"].to_numpy(np.int64),
                "dropped": dom.astype(np.int64),
            }
        )

    out = (
        ds.groupby("lid")
        .map_groups(dedup_cluster, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("vec_id").reset_index(drop=True)


QUERIES["semdedup_embeddings"] = q_semdedup_embeddings


def _semdedup_oracle_sql() -> str:
    body, final = _ivf_kmeans_ctes()
    return f"""
    WITH {body},
    pairs AS (
      SELECT a.vec_id AS va, b.vec_id AS vb,
             round(sum(ea.v * eb.v), 6) AS cos
      FROM lists a
      JOIN lists b ON a.lid = b.lid AND a.vec_id < b.vec_id
      JOIN el ea ON ea.vec_id = a.vec_id
      JOIN el eb ON eb.vec_id = b.vec_id AND eb.i = ea.i
      GROUP BY 1, 2
    ),
    dropped AS (
      SELECT DISTINCT vb AS vec_id FROM pairs WHERE cos >= {SEMDEDUP_TAU}
    )
    SELECT l.vec_id::BIGINT AS vec_id, l.lid::BIGINT AS lid,
           (CASE WHEN d.vec_id IS NULL THEN 0 ELSE 1 END)::BIGINT AS dropped
    FROM lists l LEFT JOIN dropped d USING (vec_id)
    ORDER BY l.vec_id
    """


ORACLE["semdedup_embeddings"] = _semdedup_oracle_sql()


# ---------------------------------------------------------------------------
# Filtered vector search — metadata-constrained top-k (the `{!knn}` +
# fq composition every vector store ships; Lucene 9's
# KnnFloatVectorQuery(acceptDocs) applies the filter DURING graph
# search the same way).  Pre-filtering semantics: the candidate set is
# restricted to label == FILTER_LABEL BEFORE ranking, so top-k is exact
# under the filter (post-filtering k results then dropping would
# under-fill).  Same partial-topk shape as the unfiltered op; the label
# column rides the pruned read, the mask is one vectorized compare per
# batch.
# ---------------------------------------------------------------------------

FILTER_LABEL = 3


def q_ann_filtered_topk(sf_dir: str):
    """Exact filtered cosine top-k: neighbors restricted to
    label == FILTER_LABEL (queries themselves are unrestricted)."""
    import ray

    qids, Q = _query_matrix(sf_dir)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    ref = ray.put((qids, Qn))

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        qids_, Qn_ = ray.get(ref)
        keep = batch["label"].to_numpy() == FILTER_LABEL
        batch = batch[keep]
        if not len(batch):
            return pd.DataFrame(
                columns=["query_id", "neighbor_id", "cosine"]
            ).astype({"query_id": np.int64, "neighbor_id": np.int64,
                      "cosine": np.float64})
        ids = batch["vec_id"].to_numpy()
        V = np.array(batch["embedding"].tolist(), dtype=np.float64)
        V /= np.linalg.norm(V, axis=1, keepdims=True)
        S = Qn_ @ V.T
        rows = []
        for qi in range(len(qids_)):
            s = S[qi]
            m = ids != qids_[qi]
            cand_ids, cand_s = ids[m], s[m]
            if len(cand_ids) > TOP_K:
                sel = np.lexsort((cand_ids, -cand_s))[:TOP_K]
                cand_ids, cand_s = cand_ids[sel], cand_s[sel]
            for i, sc in zip(cand_ids, cand_s):
                rows.append((int(qids_[qi]), int(i), float(sc)))
        return pd.DataFrame(rows, columns=["query_id", "neighbor_id", "cosine"])

    emb = read_table(sf_dir, "embeddings", ["vec_id", "embedding", "label"])
    parts = emb.map_batches(
        partial, batch_format="pandas", batch_size=1024
    ).to_pandas()
    return _merge_topk(parts)


QUERIES["ann_filtered_topk"] = q_ann_filtered_topk
ORACLE["ann_filtered_topk"] = f"""
    WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe
               FROM embeddings WHERE vec_id < {N_QUERIES}),
    scored AS (
      SELECT q.query_id, e.vec_id AS neighbor_id,
             list_cosine_similarity(q.qe, e.embedding::DOUBLE[]) AS s
      FROM q JOIN embeddings e
        ON e.vec_id <> q.query_id AND e.label = {FILTER_LABEL}
    ),
    ranked AS (
      SELECT query_id, neighbor_id, s,
             (row_number() OVER (PARTITION BY query_id
                                 ORDER BY s DESC, neighbor_id ASC) - 1)::BIGINT AS rank
      FROM scored
    )
    SELECT query_id, rank, neighbor_id, round(s, 6) AS cosine
    FROM ranked WHERE rank < {TOP_K}
"""


# ---------------------------------------------------------------------------
# Retrieval-quality metrics as a FIRST-CLASS op — recall@k and MRR of
# the SRP-LSH approximate index against the exact brute-force ranking
# (the evaluation loop every ANN deployment runs; Lucene's own
# KnnGraphTester reports the same two numbers).  Both rankings come
# from the registered pipelines above; the oracle re-derives BOTH in
# SQL (nested-WITH subqueries over the existing oracle texts) and joins
# them — so the metric itself is exact-checked, not just the inputs.
# ---------------------------------------------------------------------------

def q_ann_recall_mrr(sf_dir: str):
    """(query_id, recall, mrr): overlap@TOP_K and reciprocal rank of the
    true nearest neighbor within the SRP-LSH list."""
    ex = q_ann_cosine_topk(sf_dir)
    ap = q_ann_srp_lsh_topk(sf_dir)
    hit = ex.merge(ap, on=["query_id", "neighbor_id"], how="inner")
    n_hit = hit.groupby("query_id").size()
    top1 = ex[ex["rank"] == 0][["query_id", "neighbor_id"]]
    t1 = top1.merge(ap, on=["query_id", "neighbor_id"], how="left")
    mrr = (
        (1.0 / (t1["rank"] + 1.0))
        .fillna(0.0)
        .groupby(t1["query_id"])
        .max()
    )
    qids = sorted(ex["query_id"].unique())
    return pd.DataFrame(
        {
            "query_id": np.array(qids, np.int64),
            "recall": np.round(
                [n_hit.get(q, 0) / float(TOP_K) for q in qids], 6
            ),
            "mrr": np.round([float(mrr.get(q, 0.0)) for q in qids], 6),
        }
    )


QUERIES["ann_recall_mrr"] = q_ann_recall_mrr
ORACLE["ann_recall_mrr"] = f"""
    WITH ex AS ({ORACLE["ann_cosine_topk"]}),
    ap AS ({ORACLE["ann_srp_lsh_topk"]}),
    hits AS (
      SELECT e.query_id, count(*)::DOUBLE AS n_hit
      FROM ex e JOIN ap a
        ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
      GROUP BY 1
    ),
    top1 AS (SELECT query_id, neighbor_id FROM ex WHERE rank = 0),
    m AS (
      SELECT t.query_id,
             coalesce(max(1.0 / (a.rank + 1.0)), 0.0) AS mrr
      FROM top1 t
      LEFT JOIN ap a
        ON a.query_id = t.query_id AND a.neighbor_id = t.neighbor_id
      GROUP BY 1
    )
    SELECT q.query_id,
           round(coalesce(h.n_hit, 0.0) / {TOP_K}.0, 6) AS recall,
           round(m.mrr, 6) AS mrr
    FROM (SELECT DISTINCT query_id FROM ex) q
    LEFT JOIN hits h USING (query_id)
    JOIN m USING (query_id)
    ORDER BY q.query_id
"""


def q_ann_ndcg(sf_dir: str):
    """nDCG@TOP_K of the SRP-LSH ranking against the exact ranking
    (graded relevance rel = TOP_K - exact_rank for neighbors inside the
    exact top-k, 0 otherwise; DCG positions discounted log2(i+2)) — the
    third standard retrieval metric next to recall/MRR above, same
    oracle-checked composition."""
    ex = q_ann_cosine_topk(sf_dir)
    ap = q_ann_srp_lsh_topk(sf_dir)
    rel = ex[["query_id", "neighbor_id", "rank"]].rename(
        columns={"rank": "ex_rank"}
    )
    a = ap.merge(rel, on=["query_id", "neighbor_id"], how="left")
    a["rel"] = (TOP_K - a["ex_rank"]).fillna(0.0)
    a["gain"] = a["rel"] / np.log2(a["rank"].to_numpy(np.float64) + 2.0)
    dcg = a.groupby("query_id")["gain"].sum()
    idcg = float(
        sum((TOP_K - j) / np.log2(j + 2.0) for j in range(TOP_K))
    )
    qids = sorted(ex["query_id"].unique())
    return pd.DataFrame(
        {
            "query_id": np.array(qids, np.int64),
            "ndcg": np.round(
                [float(dcg.get(q, 0.0)) / idcg for q in qids], 6
            ),
        }
    )


QUERIES["ann_ndcg"] = q_ann_ndcg
ORACLE["ann_ndcg"] = f"""
    WITH ex AS ({ORACLE["ann_cosine_topk"]}),
    ap AS ({ORACLE["ann_srp_lsh_topk"]}),
    g AS (
      SELECT a.query_id,
             coalesce({TOP_K} - e.rank, 0.0) / log2(a.rank + 2.0) AS gain
      FROM ap a
      LEFT JOIN ex e
        ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
    ),
    idcg AS (
      SELECT sum(({TOP_K} - j) / log2(j + 2.0)) AS v
      FROM range({TOP_K}) t(j)
    )
    SELECT q.query_id,
           round(coalesce(sum(g.gain), 0.0) / idcg.v, 6) AS ndcg
    FROM (SELECT DISTINCT query_id FROM ex) q
    LEFT JOIN g USING (query_id)
    CROSS JOIN idcg
    GROUP BY q.query_id, idcg.v
    ORDER BY q.query_id
"""


# ---------------------------------------------------------------------------
# Search-result clustering (`solr/contrib/clustering/src/java/org/apache/
# solr/handler/clustering/ClusteringComponent.java` — the Carrot2 contract:
# cluster the TOP-K results of a query, not the corpus).  Here the cluster
# structure comes from the persisted IVF quantizer (the corpus-trained
# centroids), so clustering a result page is a 50-row lookup against the
# hive-partitioned layout — no per-query training, which is what makes the
# pattern serve at query time.
# ---------------------------------------------------------------------------

RC_QUERY = "window merge"
RC_TOPN = 50


def q_result_clustering_documents(sf_dir: str):
    """Cluster the top-50 BM25 results by their IVF list: per cluster the
    member count, the lowest-id exemplar and the best BM25 score.  The
    lid lookup reads ONLY (vec_id, lid) columns with the top-id set
    broadcast once — result-page-sized work end to end."""
    import ray
    import ray.data as rd

    from rindex.ops.fulltext import documents_index
    from rindex.search import IndexSearcher

    idx = documents_index(sf_dir)
    searcher = IndexSearcher(idx, algo="wand")
    hits = searcher.search(RC_QUERY, k=RC_TOPN, mode="or")
    top = pd.DataFrame(
        {
            "doc_id": np.array([h[1] for h in hits], np.int64),
            "s": np.array([h[2] for h in hits], np.float64),
        }
    )

    ivf = ivf_index(sf_dir)
    paths = [
        os.path.join(p, f)
        for d in sorted(os.listdir(ivf))
        if d.startswith("lid_part=")
        and os.path.isdir(p := os.path.join(ivf, d))
        for f in sorted(os.listdir(p)) if f.endswith(".parquet")
    ]
    idref = ray.put(top["doc_id"].to_numpy())

    def pick(t: pa.Table) -> pa.Table:
        import ray as _ray

        ids = _ray.get(idref)
        m = np.isin(t["vec_id"].to_numpy(), ids)
        return t.filter(pa.array(m))

    lid_df = (
        rd.read_parquet(paths, columns=["vec_id", "lid"])
        .map_batches(pick, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
    )
    merged = top.merge(lid_df, left_on="doc_id", right_on="vec_id")
    out = merged.groupby("lid", as_index=False).agg(
        n=("doc_id", "size"), exemplar=("doc_id", "min"), max_s=("s", "max")
    )
    out["lid"] = out["lid"].astype(np.int64)
    out["n"] = out["n"].astype(np.int64)
    out["exemplar"] = out["exemplar"].astype(np.int64)
    out["max_score"] = out["max_s"].round(6)
    return out[["lid", "n", "exemplar", "max_score"]]


def _result_clustering_oracle_sql() -> str:
    from rindex.ops.fulltext import _bm25_ctes
    from rindex.schema import B, K1

    body, _final = _ivf_kmeans_ctes()
    q_rows = ",".join(f"('{t}')" for t in RC_QUERY.split())
    return f"""
    WITH {_bm25_ctes()},
    {body},
    q(term) AS (VALUES {q_rows}),
    scores AS (
      SELECT tf.doc_id,
             sum(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
                 * tf / (tf + {K1} * (1.0 - {B} + {B} * ldl / avgdl))) AS s
      FROM q
      JOIN tf USING (term)
      JOIN df USING (term)
      JOIN lossy USING (doc_id)
      CROSS JOIN stats
      GROUP BY 1
    ),
    top AS (
      SELECT doc_id, s FROM (
        SELECT doc_id, s,
               row_number() OVER (ORDER BY s DESC, doc_id ASC) AS rn
        FROM scores) WHERE rn <= {RC_TOPN}
    )
    SELECT l.lid::BIGINT AS lid, count(*)::BIGINT AS n,
           min(t.doc_id)::BIGINT AS exemplar,
           round(max(t.s), 6) AS max_score
    FROM top t JOIN lists l ON l.vec_id = t.doc_id
    GROUP BY 1
    """


QUERIES["result_clustering_documents"] = q_result_clustering_documents
ORACLE["result_clustering_documents"] = _result_clustering_oracle_sql()


# ---------------------------------------------------------------------------
# centroid-outlier filter — embedding-space label-noise pruning: flag the
# vectors farthest from their OWN label's centroid (the quality-filter
# sibling of SemDeDup's epsilon-ball dedup).  Everything stays integer-
# exact: components quantize to floor(x*1000) (the repo's embedding fp
# discipline, cf. eval_distance_embeddings), the per-label centroid is
# carried as exact integer numerators (S_i, n), and the scaled distance
# sum_i (n*m_i - S_i)^2 is an int64 — no float accumulation order
# anywhere, so the oracle compares exact.  Two passes: one 64-column
# partial-sum groupby (centroids = n_labels x dim, broadcast once), one
# vectorized scoring scan + a 20-row sort/limit.
# ---------------------------------------------------------------------------

OUTLIER_TOPN = 20
_CENT_DIM = 64


def q_centroid_outliers_embeddings(sf_dir: str):
    import ray
    from ray.data.aggregate import Count, Sum

    emb = read_table(sf_dir, "embeddings", ["vec_id", "label", "embedding"])

    def quant(t: pa.Table) -> pa.Table:
        lab = t["label"].to_numpy(zero_copy_only=False)
        m = np.floor(
            np.stack(t["embedding"].to_pandas().to_numpy()).astype(np.float64)
            * 1000.0
        ).astype(np.int64)
        cols = {"label": lab}
        for i in range(m.shape[1]):
            cols[f"c{i}"] = m[:, i]
        return pa.table(cols)

    agg = (
        emb.map_batches(quant, batch_format="pyarrow")
        .groupby("label")
        .aggregate(
            Count(alias_name="n"),
            *[Sum(f"c{i}", alias_name=f"s{i}") for i in range(_CENT_DIM)],
        )
        .to_pandas()
    )
    cent = {
        int(r["label"]): (
            np.int64(r["n"]),
            r[[f"s{i}" for i in range(_CENT_DIM)]].to_numpy(np.int64),
        )
        for _, r in agg.iterrows()
    }
    cent_ref = ray.put(cent)

    def score(t: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        lab = t["label"].to_numpy(zero_copy_only=False)
        m = np.floor(
            np.stack(t["embedding"].to_pandas().to_numpy()).astype(np.float64)
            * 1000.0
        ).astype(np.int64)
        n = np.array([c[int(x)][0] for x in lab], np.int64)
        s = np.stack([c[int(x)][1] for x in lab])
        diff = n[:, None] * m - s
        d2 = np.sum(diff * diff, axis=1)
        return pa.table(
            {
                "vec_id": t["vec_id"],
                "label": pa.array(lab.astype(np.int64)),
                "d2_scaled": pa.array(d2, pa.int64()),
            }
        )

    return (
        emb.map_batches(score, batch_format="pyarrow")
        .sort(["d2_scaled", "vec_id"], descending=[True, False])
        .limit(OUTLIER_TOPN)
    )


QUERIES["centroid_outliers_embeddings"] = q_centroid_outliers_embeddings
ORACLE["centroid_outliers_embeddings"] = f"""
    WITH u AS (
      SELECT vec_id, label,
             generate_subscripts(embedding, 1) AS i,
             floor(unnest(embedding)::DOUBLE * 1000.0)::BIGINT AS m
      FROM embeddings
    ),
    c AS (
      SELECT label, i, sum(m)::BIGINT AS s, count(*)::BIGINT AS n
      FROM u GROUP BY label, i
    ),
    d AS (
      SELECT u.vec_id, u.label::BIGINT AS label,
             sum((c.n * u.m - c.s) * (c.n * u.m - c.s))::BIGINT AS d2_scaled
      FROM u JOIN c ON u.label = c.label AND u.i = c.i
      GROUP BY u.vec_id, u.label
    )
    SELECT vec_id, label, d2_scaled FROM d
    ORDER BY d2_scaled DESC, vec_id ASC LIMIT {OUTLIER_TOPN}
"""


# ---------------------------------------------------------------------------
# Conversation-level embedding pooling (mean-centroid per transcript)
# ---------------------------------------------------------------------------

CONV_POOL_TURNS = 5  # transcripts convention: conv_id = vec_id // 5


def q_conv_embedding_pool_embeddings(sf_dir: str):
    """Conversation-level mean-pooled embedding: turns' vectors grouped by
    the derived conv_id (vec_id // 5, the transcripts convention) and
    averaged — the retrieval-side pooling that turns per-turn vectors
    into one conversation vector (mean pooling; the fulltext analog is
    the conv_search max-pool op).  Exact integer contract: vectors are
    quantized floor(x*1000) and per-dim SUMS are reported scaled by the
    turn count's LCM-free integer form — output is n_vecs and
    sum-of-squared-dim-sums, both exact int64 on both sides.

    Scale shape: ONE map_batches quantize pass + one groupby-sum over 64
    int columns (partial+final combinable), rows out = n_conversations."""
    from ray.data.aggregate import Count, Sum

    emb = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])

    def quant(t: pa.Table) -> pa.Table:
        vid = t["vec_id"].to_numpy(zero_copy_only=False)
        m = np.floor(
            np.stack(t["embedding"].to_pandas().to_numpy()).astype(np.float64)
            * 1000.0
        ).astype(np.int64)
        cols = {"conv_id": vid // CONV_POOL_TURNS}
        for i in range(m.shape[1]):
            cols[f"c{i}"] = m[:, i]
        return pa.table(cols)

    agg = (
        emb.map_batches(quant, batch_format="pyarrow")
        .groupby("conv_id")
        .aggregate(
            Count(alias_name="n_vecs"),
            *[Sum(f"c{i}", alias_name=f"s{i}") for i in range(_CENT_DIM)],
        )
        .to_pandas()
    )
    s = agg[[f"s{i}" for i in range(_CENT_DIM)]].to_numpy(np.int64)
    out = pd.DataFrame(
        {
            "conv_id": agg["conv_id"].astype("int64"),
            "n_vecs": agg["n_vecs"].astype("int64"),
            "pool_sq_scaled": np.sum(s * s, axis=1),
        }
    )
    return out.sort_values("conv_id").reset_index(drop=True)


QUERIES["conv_embedding_pool_embeddings"] = q_conv_embedding_pool_embeddings
ORACLE["conv_embedding_pool_embeddings"] = f"""
    WITH u AS (
      SELECT vec_id, vec_id // {CONV_POOL_TURNS} AS conv_id,
             generate_subscripts(embedding, 1) AS i,
             floor(unnest(embedding)::DOUBLE * 1000.0)::BIGINT AS m
      FROM embeddings
    ),
    dim AS (
      SELECT conv_id, i, sum(m)::BIGINT AS s
      FROM u GROUP BY conv_id, i
    ),
    nv AS (
      SELECT conv_id, count(DISTINCT vec_id)::BIGINT AS n_vecs
      FROM u GROUP BY conv_id
    )
    SELECT d.conv_id, nv.n_vecs,
           sum(d.s * d.s)::BIGINT AS pool_sq_scaled
    FROM dim d JOIN nv USING (conv_id)
    GROUP BY d.conv_id, nv.n_vecs
    ORDER BY d.conv_id
"""


# ---------------------------------------------------------------------------
# Conversation hard-negative mining over pooled embeddings
# ---------------------------------------------------------------------------

HN_ANCHOR_MOD = 10      # anchors: conv_id % 10 == 0 ...
HN_ANCHOR_CAP = 1000    # ... and conv_id < 1000 (bounded broadcast side)
HN_NEAR_CAP = 0.95      # cos >= cap is a near-dup, not a negative
HN_K = 3


def q_conv_hard_negatives_embeddings(sf_dir: str):
    """Hard-negative mining for retrieval training: for each ANCHOR
    conversation, the top-{HN_K} most-similar other conversations by
    pooled-embedding cosine that are NOT near-duplicates (cos <
    {HN_NEAR_CAP}) — the contrastive-batch construction step (DPR,
    Karpukhin et al. 2020).  EXACT contract: dims quantize to
    floor(x*1000) ints, conversation pooling is the INTEGER dim-sum
    (cosine is scale-invariant so sum == mean), and every dot/norm
    partial sum stays integer-valued (< 2^53) — cosine is then
    bit-identical on both sides (exact int / correctly-rounded sqrt).

    Scale shape: one quantize pass, one conv groupby (64 int sums),
    anchors are a CAPPED broadcast side (conv_id % {HN_ANCHOR_MOD} == 0,
    < {HN_ANCHOR_CAP}); candidate scoring is one matmul per batch with
    per-batch per-anchor top-k partials — rows leaving a batch are
    <= anchors x {HN_K}, never the corpus."""
    from ray.data.aggregate import Sum

    emb = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])

    def quant(t: pa.Table) -> pa.Table:
        vid = t["vec_id"].to_numpy(zero_copy_only=False)
        m = np.floor(
            np.stack(t["embedding"].to_pandas().to_numpy()).astype(np.float64)
            * 1000.0
        ).astype(np.int64)
        cols = {"conv_id": vid // CONV_POOL_TURNS}
        for i in range(m.shape[1]):
            cols[f"c{i}"] = m[:, i]
        return pa.table(cols)

    pooled = (
        emb.map_batches(quant, batch_format="pyarrow")
        .groupby("conv_id")
        .aggregate(*[Sum(f"c{i}", alias_name=f"s{i}") for i in range(_CENT_DIM)])
    )
    scols = [f"s{i}" for i in range(_CENT_DIM)]

    # anchor side: BOUNDED pushed-down read (vec_id < cap*turns), pooled
    # on the driver — the big pooled pipeline above then runs exactly once
    anch_rows = (
        read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
        .filter(expr=f"vec_id < {HN_ANCHOR_CAP * CONV_POOL_TURNS}")
        .map_batches(quant, batch_format="pyarrow")
        .to_pandas()
    )
    anch_rows = anch_rows[
        anch_rows["conv_id"] % HN_ANCHOR_MOD == 0
    ]
    cq = [f"c{i}" for i in range(_CENT_DIM)]
    anchors = (
        anch_rows.groupby("conv_id", as_index=False)[cq]
        .sum()
        .sort_values("conv_id")
    )
    a_ids = anchors["conv_id"].to_numpy(np.int64)
    A = anchors[cq].to_numpy(np.float64)
    a_norm = np.sqrt(np.einsum("ij,ij->i", A, A))
    import ray as _ray

    a_ref = _ray.put((a_ids, A, a_norm))

    def score(t: pa.Table) -> pa.Table:
        ids_, A_, an_ = _ray.get(a_ref)
        conv = t["conv_id"].to_numpy()
        M = np.stack([t[c].to_numpy() for c in scols], axis=1).astype(
            np.float64
        )
        mn = np.sqrt(np.einsum("ij,ij->i", M, M))
        cos = (M @ A_.T) / (mn[:, None] * an_[None, :])
        out_a, out_n, out_c = [], [], []
        for j in range(len(ids_)):
            cj = cos[:, j]
            ok = (conv != ids_[j]) & (cj < HN_NEAR_CAP)
            idx = np.flatnonzero(ok)
            if not len(idx):
                continue
            top = idx[np.lexsort((conv[idx], -cj[idx]))[:HN_K]]
            out_a.extend([ids_[j]] * len(top))
            out_n.extend(conv[top].tolist())
            out_c.extend(cj[top].tolist())
        return pa.table(
            {
                "anchor_conv": pa.array(out_a, pa.int64()),
                "neg_conv": pa.array(out_n, pa.int64()),
                "cosine": pa.array(out_c, pa.float64()),
            }
        )

    part = pooled.map_batches(score, batch_format="pyarrow").to_pandas()
    part = part.sort_values(
        ["anchor_conv", "cosine", "neg_conv"],
        ascending=[True, False, True],
        kind="mergesort",
    )
    part["rank"] = part.groupby("anchor_conv").cumcount().astype(np.int32)
    part = part[part["rank"] < HN_K].reset_index(drop=True)
    part["cosine"] = part["cosine"].round(6)
    return part[["anchor_conv", "rank", "neg_conv", "cosine"]]


QUERIES["conv_hard_negatives_embeddings"] = q_conv_hard_negatives_embeddings
ORACLE["conv_hard_negatives_embeddings"] = f"""
    WITH u AS (
      SELECT vec_id // {CONV_POOL_TURNS} AS conv_id,
             generate_subscripts(embedding, 1) AS i,
             floor(unnest(embedding)::DOUBLE * 1000.0)::BIGINT AS m
      FROM embeddings
    ),
    dim AS (
      SELECT conv_id, i, sum(m)::DOUBLE AS s FROM u GROUP BY conv_id, i
    ),
    vecs AS (
      SELECT conv_id, list(s ORDER BY i) AS v FROM dim GROUP BY conv_id
    ),
    anch AS (
      SELECT conv_id AS a, v AS av FROM vecs
      WHERE conv_id % {HN_ANCHOR_MOD} = 0 AND conv_id < {HN_ANCHOR_CAP}
    ),
    scored AS (
      SELECT anch.a, vecs.conv_id AS neg,
             list_cosine_similarity(av, v) AS c
      FROM anch JOIN vecs ON vecs.conv_id <> anch.a
    ),
    ranked AS (
      SELECT a, neg, c,
             (row_number() OVER (PARTITION BY a
                                 ORDER BY c DESC, neg ASC) - 1) AS rank
      FROM scored WHERE c < {HN_NEAR_CAP}
    )
    SELECT a AS anchor_conv, rank::INTEGER AS rank, neg AS neg_conv,
           round(c, 6) AS cosine
    FROM ranked WHERE rank < {HN_K}
"""


# --- IVF + PQ with exact re-rank: the composed scale path -------------------

PQ_RERANK = 64  # ADC candidates per query fed to the exact re-rank


def q_ann_ivf_pq_topk(sf_dir: str):
    """IVF-PQ with asymmetric-distance candidate generation + exact
    re-rank — the COMPOSITION a billion-vector deployment runs (Jégou et
    al. 2011 IVFADC): probe the {IVF_NPROBE} nearest IVF lists
    (directory-pruned reads, same persisted index as ann_ivf), score
    probed vectors by the PQ lookup-table dot product (per batch: one
    argmin encode against the broadcast codebooks + one LUT gather —
    64 floats never leave the worker), keep the top {PQ_RERANK} ADC
    candidates per query, then re-rank ONLY those with exact cosines.
    Approximate -> recall vs brute force pinned in pytest (the ann_ivf
    discipline); the exact re-rank makes reported cosines exact, so any
    recall loss is candidate-generation only."""
    import ray
    import ray.data as rd

    qids, Q = _query_matrix(sf_dir)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    idx = ivf_index(sf_dir)
    C = np.load(os.path.join(idx, "centroids.npy"))
    probes = np.argsort(-(Qn @ C.T), axis=1, kind="stable")[:, :IVF_NPROBE]
    probes.sort(axis=1)
    wanted = np.unique(probes)
    paths = [
        os.path.join(p, f)
        for v in wanted.tolist()
        if os.path.isdir(p := os.path.join(idx, f"lid_part={v}"))
        for f in sorted(os.listdir(p)) if f.endswith(".parquet")
    ]
    books = _pq_codebooks(sf_dir)
    # per-query LUT: lut[q, m, j] = <Qn_sub(q,m), codeword(m,j)> — ADC
    # scores assemble by code gather, never touching raw vectors
    lut = np.einsum(
        "qmd,mjd->qmj",
        Qn.reshape(len(Qn), PQ_M, PQ_DSUB),
        books,
    )
    ref = ray.put((qids, probes, books, lut))

    def adc_partial(batch: pd.DataFrame) -> pd.DataFrame:
        qids_, probes_, B, lut_ = ray.get(ref)
        ids = batch["vec_id"].to_numpy()
        lid = batch["lid"].to_numpy()
        V = np.array(batch["embedding"].tolist(), dtype=np.float64)
        V /= np.linalg.norm(V, axis=1, keepdims=True)
        # encode once per batch (at real scale the lists STORE the codes;
        # encoding here keeps the synthetic index reusable across ops)
        codes = np.empty((len(V), PQ_M), dtype=np.int64)
        for m in range(PQ_M):
            S = V[:, m * PQ_DSUB:(m + 1) * PQ_DSUB]
            d2 = ((S[:, None, :] - B[m][None, :, :]) ** 2).sum(axis=2)
            codes[:, m] = np.argmin(d2, axis=1)
        rows = []
        for qi in range(len(qids_)):
            ok = np.isin(lid, probes_[qi]) & (ids != qids_[qi])
            if not ok.any():
                continue
            ck = codes[ok]
            adc = lut_[qi][np.arange(PQ_M)[None, :], ck].sum(axis=1)
            cid = ids[ok]
            sel = np.lexsort((cid, -adc))[:PQ_RERANK]
            rows.append(
                pd.DataFrame(
                    {
                        "query_id": np.full(len(sel), qids_[qi]),
                        "neighbor_id": cid[sel],
                        "adc": adc[sel],
                    }
                )
            )
        if not rows:
            return pd.DataFrame(
                {"query_id": pd.Series(dtype=np.int64),
                 "neighbor_id": pd.Series(dtype=np.int64),
                 "adc": pd.Series(dtype=np.float64)}
            )
        return pd.concat(rows, ignore_index=True)

    if not paths:
        return _merge_topk(pd.DataFrame())
    cand = (
        rd.read_parquet(paths, columns=["lid", "vec_id", "embedding"])
        .map_batches(adc_partial, batch_format="pandas", batch_size=1024)
        .to_pandas()
    )
    # global per-query ADC cut, then exact re-rank of the survivors only
    cand = (
        cand.sort_values(["query_id", "adc", "neighbor_id"],
                         ascending=[True, False, True], kind="mergesort")
        .groupby("query_id", sort=False)
        .head(PQ_RERANK)
    )
    need = np.unique(cand["neighbor_id"].to_numpy())
    emb = (
        read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
        .map_batches(
            lambda t, _n=ray.put(need): t.filter(
                pa.compute.is_in(t["vec_id"],
                                 value_set=pa.array(ray.get(_n)))
            ),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        .to_pandas()
    )
    V = np.array(emb["embedding"].tolist(), dtype=np.float64)
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    pos = {int(v): i for i, v in enumerate(emb["vec_id"].to_numpy())}
    qpos = {int(q): i for i, q in enumerate(qids)}
    nb = cand["neighbor_id"].to_numpy()
    qq = cand["query_id"].to_numpy()
    exact = np.einsum(
        "ij,ij->i",
        Qn[[qpos[int(q)] for q in qq]],
        V[[pos[int(n)] for n in nb]],
    )
    out = pd.DataFrame(
        {"query_id": qq, "neighbor_id": nb, "cosine": exact}
    )
    return _merge_topk(out)


QUERIES["ann_ivf_pq_topk"] = q_ann_ivf_pq_topk
