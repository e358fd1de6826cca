"""Similarity search over the embeddings table.

Brute-force cosine top-k is the exact baseline (numpy matmul per batch
against a broadcast query matrix — `ray.put` once, read per actor); the
SRP-LSH bucketed variant is the approximate scale path (bucket by random
hyperplane signs -> search only matching buckets).  Reference anchor: the
reranking/top-k collector shapes of SURVEY.md §2.6; ANN itself is a
training-data-pipeline addition required by the build brief.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from rindex.ops.util import read_table

QUERIES: dict = {}
ORACLE: dict = {}

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
    definition so tie semantics cannot drift between variants."""
    if len(parts) == 0:
        return pd.DataFrame(
            columns=["query_id", "rank", "neighbor_id", "cosine"]
        )
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


def q_ann_srp_lsh_topk(sf_dir: str):
    """Approximate ANN: multi-table sign-random-projection LSH.  Each of
    L=8 independent tables buckets vectors by the sign pattern of k=8
    random hyperplanes; a query probes its own bucket plus all hamming-1
    neighbors in EVERY table and unions the candidates (OR over tables =
    the same amplification as MinHash banding).  At 0.3-0.4 cosine
    neighbors this scans ~20-25%% of vectors for ~0.6+ recall; scale path
    is the bucket id as a shuffle key.  Approximate -> no SQL oracle;
    recall asserted vs the exact op in pytest."""
    import ray

    rng = np.random.Generator(np.random.PCG64(77))
    qids, Q = _query_matrix(sf_dir)
    dim = Q.shape[1]
    planes = rng.standard_normal((N_TABLES, N_PLANES, dim))
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    pow2 = 1 << np.arange(N_PLANES)
    # per-table probe sets: own bucket + hamming-1 neighbors, as sorted arrays
    probe = np.empty((len(qids), N_TABLES, N_PLANES + 1), dtype=np.int64)
    for t in range(N_TABLES):
        qb = ((Qn @ planes[t].T > 0).astype(np.int64) * pow2).sum(axis=1)
        probe[:, t, 0] = qb
        for b in range(N_PLANES):
            probe[:, t, b + 1] = qb ^ (1 << b)
    probe.sort(axis=2)
    ref = ray.put((qids, Qn, planes, probe))

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        qids_, Qn_, planes_, probe_ = ray.get(ref)
        ids = batch["vec_id"].to_numpy()
        V = np.array(batch["embedding"].tolist(), dtype=np.float64)
        V /= np.linalg.norm(V, axis=1, keepdims=True)
        pw = 1 << np.arange(N_PLANES)
        buckets = np.stack(
            [((V @ planes_[t].T > 0).astype(np.int64) * pw).sum(axis=1)
             for t in range(N_TABLES)]
        )  # (L, n)
        rows = []
        for qi in range(len(qids_)):
            ok = np.zeros(len(ids), dtype=bool)
            for t in range(N_TABLES):
                ok |= np.isin(buckets[t], probe_[qi, t])
            ok &= ids != qids_[qi]
            if not ok.any():
                continue
            s = Qn_[qi] @ V[ok].T
            cid = ids[ok]
            sel = np.lexsort((cid, -s))[:TOP_K]
            for i in sel:
                rows.append((int(qids_[qi]), int(cid[i]), float(s[i])))
        return pd.DataFrame(rows, columns=["query_id", "neighbor_id", "cosine"])

    emb = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
    parts = emb.map_batches(partial, batch_format="pandas", batch_size=1024).to_pandas()
    return _merge_topk(parts)


QUERIES["ann_srp_lsh_topk"] = q_ann_srp_lsh_topk


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
    X = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    rng = np.random.Generator(np.random.PCG64(4242))
    C = X[rng.choice(len(X), size=IVF_K, replace=False)]
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


def q_ann_ivf_topk(sf_dir: str):
    """Approximate ANN, IVF (inverted-file) variant: vectors partition into
    IVF_K coarse-centroid lists; a query scans only its IVF_NPROBE nearest
    lists (~nprobe/k of the data).  The list id is the shuffle/partition
    key at scale — this is the Ray-native FAISS-IVF shape: assignment and
    scan are both map_batches, the quantizer is trained once and broadcast
    via ray.put.  Approximate -> no SQL oracle; recall vs the exact
    brute-force op asserted in pytest."""
    import ray

    qids, Q = _query_matrix(sf_dir)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    C = _ivf_centroids(sf_dir)
    # per-query probed lists
    probes = np.argsort(-(Qn @ C.T), axis=1)[:, :IVF_NPROBE]
    probes.sort(axis=1)
    ref = ray.put((qids, Qn, C, probes))

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        qids_, Qn_, C_, probes_ = ray.get(ref)
        ids = batch["vec_id"].to_numpy()
        V = np.array(batch["embedding"].tolist(), dtype=np.float64)
        V /= np.linalg.norm(V, axis=1, keepdims=True)
        assign = np.argmax(V @ C_.T, axis=1)
        rows = []
        for qi in range(len(qids_)):
            ok = np.isin(assign, probes_[qi]) & (ids != qids_[qi])
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

    emb = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
    parts = emb.map_batches(
        partial, batch_format="pandas", batch_size=1024
    ).to_pandas()
    return _merge_topk(parts)


QUERIES["ann_ivf_topk"] = q_ann_ivf_topk
