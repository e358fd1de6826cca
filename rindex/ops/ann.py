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
    out = []
    for qid, g in parts.groupby("query_id"):
        g = g.sort_values(["cosine", "neighbor_id"], ascending=[False, True]).head(
            TOP_K
        )
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(len(g), dtype=np.int64)
        out.append(g)
    df = pd.concat(out, ignore_index=True)
    df["cosine"] = df["cosine"].round(6)
    return df[["query_id", "rank", "neighbor_id", "cosine"]]


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
                rows.append((int(qids_[qi]), int(cid[i]), round(float(s[i]), 6)))
        return pd.DataFrame(rows, columns=["query_id", "neighbor_id", "cosine"])

    emb = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
    parts = emb.map_batches(partial, batch_format="pandas", batch_size=1024).to_pandas()
    out = []
    for qid, g in parts.groupby("query_id"):
        g = g.sort_values(["cosine", "neighbor_id"], ascending=[False, True]).head(
            TOP_K
        )
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(len(g), dtype=np.int64)
        out.append(g)
    if not out:
        return pd.DataFrame(columns=["query_id", "rank", "neighbor_id", "cosine"])
    return pd.concat(out, ignore_index=True)[
        ["query_id", "rank", "neighbor_id", "cosine"]
    ]


QUERIES["ann_srp_lsh_topk"] = q_ann_srp_lsh_topk
