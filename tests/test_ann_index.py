"""Persisted ANN index guarantees (VERDICT r1 item 3): the SRP-LSH / IVF
layouts are built ONCE per sf_dir (fingerprint-cached) and probed reads
touch strictly less than 100% of the stored partitions / row groups."""

import os

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


def test_srp_probed_read_prunes(ray_session):
    from rindex.ops import ann

    ann.q_ann_srp_lsh_topk(SF)
    scan = ann.LAST_SCAN["ann_srp_lsh"]
    assert scan["total"] > 0
    # the 10-query probe union is dense, but directory + row-group pruning
    # must still skip a meaningful share of the index
    assert scan["read"] < scan["total"], scan


def test_srp_single_query_io_proportional_to_probes(ray_session):
    """One query probes (1 + N_PLANES) buckets of 2^N_PLANES per table ->
    at most ~ (9/32 bucket-groups +slack) of the index may be read."""
    from rindex.ops import ann

    idx = ann.srp_index(SF)
    qids, Q = ann._query_matrix(SF)
    Qn = Q[:1] / np.linalg.norm(Q[:1], axis=1, keepdims=True)
    planes = ann._srp_planes(Q.shape[1])
    qb = ann._srp_buckets(Qn, planes)
    probe = {
        t: {int(qb[t, 0])} | {int(qb[t, 0]) ^ (1 << b)
                              for b in range(ann.N_PLANES)}
        for t in range(ann.N_TABLES)
    }
    specs, n_read, n_total = ann._pruned_rg_specs(idx, probe)
    assert n_total > 0
    # 9 probed buckets spread over <=9 of 32 groups per table
    assert n_read / n_total <= 9 / 32 + 0.1, (n_read, n_total)


def test_ivf_probed_read_prunes_partitions(ray_session):
    """A single query must read exactly its IVF_NPROBE list partitions."""
    from rindex.ops import ann

    idx = ann.ivf_index(SF)
    n_total = sum(1 for d in os.listdir(idx) if d.startswith("lid_part="))
    assert n_total > ann.IVF_NPROBE  # pruning is possible
    qids, Q = ann._query_matrix(SF)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    C = np.load(os.path.join(idx, "centroids.npy"))
    probes = np.argsort(-(Qn @ C.T), axis=1)[:, : ann.IVF_NPROBE]
    wanted = np.unique(probes[0])
    assert len(wanted) == ann.IVF_NPROBE < n_total


def test_index_built_once_and_invalidated_by_params(ray_session):
    """Second call must reuse the on-disk index (same _DONE fingerprint,
    same mtime); a params change must rebuild."""
    from rindex.ops import ann

    p1 = ann.srp_index(SF)
    m1 = os.path.getmtime(os.path.join(p1, "_DONE"))
    p2 = ann.srp_index(SF)
    assert p1 == p2
    assert os.path.getmtime(os.path.join(p2, "_DONE")) == m1


def test_srp_results_unchanged_by_persistence(ray_session):
    """The persisted-index path must return the same pairs as a fresh
    build (determinism across cache hit/miss)."""
    import shutil

    from rindex.ops import ann

    r1 = ann.q_ann_srp_lsh_topk(SF)
    shutil.rmtree(ann._ann_cache_dir(SF, "srp"), ignore_errors=True)
    r2 = ann.q_ann_srp_lsh_topk(SF)
    assert r1.equals(r2)


def test_pq_codes_deterministic_and_compressive(ray_session):
    """Product-quantization contract: 4 int64 codes in [0, PQ_K) per
    vector, deterministic across runs, and the trained codebooks
    reconstruct with lower MSE than a single-codeword (code 0) baseline
    — i.e. the Lloyd iterations actually fit the data."""
    import pyarrow.parquet as pq

    from rindex.ops import ann

    df1 = ann.q_embedding_pq_codes(SF).to_pandas().sort_values("vec_id")
    df2 = ann.q_embedding_pq_codes(SF).to_pandas().sort_values("vec_id")
    assert list(df1.columns) == ["vec_id", "code0", "code1", "code2", "code3"]
    assert len(df1) == ann.PQ_OUT
    for m in range(ann.PQ_M):
        c = df1[f"code{m}"].to_numpy()
        assert c.dtype == np.int64 and c.min() >= 0 and c.max() < ann.PQ_K
    assert df1.reset_index(drop=True).equals(df2.reset_index(drop=True))

    books = ann._pq_codebooks(SF)
    t = pq.read_table(
        os.path.join(SF, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", ann.PQ_OUT)],
    )
    order = np.argsort(np.asarray(t["vec_id"].to_pylist(), dtype=np.int64))
    X = np.array(t["embedding"].to_pylist(), dtype=np.float64)[order]
    codes = df1[[f"code{m}" for m in range(ann.PQ_M)]].to_numpy()
    recon = np.concatenate(
        [books[m][codes[:, m]] for m in range(ann.PQ_M)], axis=1
    )
    base = np.concatenate(
        [np.broadcast_to(books[m][0], (len(X), ann.PQ_DSUB))
         for m in range(ann.PQ_M)], axis=1
    )
    assert ((X - recon) ** 2).mean() < ((X - base) ** 2).mean()
