"""Edge-case tests for the r4-continuation ops: aHash golden bits,
hard-negative near-dup exclusion, DBSCAN partition invariants."""

import numpy as np
import pandas as pd
import pyarrow as pa


def test_ahash_golden_bits():
    """PpmAHasher must reproduce a hand-computed aHash for a synthetic
    image built from the same deterministic pixel function."""
    from rindex.ops.multimodal import AHASH_SIDE, PpmAHasher, _img_params

    did = 42
    w, h, ar, ac, s, _fps, _dur = _img_params(did)
    r = np.arange(h)[:, None]
    c = np.arange(w)[None, :]
    img = np.stack(
        [(ar[k] * r + ac[k] * c + s[k]) % 256 for k in range(3)], axis=2
    ).astype(np.uint8)
    payload = b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()

    hasher = PpmAHasher()
    out = hasher(
        pd.DataFrame(
            {
                "doc_id": [did],
                "payload": [payload],
                "mime": ["image/x-portable-pixmap"],
            }
        )
    )
    # independent recompute: nearest-neighbor 4x4 grid of gray sums
    n = AHASH_SIDE
    rr = (np.arange(n) * h) // n
    cc = (np.arange(n) * w) // n
    gray = img[np.ix_(rr, cc)].astype(np.int64).sum(axis=2)
    bits = (gray.ravel() * (n * n) > gray.sum()).astype(np.int64)
    expect = int((bits << np.arange(n * n)).sum())
    assert out["ahash"].tolist() == [expect]


def test_ahash_skips_codec_mime():
    from rindex.ops.multimodal import PpmAHasher

    out = PpmAHasher()(
        pd.DataFrame(
            {"doc_id": [1], "payload": [b"\xff\xd8junk"], "mime": ["image/jpeg"]}
        )
    )
    assert len(out) == 0


def test_dbscan_partition_invariants(ray_session):
    """Clusters + noise partition the sample; every cluster id is a real
    core vec_id; counts are positive."""
    from rindex.ops.evaluators import DBS_N, q_eval_dbscan_embeddings

    out = q_eval_dbscan_embeddings("/root/testdata/sf0.001")
    assert (out["cluster_id"] >= -1).all()
    noise = out[out["cluster_id"] == -1]
    assert len(noise) == 1 and noise["n_core"].iloc[0] == 0
    clusters = out[out["cluster_id"] >= 0]
    assert (clusters["n_core"] > 0).all()
    total = int(out["n_core"].sum() + out["n_border"].sum())
    assert total == DBS_N
    # cluster label = min member core id, so it must be a valid vec_id
    assert (clusters["cluster_id"] < DBS_N).all()


def test_hard_negatives_excludes_near_dups(ray_session):
    """An anchor's exact duplicate conversation (cosine 1.0) must NOT be
    returned as a hard negative (near-dup cap)."""
    from rindex.ops.ann import HN_NEAR_CAP, q_conv_hard_negatives_embeddings

    out = q_conv_hard_negatives_embeddings("/root/testdata/sf0.001")
    assert (out["cosine"] < HN_NEAR_CAP).all()
    assert (out["anchor_conv"] != out["neg_conv"]).all()
    # top-k per anchor, ranks dense from 0
    for a, g in out.groupby("anchor_conv"):
        assert list(g["rank"]) == list(range(len(g)))
