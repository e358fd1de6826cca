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
    from rindex.ops.dedup import _stable_hash64
    from rindex.ops.fulltext import documents_index
    from rindex.ops.util import dictionary_stats

    d = dictionary_stats(documents_index(sf_dir), ["ttf"])
    d = d.sort_values(["ttf", "term"], ascending=[False, True],
                      kind="mergesort").head(FEAT_V)
    vocab = d["term"].tolist()
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

    # featurize ONCE, iterate over the materialized numeric blocks —
    # TextLogitStream likewise trains over stored term vectors, never
    # re-analyzing text per iteration.  The featurized corpus is
    # (V+1) doubles + a label per doc (~0.5 KB/doc), object-store
    # resident; 50 gradient passes then touch no text at all.
    def featurize(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        X = _batch_features(texts, vh)
        y = np.fromiter(
            (POS_TERM in (x or "").split(" ") for x in texts),
            np.float64, count=len(texts),
        )
        return pa.table(
            {"x": pa.array(list(X)), "y": pa.array(y)}
        )

    feat = ds.map_batches(
        featurize, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    w = np.zeros(len(vh) + 1, np.float64)
    vel = np.zeros_like(w)
    losses = []
    for _ in range(TRAIN_ITERS):
        w_ref = ray.put(w)

        def grad_part(t: pa.Table) -> pa.Table:
            w_ = ray.get(w_ref)
            X = np.array(t["x"].to_pylist(), dtype=np.float64)
            y = t["y"].to_numpy(zero_copy_only=False)
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

        parts = feat.map_batches(
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


# ---------------------------------------------------------------------------
# features() — FeaturesSelectionStream (`solr/solrj/.../io/stream/
# FeaturesSelectionStream.java`): rank terms by INFORMATION GAIN against
# the training outcome (the reference scores per-term IG from document
# counts exactly like this).  Distributed shape: one corpus pass emits
# per-batch (term, pos-doc, neg-doc) partial counts deduped per doc, one
# vocabulary-sized groupby, and the IG algebra runs on that small result
# with the SAME expression tree as the SQL oracle (entropy in nats,
# 0·ln0 = 0), rounded before ranking.
# ---------------------------------------------------------------------------

FEATURES_TOP = 10
FEATURES_MIN_DF = 3


def _entropy(p: np.ndarray) -> np.ndarray:
    """Binary entropy in nats with the 0 ln 0 = 0 convention."""
    p = np.asarray(p, np.float64)
    out = np.zeros_like(p)
    for q in (p, 1.0 - p):
        nz = q > 0
        out[nz] -= q[nz] * np.log(q[nz])
    return out


def q_features_ig_documents(sf_dir: str):
    """Top-FEATURES_TOP terms by information gain for the outcome
    y = doc contains POS_TERM; (term, df, ig) rows."""
    import ray
    from ray.data.aggregate import Sum

    ds = read_table(sf_dir, "documents", ["doc_id", "text"])

    def partials(t: pa.Table) -> pa.Table:
        from rindex.analysis import get_analyzer

        az = get_analyzer("standard")
        texts = t["text"].to_pylist()
        doc_rows, term_rows, y_rows = [], [], []
        for i, x in enumerate(texts):
            toks = az.tokens(x or "")
            y = 1 if POS_TERM in (x or "").split(" ") else 0
            doc_rows.extend([i] * len(toks))
            term_rows.extend(toks)
            y_rows.extend([y] * len(toks))
        df = pd.DataFrame(
            {"d": doc_rows, "term": term_rows, "y": y_rows}
        ).drop_duplicates(["d", "term"])
        g = df.groupby("term", as_index=False).agg(
            n_pos=("y", "sum"), n_doc=("y", "size")
        )
        # global totals ride the SAME pass as a reserved row ("\t" can
        # never be a corpus token): n_doc accumulates batch row counts,
        # n_pos the batch's positive-label count — no extra corpus scans
        g = pd.concat(
            [g, pd.DataFrame(
                {"term": ["\tTOTALS"],
                 "n_pos": [int(sum(
                     1 for x in texts
                     if POS_TERM in (x or "").split(" ")))],
                 "n_doc": [len(texts)]}
            )],
            ignore_index=True,
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (
        ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("term")
        .aggregate(
            Sum("n_pos", alias_name="n11"),
            Sum("n_doc", alias_name="df"),
        )
        .to_pandas()
    )
    totals = agg[agg["term"] == "\tTOTALS"]
    n_total = int(totals["df"].iloc[0])
    pos_total = int(totals["n11"].iloc[0])
    agg = agg[agg["term"] != "\tTOTALS"]
    a = agg[agg["df"] >= FEATURES_MIN_DF].copy()
    n11 = a["n11"].to_numpy(np.float64)          # term & pos
    n1 = a["df"].to_numpy(np.float64)            # term
    N = float(n_total)
    P = float(pos_total)
    n01 = P - n11                                # pos w/o term
    n0 = N - n1                                  # docs w/o term
    h_y = _entropy(np.array([P / N]))[0]
    with np.errstate(invalid="ignore"):
        cond = (n1 / N) * _entropy(n11 / n1) + np.where(
            n0 > 0, (n0 / N) * _entropy(np.where(n0 > 0, n01 / np.maximum(n0, 1.0), 0.0)), 0.0
        )
    a["ig"] = np.round(h_y - cond, 6)
    a["df"] = a["df"].astype(np.int64)
    a = a.sort_values(["ig", "term"], ascending=[False, True],
                      kind="mergesort").head(FEATURES_TOP)
    return a[["term", "df", "ig"]].reset_index(drop=True)


QUERIES["features_ig_documents"] = q_features_ig_documents


def _features_ig_oracle() -> str:
    from rindex.ops.fulltext import TOKEN_SQL_RE

    # same expression tree: H in nats with 0 ln 0 = 0 via CASE
    H = ("(CASE WHEN {p} > 0 THEN -({p}) * ln({p}) ELSE 0 END"
         " + CASE WHEN 1.0 - ({p}) > 0 THEN -(1.0 - ({p})) * ln(1.0 - ({p}))"
         " ELSE 0 END)")
    return f"""
    WITH lab AS (
      SELECT doc_id,
             CASE WHEN list_contains(string_split(coalesce(text, ''), ' '),
                                     '{POS_TERM}') THEN 1 ELSE 0 END AS y
      FROM documents
    ),
    toks AS (
      SELECT doc_id,
             unnest(regexp_extract_all(lower(coalesce(text, '')),
                    '{TOKEN_SQL_RE}')) AS term
      FROM documents
    ),
    tdoc AS (SELECT DISTINCT doc_id, term FROM toks),
    st AS (
      SELECT (SELECT count(*) FROM documents)::DOUBLE AS N,
             (SELECT sum(y) FROM lab)::DOUBLE AS P
    ),
    per AS (
      SELECT term, count(*)::DOUBLE AS n1, sum(y)::DOUBLE AS n11
      FROM tdoc JOIN lab USING (doc_id)
      GROUP BY term
      HAVING count(*) >= {FEATURES_MIN_DF}
    ),
    scored AS (
      SELECT term, n1::BIGINT AS df,
             round(
               {H.format(p='P / N')}
               - ((n1 / N) * {H.format(p='n11 / n1')}
                  + CASE WHEN N - n1 > 0 THEN
                      ((N - n1) / N) * {H.format(p='(P - n11) / (N - n1)')}
                    ELSE 0 END),
               6) AS ig
      FROM per CROSS JOIN st
    )
    SELECT term, df, ig FROM scored
    ORDER BY ig DESC, term ASC
    LIMIT {FEATURES_TOP}
    """


ORACLE["features_ig_documents"] = _features_ig_oracle()
