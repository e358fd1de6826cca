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


# ---------------------------------------------------------------------------
# Naive Bayes classification (the lucene/classification module)
# ---------------------------------------------------------------------------

NB_TEST_MOD = 5   # doc_id % 5 == 0 is the held-out set; the rest trains
NB_TOP = 3        # report the top-3 classes per test doc


def q_naive_bayes_classify_documents(sf_dir: str):
    """SimpleNaiveBayesClassifier (`lucene/classification/src/java/org/
    apache/lucene/classification/SimpleNaiveBayesClassifier.java`):
    multinomial naive Bayes whose statistics ARE the index's term stats —
    class priors from per-class doc counts, p(term|class) from per-class
    term frequencies with add-1 smoothing over the training vocabulary.
    Classes are the `source` field; test docs (doc_id % 5 == 0) get their
    top-3 classes by log posterior.

    Ray shape: ONE training pass emits per-batch (class, term) partial
    counts -> one groupby sum; the (vocab x classes) log-prob matrix is
    tiny by construction (it scales with vocabulary, not corpus) and
    broadcasts once.  Scoring is one pass: per-batch doc-term count
    matrices via a single searchsorted + bincount, then one matmul
    against the broadcast matrix.  Tokens outside the training
    vocabulary are dropped on both sides (the reference ignores terms
    with no index stats).  Scores round to 6dp before ranking (the
    repo's rounded-rank discipline: partial-sum order is not part of the
    contract)."""
    import ray

    from rindex.analysis import get_analyzer
    from rindex.ops.dedup import _token_hashes

    ds = read_table(sf_dir, "documents", ["doc_id", "text", "source"])

    def partial_counts(t: pa.Table) -> pa.Table:
        az = get_analyzer("standard")
        ids = t["doc_id"].to_numpy()
        train = ids % NB_TEST_MOD != 0
        srcs = t["source"].to_pylist()
        toks_per = [az.tokens(x or "") for x in t["text"].to_pylist()]
        cs, hs, tfs, docs = [], [], [], []
        for i in np.flatnonzero(train):
            th = _token_hashes(toks_per[i])
            u, c = np.unique(th, return_counts=True)
            hs.append(u)
            tfs.append(c)
            cs.extend([srcs[i]] * len(u))
            docs.append((srcs[i], 1))
        h = np.concatenate(hs) if hs else np.empty(0, np.int64)
        tf = np.concatenate(tfs) if tfs else np.empty(0, np.int64)
        tbl = pa.table(
            {
                "c": pa.array(cs, pa.string()),
                "h": pa.array(h),
                "tf": pa.array(tf),
            }
        )
        return tbl

    counts = (
        ds.map_batches(partial_counts, batch_format="pyarrow")
        .groupby(["c", "h"])
        .sum("tf")
        .to_pandas()
    )
    # priors come from per-class train-doc counts computed DISTRIBUTEDLY:
    # a per-batch partial count -> groupby sum whose result is n_sources
    # rows (never the corpus).  At 10^12 turns the old full-corpus
    # (doc_id, source) driver pull would have been terabytes.
    def prior_partials(t: pa.Table) -> pa.Table:
        ids_ = t["doc_id"].to_numpy()
        srcs_ = pa.table({"source": t["source"]}).filter(
            pa.array(ids_ % NB_TEST_MOD != 0)
        )
        import pyarrow.compute as pc

        vc = pc.value_counts(srcs_["source"].combine_chunks())
        return pa.table(
            {"source": vc.field("values"), "nd": vc.field("counts")}
        )

    nd_df = (
        read_table(sf_dir, "documents", ["doc_id", "source"])
        .map_batches(prior_partials, batch_format="pyarrow")
        .groupby("source")
        .sum("nd")
        .to_pandas()
    )
    nd_c = nd_df.set_index("source")["sum(nd)"]
    classes = sorted(nd_c.index)
    priors = np.log(nd_c.loc[classes].to_numpy(np.float64)
                    / float(nd_c.sum()))
    vocab = np.sort(counts["h"].unique())
    V = float(len(vocab))
    tf_mat = np.zeros((len(vocab), len(classes)), np.float64)
    ci = {c: j for j, c in enumerate(classes)}
    vi = np.searchsorted(vocab, counts["h"].to_numpy())
    tf_mat[vi, [ci[c] for c in counts["c"]]] = counts["sum(tf)"].to_numpy(
        np.float64
    )
    Tc = tf_mat.sum(axis=0)
    lp = np.log((tf_mat + 1.0) / (Tc + V))  # (V x C), identical SQL tree
    ref = ray.put((vocab, lp, np.asarray(classes, object), priors))

    def score(t: pa.Table) -> pa.Table:
        az = get_analyzer("standard")
        vocab_, lp_, classes_, priors_ = ray.get(ref)
        ids = t["doc_id"].to_numpy()
        test = ids % NB_TEST_MOD == 0
        out_doc, out_rank, out_cls, out_s = [], [], [], []
        toks_per = [az.tokens(x or "") for x in t["text"].to_pylist()]
        for i in np.flatnonzero(test):
            th = _token_hashes(toks_per[i])
            at = np.searchsorted(vocab_, th)
            ok = (at < len(vocab_)) & (
                vocab_[np.minimum(at, len(vocab_) - 1)] == th
            )
            if not ok.any():
                continue
            cnt = np.bincount(at[ok], minlength=len(vocab_)).astype(
                np.float64
            )
            s = np.round(priors_ + cnt @ lp_, 6)
            order = np.lexsort((classes_, -s))[:NB_TOP]
            for rank, j in enumerate(order):
                out_doc.append(ids[i])
                out_rank.append(rank)
                out_cls.append(classes_[j])
                out_s.append(s[j])
        return pa.table(
            {
                "doc_id": pa.array(np.asarray(out_doc, np.int64)),
                "rank": pa.array(np.asarray(out_rank, np.int32)),
                "class": pa.array(out_cls, pa.string()),
                "score": pa.array(np.asarray(out_s, np.float64)),
            }
        )

    res = ds.map_batches(score, batch_format="pyarrow").to_pandas()
    return res.sort_values(["doc_id", "rank"]).reset_index(drop=True)


QUERIES["naive_bayes_classify_documents"] = q_naive_bayes_classify_documents


def _nb_oracle_sql() -> str:
    from rindex.ops.fulltext import TOKEN_SQL_RE

    return f"""
    WITH toks AS (
      SELECT doc_id, source, doc_id % {NB_TEST_MOD} = 0 AS is_test,
             unnest(regexp_extract_all(lower(coalesce(text, '')),
                    '{TOKEN_SQL_RE}')) AS term
      FROM documents
    ),
    vocab AS (SELECT DISTINCT term FROM toks WHERE NOT is_test),
    vtot AS (SELECT count(*)::DOUBLE AS v FROM vocab),
    pri AS (
      SELECT source AS c,
             ln(count(DISTINCT doc_id)::DOUBLE
                / (SELECT count(DISTINCT doc_id) FROM toks WHERE NOT is_test))
               AS prior
      FROM toks WHERE NOT is_test GROUP BY 1
    ),
    tfc AS (
      SELECT source AS c, term, count(*)::DOUBLE AS tf
      FROM toks WHERE NOT is_test GROUP BY 1, 2
    ),
    tc AS (SELECT c, sum(tf) AS T FROM tfc GROUP BY 1),
    lp AS (
      SELECT v.term, tc.c,
             ln((coalesce(tfc.tf, 0) + 1.0) / (tc.T + vtot.v)) AS lp
      FROM vocab v
      CROSS JOIN tc
      CROSS JOIN vtot
      LEFT JOIN tfc ON tfc.term = v.term AND tfc.c = tc.c
    ),
    dt AS (
      SELECT doc_id, term, count(*)::DOUBLE AS tf
      FROM toks WHERE is_test GROUP BY 1, 2
    ),
    scores AS (
      SELECT dt.doc_id, lp.c,
             round(max(pri.prior) + sum(dt.tf * lp.lp), 6) AS s
      FROM dt
      JOIN lp USING (term)
      JOIN pri ON pri.c = lp.c
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT doc_id, c, s,
             (row_number() OVER (PARTITION BY doc_id
                                 ORDER BY s DESC, c ASC) - 1)::INTEGER
               AS rank
      FROM scores
    )
    SELECT doc_id, rank, c AS class, s AS score
    FROM ranked WHERE rank < {NB_TOP}
    ORDER BY doc_id, rank
    """


ORACLE["naive_bayes_classify_documents"] = _nb_oracle_sql()
