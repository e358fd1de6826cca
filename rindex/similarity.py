"""Pluggable similarity SPI (the Lucene `Similarity` strategy —
`lucene/core/src/java/org/apache/lucene/search/similarities/Similarity.java`,
with BM25Similarity.java as the default and ClassicSimilarity.java /
TFIDFSimilarity.java as the alternative).

Contract (what the WAND / impacts machinery relies on, as in Lucene's
`Similarity.SimScorer#score` javadoc): `score(w, tf, cv)` must be monotone
non-decreasing in tf and non-increasing in document length, where
`cv = norm_cache(avgdl)[norm_byte]` is the per-norm-byte precomputed
factor.  Under that contract the per-block upper bound used by block-max
WAND is exactly `score(w, block_max_tf, norm_cache[block_min_norm])`
(max tf, min dl), for EVERY similarity — the bound is recomputed from the
plugged formula, never hard-coded BM25.

BM25 keeps bit-identical results vs the pre-SPI kernels: the same float64
expression `(w * tf) / (tf + cv)` in the same operation order.
"""

from __future__ import annotations

import numpy as np

from rindex.bm25 import idf as bm25_idf
from rindex.bm25 import norm_len_cache
from rindex.codec import NORM_DECODE_TABLE


class BM25Similarity:
    """Lucene 8.x BM25 (LUCENE-8563 form, no (k1+1) numerator):
    w = ln(1 + (N-df+.5)/(df+.5)); score = w * tf / (tf + k1*(1-b+b*dl/avgdl))."""

    name = "bm25"

    def term_weight(self, df, n_docs) -> float:
        return bm25_idf(df, n_docs)

    def norm_cache(self, avgdl: float) -> np.ndarray:
        return norm_len_cache(avgdl)

    def score(self, w, tf, cv):
        return w * tf / (tf + cv)


class ClassicSimilarity:
    """Lucene ClassicSimilarity (TFIDFSimilarity with defaults, 8.x form —
    queryNorm removed): w = (1 + ln(N/(df+1)))^2  [idf appears squared:
    once in the query weight, once in the doc weight], score =
    w * sqrt(tf) / sqrt(dl) with the same lossy SmallFloat dl bytes as
    BM25.  avgdl is unused (interface uniformity)."""

    name = "classic"

    def term_weight(self, df, n_docs) -> float:
        i = 1.0 + np.log(np.float64(n_docs) / (np.asarray(df, np.float64) + 1.0))
        return i * i

    def norm_cache(self, avgdl: float) -> np.ndarray:
        # sqrt(dl), NOT its reciprocal: score() divides, in the same float64
        # operation order as the SQL oracle `... * w / sqrt(ldl)` — a
        # reciprocal-multiply differs by an ulp and flips genuine
        # mathematical ties like sqrt(4/32) == sqrt(5/40)
        dl = NORM_DECODE_TABLE.astype(np.float64)
        return np.sqrt(np.maximum(dl, 1.0))

    def score(self, w, tf, cv):
        return w * np.sqrt(tf) / cv


class LMDirichletSimilarity:
    """Lucene LMDirichletSimilarity (`lucene/core/src/java/org/apache/
    lucene/search/similarities/LMDirichletSimilarity.java`, mu=2000):
    per-term score = max(0, ln(1 + tf/(mu*p_c)) + ln(mu/(dl+mu))) with
    collection probability p_c = (ttf+1)/(collectionLength+2) (LMStats).
    Needs COLLECTION stats (ttf, total tokens), so it opts into the
    `needs_cstats` weight path; the doc-length part rides the norm cache
    (same lossy SmallFloat dl bytes as BM25).  Monotone ↑tf / ↓dl, and the
    max(0,·) clamp keeps every per-block bound valid, so WAND works
    unchanged.  NOTE: query-term boosts/multiplicity multiply the weight
    INSIDE the tf saturation here (the engine's uniform weight channel);
    Lucene scales the final score — identical for the unboosted queries
    the registered op uses."""

    name = "lmdirichlet"
    needs_cstats = True

    def __init__(self, mu: float = 2000.0):
        self.mu = float(mu)

    def term_weight_cstats(self, df, ttf, n_docs, collection_len) -> float:
        p_c = (np.asarray(ttf, np.float64) + 1.0) / (
            np.float64(collection_len) + 2.0
        )
        return 1.0 / (self.mu * p_c)

    def norm_cache(self, avgdl: float) -> np.ndarray:
        dl = NORM_DECODE_TABLE.astype(np.float64)
        return np.log(self.mu / (np.maximum(dl, 1.0) + self.mu))

    def score(self, w, tf, cv):
        return np.maximum(0.0, np.log1p(tf * w) + cv)


class LMJelinekMercerSimilarity:
    """Lucene LMJelinekMercerSimilarity (`lucene/core/src/java/org/apache/
    lucene/search/similarities/LMJelinekMercerSimilarity.java`, lambda=0.1
    — the value Lucene's javadoc recommends for short queries): per-term
    score = ln(1 + ((1-lambda)/lambda) * (tf/dl) / p_c) with the same
    LMStats collection probability p_c = (ttf+1)/(collectionLength+2) as
    LMDirichlet.  w = (1-lambda)/(lambda*p_c) rides the needs_cstats
    weight channel; the norm cache holds the lossy dl itself and score()
    divides by it (monotone ↑tf, ↓dl — WAND block bounds stay valid).
    Scores are strictly positive for every match (log1p of a positive),
    so no clamp is needed."""

    name = "lmjelinekmercer"
    needs_cstats = True

    def __init__(self, lam: float = 0.1):
        self.lam = float(lam)

    def term_weight_cstats(self, df, ttf, n_docs, collection_len) -> float:
        p_c = (np.asarray(ttf, np.float64) + 1.0) / (
            np.float64(collection_len) + 2.0
        )
        return (1.0 - self.lam) / (self.lam * p_c)

    def norm_cache(self, avgdl: float) -> np.ndarray:
        dl = NORM_DECODE_TABLE.astype(np.float64)
        return np.maximum(dl, 1.0)

    def score(self, w, tf, cv):
        return np.log1p(w * tf / cv)


class DFRSimilarity:
    """Lucene DFRSimilarity with basic model I(n), after-effect B and
    normalization H2 (`lucene/core/src/java/org/apache/lucene/search/
    similarities/{DFRSimilarity,BasicModelIn,AfterEffectB,
    NormalizationH2}.java`, c=1 — the In/B/H2 combination the Lucene
    javadoc uses as its worked example):

      tfn   = tf * log2(1 + c * avgdl / dl)          (H2)
      In    = log2((N + 1) / (df + 0.5))             (basic model I(n))
      score = ((F + 1) / (df * (tfn + 1))) * tfn*In  (after-effect B)

    with F = total term frequency (collection ttf), so it rides the
    needs_cstats weight channel like the LM similarities.  Channel split:
    w = ((F+1)/df) * In (per term), cv = log2(1 + avgdl/dl) (per norm
    byte), score = w * tfn/(tfn+1) with tfn = tf*cv.  Monotone ↑tf
    (tfn/(tfn+1) increases in tfn) and ↓dl (cv decreases in dl), and
    In > 0 for every df <= N, so scores are strictly positive and the
    recomputed WAND block bounds are valid with no clamp."""

    name = "dfr"
    needs_cstats = True

    def __init__(self, c: float = 1.0):
        self.c = float(c)

    def term_weight_cstats(self, df, ttf, n_docs, collection_len) -> float:
        dff = np.asarray(df, np.float64)
        i_n = np.log2((np.float64(n_docs) + 1.0) / (dff + 0.5))
        return (np.asarray(ttf, np.float64) + 1.0) / dff * i_n

    def norm_cache(self, avgdl: float) -> np.ndarray:
        dl = np.maximum(NORM_DECODE_TABLE.astype(np.float64), 1.0)
        return np.log2(1.0 + self.c * np.float64(avgdl) / dl)

    def score(self, w, tf, cv):
        tfn = tf * cv
        return w * tfn / (tfn + 1.0)


class DFRIneSimilarity:
    """Second DFR combination — basic model I(ne), after-effect B,
    normalization H1 (`lucene/core/src/java/org/apache/lucene/search/
    similarities/{BasicModelIne,AfterEffectB,NormalizationH1}.java`, c=1),
    closing the r3 DFR-breadth gap: the reference exposes the full basic
    model x after-effect x normalization grid and In/B/H2 alone pinned
    only one cell.

      ne    = N * (1 - ((N-1)/N)^F)                  (expected df)
      Ine   = log2((N + 1) / (ne + 0.5))             (basic model I(ne))
      tfn   = tf * c * avgdl / dl                    (H1 — LINEAR norm)
      score = ((F + 1) / (df * (tfn + 1))) * tfn*Ine (after-effect B)

    Channel split identical to DFRSimilarity: w = ((F+1)/df)*Ine rides
    needs_cstats, cv = c*avgdl/dl per norm byte, score = w*tfn/(tfn+1).
    Monotone ↑tf and ↓dl; ne < N so Ine > 0 — WAND bounds valid unclamped."""

    name = "dfr_ine"
    needs_cstats = True

    def __init__(self, c: float = 1.0):
        self.c = float(c)

    def term_weight_cstats(self, df, ttf, n_docs, collection_len) -> float:
        dff = np.asarray(df, np.float64)
        n = np.float64(n_docs)
        f = np.asarray(ttf, np.float64)
        ne = n * (1.0 - np.power((n - 1.0) / n, f))
        i_ne = np.log2((n + 1.0) / (ne + 0.5))
        return (f + 1.0) / dff * i_ne

    def norm_cache(self, avgdl: float) -> np.ndarray:
        dl = np.maximum(NORM_DECODE_TABLE.astype(np.float64), 1.0)
        return self.c * np.float64(avgdl) / dl

    def score(self, w, tf, cv):
        tfn = tf * cv
        return w * tfn / (tfn + 1.0)


class DFRIfSimilarity:
    """Third DFR combination — basic model I(F), after-effect B,
    normalization H2 (`lucene/core/src/java/org/apache/lucene/search/
    similarities/{BasicModelIF,AfterEffectB,NormalizationH2}.java`, c=1):
    identical shape to In/B/H2 but the information content comes from the
    TOTAL term frequency, log2(1 + (N+1)/(F+0.5)), instead of the
    docFreq — the third cell of the basic-model x after-effect x
    normalization grid.

      If    = log2(1 + (N + 1) / (F + 0.5))
      tfn   = tf * log2(1 + c * avgdl / dl)          (H2)
      score = ((F + 1) / (df * (tfn + 1))) * tfn*If  (after-effect B)

    Channel split identical to DFRSimilarity: w = ((F+1)/df)*If rides
    needs_cstats (score stays LINEAR in w, so query-term multiplicity
    composes), cv = log2(1 + avgdl/dl), score = w*tfn/(tfn+1).  The
    1+ inside the log keeps If > 0 for ANY F (stopword-class terms have
    F >> N); monotone ↑tf, ↓dl — unclamped WAND bounds stay valid."""

    name = "dfr_if"
    needs_cstats = True

    def __init__(self, c: float = 1.0):
        self.c = float(c)

    def term_weight_cstats(self, df, ttf, n_docs, collection_len) -> float:
        dff = np.asarray(df, np.float64)
        f = np.asarray(ttf, np.float64)
        i_f = np.log2(1.0 + (np.float64(n_docs) + 1.0) / (f + 0.5))
        return (f + 1.0) / dff * i_f

    def norm_cache(self, avgdl: float) -> np.ndarray:
        dl = np.maximum(NORM_DECODE_TABLE.astype(np.float64), 1.0)
        return np.log2(1.0 + self.c * np.float64(avgdl) / dl)

    def score(self, w, tf, cv):
        tfn = tf * cv
        return w * tfn / (tfn + 1.0)


class DFRGBSimilarity:
    """Fourth DFR combination — basic model G (geometric), after-effect B,
    normalization H2 (`lucene/core/src/java/org/apache/lucene/search/
    similarities/{BasicModelG,AfterEffectB,NormalizationH2}.java`, c=1),
    extending the basic-model grid beyond the tfn-proportional models
    (In/Ine/IF).  The geometric information content has a CONSTANT term:

      lam   = F / (N + F)                      (geometric prior)
      Inf1  = log2(1+lam) + tfn * log2((1+lam)/lam)
      tfn   = tf * log2(1 + c * avgdl / dl)    (H2)
      score = ((F+1) / (df * (tfn+1))) * Inf1  (after-effect B)

    Because Inf1 is affine (not proportional) in tfn, the weight channel
    is a 2-VECTOR w = ((F+1)/df) * (log2(1+lam), log2((1+lam)/lam)) and
    score = (w0 + w1*tfn)/(tfn+1) — still linear in w, so boosts/query
    multiplicity compose by scalar-multiplying the vector (_weight_val in
    rindex/search.py).  Monotone ↑tfn: d/dtfn = (w1 - w0)/(tfn+1)^2 and
    w1 - w0 = k*(-log2 lam) > 0 since lam < 1; monotone ↓dl via H2 — the
    recomputed WAND block bounds stay valid unclamped."""

    name = "dfr_gb"
    needs_cstats = True

    def __init__(self, c: float = 1.0):
        self.c = float(c)

    def term_weight_cstats(self, df, ttf, n_docs, collection_len):
        f = np.asarray(ttf, np.float64)
        n = np.float64(n_docs)
        lam = f / (n + f)
        k = (f + 1.0) / np.asarray(df, np.float64)
        return np.array(
            [k * np.log2(1.0 + lam), k * np.log2((1.0 + lam) / lam)]
        )

    def norm_cache(self, avgdl: float) -> np.ndarray:
        dl = np.maximum(NORM_DECODE_TABLE.astype(np.float64), 1.0)
        return np.log2(1.0 + self.c * np.float64(avgdl) / dl)

    def score(self, w, tf, cv):
        tfn = tf * cv
        return (w[0] + w[1] * tfn) / (tfn + 1.0)


class DFRGLSimilarity:
    """Fifth DFR combination — basic model G, after-effect L, normalization
    H1 (`.../similarities/{BasicModelG,AfterEffectL,NormalizationH1}.java`,
    c=1).  After-effect L is the Laplace gain 1/(tfn+1) with NO (F+1)/df
    factor, and H1 is the linear length normalization:

      tfn   = tf * c * avgdl / dl              (H1)
      score = (log2(1+lam) + tfn*log2((1+lam)/lam)) / (tfn + 1)

    Same 2-vector weight channel as G/B with k = 1; same monotonicity
    argument (w1 > w0 always), so WAND bounds hold unclamped."""

    name = "dfr_gl"
    needs_cstats = True

    def __init__(self, c: float = 1.0):
        self.c = float(c)

    def term_weight_cstats(self, df, ttf, n_docs, collection_len):
        f = np.asarray(ttf, np.float64)
        n = np.float64(n_docs)
        lam = f / (n + f)
        return np.array(
            [np.log2(1.0 + lam), np.log2((1.0 + lam) / lam)]
        )

    def norm_cache(self, avgdl: float) -> np.ndarray:
        dl = np.maximum(NORM_DECODE_TABLE.astype(np.float64), 1.0)
        return self.c * np.float64(avgdl) / dl

    def score(self, w, tf, cv):
        tfn = tf * cv
        return (w[0] + w[1] * tfn) / (tfn + 1.0)


class ExpressionSimilarity:
    """Similarity compiled from evaluator-expression strings — the Lucene
    expressions module's scoring use case (`lucene/expressions/src/java/
    org/apache/lucene/expressions/ExpressionRescorer.java` + the
    `expr(...)` similarity bindings) re-expressed over OUR expression
    engine (rindex/ops/evaluators.py parser + whole-array kernels) instead
    of a JS compiler.  Three expressions over named bindings:

      weight_expr over (df, n_docs)      -> per-term weight w
      norm_expr   over (dl, avgdl)       -> per-norm-byte cv (dl >= 1)
      score_expr  over (w, tf, cv)       -> per-term, per-doc score

    The WAND contract (monotone ↑tf, ↓dl) is the expression AUTHOR's
    responsibility, exactly as with Lucene expression bindings; the
    block bounds are then recomputed from the compiled expressions like
    every other similarity."""

    needs_cstats = False

    def __init__(self, weight_expr: str, norm_expr: str, score_expr: str,
                 name: str = "expr"):
        from rindex.ops.evaluators import parse_expr

        self.name = name
        self._w = parse_expr(weight_expr)
        self._n = parse_expr(norm_expr)
        self._s = parse_expr(score_expr)

    def _eval(self, ast, cols):
        from rindex.ops.evaluators import eval_node

        return eval_node(ast, cols)

    def term_weight(self, df, n_docs):
        out = self._eval(
            self._w,
            {"df": np.asarray(df, np.float64),
             "n_docs": np.float64(n_docs)},
        )
        return float(out) if np.ndim(out) == 0 else np.asarray(out, np.float64)

    def norm_cache(self, avgdl: float) -> np.ndarray:
        dl = np.maximum(NORM_DECODE_TABLE.astype(np.float64), 1.0)
        return np.asarray(
            self._eval(self._n, {"dl": dl, "avgdl": np.float64(avgdl)}),
            np.float64,
        )

    def score(self, w, tf, cv):
        return self._eval(self._s, {"w": w, "tf": tf, "cv": cv})


class SweetSpotSimilarity:
    """SweetSpotSimilarity (`lucene/misc/src/java/org/apache/lucene/misc/
    SweetSpotSimilarity.java`): ClassicSimilarity with the plateau length
    norm lengthNorm(dl) = 1/sqrt(steepness*(|dl-min|+|dl-max|-(max-min))+1)
    — documents inside [min, max] tokens pay NO length penalty.

    Configured with min=1 so the norm is flat up to max and then strictly
    decreasing: the WAND contract (score non-increasing in dl) requires a
    MONOTONE norm, and a min>1 plateau penalizes short docs too, which
    would invalidate the block bound taken at block_min_norm.  The cache
    stores the DENOMINATOR sqrt(...) and score() divides — same
    op-order-vs-oracle discipline as ClassicSimilarity."""

    name = "sweetspot"
    MIN, MAX, STEEP = 1.0, 40.0, 0.5

    def term_weight(self, df, n_docs) -> float:
        i = 1.0 + np.log(np.float64(n_docs) / (np.asarray(df, np.float64) + 1.0))
        return i * i

    def norm_cache(self, avgdl: float) -> np.ndarray:
        dl = np.maximum(NORM_DECODE_TABLE.astype(np.float64), 1.0)
        return np.sqrt(
            self.STEEP
            * (np.abs(dl - self.MIN) + np.abs(dl - self.MAX)
               - (self.MAX - self.MIN))
            + 1.0
        )

    def score(self, w, tf, cv):
        return w * np.sqrt(tf) / cv


class BooleanSimilarity:
    """Lucene BooleanSimilarity (`lucene/core/src/java/org/apache/lucene/
    search/similarities/BooleanSimilarity.java`): every matching term
    contributes exactly its query boost — no tf, no idf, no length norm.
    A disjunction's score is therefore the matched-term count (x boost).
    Constant per term, so WAND block bounds are trivially exact."""

    name = "boolean"

    def term_weight(self, df, n_docs) -> float:
        return np.ones_like(np.asarray(df, np.float64))

    def norm_cache(self, avgdl: float) -> np.ndarray:
        return np.ones_like(NORM_DECODE_TABLE, dtype=np.float64)

    def score(self, w, tf, cv):
        return w * np.ones_like(np.asarray(tf, np.float64))


class IBSimilarity:
    """Lucene IBSimilarity with distribution SPL, lambda DF and
    normalization H1 (`lucene/core/src/java/org/apache/lucene/search/
    similarities/{IBSimilarity,DistributionSPL,LambdaDF,
    NormalizationH1}.java`, c=1 — the information-based family of
    Clinchant & Gaussier 2010):

      lambda = (df + 1) / (N + 1)                       (LambdaDF)
      tfn    = tf * c * avgdl / dl                      (H1)
      score  = -log2((lambda^(tfn/(tfn+1)) - lambda) / (1 - lambda))

    Channel split: w = lambda (NOT a multiplicative weight — boosts other
    than 1 are unsupported and this op set never boosts), cv =
    (c*avgdl)/dl per norm byte, score evaluated whole in score().
    Monotonicity: tfn ↑ in tf and ↓ in dl; the exponent tfn/(tfn+1) rises
    toward 1, lambda^exp falls toward lambda, so the -log2 rises —
    strictly positive for lambda < 1 and WAND bounds are valid
    unclamped."""

    name = "ib_spl"

    def __init__(self, c: float = 1.0):
        self.c = float(c)

    def term_weight(self, df, n_docs) -> float:
        return (np.asarray(df, np.float64) + 1.0) / (np.float64(n_docs) + 1.0)

    def norm_cache(self, avgdl: float) -> np.ndarray:
        dl = np.maximum(NORM_DECODE_TABLE.astype(np.float64), 1.0)
        return self.c * np.float64(avgdl) / dl

    def score(self, w, tf, cv):
        tfn = tf * cv
        return -np.log2((np.power(w, tfn / (tfn + 1.0)) - w) / (1.0 - w))


class IBLLSimilarity(IBSimilarity):
    """IBSimilarity with distribution LL (log-logistic), lambda DF,
    normalization H1, c=1 (`lucene/core/src/java/org/apache/lucene/
    search/similarities/DistributionLL.java`):

      score = -log2(lambda / (tfn + lambda))

    Same lambda/tfn channels as the SPL member; monotone ↑ in tfn, so
    strictly ↑tf / ↓dl and WAND block bounds stay valid unclamped."""

    name = "ib_ll"

    def score(self, w, tf, cv):
        tfn = tf * cv
        return -np.log2(w / (tfn + w))


class IBLLTTFSimilarity(IBLLSimilarity):
    """IB LL with LambdaTTF (`.../similarities/LambdaTTF.java`): lambda =
    (F + 1)/(N + 1) from the COLLECTION total term frequency instead of
    docFreq — the third IB grid cell.  LL is the safe distribution for
    LambdaTTF: -log2(lam/(tfn+lam)) = log2(1 + tfn/lam) stays finite and
    positive for ANY lam > 0, where SPL's (lam^e - lam)/(1 - lam) goes
    negative once a stopword-class term pushes lam past 1 (the same
    degeneracy the reference's SPL+TTF combination has)."""

    name = "ib_ll_ttf"
    needs_cstats = True

    def term_weight_cstats(self, df, ttf, n_docs, collection_len):
        return (np.asarray(ttf, np.float64) + 1.0) / (
            np.float64(n_docs) + 1.0
        )


class IBLLH2Similarity(IBLLSimilarity):
    """IB LL / LambdaDF / NormalizationH2 (c=1): the log length
    normalization tfn = tf * log2(1 + c*avgdl/dl) under the log-logistic
    distribution — same channels, only the norm cache changes."""

    name = "ib_ll_h2"

    def norm_cache(self, avgdl: float) -> np.ndarray:
        dl = np.maximum(NORM_DECODE_TABLE.astype(np.float64), 1.0)
        return np.log2(1.0 + self.c * np.float64(avgdl) / dl)


SIMILARITIES = {
    "bm25": BM25Similarity(),
    "boolean": BooleanSimilarity(),
    "ib_spl": IBSimilarity(),
    "ib_ll": IBLLSimilarity(),
    "ib_ll_ttf": IBLLTTFSimilarity(),
    "ib_ll_h2": IBLLH2Similarity(),
    "classic": ClassicSimilarity(),
    "sweetspot": SweetSpotSimilarity(),
    "lmdirichlet": LMDirichletSimilarity(),
    "lmjelinekmercer": LMJelinekMercerSimilarity(),
    "dfr": DFRSimilarity(),
    "dfr_ine": DFRIneSimilarity(),
    "dfr_if": DFRIfSimilarity(),
    "dfr_gb": DFRGBSimilarity(),
    "dfr_gl": DFRGLSimilarity(),
    # Axiomatic F2EXP (`lucene/core/src/java/org/apache/lucene/search/
    # similarities/AxiomaticF2EXP.java`, Fang & Zhai 2005; s=0.5, k=0.35):
    # w = (N/df)^k, score = w * tf / (tf + s + s*dl/avgdl) — expressed as
    # an ExpressionSimilarity (it needs only the classic df/N/dl/avgdl
    # channels); monotone ↑tf and ↓dl, so WAND block bounds remain valid
    "axiomatic_f2exp": ExpressionSimilarity(
        weight_expr="pow(div(n_docs, df), 0.35)",
        norm_expr="add(0.5, mult(0.5, div(dl, avgdl)))",
        score_expr="div(mult(w, tf), add(tf, cv))",
        name="axiomatic_f2exp",
    ),
    # lnc-style log-tf scheme (Salton & Buckley SMART ltc/lnc weighting):
    # monotone ↑tf and ↓dl, so WAND block bounds remain valid
    "expr_logtf": ExpressionSimilarity(
        weight_expr="log(add(1, div(n_docs, add(df, 1))))",
        norm_expr="sqrt(dl)",
        score_expr="div(mult(w, add(1, log(tf))), cv)",
        name="expr_logtf",
    ),
}


def get_similarity(name_or_obj):
    if isinstance(name_or_obj, str):
        try:
            return SIMILARITIES[name_or_obj]
        except KeyError:
            raise ValueError(
                f"unknown similarity {name_or_obj!r}; "
                f"registered: {sorted(SIMILARITIES)}"
            ) from None
    return name_or_obj
