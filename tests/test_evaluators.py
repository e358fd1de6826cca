"""Evaluator-engine unit tests: parser shapes, kernel correctness,
variadic/boolean/conditional semantics, loud failure on unknown names."""

import numpy as np
import pandas as pd
import pytest

from rindex.ops.evaluators import EVALUATORS, eval_node, parse_expr, select_eval


def _ev(expr, **cols):
    return eval_node(parse_expr(expr), {k: np.asarray(v) for k, v in cols.items()})


def test_parser_shapes():
    assert parse_expr("add(a, 1)") == ("call", "add", [("col", "a"), ("lit", 1)])
    assert parse_expr('"x y"') == ("lit", "x y")
    assert parse_expr("-2.5e3") == ("lit", -2500.0)
    with pytest.raises(ValueError):
        parse_expr("add(a,")  # unbalanced
    with pytest.raises(ValueError):
        parse_expr("add(a) b")  # trailing tokens


def test_arithmetic_and_variadic():
    np.testing.assert_allclose(
        _ev("add(a, mult(b, 2), 1)", a=[1.0, 2.0], b=[10.0, 20.0]), [22.0, 43.0]
    )
    np.testing.assert_allclose(_ev("pow(a, 2)", a=[3.0, 4.0]), [9.0, 16.0])
    np.testing.assert_allclose(
        _ev("round(div(a, 3), 2)", a=[1.0, 2.0]), [0.33, 0.67]
    )


def test_boolean_conditional():
    out = _ev('if(and(gt(a, 1), lt(a, 4)), "mid", "edge")', a=[0, 2, 3, 9])
    assert list(out) == ["edge", "mid", "mid", "edge"]
    assert list(_ev("eor(gt(a, 0), gt(a, 2))", a=[1, 3, -1])) == [True, False, False]
    assert list(_ev("not(eq(a, 2))", a=[2, 5])) == [False, True]


def test_trig_matches_numpy():
    x = np.linspace(-2, 2, 9)
    np.testing.assert_array_equal(_ev("atan2(a, 2.0)", a=x), np.arctan2(x, 2.0))
    np.testing.assert_array_equal(_ev("tanh(a)", a=x), np.tanh(x))


def test_string_kernels():
    out = _ev('concat(upper(a), "-", trim(b))', a=["ab", "cd"], b=[" x ", "y"])
    assert out.to_pylist() == ["AB-x", "CD-y"]
    assert list(_ev("length(a)", a=["abc", ""])) == [3, 0]


def test_unknown_names_fail_loud():
    with pytest.raises(KeyError, match="unknown evaluator"):
        _ev("nosuch(a)", a=[1])
    with pytest.raises(KeyError, match="unknown column"):
        _ev("add(zzz, 1)", a=[1])


def test_select_eval_over_dataset(ray_session):
    import ray.data as rd

    df = pd.DataFrame({"x": [1.0, 2.0, 3.0], "name": ["a", "b", "c"]})
    out = select_eval(
        rd.from_pandas(df).repartition(2),
        {"y": "mult(x, x)", "tag": 'concat(upper(name), "!")'},
        keep=["x"],
    ).to_pandas().sort_values("x").reset_index(drop=True)
    assert list(out.columns) == ["x", "y", "tag"]
    np.testing.assert_allclose(out["y"], [1.0, 4.0, 9.0])
    assert out["tag"].tolist() == ["A!", "B!", "C!"]


def test_registry_is_the_extension_hook():
    EVALUATORS["plus1"] = lambda x: np.asarray(x) + 1
    try:
        assert list(_ev("plus1(a)", a=[1, 2])) == [2, 3]
    finally:
        del EVALUATORS["plus1"]


def test_temporal_kernels():
    ts = np.array(
        ["2024-01-15T13:45:30.500000", "2023-12-31T23:59:59.000001"],
        dtype="datetime64[us]",
    )
    assert list(_ev("year(a)", a=ts)) == [2024, 2023]
    assert list(_ev("month(a)", a=ts)) == [1, 12]
    assert list(_ev("day(a)", a=ts)) == [15, 31]
    assert list(_ev("hour(a)", a=ts)) == [13, 23]
    assert list(_ev("minute(a)", a=ts)) == [45, 59]
    assert list(_ev("second(a)", a=ts)) == [30, 59]
    assert list(_ev("dayOfYear(a)", a=ts)) == [15, 365]
    assert list(_ev("quarter(a)", a=ts)) == [1, 4]
    # ISO week: 2024-01-15 is week 3; 2023-12-31 (a Sunday) is ISO week 52
    assert list(_ev("week(a)", a=ts)) == [3, 52]
    # epoch() returns millis (truncating sub-millisecond precision)
    assert list(_ev("epoch(a)", a=ts)) == [1705326330500, 1704067199000]


def test_statistical_kernels():
    x = np.array([1.0, 2.0, 3.0, 4.0, 5.0])
    y = 2.0 * x + 1.0
    assert abs(_ev("corr(a, b)", a=x, b=y) - 1.0) < 1e-12
    assert abs(_ev("cov(a, b)", a=x, b=y) - np.cov(x, y)[0, 1]) < 1e-12
    rng = np.random.default_rng(3)
    u, v = rng.normal(size=500), rng.normal(size=500)
    assert abs(_ev("corr(a, b)", a=u, b=v) - np.corrcoef(u, v)[0, 1]) < 1e-10


def test_array_and_regex_kernels():
    x = np.array([1.0, 9.0, 4.0])
    y = np.array([5.0, 2.0, 4.0])
    z = np.array([3.0, 7.0, 4.0])
    assert list(_ev("arrayMax(array(a, b, c))", a=x, b=y, c=z)) == [5.0, 9.0, 4.0]
    assert list(_ev("arrayMin(array(a, b, c))", a=x, b=y, c=z)) == [1.0, 2.0, 4.0]
    assert list(_ev("arrayMean(array(a, b, c))", a=x, b=y, c=z)) == [3.0, 6.0, 4.0]
    assert list(_ev("valueAt(array(a, b, c), 1)", a=x, b=y, c=z)) == [5.0, 2.0, 4.0]
    assert list(_ev("arrayLength(array(a, b))", a=x, b=y)) == [2, 2, 2]
    s = np.array(["row", "Ride", "arrow"], dtype=object)
    assert list(_ev('matches(a, "^r")', a=s).to_pylist()) == [True, False, False]
    assert list(_ev('replace(a, "r", "R")', a=s).to_pylist()) == ["Row", "Ride", "aRRow"]


def test_matrix_kernels_and_let():
    from rindex.ops.evaluators import let_eval

    M = np.array([[1.0, 2.0], [3.0, 4.0]])
    scope = let_eval(
        {"Mt": "transpose(M)", "P": "matrixMult(M, Mt)", "r": "sumRows(M)",
         "cs": "sumColumns(M)", "d": "dotProduct(r, cs)"},
        {"M": M},
    )
    assert np.array_equal(scope["P"], M @ M.T)
    assert np.array_equal(scope["r"], [3.0, 7.0])
    assert np.array_equal(scope["cs"], [4.0, 6.0])
    # let() binds SEQUENTIALLY: d uses both earlier bindings
    assert scope["d"] == 3.0 * 4.0 + 7.0 * 6.0
    assert np.array_equal(_ev("rowAt(M, 1)", M=M), [3.0, 4.0])
    assert np.array_equal(_ev("columnAt(M, 0)", M=M), [1.0, 3.0])
    u = _ev("unitize(a)", a=np.array([3.0, 4.0]))
    assert np.allclose(u, [0.6, 0.8])
    e = _ev("ebeMultiply(a, b)", a=np.array([1.0, 2.0]), b=np.array([5.0, 6.0]))
    assert np.array_equal(e, [5.0, 12.0])
    # a stack built with matrix() from 1-D arrays
    s = _ev("matrix(a, b)", a=np.array([1.0, 2.0]), b=np.array([3.0, 4.0]))
    assert s.shape == (2, 2)


def test_distribution_kernels():
    import math

    from rindex.ops.evaluators import _cum_prob, _ks_d

    # uniform CDF: linear with clipping
    d = ("uniform", 0.0, 10.0)
    assert _cum_prob(d, 5.0) == 0.5
    assert _cum_prob(d, -1.0) == 0.0 and _cum_prob(d, 11.0) == 1.0
    # normal CDF vs math.erf goldens
    n = ("normal", 0.0, 1.0)
    assert abs(float(_cum_prob(n, 0.0)) - 0.5) < 1e-15
    assert abs(float(_cum_prob(n, 1.96)) - 0.9750021048517795) < 1e-12
    # empirical CDF step function over a weighted sample
    e = EVALUATORS["empiricalDistribution"](
        np.array([1.0, 2.0, 4.0]), np.array([1.0, 2.0, 1.0])
    )
    assert float(_cum_prob(e, 0.5)) == 0.0
    assert float(_cum_prob(e, 2.0)) == 0.75
    assert float(_cum_prob(e, 9.0)) == 1.0
    # KS of a perfectly uniform weighted sample on integer steps 1..4,
    # hand-computed: max at the post-step side of x=1: |1/4 - 0| = 0.25
    ks = _ks_d(("uniform", 1.0, 4.0), np.array([1.0, 2.0, 3.0, 4.0]),
               np.array([1.0, 1.0, 1.0, 1.0]))
    assert abs(ks - 0.25) < 1e-15
    # degenerate-but-loud: unknown distribution kind
    with pytest.raises(KeyError):
        _cum_prob(("cauchy", 1.0, 2.0), 1.0)


def test_timeseries_kernels():
    from rindex.ops.evaluators import EVALUATORS

    v = np.array([4.0, 8.0, 15.0, 16.0, 23.0, 42.0])
    # movingAvg: full windows only, brute-force check
    got = EVALUATORS["movingAvg"](v, 3)
    want = np.array([v[i:i + 3].mean() for i in range(4)])
    assert np.allclose(got, want, rtol=0, atol=1e-12) and len(got) == 4
    # diff is the lag-1 difference
    assert np.array_equal(EVALUATORS["diff"](v), np.diff(v))
    # expMovingAvg: recursion with alpha=2/(k+1), seeded at v[0]
    ema = EVALUATORS["expMovingAvg"](v, 3)
    a, e = 0.5, v[0]
    for i, x in enumerate(v):
        if i:
            e = a * x + (1 - a) * e
        assert ema[i] == e
    # sequence / rev
    assert np.array_equal(EVALUATORS["sequence"](4, 10, 2),
                          np.array([10.0, 12.0, 14.0, 16.0]))
    assert np.array_equal(EVALUATORS["rev"](v), v[::-1])
    # minMaxScale to [0,1]; standardize has mean ~0, sd ~1
    mm = EVALUATORS["minMaxScale"](v)
    assert mm.min() == 0.0 and mm.max() == 1.0
    z = EVALUATORS["standardize"](v)
    assert abs(z.mean()) < 1e-12
    assert abs(np.std(z, ddof=1) - 1.0) < 1e-12


def test_vector_and_fit_kernels():
    from rindex.ops.evaluators import EVALUATORS

    a = np.array([1.0, 2.0, 2.0])
    b = np.array([2.0, 4.0, 4.0])
    assert abs(EVALUATORS["cosineSimilarity"](a, b) - 1.0) < 1e-12
    assert abs(EVALUATORS["euclideanDistance"](a, b) - 3.0) < 1e-12
    assert abs(EVALUATORS["manhattanDistance"](a, b) - 5.0) < 1e-12
    assert abs(EVALUATORS["norm"](a) - 3.0) < 1e-12
    assert EVALUATORS["l1norm"](a) == 5.0
    assert EVALUATORS["linfnorm"](a) == 2.0
    assert EVALUATORS["grandSum"](np.array([[1.0, 2.0], [3.0, 4.0]])) == 10.0
    # fft magnitude (direct DFT) vs numpy's FFT
    v = np.array([3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0])
    assert np.allclose(EVALUATORS["fft"](v), np.abs(np.fft.fft(v)),
                       rtol=1e-9, atol=1e-9)
    # polyFit (Cramer) vs np.polyfit, deg 1 and 2
    x = np.arange(10, dtype=np.float64)
    y = 2.0 - 3.0 * x + 0.5 * x * x
    c2 = EVALUATORS["polyFit"](x, y, 2)
    assert np.allclose(c2, [2.0, -3.0, 0.5], rtol=1e-8)
    c1 = EVALUATORS["polyFit"](x, 1.5 * x + 4.0, 1)
    assert np.allclose(c1, [4.0, 1.5], rtol=1e-10)
    with pytest.raises(ValueError):
        EVALUATORS["polyFit"](x, y, 3)
    # Welch ttest: equal samples give t=0; known asymmetric case
    t0 = EVALUATORS["ttest"](a, a)
    assert t0[0] == 0.0
    t = EVALUATORS["ttest"](np.array([1.0, 2.0, 3.0, 4.0]),
                            np.array([10.0, 12.0, 14.0, 16.0]))
    # hand-computed Welch: m1=2.5 v1=5/3, m2=13 v2=20/3
    se = (5.0 / 3) / 4 + (20.0 / 3) / 4
    assert abs(t[0] - (2.5 - 13.0) / np.sqrt(se)) < 1e-12


def test_discrete_distribution_kernels():
    from rindex.ops.evaluators import EVALUATORS, _cum_prob, _dist_prob

    pois = EVALUATORS["poissonDistribution"](3.0)
    # pmf sums to ~1, cdf(large) ~ 1, pmf(0) = e^-3
    assert abs(_dist_prob(pois, 0.0) - np.exp(-3.0)) < 1e-12
    assert abs(_cum_prob(pois, 60.0) - 1.0) < 1e-12
    binom = EVALUATORS["binomialDistribution"](10, 0.5)
    # symmetric: pmf(k) == pmf(n-k); cdf(n) == 1
    for k in range(5):
        assert abs(_dist_prob(binom, float(k))
                   - _dist_prob(binom, float(10 - k))) < 1e-12
    assert abs(_cum_prob(binom, 10.0) - 1.0) < 1e-12
    assert abs(_dist_prob(binom, 5.0) - 0.24609375) < 1e-10


def test_round_sql_half_away():
    from rindex.ops.evaluators import round_sql

    # the exact dyadic tie that banker's rounding gets wrong vs SQL
    assert round_sql(32.5390625) == 32.539063
    assert round_sql(-32.5390625) == -32.539063
    assert round_sql(np.array([1.0000005, 2.0])).tolist() == [1.000001, 2.0]


def test_mannwhitney_and_chisquare_kernels():
    from rindex.ops.evaluators import _chi_square_gof, _mann_whitney

    # hand-checked: a = [1,2], b = [3,4] -> all b above a: U1 = 0,
    # ranks 1,2 vs 3,4, no ties
    u = _mann_whitney(np.array([1.0, 2.0, 3.0, 4.0]),
                      np.array([1.0, 1.0, 0.0, 0.0]),
                      np.array([0.0, 0.0, 1.0, 1.0]))
    assert u[0] == 0.0 and u[1] < 0
    # identical weighted distributions -> U1 = n1*n2/2 exactly, z = 0
    u2 = _mann_whitney(np.array([1.0, 2.0]),
                       np.array([3.0, 3.0]), np.array([3.0, 3.0]))
    assert u2[0] == 6.0 * 6.0 / 2.0
    assert abs(u2[1]) < 1e-12
    # uniform observed -> chi2 == 0; known asymmetric case
    c = _chi_square_gof(np.array([10.0, 10.0, 10.0]))
    assert c[0] == 0.0 and c[1] == 2.0
    c2 = _chi_square_gof(np.array([12.0, 8.0]))
    assert abs(c2[0] - (4.0 + 4.0) / 10.0) < 1e-12


def test_timeseries_kernels_property():
    """Property check over random integer series: movingAvg/diff/EMA/
    minMaxScale/standardize agree with naive per-element references."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from rindex.ops.evaluators import EVALUATORS

    @settings(max_examples=60, deadline=None)
    @given(
        st.lists(st.integers(min_value=0, max_value=10**6),
                 min_size=8, max_size=40),
        st.integers(min_value=2, max_value=7),
    )
    def check(xs, k):
        v = np.array(xs, np.float64)
        mov = EVALUATORS["movingAvg"](v, k)
        assert len(mov) == len(v) - k + 1
        for i in range(len(mov)):
            assert mov[i] == v[i:i + k].sum() / float(k)  # integer-exact
        d = EVALUATORS["diff"](v)
        assert np.array_equal(d, v[1:] - v[:-1])
        ema = EVALUATORS["expMovingAvg"](v, k)
        a, e = 2.0 / (k + 1.0), v[0]
        for i, x in enumerate(v):
            if i:
                e = a * x + (1.0 - a) * e
            assert ema[i] == e
        if v.max() > v.min():
            mm = EVALUATORS["minMaxScale"](v)
            assert mm.min() == 0.0 and mm.max() == 1.0
            assert np.all((mm >= 0.0) & (mm <= 1.0))
        if len(np.unique(v)) > 1:
            z = EVALUATORS["standardize"](v)
            assert abs(z.mean()) < 1e-9
            assert abs(np.std(z, ddof=1) - 1.0) < 1e-9

    check()


def test_dist_fit_batch4_kernels():
    """Batch-4 kernels: closed-form CDFs against naive references,
    percentile against np.percentile (R-7 is numpy's default 'linear'),
    hist against np.histogram on interior points."""
    from rindex.ops.evaluators import _cum_prob, _dist_prob

    # geometric: cdf(k) == sum of pmf(0..k); pmf matches (1-p)^k * p
    gd = EVALUATORS["geometricDistribution"](0.3)
    pm = np.array([_dist_prob(gd, float(k)) for k in range(4)])
    np.testing.assert_allclose(pm, [0.3 * 0.7**k for k in range(4)])
    np.testing.assert_allclose(_cum_prob(gd, 3.0), pm.sum())

    # zipf: pmf normalizes over its support; cdf(N) == 1
    zd = EVALUATORS["zipFDistribution"](50, 1.5)
    np.testing.assert_allclose(_cum_prob(zd, 50.0), 1.0, rtol=1e-12)

    # weibull: k=1 degenerates to exponential(lam)
    wd = EVALUATORS["weibullDistribution"](1.0, 2.0)
    np.testing.assert_allclose(_cum_prob(wd, np.float64(3.0)),
                               1.0 - np.exp(-1.5))

    # triangular: CDF at the mode = (c-a)/(b-a); at b = 1
    td = EVALUATORS["triangularDistribution"](0.0, 1.0, 4.0)
    np.testing.assert_allclose(_cum_prob(td, np.float64(1.0)), 0.25)
    np.testing.assert_allclose(_cum_prob(td, np.float64(4.0)), 1.0)

    rng = np.random.default_rng(7)
    v = rng.integers(0, 1000, 97).astype(np.float64)
    np.testing.assert_allclose(
        EVALUATORS["percentile"](v, 90.0), np.percentile(v, 90.0)
    )
    h = EVALUATORS["hist"](v, 8)
    assert h.sum() == len(v) and h.dtype == np.int64
    # interior points bucket identically to np.histogram's equal-width
    # bins (edges differ only in the max-value inclusion rule, which the
    # clamp handles)
    np.testing.assert_array_equal(
        h, np.histogram(v, bins=8, range=(v.min(), v.max()))[0]
    )


def test_signal_batch5_kernels():
    """Batch-5 kernels vs naive references: convolution == np.convolve
    by construction so check the definition directly; normalizeSum sums
    to 1; oscillate matches amp*sin(om*t+phi); covMatrix matches np.cov
    (sample covariance)."""
    v = np.array([1.0, 3.0, 2.0, 5.0])
    k = np.array([1.0, 2.0, 1.0])
    got = EVALUATORS["convolution"](v, k)
    want = [sum(v[i - j] * k[j] for j in range(3) if 0 <= i - j < len(v))
            for i in range(len(v) + 2)]
    np.testing.assert_allclose(got, want)
    ns = EVALUATORS["normalizeSum"](v)
    assert abs(ns.sum() - 1.0) < 1e-15 and np.allclose(ns, v / v.sum())
    osc = EVALUATORS["oscillate"](2.0, 0.5, 1.0, 6)
    np.testing.assert_allclose(osc, 2.0 * np.sin(0.5 * np.arange(6) + 1.0))
    M = np.array([[1.0, 2.0, 4.0, 7.0], [3.0, 1.0, 5.0, 2.0]])
    np.testing.assert_allclose(EVALUATORS["covMatrix"](M), np.cov(M),
                               rtol=1e-12)


def test_moving_median_mad_integrate_vs_naive():
    """Batch-7 kernels against naive references: full-window count,
    element-exact medians on integer series, trapezoid area."""
    import numpy as np

    from rindex.ops.evaluators import EVALUATORS

    rng = np.random.default_rng(11)
    v = rng.integers(0, 50, size=37).astype(np.float64)
    k = 7
    med = EVALUATORS["movingMedian"](v, k)
    mad = EVALUATORS["movingMAD"](v, k)
    assert len(med) == len(v) - k + 1 == len(mad)
    for i in range(len(med)):
        w = np.sort(v[i: i + k])
        assert med[i] == w[k // 2]
        assert mad[i] == np.sort(np.abs(v[i: i + k] - w[k // 2]))[k // 2]
    auc = EVALUATORS["integrate"](v)
    assert auc == sum((v[i] + v[i + 1]) / 2.0 for i in range(len(v) - 1))


def test_rank_transform_and_zscores_kernels():
    """rankTransform averages ties (NaturalRanking AVERAGE); zscores uses
    the bias-corrected sample std (Commons Math default)."""
    from rindex.ops.evaluators import EVALUATORS

    r = EVALUATORS["rankTransform"]([10.0, 20.0, 20.0, 5.0])
    assert r.tolist() == [2.0, 3.5, 3.5, 1.0]
    z = EVALUATORS["zscores"]([1.0, 2.0, 3.0])
    assert np.allclose(z, [-1.0, 0.0, 1.0])


def test_distance_batch11_kernels():
    import numpy as np

    from rindex.ops.evaluators import EVALUATORS

    a = np.array([1.0, 2.0, 3.0])
    b = np.array([3.0, 2.0, 1.0])
    assert EVALUATORS["chebyshevDistance"](a, b) == 2.0
    # canberra: |1-3|/4 + 0 + |3-1|/4 = 1.0; 0/0 terms drop
    assert EVALUATORS["canberraDistance"](a, b) == 1.0
    assert EVALUATORS["canberraDistance"]([0.0], [0.0]) == 0.0
    # commons-math recurrence: cum diffs -2,-2,0 -> sum |.| = 4
    assert EVALUATORS["earthMoversDistance"](a, b) == 4.0
    # quarter meridian on the IERS mean-radius SPHERE = R * pi / 2
    q = EVALUATORS["haversineMeters"](0.0, 0.0, 90.0, 0.0)
    assert abs(q - 6_371_008.7714 * np.pi / 2.0) < 1e-6
    assert EVALUATORS["haversineMeters"](12.5, -3.25, 12.5, -3.25) == 0.0


def test_spline_akima_derivative_kernels():
    import numpy as np

    from rindex.ops.evaluators import EVALUATORS

    # natural cubic on x=[0,1,2], y=[0,1,0]: M = [0, -6y1/2? ...] solved
    # by hand: M1 = 6*(y0 - 2y1 + y2) / 4 = -3; s(0.5) = 0.5*y1 +
    # ((A^3-A)*M0 + (B^3-B)*M1)/6 with A=B=0.5 -> 0.5 - (-0.375*-3)/6?
    # closed form: s(0.5) = 0.6875 (verified analytically: 11/16)
    sp = EVALUATORS["spline"]([0.0, 1.0, 2.0], [0.0, 1.0, 0.0])
    mid = EVALUATORS["predict"](sp, [0.5, 1.5])
    assert np.allclose(mid, [11 / 16, 11 / 16])
    # pass-through at knots is EXACT (the SQL-oracled property)
    assert np.array_equal(
        EVALUATORS["predict"](sp, [0.0, 1.0, 2.0]), [0.0, 1.0, 0.0]
    )
    # symmetric hat: natural-spline derivative at center is 0
    dsp = EVALUATORS["derivative"](sp)
    d = EVALUATORS["predict"](dsp, [1.0])
    assert abs(d[0]) < 1e-12
    # derivative at the ends of the natural spline: s'(0) = (y1-y0)/h
    # - h*(2*M0 + M1)/6 = 1 - (-3)/6 = 1.5
    assert np.allclose(EVALUATORS["predict"](dsp, [0.0]), [1.5])

    # akima reproduces straight lines exactly (its defining property)
    x = np.arange(6.0)
    y = 2.0 * x + 1.0
    ak = EVALUATORS["akima"](x, y)
    xs = np.array([0.25, 1.7, 3.5, 4.9])
    assert np.allclose(EVALUATORS["predict"](ak, xs), 2.0 * xs + 1.0)
    dak = EVALUATORS["derivative"](ak)
    assert np.allclose(EVALUATORS["predict"](dak, xs), 2.0)
    # ... and passes through arbitrary knots exactly
    y2 = np.array([0.0, 3.0, 1.0, 4.0, 1.0, 5.0])
    ak2 = EVALUATORS["akima"](x, y2)
    assert np.allclose(EVALUATORS["predict"](ak2, x), y2)

    # polymorphic lerp: 2-arg returns a function node, 3-arg evaluates
    lf = EVALUATORS["lerp"]([0.0, 1.0], [0.0, 2.0])
    assert EVALUATORS["predict"](lf, [0.25])[0] == 0.5
    assert EVALUATORS["lerp"]([0.0, 1.0], [0.0, 2.0], [0.25])[0] == 0.5
    dlf = EVALUATORS["derivative"](lf)
    assert EVALUATORS["predict"](dlf, [0.5])[0] == 2.0


def test_finddelay_kernel():
    import numpy as np

    from rindex.ops.evaluators import EVALUATORS

    fd = EVALUATORS["finddelay"]
    a = np.array([0.0, 0.0, 1.0, 0.0, 0.0])
    assert fd(a, np.array([0.0, 0.0, 0.0, 0.0, 1.0])) == 2
    assert fd(a, np.array([1.0, 0.0, 0.0, 0.0, 0.0])) == -2
    assert fd(a, a) == 0
    # noisy shifted copy of a zero-mean-ish series still recovers the lag
    rng = np.arange(40.0)
    base = np.sin(rng * 0.7) * 10.0
    sh = np.concatenate([np.zeros(5), base[:-5]])
    assert fd(base, sh) == 5


def test_ml_wrapper_batch13_kernels():
    import numpy as np

    from rindex.ops.evaluators import EVALUATORS

    M = np.array([[0.0, 0.0], [1.0, 0.0], [10.0, 10.0],
                  [11.0, 10.0], [0.5, 0.2]])
    # nearest three to (0.4, 0.1): rows 4, 0, 1 in that order
    assert list(EVALUATORS["knn"](M, [0.4, 0.1], 3)) == [4, 0, 1]
    # tie-break: equidistant rows resolve to the LOWER index
    T = np.array([[1.0, 0.0], [-1.0, 0.0], [0.0, 5.0]])
    assert list(EVALUATORS["knn"](T, [0.0, 0.0], 2)) == [0, 1]

    km = EVALUATORS["kmeans"](M, 2)
    lab = km[2]
    # two well-separated blobs: {0,1,4} vs {2,3}
    assert lab[0] == lab[1] == lab[4]
    assert lab[2] == lab[3] != lab[0]
    C = EVALUATORS["getCentroids"](km)
    blob = sorted(map(tuple, np.round(C, 6).tolist()))
    assert blob[0] == (0.5, 0.066667)          # mean of rows 0,1,4
    assert blob[1] == (10.5, 10.0)             # mean of rows 2,3
    cl = EVALUATORS["getCluster"](km, int(lab[0]))
    assert list(cl) == [0, 1, 4]
    # determinism: same input -> identical labels and centroids
    km2 = EVALUATORS["kmeans"](M, 2)
    assert np.array_equal(km[1], km2[1]) and np.array_equal(km[2], km2[2])
