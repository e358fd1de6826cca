"""Count-Min overestimate invariant + Bloom zero-false-negative contract
(rows-only ops — these bounds ARE their correctness check)."""

import numpy as np
import pytest


SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def exact_counts(ray_session):
    import duckdb

    from rindex.ops.analysis_ext import TOKEN_SQL_RE
    from rindex.ops.cms import CMS_PROBE

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    df = con.execute(
        f"""SELECT term, count(*) c FROM (
              SELECT unnest(regexp_extract_all(lower(text),
                            '{TOKEN_SQL_RE}')) AS term FROM documents)
            GROUP BY term"""
    ).df()
    exact = dict(zip(df["term"], df["c"]))
    return {t: int(exact.get(t, 0)) for t in CMS_PROBE}, int(df["c"].sum())


def test_cms_overestimates_within_bound(ray_session, exact_counts):
    from rindex.ops.cms import CMS_PROBE, CMS_W, build_cms, cms_estimate

    exact, n_total = exact_counts
    cms = build_cms(SF)
    est = cms_estimate(cms, list(CMS_PROBE))
    for t, e in zip(CMS_PROBE, est):
        assert e >= exact[t], (t, int(e), exact[t])       # never undercounts
        assert e <= exact[t] + 2 * n_total // CMS_W + 1, (  # CM error bound
            t, int(e), exact[t], n_total)


def test_cms_partials_are_linear(ray_session):
    """Summing two half-corpus sketches equals the full-corpus sketch —
    the property that makes the distributed combine exact."""
    from rindex.ops.cms import CMS_D, CMS_W, _cms_rows, _hash2

    rng = ["hash", "join", "spark", "row", "row", "hash"]
    full = np.zeros((CMS_D, CMS_W), np.int64)
    cols = _cms_rows(*_hash2(rng))
    for d in range(CMS_D):
        full[d] = np.bincount(cols[d], minlength=CMS_W)
    a = np.zeros_like(full)
    b = np.zeros_like(full)
    ca, cb = _cms_rows(*_hash2(rng[:3])), _cms_rows(*_hash2(rng[3:]))
    for d in range(CMS_D):
        a[d] = np.bincount(ca[d], minlength=CMS_W)
        b[d] = np.bincount(cb[d], minlength=CMS_W)
    assert (a + b == full).all()


def test_bloom_zero_false_negatives(ray_session):
    from rindex.ops.cms import q_bloom_segment_skip_documents

    out = q_bloom_segment_skip_documents(SF)
    assert (out["maybe_segments"] >= out["actual_segments"]).all()
    absent = out[out["term"] == "nosuchterm"].iloc[0]
    assert absent["actual_segments"] == 0
    # a 2^14-bit filter over a 31-term dictionary: false-positive odds are
    # astronomically small — the absent term must skip every segment
    assert absent["maybe_segments"] == 0
    present = out[out["term"] == "hash"].iloc[0]
    assert present["maybe_segments"] == present["actual_segments"]
