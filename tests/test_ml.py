"""train()/classify() contracts: deterministic distributed training,
loss decrease, separation on the text-derived outcome, featurizer vs a
naive reference (rows-only op — this IS its correctness gate)."""

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_featurizer_vs_naive():
    from collections import Counter

    from rindex.ops.dedup import _stable_hash64
    from rindex.ops.ml import _batch_features, _feature_space

    vh, _ = _feature_space(SF)
    docs = pq.read_table(SF + "/documents.parquet", columns=["text"])
    texts = docs["text"].to_pylist()[:50]
    X = _batch_features(texts, vh)
    assert X.shape == (50, len(vh) + 1)
    assert (X[:, -1] == 1.0).all()  # bias
    import re

    from rindex.ops.fulltext import TOKEN_PY_RE

    tok = re.compile(TOKEN_PY_RE)
    hcol = {int(h): j for j, h in enumerate(vh)}
    for i, text in enumerate(texts[:10]):
        cnt = Counter(
            hcol[h]
            for t in tok.findall(text.lower())
            if (h := _stable_hash64(t.encode())) in hcol
        )
        want = np.zeros(len(vh))
        for j, c in cnt.items():
            want[j] = np.log1p(float(c))
        assert np.allclose(X[i, :-1], want)


def test_train_deterministic_and_separates(ray_session):
    from rindex.ops.ml import q_train_classify_documents, train_logit

    w1, losses, _ = train_logit(SF)
    w2, _, _ = train_logit(SF)
    assert np.array_equal(w1, w2)  # bit-equal republished model
    assert losses[-1] < losses[0] < 0.70
    out = q_train_classify_documents(SF).set_index(["label", "pred"])
    n_ok = int(out["n"].get(("pos", "pos"), 0) + out["n"].get(("neg", "neg"), 0))
    n_all = int(out["n"].sum())
    assert n_ok / n_all >= 0.99  # far above the 77% majority share
