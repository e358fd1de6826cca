"""Unit contracts for the LLM-pipeline ops added on top of the reference
surface: contamination n-gram hashing and int8 scalar quantization."""

import numpy as np


def test_gram_hashes_count_and_determinism():
    from rindex.ops.textstats import CONTAM_NGRAM, _gram_hashes

    text = "a b c d e f g"
    g = _gram_hashes(text)
    # 7 tokens -> 7 - 4 + 1 = 4 distinct 4-grams
    assert len(g) == 7 - CONTAM_NGRAM + 1
    assert (np.sort(g) == g).all()  # np.unique output is sorted
    np.testing.assert_array_equal(g, _gram_hashes(text))
    # shorter than n emits nothing
    assert len(_gram_hashes("a b c")) == 0
    # shifted window shares exactly the overlapping grams
    g2 = _gram_hashes("b c d e f g h")
    assert len(np.intersect1d(g, g2)) == len(g) - 1


def test_int8_quantization_reconstruction_bound():
    """Half-up symmetric quantization: |x - code/scale| <= 1/(2*scale),
    and the max-|x| element always hits full scale (|code| == 127)."""
    rng = np.random.Generator(np.random.PCG64(7))
    for _ in range(20):
        x = rng.normal(0, 0.3, 64)
        maxabs = np.abs(x).max()
        scale = 127.0 / maxabs
        codes = np.floor(x * scale + 0.5)
        assert np.abs(codes).max() == 127
        recon = codes / scale
        assert np.abs(x - recon).max() <= 0.5 / scale + 1e-12
