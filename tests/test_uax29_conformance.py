"""UAX#29 word-break conformance fixture for the StandardTokenizer
(VERDICT r3 item #6).

Pins (a) the Lucene-default behaviors the unicode path now implements —
ideographs and hiragana as single-char tokens, katakana runs, emoji ZWJ
sequences as one token, unicode letter runs, typographic-apostrophe
MidLetter — and (b) the DOCUMENTED divergences from full UAX#29 that are
frozen for oracle parity (MidNum "3.14", ExtendNumLet "foo_bar").
Reference semantics: `lucene/core/src/java/org/apache/lucene/analysis/
standard/StandardTokenizerImpl.jflex` token types ALPHANUM / NUM /
IDEOGRAPHIC / HIRAGANA / KATAKANA / EMOJI.

Also asserts the ASCII fast path is bit-identical to the historical
tokenizer (the parity contract with every SQL oracle), and that the
Arrow-vectorized index-build path emits byte-identical postings to the
per-row Python path on a mixed ASCII/unicode corpus.
"""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from rindex.analysis import _TOKEN_RE, standard_tokenize

# ------------------------------------------------------ conformance table

CASES = [
    # ASCII fast path — unchanged historical behavior
    ("Don't stop", ["don't", "stop"]),
    ("can't won't o'clock", ["can't", "won't", "o'clock"]),
    ("Hello, WORLD!  42x", ["hello", "world", "42x"]),
    ("", []),
    ("...", []),
    # UAX#29 conformant behaviors (unicode path)
    ("café naïve", ["café", "naïve"]),
    ("Привет мир", ["привет", "мир"]),
    ("Ελληνικά κείμενο", ["ελληνικά", "κείμενο"]),
    # IDEOGRAPHIC: single-char tokens (Lucene CJK default)
    ("漢字", ["漢", "字"]),
    ("ab漢cd", ["ab", "漢", "cd"]),
    # HIRAGANA: single-char; KATAKANA: runs
    ("ひらがな", ["ひ", "ら", "が", "な"]),
    ("テスト済み", ["テスト", "済", "み"]),
    # EMOJI incl. ZWJ family sequence and skin-tone modifier
    ("👩‍👩‍👧‍👦 🚀", ["👩‍👩‍👧‍👦", "🚀"]),
    ("a👍b", ["a", "👍", "b"]),
    ("👍🏽 ok", ["👍🏽", "ok"]),
    # typographic apostrophe U+2019 is MidLetter (UAX#29 WB5a)
    ("l’élève", ["l’élève"]),
    # NFC normalization: decomposed e + combining acute == composed é
    ("café", ["café"]),
    # --- formally pinned divergences from full UAX#29 (contract, not
    # backlog — rationale at rindex/analysis.py::_TOKEN_RE: both rules
    # fire in the pure-ASCII fast path whose byte-identity with every
    # DuckDB oracle's segmentation regex is the fulltext correctness
    # gate) ---
    # MidNum, UAX#29 WB11/WB12 ({MidNumericEx} in
    # StandardTokenizerImpl.jflex): reference keeps "3.14"/"2,718" as one
    # <NUM> token; this engine and its oracles split on the punct
    ("3.14 and 2,718", ["3", "14", "and", "2", "718"]),
    # ExtendNumLet, UAX#29 WB13a/WB13b ({ExtendNumLetEx}): reference
    # joins "foo_bar" via U+005F; this engine and its oracles split
    ("foo_bar", ["foo", "bar"]),
]


@pytest.mark.parametrize("text,expected", CASES, ids=[c[0][:20] for c in CASES])
def test_uax29_cases(text, expected):
    assert standard_tokenize(text) == expected


def test_ascii_fast_path_bit_identical():
    """Pure-ASCII input must segment exactly as the historical regex —
    the parity contract with the DuckDB oracles."""
    import random

    rng = random.Random(42)
    alphabet = "abc XYZ 0189 .,!? '\n\t-_/" * 2
    for _ in range(300):
        s = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 60)))
        legacy = []
        for t in _TOKEN_RE.findall(s.lower()):
            legacy.append(t)
        assert standard_tokenize(s) == legacy, s


def test_max_token_len_split_applies_to_unicode():
    from rindex.schema import MAX_TOKEN_LEN

    long = "ф" * (MAX_TOKEN_LEN + 3)
    toks = standard_tokenize(long)
    assert toks == [long[:MAX_TOKEN_LEN], long[MAX_TOKEN_LEN:]]


# --------------------------- vectorized build path == Python path, unicode


def test_vec_tokenize_partials_matches_python_on_unicode(ray_session):
    """The Arrow-vectorized tokenize stage routes non-ASCII rows through
    the exact Python tokenizer — its packed partials must equal the
    general Python path's on a mixed corpus (the same byte-identity
    contract the ASCII corpus tests assert)."""
    from rindex.build import _make_tokenize_partials, _make_tokenize_partials_vec

    texts = [
        "plain ascii text only",
        "café 漢字テスト Привет",
        None,
        "Don't stop 👍🏽 l’élève",
        "...",
        "ひらがな mixed with ascii",
    ]
    batch = pa.table(
        {
            "seg": pa.array(np.zeros(len(texts), np.int32)),
            "doc": pa.array(np.arange(len(texts), dtype=np.int64)),
            "text": pa.array(texts, pa.string()),
        }
    )
    vec = _make_tokenize_partials_vec(None)(batch)
    gen = _make_tokenize_partials("standard", None)(batch)

    def norm(t):
        import pandas as pd

        df = t.to_pandas().sort_values("term").reset_index(drop=True)
        return df

    v, g = norm(vec), norm(gen)
    assert list(v["term"]) == list(g["term"])
    for col in ("df", "ttf", "docs", "tfs", "norms"):
        assert list(v[col]) == list(g[col]), col


def test_unicode_corpus_builds_and_searches_end_to_end(
    ray_session, tmp_path
):
    """Full build -> BM25 search over a corpus mixing ASCII, CJK, cyrillic
    and emoji turns: the unicode tokenizer path must flow through the
    whole engine (vectorized tokenize, postings, WAND) and single-char
    ideograph / katakana-run / unicode-word terms must be searchable."""
    import pandas as pd

    from rindex.build import build_index
    from rindex.search import IndexSearcher

    rows = [
        (0, 0, "the quick brown fox"),
        (0, 1, "漢字 text with ideographs 漢"),
        (1, 0, "Привет мир widely привет"),
        (1, 1, "katakana テスト run テスト"),
        (2, 0, "emoji 🚀 payload"),
        (2, 1, "plain ascii filler words"),
    ]
    t = pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.int64()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "text": pa.array([r[2] for r in rows], pa.string()),
        }
    )
    src = tmp_path / "uni"
    src.mkdir()
    pq.write_table(t, str(src / "part-0.parquet"))
    idx = str(tmp_path / "idx")
    build_index(
        str(src), idx, num_segments=2, mode="local", keep_cols=()
    )
    s = IndexSearcher(idx)
    # search() returns [(rank, conv_id, turn_idx, score)]
    for term, conv in [("漢", 0), ("привет", 1), ("テスト", 1), ("🚀", 2)]:
        res = s.search(term, k=3)
        assert len(res) >= 1, term
        assert int(res[0][1]) == conv, (term, res)
    # WAND == exhaustive on the unicode terms too
    a = s.search("漢 text", k=5, mode="or", algo="wand")
    b = s.search("漢 text", k=5, mode="or", algo="exhaustive")
    assert a == b
