"""Classic Metaphone (rindex/ops/analysis_ext.py) — golden vectors derived
by hand from the published rule table (Philips 1990), plus structural
invariants.  The op is rows-only (no SQL oracle can express the rules)."""

import numpy as np
import pytest

from rindex.ops.analysis_ext import metaphone

GOLDENS = [
    # (word, code) — each derived rule-by-rule from the 1990 table
    ("the", "0"),            # TH -> 0, final vowel dropped
    ("fox", "FKS"),          # X -> KS (non-initial)
    ("brown", "BRN"),        # W dropped (no following vowel)
    ("quick", "KK"),         # Q -> K, CK -> K
    ("lazy", "LS"),          # Z -> S, trailing Y dropped
    ("dogs", "TKS"),         # D -> T, G -> K
    ("jumped", "JMPT"),      # final D -> T
    ("over", "OFR"),         # initial vowel kept, V -> F
    ("howl", "HL"),          # initial H before vowel kept
    ("testing", "TSTNK"),    # -ING: G -> K
    ("knight", "NT"),        # initial KN- drops K; GH silent mid-word
    ("school", "SKL"),       # SCH -> SK
    ("judge", "JJ"),         # DGE -> J
    ("phone", "FN"),         # PH -> F
    ("church", "XRX"),       # CH -> X
    ("xylophone", "SLFN"),   # initial X -> S
    ("wrack", "RK"),         # initial WR- drops W
    ("pneumonia", "NMN"),    # initial PN- drops P
    ("climb", "KLM"),        # final -MB: B silent
    ("nation", "NXN"),       # -TIO- -> X
    ("ocean", "OSN"),        # CE -> S (no H)
    ("watch", "WX"),         # -TCH-: T silent, CH -> X
    ("sign", "SN"),          # -GN: G silent
    ("letter", "LTR"),       # adjacent duplicates collapse
]


@pytest.mark.parametrize("word,code", GOLDENS)
def test_metaphone_goldens(word, code):
    assert metaphone(word) == code, word


def test_metaphone_structure():
    # codes contain only consonant symbols and the leading-vowel letter
    alphabet = set("0BFHJKLMNPRSTWXY") | set("AEIOU")
    rng = np.random.default_rng(3)
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    for k in rng.integers(1, 12, 200):
        w = "".join(rng.choice(letters, size=int(k)))
        c = metaphone(w)
        assert len(c) <= 6
        assert set(c) <= alphabet, (w, c)
    # vowels only survive at position 0
    for w in ("audio", "item", "echo"):
        c = metaphone(w)
        assert all(ch not in "AEIOU" for ch in c[1:]), (w, c)
    # determinism + case/punct insensitivity
    assert metaphone("Church!") == metaphone("church")
    assert metaphone("") == ""


# --------------------------------------------------------------- double

# Golden vectors for Double Metaphone (Philips 2000) — the well-published
# exemplar pairs from the article itself plus canonical single-code words.
DM_GOLDENS = [
    ("smith", ("SM0", "XMT")),
    ("schmidt", ("XMT", "SMT")),
    ("jose", ("HS", "HS")),
    ("xavier", ("SF", "SFR")),
    ("knight", ("NT", "NT")),
    ("gnome", ("NM", "NM")),
    ("wright", ("RT", "RT")),
    ("pneumonia", ("NMN", "NMN")),
    ("thomas", ("TMS", "TMS")),
    ("theodore", ("0TR", "TTR")),
    ("school", ("SKL", "SKL")),
    ("michael", ("MKL", "MXL")),
    ("caesar", ("SSR", "SSR")),
    ("chianti", ("KNT", "KNT")),
    ("edge", ("AJ", "AJ")),
    ("edgar", ("ATKR", "ATKR")),
    ("laugh", ("LF", "LF")),
    ("island", ("ALNT", "ALNT")),
    ("sugar", ("XKR", "SKR")),
    ("dumb", ("TM", "TM")),
    ("wasserman", ("ASRM", "FSRM")),
    ("filipowicz", ("FLPT", "FLPF")),
    ("zhao", ("J", "J")),
    ("accident", ("AKST", "AKST")),
    ("tagliaro", ("TKLR", "TLR")),
    ("arnow", ("ARN", "ARNF")),
    ("danger", ("TNJR", "TNKR")),
    ("ranger", ("RNJR", "RNKR")),
    ("anger", ("ANKR", "ANJR")),
]


@pytest.mark.parametrize("word,codes", DM_GOLDENS)
def test_double_metaphone_goldens(word, codes):
    from rindex.ops.dmetaphone import double_metaphone

    assert double_metaphone(word) == codes, word


def test_double_metaphone_structure():
    from rindex.ops.dmetaphone import double_metaphone

    alphabet = set("0AFHJKLMNPRSTX")
    rng = np.random.default_rng(5)
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    for k in rng.integers(1, 12, 300):
        w = "".join(rng.choice(letters, size=int(k)))
        p, a = double_metaphone(w)
        assert len(p) <= 4 and len(a) <= 4
        assert set(p) <= alphabet and set(a) <= alphabet, (w, p, a)
    assert double_metaphone("Church!") == double_metaphone("church")
    assert double_metaphone("") == ("", "")
