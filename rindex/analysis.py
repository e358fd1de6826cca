"""StandardAnalyzer-equivalent analysis chain, pluggable like the reference.

Reference semantics re-implemented (not ported):
  * StandardTokenizer — UAX#29-ish word segmentation with maxTokenLength=255
    (`lucene/core/src/java/org/apache/lucene/analysis/standard/
    StandardTokenizer.java`).  Our tokenizer is a documented simplification:
    alphanumeric runs (with word-internal apostrophes) over NFC text; tokens
    longer than MAX_TOKEN_LEN are split at MAX_TOKEN_LEN boundaries, matching
    the reference's overlong-token splitting behavior.
  * StandardAnalyzer — tokenizer + LowerCaseFilter, EMPTY stopword set by
    default in 8.x (`analysis/standard/StandardAnalyzer.java`).
  * StopFilter / LengthFilter / PorterStem — optional token filters
    (`lucene/analysis/common/.../core/StopFilter.java`, `en/PorterStemFilter`).

The in-repo BM25 oracle (rindex/oracle.py) uses this exact chain, which is
what defines the parity contract ("analyzed with the same chain" —
FIXTURES.md §2).

Extension surface mirrors the reference's analysis SPI
(`lucene/core/.../analysis/util/TokenizerFactory.java` + META-INF/services):
an Analyzer is char_filters (str->str) + a tokenizer + token_filters
(list[str]->list[str]), registered by name in ANALYZERS.
"""

from __future__ import annotations

import re
from collections import Counter
from dataclasses import dataclass, field
from typing import Callable

from rindex.schema import MAX_TOKEN_LEN

# Alphanumeric runs, keeping word-internal apostrophes ("don't" -> one token).
#
# CONTRACT (two formally pinned divergences from UAX#29 / the reference's
# StandardTokenizerImpl.jflex, frozen since r1 and mirrored by every SQL
# oracle's segmentation expression):
#   * MidNum (UAX#29 WB11/WB12; jflex {MidNumericEx}): the reference keeps
#     "3.14" / "2,718" as ONE <NUM> token when a MidNum punct sits between
#     digits; this regex splits them ("3", "14").
#   * ExtendNumLet (UAX#29 WB13a/WB13b; jflex {ExtendNumLetEx}): the
#     reference joins "foo_bar" into ONE <ALPHANUM> token via U+005F
#     ExtendNumLet; this regex splits it ("foo", "bar").
# Rationale: both rules fire on pure-ASCII text, i.e. inside the fast path
# whose byte-identity with the DuckDB oracle regexes is the correctness
# gate for all fulltext ops; changing either side means changing BOTH in
# lockstep across every oracle.  On the synthetic transcript corpus neither
# pattern affects ranking (no decimal-number or snake_case query terms in
# the reference query set).  tests/test_uax29_conformance.py pins both
# divergences with the rule ids above.
_TOKEN_RE = re.compile(r"[0-9a-z]+(?:'[0-9a-z]+)*")

# ---------------------------------------------------------------------------
# Unicode path (UAX#29 conformance, r4).  Pure-ASCII text takes the fast
# regex above, BIT-IDENTICAL to previous rounds (every SQL oracle segments
# with the same ASCII regex — the parity contract).  Non-ASCII text is NFC-
# normalized and segmented per the Lucene StandardTokenizer defaults
# (`lucene/core/.../analysis/standard/StandardTokenizerImpl.jflex`):
#   * IDEOGRAPHIC (CJK unified + compat) and HIRAGANA emit single-char
#     tokens (Lucene's CJK default), KATAKANA emits runs;
#   * emoji, including ZWJ sequences / VS16 / skin-tone modifiers, emit one
#     token per sequence (8.x EMOJI token type);
#   * any other letter/digit run is one token, with word-internal ASCII or
#     typographic (U+2019) apostrophes kept (MidLetter).
# DOCUMENTED DIVERGENCES from full UAX#29 (pinned by
# tests/test_uax29_conformance.py): (1) MidNum — "3.14"/"2,718" split at
# the separator where UAX#29 keeps one NUM token; (2) ExtendNumLet —
# "foo_bar" splits at '_' where UAX#29 joins; both are frozen because the
# ASCII fast path (and every oracle) segments that way; (3) Extend —
# combining marks outside NFC-composable pairs break a run.
_CJK = "\u3040-\u30ff\u3400-\u4dbf\u4e00-\u9fff\uf900-\ufaff"
_EMO = (
    "[\u2600-\u27bf\u2b00-\u2bff\U0001f000-\U0001faff]"
    "\ufe0f?[\U0001f3fb-\U0001f3ff]?"
)
_UW = rf"(?:(?![{_CJK}])[^\W_])"
_UNI_TOKEN_RE = re.compile(
    rf"{_EMO}(?:\u200d{_EMO})*"                 # emoji / ZWJ sequence
    rf"|[\u30a0-\u30ff]+"                       # katakana run
    rf"|[\u3040-\u309f]"                        # hiragana, single char
    rf"|[\u3400-\u4dbf\u4e00-\u9fff\uf900-\ufaff]"  # ideograph, 1 char
    rf"|{_UW}+(?:['\u2019]{_UW}+)*"              # letter/digit run + apos
)


def standard_tokenize(text: str) -> list[str]:
    """Lowercase + segment one string.  Hot path is `map_batches` over Arrow
    string arrays calling this per row; the regex is module-level-compiled.
    Pure-ASCII input (the whole synthetic corpus) takes the unchanged fast
    path; anything else takes the UAX#29-ish unicode path above."""
    low = text.lower()
    if low.isascii():
        toks = _TOKEN_RE.findall(low)
    else:
        import unicodedata

        toks = _UNI_TOKEN_RE.findall(unicodedata.normalize("NFC", low))
    out = []
    for t in toks:
        if len(t) <= MAX_TOKEN_LEN:
            out.append(t)
        else:
            out.extend(
                t[i : i + MAX_TOKEN_LEN] for i in range(0, len(t), MAX_TOKEN_LEN)
            )
    return out


@dataclass
class Analyzer:
    """Ordered chain: char_filters -> tokenizer -> token_filters."""

    name: str = "standard"
    char_filters: list[Callable[[str], str]] = field(default_factory=list)
    tokenizer: Callable[[str], list[str]] = standard_tokenize
    token_filters: list[Callable[[list[str]], list[str]]] = field(
        default_factory=list
    )

    def tokens(self, text: str) -> list[str]:
        for cf in self.char_filters:
            text = cf(text)
        toks = self.tokenizer(text)
        for tf in self.token_filters:
            toks = tf(toks)
        return toks

    def term_freqs(self, text: str) -> Counter:
        return Counter(self.tokens(text))


def make_stop_filter(stopwords: set[str]) -> Callable[[list[str]], list[str]]:
    """StopFilter analog; the dict is tiny -> closure capture, no actor."""
    sw = frozenset(stopwords)
    return lambda toks: [t for t in toks if t not in sw]


def make_length_filter(min_len: int, max_len: int) -> Callable[[list[str]], list[str]]:
    return lambda toks: [t for t in toks if min_len <= len(t) <= max_len]


def html_strip(text: str) -> str:
    """HTMLStripCharFilter analog (regex simplification)."""
    return re.sub(r"<[^>]*>", " ", text)


def make_pattern_replace(pattern: str, repl: str) -> Callable[[str], str]:
    """PatternReplaceCharFilter analog."""
    rx = re.compile(pattern)
    return lambda text: rx.sub(repl, text)


# ---------------------------------------------------------------------------
# PorterStemFilter analog — the Porter (1980) suffix-stripping algorithm,
# re-implemented from the published paper (public); reference semantics:
# `lucene/analysis/common/src/java/org/apache/lucene/analysis/en/
# PorterStemFilter.java` + `PorterStemmer.java`.
# ---------------------------------------------------------------------------

_VOWELS = frozenset("aeiou")


def _is_cons(w: str, i: int) -> bool:
    c = w[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _is_cons(w, i - 1)
    return True


def _measure(w: str) -> int:
    """m in [C](VC)^m[V]."""
    n, i, m = len(w), 0, 0
    while i < n and _is_cons(w, i):
        i += 1
    while i < n:
        while i < n and not _is_cons(w, i):
            i += 1
        if i >= n:
            break
        m += 1
        while i < n and _is_cons(w, i):
            i += 1
    return m


def _has_vowel(w: str) -> bool:
    return any(not _is_cons(w, i) for i in range(len(w)))


def _ends_cvc(w: str) -> bool:
    if len(w) < 3:
        return False
    return (
        _is_cons(w, len(w) - 3)
        and not _is_cons(w, len(w) - 2)
        and _is_cons(w, len(w) - 1)
        and w[-1] not in "wxy"
    )


_STEP2 = [
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
    ("izer", "ize"), ("abli", "able"), ("alli", "al"), ("entli", "ent"),
    ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
    ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
    ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
]
_STEP3 = [
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
]
_STEP4 = [
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
]


def porter_stem(w: str) -> str:
    if len(w) <= 2:
        return w
    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif not w.endswith("ss") and w.endswith("s"):
        w = w[:-1]
    # step 1b
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    else:
        hit = None
        if w.endswith("ed") and _has_vowel(w[:-2]):
            hit = w = w[:-2]
        elif w.endswith("ing") and _has_vowel(w[:-3]):
            hit = w = w[:-3]
        if hit is not None:
            if w.endswith(("at", "bl", "iz")):
                w += "e"
            elif (
                len(w) >= 2
                and w[-1] == w[-2]
                and _is_cons(w, len(w) - 1)
                and w[-1] not in "lsz"
            ):
                w = w[:-1]
            elif _measure(w) == 1 and _ends_cvc(w):
                w += "e"
    # step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"
    # step 2 (longest matching suffix, apply iff m(stem) > 0)
    for suf, rep in sorted(_STEP2, key=lambda x: -len(x[0])):
        if w.endswith(suf):
            if _measure(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break
    # step 3
    for suf, rep in sorted(_STEP3, key=lambda x: -len(x[0])):
        if w.endswith(suf):
            if _measure(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break
    # step 4 (m(stem) > 1; 'ion' additionally requires stem ending s/t)
    for suf in sorted(_STEP4, key=len, reverse=True):
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 1 and (
                suf != "ion" or stem.endswith(("s", "t"))
            ):
                w = stem
            break
    # step 5a
    if w.endswith("e"):
        m = _measure(w[:-1])
        if m > 1 or (m == 1 and not _ends_cvc(w[:-1])):
            w = w[:-1]
    # step 5b
    if (
        len(w) >= 2
        and w[-1] == "l"
        and w[-1] == w[-2]
        and _measure(w) > 1
    ):
        w = w[:-1]
    return w


def porter_stem_filter(toks: list[str]) -> list[str]:
    return [porter_stem(t) for t in toks]


# ---------------------------------------------------------------------------
# Porter2 / Snowball English stemmer — the SnowballPorterFilterFactory
# default ("English").  Implemented from the published Snowball definition
# (snowballstem.org "The English (Porter2) stemming algorithm"; reference:
# `lucene/analysis/common/src/java/org/apache/lucene/analysis/snowball/
# SnowballFilter.java` + the generated `EnglishStemmer`).  R1/R2 are
# POSITIONS computed once up front (with the gener/commun/arsen prefix
# exception) and compared against suffix start indices, exactly like the
# generated Snowball code — suffix rewrites never invalidate them.
# ---------------------------------------------------------------------------

_P2_VOWELS = frozenset("aeiouy")  # 'y' handled via the Y-marking pass
_P2_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_P2_LI_END = frozenset("cdeghkmnrt")
_P2_EXC1 = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    "sky": "sky", "news": "news", "howe": "howe", "atlas": "atlas",
    "cosmos": "cosmos", "bias": "bias", "andes": "andes",
}
_P2_EXC2 = frozenset(
    ("inning", "outing", "canning", "herring", "earring",
     "proceed", "exceed", "succeed")
)
_P2_STEP2 = [  # (suffix, replacement) — longest-match-first at lookup
    ("ization", "ize"), ("ational", "ate"), ("fulness", "ful"),
    ("ousness", "ous"), ("iveness", "ive"), ("tional", "tion"),
    ("biliti", "ble"), ("lessli", "less"), ("entli", "ent"),
    ("ation", "ate"), ("alism", "al"), ("aliti", "al"), ("ousli", "ous"),
    ("iviti", "ive"), ("fulli", "ful"), ("enci", "ence"), ("anci", "ance"),
    ("abli", "able"), ("izer", "ize"), ("ator", "ate"), ("alli", "al"),
    ("bli", "ble"), ("ogi", "og"), ("li", ""),
]
_P2_STEP3 = [
    ("ational", "ate"), ("tional", "tion"), ("alize", "al"), ("icate", "ic"),
    ("iciti", "ic"), ("ative", ""), ("ical", "ic"), ("ness", ""), ("ful", ""),
]
_P2_STEP4 = [
    "ement", "ance", "ence", "able", "ible", "ment", "ant", "ent", "ism",
    "ate", "iti", "ous", "ive", "ize", "ion", "al", "er", "ic",
]


def _p2_mark_vowels(w: str) -> str:
    """Mark consonant-y as Y: initial y, and y right after a (still
    unmarked) vowel — the single left-to-right pass of english.sbl, so a
    y following a marked Y stays a vowel ('sayyid' -> 'saYyid')."""
    out = []
    for i, c in enumerate(w):
        if c == "y" and (i == 0 or out[-1] in "aeiouy"):
            out.append("Y")
        else:
            out.append(c)
    return "".join(out)


def _p2_regions(w: str) -> tuple[int, int]:
    """(r1, r2) start positions; gener/commun/arsen prefix exception."""
    n = len(w)
    r1 = n
    for pre in ("gener", "commun", "arsen"):
        if w.startswith(pre):
            r1 = len(pre)
            break
    else:
        # standard: after the first non-vowel following a vowel
        i = 0
        while i < n and w[i] not in "aeiouy":
            i += 1
        while i < n and w[i] in "aeiouy":
            i += 1
        r1 = i + 1 if i < n else n
    r2 = r1
    i = r1
    while i < n and w[i] not in "aeiouy":
        i += 1
    while i < n and w[i] in "aeiouy":
        i += 1
    r2 = i + 1 if i < n else n
    return r1, r2


def _p2_short_syllable_end(w: str) -> bool:
    """Word ends in a short syllable: non-vowel + vowel + non-vowel(!wxY),
    or (word == vowel + non-vowel)."""
    n = len(w)
    if n == 2:
        return w[0] in "aeiouy" and w[1] not in "aeiouy"
    if n >= 3:
        return (
            w[-3] not in "aeiouy"
            and w[-2] in "aeiouy"
            and w[-1] not in "aeiouy"
            and w[-1] not in "wxY"
        )
    return False


def porter2_stem(word: str) -> str:
    if len(word) <= 2:
        return word
    w = word
    if w[0] == "'":
        w = w[1:]
    exc = _P2_EXC1.get(w)
    if exc is not None:
        return exc
    w = _p2_mark_vowels(w)
    r1, r2 = _p2_regions(w)

    # step 0: longest of 's'  's  '
    for suf in ("'s'", "'s", "'"):
        if w.endswith(suf):
            w = w[: -len(suf)]
            break
    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith(("ied", "ies")):
        w = w[:-3] + ("i" if len(w) > 4 else "ie")
    elif w.endswith(("us", "ss")):
        pass
    elif w.endswith("s"):
        if any(c in "aeiouy" for c in w[:-2]):
            w = w[:-1]
    if w in _P2_EXC2:
        return w.replace("Y", "y")
    # step 1b: longest of eedly eed ingly edly ing ed
    if w.endswith(("eedly", "eed")):
        suf = "eedly" if w.endswith("eedly") else "eed"
        if len(w) - len(suf) >= r1:
            w = w[: -len(suf)] + "ee"
    else:
        for suf in ("ingly", "edly", "ing", "ed"):
            if w.endswith(suf):
                stem = w[: -len(suf)]
                if any(c in "aeiouy" for c in stem):
                    w = stem
                    if w.endswith(("at", "bl", "iz")):
                        w += "e"
                    elif w.endswith(_P2_DOUBLES):
                        w = w[:-1]
                    elif _p2_short_syllable_end(w) and r1 >= len(w):
                        w += "e"
                break
    # step 1c: y/Y -> i after a non-vowel that is not the first letter
    if (
        len(w) >= 3
        and w[-1] in "yY"
        and w[-2] not in "aeiouy"
    ):
        w = w[:-1] + "i"
    # step 2 (suffix must lie in R1)
    for suf, rep in _P2_STEP2:
        if w.endswith(suf):
            if len(w) - len(suf) >= r1:
                if suf == "ogi":
                    if w.endswith("logi"):
                        w = w[:-1]
                elif suf == "li":
                    if len(w) >= 3 and w[-3] in _P2_LI_END:
                        w = w[:-2]
                else:
                    w = w[: -len(suf)] + rep
            break
    # step 3 (in R1; 'ative' additionally requires R2)
    for suf, rep in _P2_STEP3:
        if w.endswith(suf):
            if len(w) - len(suf) >= r1:
                if suf == "ative":
                    if len(w) - len(suf) >= r2:
                        w = w[: -len(suf)]
                else:
                    w = w[: -len(suf)] + rep
            break
    # step 4 (in R2; 'ion' requires preceding s/t)
    for suf in _P2_STEP4:
        if w.endswith(suf):
            if len(w) - len(suf) >= r2 and (
                suf != "ion" or (len(w) > len(suf) and w[-4] in "st")
            ):
                w = w[: -len(suf)]
            break
    # step 5
    if w.endswith("e"):
        if len(w) - 1 >= r2 or (
            len(w) - 1 >= r1 and not _p2_short_syllable_end(w[:-1])
        ):
            w = w[:-1]
    elif w.endswith("ll") and len(w) - 1 >= r2:
        w = w[:-1]
    return w.replace("Y", "y")


def porter2_stem_filter(toks: list[str]) -> list[str]:
    return [porter2_stem(t) for t in toks]


# ---------------------------------------------------------------------------
# KStem (Krovetz stemmer) — inflectional subset
# ---------------------------------------------------------------------------

# Dictionary-first inflectional stemming per Krovetz, "Viewing morphology
# as an inference process" (SIGIR 1993); reference implementation
# `lucene/analysis/common/src/java/org/apache/lucene/analysis/en/
# KStemmer.java`.  KStem ONLY undoes inflectional morphology (plural,
# past tense, present participle) and consults its lexicon BEFORE every
# step — a word found in the dictionary is never stemmed further.  The
# reference ships a ~30k-entry lexicon as Java resources; this subset
# inlines the base forms that matter for the corpus + common English
# false-suffix words (seed/speed/during/...), documented as the lexicon
# stand-in.  The SQL oracle cascade in ops/analysis_ext.py is GENERATED
# from these same constants, so the two sides cannot drift.

KSTEM_LEX = frozenset("""
as is was has his its this thus yes does goes news series species
analysis basis axis status various previous alias bias gas bus canvas
always perhaps
seed speed need feed breed deed indeed hundred red bed shed sled fled
wed embed exceed proceed succeed bleed greed
thing something anything everything nothing king ring sing wing string
spring during morning evening being sterling setting
""".split())

# base forms ending in 'e' whose -ed / -ing forms drop it (storing ->
# store); the e-restoration list of the aspect/past steps
KSTEM_E_WORDS = frozenset("""
use store cache compute merge create update delete write make take parse
scale tune remove improve reduce increase release share combine pipeline
schedule encode decode include exclude provide require define note queue
issue execute expire evaluate estimate aggregate iterate rotate mutate
validate generate operate separate compare prepare profile enable disable
handle bundle sample measure ensure configure capture feature time type
pipe probe trace place replace slice reuse fuse close expose compose move
prove serve observe reserve save solve resolve involve arrive drive like
invoke revoke range change manage page stage
""".split())

KSTEM_SIBILANT_ES = ("sses", "ches", "shes", "xes", "zes")


def kstem(w: str) -> str:
    """Krovetz inflectional stem of a lowercase token.  Three steps —
    plural, past tense, -ing — each entered only if the current form is
    not in the lexicon (dictionary-first), with e-restoration and
    doubled-consonant undo on the verbal suffixes."""
    # plural
    if len(w) <= 2 or w in KSTEM_LEX:
        return w
    if w.endswith("ies") and len(w) > 4:
        w = w[:-3] + "y"
    elif w.endswith(KSTEM_SIBILANT_ES):
        w = w[:-2]
    elif w.endswith("s") and len(w) > 3 and not w.endswith(("ss", "us", "is")):
        w = w[:-1]
    # past tense
    if len(w) <= 2 or w in KSTEM_LEX:
        return w
    if w.endswith("ied") and len(w) > 4:
        w = w[:-3] + "y"
    elif w.endswith("ed") and len(w) > 3:
        stem = w[:-2]
        if stem + "e" in KSTEM_E_WORDS:
            w = stem + "e"
        elif len(stem) > 2 and stem[-1] == stem[-2] and stem[-1] not in "lsz":
            w = stem[:-1]
        else:
            w = stem
    # present participle
    if len(w) <= 2 or w in KSTEM_LEX:
        return w
    if w.endswith("ing") and len(w) > 4:
        stem = w[:-3]
        if stem + "e" in KSTEM_E_WORDS:
            w = stem + "e"
        elif len(stem) > 2 and stem[-1] == stem[-2] and stem[-1] not in "lsz":
            w = stem[:-1]
        else:
            w = stem
    return w


def kstem_filter(toks: list[str]) -> list[str]:
    return [kstem(t) for t in toks]


def ascii_fold(text: str) -> str:
    """ASCIIFoldingFilter analog (accent-folding subset: NFD decompose +
    drop combining marks — 'café' -> 'cafe', 'Åland' -> 'Aland').  Matches
    the SQL oracle's strip_accents semantics exactly; the reference's full
    Latin-1 ligature table (æ->ae etc.) is out of this subset and ligature
    chars pass through unchanged on BOTH sides.  Reference:
    `lucene/analysis/common/.../miscellaneous/ASCIIFoldingFilter.java`."""
    import unicodedata

    if text.isascii():  # hot-path: corpus text is ASCII
        return text
    return "".join(
        c for c in unicodedata.normalize("NFD", text)
        if not unicodedata.combining(c)
    )


def trim_filter(toks: list[str]) -> list[str]:
    """TrimFilter analog — strips surrounding whitespace from tokens
    (meaningful with the keyword tokenizer; the standard tokenizer never
    emits whitespace).  `lucene/analysis/common/.../miscellaneous/
    TrimFilter.java`."""
    return [t.strip() for t in toks]


def keyword_tokenize(text: str) -> list[str]:
    """KeywordTokenizer analog: the whole input as ONE token
    (`lucene/core/.../analysis/core/KeywordTokenizer.java`)."""
    return [text]


def make_mapping_char_filter(
    mapping: dict[str, str]
) -> Callable[[str], str]:
    """MappingCharFilter analog: longest-match-first literal rewrites over
    the char stream, applied in one pass with a compiled alternation (so a
    shorter key can never pre-empt a longer one at the same position).
    `lucene/analysis/common/.../charfilter/MappingCharFilter.java`."""
    keys = sorted(mapping, key=len, reverse=True)
    rx = re.compile("|".join(re.escape(k) for k in keys))
    return lambda text: rx.sub(lambda m: mapping[m.group(0)], text)


def make_char_ngram_tokenizer(
    min_n: int, max_n: int
) -> Callable[[str], list[str]]:
    """NGramTokenizer analog (char n-grams).  Documented simplification:
    grams are emitted within each lowercase alphanumeric run (the
    reference's default token chars), shortest-first per position.
    `lucene/analysis/common/.../ngram/NGramTokenizer.java`."""

    def tok(text: str) -> list[str]:
        out = []
        for run in _TOKEN_RE.findall(text.lower()):
            for n in range(min_n, max_n + 1):
                out.extend(
                    run[i : i + n] for i in range(0, len(run) - n + 1)
                )
        return out

    return tok


def english_minimal_stem(w: str) -> str:
    """EnglishMinimalStemFilter analog — S-stemmer: strip one final 's'
    unless the word is shorter than 3 chars or ends in 'ss'/'us'
    (`lucene/analysis/common/.../en/EnglishMinimalStemFilter.java`,
    EnglishMinimalStemmer)."""
    if len(w) < 3 or not w.endswith("s") or w[-2] in ("s", "u"):
        return w
    return w[:-1]


def english_minimal_stem_filter(toks: list[str]) -> list[str]:
    return [english_minimal_stem(t) for t in toks]


def make_synonym_filter(
    mapping: dict[str, str]
) -> Callable[[list[str]], list[str]]:
    """SynonymGraphFilter analog restricted to single-token replacement
    synonyms (canonicalization); the dict is held by the caller's actor
    (`lucene/analysis/common/.../synonym/SynonymGraphFilter.java`)."""
    return lambda toks: [mapping.get(t, t) for t in toks]


def english_possessive_filter(toks: list[str]) -> list[str]:
    """EnglishPossessiveFilter analog — strip trailing 's
    (`lucene/analysis/common/.../en/EnglishPossessiveFilter.java`)."""
    return [t[:-2] if t.endswith("'s") else t for t in toks]


# French elision articles (`lucene/analysis/common/.../util/ElisionFilter
# .java` + the French default article set in FrenchAnalyzer)
_ELISION_ARTICLES = frozenset(
    ["l", "m", "t", "qu", "n", "s", "j", "d", "c", "jusqu", "quoiqu",
     "lorsqu", "puisqu"]
)


def elision_filter(toks: list[str]) -> list[str]:
    """ElisionFilter analog: strip a leading article + apostrophe
    (l'élève -> élève); tokens keep word-internal apostrophes so the
    head is whatever precedes the FIRST apostrophe."""
    out = []
    for t in toks:
        if "'" in t:
            head, rest = t.split("'", 1)
            if head in _ELISION_ARTICLES and rest:
                out.append(rest)
                continue
        out.append(t)
    return out


def make_truncate_filter(n: int) -> Callable[[list[str]], list[str]]:
    """TruncateTokenFilterFactory analog (prefixLength=n)."""
    return lambda toks: [t[:n] for t in toks]


def make_limit_token_count_filter(n: int) -> Callable[[list[str]], list[str]]:
    """LimitTokenCountFilter analog: keep only the first n tokens."""
    return lambda toks: toks[:n]


def whitespace_tokenize(text: str) -> list[str]:
    """WhitespaceTokenizer (+ LowerCaseFilter) analog: split on
    whitespace only, punctuation KEPT inside tokens
    (`lucene/core/.../analysis/core/WhitespaceTokenizer.java`)."""
    return text.lower().split()


# URL and email alternatives FIRST (leftmost-first alternation — both
# Python re and DuckDB's RE2 use PCRE-style preference order, so the SQL
# oracle segments identically), then the standard word pattern.
URLEMAIL_SQL_RE = (
    r"https?://[a-z0-9.-]+(?:/[a-z0-9._/?=&%-]*)?"
    r"|[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
    r"|[0-9a-z]+(?:'[0-9a-z]+)*"
)
_URLEMAIL_RE = re.compile(URLEMAIL_SQL_RE)


def urlemail_tokenize(text: str) -> list[str]:
    """UAX29URLEmailTokenizer analog (`lucene/analysis/common/.../
    standard/UAX29URLEmailTokenizer.java` + its JFlex grammar): standard
    word segmentation, except URLs and email addresses are kept as ONE
    token each (the <URL> / <EMAIL> token types).  Simplified scheme
    subset (http/https URLs, RFC-ish emails) — the full JFlex grammar
    also covers ftp/file and IP hosts."""
    return _URLEMAIL_RE.findall(text.lower())


def hyphen_join(text: str) -> str:
    """HyphenatedWordsFilter analog as a char filter: rejoin words
    hyphenated across whitespace/line breaks
    (`lucene/analysis/common/.../miscellaneous/HyphenatedWordsFilter
    .java` semantics approximated pre-tokenize)."""
    return re.sub(r"-\s+", "", text)


def capitalization_filter(toks: list[str]) -> list[str]:
    """CapitalizationFilter analog — upper-case the first letter of each
    token (`lucene/analysis/common/.../miscellaneous/CapitalizationFilter
    .java`, default onlyFirstWord=false over already-lowercased input)."""
    return [t[:1].upper() + t[1:] for t in toks]


def reverse_string_filter(toks: list[str]) -> list[str]:
    """ReverseStringFilter analog (`lucene/analysis/common/.../reverse/
    ReverseStringFilter.java`) — the building block behind
    ReversedWildcardFilterFactory's leading-wildcard acceleration."""
    return [t[::-1] for t in toks]


def letter_tokenize(text: str) -> list[str]:
    """LetterTokenizer analog (`lucene/analysis/common/.../core/
    LetterTokenizer.java`): maximal letter runs; digits and punctuation
    split.  ASCII fast path mirrors the SQL oracle regex exactly."""
    low = text.lower()
    if low.isascii():
        return _LETTER_RE.findall(low)
    return _UNI_LETTER_RE.findall(low)


_LETTER_RE = re.compile(r"[a-z]+")
_UNI_LETTER_RE = re.compile(r"[^\W\d_]+")


def make_fingerprint_filter(sep: str = "_") -> Callable[[list[str]], list[str]]:
    """Solr FingerprintFilter analog (`lucene/analysis/common/.../
    miscellaneous/FingerprintFilter.java`): the whole stream collapses to
    ONE token — sorted unique terms joined by `sep`."""

    def f(toks: list[str]) -> list[str]:
        return [sep.join(sorted(set(toks)))] if toks else []

    return f


def keyword_repeat_sstem_filter(toks: list[str]) -> list[str]:
    """KeywordRepeatFilter + EnglishMinimalStem + RemoveDuplicates analog
    (`lucene/analysis/common/.../miscellaneous/KeywordRepeatFilter.java`,
    `.../miscellaneous/RemoveDuplicatesTokenFilter.java`): each position
    emits the original AND its stem, duplicates at a position removed."""
    out = []
    for t in toks:
        s = english_minimal_stem(t)
        out.append(t)
        if s != t:
            out.append(s)
    return out


_CAP_ALPHA_RE = re.compile(r"[a-z]+")
_CAP_DIGIT_RE = re.compile(r"[0-9]+")


def pattern_capture_filter(toks: list[str]) -> list[str]:
    """PatternCaptureGroupTokenFilter analog (`lucene/analysis/common/.../
    pattern/PatternCaptureGroupTokenFilter.java`, preserve_original=true)
    with the capture patterns ([a-z]+) and ([0-9]+): each token emits
    itself plus its distinct letter runs and digit runs."""
    out = []
    for t in toks:
        seen = {t}
        out.append(t)
        for m in _CAP_ALPHA_RE.findall(t):
            if m not in seen:
                seen.add(m)
                out.append(m)
        for m in _CAP_DIGIT_RE.findall(t):
            if m not in seen:
                seen.add(m)
                out.append(m)
    return out


def apostrophe_filter(toks: list[str]) -> list[str]:
    """ApostropheFilter analog (`lucene/analysis/common/.../tr/
    ApostropheFilter.java`, Turkish convention): keep only the part
    before the first apostrophe."""
    return [t.partition("'")[0] for t in toks]


KEYWORD_PROTECTED = frozenset({"always", "perhaps", "its"})


def keyword_marker_sstem_filter(toks: list[str]) -> list[str]:
    """KeywordMarkerFilter + EnglishMinimalStem analog (`lucene/analysis/
    common/.../miscellaneous/SetKeywordMarkerFilter.java`): tokens in the
    protected set bypass the stemmer."""
    return [
        t if t in KEYWORD_PROTECTED else english_minimal_stem(t)
        for t in toks
    ]


_DIGIT_RUN_RE = re.compile(r"[0-9]+")


def pattern_replace_token_filter(toks: list[str]) -> list[str]:
    """PatternReplaceFilter analog (`lucene/analysis/common/.../pattern/
    PatternReplaceFilter.java`, replaceAll): digit runs collapse to '0'
    — the number-bucketing normalization."""
    return [_DIGIT_RUN_RE.sub("0", t) for t in toks]


def type_token_num_filter(toks: list[str]) -> list[str]:
    """TypeTokenFilter analog keeping only <NUM>-typed tokens
    (`lucene/analysis/common/.../core/TypeTokenFilter.java`; the
    StandardTokenizer types a pure-digit run as <NUM>)."""
    return [t for t in toks if t.isdigit()]


STEM_OVERRIDES = {"data": "datum", "criteria": "criterion"}


def stemmer_override_filter(toks: list[str]) -> list[str]:
    """StemmerOverrideFilter + EnglishMinimalStem analog (`lucene/analysis/
    common/.../miscellaneous/StemmerOverrideFilter.java`): dictionary
    entries map straight to their override stem and BYPASS the stemmer;
    everything else stems normally."""
    return [
        STEM_OVERRIDES.get(t) or english_minimal_stem(t) for t in toks
    ]


def conditional_reverse_filter(toks: list[str]) -> list[str]:
    """ConditionalTokenFilter analog (`lucene/analysis/common/.../
    miscellaneous/ConditionalTokenFilter.java`, the Lucene 8 wrapper
    ProtectedTermFilterFactory builds on): the wrapped filter (here
    ReverseStringFilter) applies ONLY to tokens longer than 4 chars;
    short tokens pass through untouched."""
    return [t[::-1] if len(t) > 4 else t for t in toks]


_SCAND_MAP = str.maketrans("\u00e5\u00e4\u00e6\u00f6\u00f8", "aaaoo")


def scandinavian_fold_filter(toks: list[str]) -> list[str]:
    """ScandinavianFoldingFilter (`lucene/analysis/common/src/java/org/
    apache/lucene/analysis/miscellaneous/ScandinavianFoldingFilter.java`):
    folds lowercase a-ring/a-umlaut/ae-ligature -> a and o-umlaut/
    o-slash -> o, and collapses the digraphs aa/ao/ae/oe/oo to their
    first vowel (the javadoc's "discriminates against double vowels"
    rule; a triple vowel leaves one pair, as the reference's single
    forward scan does)."""
    out = []
    for t in toks:
        t = t.translate(_SCAND_MAP)
        for dg, rep in (("aa", "a"), ("ao", "a"), ("ae", "a"),
                        ("oe", "o"), ("oo", "o")):
            t = t.replace(dg, rep)
        out.append(t)
    return out


def turkish_lowercase_charfilter(s: str) -> str:
    """TurkishLowerCaseFilter semantics hoisted to a char filter
    (`lucene/analysis/common/.../tr/TurkishLowerCaseFilter.java`): ASCII
    I lowercases to DOTLESS i (U+0131) and dotted capital I (U+0130) to
    ASCII i, BEFORE the standard pipeline's own lowercasing (which would
    wrongly produce a dotted i for I)."""
    return s.replace("\u0130", "i").replace("I", "\u0131")


def decimal_digit_charfilter(s: str) -> str:
    """DecimalDigitFilter semantics as a char filter (`lucene/analysis/
    common/.../core/DecimalDigitFilter.java`): every Unicode decimal
    digit folds to its ASCII 0-9 value (Arabic-Indic, Devanagari, ...);
    ASCII digits pass through untouched."""
    if s.isascii():
        return s
    import unicodedata

    out = []
    for ch in s:
        d = unicodedata.decimal(ch, None)
        out.append(chr(ord("0") + d) if d is not None else ch)
    return "".join(out)



ANALYZERS: dict[str, Analyzer] = {
    "standard": Analyzer(name="standard"),
    "ascii_folding": Analyzer(
        name="ascii_folding", char_filters=[ascii_fold]
    ),
    "keyword_trim": Analyzer(
        name="keyword_trim",
        tokenizer=keyword_tokenize,
        token_filters=[trim_filter],
    ),
    "en_minimal_stem": Analyzer(
        name="en_minimal_stem", token_filters=[english_minimal_stem_filter]
    ),
    "en_snowball": Analyzer(
        name="en_snowball", token_filters=[porter2_stem_filter]
    ),
    "en_kstem": Analyzer(name="en_kstem", token_filters=[kstem_filter]),
    "en_possessive": Analyzer(
        name="en_possessive", token_filters=[english_possessive_filter]
    ),
    "elision": Analyzer(name="elision", token_filters=[elision_filter]),
    "truncate4": Analyzer(
        name="truncate4", token_filters=[make_truncate_filter(4)]
    ),
    "limit50": Analyzer(
        name="limit50", token_filters=[make_limit_token_count_filter(50)]
    ),
    "whitespace": Analyzer(name="whitespace", tokenizer=whitespace_tokenize),
    "url_email": Analyzer(name="url_email", tokenizer=urlemail_tokenize),
    "hyphen_join": Analyzer(name="hyphen_join", char_filters=[hyphen_join]),
    "capitalization": Analyzer(
        name="capitalization", token_filters=[capitalization_filter]
    ),
    "reverse": Analyzer(name="reverse", token_filters=[reverse_string_filter]),
    "letter": Analyzer(name="letter", tokenizer=letter_tokenize),
    "fingerprint": Analyzer(
        name="fingerprint", token_filters=[make_fingerprint_filter("_")]
    ),
    "keyword_repeat_sstem": Analyzer(
        name="keyword_repeat_sstem",
        token_filters=[keyword_repeat_sstem_filter],
    ),
    "pattern_capture": Analyzer(
        name="pattern_capture", token_filters=[pattern_capture_filter]
    ),
    "type_num": Analyzer(name="type_num", token_filters=[type_token_num_filter]),
    "apostrophe": Analyzer(name="apostrophe", token_filters=[apostrophe_filter]),
    "keyword_marker_sstem": Analyzer(
        name="keyword_marker_sstem", token_filters=[keyword_marker_sstem_filter]
    ),
    "pattern_replace_digits": Analyzer(
        name="pattern_replace_digits",
        token_filters=[pattern_replace_token_filter],
    ),
    "stemmer_override": Analyzer(
        name="stemmer_override", token_filters=[stemmer_override_filter]
    ),
    "scandinavian_fold": Analyzer(
        name="scandinavian_fold", token_filters=[scandinavian_fold_filter]
    ),
    "turkish_lower": Analyzer(
        name="turkish_lower", char_filters=[turkish_lowercase_charfilter]
    ),
    "decimal_digit": Analyzer(
        name="decimal_digit", char_filters=[decimal_digit_charfilter]
    ),
    "conditional_reverse": Analyzer(
        name="conditional_reverse",
        token_filters=[conditional_reverse_filter],
    ),
}


def register_analyzer(a: Analyzer) -> None:
    ANALYZERS[a.name] = a


def get_analyzer(name: str = "standard") -> Analyzer:
    return ANALYZERS[name]
