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
_TOKEN_RE = re.compile(r"[0-9a-z]+(?:'[0-9a-z]+)*")


def standard_tokenize(text: str) -> list[str]:
    """Lowercase + segment one string.  Hot path is `map_batches` over Arrow
    string arrays calling this per row; the regex is module-level-compiled."""
    toks = _TOKEN_RE.findall(text.lower())
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


ANALYZERS: dict[str, Analyzer] = {
    "standard": Analyzer(name="standard"),
}


def register_analyzer(a: Analyzer) -> None:
    ANALYZERS[a.name] = a


def get_analyzer(name: str = "standard") -> Analyzer:
    return ANALYZERS[name]
