"""Analyzer goldens (BaseTokenStreamTestCase#assertAnalyzesTo analog)."""

from rindex.analysis import (
    get_analyzer,
    html_strip,
    make_length_filter,
    make_pattern_replace,
    make_stop_filter,
    standard_tokenize,
)
from rindex.schema import MAX_TOKEN_LEN


def test_standard_tokenize_goldens():
    assert standard_tokenize("Hello, World!") == ["hello", "world"]
    assert standard_tokenize("The quick-brown fox_42") == [
        "the", "quick", "brown", "fox", "42",
    ]
    assert standard_tokenize("don't STOP") == ["don't", "stop"]
    assert standard_tokenize("a  b\tc\nd") == ["a", "b", "c", "d"]
    assert standard_tokenize("") == []
    assert standard_tokenize("...!!!") == []
    assert standard_tokenize("3.14 v2.0") == ["3", "14", "v2", "0"]


def test_overlong_token_split():
    t = "x" * 700
    toks = standard_tokenize(t)
    assert toks == ["x" * MAX_TOKEN_LEN, "x" * MAX_TOKEN_LEN, "x" * 190]


def test_term_freqs():
    a = get_analyzer()
    tf = a.term_freqs("the cat and the hat")
    assert tf == {"the": 2, "cat": 1, "and": 1, "hat": 1}


def test_filters():
    stop = make_stop_filter({"the", "a"})
    assert stop(["the", "cat", "a", "hat"]) == ["cat", "hat"]
    ln = make_length_filter(2, 3)
    assert ln(["a", "ab", "abc", "abcd"]) == ["ab", "abc"]
    assert html_strip("<b>hi</b> there") == " hi  there"
    pr = make_pattern_replace(r"\d+", "#")
    assert pr("a1b22") == "a#b#"
