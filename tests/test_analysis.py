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


def test_porter_stem_paper_examples():
    """Full-pipeline outputs for the example vocabulary of Porter (1980);
    expected values are the canonical algorithm's end-to-end stems."""
    from rindex.analysis import porter_stem

    cases = {
        "caresses": "caress", "ponies": "poni", "ties": "ti",
        "caress": "caress", "cats": "cat", "feed": "feed",
        "agreed": "agre", "plastered": "plaster", "bled": "bled",
        "motoring": "motor", "sing": "sing", "conflated": "conflat",
        "troubled": "troubl", "sized": "size", "hopping": "hop",
        "tanned": "tan", "falling": "fall", "hissing": "hiss",
        "fizzed": "fizz", "failing": "fail", "filing": "file",
        "happy": "happi", "sky": "sky", "relational": "relat",
        "conditional": "condit", "rational": "ration",
        "valenci": "valenc", "hesitanci": "hesit", "digitizer": "digit",
        "radicalli": "radic", "differentli": "differ", "vileli": "vile",
        "analogousli": "analog", "vietnamization": "vietnam",
        "predication": "predic", "operator": "oper", "feudalism": "feudal",
        "decisiveness": "decis", "hopefulness": "hope",
        "callousness": "callous", "formaliti": "formal",
        "sensitiviti": "sensit", "sensibiliti": "sensibl",
        "triplicate": "triplic", "formative": "form", "formalize": "formal",
        "electriciti": "electr", "electrical": "electr", "hopeful": "hope",
        "goodness": "good", "revival": "reviv", "allowance": "allow",
        "inference": "infer", "airliner": "airlin",
        "gyroscopic": "gyroscop", "adjustable": "adjust",
        "defensible": "defens", "irritant": "irrit",
        "replacement": "replac", "adjustment": "adjust",
        "dependent": "depend", "adoption": "adopt", "communism": "commun",
        "activate": "activ", "angulariti": "angular",
        "homologous": "homolog", "effective": "effect",
        "bowdlerize": "bowdler", "probate": "probat", "rate": "rate",
        "cease": "ceas", "controll": "control", "roll": "roll",
    }
    bad = {
        w: (porter_stem(w), want)
        for w, want in cases.items()
        if porter_stem(w) != want
    }
    assert not bad, bad


def test_porter2_snowball_examples():
    """Porter2 (Snowball English): the spec's own exceptional forms and
    step examples, plus end-to-end traces through R1/R2.  Divergences from
    Porter (1980) are pinned on purpose: ties->tie (not ti), argument kept
    (Porter1 gives argu), gener-/commun-/arsen- R1 prefix exception."""
    from rindex.analysis import porter2_stem

    cases = {
        # exceptional forms + post-1a invariants (verbatim from the spec)
        "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
        "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
        "early": "earli", "only": "onli", "singly": "singl", "sky": "sky",
        "news": "news", "atlas": "atlas", "cosmos": "cosmos", "bias": "bias",
        "andes": "andes", "inning": "inning", "outing": "outing",
        "canning": "canning", "herring": "herring", "earring": "earring",
        "proceed": "proceed", "exceed": "exceed", "succeed": "succeed",
        # step 1a examples from the definition
        "ties": "tie", "cries": "cri", "gas": "gas", "this": "this",
        "gaps": "gap", "kiwis": "kiwi", "caresses": "caress",
        "ponies": "poni",
        # step 1b (at/bl/iz +e, undouble, short-word +e, eed in R1)
        "hopping": "hop", "hoping": "hope", "running": "run",
        "luxuriated": "luxuri", "agreed": "agre", "feed": "feed",
        "meetings": "meet", "enjoyed": "enjoy",
        # 1c + steps 2-5 (sequential application, R1/R2 gates)
        "cry": "cri", "by": "by", "say": "say", "happy": "happi",
        "rational": "ration", "conditional": "condit",
        "generously": "generous", "electrical": "electr",
        "argument": "argument", "communism": "communism",
    }
    bad = {
        w: (porter2_stem(w), want)
        for w, want in cases.items()
        if porter2_stem(w) != want
    }
    assert not bad, bad


def test_porter2_divergence_from_porter1():
    """The two stemmers must NOT be identical — each's documented behavior
    on the words where the algorithms differ."""
    from rindex.analysis import porter2_stem, porter_stem

    assert porter_stem("ties") == "ti" and porter2_stem("ties") == "tie"
    assert porter_stem("dying") == "dy" and porter2_stem("dying") == "die"
    assert porter_stem("cosmos") == "cosmo"  # p2 lists it as invariant
    assert porter2_stem("cosmos") == "cosmos"


def test_en_snowball_analyzer_registered():
    from rindex.analysis import get_analyzer

    a = get_analyzer("en_snowball")
    assert a.tokens("Running quickly; the ties agreed!") == [
        "run", "quick", "the", "tie", "agre"
    ]


def test_synonym_filter():
    from rindex.analysis import make_synonym_filter

    syn = make_synonym_filter({"fast": "quick"})
    assert syn(["fast", "join", "fast"]) == ["quick", "join", "quick"]


def test_ascii_fold_matches_strip_accents():
    import duckdb

    from rindex.analysis import ascii_fold

    samples = ["café", "Åland îles", "naïve—test", "ASCII stays", "ß æ œ"]
    for s in samples:
        want = duckdb.sql(
            "SELECT strip_accents(?)", params=[s]
        ).fetchone()[0]
        assert ascii_fold(s) == want, s


def test_mapping_char_filter_longest_match_first():
    from rindex.analysis import make_mapping_char_filter

    mcf = make_mapping_char_filter({"hash join": "hjoin", "hash": "hmap"})
    assert mcf("hash join hash x hash joint") == "hjoin hmap x hjoint"
    # replaced spans are not rescanned (one pass)
    mcf2 = make_mapping_char_filter({"ab": "b", "b": "c"})
    assert mcf2("abb") == "bc"


def test_char_ngram_tokenizer():
    from rindex.analysis import make_char_ngram_tokenizer

    tok = make_char_ngram_tokenizer(3, 3)
    assert tok("Scan X") == ["sca", "can"]  # runs split at non-alnum; 'x' too short
    tok23 = make_char_ngram_tokenizer(2, 3)
    assert tok23("abc") == ["ab", "bc", "abc"]


def test_english_minimal_stem():
    from rindex.analysis import english_minimal_stem as st

    assert st("tables") == "table"
    assert st("rows") == "row"
    assert st("class") == "class"   # -ss kept
    assert st("status") == "status" # -us kept
    assert st("is") == "is"         # too short
    assert st("run") == "run"       # no trailing s


def test_keyword_trim_analyzer():
    from rindex.analysis import get_analyzer

    an = get_analyzer("keyword_trim")
    assert an.tokens("  Hello World \n") == ["Hello World"]


def test_kstem_goldens():
    """Krovetz-stemmer contract: inflectional ONLY (plural / past / -ing),
    dictionary-first at every step, e-restoration and doubling undo."""
    from rindex.analysis import kstem

    # plural
    assert kstem("tables") == "table"
    assert kstem("queries") == "query"
    assert kstem("batches") == "batch"
    assert kstem("passes") == "pass"
    assert kstem("indexes") == "index"
    # -s guards: ss / us / is endings and short words survive
    assert kstem("process") == "process"
    assert kstem("status") == "status"
    assert kstem("basis") == "basis"
    assert kstem("gas") == "gas"
    # past tense: e-restore, doubling undo, plain strip
    assert kstem("stored") == "store"
    assert kstem("merged") == "merge"
    assert kstem("planned") == "plan"
    assert kstem("joined") == "join"
    assert kstem("tried") == "try"
    # -ing: e-restore, doubling undo, plain strip
    assert kstem("using") == "use"
    assert kstem("storing") == "store"
    assert kstem("planning") == "plan"
    assert kstem("falling") == "fall"   # 'll' doubling exception
    assert kstem("joining") == "join"
    # dictionary-first: lexicon words never stemmed, at ANY step
    assert kstem("during") == "during"
    assert kstem("seed") == "seed"      # not 'se'
    assert kstem("seeds") == "seed"     # plural strips, THEN dict stops -ed
    assert kstem("speed") == "speed"
    assert kstem("nothing") == "nothing"
    assert kstem("news") == "news"
    # inflectional only: derivational suffixes untouched (vs Porter)
    assert kstem("connection") == "connection"
    assert kstem("national") == "national"
    # chained: plural then participle never double-fires on one suffix
    assert kstem("settings") == "setting"


def test_soundex_classic_vectors():
    """Classic American-Soundex goldens (the commons-codec test set)."""
    from rindex.ops.analysis_ext import soundex

    vectors = {
        "Robert": "R163", "Rupert": "R163", "Rubin": "R150",
        "Ashcraft": "A261", "Ashcroft": "A261",   # H transparency
        "Tymczak": "T522",                          # vowel breaks runs
        "Pfister": "P236",   # first letter's code collapses with next
        "Honeyman": "H555",
        "a": "A000", "wright": "W623",
    }
    for word, code in vectors.items():
        assert soundex(word) == code, (word, soundex(word), code)


def test_word_delimiter_chain():
    import re

    from rindex.ops.analysis_ext import _WDGF_CHAIN

    def split(s):
        for pat, rep in _WDGF_CHAIN:
            s = re.sub(pat, rep, s)
        return s.lower().split(" ")

    assert split("HTMLParser") == ["html", "parser"]
    assert split("Conv42EnX2b") == ["conv", "42", "en", "x", "2", "b"]
    assert split("aBcD") == ["a", "bc", "d"]
    assert split("PowerShot500") == ["power", "shot", "500"]
    assert split("plain") == ["plain"]


def test_r4_factory_batch_filters():
    """r4 analysis-factory batch semantics (possessive / elision /
    truncate / limit / whitespace / hyphen-join)."""
    from rindex.analysis import (
        elision_filter,
        english_possessive_filter,
        get_analyzer,
        hyphen_join,
        make_limit_token_count_filter,
        make_truncate_filter,
        whitespace_tokenize,
    )

    assert english_possessive_filter(["john's", "boss", "class's"]) == [
        "john", "boss", "class"
    ]
    assert elision_filter(["l'élève", "d'artagnan", "don't", "qu'il"]) == [
        "élève", "artagnan", "don't", "il"
    ]
    assert make_truncate_filter(4)(["truncation", "abc"]) == ["trun", "abc"]
    assert make_limit_token_count_filter(2)(["a", "b", "c"]) == ["a", "b"]
    assert whitespace_tokenize("Keep, punct! a-b\tc") == [
        "keep,", "punct!", "a-b", "c"
    ]
    assert hyphen_join("hyphen- \n ated word") == "hyphenated word"
    # registered analyzers compose with the standard chain
    assert get_analyzer("hyphen_join").tokens("re- \n joined") == ["rejoined"]
    assert get_analyzer("en_possessive").tokens("John's book") == [
        "john", "book"
    ]


def test_r4_factory_batch2_filters():
    """r4 batch 2: capitalization / reverse / letter / fingerprint /
    keyword-repeat / pattern-capture / type-token semantics."""
    from rindex.analysis import (
        capitalization_filter,
        get_analyzer,
        keyword_repeat_sstem_filter,
        letter_tokenize,
        make_fingerprint_filter,
        pattern_capture_filter,
        reverse_string_filter,
        type_token_num_filter,
    )

    assert capitalization_filter(["abc", "d", ""]) == ["Abc", "D", ""]
    assert reverse_string_filter(["abc", "x1"]) == ["cba", "1x"]
    assert letter_tokenize("Ab3cd, e-f 42") == ["ab", "cd", "e", "f"]
    assert make_fingerprint_filter("_")(["b", "a", "b"]) == ["a_b"]
    assert make_fingerprint_filter("_")([]) == []
    # keyword-repeat: surface + S-stem when they differ, in order
    assert keyword_repeat_sstem_filter(["cats", "boss", "us", "dogs"]) == [
        "cats", "cat", "boss", "us", "dogs", "dog"
    ]
    assert pattern_capture_filter(["abc123", "plain", "7"]) == [
        "abc123", "abc", "123", "plain", "7"
    ]
    assert type_token_num_filter(["a1", "42", "x", "007"]) == ["42", "007"]
    assert get_analyzer("fingerprint").tokens("b a b a") == ["a_b"]
    assert get_analyzer("type_num").tokens("room 42 floor 7") == ["42", "7"]


def test_r4_factory_batch3_filters():
    """r4 batch 3: apostrophe / keyword-marker / pattern-replace."""
    from rindex.analysis import (
        apostrophe_filter,
        keyword_marker_sstem_filter,
        pattern_replace_token_filter,
    )

    assert apostrophe_filter(["don't", "john's", "plain"]) == [
        "don", "john", "plain"
    ]
    assert keyword_marker_sstem_filter(["always", "cats", "its"]) == [
        "always", "cat", "its"
    ]
    assert pattern_replace_token_filter(["abc123", "4", "x"]) == [
        "abc0", "0", "x"
    ]


def test_urlemail_tokenizer_goldens():
    """UAX29URLEmailTokenizer analog: URLs/emails one token, words split."""
    from rindex.analysis import urlemail_tokenize

    assert urlemail_tokenize(
        "See https://Example.COM/a/b?q=1 or mail Bob.Smith+x@corp.io now"
    ) == [
        "see", "https://example.com/a/b?q=1", "or", "mail",
        "bob.smith+x@corp.io", "now",
    ]
    # plain text identical to the standard path
    assert urlemail_tokenize("Fast scan, don't stop!") == [
        "fast", "scan", "don't", "stop",
    ]
    # '@' without a valid domain falls back to word tokens
    assert urlemail_tokenize("a @ b") == ["a", "b"]
