"""SimpleQueryParser contract tests: the parser NEVER raises, degrades on
broken syntax, folds left-associatively with no precedence, and returns
None for queries with no positive clause (Lucene matches nothing)."""

from rindex.search import parse_simple_query


def _expand(kind, payload):
    if kind == "prefix":
        return {"s": ["scan", "sort"], "jo": ["join"]}.get(payload, [])
    term, n = payload
    return [term]  # identity fuzzy expansion for the tests


def test_default_op_and_left_fold():
    t = parse_simple_query("hash merge join")
    assert t == ("and", [("term", "hash"), ("term", "merge"),
                         ("term", "join")])


def test_no_precedence_strict_left_to_right():
    # a | b c  ==  ((a OR b) AND c) — SimpleQueryParser folds onto the
    # accumulated query, no operator precedence
    t = parse_simple_query("hash | merge join")
    assert t == ("and", [("or", [("term", "hash"), ("term", "merge")]),
                         ("term", "join")])


def test_groups_not_prefix_phrase():
    t = parse_simple_query('s* + (hash | merge) + -window + "table scan"',
                           expand=_expand)
    assert t[0] == "and"
    kinds = [n[0] for n in t[1]]
    assert kinds == ["const", "or", "not", "phrase"]
    assert t[1][0][1] == ("scan", "sort")
    assert t[1][3][1] == ("table", "scan")


def test_broken_syntax_degrades_never_raises():
    for q in ['((hash', 'hash )', '"unclosed', 'hash | | merge', '+',
              'hash +)(merge']:
        t = parse_simple_query(q)  # must not raise
        if t is not None:
            assert t[0] in ("term", "and", "or")


def test_degradation_keeps_words():
    t = parse_simple_query("((hash merge")
    assert t == ("and", [("term", "hash"), ("term", "merge")])


def test_pure_negative_matches_nothing():
    assert parse_simple_query("-window") is None
    assert parse_simple_query("") is None


def test_fuzzy_expansion_leaf():
    t = parse_simple_query("merge~1", expand=_expand)
    assert t == ("const", ("merge",))


def test_parser_never_raises_fuzz():
    """The SimpleQueryParser contract: NO input string may raise."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(st.text(max_size=40))
    def run(qs):
        t = parse_simple_query(qs, expand=_expand)
        assert t is None or t[0] in ("term", "and", "or", "const",
                                     "phrase", "not")

    run()
