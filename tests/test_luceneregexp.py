"""Lucene RegExp grammar engine (util/automaton/RegExp.java, ALL
flags), pinned on TestRegexpQuery.java:77-96 vectors plus grammar
coverage for every operator."""

from __future__ import annotations

import pytest

from lucene_solr_spark.queries.luceneregexp import LuceneRegExp


def m(p: str, t: str) -> bool:
    return LuceneRegExp(p).matches(t)


def test_reference_vectors():
    # TestRegexpQuery: term "quick" from the indexed text
    assert m("q.[aeiou]c.*", "quick")
    assert not m(".[aeiou]c.*", "quick")  # 'c' misaligned
    assert not m("q.[aeiou]c", "quick")  # too short
    # numeric interval over the indexed "493432"
    assert m("<420000-600000>", "493432")
    assert not m("<493433-600000>", "493432")
    # concat with complement: remainder "32" is not the string "3"
    assert m("4934~[3]", "493432")
    assert not m("4934~[3]", "49343")
    # ~# = complement of the empty language = everything
    assert m("~#", "493432")
    assert m("~#", "")
    # backtracking vector: [314] is one char class
    assert m("4934[314]", "49343")
    assert m("4934[314]", "49341")
    assert not m("4934[314]", "493432")


def test_core_syntax():
    assert m("(qu|pa).*(y|e)", "query")
    assert not m("(qu|pa).*(y|e)", "quick")
    assert m("ab{2,3}c", "abbc") and m("ab{2,3}c", "abbbc")
    assert not m("ab{2,3}c", "abc")
    assert m("ab{2}c", "abbc") and not m("ab{2}c", "abbbc")
    assert m("ab{2,}c", "abbbbc")
    assert m("a?bc", "bc") and m("a?bc", "abc")
    assert m("a+", "aaa") and not m("a+", "")
    assert m("a*", "")
    assert m(r"a\*b", "a*b") and not m(r"a\*b", "ab")
    assert m('"lit*eral"', "lit*eral") and not m('"lit*eral"', "literal")
    assert m("[^a-c]x", "dx") and not m("[^a-c]x", "ax")
    assert m("[a-cx]y", "xy") and m("[a-cx]y", "by")
    assert m("()", "") and not m("()", "a")


def test_lucene_operators():
    # intersection
    assert m("abc&a.c", "abc")
    assert not m("ab.&.bd", "abc")
    assert m(".*a.*&.*b.*", "xaby") and not m(".*a.*&.*b.*", "xay")
    # complement
    assert m("~(abc)", "abd") and not m("~(abc)", "abc")
    assert m("a~(bc)d", "abd")  # middle part "b" != "bc"
    assert not m("a~(bc)d", "abcd")
    # any-string / empty language
    assert m("@", "whatever") and m("@", "")
    assert not m("#", "") and not m("#", "x")


def test_intervals():
    # free width: leading zeros accepted
    assert m("<7-13>", "7") and m("<7-13>", "13") and m("<7-13>", "007")
    assert not m("<7-13>", "14") and not m("<7-13>", "6")
    # equal-width bounds fix the digit count
    assert m("<07-13>", "09") and m("<07-13>", "13")
    assert not m("<07-13>", "9")
    # reversed bounds swap (RegExp.java:1152-1155)
    assert m("<13-7>", "9".rjust(1, "0")) and m("<13-7>", "12")
    # named automaton needs a provider
    with pytest.raises(ValueError):
        LuceneRegExp("<quickBrown>")


def test_searcher_integration(searcher, oracle):
    from lucene_solr_spark.queries.query import RegexpQuery

    # extended operator straight through the searcher's expansion:
    # every term containing 'a' but not ending in 'w'
    got = sorted(
        searcher._expand_terms(RegexpQuery(".*a.*&~(.*w)"))
    )
    want = sorted(
        t for t in oracle.postings if "a" in t and not t.endswith("w")
    )
    assert got == want
    # interval terms don't exist in the alpha corpus
    assert searcher._expand_terms(RegexpQuery("<1-99>")) == []


def test_parser_regex_literal(searcher, oracle):
    """The classic parser's /regex/ literal (QueryParserBase
    REGEXPTERM) builds a RegexpQuery with the unanalyzed body."""
    from lucene_solr_spark.queries.parser import parse_query
    from lucene_solr_spark.queries.query import RegexpQuery

    assert parse_query("/wi.d*w/") == RegexpQuery("wi.d*w")
    got = {
        r["doc_id"]
        for r in searcher.docs(parse_query("/w.ndow/")).collect()
    }
    want = set()
    for t, pl in oracle.postings.items():
        if len(t) == 6 and t[0] == "w" and t[2:] == "ndow":
            want |= set(pl)
    assert got == want and got
