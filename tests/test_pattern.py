"""Pattern tokenizer/filters vs the reference's test vectors
(TestPatternTokenizer.java:40-49,
TestPatternCaptureGroupTokenFilter.java:32-592)."""

import pytest

from lucene_solr_spark.analysis.pattern import (
    camel_case_capture,
    pattern_capture,
    pattern_replace,
    pattern_replace_char,
    pattern_tokenize,
)

QPAT = "'([^']+)'"


@pytest.mark.parametrize(
    "group,pattern,text,expected",
    [
        (-1, "--", "aaa--bbb--ccc", ["aaa", "bbb", "ccc"]),
        (-1, ":", "aaa:bbb:ccc", ["aaa", "bbb", "ccc"]),
        (-1, r"\s", "aaa   bbb \t\tccc  ", ["aaa", "bbb", "ccc"]),
        (-1, ":", "boo:and:foo", ["boo", "and", "foo"]),
        (-1, "o", "boo:and:foo", ["b", ":and:f"]),
        (0, ":", "boo:and:foo", [":", ":"]),
        (0, QPAT, "aaa 'bbb' 'ccc'", ["'bbb'", "'ccc'"]),
        (1, QPAT, "aaa 'bbb' 'ccc'", ["bbb", "ccc"]),
    ],
)
def test_pattern_tokenizer_vectors(group, pattern, text, expected):
    assert pattern_tokenize(text, pattern, group) == expected


@pytest.mark.parametrize(
    "token,patterns,preserve,expected",
    [
        ("foobarbaz", [], False, ["foobarbaz"]),
        ("foobarbaz", [], True, ["foobarbaz"]),
        ("foobarbaz", ["xx"], False, ["foobarbaz"]),
        ("foobarbaz", ["xx"], True, ["foobarbaz"]),
        ("foobarbaz", [".."], False, ["foobarbaz"]),
        ("foobarbaz", [".(y*)"], False, ["foobarbaz"]),
        ("foobarbaz", ["(.+)"], False, ["foobarbaz"]),
        ("foobarbaz", ["(.+)"], True, ["foobarbaz"]),
        ("foobarbaz", ["^(.)"], False, ["f"]),
        ("foobarbaz", ["^(.)"], True, ["foobarbaz", "f"]),
        ("foobarbaz", ["^.(.)."], False, ["o"]),
        ("foobarbaz", ["^.(.)."], True, ["foobarbaz", "o"]),
        ("foobarbaz", ["(.)$"], False, ["z"]),
        ("foobarbaz", ["(.)$"], True, ["foobarbaz", "z"]),
        ("foobarbaz", ["^(.)(.)"], False, ["f", "o"]),
        ("foobarbaz", ["^(.)(.)"], True, ["foobarbaz", "f", "o"]),
        ("foobarbaz", ["^(.).+(.)$"], False, ["f", "z"]),
        ("foobarbaz", ["^(.).+(.)$"], True, ["foobarbaz", "f", "z"]),
    ],
)
def test_capture_group_vectors(token, patterns, preserve, expected):
    assert pattern_capture(token, patterns, preserve) == expected


def test_camel_case():
    """The reference's own camelCase configuration vector
    (TestPatternCaptureGroupTokenFilter.java:565-579)."""
    assert camel_case_capture("letsPartyLIKEits1999_dude", False) == [
        "lets", "Party", "LIKE", "its", "1999", "dude",
    ]
    assert camel_case_capture("letsPartyLIKEits1999_dude", True) == [
        "letsPartyLIKEits1999_dude",
        "lets", "Party", "LIKE", "its", "1999", "dude",
    ]


def test_pattern_replace():
    assert pattern_replace("fooaabfooabfoob", "a*b", "-") == "foo-foo-foo-"
    assert pattern_replace("fooaabfooabfoob", "a*b", "-",
                           replace_all=False) == "foo-fooabfoob"
    assert pattern_replace_char("ab a b aab", "aa", "x") == "ab a b xb"
