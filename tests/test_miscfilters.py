"""Misc token filters vs the reference's goldens
(CommonGramsFilterTest.java, TestFingerprintFilter.java,
TestHyphenatedWordsFilter.java)."""

from __future__ import annotations

from lucene_solr_spark.analysis.miscfilters import (
    common_grams,
    common_grams_query,
    fingerprint,
    hyphenated_words,
    keep_words,
    length_filter,
    limit_token_count,
    remove_duplicates,
    trim_filter,
)

COMMON = frozenset(["of", "the", "s"])


def test_common_grams_filter_goldens():
    """CommonGramsFilterTest.testCommonGramsFilter — terms + gram flags."""
    cases = {
        "the": [("the", False)],
        "brown fox": [("brown", False), ("fox", False)],
        "the fox": [("the", False), ("the_fox", True), ("fox", False)],
        "fox of": [("fox", False), ("fox_of", True), ("of", False)],
        "of the": [("of", False), ("of_the", True), ("the", False)],
        "quick brown fox": [("quick", False), ("brown", False), ("fox", False)],
        "quick brown the": [
            ("quick", False), ("brown", False), ("brown_the", True),
            ("the", False),
        ],
        "quick the fox": [
            ("quick", False), ("quick_the", True), ("the", False),
            ("the_fox", True), ("fox", False),
        ],
    }
    for src, want in cases.items():
        assert common_grams(src.split(), COMMON) == want, src


def test_common_grams_query_goldens():
    """CommonGramsFilterTest.testCommonGramsQueryFilter — the full
    s/n combination table."""
    cases = {
        "brown fox": ["brown", "fox"],
        "the fox": ["the_fox"],
        "fox of": ["fox_of"],
        "of the": ["of_the"],
        "the": ["the"],
        "foo": ["foo"],
        "quick brown fox": ["quick", "brown", "fox"],
        "quick brown the": ["quick", "brown_the"],
        "quick the brown": ["quick_the", "the_brown"],
        "fox of the": ["fox_of", "of_the"],
        "the quick brown": ["the_quick", "quick", "brown"],
        "the fox of": ["the_fox", "fox_of"],
        "of the fox": ["of_the", "the_fox"],
        "of the of": ["of_the", "the_of"],
    }
    for src, want in cases.items():
        assert common_grams_query(src.split(), COMMON) == want, src


def test_fingerprint_goldens():
    assert fingerprint("B A B E".split()) == ["A B E"]
    assert fingerprint(["B2", "B2"]) == ["B2"]
    assert fingerprint("B2 A1 C3 D4 E5 F6 G7 H1".split(), 4) == []
    assert fingerprint("B2 A1 C3 B2".split(), separator="_") == ["A1_B2_C3"]
    assert fingerprint([]) == []


def test_hyphenated_words_golden():
    toks = [
        "ecologi-", "cal", "devel-", "op", "compre-",
        "hensive-hands-on", "and", "ecologi-", "cal",
    ]
    assert hyphenated_words(toks) == [
        "ecological", "develop", "comprehensive-hands-on", "and",
        "ecological",
    ]
    # trailing unpaired hyphen stripped
    assert hyphenated_words(["ecology-"]) == ["ecology"]


def test_trivial_filters():
    assert remove_duplicates(["a", "b", "a", "a"], [0, 0, 0, 1]) == (
        ["a", "b", "a"], [0, 0, 1]
    )
    assert keep_words(["a", "b", "c"], frozenset(["b"])) == ["b"]
    assert length_filter(["a", "ab", "abc"], 2, 2) == ["ab"]
    assert trim_filter([" a ", "", "b"]) == ["a", "b"]
    assert limit_token_count(["a", "b", "c"], 2) == ["a", "b"]
