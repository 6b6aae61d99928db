"""Capitalization / Truncate / CodepointCount / TypeToken filters,
pinned on the reference's vectors (TestCapitalizationFilter.java:38-95,
TestTruncateTokenFilter, TestCodepointCountFilter,
TestTypeTokenFilter)."""

from __future__ import annotations

import pytest

from lucene_solr_spark.analysis.miscfilters import (
    capitalize,
    codepoint_count_filter,
    standard_token_type,
    truncate_token,
    type_token_filter,
)

KEEP = frozenset(["and", "the", "it", "BIG"])


def test_capitalization_reference_vectors():
    # TestCapitalizationFilter.testCapitalization, arg-for-arg
    assert capitalize("kiTTEN", keep=KEEP) == "Kitten"
    assert capitalize("and", keep=KEEP) == "And"
    assert capitalize("AnD", keep=KEEP) == "And"
    # first is not forced, but it's not a keep word either
    assert capitalize("AnD", keep=KEEP, force_first_letter=False) == "And"
    assert capitalize("big", keep=KEEP) == "Big"
    assert capitalize("BIG", keep=KEEP) == "BIG"
    # keyword (whole string = one token)
    assert (
        capitalize("Hello thEre my Name is Ryan", keep=KEEP)
        == "Hello there my name is ryan"
    )
    # now each token
    s = "Hello thEre my Name is Ryan"
    toks = s.split(" ")
    assert [
        capitalize(t, only_first_word=False, keep=KEEP) for t in toks
    ] == ["Hello", "There", "My", "Name", "Is", "Ryan"]
    # only the long words
    assert [
        capitalize(t, only_first_word=False, keep=KEEP, min_word_length=3)
        for t in toks
    ] == ["Hello", "There", "my", "Name", "is", "Ryan"]
    # without prefix
    assert capitalize("McKinley", keep=KEEP) == "Mckinley"
    # with okPrefix
    assert (
        capitalize("McKinley", keep=KEEP, ok_prefix=("McK",)) == "McKinley"
    )
    # numbers
    assert [
        capitalize(t, only_first_word=False, keep=KEEP, force_first_letter=False)
        for t in "1st 2nd third".split(" ")
    ] == ["1st", "2nd", "Third"]
    # keyword, keep-word preserved mid-stream, forced at start
    assert (
        capitalize("the The the", only_first_word=False, keep=KEEP)
        == "The The the"
    )


def test_capitalization_max_word_count_restores_original():
    # more words than maxWordCount => original token returned verbatim
    assert (
        capitalize("one two three", only_first_word=False, max_word_count=2)
        == "one two three"
    )


def test_capitalization_max_token_length_passthrough():
    assert capitalize("kitten", max_token_length=5) == "kitten"


def test_truncate():
    # TestTruncateTokenFilter: length 5 prefix stemming
    assert truncate_token(["abcdefg", "abc", "abcde"], 5) == [
        "abcde",
        "abc",
        "abcde",
    ]
    with pytest.raises(ValueError):
        truncate_token(["x"], 0)


def test_codepoint_count():
    # supplementary chars count as ONE codepoint
    toks = ["ab", "abc", "a\U0001D11E", "abcdef"]
    assert codepoint_count_filter(toks, 2, 3) == ["ab", "abc", "a\U0001D11E"]
    with pytest.raises(ValueError):
        codepoint_count_filter(toks, 3, 2)


def test_type_token_filter():
    # TestTypeTokenFilter: stop <NUM> over "121 is palindrome, while
    # 123 is not" keeps only the words
    toks = ["121", "is", "palindrome", "while", "123", "is", "not"]
    types = [standard_token_type(t) for t in toks]
    assert type_token_filter(toks, types, frozenset(["<NUM>"])) == [
        "is",
        "palindrome",
        "while",
        "is",
        "not",
    ]
    # whitelist mode keeps ONLY the stop types
    assert type_token_filter(
        toks, types, frozenset(["<NUM>"]), use_white_list=True
    ) == ["121", "123"]


def test_standard_token_type_midnum():
    assert standard_token_type("12.3") == "<NUM>"
    assert standard_token_type("abc123") == "<ALPHANUM>"
    assert standard_token_type("abc") == "<ALPHANUM>"


def test_icu_fold_vectors():
    from lucene_solr_spark.analysis.charfilters import icu_fold

    # accent strip keeps non-Latin scripts; NFKC handles width/
    # ligature/circled; casefold handles ß and final sigma
    assert icu_fold("Résumé") == "resume"
    assert icu_fold("ﬁnance") == "finance"
    assert icu_fold("Straße") == "strasse"
    assert icu_fold("ＦＵＬＬ") == "full"
    assert icu_fold("①②") == "12"
    assert icu_fold("ΜΆΪΟΣ") == "μαιοσ"  # Greek survives, de-accented
    assert icu_fold("Ćafé") == "cafe"
    assert icu_fold("plain") == "plain"


def test_scandinavian_normalization_reference_vectors():
    from lucene_solr_spark.analysis.miscfilters import (
        scandinavian_normalization as n,
    )

    # TestScandinavianNormalizationFilter.java:51-107, verbatim
    assert n("aeäaeeea") == "æææeea"
    assert n("aeäaeeeae") == "æææeeæ"
    assert n("aeaeeeae") == "ææeeæ"
    assert n("bøen") == "bøen"
    assert n("bOEen") == "bØen"
    assert n("åene") == "åene"
    assert n("blåbærsyltetøj") == "blåbærsyltetøj"
    assert n("blaabaersyltetöj") == "blåbærsyltetøj"
    assert n("räksmörgås") == "ræksmørgås"
    assert n("raeksmörgaos") == "ræksmørgås"
    assert n("raeksmörgaas") == "ræksmørgås"
    assert n("raeksmoergås") == "ræksmørgås"
    for same in ("ab", "ob", "Ab", "Ob", "å"):
        assert n(same) == same
    for src, want in [
        ("aa", "å"), ("aA", "å"), ("ao", "å"), ("aO", "å"),
        ("AA", "Å"), ("Aa", "Å"), ("Ao", "Å"), ("AO", "Å"),
        ("æ", "æ"), ("ä", "æ"), ("Æ", "Æ"), ("Ä", "Æ"),
        ("ae", "æ"), ("aE", "æ"), ("Ae", "Æ"), ("AE", "Æ"),
        ("ö", "ø"), ("ø", "ø"), ("Ö", "Ø"), ("Ø", "Ø"),
        ("oo", "ø"), ("oe", "ø"), ("oO", "ø"),
    ]:
        assert n(src) == want, src


def test_keyword_repeat_stem():
    from lucene_solr_spark.analysis.miscfilters import keyword_repeat_stem
    from lucene_solr_spark.analysis.porter import porter_stem

    out = keyword_repeat_stem(["running", "run", "cats"], porter_stem)
    # stemmed copy at the same position; no-op stems deduplicated
    assert out == [
        ("running", 0), ("run", 0), ("run", 1), ("cats", 2), ("cat", 2),
    ]


def test_limit_token_offset_and_position():
    from lucene_solr_spark.analysis.miscfilters import (
        limit_token_offset,
        limit_token_position,
    )

    toks = ["a", "b", "c"]
    assert limit_token_offset(toks, [0, 4, 9], 4) == ["a", "b"]
    assert limit_token_position(toks, [0, 1, 2], 2) == ["a", "b"]
    # stop-gap positions count (gap-aware)
    assert limit_token_position(toks, [0, 3, 4], 2) == ["a"]


def test_date_recognizer():
    from lucene_solr_spark.analysis.miscfilters import date_recognizer

    toks = ["12/25/2023", "hello", "02/30/2023", "1/2/2020"]
    # 02/30 is not a real date; 1/2/2020 parses under %m/%d/%Y
    assert date_recognizer(toks) == ["12/25/2023", "1/2/2020"]


def test_keyword_marker():
    from lucene_solr_spark.analysis.miscfilters import keyword_marker_stem
    from lucene_solr_spark.analysis.porter import porter_stem

    toks = ["running", "cats", "jumping"]
    # set protection
    assert keyword_marker_stem(
        toks, porter_stem, keywords=frozenset(["cats"])
    ) == ["run", "cats", "jump"]
    # pattern protection (TestKeywordMarkerFilter-style)
    assert keyword_marker_stem(toks, porter_stem, pattern=r".*ing") == [
        "running", "cat", "jumping",
    ]
