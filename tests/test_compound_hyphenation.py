"""HyphenationCompoundWordTokenFilter: Liang hyphenator + the
decompose loop pinned on the reference's da_UTF8 vectors
(TestCompoundWordTokenFilter.java:48-135) via injected hyphenation
points — the pattern FILE itself is per-language data the caller
supplies."""

from __future__ import annotations

from lucene_solr_spark.analysis.compound import (
    Hyphenator,
    hyphenation_decompose,
)

# da_UTF8 hyphenation of "basketballkurv" (derived from the reference
# vectors: ba-sket-bal-l-kurv)
BKURV_PTS = [0, 2, 6, 9, 10, 14]


def test_hyphenation_only_min2_max4():
    assert hyphenation_decompose(
        "basketballkurv", None, None, 5, 2, 4, points=BKURV_PTS
    ) == ["ba", "sket", "bal", "ball", "kurv"]


def test_hyphenation_only_min4_max6():
    assert hyphenation_decompose(
        "basketballkurv", None, None, 5, 4, 6, points=BKURV_PTS
    ) == ["basket", "sket", "ball", "lkurv", "kurv"]


def test_hyphenation_only_min4_max10():
    assert hyphenation_decompose(
        "basketballkurv", None, None, 5, 4, 10, points=BKURV_PTS
    ) == [
        "basket", "basketbal", "basketball", "sket", "sketbal",
        "sketball", "ball", "ballkurv", "lkurv", "kurv",
    ]


def test_longest_match_drops_shorter_prefix():
    # testHyphenationCompoundWordsDELongestMatch: 'basket' is dominated
    # by 'basketball' under onlyLongestMatch
    d = frozenset(["basketball", "basket", "ball", "kurv"])
    assert hyphenation_decompose(
        "basketballkurv", None, d, 5, 2, 40, True, points=BKURV_PTS
    ) == ["basketball", "ball", "kurv"]


def test_dictionary_filtered():
    # testHyphenationCompoundWordsDA: læsehest -> læse + hest
    d = frozenset(["læse", "hest"])
    assert hyphenation_decompose(
        "læsehest", None, d, 5, 2, 15, points=[0, 4, 8]
    ) == ["læse", "hest"]


def test_genitive_fallback():
    # partLength-1 re-check: 'fodbolds' part with dict 'fodbold'
    d = frozenset(["fodbold", "kamp"])
    assert hyphenation_decompose(
        "fodboldskamp", None, d, 5, 2, 15, points=[0, 8, 12]
    ) == ["fodbold", "kamp"]


def test_liang_algorithm():
    h = Hyphenator(["k1w", "m1t"])
    assert h.hyphenation_points("sparkwindow") == [0, 5, 11]
    assert h.hyphenation_points("streamtable") == [0, 6, 11]
    assert h.hyphenation_points("window") is None
    # word-boundary patterns with '.' anchors and digit classes
    h2 = Hyphenator([".ab2c", "c3d"])
    # .ab2c puts an even (no-break) 2 before 'c'; c3d puts an odd 3
    # before 'd' -> the only break is at offset 3
    assert h2.hyphenation_points("abcd") == [0, 3, 4]


def test_liang_edge_constraints():
    h = Hyphenator(["a1b"])
    # remain/push window excludes edge breaks
    assert h.hyphenation_points("ab", remain=1, push=1) == [0, 1, 2]
    assert h.hyphenation_points("ab", remain=2, push=1) is None


def test_exceptions():
    h = Hyphenator(["a1b"], exceptions=["ta-ble"])
    assert h.hyphenation_points("table") == [0, 2, 5]
