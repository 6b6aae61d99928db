"""MappingCharFilter + DictionaryCompoundWordTokenFilter vs the
reference's own test goldens (TestMappingCharFilter.java,
TestCompoundWordTokenFilter.java)."""

from __future__ import annotations

import pytest

from lucene_solr_spark.analysis.charfilters import (
    mapping_filter,
    mapping_filter_col,
    parse_mapping_rules,
)
from lucene_solr_spark.analysis.compound import (
    decompose,
    decompose_tokens,
)

# TestMappingCharFilter.setUp norm map
NORM_RULES = [
    ("aa", "a"), ("bbb", "b"), ("cccc", "cc"),
    ("h", "i"), ("j", "jj"), ("k", "kkk"), ("ll", "llll"),
    ("empty", ""),
]


def test_mapping_reference_goldens():
    """test1to1/1to2/1to3/2to1/3to1/4to2 + testTokenStream."""
    cases = {
        "h": "i", "j": "jj", "k": "kkk", "aa": "a", "bbb": "b",
        "cccc": "cc", "empty": "",
        # testTokenStream: whitespace positions preserved through 1:n
        "h i j k ll cccc bbb aa": "i i jj kkk llll cc b a",
    }
    for src, want in cases.items():
        assert mapping_filter(src, NORM_RULES) == want


def test_mapping_greedy_longest_and_no_rescan():
    # longest pattern at an offset wins (aa before a-rules), and
    # replacement text is NEVER re-matched (h->i, no i rule needed;
    # a->b plus b->c must not cascade)
    assert mapping_filter("ab", [("a", "b"), ("b", "c")]) == "bc"
    assert mapping_filter("aab", [("aa", "x"), ("a", "y")]) == "xb"


def test_mapping_rule_parsing():
    rules = parse_mapping_rules(['# comment', '"a" => "e"', '"\\n" => " "'])
    assert rules == [("a", "e"), ("\n", " ")]
    with pytest.raises(ValueError, match="bad mapping rule"):
        parse_mapping_rules(["a => e"])


def test_mapping_column_paths(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("h i j k ll cccc bbb aa",), ("empty x",)], ["t"]
    )
    # multi-char rules -> pandas UDF path
    got = [
        r["m"]
        for r in df.select(
            mapping_filter_col(F.col("t"), NORM_RULES).alias("m")
        ).collect()
    ]
    assert got == ["i i jj kkk llll cc b a", " x"]
    # pure 1:1 map -> single JVM translate (no Python in the plan)
    one = df.select(
        mapping_filter_col(F.col("t"), [("h", "x"), ("j", "y")]).alias("m")
    )
    assert one.collect()[0]["m"] == "x i y k ll cccc bbb aa"
    assert "pythonUDF" not in one._jdf.queryExecution().executedPlan().toString()


# TestCompoundWordTokenFilter.testDumbCompoundWordsSE dictionary
SE_DICT = frozenset(
    w.lower()
    for w in [
        "Bil", "Dörr", "Motor", "Tak", "Borr", "Slag", "Hammar",
        "Pelar", "Glas", "Ögon", "Fodral", "Bas", "Fiol", "Makare",
        "Gesäll", "Sko", "Vind", "Rute", "Torkare", "Blad",
    ]
)


def test_compound_reference_golden_se():
    text = (
        "Bildörr Bilmotor Biltak Slagborr Hammarborr Pelarborr "
        "Glasögonfodral Basfiolsfodral Basfiolsfodralmakaregesäll "
        "Skomakare Vindrutetorkare Vindrutetorkarblad abba"
    )
    toks = text.split()
    got, pos = decompose_tokens(toks, list(range(len(toks))), SE_DICT)
    want = [
        "Bildörr", "Bil", "dörr", "Bilmotor", "Bil", "motor", "Biltak",
        "Bil", "tak", "Slagborr", "Slag", "borr", "Hammarborr", "Hammar",
        "borr", "Pelarborr", "Pelar", "borr", "Glasögonfodral", "Glas",
        "ögon", "fodral", "Basfiolsfodral", "Bas", "fiol", "fodral",
        "Basfiolsfodralmakaregesäll", "Bas", "fiol", "fodral", "makare",
        "gesäll", "Skomakare", "Sko", "makare", "Vindrutetorkare", "Vind",
        "rute", "torkare", "Vindrutetorkarblad", "Vind", "rute", "blad",
        "abba",
    ]
    assert got == want
    # subwords share the original token's position (posIncrement 0)
    assert pos[:3] == [0, 0, 0] and pos[-1] == 12


def test_compound_longest_match_golden():
    d = SE_DICT - {"fiol"} | {"fiols", "fiolsfodral"}
    got = decompose(
        "Basfiolsfodralmakaregesäll", frozenset(d), only_longest_match=True
    )
    assert got == ["Bas", "fiolsfodral", "fodral", "makare", "gesäll"]


def test_compound_min_sizes():
    d = frozenset(["abc", "d", "efg"])
    # "d" shorter than minSubwordSize never emits; token below
    # minWordSize never decomposes
    assert decompose("abcdefg", d) == ["abc", "efg"]
    assert decompose("abcd", d) == []
