"""Greek analyzer chain vs the reference's COMPLETE golden set
(TestGreekStemmer.java — 342 checkOneTerm assertions extracted
verbatim into fixtures/greek_stem_goldens.tsv)."""

from pathlib import Path

import pytest

from lucene_solr_spark.analysis.greek import (
    greek_lowercase,
    greek_stem,
)

GOLDENS = [
    tuple(line.split("\t"))
    for line in Path("fixtures/greek_stem_goldens.tsv")
    .read_text()
    .splitlines()
    if line and not line.startswith("#")
]


def test_fixture_is_complete():
    assert len(GOLDENS) == 342


@pytest.mark.parametrize("raw,want", GOLDENS)
def test_reference_goldens(raw, want):
    assert greek_stem(greek_lowercase(raw)) == want


def test_lowercase_folding():
    # tonos / dialytika removal and final-sigma normalization
    assert greek_lowercase("Άνθρωπος") == "ανθρωποσ"
    assert greek_lowercase("ΪΫΐΰ") == "ιυιυ"
    # per-character lowering must NOT apply Python's contextual
    # Final_Sigma rule ("ΟΣ".lower() would give "ος")
    assert greek_lowercase("ΟΣ") == "οσ"


def test_short_words_untouched():
    assert greek_stem("και") == "και"
    assert greek_stem("α") == "α"
