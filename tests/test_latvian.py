"""Latvian stemmer vs the reference's COMPLETE golden set
(TestLatvianStemmer.java — 172 checkOneTerm assertions in
fixtures/latvian_stem_goldens.tsv)."""

from pathlib import Path

import pytest

from lucene_solr_spark.analysis.latvian import latvian_stem

GOLDENS = [
    tuple(line.split("\t"))
    for line in Path("fixtures/latvian_stem_goldens.tsv")
    .read_text()
    .splitlines()
    if line and not line.startswith("#")
]


def test_fixture_is_complete():
    assert len(GOLDENS) == 172


@pytest.mark.parametrize("raw,want", GOLDENS)
def test_reference_goldens(raw, want):
    assert latvian_stem(raw.lower()) == want


def test_vowel_and_length_guards():
    # too short / too few vowels → untouched
    assert latvian_stem("js") == "js"
    assert latvian_stem("ks") == "ks"


def test_named_analyzer_chain(spark):
    from lucene_solr_spark.index import build_tables

    docs = spark.createDataFrame(
        [(0, "cimdiņu cimdiņi un gramatas")], "doc_id long, text string"
    )
    t = build_tables(docs, id_col="doc_id", text_col="text",
                     analyzer="latvian", cache=False)
    terms = {r["term"] for r in t.postings.select("term").collect()}
    assert "un" not in terms  # stopword dropped
    # -u removal fires the palatalization rules: ņ → n
    assert "cimdin" in terms and "gramat" in terms
