"""ICU collation sort/range parity (ICUCollationKeyAnalyzer.java,
Solr ICUCollationField → Spark's native Catalyst ICU collations)."""

from __future__ import annotations

import pytest

from lucene_solr_spark.analysis.collation import (
    collation_range,
    collation_rank_topk,
    collation_sort,
)

WORDS = [
    "Zebra", "Äpfel", "Apfel", "Öl", "oel", "ozone", "ärger", "arg",
    "ß-test", "ss-test", "côté", "cote", "zulu", "Ångström", "angstrom",
]


@pytest.fixture(scope="module")
def words_df(spark):
    return spark.createDataFrame([(w,) for w in WORDS], "w string")


def test_german_collation_order(words_df):
    """DIN 5007 facts a binary sort violates: Äpfel sorts WITH Apfel
    (not after z), Öl with oel, ß with ss, and accents are
    secondary-level (cote < côté)."""
    got = [r["w"] for r in collation_sort(words_df, "w", "de").collect()]
    assert got.index("Apfel") + 1 == got.index("Äpfel")
    assert got.index("Äpfel") < got.index("arg") < got.index("Zebra")
    assert got.index("oel") + 1 == got.index("Öl")
    assert got.index("cote") + 1 == got.index("côté")
    assert got.index("ss-test") + 1 == got.index("ß-test")
    assert got.index("angstrom") + 1 == got.index("Ångström")


def test_collation_range_includes_diacritics(words_df):
    """ICUCollationField.getRangeQuery analog: ['Apfel', 'arg'] under
    'de' contains Äpfel; a binary range would not.  'ärger' ≈ 'arger'
    sorts AFTER 'arg' (prefix rule), so it stays outside."""
    got = {
        r["w"]
        for r in collation_range(words_df, "w", "Apfel", "arg", "de").collect()
    }
    assert got == {"Apfel", "Äpfel", "arg"}


def test_rank_topk_matches_full_sort(words_df):
    ordered = [r["w"] for r in collation_sort(words_df, "w", "de").collect()]
    got = {
        r["rank"]: r["w"]
        for r in collation_rank_topk(words_df, "w", "de", 7).collect()
    }
    assert [got[i] for i in range(1, 8)] == ordered[:7]
