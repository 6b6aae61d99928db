"""Serbian normalization vs the reference's complete alphabet vectors
(sr/TestSerbianNormalizationFilter.java:58-81,
TestSerbianNormalizationRegularFilter.java:58-81)."""

from lucene_solr_spark.analysis.serbian import (
    serbian_normalize,
    serbian_normalize_regular,
)


def test_bald_cyrillic():
    assert (
        serbian_normalize("абвгдђежзијклљмнњопрстћуфхцчџш")
        == "abvgddjezzijklljmnnjoprstcufhccdzs"
    )


def test_bald_latin():
    assert (
        serbian_normalize("abcčćddžđefghijklljmnnjoprsštuvzž")
        == "abcccddzdjefghijklljmnnjoprsstuvzz"
    )


def test_regular_cyrillic():
    assert (
        serbian_normalize_regular("абвгдђежзијклљмнњопрстћуфхцчџш")
        == "abvgdđežzijklljmnnjoprstćufhcčdžš"
    )


def test_regular_latin_passthrough():
    assert (
        serbian_normalize_regular("abcčćddžđefghijklljmnnjoprsštuvzž")
        == "abcčćddžđefghijklljmnnjoprsštuvzž"
    )


def test_empty():
    assert serbian_normalize("") == ""
    assert serbian_normalize_regular("") == ""
