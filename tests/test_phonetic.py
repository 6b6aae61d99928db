"""Phonetic encoder family vs the reference's TestPhoneticFilter
goldens (lucene/analysis/phonetic/src/test/org/apache/lucene/analysis/
phonetic/TestPhoneticFilter.java:40-71) plus commons-codec's own test
vectors for each algorithm.
"""

from __future__ import annotations

import pytest

from lucene_solr_spark.analysis.phonetic import (
    caverphone2,
    metaphone,
    nysiis,
    phonetic_tokens,
    refined_soundex,
    soundex,
)


# --- the reference's TestPhoneticFilter.testAlgorithms goldens ---------

def _filter_out(encoder: str, text: str, inject: bool) -> list[str]:
    out: list[str] = []
    for w in text.split():
        out.extend(phonetic_tokens(w, inject=inject, encoder=encoder))
    return out


def test_reference_metaphone_goldens():
    assert _filter_out("Metaphone", "aaa bbb ccc easgasg", True) == [
        "A", "aaa", "B", "bbb", "KKK", "ccc", "ESKS", "easgasg"]
    assert _filter_out("Metaphone", "aaa bbb ccc easgasg", False) == [
        "A", "B", "KKK", "ESKS"]


def test_reference_soundex_goldens():
    assert _filter_out("Soundex", "aaa bbb ccc easgasg", True) == [
        "A000", "aaa", "B000", "bbb", "C000", "ccc", "E220", "easgasg"]
    assert _filter_out("Soundex", "aaa bbb ccc easgasg", False) == [
        "A000", "B000", "C000", "E220"]


def test_reference_refined_soundex_goldens():
    assert _filter_out("RefinedSoundex", "aaa bbb ccc easgasg", True) == [
        "A0", "aaa", "B1", "bbb", "C3", "ccc", "E034034", "easgasg"]
    assert _filter_out("RefinedSoundex", "aaa bbb ccc easgasg", False) == [
        "A0", "B1", "C3", "E034034"]


def test_reference_caverphone2_goldens():
    assert _filter_out("Caverphone2", "Darda Karleen Datha Carlene", True) == [
        "TTA1111111", "Darda", "KLN1111111", "Karleen",
        "TTA1111111", "Datha", "KLN1111111", "Carlene"]
    assert _filter_out("Caverphone2", "Darda Karleen Datha Carlene", False) == [
        "TTA1111111", "KLN1111111", "TTA1111111", "KLN1111111"]


def test_reference_nysiis_goldens():
    assert _filter_out("Nysiis", "aaa bbb ccc easgasg", True) == [
        "A", "aaa", "B", "bbb", "C", "ccc", "EASGAS", "easgasg"]
    assert _filter_out("Nysiis", "aaa bbb ccc easgasg", False) == [
        "A", "B", "C", "EASGAS"]


# --- commons-codec test vectors ----------------------------------------

@pytest.mark.parametrize("word,code", [
    ("howl", "HL"), ("testing", "TSTN"), ("The", "0"), ("quick", "KK"),
    ("brown", "BRN"), ("fox", "FKS"), ("jumped", "JMPT"), ("over", "OFR"),
    ("lazy", "LS"), ("dogs", "TKS"),
    # initial-exception table
    ("knight", "NT"), ("wright", "RT"), ("whale", "WL"), ("xylophone", "SLFN"),
    ("aeon", "EN"),
    # silent MB$, PH, TH, SCH, DGE
    ("lamb", "LM"), ("phone", "FN"), ("through", "0R"), ("school", "SKL"),
    ("judge", "JJ"),
])
def test_metaphone_commons_codec_vectors(word, code):
    assert metaphone(word) == code


def test_metaphone_single_char_and_empty():
    assert metaphone("a") == "A"
    assert metaphone("") == ""


@pytest.mark.parametrize("word,code", [
    ("Thompson", "TMPSN11111"),
    ("David", "TFT1111111"),
    ("Whittle", "WTA1111111"),
])
def test_caverphone2_commons_codec_vectors(word, code):
    assert caverphone2(word) == code


@pytest.mark.parametrize("word,code", [
    ("Knight", "NAGT"),
    ("Mitchell", "MATCAL"),
    ("MacDonald", "MCDANA"),
])
def test_nysiis_commons_codec_vectors(word, code):
    assert nysiis(word) == code


def test_refined_soundex_keeps_every_code():
    # unlike Soundex there is no 4-char cap and vowels emit 0
    assert refined_soundex("testing") == "T6036084"


def test_inject_identity_passthrough():
    # identity encodings pass the token through once
    assert phonetic_tokens("A", inject=True, encoder="Metaphone") == ["A"]
