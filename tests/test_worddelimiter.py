"""WordDelimiterFilter + NGram filters vs the reference's goldens
(miscellaneous/TestWordDelimiterFilter.java doSplit/doSplitPossessive,
ngram/TestNGramTokenFilter.java, TestEdgeNGramTokenFilter.java)."""

from __future__ import annotations

from lucene_solr_spark.analysis.worddelimiter import (
    edge_ngrams,
    ngrams,
    word_delimiter,
)


def test_reference_splits():
    """TestWordDelimiterFilter.testSplits — incl. the Unicode
    classification cases (marks, modifier letters, titlecase, Arabic
    digits, supplementary plane)."""
    cases = {
        "basic-split": ["basic", "split"],
        "camelCase": ["camel", "Case"],
        "บ้าน": ["บ้าน"],
        "test's'": ["test"],
        "Роберт": ["Роберт"],
        "РобЕрт": ["Роб", "Ерт"],
        "aǅungla": ["aǅungla"],
        "ســـــــــــــــــلام": ["ســـــــــــــــــلام"],
        "test⃝": ["test⃝"],
        "हिन्दी": ["हिन्दी"],
        "١٢٣٤": ["١٢٣٤"],
        "𠀀𠀀": ["𠀀𠀀"],
    }
    for src, want in cases.items():
        assert word_delimiter(src) == want, src


def test_possessives_and_numerics():
    assert word_delimiter("ra's", stem_english_possessive=True) == ["ra"]
    assert word_delimiter("ra's", stem_english_possessive=False) == ["ra", "s"]
    assert word_delimiter("SD500") == ["SD", "500"]
    assert word_delimiter("SD500", split_on_numerics=False) == ["SD500"]
    assert word_delimiter("PowerShot") == ["Power", "Shot"]
    assert word_delimiter("PowerShot", split_on_case_change=False) == [
        "PowerShot"
    ]


def test_catenate_and_preserve():
    assert word_delimiter("power-shot", catenate_all=True) == [
        "power", "shot", "powershot"
    ]
    assert word_delimiter("basic-split", preserve_original=True) == [
        "basic-split", "basic", "split"
    ]
    # catenate_words joins the word run; the number stands alone
    assert word_delimiter("wi-fi-4000", catenate_words=True) == [
        "wi", "fi", "4000", "wifi"
    ]
    # single-subword run: concatenation suppressed when the part was
    # already generated
    assert word_delimiter("abc-500", catenate_words=True) == [
        "abc", "500"
    ]
    assert word_delimiter("NUTCH-500", protected=frozenset(["NUTCH-500"])) == [
        "NUTCH-500"
    ]


def test_generate_flags_off():
    # parts suppressed, catenation still emitted (subwordCount>1 ||
    # !generate rule)
    assert word_delimiter(
        "power-shot", generate_word_parts=False, catenate_words=True
    ) == ["powershot"]
    assert word_delimiter(
        "abc-500", generate_number_parts=False, catenate_numbers=True
    ) == ["abc", "500"]


def test_ngrams_reference_order():
    # NGramTokenFilter 7.x: pos-major, gram size ascending
    assert ngrams("abcde", 1, 2) == [
        "a", "ab", "b", "bc", "c", "cd", "d", "de", "e"
    ]
    assert ngrams("abc", 2, 3) == ["ab", "abc", "bc"]
    assert edge_ngrams("abcde", 1, 3) == ["a", "ab", "abc"]
    assert edge_ngrams("ab", 1, 5) == ["a", "ab"]


def test_soundex_commons_codec_goldens():
    """The commons-codec Soundex examples incl. the H/W rule
    (Ashcraft: S,C share code 2 across the H — coded once)."""
    from lucene_solr_spark.analysis.phonetic import phonetic_tokens, soundex

    cases = {
        "Robert": "R163", "Rupert": "R163", "Ashcraft": "A261",
        "Ashcroft": "A261", "Tymczak": "T522", "Pfister": "P236",
        "Honeyman": "H555", "Testing": "T235",
    }
    for w, want in cases.items():
        assert soundex(w) == want, w
    assert phonetic_tokens("Robert") == ["R163", "Robert"]
    assert phonetic_tokens("Robert", inject=False) == ["R163"]
    assert phonetic_tokens("123") == ["123"]  # empty encoding passes through
