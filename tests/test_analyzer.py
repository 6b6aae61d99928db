"""Analyzer contract tests (mirrors the reference's tokenizer goldens;
FIXTURES.md §3 golden/tokens cases, grammar refs in
analysis/standard/StandardTokenizerImpl.jflex)."""

from lucene_solr_spark.analysis import ENGLISH_STOP_WORDS, analyze_text, tokenize


def toks(text):
    return tokenize(text)[0]


def test_snake_case_one_token():
    # '_' is ExtendNumLet, WB13a/b (.jflex:59,131-132)
    assert toks("snake_case") == ["snake_case"]
    assert toks("_lead trail_ a__b") == ["_lead", "trail_", "a__b"]


def test_dotted_path_one_token():
    # FULL STOP is MidNumLet, WB6/7 (.jflex:57,145-146)
    assert toks("foo.bar") == ["foo.bar"]
    assert toks("foo.bar.baz") == ["foo.bar.baz"]


def test_double_mid_breaks():
    assert toks("foo..bar") == ["foo", "bar"]
    assert toks("foo(bar") == ["foo", "bar"]
    assert toks("foo,bar") == ["foo", "bar"]  # comma joins only digits


def test_numeric_joins():
    # WB11/12 (.jflex:58,129-130)
    assert toks("1,000") == ["1,000"]
    assert toks("3.14") == ["3.14"]
    assert toks("1,000.5") == ["1,000.5"]


def test_camel_case_no_split():
    assert toks("camelCase") == ["camelCase"]


def test_apostrophe_joins_letters():
    assert toks("can't") == ["can't"]


def test_mid_needs_letter_context():
    # '_' isn't ALetter, so '.' after '_' breaks (WB6 needs ALetter)
    assert toks("foo_.bar") == ["foo_", "bar"]


def test_no_email_url_tokens():
    # the 7.0 grammar has no EMAIL/URL rules (.jflex:70-73)
    assert toks("user@example.com") == ["user", "example.com"]
    assert toks("http://foo.bar/baz") == ["http", "foo.bar", "baz"]


def test_cjk_per_char_katakana_runs():
    assert toks("中文") == ["中", "文"]
    assert toks("カタカナ") == ["カタカナ"]


def test_max_token_length_skip_with_position_gap():
    # StandardTokenizer.java:182-192: over-long token skipped, position kept
    tokens, positions = tokenize("x " + "y" * 300 + " z")
    assert tokens == ["x", "z"]
    assert positions == [0, 2]


def test_exactly_255_kept():
    tokens, _ = tokenize("a" * 255)
    assert tokens == ["a" * 255]
    tokens, _ = tokenize("a" * 256)
    assert tokens == []


def test_stopwords_dropped_with_position_gaps():
    # FilteringTokenFilter.java:46-60: position increments preserved
    terms, positions = analyze_text("The head of a list")
    assert terms == ["head", "list"]
    assert positions == [1, 4]


def test_lowercase_after_tokenize():
    terms, _ = analyze_text("CamelCase FOO")
    assert terms == ["camelcase", "foo"]


def test_stopword_set_is_exact():
    assert len(ENGLISH_STOP_WORDS) == 33
    assert "the" in ENGLISH_STOP_WORDS and "with" in ENGLISH_STOP_WORDS
    assert "The".lower() in ENGLISH_STOP_WORDS


def test_analyze_golden_sentence():
    terms, positions = analyze_text(
        "import numpy as np  # the fast.path for v2_impl"
    )
    assert terms == ["import", "numpy", "np", "fast.path", "v2_impl"]
    assert positions == [0, 1, 3, 5, 7]


def test_ascii_tier_equivalent_to_full_pattern():
    """The ASCII-specialized tier-2.5 pattern must emit exactly the
    full UAX#29 pattern's tokens on any ASCII input (the guard only
    routes ASCII text there)."""
    import random

    from lucene_solr_spark.analysis.tokenizer import _ASCII_FULL, _TOKEN_RE

    random.seed(1)
    chars = "ab1 _.',;x9\"!Z0-"
    for _ in range(20000):
        s = "".join(
            random.choice(chars) for _ in range(random.randint(0, 30))
        )
        assert _ASCII_FULL.findall(s) == _TOKEN_RE.findall(s), repr(s)
