"""FreeTextSuggester — stupid-backoff n-gram suggestions
(suggest/analyzing/FreeTextSuggester.java:423-689)."""

import pytest

from lucene_solr_spark.queries.freetext import FreeTextSuggester

CORPUS = [
    "foo bar baz",
    "foo bar boo",
    "foo bar bar",
    "foo bee",
    "bar foo bar",
]
# unigram counts: foo 4+? let's recount: tokens
#  d0: foo bar baz | d1: foo bar boo | d2: foo bar bar | d3: foo bee
#  d4: bar foo bar
# foo=5? d0..d3 four foos + d4 one = 5; bar: d0 1, d1 1, d2 2, d4 2 = 6
# baz=1 boo=1 bee=1  → totTokens = 14
# bigrams "foo *": foo bar ×3 (d0,d1,d2), foo bee ×1, foo bar (d4) ×1
#   → foo bar = 4, foo bee = 1; count(foo)=5


@pytest.fixture(scope="module")
def sug(spark):
    docs = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    return FreeTextSuggester(grams=2).build(docs)


def rows(df):
    return [(r["key"], r["score"]) for r in df.collect()]


def test_counts_and_tot(sug):
    assert sug.tot_tokens == 14
    c = {
        (r["n"], r["gram"]): r["cnt"]
        for r in sug.counts.collect()
    }
    assert c[(1, "foo")] == 5 and c[(1, "bar")] == 6
    assert c[(2, "foo bar")] == 4 and c[(2, "foo bee")] == 1


def test_next_word_prediction(sug):
    """Trailing space → predict the word AFTER 'foo' (bigram model
    only; no unigram predictions from the empty string)."""
    got = rows(sug.lookup("foo ", num=3))
    assert got == [("foo bar", 4 / 5), ("foo bee", 1 / 5)]


def test_completion_with_backoff_and_dedup(sug):
    """'foo b' completes within the bigram model first (backoff 1.0),
    then the unigram model at 0.4 — skipping last tokens the bigram
    model already suggested."""
    got = rows(sug.lookup("foo b", num=5))
    # bigram level: foo bar (4/5), foo bee (1/5)
    # unigram level (0.4/14 each), minus {bar, bee}: baz, boo; bar/bee deduped
    expect = [
        ("foo bar", 1.0 * 4 / 5),
        ("foo bee", 1.0 * 1 / 5),
        ("baz", 0.4 * 1 / 14),
        ("boo", 0.4 * 1 / 14),
    ]
    assert got == expect  # tie (baz, boo) broken by key ASC


def test_unseen_context_backs_off(sug):
    """Context the bigram model never saw → only unigram suggestions,
    still at 0.4 (the bigram level was attempted and decayed)."""
    got = rows(sug.lookup("zzz b", num=4))
    assert got == [
        ("bar", 0.4 * 6 / 14),
        ("baz", 0.4 * 1 / 14),
        ("bee", 0.4 * 1 / 14),
        ("boo", 0.4 * 1 / 14),
    ]


def test_single_partial_token_unigram_only(sug):
    """One partial token: bigram model lacks input (skipped WITHOUT
    backoff decay — :519-523 continue), unigram scores at 1.0."""
    got = rows(sug.lookup("b", num=2))
    assert got == [("bar", 6 / 14), ("baz", 1 / 14)]


def test_trigram_model(spark):
    sug3 = FreeTextSuggester(grams=3).build(
        spark.createDataFrame([(t,) for t in CORPUS], "text string")
    )
    got = rows(sug3.lookup("foo bar ", num=3))
    # trigram level ctx='foo bar': baz 1, boo 1, bar 1 (all 1/4 of
    # count('foo bar')=4); bigram level ctx='bar' at 0.4 minus dedup:
    # 'bar foo' (1/6)·0.4 — 'bar bar','bar baz','bar boo' deduped
    assert got[:3] == [
        ("foo bar bar", 1 / 4),
        ("foo bar baz", 1 / 4),
        ("foo bar boo", 1 / 4),
    ]
    more = rows(sug3.lookup("foo bar ", num=5))
    assert ("bar foo", pytest.approx(0.4 * 1 / 6)) in [
        (k, pytest.approx(s)) for k, s in more
    ]


def test_corpus_smoke(spark, docs_df):
    sug = FreeTextSuggester(grams=2).build(docs_df, text_col="text")
    got = rows(sug.lookup("spark ", num=5))
    assert 0 < len(got) <= 5
    assert all(k.startswith("spark ") for k, _ in got)
    assert got == sorted(got, key=lambda t: (-t[1], t[0]))
