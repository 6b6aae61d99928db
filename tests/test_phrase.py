"""Phrase query semantics (mirrors TestPhraseQuery.java): exact hits,
phraseFreq counts, stop-gap positions."""

from conftest import assert_rank_identical
from lucene_solr_spark.queries import PhraseQuery


def test_phrase_two_terms(searcher, oracle):
    assert_rank_identical(
        searcher.search('"key agg"', 10),
        oracle.top_k(oracle.phrase_scores(["key", "agg"]), 10),
    )


def test_phrase_three_terms(searcher, oracle):
    assert_rank_identical(
        searcher.search('"table part value"', 10),
        oracle.top_k(oracle.phrase_scores(["table", "part", "value"]), 10),
    )


def test_phrase_freq_counts(searcher, oracle):
    got = searcher.count(PhraseQuery(("fast", "table")))
    assert got == len(oracle.phrase_docs(["fast", "table"]))


def test_phrase_with_stop_gap(searcher, oracle):
    # "part a row" analyzes to part@0, row@2 — the gap must be honored:
    # docs with "part row" adjacent must NOT match.
    q_gap = PhraseQuery(("part", "row"), (0, 2))
    q_adj = PhraseQuery(("part", "row"), (0, 1))
    gap_docs = {r["doc_id"] for r in searcher.docs(q_gap).collect()}
    adj_docs = {r["doc_id"] for r in searcher.docs(q_adj).collect()}
    assert gap_docs == set(oracle.phrase_docs(["part", "row"], [0, 2]))
    assert adj_docs == set(oracle.phrase_docs(["part", "row"], [0, 1]))
    assert gap_docs != adj_docs  # the corpus distinguishes them


def test_phrase_parser_applies_stop_gap(searcher, oracle):
    # parsed '"part a row"' == explicit positions (0, 2)
    got = {r["doc_id"] for r in searcher.docs('"part a row"').collect()}
    assert got == set(oracle.phrase_docs(["part", "row"], [0, 2]))


def test_phrase_zero_hit(searcher):
    assert searcher.count(PhraseQuery(("zq", "xwv"))) == 0


def test_phrase_repeated_term(searcher, oracle):
    got = {r["doc_id"] for r in searcher.docs(PhraseQuery(("table", "table"))).collect()}
    assert got == set(oracle.phrase_docs(["table", "table"]))
