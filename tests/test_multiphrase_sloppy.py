"""Sloppy MultiPhraseQuery goldens mirroring the reference's
TestMultiPhraseQuery (lucene/core/src/test/org/apache/lucene/search/
TestMultiPhraseQuery.java:60-128): per-slot term alternatives with
slop route through the SloppyPhraseScorer machinery over each slot's
union postings (MultiPhraseQuery.java:55,83-90)."""

from __future__ import annotations

import numpy as np
import pytest

from lucene_solr_spark.index import build_tables
from lucene_solr_spark.queries import IndexSearcher
from lucene_solr_spark.queries.query import MultiPhraseQuery
from lucene_solr_spark.queries.sloppy import sloppy_phrase_freq


@pytest.fixture(scope="module")
def pizza_searcher(spark):
    # TestMultiPhraseQuery.testPhrasePrefix corpus
    rows = [
        (0, "blueberry pie"),
        (1, "blueberry strudel"),
        (2, "blueberry pizza"),
        (3, "blueberry chewing gum"),
        (4, "bluebird pizza"),
        (5, "bluebird foobar pizza"),
        (6, "piccadilly circus"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return IndexSearcher(build_tables(df, id_col="doc_id", text_col="text"))


def test_slop0_prefix_disjunction(pizza_searcher):
    # "(blueberry bluebird) pizza" slop=0 → blueberry pizza, bluebird pizza
    q = MultiPhraseQuery((("blueberry", "bluebird"), ("pizza",)))
    got = {r["doc_id"] for r in pizza_searcher.docs(q).collect()}
    assert got == {2, 4}


def test_slop1_reaches_gapped_doc(pizza_searcher):
    # setSlop(1) → blueberry pizza, bluebird pizza, bluebird foobar pizza
    # (TestMultiPhraseQuery.java:120-128)
    q = MultiPhraseQuery((("blueberry", "bluebird"), ("pizza",)), slop=1)
    got = {r["doc_id"] for r in pizza_searcher.docs(q).collect()}
    assert got == {2, 4, 5}


def test_negative_slop_rejected():
    # Builder.setSlop rejects negatives (MultiPhraseQuery.java:84-86)
    with pytest.raises(ValueError):
        MultiPhraseQuery((("a",), ("b",)), slop=-1)


def test_overlapping_slots_raise(pizza_searcher):
    # a term shared across slots takes the reference's multi-term
    # repeat branch — explicitly unimplemented, loud failure
    q = MultiPhraseQuery((("pizza", "blueberry"), ("pizza",)), slop=2)
    with pytest.raises(NotImplementedError):
        pizza_searcher.docs(q)


def test_sloppy_freq_matches_union_postings_kernel(pizza_searcher):
    """Engine freq for the slop=1 multi-phrase equals the scalar sloppy
    kernel run over hand-built union position lists, doc by doc."""
    corpus = {
        0: "blueberry pie",
        1: "blueberry strudel",
        2: "blueberry pizza",
        3: "blueberry chewing gum",
        4: "bluebird pizza",
        5: "bluebird foobar pizza",
        6: "piccadilly circus",
    }
    slots = (("blueberry", "bluebird"), ("pizza",))
    q = MultiPhraseQuery(slots, slop=1)
    rows = {r["doc_id"]: r["score"] for r in pizza_searcher.docs(q).collect()}
    for doc_id, text in corpus.items():
        toks = text.split()
        lists = []
        for slot in slots:
            ps = sorted(i for i, t in enumerate(toks) if t in slot)
            lists.append(np.asarray(ps, dtype=np.int64))
        expected = (
            0.0
            if any(len(p) == 0 for p in lists)
            else sloppy_phrase_freq(lists, [0, 1], 1)
        )
        assert (doc_id in rows) == (expected > 0.0), (doc_id, expected)
