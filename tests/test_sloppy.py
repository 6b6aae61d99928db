"""Sloppy phrase (SloppyPhraseScorer semantics, distinct terms).

Golden cases from the reference's own Javadoc
(search/SloppyPhraseScorer.java:83-95): for query "a b"~2 the document
"x a b a y" scores two matches — "a b" at distance 0 and "b a" at
distance 2 — so phraseFreq = 1/1 + 1/3.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lucene_solr_spark.queries.parser import parse_query
from lucene_solr_spark.queries.query import PhraseQuery
from lucene_solr_spark.queries.sloppy import sloppy_phrase_freq


def test_javadoc_golden_case():
    # doc "x a b a y": a at positions 1,3; b at 2
    freq = sloppy_phrase_freq([np.array([1, 3]), np.array([2])], [0, 1], slop=2)
    assert freq == pytest.approx(1.0 + 1.0 / 3.0, abs=1e-6)


def test_exact_alignment_scores_one():
    freq = sloppy_phrase_freq([np.array([5]), np.array([6])], [0, 1], slop=0)
    assert freq == 1.0


def test_out_of_slop_scores_zero():
    freq = sloppy_phrase_freq([np.array([0])], [0], slop=0)
    assert freq == 1.0
    freq = sloppy_phrase_freq([np.array([0]), np.array([10])], [0, 1], slop=3)
    assert freq == 0.0


def test_reversed_within_slop():
    # "a b"~2 on "b a": b at 0, a at 1 -> adjusted a=1, b=-1 -> distance 2
    freq = sloppy_phrase_freq([np.array([1]), np.array([0])], [0, 1], slop=2)
    assert freq == pytest.approx(1.0 / 3.0, abs=1e-6)


@given(
    st.lists(st.integers(0, 60), min_size=1, max_size=8, unique=True),
    st.lists(st.integers(0, 60), min_size=1, max_size=8, unique=True),
)
@settings(max_examples=300, deadline=None)
def test_slop0_counts_exact_alignments(pa, pb):
    """At slop=0 the greedy traversal must find every exact alignment
    (equivalence with ExactPhraseScorer counting for 2 distinct terms)."""
    a = np.array(sorted(pa))
    b = np.array(sorted(pb))
    exact = len(set(a.tolist()) & set((b - 1).tolist()))
    got = sloppy_phrase_freq([a, b], [0, 1], slop=0)
    assert got == pytest.approx(float(exact), abs=1e-6)


def test_parser_slop_syntax():
    q = parse_query('"spark window"~3')
    assert isinstance(q, PhraseQuery) and q.slop == 3


def test_engine_sloppy_superset_of_exact(searcher):
    exact_docs = {
        r["doc_id"] for r in searcher.docs(PhraseQuery(("spark", "window"))).collect()
    }
    sloppy = {
        r["doc_id"]: r["score"]
        for r in searcher.docs(
            PhraseQuery(("spark", "window"), slop=3)
        ).collect()
    }
    assert exact_docs <= set(sloppy)
    assert len(sloppy) > len(exact_docs)  # slop must widen the match set
    assert all(s > 0 for s in sloppy.values())


def test_engine_repeated_terms_raises(searcher):
    with pytest.raises(NotImplementedError):
        searcher.docs(PhraseQuery(("spark", "spark"), slop=2)).collect()
