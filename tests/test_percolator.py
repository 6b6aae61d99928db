"""Percolator — queries-as-data matching (lucene/memory MemoryIndex
prospective-search semantics)."""

from __future__ import annotations

import pytest

from lucene_solr_spark.queries.percolator import (
    PercolatorQuery,
    decompose,
    percolate,
)
from lucene_solr_spark.queries.query import (
    BooleanClause,
    BooleanQuery,
    Occur,
    PhraseQuery,
    SynonymQuery,
    TermQuery,
)


@pytest.fixture(scope="module")
def postings(spark):
    # doc 0: "big table hash join"  doc 1: "table scan hash"
    # doc 2: "hash table merge"     doc 3: "window scan"
    docs = {
        0: ["big", "table", "hash", "join"],
        1: ["table", "scan", "hash"],
        2: ["hash", "table", "merge"],
        3: ["window", "scan"],
    }
    rows = []
    for d, toks in docs.items():
        for t in set(toks):
            rows.append(
                (d, t, toks.count(t), [i for i, x in enumerate(toks) if x == t])
            )
    return spark.createDataFrame(
        rows, "doc_id: bigint, term: string, tf: int, positions: array<int>"
    )


def _pairs(df):
    return sorted((r["query_id"], r["doc_id"]) for r in df.collect())


def test_term_and_boolean_roles(spark, postings):
    regs = [
        decompose(0, TermQuery("table")),
        decompose(1, BooleanQuery((
            BooleanClause(Occur.MUST, TermQuery("table")),
            BooleanClause(Occur.MUST, TermQuery("scan")),
        ))),
        decompose(2, BooleanQuery((
            BooleanClause(Occur.MUST, TermQuery("hash")),
            BooleanClause(Occur.MUST_NOT, TermQuery("merge")),
        ))),
    ]
    assert _pairs(percolate(postings, regs)) == [
        (0, 0), (0, 1), (0, 2), (1, 1), (2, 0), (2, 1),
    ]


def test_min_should_match(spark, postings):
    q = BooleanQuery(
        tuple(
            BooleanClause(Occur.SHOULD, TermQuery(t))
            for t in ("big", "scan", "merge")
        ),
        minimum_number_should_match=2,
    )
    # no doc has two of {big, scan, merge}... doc 1 has scan only;
    # make mm=1 to check the pure-SHOULD default too
    assert _pairs(percolate(postings, [decompose(0, q)])) == []
    q1 = BooleanQuery(
        tuple(
            BooleanClause(Occur.SHOULD, TermQuery(t))
            for t in ("big", "merge")
        )
    )
    # pure SHOULD needs >= 1 clause (Boolean2ScorerSupplier.java:75-83)
    assert _pairs(percolate(postings, [decompose(1, q1)])) == [
        (1, 0), (1, 2),
    ]


def test_exact_phrase(spark, postings):
    regs = [
        decompose(0, PhraseQuery(("table", "hash"))),
        decompose(1, PhraseQuery(("hash", "table"))),
    ]
    # doc 0 "table hash" adjacent; doc 1 has table..hash non-adjacent;
    # doc 2 "hash table" adjacent
    assert _pairs(percolate(postings, regs)) == [(0, 0), (1, 2)]


def test_filter_folds_to_must(spark, postings):
    q = BooleanQuery((
        BooleanClause(Occur.FILTER, TermQuery("table")),
        BooleanClause(Occur.MUST, TermQuery("merge")),
    ))
    assert _pairs(percolate(postings, [decompose(0, q)])) == [(0, 2)]


def test_unsupported_raises():
    with pytest.raises(NotImplementedError):
        decompose(0, SynonymQuery(("a", "b")))
    with pytest.raises(NotImplementedError):
        decompose(0, PhraseQuery(("a", "b"), slop=2))
    with pytest.raises(NotImplementedError):
        decompose(
            0,
            BooleanQuery((
                BooleanClause(Occur.SHOULD, PhraseQuery(("a", "b"))),
            )),
        )


def test_repeated_phrase_term(spark):
    # "go go" — repeated term at two offsets must intersect per offset
    rows = [
        (0, "go", 2, [0, 1]),   # "go go" — match
        (1, "go", 2, [0, 2]),   # "go x go" — no match
    ]
    p = spark.createDataFrame(
        rows, "doc_id: bigint, term: string, tf: int, positions: array<int>"
    )
    regs = [decompose(0, PhraseQuery(("go", "go")))]
    assert _pairs(percolate(p, regs)) == [(0, 0)]
