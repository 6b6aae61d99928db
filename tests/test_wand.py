"""Block-max WAND equivalence vs exhaustive scoring.

The reference's equivalence-test discipline (TestBoolean2: same query
two ways must match; TestApproximationSearchEquivalence) applied to
our WAND: for every query, WAND top-k must equal exhaustive lucene-mode
top-k in docIDs, order, and float32 scores.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.index.segments import SegmentedIndex
from lucene_solr_spark.queries import IndexSearcher
from lucene_solr_spark.queries.query import (
    BooleanClause,
    BooleanQuery,
    Occur,
    TermQuery,
)
from lucene_solr_spark.queries.wand import wand_topk


@pytest.fixture(scope="module")
def segidx(spark, docs_df, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("wandidx"))
    idx = SegmentedIndex(spark, path)
    idx.build(
        docs_df.select("doc_id", F.col("text").alias("content")),
        num_segments=8,
    )
    return idx


QUERIES = [
    ["spark"],
    ["spark", "window"],
    ["vector", "hash", "dup"],
    ["the"],            # stopword: absent from index -> empty
    ["table", "query", "scan", "merge"],   # high-df terms
]


@pytest.mark.parametrize("terms", QUERIES, ids=["-".join(q) for q in QUERIES])
@pytest.mark.parametrize("k", [1, 10, 50])
def test_wand_matches_exhaustive(spark, searcher, segidx, terms, k):
    should = BooleanQuery(
        tuple(BooleanClause(Occur.SHOULD, TermQuery(t)) for t in terms)
    )
    expect = [
        (r["doc_id"], r["score"]) for r in searcher.search(should, k=k).collect()
    ]
    got = [
        (r["doc_id"], r["score"]) for r in wand_topk(segidx, terms, k=k).collect()
    ]
    assert [d for d, _ in got] == [d for d, _ in expect]
    for (gd, gs), (ed, es) in zip(got, expect):
        assert abs(gs - es) < 1e-6, (gd, gs, es)


def test_wand_single_term_equals_termquery(searcher, segidx):
    expect = [
        (r["doc_id"], r["score"])
        for r in searcher.search(TermQuery("window"), k=20).collect()
    ]
    got = [
        (r["doc_id"], r["score"]) for r in wand_topk(segidx, ["window"], k=20).collect()
    ]
    assert got == pytest.approx(expect)
