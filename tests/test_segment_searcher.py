"""SegmentSearcher (on-disk index) equivalence with the in-memory
searcher, plus pushdown-before-decode plan checks."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.index.segments import SegmentedIndex
from lucene_solr_spark.queries.parser import parse_query
from lucene_solr_spark.queries.segment_searcher import SegmentSearcher


@pytest.fixture(scope="module")
def seg_searcher(spark, docs_df, tmp_path_factory):
    idx = SegmentedIndex(spark, str(tmp_path_factory.mktemp("ssidx")))
    idx.build(
        docs_df.select("doc_id", F.col("text").alias("content")),
        num_segments=6,
    )
    return SegmentSearcher(idx)


QUERIES = [
    "spark",
    "+spark +window",
    "vector hash dup",
    "+table -vector",
    '"spark window"',
    "s*",
    "tabel~1",
]


@pytest.mark.parametrize("qs", QUERIES, ids=[q[:20] for q in QUERIES])
def test_segment_searcher_matches_memory(searcher, seg_searcher, qs):
    q = parse_query(qs)
    expect = [(r["doc_id"], r["score"]) for r in searcher.search(q, k=20).collect()]
    got = [(r["doc_id"], r["score"]) for r in seg_searcher.search(q, k=20).collect()]
    assert got == expect


def test_term_filter_pushdown_before_decode(seg_searcher):
    plan = seg_searcher._postings_for_terms(["spark"])._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "spark" in plan


def test_segment_searcher_count(searcher, seg_searcher):
    assert seg_searcher.count("window") == searcher.count("window")
