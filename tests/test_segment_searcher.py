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


def test_decoded_cache_lru_eviction(spark):
    """The per-term decoded cache is a bounded LRU: overflowing it
    evicts + unpersists the least-recently-used frame (the reference's
    searcher caches are size-bounded, solrconfig.xml:443-459)."""
    from lucene_solr_spark.queries.segment_searcher import SegmentSearcher

    cache: dict = {}
    frames = []

    class _FakeDF:
        def __init__(self, i):
            self.i = i
            self.persisted = True

        def unpersist(self):
            self.persisted = False

    for i in range(5):
        df = _FakeDF(i)
        frames.append(df)
        SegmentSearcher._cache_put(cache, f"t{i}", df, max_size=3)
    # 0 and 1 evicted and unpersisted, 2..4 resident
    assert [f.persisted for f in frames] == [False, False, True, True, True]
    assert list(cache) == ["t2", "t3", "t4"]
    # touching t2 refreshes recency: t3 is now the LRU
    assert SegmentSearcher._cache_get(cache, "t2") is frames[2]
    SegmentSearcher._cache_put(cache, "t5", _FakeDF(5), max_size=3)
    assert not frames[3].persisted and list(cache) == ["t4", "t2", "t5"]
