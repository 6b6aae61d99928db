"""CursorMark deep paging (solr search/CursorMark.java protocol)."""

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.queries.cursor import (
    CURSOR_MARK_START,
    SortSpec,
    cursor_page,
    cursor_walk,
    validate_sorts,
)


SORTS = [SortSpec("score", ascending=False), SortSpec("doc_id", ascending=True)]


@pytest.fixture(scope="module")
def scored(searcher):
    from lucene_solr_spark.queries.parser import parse_query

    return searcher.docs(parse_query("spark window")).select(
        "doc_id", F.round(F.col("score").cast("double"), 4).alias("score")
    )


def test_requires_unique_key_tiebreak():
    with pytest.raises(ValueError):
        validate_sorts([SortSpec("score")], "doc_id")
    with pytest.raises(ValueError):
        validate_sorts([], "doc_id")
    validate_sorts(SORTS, "doc_id")


def test_pages_partition_the_ranking(scored):
    # 3 pages of 7 == the top-21 ranked rows, in order, no dup/skip
    expect = [
        (r["doc_id"], r["score"])
        for r in scored.orderBy(
            F.col("score").desc(), F.col("doc_id").asc()
        ).limit(21).collect()
    ]
    got = []
    mark = CURSOR_MARK_START
    for _ in range(3):
        page, mark2 = cursor_page(scored, SORTS, mark, 7)
        rows = page.collect()
        assert len(rows) == 7
        got.extend((r["doc_id"], r["score"]) for r in rows)
        assert mark2 != mark
        mark = mark2
    assert got == expect


def test_end_of_results_returns_same_mark(scored):
    n = scored.count()
    mark = CURSOR_MARK_START
    seen = 0
    for _i, page in cursor_walk(scored, SORTS, rows=200):
        seen += page.count()
    assert seen == n
    # manual protocol: after draining, the mark echoes back
    mark = CURSOR_MARK_START
    while True:
        _page, nxt = cursor_page(scored, SORTS, mark, 200)
        if nxt == mark:
            break
        mark = nxt
    _page, again = cursor_page(scored, SORTS, mark, 200)
    assert again == mark


def test_tie_safe_across_page_boundary(spark):
    # every score identical → ordering is carried ENTIRELY by the
    # uniqueKey tiebreak; pages must still partition exactly
    df = spark.range(0, 50).select(
        F.col("id").alias("doc_id"), F.lit(1.0).alias("score")
    )
    ids = []
    for _i, page in cursor_walk(df, SORTS, rows=9):
        ids.extend(r["doc_id"] for r in page.collect())
    assert ids == list(range(50))


def test_bad_token_raises(scored):
    with pytest.raises(ValueError):
        cursor_page(scored, SORTS, "not-a-token", 5)
