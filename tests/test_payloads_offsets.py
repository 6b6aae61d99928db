"""Payload postings / PayloadScoreQuery + offsets postings / offset
highlighting (payloads/PayloadScoreQuery.java, DelimitedPayloadTokenFilter,
IndexOptions offsets)."""

import pytest

from lucene_solr_spark.queries.offsets import (
    highlight_from_offsets,
    offsets_postings,
    tokenize_with_offsets,
)
from lucene_solr_spark.queries.payloads import payload_postings, payload_score


def test_tokenize_with_offsets_spans():
    toks, poss, starts, ends = tokenize_with_offsets("ab  cd ef")
    assert toks == ["ab", "cd", "ef"]
    assert poss == [0, 1, 2]
    assert starts == [0, 4, 7]
    assert ends == [2, 6, 9]
    # skipped >255 token still consumes its position
    toks2, poss2, _s, _e = tokenize_with_offsets("a " + "x" * 300 + " b")
    assert toks2 == ["a", "b"]
    assert poss2 == [0, 2]


def test_payload_postings_and_score(spark):
    df = spark.createDataFrame(
        [(1, "spark|2 data|3 spark|4"), (2, "data|1"), (3, "spark")],
        ["doc_id", "text"],
    )
    posts = payload_postings(df)
    rows = {
        (r["doc_id"], r["term"]): r for r in posts.collect()
    }
    assert rows[(1, "spark")]["positions"] == [0, 2]
    assert rows[(1, "spark")]["payloads"] == [2.0, 4.0]
    assert rows[(3, "spark")]["payloads"] == [1.0]  # default payload
    got = {
        r["doc_id"]: r["score"]
        for r in payload_score(posts, "spark", "sum").collect()
    }
    assert got == {1: 6.0, 3: 1.0}
    mx = {
        r["doc_id"]: r["score"]
        for r in payload_score(posts, "spark", "max").collect()
    }
    assert mx[1] == 4.0
    avg = {
        r["doc_id"]: r["score"]
        for r in payload_score(posts, "spark", "avg").collect()
    }
    assert avg[1] == 3.0
    with pytest.raises(ValueError):
        payload_score(posts, "spark", "median")


def test_offsets_postings_and_highlight(spark):
    df = spark.createDataFrame(
        [(1, "the spark engine is fast"), (2, "no match here")],
        ["doc_id", "text"],
    )
    posts = offsets_postings(df)
    spark_row = posts.filter("term = 'spark' AND doc_id = 1").collect()[0]
    assert spark_row["starts"] == [4]
    assert spark_row["ends"] == [9]
    # stopword 'the' must be dropped but keep the position gap
    assert spark_row["positions"] == [1]
    hl = highlight_from_offsets(posts, df, "spark", window=12).collect()
    assert len(hl) == 1
    assert hl[0]["snippet"] == "spark engine"
    assert hl[0]["first_start"] == 4


def test_payload_check(spark):
    from lucene_solr_spark.queries.payloads import payload_check

    df = spark.createDataFrame(
        [
            (1, "big|2 data|3 big|2 deal|3"),
            (2, "big|2 data|1"),
            (3, "big|9 data|3"),
            (4, "data|3 big|2"),
        ],
        ["doc_id", "text"],
    )
    posts = payload_postings(df)
    # phrase "big data" with payloads [2, 3]: doc 1 only (doc 2 wrong
    # payload, doc 3 wrong first payload, doc 4 wrong order)
    got = {
        r["doc_id"]: r["spans"]
        for r in payload_check(posts, ["big", "data"], [2.0, 3.0]).collect()
    }
    assert got == {1: 1}
    # single-term check: payload equality at any position
    got = {
        r["doc_id"]: r["spans"]
        for r in payload_check(posts, ["big"], [2.0]).collect()
    }
    assert got == {1: 2, 2: 1, 4: 1}
    with pytest.raises(ValueError, match="one payload per term"):
        payload_check(posts, ["big"], [1.0, 2.0])
