"""QueryElevationComponent pins + WordBreakSpellChecker suggestions
(handler/component/QueryElevationComponent.java,
lucene/suggest/.../spell/WordBreakSpellChecker.java)."""

from __future__ import annotations

import pytest

from lucene_solr_spark.queries.elevate import elevate_topk
from lucene_solr_spark.queries.mlt import (
    wordbreak_suggest,
    wordcombine_suggest,
)


@pytest.fixture(scope="module")
def corpus(spark):
    from lucene_solr_spark.index import build_tables
    from lucene_solr_spark.queries.searcher import IndexSearcher

    docs = spark.createDataFrame(
        [
            (0, "hash join probe build"),
            (1, "sort merge join spill"),
            (2, "hash table lookup"),
            (3, "merge sort runs"),
        ],
        ["doc_id", "text"],
    )
    return IndexSearcher(build_tables(docs, id_col="doc_id", text_col="text"))


def test_elevate_pins_and_forces(spark, corpus):
    """Pinned ids lead in CONFIG order; a pinned id that missed the
    query is forced in at score 0; excludes drop; organic tail keeps
    score order."""
    res = corpus.docs("hash join")  # matches docs 0,1,2
    out = elevate_topk(res, elevated_ids=[3, 2], excluded_ids=[1], k=10)
    rows = out.collect()
    assert [r["doc_id"] for r in rows[:2]] == [3, 2]  # config order
    assert rows[0]["score"] == 0.0 and rows[0]["elevated"]  # forced in
    assert all(not r["elevated"] for r in rows[2:])
    assert 1 not in {r["doc_id"] for r in rows}  # excluded
    # no pins -> pure organic order
    plain = elevate_topk(res, [], k=2).collect()
    assert [r["elevated"] for r in plain] == [False, False]


def test_wordbreak_suggest(spark, corpus):
    out = wordbreak_suggest(corpus, "hashjoin").collect()
    assert [(r["a"], r["b"]) for r in out] == [("hash", "join")]
    # freq = min(df(hash)=2, df(join)=2)
    assert out[0]["freq"] == 2
    # too short to split under min_break_length
    assert wordbreak_suggest(corpus, "sort").count() == 0


def test_wordcombine_suggest(spark):
    from lucene_solr_spark.index import build_tables
    from lucene_solr_spark.queries.searcher import IndexSearcher

    docs = spark.createDataFrame(
        [(0, "whitefish swims"), (1, "white fish market")],
        ["doc_id", "text"],
    )
    s = IndexSearcher(build_tables(docs, id_col="doc_id", text_col="text"))
    out = wordcombine_suggest(s, ["white", "fish", "market"]).collect()
    assert [(r["pos"], r["combined"], r["freq"]) for r in out] == [
        (0, "whitefish", 1)
    ]
