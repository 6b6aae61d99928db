"""liveDocs / delete-by-query semantics (Lucene50LiveDocsFormat .liv,
IndexWriter.deleteDocuments): deleted docs vanish from every match but
statistics stay stale until merge."""

from __future__ import annotations

import pytest

from lucene_solr_spark.queries.query import MatchAllDocsQuery, TermQuery


@pytest.fixture(scope="module")
def del_env(spark):
    from lucene_solr_spark.index import build_tables
    from lucene_solr_spark.queries import IndexSearcher

    rows = [
        (0, "spark window merge"),
        (1, "spark spark batch"),
        (2, "window stream"),
        (3, "spark stream window"),
        (4, "merge batch"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    tables = build_tables(df, id_col="doc_id", text_col="text")
    base = IndexSearcher(tables, cache_postings=False)
    dead = base._match(TermQuery("window"))  # docs 0, 2, 3
    deleted = IndexSearcher(tables, cache_postings=False, tombstones=dead)
    return base, deleted


def test_deleted_docs_excluded(del_env):
    base, deleted = del_env
    assert {r["doc_id"] for r in base.docs(TermQuery("spark")).collect()} == {0, 1, 3}
    assert {r["doc_id"] for r in deleted.docs(TermQuery("spark")).collect()} == {1}


def test_match_all_and_count_respect_livedocs(del_env):
    base, deleted = del_env
    assert deleted.count(MatchAllDocsQuery()) == 2
    assert {r["doc_id"] for r in deleted.docs(MatchAllDocsQuery()).collect()} == {1, 4}


def test_stats_stay_stale_until_merge(del_env):
    # The surviving doc's score must be IDENTICAL before and after the
    # delete: docFreq/avgdl still count tombstoned docs (reference
    # semantics — stats refresh only at merge).
    base, deleted = del_env
    before = {r["doc_id"]: r["score"] for r in base.docs(TermQuery("spark")).collect()}
    after = {r["doc_id"]: r["score"] for r in deleted.docs(TermQuery("spark")).collect()}
    assert after == {1: before[1]}
