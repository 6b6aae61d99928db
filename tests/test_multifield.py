"""Multi-field indexing + fielded queries (Term(field, text) semantics,
StringField keyword indexing, Solr fq-style filters, cross-field dismax)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.index.builder import build_keyword_tables
from lucene_solr_spark.queries.multifield import MultiFieldSearcher
from lucene_solr_spark.queries.parser import parse_query
from lucene_solr_spark.queries.query import (
    BooleanClause,
    BooleanQuery,
    DisjunctionMaxQuery,
    FieldQuery,
    Occur,
    TermQuery,
)

FIELDS = frozenset({"text", "lang", "source"})


@pytest.fixture(scope="module")
def mf_searcher(spark, docs_df, tables):
    return MultiFieldSearcher(
        {
            "text": tables,
            "lang": build_keyword_tables(docs_df, "doc_id", "lang"),
            "source": build_keyword_tables(docs_df, "doc_id", "source"),
        },
        default_field="text",
    )


def test_parser_known_field_wraps():
    q = parse_query("lang:en", fields=FIELDS)
    assert q == FieldQuery("lang", TermQuery("en"))


def test_parser_unknown_field_strips():
    q = parse_query("body:spark", fields=FIELDS)
    assert q == TermQuery("spark")


def test_parser_field_phrase():
    q = parse_query('text:"spark window"', fields=FIELDS)
    assert isinstance(q, FieldQuery) and q.field == "text"


def test_keyword_field_count(mf_searcher, docs_df):
    got = mf_searcher.count(FieldQuery("lang", TermQuery("en")))
    expect = docs_df.filter(F.col("lang") == "en").count()
    assert got == expect


def test_fq_filter_semantics(mf_searcher, searcher, docs_df):
    """+spark +lang:en as FILTER == single-field 'spark' restricted to
    en docs, scores unchanged (FILTER does not score)."""
    q = BooleanQuery(
        (
            BooleanClause(Occur.MUST, TermQuery("spark")),
            BooleanClause(Occur.FILTER, FieldQuery("lang", TermQuery("en"))),
        )
    )
    got = {(r["doc_id"], r["score"]) for r in mf_searcher.docs(q).collect()}
    en_docs = {
        r["doc_id"] for r in docs_df.filter(F.col("lang") == "en").collect()
    }
    expect = {
        (r["doc_id"], r["score"])
        for r in searcher.docs(TermQuery("spark")).collect()
        if r["doc_id"] in en_docs
    }
    assert got == expect


def test_scored_keyword_clause(mf_searcher, docs_df):
    """MUST lang:en scores with the keyword field's own stats
    (per-field norms/avgdl, as in Lucene)."""
    rows = mf_searcher.docs(FieldQuery("lang", TermQuery("en"))).collect()
    assert len(rows) == docs_df.filter(F.col("lang") == "en").count()
    scores = {r["score"] for r in rows}
    assert len(scores) == 1  # same tf/norm everywhere -> constant score
    assert min(scores) > 0


def test_cross_field_dismax(mf_searcher):
    q = DisjunctionMaxQuery(
        (
            FieldQuery("text", TermQuery("spark")),
            FieldQuery("source", TermQuery("src3")),
        ),
        tie_breaker=0.2,
    )
    rows = mf_searcher.search(q, k=10).collect()
    assert len(rows) == 10


def test_parsed_mixed_query_end_to_end(mf_searcher):
    q = parse_query("+spark +lang:en vector", fields=FIELDS)
    rows = mf_searcher.search(q, k=5).collect()
    assert rows and all(r["score"] > 0 for r in rows)
