"""XML query parser ({!xmlparser} → CoreParser.java element vocabulary,
lucene/queryparser/.../xml/builders/*.java)."""

import pytest

from lucene_solr_spark.queries.local_params import (
    FunctionRangeQuery,
    SolrQueryDispatcher,
)
from lucene_solr_spark.queries.query import (
    BooleanQuery,
    BoostQuery,
    ConstantScoreQuery,
    DisjunctionMaxQuery,
    FieldQuery,
    MatchAllDocsQuery,
    Occur,
    TermQuery,
    TermRangeQuery,
)
from lucene_solr_spark.queries.spans import (
    SpanFirstQuery,
    SpanNearQuery,
    SpanNotQuery,
    SpanOrQuery,
    SpanTermQuery,
)
from lucene_solr_spark.queries.xmlparser import parse_xml_query


def test_term_and_boost_and_field():
    assert parse_xml_query("<TermQuery>spark</TermQuery>") == TermQuery("spark")
    q = parse_xml_query('<TermQuery boost="2.5">spark</TermQuery>')
    assert q == BoostQuery(TermQuery("spark"), 2.5)
    # fieldName wraps in FieldQuery unless it names the default field
    q = parse_xml_query('<TermQuery fieldName="title">x</TermQuery>')
    assert q == FieldQuery("title", TermQuery("x"))
    q = parse_xml_query(
        '<TermQuery fieldName="text">x</TermQuery>', default_field="text"
    )
    assert q == TermQuery("x")


def test_terms_query_analyzes():
    q = parse_xml_query(
        '<TermsQuery minimumNumberShouldMatch="2">Spark AND the Index</TermsQuery>'
    )
    assert isinstance(q, BooleanQuery)
    # "the"/"and" are stopwords; analysis lowercases
    assert [c.query.term for c in q.clauses] == ["spark", "index"]
    assert all(c.occur == Occur.SHOULD for c in q.clauses)
    assert q.minimum_number_should_match == 2


def test_boolean_query_clauses():
    q = parse_xml_query(
        """
        <BooleanQuery fieldName="contents">
          <Clause occurs="must"><TermQuery>merge</TermQuery></Clause>
          <Clause occurs="mustNot"><TermQuery>probe</TermQuery></Clause>
          <Clause occurs="filter"><TermQuery>sort</TermQuery></Clause>
          <Clause><TermQuery>spill</TermQuery></Clause>
        </BooleanQuery>
        """
    )
    assert isinstance(q, BooleanQuery)
    occs = [c.occur for c in q.clauses]
    assert occs == [Occur.MUST, Occur.MUST_NOT, Occur.FILTER, Occur.SHOULD]
    # fieldName inheritance: the Clause terms inherit contents
    assert q.clauses[0].query == FieldQuery("contents", TermQuery("merge"))
    with pytest.raises(ValueError, match="occurs"):
        parse_xml_query(
            '<BooleanQuery><Clause occurs="nope">'
            "<TermQuery>x</TermQuery></Clause></BooleanQuery>"
        )


def test_range_constant_score_dismax_matchall():
    q = parse_xml_query(
        '<RangeQuery lowerTerm="b" upperTerm="f" includeUpper="false"/>'
    )
    assert q == TermRangeQuery("b", "f", True, False)
    q = parse_xml_query(
        '<PointRangeQuery fieldName="n_chars" lowerTerm="10" upperTerm="30"/>'
    )
    assert q == FunctionRangeQuery("n_chars", 10.0, 30.0, True, True)
    q = parse_xml_query(
        '<ConstantScoreQuery><TermQuery>x</TermQuery></ConstantScoreQuery>'
    )
    assert q == ConstantScoreQuery(TermQuery("x"))
    q = parse_xml_query(
        '<DisjunctionMaxQuery tieBreaker="0.3">'
        "<TermQuery>a</TermQuery><TermQuery>b</TermQuery>"
        "</DisjunctionMaxQuery>"
    )
    assert q == DisjunctionMaxQuery(
        (TermQuery("a"), TermQuery("b")), tie_breaker=0.3
    )
    assert parse_xml_query("<MatchAllDocsQuery/>") == MatchAllDocsQuery()


def test_user_query_routes_classic():
    q = parse_xml_query("<UserQuery>merge AND spill</UserQuery>")
    assert isinstance(q, BooleanQuery)
    assert {c.occur for c in q.clauses} == {Occur.MUST}


def test_span_elements():
    q = parse_xml_query(
        """
        <SpanNear slop="2" inOrder="true">
          <SpanTerm>spark</SpanTerm>
          <SpanOr><SpanTerm>index</SpanTerm><SpanTerm>query</SpanTerm></SpanOr>
        </SpanNear>
        """
    )
    assert q == SpanNearQuery(
        (
            SpanTermQuery("spark"),
            SpanOrQuery((SpanTermQuery("index"), SpanTermQuery("query"))),
        ),
        slop=2,
        in_order=True,
    )
    # slop is REQUIRED (SpanNearBuilder.java:42), inOrder defaults false
    with pytest.raises(ValueError, match="slop"):
        parse_xml_query(
            "<SpanNear><SpanTerm>a</SpanTerm><SpanTerm>b</SpanTerm></SpanNear>"
        )
    q = parse_xml_query(
        '<SpanFirst end="3"><SpanTerm>spark</SpanTerm></SpanFirst>'
    )
    assert q == SpanFirstQuery(SpanTermQuery("spark"), 3)
    q = parse_xml_query(
        "<SpanNot><Include><SpanTerm>a</SpanTerm></Include>"
        "<Exclude><SpanTerm>b</SpanTerm></Exclude></SpanNot>"
    )
    assert q == SpanNotQuery(SpanTermQuery("a"), SpanTermQuery("b"))
    # SpanOrTerms analyzes its text
    q = parse_xml_query("<SpanOrTerms>Spark the Index</SpanOrTerms>")
    assert q == SpanOrQuery((SpanTermQuery("spark"), SpanTermQuery("index")))
    # nested span boost is rejected; top-level boost wraps
    with pytest.raises(ValueError, match="nested span"):
        parse_xml_query(
            '<SpanOr><SpanTerm boost="2">a</SpanTerm></SpanOr>'
        )
    q = parse_xml_query('<SpanTerm boost="2">a</SpanTerm>')
    assert q == BoostQuery(SpanTermQuery("a"), 2.0)


def test_malformed_and_unknown():
    with pytest.raises(ValueError, match="malformed"):
        parse_xml_query("<TermQuery>unclosed")
    with pytest.raises(ValueError, match="unknown query element"):
        parse_xml_query("<FuzzyLikeThisQuery>x</FuzzyLikeThisQuery>")


@pytest.fixture(scope="module")
def corpus(spark):
    from lucene_solr_spark.index import build_tables
    from lucene_solr_spark.queries.searcher import IndexSearcher

    docs = spark.createDataFrame(
        [
            (0, "spark index merge", 10),
            (1, "spark spark query", 20),
            (2, "hash join probe", 30),
            (3, "merge sort spill", 40),
        ],
        ["doc_id", "text", "n_chars"],
    )
    t = build_tables(docs, id_col="doc_id", text_col="text")
    s = IndexSearcher(t, scoring="exact")
    return s, docs


def test_xmlparser_dispatch_execution(spark, corpus):
    """{!xmlparser} end-to-end equals the classic-parser equivalent."""
    s, docs = corpus
    d = SolrQueryDispatcher(s, docs)
    xml = (
        "{!xmlparser}<BooleanQuery>"
        "<Clause occurs='must'><TermQuery>spark</TermQuery></Clause>"
        "<Clause occurs='mustNot'><TermQuery>query</TermQuery></Clause>"
        "</BooleanQuery>"
    )
    got = {r["doc_id"]: r["score"] for r in d.docs(xml).collect()}
    want = {
        r["doc_id"]: r["score"]
        for r in d.docs("+spark -query").collect()
    }
    assert got == want and set(got) == {0}
