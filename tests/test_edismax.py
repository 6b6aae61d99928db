"""edismax parser: qf boosts, pf phrase clause, modifiers, mm.

Ref: solr ExtendedDismaxQParserPlugin.java / DisMaxQParser.java.
"""

import pytest

from lucene_solr_spark.queries.edismax import parse_edismax, parse_field_boosts
from lucene_solr_spark.queries.query import (
    BooleanQuery,
    BoostQuery,
    DisjunctionMaxQuery,
    FieldQuery,
    MatchNoDocsQuery,
    Occur,
    PhraseQuery,
    TermQuery,
)


def test_parse_field_boosts():
    assert parse_field_boosts("text^2 title source^0.5") == {
        "text": 2.0,
        "title": 1.0,
        "source": 0.5,
    }
    with pytest.raises(ValueError):
        parse_field_boosts("bad^^2")


def test_term_becomes_cross_field_dismax():
    q = parse_edismax("vector", qf="text^2 title", tie=0.3)
    assert isinstance(q, BooleanQuery) and len(q.clauses) == 1
    arm = q.clauses[0].query
    assert isinstance(arm, DisjunctionMaxQuery)
    assert arm.tie_breaker == 0.3
    boosted, plain = arm.disjuncts
    assert isinstance(boosted, BoostQuery) and boosted.boost == 2.0
    assert boosted.query == FieldQuery("text", TermQuery("vector"))
    assert plain == FieldQuery("title", TermQuery("vector"))


def test_single_field_skips_dismax_wrapper():
    q = parse_edismax("vector", qf="text")
    assert q.clauses[0].query == FieldQuery("text", TermQuery("vector"))


def test_modifiers_and_mm():
    q = parse_edismax("+spark -legacy vector engine", qf="text", mm=2)
    occ = [c.occur for c in q.clauses]
    assert occ == [Occur.MUST, Occur.MUST_NOT, Occur.SHOULD, Occur.SHOULD]
    assert q.minimum_number_should_match == 2


def test_mm_capped_at_should_count():
    q = parse_edismax("+spark vector", qf="text", mm=5)
    assert q.minimum_number_should_match == 1


def test_quoted_phrase_chunk():
    q = parse_edismax('"query engine"', qf="text")
    sub = q.clauses[0].query
    assert sub == FieldQuery(
        "text", PhraseQuery(("query", "engine"), (0, 1), 0)
    )


def test_stopword_gap_inside_phrase_chunk():
    # 'of' is a stopword: positions keep the gap
    q = parse_edismax('"head of list"', qf="text")
    ph = q.clauses[0].query.query
    assert ph.terms == ("head", "list")
    assert ph.positions == (0, 2)


def test_pf_adds_whole_query_phrase():
    q = parse_edismax("query engine", qf="text source", pf="text^2")
    assert len(q.clauses) == 3
    pf_clause = q.clauses[-1]
    assert pf_clause.occur is Occur.SHOULD
    boosted = pf_clause.query
    assert isinstance(boosted, BoostQuery) and boosted.boost == 2.0
    assert boosted.query == FieldQuery(
        "text", PhraseQuery(("query", "engine"), (0, 1), 0)
    )


def test_all_stopwords_is_match_none():
    assert isinstance(
        parse_edismax("the of and", qf="text"), MatchNoDocsQuery
    )


# ---------------------------------------------------------------------------
# mm spec grammar (SolrPluginUtils.calculateMinShouldMatch)
# ---------------------------------------------------------------------------

def test_mm_absolute_and_clamp():
    from lucene_solr_spark.queries.edismax import calculate_min_should_match as c

    assert c(5, "0") == 0
    assert c(5, "2") == 2
    assert c(5, "9") == 5      # clamps to the clause count
    assert c(5, "-2") == 3
    assert c(5, "-12") == 0    # floor at zero


def test_mm_percentages_truncate_toward_zero():
    from lucene_solr_spark.queries.edismax import calculate_min_should_match as c

    assert c(3, "75%") == 2    # 2.25 -> 2
    assert c(5, "25%") == 1    # 1.25 -> 1
    assert c(5, "-25%") == 4   # 5 + int(-1.25) = 4
    assert c(4, "-25%") == 3   # 4 + int(-1.0)  = 3
    assert c(3, "-25%") == 3   # 3 + int(-0.75) = 3
    assert c(5, "100%") == 5
    assert c(5, "-100%") == 0


def test_mm_conditional_chain():
    from lucene_solr_spark.queries.edismax import calculate_min_should_match as c

    spec = "3<-25% 10<-3"
    assert c(1, spec) == 1     # not above any bound: all optional required
    assert c(3, spec) == 3
    assert c(4, spec) == 3     # above 3: -25% of 4
    assert c(10, spec) == 8    # 10 + int(-2.5) = 8, second bound not exceeded
    assert c(11, spec) == 8    # above 10: -3
    # whitespace around '<' is tolerated like the reference's pattern
    assert c(11, "3 < -25% 10 < -3") == 8


def test_mm_string_spec_reaches_boolean_query():
    from lucene_solr_spark.queries.edismax import parse_edismax

    q = parse_edismax("alpha beta gamma delta", qf="text", mm="50%")
    assert q.minimum_number_should_match == 2
