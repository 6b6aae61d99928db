"""Boolean query semantics vs the oracle + rewrite edge cases
(mirrors TestBooleanQuery.java / TestBoolean2.queriesTest /
TestBooleanRewrites.java)."""

import pytest

from conftest import assert_rank_identical
from lucene_solr_spark.queries import (
    BooleanQuery,
    BoostQuery,
    ConstantScoreQuery,
    MatchAllDocsQuery,
    MatchNoDocsQuery,
    Occur,
    TermQuery,
    parse_query,
    rewrite,
)
from lucene_solr_spark.queries.query import boolean


# ------------------------------------------------------------- rewrites
def test_rewrite_empty_boolean():
    assert isinstance(rewrite(BooleanQuery(())), MatchNoDocsQuery)


def test_rewrite_single_should_unwraps():
    q = boolean((Occur.SHOULD, TermQuery("x")))
    assert rewrite(q) == TermQuery("x")


def test_rewrite_single_must_unwraps():
    q = boolean((Occur.MUST, TermQuery("x")))
    assert rewrite(q) == TermQuery("x")


def test_rewrite_pure_negative():
    q = boolean((Occur.MUST_NOT, TermQuery("x")))
    assert isinstance(rewrite(q), MatchNoDocsQuery)


def test_rewrite_must_and_must_not_same():
    q = boolean((Occur.MUST, TermQuery("x")), (Occur.MUST_NOT, TermQuery("x")))
    assert isinstance(rewrite(q), MatchNoDocsQuery)


def test_rewrite_must_not_matchall():
    q = boolean((Occur.MUST, TermQuery("x")), (Occur.MUST_NOT, MatchAllDocsQuery()))
    assert isinstance(rewrite(q), MatchNoDocsQuery)


def test_rewrite_filter_duplicate_of_must_removed():
    q = boolean(
        (Occur.MUST, TermQuery("x")),
        (Occur.FILTER, TermQuery("x")),
        (Occur.FILTER, TermQuery("y")),
    )
    r = rewrite(q)
    assert isinstance(r, BooleanQuery)
    assert (Occur.FILTER, TermQuery("x")) not in [
        (c.occur, c.query) for c in r.clauses
    ]


def test_rewrite_dedup_must_not():
    q = boolean(
        (Occur.MUST, TermQuery("x")),
        (Occur.MUST_NOT, TermQuery("y")),
        (Occur.MUST_NOT, TermQuery("y")),
    )
    r = rewrite(q)
    assert len(r.clauses) == 2


def test_rewrite_boost_fold():
    q = BoostQuery(BoostQuery(TermQuery("x"), 2.0), 3.0)
    r = rewrite(q)
    assert r == BoostQuery(TermQuery("x"), 6.0)
    assert rewrite(BoostQuery(TermQuery("x"), 1.0)) == TermQuery("x")


def test_rewrite_msm_exceeds_shoulds():
    q = boolean(
        (Occur.SHOULD, TermQuery("x")),
        (Occur.SHOULD, TermQuery("y")),
        min_should_match=3,
    )
    assert isinstance(rewrite(q), MatchNoDocsQuery)


def test_max_clause_count():
    with pytest.raises(ValueError):
        boolean(*[(Occur.SHOULD, TermQuery(f"t{i}")) for i in range(1025)])


# ------------------------------------------------------------- parser
def test_parser_shapes():
    q = parse_query("merge AND window")
    assert isinstance(q, BooleanQuery)
    assert {c.occur for c in q.clauses} == {Occur.MUST}
    q = parse_query("parse OR tokenize")
    assert {c.occur for c in q.clauses} == {Occur.SHOULD}
    q = parse_query("+parse -legacy")
    assert [c.occur for c in q.clauses] == [Occur.MUST, Occur.MUST_NOT]
    q = parse_query("index NOT deprecated")
    assert [c.occur for c in q.clauses] == [Occur.SHOULD, Occur.MUST_NOT]
    q = parse_query('"import numpy"')
    assert q.terms == ("import", "numpy")
    q = parse_query("merge^2.5")
    assert q == BoostQuery(TermQuery("merge"), 2.5)
    q = parse_query("(load OR store) AND buffer")
    assert isinstance(q, BooleanQuery) and len(q.clauses) == 2


def test_parser_stopword_phrase_gap():
    q = parse_query('"the head of a list"')
    assert q.terms == ("head", "list")
    assert q.positions == (1, 4)


# ------------------------------------------------------ golden vs oracle
def test_term_topk(searcher, oracle):
    assert_rank_identical(
        searcher.search("spark", 10), oracle.top_k(oracle.term_scores("spark"), 10)
    )


def test_term_zero_hit(searcher, oracle):
    assert searcher.search("zqxwv", 10).count() == 0


def test_and(searcher, oracle):
    assert_rank_identical(
        searcher.search("merge AND window", 10),
        oracle.top_k(oracle.boolean_and(["merge", "window"]), 10),
    )


def test_and_three_terms(searcher, oracle):
    assert_rank_identical(
        searcher.search("key AND agg AND row", 10),
        oracle.top_k(oracle.boolean_and(["key", "agg", "row"]), 10),
    )


def test_or(searcher, oracle):
    assert_rank_identical(
        searcher.search("merge OR window", 10),
        oracle.top_k(oracle.boolean_or(["merge", "window"]), 10),
    )


def test_not(searcher, oracle):
    want = {
        d: s
        for d, s in oracle.term_scores("table").items()
        if d not in oracle.term_docs("join")
    }
    assert_rank_identical(searcher.search("table NOT join", 10), oracle.top_k(want, 10))


def test_min_should_match(searcher, oracle):
    q = boolean(
        (Occur.SHOULD, TermQuery("merge")),
        (Occur.SHOULD, TermQuery("window")),
        (Occur.SHOULD, TermQuery("vector")),
        min_should_match=2,
    )
    assert_rank_identical(
        searcher.search(q, 10),
        oracle.top_k(oracle.boolean_or(["merge", "window", "vector"], msm=2), 10),
    )


def test_filter_does_not_score(searcher, oracle):
    q = boolean((Occur.MUST, TermQuery("merge")), (Occur.FILTER, TermQuery("window")))
    docs_w = set(oracle.term_docs("window"))
    want = {
        d: s for d, s in oracle.term_scores("merge").items() if d in docs_w
    }
    assert_rank_identical(searcher.search(q, 10), oracle.top_k(want, 10))


def test_boost_scales_scores(searcher, oracle):
    got = {r["doc_id"]: r["score"] for r in searcher.search("spark^2", 10).collect()}
    want = dict(oracle.top_k(oracle.term_scores("spark", boost=2.0), 10))
    assert got.keys() == want.keys()
    for d in got:
        assert abs(got[d] - want[d]) < 1e-9


def test_constant_score(searcher, oracle):
    q = ConstantScoreQuery(TermQuery("spark"), 1.0)
    rows = searcher.docs(q).collect()
    assert {r["doc_id"] for r in rows} == set(oracle.term_docs("spark"))
    assert all(r["score"] == 1.0 for r in rows)


def test_count_matches_oracle(searcher, oracle):
    assert searcher.count("spark") == len(oracle.term_docs("spark"))
    and_docs = set(oracle.term_docs("merge")) & set(oracle.term_docs("window"))
    assert searcher.count("merge AND window") == len(and_docs)
