"""CommonTermsQuery (lucene/queries/CommonTermsQuery.java)."""

from __future__ import annotations

import pytest

from lucene_solr_spark.queries.commonterms import (
    _min_nr_should_match,
    build_common_terms_query,
)
from lucene_solr_spark.queries.query import (
    BooleanQuery,
    BoostQuery,
    MatchNoDocsQuery,
    Occur,
    TermQuery,
)


DFS = {"rare": 5, "mid": 40, "common": 900, "verycommon": 950}
MAXDOC = 1000


def _groups(q):
    assert isinstance(q, BooleanQuery)
    out = {}
    for c in q.clauses:
        inner = c.query
        assert isinstance(inner, BoostQuery)
        terms = tuple(
            cc.query.term for cc in inner.query.clauses
        )
        out[c.occur] = (terms, inner.query.minimum_number_should_match,
                        tuple(cc.occur for cc in inner.query.clauses))
    return out

def test_df_partition_fractional_threshold():
    q = build_common_terms_query(
        ["rare", "common", "mid"], DFS, MAXDOC, max_term_frequency=0.1
    )
    g = _groups(q)
    # low group wraps MUST; high group wraps SHOULD (buildQuery:206-211)
    assert g[Occur.MUST][0] == ("rare", "mid")
    assert g[Occur.SHOULD][0] == ("common",)


def test_absolute_threshold_and_unseen_term():
    q = build_common_terms_query(
        ["rare", "common", "ghost"], DFS, MAXDOC, max_term_frequency=100.0
    )
    g = _groups(q)
    # df > 100 absolute -> common high; ghost (df 0) stays low
    assert g[Occur.MUST][0] == ("rare", "ghost")
    assert g[Occur.SHOULD][0] == ("common",)


def test_all_common_rewrites_to_conjunction():
    q = build_common_terms_query(
        ["common", "verycommon"], DFS, MAXDOC, max_term_frequency=0.1
    )
    g = _groups(q)
    # single SHOULD top clause; INNER occurs rewritten to MUST
    assert set(g) == {Occur.SHOULD}
    assert g[Occur.SHOULD][2] == (Occur.MUST, Occur.MUST)


def test_min_should_match_ratio():
    # :142-147 — fraction rounds over optional count
    assert _min_nr_should_match(0.5, 3) == 2
    assert _min_nr_should_match(2.0, 3) == 2
    assert _min_nr_should_match(0.0, 3) == 0
    q = build_common_terms_query(
        ["rare", "mid", "ghost"], DFS, MAXDOC,
        max_term_frequency=0.1, low_freq_min_should_match=0.5,
    )
    g = _groups(q)
    assert g[Occur.MUST][1] == 2  # round(0.5 * 3)


def test_empty_and_must_not_rejected():
    assert isinstance(
        build_common_terms_query([], {}, MAXDOC), MatchNoDocsQuery
    )
    with pytest.raises(ValueError):
        build_common_terms_query(
            ["a"], {}, MAXDOC, low_freq_occur=Occur.MUST_NOT
        )


def test_execution_req_opt_scoring(spark):
    from lucene_solr_spark.index.builder import build_tables
    from lucene_solr_spark.queries.searcher import IndexSearcher

    docs = spark.createDataFrame(
        [
            (0, "rare common pad"),
            (1, "rare pad pad"),
            (2, "common pad pad"),
            (3, "common pad pad"),
            (4, "common pad pad"),
        ],
        ["doc_id", "text"],
    )
    t = build_tables(docs, id_col="doc_id", text_col="text")
    s = IndexSearcher(t, scoring="exact")
    stats = s.term_statistics(["rare", "common"])
    q = build_common_terms_query(
        ["rare", "common"],
        {k: v[0] for k, v in stats.items()},
        s.stats.doc_count,
        max_term_frequency=0.5,
    )
    rows = {r["doc_id"]: r["score"] for r in s.docs(q).collect()}
    # threshold ceil(0.5*5)=3: rare (df 2) stays low/required -> docs
    # 0,1; common (df 4) goes high/optional; docs 2-4 excluded
    assert set(rows) == {0, 1}
    # doc 0 also matches optional 'common' -> higher score than doc 1
    assert rows[0] > rows[1]
