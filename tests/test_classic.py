"""ClassicSimilarity (TF-IDF) scoring modes.

Float32 golden check: an independent numpy reimplementation of
TFIDFSimilarity.java:553-569 + ClassicSimilarity.java:99-140 computed
from raw python tokenization (no engine code in the oracle path).
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from lucene_solr_spark.analysis.stopwords import ENGLISH_STOP_WORDS
from lucene_solr_spark.queries.query import BooleanClause, BooleanQuery, Occur, TermQuery
from lucene_solr_spark.scoring.bm25 import byte315_to_float, encode_norm

ROWS = [
    (0, "spark window merge spark spark"),
    (1, "window spark batch"),
    (2, "spark stream window window stream batch merge"),
    (3, "merge stream batch"),
    (4, "spark a window"),
]


def _tokens(text: str) -> list[str]:
    return [t for t in text.split() if t not in ENGLISH_STOP_WORDS]


def classic_score_f32(term: str, doc: int) -> float:
    """Independent float32 TF-IDF: raw = f32(sqrt(tf))·f32(idf);
    score = f32(raw · NORM_TABLE[byte315(1/sqrt(dl))])."""
    docs = {d: _tokens(t) for d, t in ROWS}
    tf = docs[doc].count(term)
    if tf == 0:
        return 0.0
    df = sum(1 for toks in docs.values() if term in toks)
    n = len(docs)
    idf = np.float32(math.log((n + 1) / float(df + 1)) + 1.0)
    tf32 = np.float32(math.sqrt(tf))
    raw = np.float32(tf32 * idf)
    norm = byte315_to_float(int(encode_norm(len(docs[doc]))))
    return float(np.float32(raw * np.float32(norm)))


@pytest.fixture(scope="module")
def classic_searcher(spark):
    from lucene_solr_spark.index import build_tables
    from lucene_solr_spark.queries import IndexSearcher

    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    return IndexSearcher(build_tables(df, id_col="doc_id", text_col="text"), scoring="classic")


def test_classic_term_scores_bit_identical(classic_searcher):
    got = {r["doc_id"]: r["score"] for r in classic_searcher.docs(TermQuery("spark")).collect()}
    assert set(got) == {0, 1, 2, 4}
    for d, s in got.items():
        assert s == classic_score_f32("spark", d), (d, s)


def test_classic_boolean_sum(classic_searcher):
    q = BooleanQuery(
        (
            BooleanClause(Occur.MUST, TermQuery("spark")),
            BooleanClause(Occur.MUST, TermQuery("merge")),
        )
    )
    got = {r["doc_id"]: r["score"] for r in classic_searcher.docs(q).collect()}
    assert set(got) == {0, 2}
    for d, s in got.items():
        want = float(
            np.float32(
                float(classic_score_f32("spark", d)) + float(classic_score_f32("merge", d))
            )
        )
        assert s == pytest.approx(want, abs=1e-7)


def test_classic_ranking_favors_rare_terms(classic_searcher):
    # 'batch' (df 3) vs 'spark' (df 4): same-tf docs rank by idf
    top = classic_searcher.search(TermQuery("spark"), k=1).collect()[0]
    assert top["doc_id"] == 0  # tf=3 dominates


def test_invalid_mode_rejected(classic_searcher):
    from lucene_solr_spark.queries import IndexSearcher

    with pytest.raises(ValueError):
        IndexSearcher(classic_searcher.tables, scoring="tfidf")


# --------------------------------------------------- precedence parser
def test_precedence_and_binds_tighter():
    """TestPrecedenceQueryParser.testSimple goldens: AND groups become
    one MUST boolean, OR separates SHOULD clauses."""
    from lucene_solr_spark.queries.parser import parse_precedence_query
    from lucene_solr_spark.queries.query import (
        BooleanQuery,
        Occur,
        TermQuery,
    )

    # 'a AND b' → '+a +b'
    q = parse_precedence_query("alpha AND beta")
    assert isinstance(q, BooleanQuery)
    assert [(c.occur, c.query) for c in q.clauses] == [
        (Occur.MUST, TermQuery("alpha")),
        (Occur.MUST, TermQuery("beta")),
    ]
    # 'c OR (a AND b)' → 'c (+a +b)'
    q = parse_precedence_query("gamma OR (alpha AND beta)")
    assert [c.occur for c in q.clauses] == [Occur.SHOULD, Occur.SHOULD]
    inner = q.clauses[1].query
    assert isinstance(inner, BooleanQuery)
    assert all(c.occur == Occur.MUST for c in inner.clauses)
    # 'a AND b OR c AND d' → '(+a +b) (+c +d)'  (classic: '+a +b +c +d')
    q = parse_precedence_query("alpha AND beta OR gamma AND delta")
    assert len(q.clauses) == 2
    assert all(c.occur == Occur.SHOULD for c in q.clauses)
    for cl in q.clauses:
        assert all(c.occur == Occur.MUST for c in cl.query.clauses)
    # 'a AND NOT b' → '+a -b'
    q = parse_precedence_query("alpha AND NOT beta")
    assert [c.occur for c in q.clauses] == [Occur.MUST, Occur.MUST_NOT]
    # '((a OR b) AND NOT c) OR d' → '(+(a b) -c) d'
    q = parse_precedence_query("((alpha OR beta) AND NOT gamma) OR delta")
    assert [c.occur for c in q.clauses] == [Occur.SHOULD, Occur.SHOULD]
    grp = q.clauses[0].query
    assert [c.occur for c in grp.clauses] == [Occur.MUST, Occur.MUST_NOT]
    assert isinstance(grp.clauses[0].query, BooleanQuery)
    # '+term -term term' unchanged (no conjunctions)
    q = parse_precedence_query("+alpha -beta gamma")
    assert [c.occur for c in q.clauses] == [
        Occur.MUST,
        Occur.MUST_NOT,
        Occur.SHOULD,
    ]


def test_flexible_alias_matches_classic():
    from lucene_solr_spark.queries.parser import (
        parse_flexible_query,
        parse_query,
    )

    for text in (
        "alpha AND beta OR gamma",
        '+alpha -beta "gamma delta"~2',
        "al?ha bet* [alpha TO gamma]",
    ):
        assert parse_flexible_query(text) == parse_query(text)
