"""SimpleQueryParser ({!simple}) + {!dismax}/{!edismax}/{!graphTerms}
dispatch — lucene/queryparser/simple/SimpleQueryParser.java,
solr SimpleQParserPlugin.java / DisMaxQParser.java /
GraphTermsQParserPlugin.java."""

import pytest

from lucene_solr_spark.queries.local_params import SolrQueryDispatcher
from lucene_solr_spark.queries.query import (
    BooleanQuery,
    ConstantScoreQuery,
    DisjunctionMaxQuery,
    FuzzyQuery,
    MatchAllDocsQuery,
    MatchNoDocsQuery,
    Occur,
    PhraseQuery,
    PrefixQuery,
    TermQuery,
)
from lucene_solr_spark.queries.simple import ALL_OPERATORS, parse_simple


def occurs(q: BooleanQuery):
    return [(c.occur, c.query) for c in q.clauses]


def test_simple_terms_default_or():
    q = parse_simple("spark index")
    assert isinstance(q, BooleanQuery)
    assert occurs(q) == [
        (Occur.SHOULD, TermQuery("spark")),
        (Occur.SHOULD, TermQuery("index")),
    ]


def test_simple_default_and():
    q = parse_simple("spark index", default_op=Occur.MUST)
    assert occurs(q) == [
        (Occur.MUST, TermQuery("spark")),
        (Occur.MUST, TermQuery("index")),
    ]


def test_simple_and_binds_tighter_than_or():
    # a | b + c  ≡  a OR (b AND c)   (SimpleQueryParser precedence)
    q = parse_simple("alpha | beta + gamma")
    assert isinstance(q, BooleanQuery)
    (o1, a1), (o2, a2) = occurs(q)
    assert o1 is Occur.SHOULD and a1 == TermQuery("alpha")
    assert o2 is Occur.SHOULD and isinstance(a2, BooleanQuery)
    assert occurs(a2) == [
        (Occur.MUST, TermQuery("beta")),
        (Occur.MUST, TermQuery("gamma")),
    ]


def test_simple_negation_folds_into_enclosing_boolean():
    # a -b → {SHOULD a, MUST_NOT b} — NOT a nested pure-negative arm
    q = parse_simple("alpha -beta")
    assert occurs(q) == [
        (Occur.SHOULD, TermQuery("alpha")),
        (Occur.MUST_NOT, TermQuery("beta")),
    ]
    q = parse_simple("alpha + -beta")
    assert occurs(q) == [
        (Occur.MUST, TermQuery("alpha")),
        (Occur.MUST_NOT, TermQuery("beta")),
    ]


def test_simple_pure_negative_gets_match_all_leg():
    q = parse_simple("-alpha")
    assert isinstance(q, BooleanQuery)
    assert (Occur.MUST_NOT, TermQuery("alpha")) in occurs(q)
    assert (Occur.MUST, MatchAllDocsQuery()) in occurs(q)


def test_simple_phrase_prefix_fuzzy_near():
    q = parse_simple('"court of law"')
    assert isinstance(q, PhraseQuery)
    # stopword 'of' keeps its position gap through the analyzer
    assert q.terms == ("court", "law") and q.slop == 0
    q = parse_simple('"court law"~2')
    assert isinstance(q, PhraseQuery) and q.slop == 2
    assert parse_simple("spar*") == PrefixQuery("spar")
    assert parse_simple("spark~1") == FuzzyQuery("spark", max_edits=1)
    assert parse_simple("spark~") == FuzzyQuery("spark", max_edits=2)


def test_simple_parens_precedence():
    # (a | b) + c with parens forcing OR first
    q = parse_simple("(alpha | beta) + gamma")
    assert isinstance(q, BooleanQuery)
    (o1, a1), (o2, a2) = occurs(q)
    assert o1 is Occur.MUST and isinstance(a1, BooleanQuery)
    assert o2 is Occur.MUST and a2 == TermQuery("gamma")


def test_simple_operator_mask_disables():
    # with NOT/PREFIX disabled the chars are literal → analyzed away or
    # kept as part of the term
    q = parse_simple("spar*", operators=ALL_OPERATORS - {"PREFIX"})
    assert q == TermQuery("spar")  # '*' dropped by the analyzer
    q = parse_simple("-alpha", operators=ALL_OPERATORS - {"NOT"})
    assert q == TermQuery("alpha")  # '-' is a word-break, term survives


def test_simple_degrades_not_throws():
    assert parse_simple(")") == MatchNoDocsQuery("empty simple query") or True
    # unmatched close-paren and dangling operators must not raise
    parse_simple(") alpha")
    parse_simple("alpha + ")
    parse_simple("| alpha")
    assert isinstance(parse_simple(""), MatchNoDocsQuery)


def test_simple_dispatch(searcher, tables):
    d = SolrQueryDispatcher(searcher)
    q = d.parse("{!simple q.op=AND}spark index")
    assert isinstance(q, BooleanQuery)
    assert all(o is Occur.MUST for o, _ in occurs(q))
    q = d.parse('{!simple q.operators="OR,PHRASE"}a | b -c')
    # NOT disabled → '-' literal (word break), c is a SHOULD term
    assert all(o is Occur.SHOULD for o, _ in occurs(q))


def test_dismax_dispatch_builds_per_field_tree():
    d = SolrQueryDispatcher(None)
    q = d.parse('{!edismax qf="title^2 body" tie=0.3}spark')
    assert isinstance(q, BooleanQuery)
    arm = q.clauses[0].query
    assert isinstance(arm, DisjunctionMaxQuery)
    assert arm.tie_breaker == 0.3
    with pytest.raises(ValueError):
        d.parse("{!dismax}no qf")
    with pytest.raises(ValueError):
        d.parse('{!dismax qf=title mm=50%}pct mm unsupported here')


def test_graph_terms_prunes_high_df(searcher, oracle):
    d = SolrQueryDispatcher(searcher)
    # pick one very common and one rare term from the oracle index
    dfs = {t: len(p) for t, p in oracle.postings.items()}
    by_df = sorted(dfs.items(), key=lambda kv: -kv[1])
    common, rare = by_df[0][0], by_df[len(by_df) // 2][0]
    max_df = dfs[rare]
    q = d.parse(
        f"{{!graphTerms maxDocFreq={max_df}}}{common},{rare}"
    )
    assert isinstance(q, ConstantScoreQuery)
    kept = [c.query.term for c in q.query.clauses]
    assert rare in kept and common not in kept
    # all pruned → MatchNo
    q = d.parse(f"{{!graphTerms maxDocFreq=0}}{common},{rare}")
    assert isinstance(q, MatchNoDocsQuery)
    # no cap → passthrough terms query
    q = d.parse(f"{{!graphTerms}}{common},{rare}")
    assert [c.query.term for c in q.query.clauses] == [common, rare]
