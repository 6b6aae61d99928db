"""Core analyzer family (analysis/core/*Analyzer.java, cjk/CJKAnalyzer)."""

import pandas as pd

from lucene_solr_spark.analysis.more_analyzers import (
    cjk_analyze_batch_flat,
    keyword_analyze_batch_flat,
    simple_analyze_batch_flat,
    stop_analyze_batch_flat,
    whitespace_analyze_batch_flat,
)


def _per_doc(flat, n):
    doc_idx, terms, pos = flat
    out = [[] for _ in range(n)]
    for d, t, p in zip(doc_idx, terms, pos):
        out[int(d)].append((t, int(p)))
    return out


def test_whitespace_no_lowercase():
    got = _per_doc(
        whitespace_analyze_batch_flat(pd.Series(["Foo BAR  baz", ""])), 2
    )
    assert got[0] == [("Foo", 0), ("BAR", 1), ("baz", 2)]
    assert got[1] == []


def test_simple_letter_runs_lowercased():
    got = _per_doc(simple_analyze_batch_flat(pd.Series(["Ab3Cd e-f"])), 1)
    # digits and punctuation split letter runs (LetterTokenizer)
    assert got[0] == [("ab", 0), ("cd", 1), ("e", 2), ("f", 3)]


def test_keyword_single_token():
    got = _per_doc(keyword_analyze_batch_flat(pd.Series(["Hello World!"])), 1)
    assert got[0] == [("Hello World!", 0)]


def test_stop_gaps_preserved():
    got = _per_doc(stop_analyze_batch_flat(pd.Series(["the quick and the dead"])), 1)
    # 'the'(0) 'and'(2) 'the'(3) dropped; survivors keep original positions
    assert got[0] == [("quick", 1), ("dead", 4)]


def test_cjk_bigrams():
    got = _per_doc(cjk_analyze_batch_flat(pd.Series(["一二三"])), 1)
    assert got[0] == [("一二", 0), ("二三", 1)]
    # lone CJK char → unigram; Latin words lowercase around it
    got = _per_doc(cjk_analyze_batch_flat(pd.Series(["Spark 一 engine"])), 1)
    assert got[0] == [("spark", 0), ("一", 1), ("engine", 2)]
    # mixed run + following word: next position = p + L - 1
    got = _per_doc(cjk_analyze_batch_flat(pd.Series(["検索エンジン x"])), 1)
    terms = [t for t, _ in got[0]]
    assert terms == ["検索", "索エ", "エン", "ンジ", "ジン", "x"]
    assert got[0][-1][1] == got[0][-2][1] + 1


def test_named_analyzer_through_build_tables(spark):
    from lucene_solr_spark.index import build_tables

    docs = spark.createDataFrame(
        [(0, "Foo BAR"), (1, "foo bar")], ["doc_id", "text"]
    )
    t = build_tables(docs, id_col="doc_id", text_col="text", analyzer="whitespace")
    terms = {r["term"] for r in t.postings.collect()}
    # case preserved → Foo and foo are distinct terms
    assert terms == {"Foo", "BAR", "foo", "bar"}
    t2 = build_tables(docs, id_col="doc_id", text_col="text", analyzer="keyword")
    terms2 = {r["term"] for r in t2.postings.collect()}
    assert terms2 == {"Foo BAR", "foo bar"}
