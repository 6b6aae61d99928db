"""Repetition metrics, contamination check, sequence packing —
hand-computed expectations.
"""

from __future__ import annotations

from lucene_solr_spark.functions.corpus_quality import (
    contamination_check,
    repetition_filter,
    repetition_metrics,
    sequence_packing,
)


def test_repetition_metrics_hand_computed(spark):
    # "a b a b a b": 6 tokens; 2-grams: "a b"×3, "b a"×2 (5 total)
    # top_2gram = 3*2/6 = 1.0; dup_2gram = (3+2)*2/6 = 1.6667
    # 3-grams: "a b a"×2, "b a b"×2 -> top = 2*3/6 = 1.0, dup = 4*3/6 = 2.0
    df = spark.createDataFrame([(1, "a b a b a b")], ["doc_id", "text"])
    r = repetition_metrics(df).collect()[0]
    assert r["total_tokens"] == 6
    assert r["top_2gram_frac"] == 1.0
    assert abs(r["dup_2gram_frac"] - 1.6667) < 1e-9
    assert r["top_3gram_frac"] == 1.0
    assert r["dup_3gram_frac"] == 2.0


def test_repetition_filter_keeps_diverse(spark):
    df = spark.createDataFrame(
        [(1, "spam spam spam spam spam spam"),
         (2, "one two three four five six seven eight nine ten")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r["keep"] for r in repetition_filter(df).collect()}
    assert out == {1: False, 2: True}


def test_repetition_short_doc_no_grams(spark):
    # 1 token: no 2-grams at all -> fractions 0, keep
    df = spark.createDataFrame([(1, "word")], ["doc_id", "text"])
    r = repetition_filter(df).collect()[0]
    assert r["top_2gram_frac"] == 0.0 and r["keep"] is True


def test_contamination_flags_shared_8gram(spark):
    bench = spark.createDataFrame(
        [(100, "q w e r t y u i o p")], ["doc_id", "text"]
    )
    corpus = spark.createDataFrame(
        [
            (1, "x q w e r t y u i o p z"),   # contains the bench 8-grams
            (2, "totally different words here with no overlap at all ok"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: (r["hit_grams"], r["contaminated"])
           for r in contamination_check(corpus, bench, n=8).collect()}
    # bench doc has 3 8-grams; doc 1 contains all 3
    assert out[1] == (3, True)
    assert out[2] == (0, False)


def test_sequence_packing_bins(spark):
    # capacity 10, same group, tokens 6,6,6: cumsum_before 0,6,12
    # -> bins 0,0,1 (doc 2 straddles the first cut, starts in bin 0)
    df = spark.createDataFrame(
        [(1, "g", "a b c d e f"), (2, "g", "a b c d e f"),
         (3, "g", "a b c d e f")],
        ["doc_id", "lang", "text"],
    )
    out = {r["doc_id"]: r["bin"]
           for r in sequence_packing(df, capacity=10).collect()}
    assert out == {1: 0, 2: 0, 3: 1}


def test_sequence_packing_oversized_doc_capped(spark):
    # capacity 4: a 10-token doc is capped to 4 so the next doc starts
    # bin 1, not bin 2
    df = spark.createDataFrame(
        [(1, "g", "a a a a a a a a a a"), (2, "g", "b b")],
        ["doc_id", "lang", "text"],
    )
    out = {r["doc_id"]: r["bin"]
           for r in sequence_packing(df, capacity=4).collect()}
    assert out == {1: 0, 2: 1}


def test_sequence_packing_groups_independent(spark):
    df = spark.createDataFrame(
        [(1, "en", "a b c"), (2, "fr", "a b c")],
        ["doc_id", "lang", "text"],
    )
    out = {r["doc_id"]: r["bin"]
           for r in sequence_packing(df, capacity=10).collect()}
    assert out == {1: 0, 2: 0}
