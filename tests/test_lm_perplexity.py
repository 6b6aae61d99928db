"""CCNet-style bigram stupid-backoff perplexity (corpus_quality.py)."""

from __future__ import annotations

import math

import pytest

from lucene_solr_spark.functions.corpus_quality import lm_perplexity


def test_lm_perplexity_hand_computed(spark):
    # corpus: "a b a b" and "a c"; N=6 tokens
    # uni: a=3 b=2 c=1; bigrams: (a,b)=2 (b,a)=1 (a,c)=1
    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a c")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in lm_perplexity(df).collect()}
    # doc 1: tok a (backoff: ln(.4*3/6)), b|a ln(2/3), a|b ln(1/2), b|a ln(2/3)
    want1 = (
        math.log(0.4 * 3 / 6)
        + math.log(2 / 3)
        + math.log(1 / 2)
        + math.log(2 / 3)
    ) / 4
    assert out[1]["avg_logprob"] == pytest.approx(want1, rel=1e-12)
    assert out[1]["n_scored"] == 4
    assert out[1]["ppl"] == pytest.approx(math.exp(-want1), rel=1e-12)
    # doc 2: a backoff ln(.4*3/6), c|a ln(1/3)
    want2 = (math.log(0.4 * 3 / 6) + math.log(1 / 3)) / 2
    assert out[2]["avg_logprob"] == pytest.approx(want2, rel=1e-12)


def test_lm_perplexity_repetitive_doc_scores_lower_ppl(spark):
    df = spark.createDataFrame(
        [(1, "x y x y x y x y x y"), (2, "x q y r x s y t x u")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["ppl"] for r in lm_perplexity(df).collect()}
    assert out[1] < out[2]  # the predictable doc is low-perplexity
