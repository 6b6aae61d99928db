"""Lucene classification module (lucene/classification/
SimpleNaiveBayesClassifier.java, KNearestNeighborClassifier.java)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.classification import (
    knn_classify,
    naive_bayes_classify,
)


@pytest.fixture(scope="module")
def tiny(spark):
    # 4 labeled docs, 2 classes
    corpus = [
        (0, "sports", ["ball", "goal", "goal", "team"]),
        (1, "sports", ["ball", "match"]),
        (2, "tech", ["code", "bug", "code"]),
        (3, "tech", ["code", "ball"]),
    ]
    rows = []
    for doc_id, _cl, toks in corpus:
        for t in set(toks):
            rows.append((doc_id, t, toks.count(t)))
    postings = spark.createDataFrame(rows, ["doc_id", "term", "tf"])
    classes = spark.createDataFrame(
        [(d, c) for d, c, _ in corpus], ["doc_id", "class"]
    )
    return postings, classes, corpus


def _nb_expected(corpus, input_tokens):
    """Driver-side replica of SimpleNaiveBayesClassifier.java:144-233."""
    labeled = [(d, c, t) for d, c, t in corpus]
    docs_with_class = len(labeled)
    # sumDocFreq / docCount over the text field
    sum_doc_freq = sum(len(set(t)) for _, _, t in labeled)
    avg_unique = sum_doc_freq / len(labeled)
    out = {}
    for cl in sorted({c for _, c, _ in labeled}):
        docs_c = sum(1 for _, c, _ in labeled if c == cl)
        log_prior = math.log(docs_c) - math.log(docs_with_class)
        den = avg_unique * docs_c + docs_with_class
        ll = 0.0
        for w in input_tokens:
            hits = sum(
                1 for _, c, t in labeled if c == cl and w in set(t)
            )
            ll += math.log((hits + 1) / den)
        out[cl] = log_prior + ll
    smax = max(out.values())
    loga = smax + math.log(
        sum(math.exp(v - smax) for v in out.values())
    )
    return {cl: (v, math.exp(v - loga)) for cl, v in out.items()}


def test_naive_bayes_matches_reference_math(spark, tiny):
    postings, classes, corpus = tiny
    toks = ["ball", "goal", "code"]
    inputs = spark.createDataFrame(
        [(0, t, 1) for t in toks], ["input_id", "term", "cnt"]
    )
    got = {
        r["class"]: (r["log_score"], r["probability"])
        for r in naive_bayes_classify(postings, classes, inputs).collect()
    }
    exp = _nb_expected(corpus, toks)
    assert set(got) == set(exp)
    for cl in exp:
        assert got[cl][0] == pytest.approx(exp[cl][0], abs=1e-12)
        assert got[cl][1] == pytest.approx(exp[cl][1], abs=1e-12)
    # probabilities are a distribution
    assert sum(p for _, p in got.values()) == pytest.approx(1.0)


def test_naive_bayes_token_multiplicity(spark, tiny):
    postings, classes, corpus = tiny
    # 'goal' twice must double its log-likelihood contribution
    inputs = spark.createDataFrame(
        [(0, "goal", 2)], ["input_id", "term", "cnt"]
    )
    got = {
        r["class"]: r["log_score"]
        for r in naive_bayes_classify(postings, classes, inputs).collect()
    }
    exp = _nb_expected(corpus, ["goal", "goal"])
    for cl in exp:
        assert got[cl] == pytest.approx(exp[cl][0], abs=1e-12)


def test_naive_bayes_ignores_unlabeled_docs(spark, tiny):
    postings, classes, corpus = tiny
    classes_with_null = classes.union(
        classes.sparkSession.createDataFrame(
            [(99, None)], "doc_id: bigint, class: string"
        )
    )
    inputs = postings.sparkSession.createDataFrame(
        [(0, "ball", 1)], ["input_id", "term", "cnt"]
    )
    a = naive_bayes_classify(postings, classes, inputs).collect()
    b = naive_bayes_classify(
        postings, classes_with_null, inputs
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_knn_class_vote_with_boost(spark):
    # KNearestNeighborClassifier.java:199-245: count * normBoost / k
    scored = spark.createDataFrame(
        [(0, 4.0), (1, 2.0), (2, 1.0)], ["doc_id", "score"]
    )
    classes = spark.createDataFrame(
        [(0, "a"), (1, "a"), (2, "b")], ["doc_id", "class"]
    )
    rows = {
        r["class"]: (r["count"], r["score"])
        for r in knn_classify(scored, classes, k=3).collect()
    }
    # maxScore 4: boosts a = 1 + 0.5 = 1.5, b = 0.25
    assert rows["a"][0] == 2 and rows["a"][1] == pytest.approx(1.5 / 3)
    assert rows["b"][0] == 1 and rows["b"][1] == pytest.approx(0.25 / 3)


def test_knn_underfilled_correction(spark):
    # sumdoc < k -> score * k / sumdoc (:237-243)
    scored = spark.createDataFrame(
        [(0, 4.0), (1, 2.0)], ["doc_id", "score"]
    )
    classes = spark.createDataFrame(
        [(0, "a"), (1, "b"), (7, "c")], ["doc_id", "class"]
    )
    rows = {
        r["class"]: r["score"]
        for r in knn_classify(scored, classes, k=5).collect()
    }
    # raw a = 1.0/5, b = 0.5/5; corrected * 5/2
    assert rows["a"] == pytest.approx(0.5)
    assert rows["b"] == pytest.approx(0.25)


def test_knn_batch_by_input_id(spark):
    scored = spark.createDataFrame(
        [(10, 0, 4.0), (10, 1, 2.0), (20, 1, 3.0), (20, 2, 3.0)],
        ["input_id", "doc_id", "score"],
    )
    classes = spark.createDataFrame(
        [(0, "a"), (1, "a"), (2, "b")], ["doc_id", "class"]
    )
    out = knn_classify(scored, classes, k=2).collect()
    by_input = {}
    for r in out:
        by_input.setdefault(r["input_id"], {})[r["class"]] = r["score"]
    assert by_input[10]["a"] == pytest.approx((1.0 + 0.5) / 2)
    assert by_input[20]["a"] == pytest.approx(0.5)
    assert by_input[20]["b"] == pytest.approx(0.5)
