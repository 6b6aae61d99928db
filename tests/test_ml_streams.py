"""ML streams (FeaturesSelectionStream / TextLogitStream /
stream evaluators) vs independent pure-Python references.

Refs: solr/core/src/java/org/apache/solr/search/IGainTermsQParserPlugin.java
:158-211, TextLogisticRegressionQParserPlugin.java:174-220."""

import math

import pytest

from lucene_solr_spark.streaming.ml import (
    features_selection,
    regression_evaluators,
    text_logit,
)

DOCS = [
    # (doc_id, tokens, outcome) — outcome correlates with 'signal'
    (0, ["signal", "alpha", "beta"], 1),
    (1, ["signal", "alpha"], 1),
    (2, ["signal", "gamma", "gamma"], 1),
    (3, ["noise", "alpha"], 0),
    (4, ["noise", "beta"], 0),
    (5, ["noise", "gamma"], 0),
    (6, ["signal", "noise"], 1),
    (7, ["beta", "gamma"], 0),
]


def _postings(spark):
    rows = []
    for doc_id, toks, _ in DOCS:
        tf = {}
        for t in toks:
            tf[t] = tf.get(t, 0) + 1
        rows += [(doc_id, t, c) for t, c in tf.items()]
    return spark.createDataFrame(rows, ["doc_id", "term", "tf"])


def _outcomes(spark):
    return spark.createDataFrame(
        [(d, o) for d, _, o in DOCS], ["doc_id", "outcome"]
    )


def _h(p):
    if p <= 0 or p >= 1:
        return 0.0
    return -p * math.log(p) - (1 - p) * math.log(1 - p)


def _igain_ref():
    """IGainTermsQParserPlugin.finish():158-186 re-derived."""
    n = len(DOCS)
    npos = sum(o for _, _, o in DOCS)
    hc = _h(npos / n)
    scores = {}
    terms = {t for _, toks, _ in DOCS for t in toks}
    for t in sorted(terms):
        xc = sum(1 for _, toks, o in DOCS if t in toks and o == 1)
        dfq = sum(1 for _, toks, _ in DOCS if t in toks)
        h_in = _h(xc / dfq)
        h_out = _h((npos - xc) / (n - dfq + 1))
        scores[t] = hc - (dfq / n * h_in + (1 - dfq / n) * h_out)
    return scores


def test_features_selection_matches_igain_reference(spark):
    got = {
        r["term"]: (r["score"], r["docfreq"], r["idf"])
        for r in features_selection(
            _postings(spark), _outcomes(spark), num_terms=10
        ).collect()
    }
    ref = _igain_ref()
    n = len(DOCS)
    assert set(got) == set(ref)
    for t, (score, dfq, idf) in got.items():
        assert score == pytest.approx(round(ref[t], 4), abs=1e-9)
        ref_df = sum(1 for _, toks, _ in DOCS if t in toks)
        assert dfq == ref_df
        assert idf == pytest.approx(round(math.log(n / (ref_df + 1)), 4))
    # 'signal' and 'noise' perfectly split the outcome -> top scores
    top = sorted(ref, key=lambda t: (-ref[t], t))[:2]
    assert set(top) == {"signal", "noise"}


def _logit_ref(terms, idfs, iterations, alpha=0.01):
    """Deterministic full-batch GD over the same feature map."""
    vecs = []
    for _, toks, o in DOCS:
        tf = {}
        for t in toks:
            tf[t] = tf.get(t, 0) + 1
        v = [idfs[j] * (1 + math.log(tf[t])) if t in tf else 0.0
             for j, t in enumerate(terms)]
        if any(x != 0.0 for x in v):
            vecs.append(([1.0] + v, float(o)))
    w = [1.0] * (len(terms) + 1)
    history = []
    for _ in range(iterations):
        grad = [0.0] * len(w)
        err_sum = 0.0
        for v, y in vecs:
            margin = sum(wi * vi for wi, vi in zip(w, v))
            sig = 1.0 / (1.0 + math.exp(-margin))
            err_sum += abs(sig - y)
            for j in range(len(w)):
                grad[j] += (sig - y) * v[j]
        w = [wi - alpha * gi for wi, gi in zip(w, grad)]
        history.append((list(w), err_sum))
    return history


def test_text_logit_matches_batch_gd_reference(spark):
    terms = ["signal", "noise", "gamma"]
    n = len(DOCS)
    dfs = {t: sum(1 for _, toks, _ in DOCS if t in toks) for t in terms}
    idfs = [math.log(n / (dfs[t] + 1)) for t in terms]
    got = text_logit(
        _postings(spark), _outcomes(spark), terms, idfs,
        iterations=5, alpha=0.1,
    )
    ref = _logit_ref(terms, idfs, iterations=5, alpha=0.1)
    assert len(got) == 5
    for it, (rw, rerr) in zip(got, ref):
        assert it.error == pytest.approx(rerr, rel=1e-9)
        for a, b in zip(it.weights, rw):
            assert a == pytest.approx(b, rel=1e-9)
    # training reduces the error
    assert got[-1].error < got[0].error
    # confusion counts partition the participating docs
    last = got[-1]
    assert (
        last.true_positives + last.false_positives
        + last.true_negatives + last.false_negatives
        == len([1 for _, toks, _ in DOCS if set(toks) & set(terms)])
    )


def test_text_logit_excludes_docs_without_features(spark):
    # only docs 0..2 contain 'signal'; the rest must not contribute
    got = text_logit(
        _postings(spark), _outcomes(spark), ["signal"], [1.0],
        iterations=1,
    )[0]
    participating = sum(1 for _, toks, _ in DOCS if "signal" in toks)
    assert (
        got.true_positives + got.false_positives
        + got.true_negatives + got.false_negatives == participating
    )


def test_classify_matches_reference_math(spark):
    """ClassifyStream.java:136-185 — probability/score per doc under a
    fixed model, including the float32 cast on 1/sqrt(termCount)."""
    import numpy as np

    from lucene_solr_spark.streaming.ml import classify

    terms = ["signal", "noise"]
    idfs = [0.7, 0.9]
    weights = [0.2, 1.5, -1.1]
    norms_rows = [(d, len(toks)) for d, toks, _ in DOCS]
    norms = spark.createDataFrame(norms_rows, ["doc_id", "length"])
    got = {
        r["doc_id"]: (r["probability"], r["score"])
        for r in classify(
            _postings(spark), norms, terms, idfs, weights
        ).collect()
    }
    assert set(got) == {d for d, _, _ in DOCS}
    for d, toks, _ in DOCS:
        tf = {}
        for t in toks:
            tf[t] = tf.get(t, 0) + 1
        total = weights[0]
        for j, t in enumerate(terms):
            if t in tf:
                total += (weights[j + 1] * idfs[j]) * (
                    1 + math.log(tf[t])
                )
        prob = 1.0 / (1.0 + math.exp(-total))
        score = total * float(np.float32(1.0 / math.sqrt(len(toks))))
        assert got[d][0] == pytest.approx(round(prob, 4))
        assert got[d][1] == pytest.approx(round(score, 4))


def test_regression_evaluators_closed_form(spark):
    pts = [("a", 1.0, 2.1), ("a", 2.0, 3.9), ("a", 3.0, 6.1),
           ("a", 4.0, 8.0), ("b", 1.0, 10.0), ("b", 2.0, 8.0),
           ("b", 3.0, 6.0)]
    df = spark.createDataFrame(pts, ["g", "x", "y"])
    got = {r["g"]: r for r in
           regression_evaluators(df, "x", "y", "g").collect()}

    for gname in ("a", "b"):
        xs = [x for g, x, _ in pts if g == gname]
        ys = [y for g, _, y in pts if g == gname]
        n = len(xs)
        sx, sy = sum(xs), sum(ys)
        sxy = sum(a * b for a, b in zip(xs, ys))
        sxx = sum(a * a for a in xs)
        syy = sum(b * b for b in ys)
        slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        corr = (n * sxy - sx * sy) / math.sqrt(
            (n * sxx - sx * sx) * (n * syy - sy * sy)
        )
        cov = (sxy - sx * sy / n) / (n - 1)
        r = got[gname]
        assert r["slope"] == pytest.approx(round(slope, 4))
        assert r["correlation"] == pytest.approx(round(corr, 4))
        assert r["covariance"] == pytest.approx(round(cov, 4))
        assert r["intercept"] == pytest.approx(
            round((sy - slope * sx) / n, 4)
        )
    assert got["b"]["correlation"] == pytest.approx(-1.0)
