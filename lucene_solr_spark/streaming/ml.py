"""ML streams — FeaturesSelectionStream / TextLogitStream re-expressed
as distributed DataFrame aggregations.

Refs:
- solr/solrj/src/java/org/apache/solr/client/solrj/io/stream/
  FeaturesSelectionStream.java (top-N terms by information gain; emits
  term_s/score_f/idf_d with idf = ln(numDocs/(docFreq+1)), line 367)
- solr/core/src/java/org/apache/solr/search/IGainTermsQParserPlugin.java:
  158-211 (the IGain formula, including its ``numDocs - docFreq + 1``
  denominator quirk and the 0/1-prob → 0 entropy convention)
- solr/core/src/java/org/apache/solr/search/
  TextLogisticRegressionQParserPlugin.java:174-220 (doc feature vector
  = [1, idf_i * (1 + ln tf_i)], sigmoid error, alpha-scaled update;
  only docs containing at least one feature term participate)
- solr/solrj/src/java/org/apache/solr/client/solrj/io/stream/
  TextLogitStream.java (the iterative driver: one gradient pass per
  iteration, shard weights averaged)

Design note: the reference's per-shard collector applies the update
*sequentially per document in hash order* (non-deterministic), then the
stream averages the shard weights.  The Spark-first analog is
deterministic full-batch gradient descent — one distributed aggregation
per iteration (partial sums per partition, tiny final reduce), which is
the limit the reference's shard-averaging approximates and is the only
order-independent choice at 1000 executors.  ``error`` keeps the
reference's definition: sum |sigmoid(v·w_start) − outcome| evaluated at
the iteration's starting weights.

Everything here is JVM column arithmetic; per-iteration driver traffic
is one row of 2n+6 doubles (no feature data ever reaches the driver).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _binary_entropy(p):  # Column -> Column
    """IGainTermsQParserPlugin.binaryEntropy:208-211 — 0 at p∈{0,1}."""
    return F.when(
        (p <= 0.0) | (p >= 1.0), F.lit(0.0)
    ).otherwise(-p * F.log(p) - (1.0 - p) * F.log(1.0 - p))


def features_selection(
    postings: DataFrame,
    outcomes: DataFrame,
    num_terms: int = 10,
    positive_label: int = 1,
) -> DataFrame:
    """Top ``num_terms`` terms of ``postings`` (doc_id, term[, tf]) by
    information gain against the binary ``outcomes`` (doc_id, outcome).

    Returns (term, score, docfreq, idf) ordered by score desc — the
    FeaturesSelectionStream tuple surface (term_s/score_f/idf_d) with
    the IGain math of IGainTermsQParserPlugin.  One shuffle (the
    per-term groupBy); the two corpus scalars ride in as literals.
    """
    y = outcomes.select(
        "doc_id",
        F.when(F.col("outcome") == positive_label, 1).otherwise(0).alias("y"),
    )
    tot = y.agg(
        F.count("*").alias("n"), F.sum("y").alias("npos")
    ).first()
    n_docs, n_pos = int(tot["n"]), int(tot["npos"])
    p_c = n_pos / n_docs if n_docs else 0.0
    entropy_c = (
        0.0
        if p_c in (0.0, 1.0)
        else -p_c * math.log(p_c) - (1.0 - p_c) * math.log(1.0 - p_c)
    )

    per_term = (
        postings.select("doc_id", "term")
        .join(y, "doc_id")
        .groupBy("term")
        .agg(F.count("*").alias("docfreq"), F.sum("y").alias("xc"))
    )
    df_ = F.col("docfreq").cast("double")
    xc = F.col("xc").cast("double")
    h_in = _binary_entropy(xc / df_)
    h_out = _binary_entropy(
        (F.lit(float(n_pos)) - xc) / (F.lit(float(n_docs)) - df_ + 1.0)
    )
    score = (
        F.lit(entropy_c)
        - (df_ / n_docs * h_in + (1.0 - df_ / n_docs) * h_out)
    )
    return (
        per_term.select(
            "term",
            score.alias("_score"),
            "docfreq",
            F.log(F.lit(float(n_docs)) / (df_ + 1.0)).alias("_idf"),
        )
        .orderBy(F.col("_score").desc(), F.col("term").asc())
        .limit(num_terms)
        .select(
            "term",
            F.round("_score", 4).alias("score"),
            "docfreq",
            F.round("_idf", 4).alias("idf"),
        )
    )


@dataclass
class LogitIteration:
    iteration: int
    weights: list[float]  # [bias, w_term0, ...]
    error: float  # sum |sigmoid(v·w_start) − y| at starting weights
    true_positives: int
    false_positives: int
    true_negatives: int
    false_negatives: int


def text_logit(
    postings: DataFrame,
    outcomes: DataFrame,
    terms: list[str],
    idfs: list[float],
    iterations: int = 10,
    alpha: float = 0.01,
    threshold: float = 0.5,
    initial_weights: list[float] | None = None,
    positive_label: int = 1,
) -> list[LogitIteration]:
    """Train logistic regression over term features, TextLogitStream
    style: feature j of a doc is ``idfs[j] * (1 + ln tf_j)`` (0 when the
    doc lacks the term), plus a bias feature fixed at 1.0; docs with no
    feature term are excluded; weights start at 1.0
    (TextLogisticRegressionQParserPlugin:96-99).

    Each iteration is ONE distributed aggregation producing the full
    batch gradient + the reference's error/confusion metrics; the
    feature frame is computed once and cached.  Update:
    ``w ← w − alpha · Σ_docs (sigmoid(v·w) − y) · v``.
    """
    if len(idfs) != len(terms):
        raise ValueError("terms and idfs must align")
    n = len(terms)
    w = list(initial_weights) if initial_weights else [1.0] * (n + 1)
    if len(w) != n + 1:
        raise ValueError(f"expected {n + 1} weights (bias first)")

    y = outcomes.select(
        "doc_id",
        F.when(F.col("outcome") == positive_label, 1.0)
        .otherwise(0.0)
        .alias("y"),
    )
    fv = F.map_from_entries(
        F.collect_list(F.struct(F.col("term"), F.col("_fv")))
    )
    feats = (
        postings.filter(F.col("term").isin(terms))
        .select(
            "doc_id",
            "term",
            (
                F.element_at(
                    F.create_map(
                        *[
                            c
                            for t, i in zip(terms, idfs)
                            for c in (F.lit(t), F.lit(float(i)))
                        ]
                    ),
                    F.col("term"),
                )
                * (1.0 + F.log(F.col("tf").cast("double")))
            ).alias("_fv"),
        )
        .groupBy("doc_id")
        .agg(fv.alias("m"))
        .join(y, "doc_id")
    )
    vcols = [
        F.coalesce(F.element_at(F.col("m"), F.lit(t)), F.lit(0.0))
        for t in terms
    ]
    feats = feats.select(
        "doc_id", "y", *[v.alias(f"v{j}") for j, v in enumerate(vcols)]
    )
    feats.persist()
    try:
        out: list[LogitIteration] = []
        for it in range(1, iterations + 1):
            margin = F.lit(w[0]) + sum(
                (F.lit(w[j + 1]) * F.col(f"v{j}") for j in range(n)),
                start=F.lit(0.0),
            )
            sig = 1.0 / (1.0 + F.exp(-margin))
            err = sig - F.col("y")
            pred = (sig >= threshold).cast("int")
            yi = F.col("y").cast("int")
            aggs = [F.sum(err).alias("g_bias")] + [
                F.sum(err * F.col(f"v{j}")).alias(f"g{j}") for j in range(n)
            ]
            aggs += [
                F.sum(F.abs(err)).alias("error"),
                F.sum(((yi == 1) & (pred == 1)).cast("int")).alias("tp"),
                F.sum(((yi == 0) & (pred == 1)).cast("int")).alias("fp"),
                F.sum(((yi == 0) & (pred == 0)).cast("int")).alias("tn"),
                F.sum(((yi == 1) & (pred == 0)).cast("int")).alias("fn"),
            ]
            row = feats.agg(*aggs).first()
            grad = [row["g_bias"]] + [row[f"g{j}"] for j in range(n)]
            w = [wi - alpha * gi for wi, gi in zip(w, grad)]
            out.append(
                LogitIteration(
                    iteration=it,
                    weights=list(w),
                    error=float(row["error"]),
                    true_positives=int(row["tp"]),
                    false_positives=int(row["fp"]),
                    true_negatives=int(row["tn"]),
                    false_negatives=int(row["fn"]),
                )
            )
        return out
    finally:
        feats.unpersist()


def classify(
    postings: DataFrame,
    norms: DataFrame,
    terms: list[str],
    idfs: list[float],
    weights: list[float],
) -> DataFrame:
    """ClassifyStream / ModelStream scoring (solr/handler/
    ClassifyStream.java:136-185): per doc, total = w0 + Σ w_{i+1} ·
    idf_i · (1 + ln tf_i); probability_d = sigmoid(total); score_d =
    total · (float)(1/√termCount) — the reference casts the reciprocal
    root to float32 before the double multiply, reproduced here with an
    explicit float cast.  ``termCount`` is the doc's total analyzed
    token count = the norms length (ClassifyStream counts every emitted
    token, not just model terms).

    Docs appear iff they have a norms row (≥1 indexed token), matching
    the searchable universe.  Pure column arithmetic, no shuffle beyond
    the one tf pivot."""
    n = len(terms)
    if len(idfs) != n or len(weights) != n + 1:
        raise ValueError("need len(idfs)==len(terms), weights==n+1")
    tf_map = (
        postings.filter(F.col("term").isin(terms))
        .groupBy("doc_id")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("term", "tf"))
            ).alias("m")
        )
    )
    base = norms.select("doc_id", "length").join(tf_map, "doc_id", "left")
    total = F.lit(float(weights[0]))
    for j, t in enumerate(terms):
        tf = F.element_at(F.col("m"), F.lit(t)).cast("double")
        total = total + F.when(
            tf.isNotNull(),
            F.lit(float(weights[j + 1]))
            * F.lit(float(idfs[j]))
            * (1.0 + F.log(tf)),
        ).otherwise(F.lit(0.0))
    inv_root = (
        (F.lit(1.0) / F.sqrt(F.col("length").cast("double")))
        .cast("float")
        .cast("double")
    )
    return base.select(
        "doc_id",
        F.round(1.0 / (1.0 + F.exp(-total)), 4).alias("probability"),
        F.round(total * inv_root, 4).alias("score"),
    ).orderBy("doc_id")


def regression_evaluators(
    df: DataFrame, x_col: str, y_col: str, group_col: str
) -> DataFrame:
    """CorrelationEvaluator / CovarianceEvaluator / RegressionEvaluator
    (solrj io/stream/*Evaluator.java) as one grouped aggregation.

    Moments are summed as exact decimals (the double inputs are cast to
    decimal(38,6) per row — identical rounding on any engine — so the
    sums are order-independent), then the textbook closed forms are
    evaluated in double: sample correlation, sample covariance, OLS
    slope/intercept.  This is the same exact-moments discipline as the
    stats/facet gates (order-independent at any partition count).
    """
    x = F.col(x_col).cast("decimal(38,6)")
    yv = F.col(y_col).cast("decimal(38,6)")
    g = df.groupBy(group_col).agg(
        F.count("*").cast("double").alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(yv).cast("double").alias("sy"),
        F.sum((F.col(x_col) * F.col(y_col)).cast("decimal(38,6)"))
        .cast("double")
        .alias("sxy"),
        F.sum((F.col(x_col) * F.col(x_col)).cast("decimal(38,6)"))
        .cast("double")
        .alias("sxx"),
        F.sum((F.col(y_col) * F.col(y_col)).cast("decimal(38,6)"))
        .cast("double")
        .alias("syy"),
    )
    nn, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    cov_s = (sxy - sx * sy / nn) / (nn - 1.0)
    corr = (nn * sxy - sx * sy) / F.sqrt(
        (nn * sxx - sx * sx) * (nn * syy - sy * sy)
    )
    slope = (nn * sxy - sx * sy) / (nn * sxx - sx * sx)
    intercept = (sy - slope * sx) / nn
    return g.select(
        group_col,
        F.round(corr, 4).alias("correlation"),
        F.round(cov_s, 4).alias("covariance"),
        F.round(slope, 4).alias("slope"),
        F.round(intercept, 4).alias("intercept"),
    ).orderBy(group_col)
