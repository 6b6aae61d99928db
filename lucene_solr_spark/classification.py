"""Lucene classification module re-expressed as DataFrame algebra.

Reference: ``lucene/classification/src/java/org/apache/lucene/
classification/SimpleNaiveBayesClassifier.java`` and
``KNearestNeighborClassifier.java``.

The reference classifies ONE unseen text at a time by issuing
per-term index lookups (``getWordFreqForClass`` runs a
TotalHitCountCollector per (word, class) pair).  On Spark the same
statistics are one join: a ``(term, class) -> doc-frequency`` table
built once from postings x doc_classes, then a batch of input texts
classified in a single shuffle-free broadcast join pass.  At 100 TB
the wc-hits table is |V| x |C| rows (bounded by the vocabulary), and
the per-input work is a join on ``term`` + one groupBy on
``(input_id, class)`` - no per-row Python anywhere.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def naive_bayes_classify(
    postings: DataFrame,
    doc_classes: DataFrame,
    inputs: DataFrame,
) -> DataFrame:
    """SimpleNaiveBayesClassifier.assignClassNormalizedList for a batch.

    Faithful to SimpleNaiveBayesClassifier.java:144-163 with add-1
    smoothing (:212-233) and the log-sum-exp softmax normalization of
    normClassificationResults (:289-313):

    - ``logPrior(c)   = ln(docFreq(class=c)) - ln(docsWithClass)``
      (:275-277)
    - ``logLik(d, c)  = sum_w cnt_w * ln((hits(w,c)+1) /
      (avgUniqueTermsPerDoc*docFreq(c) + docsWithClass))`` where
      ``hits(w,c)`` is the number of docs of class c containing w
      (:259-273) and ``avgUniqueTermsPerDoc = sumDocFreq/docCount``
      of the text field (:240-251).
    - probability = softmax over classes of (logPrior + logLik).

    Args:
        postings: (doc_id, term, tf) inverted index of the training
            corpus.
        doc_classes: (doc_id, class) - the class field; docs with a
            NULL class are unclassified (excluded, as Lucene's
            wildcard class query does).
        inputs: (input_id, term, cnt) - tokenized unseen texts with
            multiplicity (Lucene iterates every token occurrence,
            :214-215).

    Returns (input_id, class, log_score, probability).
    """
    labeled = doc_classes.filter(F.col("class").isNotNull())

    # Training-time scalars, same role as the reference's
    # countDocsWithClass / getTextTermFreqForClass index statistics.
    docs_with_class = labeled.count()
    agg = postings.agg(
        F.count(F.lit(1)).alias("sum_doc_freq"),
        F.countDistinct("doc_id").alias("doc_count"),
    ).collect()[0]
    avg_unique = agg["sum_doc_freq"] / float(agg["doc_count"])

    class_stats = (
        labeled.groupBy("class")
        .agg(F.count(F.lit(1)).alias("docs_c"))
        .withColumn(
            "log_prior",
            F.log(F.col("docs_c").cast("double"))
            - F.log(F.lit(float(docs_with_class))),
        )
        .withColumn(
            "den",
            F.lit(avg_unique) * F.col("docs_c").cast("double")
            + F.lit(float(docs_with_class)),
        )
    )

    # hits(w, c): docs of class c containing w - one row per (term,
    # class), bounded by |V| x |C|.
    wc_hits = (
        postings.select("doc_id", "term")
        .join(labeled, "doc_id")
        .groupBy("term", "class")
        .agg(F.count(F.lit(1)).alias("hits"))
    )

    # Every input term is scored against every class (the reference
    # loops classesEnum); class_stats is tiny -> broadcast.
    expanded = inputs.crossJoin(F.broadcast(class_stats)).join(
        wc_hits, ["term", "class"], "left"
    )
    contrib = expanded.withColumn(
        "ll",
        F.col("cnt").cast("double")
        * F.log(
            (F.coalesce(F.col("hits"), F.lit(0)).cast("double") + F.lit(1.0))
            / F.col("den")
        ),
    )
    scored = contrib.groupBy("input_id", "class").agg(
        (F.first("log_prior") + F.sum("ll")).alias("log_score")
    )

    # Softmax per input (normClassificationResults: log-sum-exp).
    w = Window.partitionBy("input_id")
    return (
        scored.withColumn("smax", F.max("log_score").over(w))
        .withColumn(
            "loga",
            F.col("smax")
            + F.log(
                F.sum(F.exp(F.col("log_score") - F.col("smax"))).over(w)
            ),
        )
        .select(
            "input_id",
            "class",
            "log_score",
            F.exp(F.col("log_score") - F.col("loga")).alias("probability"),
        )
    )


def knn_classify(
    scored_topk: DataFrame,
    doc_classes: DataFrame,
    k: int,
) -> DataFrame:
    """KNearestNeighborClassifier.buildListFromTopDocs as aggregation.

    Faithful to KNearestNeighborClassifier.java:199-245: over the
    top-k MLT hits, each class accumulates ``count`` and ``boost =
    sum(score/maxScore)``; the class score is ``(count *
    (boost/count)) / k`` with the under-filled correction ``* k /
    sumdoc`` when fewer than k hits carried a class (:237-243).

    Args:
        scored_topk: (doc_id, score) - the k nearest neighbors (the
            output of an MLT BM25 top-k search).  May carry an
            ``input_id`` column for batch classification.
        doc_classes: (doc_id, class) class field of the corpus.
        k: the requested neighbor count.

    Returns (input_id?, class, count, score) ranked by score desc.
    """
    keys = (
        ["input_id"] if "input_id" in scored_topk.columns else []
    )
    hits = scored_topk.join(
        doc_classes.filter(F.col("class").isNotNull()), "doc_id"
    )
    w = Window.partitionBy(*keys) if keys else Window.partitionBy(F.lit(1))
    hits = hits.withColumn("max_score", F.max("score").over(w)).withColumn(
        "sumdoc", F.count(F.lit(1)).over(w)
    )
    per_class = hits.groupBy(*(keys + ["class"])).agg(
        F.count(F.lit(1)).alias("count"),
        F.sum(F.col("score") / F.col("max_score")).alias("boost"),
        F.first("sumdoc").alias("sumdoc"),
    )
    raw = per_class.withColumn(
        "score_raw",
        (F.col("count") * (F.col("boost") / F.col("count")))
        / F.lit(float(k)),
    )
    corrected = raw.withColumn(
        "score",
        F.when(
            F.col("sumdoc") < F.lit(k),
            F.col("score_raw") * F.lit(float(k)) / F.col("sumdoc"),
        ).otherwise(F.col("score_raw")),
    )
    return corrected.select(
        *(keys + ["class", "count", "score"])
    ).orderBy(*(keys + [F.col("score").desc(), F.col("class").asc()]))
