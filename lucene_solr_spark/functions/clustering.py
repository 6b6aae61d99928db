"""Search-result clustering (solr/contrib/clustering).

Reference: ``solr/contrib/clustering/src/java/org/apache/solr/
handler/clustering/carrot2/CarrotClusteringEngine.java`` — Solr's
clustering component hands the top-N search results to a Carrot2
algorithm (STC / Lingo) and returns labeled clusters.  The shape
implemented here is Suffix Tree Clustering's two stages (Zamir &
Etzioni, SIGIR'98 — the published algorithm Carrot2's STC
implements):

1. **Base clusters**: phrases (here unigrams + adjacent bigrams of
   the analyzed token stream) shared by >= ``min_docs`` of the result
   set, scored ``|B| * len(phrase)`` (the STC score s(B) = |B| *
   f(|P|) with the phrase-length boost).
2. **Merge**: base clusters whose document sets overlap by more than
   50% on BOTH sides join into one cluster — a similarity graph whose
   components are the final clusters (the STC binary similarity with
   threshold 0.5), computed with the engine's large-star/small-star
   connected components.

Spark shape: stage 1 is one self-join on (doc, position) plus a
groupBy; stage 2's overlap graph is a membership self-join on doc_id
bounded by the top-K base clusters (K small — the reference keeps
the best ~500 base clusters), then O(log n) CC rounds.  The result
set a clustering engine sees is top-N (tiny); everything here also
works corpus-wide since no stage collects to the driver.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lucene_solr_spark.functions.dedup import connected_components

__all__ = ["base_clusters", "merge_base_clusters", "cluster_results"]


def base_clusters(
    postings: DataFrame,
    candidates: DataFrame,
    min_docs: int = 2,
    top_k: int = 50,
) -> DataFrame:
    """STC stage 1 over the candidate result set.

    ``postings`` carries (doc_id, term, positions); ``candidates``
    the result docs (doc_id).  Returns the ``top_k`` base clusters
    (phrase, n_docs, score, cluster_id) with score = n_docs * phrase
    length, ranked score desc then phrase asc; cluster_id is the
    dense rank in that order.
    """
    p = postings.join(candidates.select("doc_id"), "doc_id", "left_semi")
    kept = p.select(
        "doc_id", "term", F.explode("positions").alias("pos")
    )
    uni = p.select("doc_id", F.col("term").alias("phrase")).distinct()
    big = (
        kept.alias("a")
        .join(
            kept.alias("b"),
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("b.pos") == F.col("a.pos") + 1),
        )
        .select(
            F.col("a.doc_id").alias("doc_id"),
            F.concat_ws(" ", "a.term", "b.term").alias("phrase"),
        )
        .distinct()
    )
    phrases = uni.withColumn("plen", F.lit(1)).unionByName(
        big.withColumn("plen", F.lit(2))
    )
    scored = (
        phrases.groupBy("phrase", "plen")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .withColumn("score", F.col("n_docs") * F.col("plen"))
    )
    # top_k FIRST (TakeOrderedAndProject: per-partition top-k + k-row
    # merge, no global sort), THEN rank the ≤top_k-row frame by
    # counting sort-predecessors in a broadcast self-join (k² ≤ 2500
    # pairs) — the previous version ranked every scored phrase
    # (vocabulary-shaped) through an unpartitioned window on a single
    # task.  Phrases are unique (groupBy key), the ordering total, so
    # predecessor-count + 1 == row_number.
    top = scored.orderBy(
        F.col("score").desc(), F.col("phrase").asc()
    ).limit(top_k)
    a, b = top.alias("a"), F.broadcast(top.select("phrase", "score").alias("b"))
    before = (F.col("b.score") > F.col("a.score")) | (
        (F.col("b.score") == F.col("a.score"))
        & (F.col("b.phrase") < F.col("a.phrase"))
    )
    return (
        a.join(b, before, "left")
        .groupBy("a.phrase", "a.n_docs", "a.score")
        .agg((F.count("b.phrase") + 1).cast("int").alias("cluster_id"))
        .select("cluster_id", "phrase", "n_docs", "score")
    )


def merge_base_clusters(
    base: DataFrame,
    postings: DataFrame,
    candidates: DataFrame,
    threshold: float = 0.5,
) -> DataFrame:
    """STC stage 2: merge base clusters into final clusters.

    Two base clusters connect when |Bi ∩ Bj| > threshold·|Bi| AND
    > threshold·|Bj| (the STC binary similarity); final clusters are
    the connected components.  Returns (cluster_id, merged_id, phrase,
    n_docs, score) where merged_id is the component representative
    (its lowest member id — whose phrase, having the top STC rank in
    the component, is the cluster label).
    """
    p = postings.join(candidates.select("doc_id"), "doc_id", "left_semi")
    kept = p.select("doc_id", "term", F.explode("positions").alias("pos"))
    uni = p.select("doc_id", F.col("term").alias("phrase")).distinct()
    big = (
        kept.alias("a")
        .join(
            kept.alias("b"),
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("b.pos") == F.col("a.pos") + 1),
        )
        .select(
            F.col("a.doc_id").alias("doc_id"),
            F.concat_ws(" ", "a.term", "b.term").alias("phrase"),
        )
        .distinct()
    )
    members = (
        uni.unionByName(big)
        .join(base.select("cluster_id", "phrase"), "phrase")
        .select("cluster_id", "doc_id")
        .distinct()
    )
    sizes = members.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("sz")
    )
    pairs = (
        members.alias("x")
        .join(members.alias("y"), "doc_id")
        .filter(F.col("x.cluster_id") < F.col("y.cluster_id"))
        .groupBy(
            F.col("x.cluster_id").alias("ca"),
            F.col("y.cluster_id").alias("cb"),
        )
        .agg(F.count(F.lit(1)).alias("common"))
    )
    edges = (
        pairs.join(
            sizes.select(
                F.col("cluster_id").alias("ca"), F.col("sz").alias("sa")
            ),
            "ca",
        )
        .join(
            sizes.select(
                F.col("cluster_id").alias("cb"), F.col("sz").alias("sb")
            ),
            "cb",
        )
        .filter(
            (F.col("common") > F.lit(threshold) * F.col("sa"))
            & (F.col("common") > F.lit(threshold) * F.col("sb"))
        )
        .select("ca", "cb")
    )
    comp = connected_components(edges, "ca", "cb").select(
        F.col("doc_id").alias("cluster_id"), F.col("rep").alias("merged_id")
    )
    return (
        base.join(comp, "cluster_id", "left")
        .withColumn(
            "merged_id",
            F.coalesce(F.col("merged_id"), F.col("cluster_id")),
        )
        .select("cluster_id", "merged_id", "phrase", "n_docs", "score")
    )


def cluster_results(
    postings: DataFrame,
    candidates: DataFrame,
    min_docs: int = 2,
    top_k: int = 50,
    threshold: float = 0.5,
) -> DataFrame:
    """Full STC pipeline: base clusters, merge, label.

    Returns one row per FINAL cluster: (label, n_base, best_score)
    where label is the top-ranked member phrase.
    """
    base = base_clusters(postings, candidates, min_docs, top_k)
    merged = merge_base_clusters(base, postings, candidates, threshold)
    labels = merged.filter(
        F.col("cluster_id") == F.col("merged_id")
    ).select(F.col("merged_id"), F.col("phrase").alias("label"))
    return (
        merged.groupBy("merged_id")
        .agg(
            F.count(F.lit(1)).alias("n_base"),
            F.max("score").alias("best_score"),
        )
        .join(labels, "merged_id")
        .select("label", "n_base", "best_score")
        .orderBy(F.col("best_score").desc(), F.col("label").asc())
    )
