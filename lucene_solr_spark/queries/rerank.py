"""ReRank — two-pass scoring (Solr ReRankQParserPlugin).

Ref: solr/core/src/java/org/apache/solr/search/ReRankQParserPlugin.java
and ReRankCollector: collect the main query's top ``rerank_docs`` hits,
then re-score just that window with the rerank query, final score =
mainScore + rerank_weight · rerankScore (docs not matching the rerank
query keep their main score), and re-sort.

Spark-first: the first pass is a TakeOrderedAndProject (bounded heap)
over the full match set; the second pass semi-joins the rerank query's
scores down to the tiny top-N window (broadcast of the N doc ids), so
the rerank scores are only materialized for N docs — matching the
reference's "re-score only the window" cost model.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rerank(
    main: DataFrame,
    rerank_scores: DataFrame,
    rerank_weight: float = 2.0,
    rerank_docs: int = 200,
    k: int = 10,
) -> DataFrame:
    """``main`` and ``rerank_scores`` are (doc_id, score) DataFrames.

    Returns top-``k`` of the re-scored window, (score DESC, doc_id ASC)
    tie-break on the combined score.  Ordering for the window cutoff
    uses the main score with the same tie-break, so the window is
    deterministic."""
    window = (
        main.orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(rerank_docs)
    )
    rr = rerank_scores.select("doc_id", F.col("score").alias("_rr"))
    # prune the rerank scores to the window first (broadcast semi-join
    # on N ids), so the left join's build side is at most N rows
    rr = rr.join(F.broadcast(window.select("doc_id")), "doc_id", "left_semi")
    combined = (
        window.join(F.broadcast(rr), "doc_id", "left")
        .select(
            "doc_id",
            (
                F.col("score").cast("double")
                + F.lit(float(rerank_weight))
                * F.coalesce(F.col("_rr").cast("double"), F.lit(0.0))
            ).alias("score"),
        )
    )
    if k <= rerank_docs:
        return combined.orderBy(
            F.col("score").desc(), F.col("doc_id").asc()
        ).limit(k)
    # ReRankCollector fills requested rows past the window with the main
    # query's docs at their ORIGINAL scores, after the re-sorted window
    # (ReRankQParserPlugin.java ReRankCollector.topDocs): group 0 = the
    # rescored window ordered by combined score, group 1 = the remainder
    # ordered by main score.
    remainder = main.join(
        F.broadcast(window.select("doc_id")), "doc_id", "left_anti"
    ).select("doc_id", F.col("score").cast("double").alias("score"))
    ranked = combined.select(F.lit(0).alias("_grp"), "doc_id", "score").unionByName(
        remainder.select(F.lit(1).alias("_grp"), "doc_id", "score")
    )
    return (
        ranked.orderBy(
            F.col("_grp").asc(), F.col("score").desc(), F.col("doc_id").asc()
        )
        .limit(k)
        .select("doc_id", "score")
    )
