"""QueryElevationComponent — editorial result pinning.

Ref: solr/core/src/java/org/apache/solr/handler/component/
QueryElevationComponent.java (elevate.xml: per-query <doc id= /> pins
in configured order, exclude="true" docs dropped) and its
ElevationComparatorSource: elevated docs sort above everything in
config order, the organic tail keeps its score order.

Spark shape: the elevation map is a tiny broadcast frame (config
order as rank); elevated ids that did NOT match the query are still
returned (the component forces them into the result set), organic
results follow by (score desc, doc_id asc).  One broadcast join —
nothing corpus-sized moves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def elevate_topk(
    results: DataFrame,
    elevated_ids: list,
    excluded_ids: tuple | list = (),
    k: int = 10,
) -> DataFrame:
    """Apply elevation to a scored result frame (doc_id, score) →
    top-k with pins first: (doc_id, score, elevated).  Forced-in
    elevated docs that missed the query carry score 0.0 — the
    component's behavior when forceElevation injects them."""
    spark = results.sparkSession
    if not elevated_ids:
        elev = spark.createDataFrame([], "doc_id long, _rank int")
    else:
        elev = spark.createDataFrame(
            [(int(d), i) for i, d in enumerate(elevated_ids)],
            "doc_id long, _rank int",
        )
    hits = results
    if excluded_ids:
        hits = hits.filter(~F.col("doc_id").isin([int(d) for d in excluded_ids]))
    # hits filtered to the pinned ids FIRST (isin pushdown) so the
    # outer join is tiny x tiny; an outer join can't broadcast its
    # preserved side, so never preserve the corpus-sized frame here
    pinned_hits = hits.filter(
        F.col("doc_id").isin([int(d) for d in elevated_ids])
    ) if elevated_ids else hits.limit(0)
    pinned = elev.join(pinned_hits, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("score").cast("double"), F.lit(0.0)).alias("score"),
        "_rank",
    )
    organic = hits.join(F.broadcast(elev), "doc_id", "left_anti").select(
        "doc_id",
        F.col("score").cast("double").alias("score"),
        F.lit(None).cast("int").alias("_rank"),
    )
    return (
        pinned.unionByName(organic)
        .orderBy(
            F.coalesce(F.col("_rank"), F.lit(2**31 - 1)).asc(),
            F.col("score").desc(),
            F.col("doc_id").asc(),
        )
        .limit(k)
        .select(
            "doc_id", "score", F.col("_rank").isNotNull().alias("elevated")
        )
    )
