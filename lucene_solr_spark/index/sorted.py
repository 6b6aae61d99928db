"""Index-time sorting with early-terminating sorted top-k.

Reference semantics: ``IndexWriterConfig.setIndexSort(Sort)``
(lucene/core/src/java/org/apache/lucene/index/IndexWriterConfig.java:
setIndexSort) stores each segment's docs in sort-field order, and
``EarlyTerminatingSortingCollector`` (lucene/core/src/java/org/apache/
lucene/search/EarlyTerminatingSortingCollector.java:1-120) stops
collecting after ``numDocsToCollect`` per segment when the query sort
is a prefix of the index sort — the collector never visits the tail.

Spark-first restatement: "sorted segment" = Parquet partitioned by a
VALUE-RANGE bucket of the sort field (equal values never split across
buckets, so bucket order IS value order), with per-bucket (min, max,
count) recorded in a manifest.  "Early termination" = reading only the
shortest bucket prefix whose cumulative count covers k — Catalyst
partition pruning turns the bucket filter into a directory skip, so a
``ORDER BY key LIMIT k`` touches O(k/bucket_size) of the data instead
of all of it.  At 100 TB that is the difference between one partition
directory and a full-table TakeOrderedAndProject scan.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class SortedIndex:
    """Directory layout:

    ``<dir>/data/sort_bucket=<id>/*.parquet``  rows, value-range bucketed
    ``<dir>/manifest.json``                    sort col + per-bucket stats
    """

    def __init__(self, spark: SparkSession, path: str) -> None:
        self.spark = spark
        self.path = path

    # --------------------------------------------------------------- build
    def build(
        self,
        df: DataFrame,
        sort_col: str,
        num_buckets: int = 32,
    ) -> dict:
        """Write ``df`` range-bucketed by ``sort_col``.

        Bucket id = number of boundary values strictly below the row's
        sort value, so rows with EQUAL sort values ALWAYS share a bucket
        regardless of boundary placement — the invariant that makes a
        bucket prefix a closed set under the (sort_col, ...) total order
        (ntile would split ties and break early termination on tied
        keys).  Boundaries come from percentile_approx (one JVM-side
        partial+final agg, no driver-sized state); boundary quality only
        affects bucket balance, never the answer.
        """
        dtype = dict(df.dtypes)[sort_col]

        def as_double(c):
            # ANSI mode forbids timestamp→double casts; go through the
            # epoch microsecond count (order-preserving, exact)
            if dtype.startswith("timestamp"):
                # unix_micros needs TIMESTAMP (not _NTZ); normalize first
                return F.unix_micros(c.cast("timestamp")).cast("double")
            if dtype == "date":
                return F.datediff(c, F.lit("1970-01-01")).cast("double")
            return c.cast("double")

        probe = df.select(as_double(F.col(sort_col)).alias("_kd"))
        b = max(1, num_buckets)
        pcts = [i / b for i in range(1, b)]
        row = probe.agg(
            F.percentile_approx("_kd", pcts, 10_000).alias("p")
        ).collect()[0]
        raw = [v for v in (row["p"] or []) if v is not None]
        bounds = sorted(set(raw))

        key_d = as_double(F.col(sort_col))
        bucket = F.lit(0)
        for v in bounds:
            bucket = bucket + (key_d > F.lit(float(v))).cast("int")
        out = df.withColumn("sort_bucket", bucket)
        (
            out.repartition("sort_bucket")
            .sortWithinPartitions(sort_col)  # row-group stats monotone
            .write.mode("overwrite")
            .partitionBy("sort_bucket")
            .parquet(os.path.join(self.path, "data"))
        )
        stats = (
            self.spark.read.parquet(os.path.join(self.path, "data"))
            .groupBy("sort_bucket")
            .agg(
                F.count("*").alias("count"),
                F.min(sort_col).alias("min"),
                F.max(sort_col).alias("max"),
            )
            .collect()
        )
        man = {
            "sort_col": sort_col,
            "buckets": sorted(
                (
                    {
                        "bucket": int(r["sort_bucket"]),
                        "count": int(r["count"]),
                        "min": str(r["min"]),
                        "max": str(r["max"]),
                    }
                    for r in stats
                ),
                key=lambda d: d["bucket"],
            ),
        }
        tmp = os.path.join(self.path, ".manifest.tmp")
        with open(tmp, "w") as f:
            json.dump(man, f)
        os.replace(tmp, os.path.join(self.path, "manifest.json"))
        return man

    # -------------------------------------------------------------- search
    def manifest(self) -> dict:
        with open(os.path.join(self.path, "manifest.json")) as f:
            return json.load(f)

    def prefix_buckets(self, k: int, descending: bool = False) -> list[int]:
        """Shortest bucket prefix (in value order) covering k rows —
        EarlyTerminatingSortingCollector's numDocsToCollect cutoff."""
        buckets = self.manifest()["buckets"]
        if descending:
            buckets = list(reversed(buckets))
        need, take = k, []
        for binfo in buckets:
            take.append(binfo["bucket"])
            need -= binfo["count"]
            if need <= 0:
                break
        return take

    def topk(
        self,
        k: int,
        descending: bool = False,
        extra_order: list[str] | None = None,
    ) -> DataFrame:
        """Top-k by the index sort, reading ONLY the covering bucket
        prefix (partition pruning on sort_bucket; check
        ``.inputFiles()`` — the pruned scan lists just those
        directories)."""
        sort_col = self.manifest()["sort_col"]
        take = self.prefix_buckets(k, descending=descending)
        df = self.spark.read.parquet(os.path.join(self.path, "data")).filter(
            F.col("sort_bucket").isin(take)
        )
        key = F.col(sort_col).desc() if descending else F.col(sort_col).asc()
        order = [key] + [F.col(c).asc() for c in (extra_order or [])]
        return df.drop("sort_bucket").orderBy(*order).limit(k)
