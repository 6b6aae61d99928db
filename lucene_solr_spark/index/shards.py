"""SolrCloud hash-range doc routing + SPLITSHARD.

Reference surfaces:
- solr/solrj/src/java/org/apache/solr/common/cloud/CompositeIdRouter.java
  (hash the route key onto the signed 32-bit ring; a collection's
  shards partition the ring into contiguous [min, max] ranges;
  ``partitionRange`` splits a range into N equal sub-ranges).
- solr/core/src/java/org/apache/solr/cloud/api/collections/
  SplitShardCmd.java (SPLITSHARD: compute sub-ranges, partition the
  parent shard's docs into them, parent retires when children are
  active).
- solr/core/src/java/org/apache/solr/update/SolrIndexSplitter.java
  (the doc-at-a-time partitioning of the parent index by route hash).

Spark-first shape: routing is ONE hash expression — `repartition` by
the shard column gives the cluster layout, and a split is a metadata
change (new range table) plus a partition-local re-bucketing of one
shard's rows; no other shard's data moves.  At 100 TB that locality is
the whole point of SPLITSHARD: the reshard touches 1/num_shards of the
corpus, while a naive re-route of the whole ring would shuffle
everything.

Hash substitution (documented divergence): CompositeIdRouter hashes
with MurmurHash3 x86-32; that is not reproducible inside DuckDB, so
this engine uses the repo-standard md5-prefix hash (first 8 hex chars
→ unsigned 32-bit, recentred onto the signed ring).  Range semantics
— contiguous signed-ring intervals, equal partitioning with the
leftover spread over the first ranges — follow the reference.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_RING = 1 << 32
_MIN = -(1 << 31)
_MAX = (1 << 31) - 1


@dataclass(frozen=True)
class HashRange:
    """Closed interval on the signed 32-bit ring (Router.Range)."""

    lo: int
    hi: int

    def split(self, parts: int = 2) -> "list[HashRange]":
        """partitionRange: equal sub-ranges; remainder widens the early
        ones by 1 (CompositeIdRouter.partitionRange's integer split)."""
        span = self.hi - self.lo + 1
        base, extra = divmod(span, parts)
        out, lo = [], self.lo
        for i in range(parts):
            width = base + (1 if i < extra else 0)
            out.append(HashRange(lo, lo + width - 1))
            lo += width
        return out


def collection_ranges(num_shards: int) -> list[HashRange]:
    """The default collection layout: num_shards equal ranges covering
    the whole ring (CompositeIdRouter.partitionRange over [MIN, MAX])."""
    return HashRange(_MIN, _MAX).split(num_shards)


def route_hash(id_col) -> F.Column:
    """Signed 32-bit route hash of the doc id (md5-32 stand-in for
    CompositeIdRouter's murmur3; engine-reproducible in DuckDB via
    CAST(concat('0x', substr(md5(CAST(id AS VARCHAR)), 1, 8)) AS
    BIGINT) with the same recentring)."""
    u32 = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
    ).cast("long")
    return F.when(u32 >= (1 << 31), u32 - _RING).otherwise(u32)


def _range_expr(ranges: dict[str, HashRange]) -> F.Column:
    """shard-name column from a route-hash column `_rh` (one chained
    conditional — ranges are disjoint so order doesn't matter)."""
    expr = F.lit(None).cast("string")
    for name, r in ranges.items():
        expr = F.when(
            (F.col("_rh") >= r.lo) & (F.col("_rh") <= r.hi), F.lit(name)
        ).otherwise(expr)
    return expr


def route(
    df: DataFrame, num_shards: int, id_col: str = "doc_id"
) -> tuple[DataFrame, dict[str, HashRange]]:
    """Assign every doc its shard (shard1..shardN ring layout).

    Returns (df + [_rh, shard], {shard_name: HashRange}).  At scale the
    caller follows with `.repartition("shard")` (or writes
    partitionBy("shard")) — the routing itself is one scan, no shuffle.
    """
    ranges = {
        f"shard{i + 1}": r
        for i, r in enumerate(collection_ranges(num_shards))
    }
    out = df.withColumn("_rh", route_hash(id_col)).withColumn(
        "shard", _range_expr(ranges)
    )
    return out, ranges


def split_shard(
    routed: DataFrame,
    ranges: dict[str, HashRange],
    shard: str,
    parts: int = 2,
) -> tuple[DataFrame, dict[str, HashRange]]:
    """SPLITSHARD: replace ``shard`` with ``parts`` children covering
    its sub-ranges (shardN_0, shardN_1, …), re-routing ONLY that
    shard's rows (SplitShardCmd + SolrIndexSplitter).

    The returned frame re-evaluates the shard column only where
    shard == parent — every other row's assignment (and partition, at
    scale) is untouched.
    """
    if shard not in ranges:
        raise ValueError(f"unknown shard {shard!r}")
    children = {
        f"{shard}_{i}": r for i, r in enumerate(ranges[shard].split(parts))
    }
    new_ranges = {k: v for k, v in ranges.items() if k != shard}
    new_ranges.update(children)
    child_expr = F.lit(None).cast("string")
    for name, r in children.items():
        child_expr = F.when(
            (F.col("_rh") >= r.lo) & (F.col("_rh") <= r.hi), F.lit(name)
        ).otherwise(child_expr)
    out = routed.withColumn(
        "shard",
        F.when(F.col("shard") == shard, child_expr).otherwise(
            F.col("shard")
        ),
    )
    return out, new_ranges


def shard_report(
    routed: DataFrame, ranges: dict[str, HashRange]
) -> DataFrame:
    """Per-shard manifest row: (shard, lo, hi, docs) — the CLUSTERSTATUS
    view the split is verified against (counts partition the corpus)."""
    spark = routed.sparkSession
    meta = spark.createDataFrame(
        [(k, v.lo, v.hi) for k, v in ranges.items()],
        "shard string, lo long, hi long",
    )
    counts = routed.groupBy("shard").agg(F.count("*").alias("docs"))
    return (
        meta.join(counts, "shard", "left")
        .withColumn("docs", F.coalesce(F.col("docs"), F.lit(0)))
        .orderBy("lo")
    )
