"""SolrCloud hash-range routing + SPLITSHARD tests.

Reference: solr/solrj/.../CompositeIdRouter.java (ring partitioning),
solr/core/.../SplitShardCmd.java, SolrIndexSplitter.java.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from lucene_solr_spark.index.shards import (
    HashRange,
    collection_ranges,
    route,
    shard_report,
    split_shard,
)

_MIN, _MAX = -(1 << 31), (1 << 31) - 1


def _py_hash(doc_id: int) -> int:
    u = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16)
    return u - (1 << 32) if u >= (1 << 31) else u


def test_ranges_partition_the_ring():
    for n in (1, 2, 3, 4, 7, 16):
        rs = collection_ranges(n)
        assert rs[0].lo == _MIN and rs[-1].hi == _MAX
        for a, b in zip(rs, rs[1:]):
            assert b.lo == a.hi + 1  # contiguous, no gap/overlap


def test_split_remainder_widens_early_ranges():
    rs = HashRange(0, 9).split(3)
    assert [(r.lo, r.hi) for r in rs] == [(0, 3), (4, 6), (7, 9)]


def test_route_matches_pure_python(spark):
    df = spark.range(0, 50).withColumnRenamed("id", "doc_id")
    routed, ranges = route(df, 4)
    rows = routed.select("doc_id", "_rh", "shard").collect()
    assert len(rows) == 50
    for r in rows:
        h = _py_hash(r.doc_id)
        assert r._rh == h
        rng = ranges[r.shard]
        assert rng.lo <= h <= rng.hi


def test_split_touches_only_parent(spark):
    df = spark.range(0, 200).withColumnRenamed("id", "doc_id")
    routed, ranges = route(df, 4)
    before = {r.doc_id: r.shard for r in routed.collect()}
    split, new_ranges = split_shard(routed, ranges, "shard2", 2)
    after = {r.doc_id: r.shard for r in split.collect()}
    assert set(new_ranges) == {
        "shard1", "shard2_0", "shard2_1", "shard3", "shard4"
    }
    for d, s in before.items():
        if s == "shard2":
            assert after[d] in ("shard2_0", "shard2_1")
            rng = new_ranges[after[d]]
            assert rng.lo <= _py_hash(d) <= rng.hi
        else:
            assert after[d] == s  # untouched shard → untouched row
    # children cover exactly the parent's range
    assert new_ranges["shard2_0"].lo == ranges["shard2"].lo
    assert new_ranges["shard2_1"].hi == ranges["shard2"].hi


def test_shard_report_counts_partition_corpus(spark):
    df = spark.range(0, 300).withColumnRenamed("id", "doc_id")
    routed, ranges = route(df, 3)
    split, new_ranges = split_shard(routed, ranges, "shard1", 3)
    rep = shard_report(split, new_ranges).collect()
    assert sum(r.docs for r in rep) == 300
    los = [r.lo for r in rep]
    assert los == sorted(los)
    # report rows carry the ring metadata even for empty shards
    assert rep[0].lo == _MIN and rep[-1].hi == _MAX
