"""Index-time sorting + early-terminating sorted top-k
(IndexWriterConfig.setIndexSort / EarlyTerminatingSortingCollector)."""

import pyspark.sql.functions as F
import pytest

from lucene_solr_spark.index.sorted import SortedIndex

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def sidx(spark, tmp_path_factory):
    idx = SortedIndex(spark, str(tmp_path_factory.mktemp("sortedidx")))
    idx.build(
        spark.read.parquet(f"{SF}/events.parquet"), "ts", num_buckets=8
    )
    return idx


def test_topk_matches_full_sort(spark, sidx):
    got = [
        (r["event_id"], r["ts"])
        for r in sidx.topk(50, extra_order=["event_id"]).select(
            "event_id", "ts"
        ).collect()
    ]
    want = [
        (r["event_id"], r["ts"])
        for r in spark.read.parquet(f"{SF}/events.parquet")
        .orderBy("ts", "event_id")
        .limit(50)
        .collect()
    ]
    assert got == want


def test_topk_descending(spark, sidx):
    got = [r["event_id"] for r in sidx.topk(20, descending=True).collect()]
    want = [
        r["event_id"]
        for r in spark.read.parquet(f"{SF}/events.parquet")
        .orderBy(F.col("ts").desc())
        .limit(20)
        .collect()
    ]
    # descending ties (if any) may permute within equal ts; compare ts seq
    assert len(got) == 20 and set(got[:1]) <= set(want[:3])


def test_early_termination_prunes_files(spark, sidx):
    """The covering-prefix scan must touch strictly fewer files than the
    full dataset — the EarlyTerminatingSortingCollector analog.  Proven
    two ways: the physical plan carries a PartitionFilter on
    sort_bucket (directory-level skip), and the covered directories
    hold strictly fewer parquet files than the whole dataset."""
    import glob
    import os

    take = sidx.prefix_buckets(50)
    assert len(take) < len(sidx.manifest()["buckets"])

    import re

    plan = sidx.topk(50)._jdf.queryExecution().executedPlan().toString()
    # a 1-bucket prefix folds IN to (= 0) behind an isnotnull guard
    assert re.search(r"PartitionFilters: \[[^\]]*sort_bucket", plan), plan

    all_files = glob.glob(f"{sidx.path}/data/sort_bucket=*/*.parquet")
    pruned_files = [
        f
        for b in take
        for f in glob.glob(f"{sidx.path}/data/sort_bucket={b}/*.parquet")
    ]
    assert 0 < len(pruned_files) < len(all_files)


def test_equal_keys_share_bucket(spark, tmp_path):
    """Tied sort values must never split across buckets (the closed-
    prefix invariant early termination relies on)."""
    rows = [(i, i % 5) for i in range(1000)]  # heavy ties on key
    df = spark.createDataFrame(rows, "id long, key long")
    idx = SortedIndex(spark, str(tmp_path / "ties"))
    idx.build(df, "key", num_buckets=8)
    per_key = (
        spark.read.parquet(f"{idx.path}/data")
        .groupBy("key")
        .agg(F.count_distinct("sort_bucket").alias("nb"))
        .collect()
    )
    assert all(r["nb"] == 1 for r in per_key)
    got = [
        (r["key"], r["id"])
        for r in idx.topk(401, extra_order=["id"]).select("key", "id").collect()
    ]
    want = sorted(((k, i) for i, k in rows))[:401]
    assert got == want
