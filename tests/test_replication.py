"""Master/replica segment replication + snapshot/restore
(ReplicationHandler.java / IndexFetcher.java semantics)."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.index.replication import (
    fetch_index,
    restore,
    snapshot,
)
from lucene_solr_spark.index.segments import SegmentedIndex


@pytest.fixture()
def master(spark, tmp_path):
    corpus = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select(F.col("doc_id"), F.col("text").alias("content"))
    idx = SegmentedIndex(spark, str(tmp_path / "master"))
    idx.build(corpus, num_segments=6)
    return idx


def _postings_pdf(idx):
    return (
        idx.postings()
        .select("segment", "term", "base_docid", "count")
        .orderBy("segment", "term", "base_docid")
        .toPandas()
    )


def test_fresh_sync_fetches_everything(spark, master, tmp_path):
    rep = SegmentedIndex(spark, str(tmp_path / "replica"))
    r = fetch_index(master, rep)
    assert sorted(r["fetched"]) == sorted(master.manifest())
    assert r["skipped"] == [] and r["deleted"] == []
    assert r["bytes_fetched"] > 0
    assert _postings_pdf(rep).equals(_postings_pdf(master))
    assert {s: i.__dict__ for s, i in rep.manifest().items()} == {
        s: i.__dict__ for s, i in master.manifest().items()
    }


def test_second_sync_is_noop_and_merge_is_incremental(spark, master, tmp_path):
    rep = SegmentedIndex(spark, str(tmp_path / "replica"))
    fetch_index(master, rep)
    r2 = fetch_index(master, rep)
    assert r2["fetched"] == [] and r2["bytes_fetched"] == 0
    assert sorted(r2["skipped"]) == sorted(master.manifest())

    # merge two segments on the master → only the new segment ships,
    # the two retired ones are deleted on the replica
    before = sorted(master.manifest())
    master.merge([0, 1], new_segment=100)
    r3 = fetch_index(master, rep)
    assert r3["fetched"] == [100]
    assert r3["deleted"] == [0, 1]
    assert sorted(r3["skipped"]) == [s for s in before if s not in (0, 1)]
    assert _postings_pdf(rep).equals(_postings_pdf(master))


def test_truncated_segment_refetches(spark, master, tmp_path):
    """A size-mismatched local segment must re-fetch even when its
    manifest row looks current (IndexFetcher's size comparison)."""
    rep = SegmentedIndex(spark, str(tmp_path / "replica"))
    fetch_index(master, rep)
    seg_dir = os.path.join(rep.path, "data", "segment=2")
    victim = next(
        os.path.join(seg_dir, f)
        for f in os.listdir(seg_dir)
        if f.endswith(".parquet")
    )
    with open(victim, "r+b") as f:
        f.truncate(os.path.getsize(victim) // 2)
    r = fetch_index(master, rep)
    assert r["fetched"] == [2]
    assert _postings_pdf(rep).equals(_postings_pdf(master))


def test_snapshot_restore_roundtrip(spark, master, tmp_path):
    snap = str(tmp_path / "snap")
    s = snapshot(master, snap)
    assert sorted(s["segments"]) == sorted(master.manifest())
    # mutate the master after the snapshot — the snapshot must not move
    master.merge([0, 1], new_segment=100)
    target = SegmentedIndex(spark, str(tmp_path / "restored"))
    restore(snap, target)
    assert sorted(target.manifest()) == sorted(s["segments"])
    assert 100 not in target.manifest()


def test_partial_sync_resumes(spark, master, tmp_path):
    """A replica killed mid-sync (data copied, manifest row missing)
    re-fetches exactly the unmanifested segment."""
    rep = SegmentedIndex(spark, str(tmp_path / "replica"))
    fetch_index(master, rep)
    rep._drop_manifest(3)
    r = fetch_index(master, rep)
    assert r["fetched"] == [3]
    assert _postings_pdf(rep).equals(_postings_pdf(master))
