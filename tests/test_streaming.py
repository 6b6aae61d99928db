"""Streaming surfaces: topic cursor, incremental indexing, structured
streaming windowed agg + streaming invert."""

from __future__ import annotations

import os

import numpy as np

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.index.builder import build_tables
from lucene_solr_spark.index.segments import SegmentedIndex
from lucene_solr_spark.streaming import (
    IncrementalIndexer,
    TopicCursor,
    stream_windowed_agg,
    streaming_invert,
)

SF = "/root/testdata/sf0.001"


def test_topic_cursor_incremental(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt.json")
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    docs.filter(F.col("doc_id") < 200).write.mode("overwrite").parquet(src)
    cur = TopicCursor(spark, src, "doc_id", ckpt)
    batch, v = cur.poll()
    assert batch.count() == 200 and v == 199
    cur.commit(v)
    # no new data -> empty poll
    batch, v = cur.poll()
    assert batch.count() == 0 and v is None
    # append more rows -> only the delta comes back
    docs.filter((F.col("doc_id") >= 200) & (F.col("doc_id") < 350)).write.mode(
        "append"
    ).parquet(src)
    batch, v = cur.poll()
    assert batch.count() == 150 and v == 349


def test_incremental_indexer_matches_full_build(spark, tmp_path):
    src = str(tmp_path / "src")
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", F.col("text").alias("content")
    )
    docs.filter(F.col("doc_id") < 300).write.mode("overwrite").parquet(src)
    idx = SegmentedIndex(spark, str(tmp_path / "idx"))
    cur = TopicCursor(spark, src, "doc_id", str(tmp_path / "ck.json"))
    indexer = IncrementalIndexer(cur, idx, segments_per_batch=3)
    assert indexer.process_once() == 300
    docs.filter(F.col("doc_id") >= 300).write.mode("append").parquet(src)
    assert indexer.process_once() == 200
    assert indexer.process_once() == 0
    # the incrementally built index == the one-shot DataFrame index
    t = build_tables(docs, id_col="doc_id", text_col="content", cache=False)
    expect = {
        r["term"]: (r["df"], r["ttf"]) for r in t.term_stats.collect()
    }
    got = {r["term"]: (r["df"], r["ttf"]) for r in idx.term_stats().collect()}
    assert got == expect
    assert idx.check_index()["problems"] == []


def test_stream_windowed_agg_matches_batch(spark, tmp_path):
    events = spark.read.parquet(f"{SF}/events.parquet")
    src = str(tmp_path / "events")
    events.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    agg = stream_windowed_agg(stream, "ts", "1 day", "1 hour", "value")
    out = str(tmp_path / "out")
    q = (
        agg.writeStream.format("memory")
        .queryName("win_agg")
        .outputMode("complete")
        .option("checkpointLocation", out)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["window_start"]: (r["cnt"], round(r["sum_value"], 6))
        for r in spark.sql("SELECT * FROM win_agg").collect()
    }
    expect = {
        r["day"]: (r["cnt"], round(r["sum_value"], 6))
        for r in events.groupBy(
            F.date_trunc("day", F.col("ts")).alias("day")
        )
        .agg(F.count("*").alias("cnt"), F.sum("value").alias("sum_value"))
        .collect()
    }
    assert got == expect


def test_streaming_invert_matches_batch(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", F.col("text").alias("content")
    )
    src = str(tmp_path / "docs")
    docs.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(docs.schema).parquet(src)
    postings = streaming_invert(stream, "doc_id", "content")
    q = (
        postings.writeStream.format("memory")
        .queryName("stream_postings")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT term, doc_id, tf FROM stream_postings"
    ).toPandas().sort_values(["term", "doc_id"]).reset_index(drop=True)
    from lucene_solr_spark.index.builder import invert

    expect = (
        invert(docs, "doc_id", "content")
        .select("term", "doc_id", "tf")
        .toPandas()
        .sort_values(["term", "doc_id"])
        .reset_index(drop=True)
    )
    assert got.equals(expect.astype(got.dtypes.to_dict()))


def test_sessionize_stateful(spark, tmp_path):
    """applyInPandasWithState gap sessionization: closed sessions match
    a batch-computed gap segmentation."""
    import pandas as pd

    from lucene_solr_spark.streaming import sessionize

    events = spark.read.parquet(f"{SF}/events.parquet").filter(
        F.col("user_id") < 20
    )
    src = str(tmp_path / "ev")
    events.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    sess = sessionize(stream, gap_seconds=3600, watermark="0 seconds")
    q = (
        sess.writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql(
        "SELECT user_id, count(*) AS n FROM sessions GROUP BY user_id"
    ).collect()
    got_counts = {r["user_id"]: r["n"] for r in got}
    # batch truth: per user, sessions = 1 + #gaps>3600s between sorted events;
    # the stream's LAST (still-open) session only closes via timeout, so
    # closed-session count per user is sessions or sessions-1
    pdf = events.select("user_id", "ts").toPandas()
    for user, g in pdf.groupby("user_id"):
        ts = g["ts"].sort_values().astype("int64").to_numpy() // 1_000_000_000
        n_sessions = 1 + int((np.diff(ts) > 3600).sum())
        closed = got_counts.get(user, 0)
        assert n_sessions - 1 <= closed <= n_sessions, (user, closed, n_sessions)
    assert sum(got_counts.values()) > 0
