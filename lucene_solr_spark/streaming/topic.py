"""Incremental (TopicStream/DaemonStream-style) batch streaming.

Ref: solr/solrj/src/java/org/apache/solr/client/solrj/io/stream/
TopicStream.java — a topic persists per-shard version checkpoints into
a collection and each ``read()`` returns only tuples with
``_version_ > checkpoint``; DaemonStream.java wraps a stream in a
re-running daemon.

Spark-native restatement: the version column is any monotonically
increasing long (here: doc_id / event_id / a commit timestamp); the
checkpoint is a JSON file (the collection analog); each ``poll()`` is
one micro-batch DataFrame.  ``IncrementalIndexer`` composes this with
the segmented writer: every batch becomes fresh segments appended to
the same index directory + manifest — i.e. near-real-time indexing the
way Lucene does it (new small segments per refresh, merged later by the
tiered policy)."""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class TopicCursor:
    """Checkpointed incremental reader over a versioned table."""

    def __init__(
        self,
        spark: SparkSession,
        table_path: str,
        version_col: str,
        checkpoint_path: str,
    ) -> None:
        self.spark = spark
        self.table_path = table_path
        self.version_col = version_col
        self.checkpoint_path = checkpoint_path

    def _read_ckpt(self) -> int:
        if os.path.exists(self.checkpoint_path):
            with open(self.checkpoint_path) as f:
                return int(json.load(f)["version"])
        return -1

    def _write_ckpt(self, version: int) -> None:
        tmp = self.checkpoint_path + ".tmp"
        os.makedirs(os.path.dirname(self.checkpoint_path) or ".", exist_ok=True)
        with open(tmp, "w") as f:
            json.dump({"version": int(version)}, f)
        os.replace(tmp, self.checkpoint_path)

    def poll(self) -> tuple[DataFrame, int | None]:
        """New rows since the checkpoint + the batch's max version.

        Commit by calling :meth:`commit` with that max version AFTER the
        batch's effects are durable (the at-least-once contract of
        TopicStream)."""
        since = self._read_ckpt()
        df = self.spark.read.parquet(self.table_path).filter(
            F.col(self.version_col) > since
        )
        mx = df.agg(F.max(self.version_col)).collect()[0][0]
        return df, (int(mx) if mx is not None else None)

    def commit(self, version: int | None) -> None:
        if version is not None:
            self._write_ckpt(version)


class IncrementalIndexer:
    """Near-real-time segmented indexing over a TopicCursor.

    Each processed batch appends new segments (ids continue after the
    current manifest maximum); resume safety comes from committing the
    cursor only after the segment manifests land."""

    def __init__(
        self,
        cursor: TopicCursor,
        index,  # SegmentedIndex
        id_col: str = "doc_id",
        text_col: str = "content",
        segments_per_batch: int = 4,
    ) -> None:
        self.cursor = cursor
        self.index = index
        self.id_col = id_col
        self.text_col = text_col
        self.segments_per_batch = segments_per_batch

    def process_once(self) -> int:
        """One micro-batch: index new docs, commit cursor.  Returns the
        number of docs indexed."""
        batch, version = self.cursor.poll()
        if version is None:
            return 0
        man = self.index.manifest()
        base = (max(man) + 1) if man else 0
        n = batch.count()
        if n == 0:
            self.cursor.commit(version)
            return 0
        # shift segment ids past existing ones: build into a disjoint
        # id space so append never collides (docIDs stay globally unique
        # because the version column is monotone).
        sub = batch.select(
            F.col(self.id_col).alias("doc_id"),
            F.col(self.text_col).alias("content"),
        )
        nseg = self.segments_per_batch
        lo = sub.agg(F.min("doc_id"), F.max("doc_id")).collect()[0]
        span = int(lo[1]) - int(lo[0]) + 1
        seg_size = max(1, -(-span // nseg))
        keyed = sub.withColumn(
            "segment",
            (
                F.lit(base)
                + F.floor((F.col("doc_id") - F.lit(int(lo[0]))) / F.lit(seg_size))
            ).cast("int"),
        )
        new_segs = list(range(base, base + min(nseg, span)))
        self.index.write_encoded(keyed, expected_segments=new_segs)
        self.cursor.commit(version)
        return int(n)
