"""Structured Streaming surface.

The reference has no watermarks/event-time windows (SURVEY §2.7 —
Solr's TimeSeriesStream gives tumbling calendar buckets over a batch
query only).  On Spark we get them natively; these helpers pin the
idioms used by the engine:

- ``stream_windowed_agg``: watermarked tumbling-window aggregation —
  the streaming TimeSeriesStream (io/stream/TimeSeriesStream.java:381)
  with late-data handling the reference cannot express.
- ``streaming_invert``: the index write path (tokenize → invert) applied
  to a stream; mapInPandas works identically on streaming DataFrames, so
  the same kernel that builds batch segments feeds a writeStream sink —
  DaemonStream's "continuous indexing" with exactly-once file sinks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lucene_solr_spark.index.builder import invert


def stream_windowed_agg(
    stream: DataFrame,
    ts_col: str = "ts",
    window: str = "1 day",
    watermark: str = "1 hour",
    value_col: str = "value",
) -> DataFrame:
    """Tumbling event-time window counts/sums with a watermark.

    TIMESTAMP_NTZ event-time columns are cast to TIMESTAMP (watermarks
    require it; session timezone is UTC so wall values are preserved).
    """
    stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("win"))
        .agg(F.count("*").alias("cnt"), F.sum(value_col).alias("sum_value"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "cnt",
            "sum_value",
        )
    )


def streaming_invert(
    stream: DataFrame, id_col: str = "doc_id", text_col: str = "content"
) -> DataFrame:
    """Streaming postings: the batch invert kernel on a readStream DF."""
    return invert(stream, id_col=id_col, text_col=text_col)
