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


def sessionize(
    stream: DataFrame,
    gap_seconds: int = 300,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Custom stateful operator: gap-based sessionization per user via
    ``applyInPandasWithState`` — the Structured-Streaming shape for
    operators the built-ins can't express (Solr's closest analog is the
    stateful DaemonStream loop; event-time session state exceeds it).

    Emits one row per CLOSED session: (user_id, session_start,
    session_end, n_events, sum_value).  State per user = the open
    session; a new event more than ``gap_seconds`` after the session end
    closes it.  State expires via event-time timeout so idle users emit
    their last session instead of leaking state.
    """
    import datetime as _dt

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (
        "user_id long, session_start timestamp, session_end timestamp, "
        "n_events int, sum_value double"
    )
    state_schema = "start long, end long, n int, total double"

    def fn(key, pdfs, state: GroupState):
        (user,) = key
        closed = []
        if state.hasTimedOut:
            if state.exists:
                s, e, n, tot = state.get
                closed.append((user, s, e, n, tot))
                state.remove()
        else:
            rows = pd.concat(list(pdfs), ignore_index=True)
            rows = rows.sort_values(ts_col)
            ts_ms = (rows[ts_col].astype("int64") // 1_000_000).to_numpy()
            vals = rows[value_col].to_numpy()
            if state.exists:
                s, e, n, tot = state.get
            else:
                s = e = None
            gap_ms = gap_seconds * 1000
            for t, v in zip(ts_ms.tolist(), vals.tolist()):
                if s is None:
                    s, e, n, tot = t, t, 1, float(v)
                elif t - e > gap_ms:
                    closed.append((user, s, e, n, tot))
                    s, e, n, tot = t, t, 1, float(v)
                else:
                    e, n, tot = max(e, t), n + 1, tot + float(v)
            state.update((s, e, n, tot))
            state.setTimeoutTimestamp(e + gap_ms)
        if not closed:
            yield pd.DataFrame(
                {
                    "user_id": pd.Series([], dtype="int64"),
                    "session_start": pd.Series([], dtype="datetime64[ns]"),
                    "session_end": pd.Series([], dtype="datetime64[ns]"),
                    "n_events": pd.Series([], dtype="int32"),
                    "sum_value": pd.Series([], dtype="float64"),
                }
            )
            return
        yield pd.DataFrame(
            {
                "user_id": [c[0] for c in closed],
                "session_start": [
                    _dt.datetime.utcfromtimestamp(c[1] / 1000) for c in closed
                ],
                "session_end": [
                    _dt.datetime.utcfromtimestamp(c[2] / 1000) for c in closed
                ],
                "n_events": pd.Series([c[3] for c in closed], dtype="int32"),
                "sum_value": [c[4] for c in closed],
            }
        )

    src = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp")).withWatermark(
        ts_col, watermark
    )
    return src.groupBy(user_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
