"""Streaming surfaces.

The reference's "streaming" is two distinct things (SURVEY §2.7):

1. ``TopicStream`` / ``DaemonStream`` — incremental pull over a
   checkpointed version cursor (solr/solrj/.../io/stream/TopicStream.java:
   568 LoC checkpoints the max version id per shard and re-queries
   ``version > checkpoint``).  → ``topic.TopicCursor`` +
   ``topic.IncrementalIndexer`` (micro-batch over a monotonically
   versioned table, checkpoint persisted, segments appended per batch).

2. Sorted pull-based execution of TupleStreams — already covered by the
   DataFrame operators (§2.7 table).

Spark adds true event-time streaming the reference lacks; we expose the
Structured Streaming surface in ``structured`` (watermarked tumbling
windows = a streaming TimeSeriesStream).
"""

from lucene_solr_spark.streaming.topic import (  # noqa: F401
    IncrementalIndexer,
    TopicCursor,
)
from lucene_solr_spark.streaming.structured import (  # noqa: F401
    sessionize,
    stream_windowed_agg,
    streaming_invert,
)
