"""DiversifiedTopDocsCollector — top-k with a per-key result cap.

Reference: lucene/misc/src/java/org/apache/lucene/search/
DiversifiedTopDocsCollector.java:1-220 — a one-pass TopDocsCollector
that keeps at most ``maxHitsPerKey`` hits per key (e.g. per retailer in
a marketplace search) in the global top-``numHits``: a new hit first
competes inside its key's queue (the key's lowest-scored entry is
evicted once the key is full, :150-190) and then inside the global
priority queue.  The net selection is exactly "greedy by descending
score, skipping docs whose key already holds maxHitsPerKey better
hits": a doc whose per-key score-rank exceeds the cap can never be
collected (its key fills with strictly better docs first), and every
doc within its key's cap survives iff it makes the global top-k of the
cap-filtered set.

Spark-first restatement of that closed form: one window ranking per
key (row_number over score order, partitioned by key) → filter rank ≤
cap → global ``ORDER BY score LIMIT k`` (TakeOrderedAndProject).  Two
bounded shuffles, no collector state; the per-key window is the only
key-wide state and it partitions by the diversity key, so skew equals
key popularity — the same bound as the reference's per-key queue.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def diversified_topk(
    scored: DataFrame,
    keys: DataFrame,
    k: int,
    max_hits_per_key: int,
    key_col: str = "key",
) -> DataFrame:
    """Top-k of ``scored(doc_id, score)`` with ≤ ``max_hits_per_key``
    hits per ``keys(doc_id, <key_col>)`` value.

    Docs missing a key row are treated like the reference's
    ``getKeys`` miss (NumericDocValues absent → key 0 bucket): they
    form their own shared ``null`` key group.  Ordering is the
    HitQueue total order (score DESC, doc_id ASC) at both stages, so
    the result is deterministic under ties.
    """
    j = scored.join(keys.select("doc_id", key_col), "doc_id", "left")
    w = Window.partitionBy(key_col).orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        j.withColumn("_kr", F.row_number().over(w))
        .filter(F.col("_kr") <= int(max_hits_per_key))
        .drop("_kr")
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(int(k))
    )
