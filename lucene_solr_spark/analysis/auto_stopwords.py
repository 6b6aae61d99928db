"""QueryAutoStopWordAnalyzer — stop words derived from the index.

Reference: lucene/analysis/common/src/java/org/apache/lucene/analysis/
query/QueryAutoStopWordAnalyzer.java:47-120 — addStopWords collects
every term whose docFreq exceeds maxDocFreq (or numDocs *
maxPercentDocs, default 0.4) and filters them out of query-time
analysis for that field.

Spark-first: the stop set is a term_stats filter (already a partial
agg over postings), and the query-side filter is a broadcast
left-anti join or a driver-side set for bounded query strings —
docFreq never recomputed per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

DEFAULT_MAX_PERCENT_DOCS = 0.4  # QueryAutoStopWordAnalyzer.java:55


def auto_stopword_terms(
    term_stats: DataFrame,
    num_docs: int,
    max_percent_docs: float = DEFAULT_MAX_PERCENT_DOCS,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Terms with docFreq > threshold (addStopWords semantics)."""
    if max_doc_freq is None:
        max_doc_freq = int(num_docs * max_percent_docs)
    return term_stats.filter(F.col("df") > max_doc_freq).select(
        "term", "df"
    )


def filter_query_terms(
    terms: list[str], stop_terms: set[str]
) -> list[str]:
    """Query-time stop filtering (the analyzer wraps the field's
    chain with a StopFilter over the derived set)."""
    return [t for t in terms if t not in stop_terms]
