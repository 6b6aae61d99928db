"""MinHash set-similarity matching as a query ({!min_hash} QParser).

Reference surfaces:
- solr/core/src/java/org/apache/solr/search/MinHashQParser.java
  (createParser → analyze the query text with the field's MinHash
  chain, emit one SHOULD clause per hash token, ``sim`` →
  minimum-number-should-match = ceil(sim · numTokens), score = count
  of matched constant-score clauses).
- lucene/analysis/common/src/java/org/apache/lucene/analysis/minhash/
  MinHashFilter.java:1 (shingle the token stream, hash each shingle,
  partition the hash space into ``bucketCount`` buckets and keep the
  MINIMUM hash per bucket — the doc's MinHash sketch).

Spark-first shape: the sketch is a column-expression pipeline (split →
shingle transform → md5-derived 56-bit hash → bucket modulo → min
partial-agg per (doc, bucket)); the query side hashes ONE short string
driver-side with hashlib and ships the literal sketch into an `isin`
broadcast — matching is a single semi-join-shaped aggregation on the
sketch table, never a scan of raw text.  At 100 TB the sketch table is
built once at index time (it is ~bucket_count rows per doc, orders of
magnitude smaller than postings) and bucket-partitioned so a probe
touches only colliding buckets.

Hash substitution (documented divergence): MinHashFilter hashes with
128-bit MurmurHash3; that is not reproducible inside DuckDB, so this
engine uses the repo-standard engine-reproducible md5-prefix hash
(first 14 hex chars → 56-bit non-negative int), the same scheme as
doc_fingerprint.  The LSH guarantees only need the hash family to be
uniform, not a specific function.
"""

from __future__ import annotations

import hashlib
import math
import re
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lucene_solr_spark.functions.dedup import _doc_shingles

DEFAULT_BUCKETS = 8
DEFAULT_SHINGLE_N = 3


@dataclass(frozen=True)
class MinHashQuery:
    """Parsed {!min_hash} query (executed by SolrQueryDispatcher.docs)."""

    text: str
    field: str = "text"
    sim: float = 0.0
    shingle_n: int = DEFAULT_SHINGLE_N
    bucket_count: int = DEFAULT_BUCKETS


def _md5long_col(col):
    """56-bit md5-prefix hash as a Spark column (matches _md5long_py)."""
    return F.conv(F.substring(F.md5(col), 1, 14), 16, 10).cast("long")


def _md5long_py(s: str) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:14], 16)


def minhash_sketch_table(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = DEFAULT_SHINGLE_N,
    bucket_count: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Per-doc MinHash sketch: (doc_id, bucket, mh) with mh = min
    md5-hash of the doc's word-``shingle_n``-grams landing in bucket
    (MinHashFilter.java's bucketCount-way min-hash sketch).

    One explode + partial+final min aggregation — the same
    codegen-friendly shape as minhash_signatures (dedup.py); docs with
    fewer than ``shingle_n`` tokens produce an empty sketch and can
    never match (MinHashFilter emits nothing for an empty stream).
    """
    sh = _doc_shingles(df, id_col, text_col, shingle_n).select(
        "doc_id", F.explode("shset").alias("s")
    )
    h = _md5long_col(F.col("s"))
    return (
        sh.select("doc_id", (h % bucket_count).alias("bucket"), h.alias("h"))
        .groupBy("doc_id", "bucket")
        .agg(F.min("h").alias("mh"))
    )


def query_sketch(
    text: str,
    shingle_n: int = DEFAULT_SHINGLE_N,
    bucket_count: int = DEFAULT_BUCKETS,
) -> dict[int, int]:
    """Driver-side sketch of one short query string — bucket → min hash.

    Token/shingle semantics mirror _doc_shingles exactly (lower, trim,
    split on whitespace runs, distinct word n-grams).
    """
    toks = re.split(" +", text.strip().lower()) if text.strip() else []
    out: dict[int, int] = {}
    seen: set[str] = set()
    for i in range(len(toks) - shingle_n + 1):
        s = " ".join(toks[i : i + shingle_n])
        if s in seen:
            continue
        seen.add(s)
        h = _md5long_py(s)
        b = h % bucket_count
        if b not in out or h < out[b]:
            out[b] = h
    return out


def minhash_match(
    doc_values: DataFrame,
    q: MinHashQuery,
    id_col: str = "doc_id",
) -> DataFrame:
    """Execute a MinHashQuery → DataFrame(doc_id, score).

    score = matched sketch entries / query sketch size (the fraction of
    the query's SHOULD clauses that hit — MinHashQParser's constant-
    score boolean sum, normalized by clause count so it estimates the
    Jaccard similarity).  ``sim`` drops docs below
    ceil(sim · |sketch|) matches (minimum-number-should-match,
    MinHashQParser.java createFingerPrintQuery).
    """
    sketch = query_sketch(q.text, q.shingle_n, q.bucket_count)
    if not sketch:
        return doc_values.sparkSession.createDataFrame(
            [], f"{id_col} long, score double"
        )
    qsize = len(sketch)
    required = max(1, math.ceil(q.sim * qsize))
    docs = minhash_sketch_table(
        doc_values, id_col, q.field, q.shingle_n, q.bucket_count
    )
    # the query sketch is a tiny literal set → per-pair predicate stays
    # inside codegen; matching rows aggregate to one count per doc
    cond = None
    for b, h in sketch.items():
        c = (F.col("bucket") == b) & (F.col("mh") == h)
        cond = c if cond is None else (cond | c)
    return (
        docs.filter(cond)
        .groupBy("doc_id")
        .agg(F.count("*").alias("_m"))
        .filter(F.col("_m") >= required)
        .select(
            "doc_id",
            (F.col("_m").cast("double") / F.lit(float(qsize))).alias("score"),
        )
    )
