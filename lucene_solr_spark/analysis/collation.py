"""Locale-correct collation — ICUCollationKeyAnalyzer / ICUCollationField
re-expressed on Spark's native ICU collation support.

Reference: lucene/analysis/icu/src/java/org/apache/lucene/collation/
ICUCollationKeyAnalyzer.java (emits one binary collation key per field
value so index-time Sort and TermRangeQuery compare locale-correctly)
and Solr's ICUCollationField (schema/ICUCollationField.java — sort +
range queries over those keys).

Spark-first restatement: Spark ≥ 4.0 ships ICU CLDR collations inside
Catalyst (``F.collate`` / ``COLLATE`` in SQL), so the binary key never
needs materializing — an ORDER BY or range predicate on the collated
column IS the locale-correct comparison, executed by Tungsten's sort
and whole-stage-codegen comparators.  At scale the collated sort is
the ordinary distributed range-partitioned exchange; nothing here adds
a UDF or a shuffle beyond the sort itself.  DuckDB carries the same
ICU collations, which is what lets the driver gate hash-check these
orderings cross-engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def collate(col: Column | str, locale: str) -> Column:
    """The collation-key analog: a comparison-ready collated column
    (ICUCollationKeyAnalyzer's key, without materializing bytes)."""
    if not hasattr(F, "collate"):  # pragma: no cover — Spark < 4.0
        raise RuntimeError(
            "ICU collation needs Spark 4.0+ (pyspark.sql.functions."
            "collate and Catalyst's native ICU collations are absent "
            "in 3.x)"
        )
    c = F.col(col) if isinstance(col, str) else col
    return F.collate(c, locale)


def collation_sort(
    df: DataFrame, col: str, locale: str, ascending: bool = True
) -> DataFrame:
    """Locale-correct ORDER BY (ICUCollationField sort): ties under the
    collation break by the binary value so the order is total."""
    key = collate(col, locale)
    keys = [key.asc() if ascending else key.desc(), F.col(col).asc()]
    return df.orderBy(*keys)


def collation_range(
    df: DataFrame, col: str, lo: str | None, hi: str | None, locale: str
) -> DataFrame:
    """Locale-correct inclusive range filter — TermRangeQuery over
    collation keys (ICUCollationField.getRangeQuery).  Under 'de',
    'Äpfel' falls inside ['Apfel', 'arg'] even though its code points
    do not."""
    c = collate(col, locale)
    out = df
    if lo is not None:
        out = out.filter(c >= F.collate(F.lit(lo), locale))
    if hi is not None:
        out = out.filter(c <= F.collate(F.lit(hi), locale))
    return out


def collation_rank_topk(
    df: DataFrame, col: str, locale: str, k: int
) -> DataFrame:
    """First k DISTINCT values in collation order with their 1-based
    rank — the sorted terms-dictionary view an ICUCollationField index
    exposes.  Take-ordered first (per-partition top-k + k-row merge,
    no global sort), then rank the k-row frame by counting
    sort-predecessors in a broadcast self-join — no unpartitioned
    window anywhere."""
    vals = df.select(col).filter(F.col(col).isNotNull()).distinct()
    key = collate(col, locale)
    top = vals.orderBy(key.asc(), F.col(col).asc()).limit(k)
    a = top.alias("a")
    b = F.broadcast(top.select(F.col(col).alias("_w")).alias("b"))
    ka = F.collate(F.col(f"a.{col}"), locale)
    kb = F.collate(F.col("_w"), locale)
    before = (kb < ka) | ((kb == ka) & (F.col("_w") < F.col(f"a.{col}")))
    return (
        a.join(b, before, "left")
        .groupBy(f"a.{col}")
        .agg((F.count("_w") + 1).cast("int").alias("rank"))
        .select("rank", col)
    )
