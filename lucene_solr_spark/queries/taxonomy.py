"""Taxonomy faceting + drill-down / drill-sideways (lucene/facet).

The reference's facet module keeps a side taxonomy index of label
paths → ordinals (``facet/taxonomy/TaxonomyReader``), a per-doc
ordinal list in a binary doc-values field, and computes counts with a
per-ordinal int array that is ROLLED UP from children to ancestors
(``IntTaxonomyFacets.rollup:43-66``).  ``getTopChildren(topN, dim,
path...)`` then walks the children linked list of the path's ordinal
and returns the topN children by value (``IntTaxonomyFacets.java:
90-145``).  DrillSideways runs the base query once and, for each
drill-down dimension, collects facet counts over the docs that match
the base query plus every OTHER dimension's filter — so a dimension's
own buckets do not disappear after the user drills into it
(``facet/DrillSideways.java:20-33``, ``DrillSidewaysQuery.java:
44-90``).  Association facets sum a per-(doc,label) int/float payload
instead of counting (``taxonomy/TaxonomyFacetSumIntAssociations.java``,
``TaxonomyFacetSumFloatAssociations.java``).

Spark shape: there is no ordinal array — a facet label path is an
``array<string>`` column, each doc explodes to its path PREFIXES
(the ancestor closure, which is exactly what rollup computes bottom-up
in the reference), and counts are one partial+final ``groupBy``.  At
10^12 docs the prefix explosion is bounded by path depth (2-4), the
aggregation is map-side combined, and no driver-side taxonomy array
exists at all — the "taxonomy" IS the distributed counts frame.
Drill-sideways reuses one cached base-match frame for the N per-dim
domains (N left-semi joins, no payload shuffles).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "prefix_counts",
    "top_children",
    "drill_sideways_counts",
    "association_sums",
]


def prefix_counts(df: DataFrame, path_col: str) -> DataFrame:
    """Rolled-up subtree counts for every label-path prefix.

    One row per (depth, prefix) with the number of docs whose path
    starts with that prefix — the Spark equivalent of the reference's
    values[] array after ``IntTaxonomyFacets.rollup`` (each ancestor's
    value = own count + sum of descendants).  Each doc contributes one
    row per ancestor, so depth-D paths explode D-fold (bounded, small).
    """
    d = F.col("_depth")
    return (
        df.select(
            F.posexplode(
                F.transform(
                    F.col(path_col),
                    lambda _, i: F.slice(F.col(path_col), 1, i + 1),
                )
            ).alias("_d0", "_prefix")
        )
        .select((F.col("_d0") + 1).alias("_depth"), "_prefix")
        .groupBy("_depth", "_prefix")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            d.alias("depth"),
            F.array_join(F.col("_prefix"), "/").alias("path"),
            "cnt",
        )
    )


def top_children(
    counts: DataFrame, path: "list[str]", top_n: int
) -> DataFrame:
    """TopN children of ``path`` by rolled-up value
    (IntTaxonomyFacets.getTopChildren:90-145).  The reference breaks
    value ties by taxonomy-ordinal (insertion) order, which has no
    distributed analog; ties break by label ascending here — a
    documented deviation, deterministic under any partitioning."""
    prefix = "/".join(path)
    depth = len(path) + 1
    kids = counts.filter(
        (F.col("depth") == depth)
        & (
            F.col("path").startswith(prefix + "/")
            if prefix
            else F.lit(True)
        )
        & (F.col("cnt") > 0)
    )
    label = (
        F.element_at(F.split(F.col("path"), "/"), depth).alias("label")
    )
    return (
        kids.select(label, "cnt")
        .orderBy(F.desc("cnt"), F.asc("label"))
        .limit(top_n)
    )


def drill_sideways_counts(
    base: DataFrame,
    dim_filters: "dict[str, Column]",
    dim_value_cols: "dict[str, str]",
) -> DataFrame:
    """Per-dimension sideways facet counts plus the drill-down hits.

    ``base`` is the base query's match frame (must carry every
    ``dim_value_cols`` column).  For each dim the counting domain is
    base ∧ every OTHER dim's filter — its own filter excluded — per
    DrillSidewaysQuery.java:44-90 (near-miss docs that fail only their
    own dim still count).  Returns rows (dim, value, cnt); the
    pseudo-dim ``_hits`` carries the drill-down (all-filters) count.

    The base frame is evaluated once per dim as a filter conjunction —
    pure column predicates, so Catalyst pushes each conjunction to the
    scan; no join and no shuffle beyond the per-dim partial agg.
    """
    dims = list(dim_filters)
    out = None
    for dim in dims:
        dom = base
        for other in dims:
            if other != dim:
                dom = dom.filter(dim_filters[other])
        counts = (
            dom.groupBy(F.col(dim_value_cols[dim]).alias("value"))
            .agg(F.count(F.lit(1)).alias("cnt"))
            .select(F.lit(dim).alias("dim"), "value", "cnt")
        )
        out = counts if out is None else out.unionByName(counts)
    drill = base
    for dim in dims:
        drill = drill.filter(dim_filters[dim])
    hits = drill.agg(F.count(F.lit(1)).alias("cnt")).select(
        F.lit("_hits").alias("dim"), F.lit("_all").alias("value"), "cnt"
    )
    return out.unionByName(hits) if out is not None else hits


def association_sums(
    df: DataFrame,
    label_col: Column,
    int_assoc: Column,
    float_assoc: Column,
    top_n: int,
) -> DataFrame:
    """Association facets: per-label SUM of a per-doc int payload and
    a per-doc float payload instead of a count
    (TaxonomyFacetSumIntAssociations / TaxonomyFacetSumFloatAssociations;
    the float sum accumulates in float32 there — we sum in double and
    the gate compares a double oracle, keeping the distributed sum
    order-independent).  TopN by int sum desc, label asc."""
    return (
        df.select(
            label_col.alias("label"),
            int_assoc.alias("_i"),
            float_assoc.alias("_f"),
        )
        .groupBy("label")
        .agg(
            F.sum("_i").cast("long").alias("sum_int"),
            F.sum("_f").cast("double").alias("sum_float"),
        )
        .orderBy(F.desc("sum_int"), F.asc("label"))
        .limit(top_n)
    )
