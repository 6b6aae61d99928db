"""JSON facet domain changes: tagged filters + excludeTags.

Multi-select faceting (solr/core/src/java/org/apache/solr/search/facet/
FacetRequest.java:86-99 — FacetContext re-computes the domain DocSet
with the named tagged filters excluded): every faceted UI applies the
user's own selection as a tagged fq and facets each field over the
domain that EXCLUDES its own tag, so the other buckets of a selected
field stay visible with correct counts.

Spark shape: the domain is the conjunction of the main query's match
set with every non-excluded filter (left-semi joins — no payload
shuffles); the facet itself is the usual groupBy over the domain
joined to the doc-values table.  At 10^12 docs each filter DocSet is a
distributed frame, never a collected bitset.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def facet_domain(
    searcher,
    doc_values: DataFrame,
    query,
    tagged_filters: "dict[str, Column]",
    exclude_tags: "tuple[str, ...] | list[str]" = (),
) -> DataFrame:
    """The facet's domain DocSet: main query matches, intersected with
    every tagged doc-values filter whose tag is NOT excluded."""
    dom = searcher._match(query).select("doc_id")
    for tag, pred in tagged_filters.items():
        if tag in exclude_tags:
            continue
        dom = dom.join(
            doc_values.filter(pred).select("doc_id"), "doc_id", "left_semi"
        )
    return dom


def to_parent_domain(
    domain: DataFrame,
    doc_values: DataFrame,
    parents: DataFrame,
    root_field: str = "_root_",
) -> DataFrame:
    """JSON facet ``domain: {blockParent: "<allParents>"}`` —
    FacetRequest.java:86-99 domain changes: map a child-doc domain to
    the set of their block parents.  ``parents`` is the all-parents
    DocSet (doc_id); blocks are keyed by the ``root_field`` doc-values
    column (Solr's ``_root_``).  One narrow shuffle on root."""
    roots = (
        domain.join(
            doc_values.select("doc_id", root_field), "doc_id"
        )
        .select(F.col(root_field).alias("doc_id"))
        .distinct()
    )
    return roots.join(parents, "doc_id", "left_semi")


def to_children_domain(
    domain: DataFrame,
    doc_values: DataFrame,
    parents: DataFrame,
    root_field: str = "_root_",
) -> DataFrame:
    """JSON facet ``domain: {blockChildren: "<allParents>"}`` — expand a
    parent-doc domain to its (non-parent) block children."""
    dom_roots = (
        domain.join(parents, "doc_id", "left_semi")
        .select(F.col("doc_id").alias("_r"))
    )
    children = doc_values.select(
        "doc_id", F.col(root_field).alias("_root")
    ).join(parents, "doc_id", "left_anti")
    return (
        children.join(
            dom_roots, children["_root"] == dom_roots["_r"], "left_semi"
        )
        .select("doc_id")
    )


def facet_field_over(
    domain: DataFrame,
    doc_values: DataFrame,
    field: str,
    top_n: int = 10,
) -> DataFrame:
    """Field facet over an explicit (already domain-changed) DocSet."""
    return (
        doc_values.join(domain, "doc_id", "left_semi")
        .groupBy(F.col(field).alias("bucket"))
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("bucket").asc())
        .limit(top_n)
    )


def facet_field_params(
    doc_values: DataFrame,
    field: str,
    domain: DataFrame | None = None,
    prefix: str | None = None,
    mincount: int = 1,
    missing: bool = False,
    sort: str = "count",
    offset: int = 0,
    limit: int = 10,
) -> DataFrame:
    """Field facet with the full SimpleFacets parameter set
    (SimpleFacets.java getTermCounts / getFacetTermEnumCounts):
    facet.prefix restricts the term enum to values with that prefix
    (a dictionary range seek in the reference — here a sargable
    StartsWith the scan can push down), facet.mincount floors bucket
    counts, facet.sort=count|index, facet.offset/facet.limit page the
    bucket list, and facet.missing appends the null-value bucket
    count as a trailing row (FacetComponent appends it after the
    ordered list regardless of sort).

    One partial+final aggregation regardless of parameters — prefix
    and domain reduce rows BEFORE the shuffle."""
    df = doc_values
    if domain is not None:
        df = df.join(domain.select("doc_id"), "doc_id", "left_semi")
    col = F.col(field)
    vals = df.filter(col.isNotNull())
    if prefix is not None:
        vals = vals.filter(col.startswith(prefix))
    buckets = (
        vals.groupBy(col.alias("bucket"))
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= mincount)
    )
    order = (
        [F.col("bucket").asc()]
        if sort == "index"
        else [F.col("cnt").desc(), F.col("bucket").asc()]
    )
    buckets = buckets.orderBy(*order)
    if offset:
        # facet.offset: skip the first N buckets of the ordered list.
        # Both takes are TakeOrderedAndProject (per-partition top-k +
        # k-row merge, never a global sort); the first `offset` buckets
        # are then anti-joined out of the top offset+limit.  Bucket
        # values are unique (they come out of the groupBy) and the
        # ordering is total (count desc, bucket asc), so the anti-join
        # is exact — and everything after the takes is k-row-sized.
        # (The previous version ranked the FULL bucket list —
        # field-cardinality-sized — through an unpartitioned window on
        # a single task.)
        head = buckets.limit(offset).select("bucket")
        buckets = (
            buckets.limit(offset + limit)
            .join(F.broadcast(head), "bucket", "left_anti")
            .orderBy(*order)
        )
    buckets = buckets.limit(limit)
    if missing:
        spark = doc_values.sparkSession
        miss = df.filter(col.isNull()).agg(
            F.lit(None).cast(df.schema[field].dataType).alias("bucket"),
            F.count("*").alias("cnt"),
        )
        buckets = buckets.unionByName(miss)
    return buckets


def compute_ranges(
    start: float,
    end: float,
    gap: float,
    hardend: bool = False,
    include: frozenset | set = frozenset({"lower"}),
    others: frozenset | set = frozenset(),
) -> "list[tuple[str, float | None, float | None, bool, bool]]":
    """The reference's RangeFacetRequest.computeRanges bucket list
    (handler/component/RangeFacetRequest.java:557-645), verbatim
    semantics: walk [start, end) by gap; without facet.range.hardend
    the END EXTENDS to the last bucket's upper edge, with it the last
    bucket is clipped; facet.range.include ∈ {lower, upper, edge,
    outer, all} sets per-bucket boundary openness (EDGE applies lower
    only to the first bucket and upper only to the last); the
    before/after/between "other" buckets get the complementary
    openness so outer+inner never double- or zero-count a boundary
    value unless the user's include flags themselves overlap.

    Returns (name, lower, upper, include_lower, include_upper) rows;
    None bounds are unbounded.  Pure driver-side metadata — bucket
    count is (end-start)/gap, never data-dependent."""
    if end < start:
        raise ValueError(f"range facet 'end' comes before 'start': {end} < {start}")
    if gap <= 0:
        raise ValueError("range facet infinite loop (gap must be positive)")
    inc = {s.lower() for s in include}
    if "all" in inc:
        inc |= {"lower", "upper", "edge", "outer"}
    oth = {s.lower() for s in others}
    if "all" in oth:
        oth |= {"before", "after", "between"}
    ranges: list[tuple[str, float | None, float | None, bool, bool]] = []
    low = float(start)
    end = float(end)
    while low < end:
        high = low + gap
        if end < high:
            if hardend:
                high = end
            else:
                end = high
        include_lower = "lower" in inc or ("edge" in inc and low == start)
        include_upper = "upper" in inc or ("edge" in inc and high == end)
        ranges.append((_fmt_edge(low), low, high, include_lower, include_upper))
        low = high
    if "none" not in oth:
        if "before" in oth:
            # upper bound open unless outer, or the first gap bucket
            # doesn't already claim the start boundary
            ranges.append((
                "before", None, float(start), False,
                "outer" in inc or not ("lower" in inc or "edge" in inc),
            ))
        if "after" in oth:
            ranges.append((
                "after", end, None,
                "outer" in inc or not ("upper" in inc or "edge" in inc), False,
            ))
        if "between" in oth:
            ranges.append((
                "between", float(start), end,
                "lower" in inc or "edge" in inc, "upper" in inc or "edge" in inc,
            ))
    return ranges


def _fmt_edge(v: float) -> str:
    return str(int(v)) if float(v).is_integer() else repr(v)


def range_facet_params(
    doc_values: DataFrame,
    field: str,
    start: float,
    end: float,
    gap: float,
    hardend: bool = False,
    include: frozenset | set = frozenset({"lower"}),
    others: frozenset | set = frozenset(),
    domain: DataFrame | None = None,
) -> DataFrame:
    """facet.range with the full parameter surface (RangeFacetProcessor
    .java:100-260 over the computeRanges bucket list): every bucket —
    gap buckets plus before/after/between — is an independent
    conditional count, so overlapping boundaries behave exactly like
    the reference (include=lower,upper double-counts interior edges;
    Solr documents that).  ONE partial+final aggregation produces all
    buckets (a single wide agg row, stacked back to rows) — no
    per-bucket scan, no shuffle of raw rows, so the plan is a single
    exchange of one row at any corpus size."""
    df = doc_values
    if domain is not None:
        df = df.join(domain.select("doc_id"), "doc_id", "left_semi")
    v = F.col(field)
    ranges = compute_ranges(start, end, gap, hardend, include, others)
    sums = []
    for i, (_name, lo, hi, inc_lo, inc_hi) in enumerate(ranges):
        cond = v.isNotNull()
        if lo is not None:
            cond = cond & (v >= lo if inc_lo else v > lo)
        if hi is not None:
            cond = cond & (v <= hi if inc_hi else v < hi)
        sums.append(F.sum(F.when(cond, 1).otherwise(0)).alias(f"_c{i}"))
    wide = df.agg(*sums)
    stack_args = ", ".join(
        f"'{name}', _c{i}" for i, (name, *_rest) in enumerate(ranges)
    )
    return wide.selectExpr(
        f"stack({len(ranges)}, {stack_args}) as (bucket, cnt)"
    )


def heatmap_facet(
    doc_values: DataFrame,
    lat_col: str,
    lon_col: str,
    min_lat: float,
    max_lat: float,
    min_lon: float,
    max_lon: float,
    rows: int,
    cols: int,
    domain: DataFrame | None = None,
) -> DataFrame:
    """facet.heatmap — 2D spatial grid counts (solr/handler/component/
    SpatialHeatmapFacets.java over lucene/spatial-extras
    HeatmapFacetCounter.java): bucket every in-box point into a
    rows×cols grid and count per cell.  Row 0 is the min_lat edge,
    col 0 the min_lon edge; points on the max edges clamp into the
    last cell.  One groupBy on the (row,col) composite — the same
    partial+final agg at 10^12 points; empty cells are simply absent
    rows (the reference's counts_ints2D zero-rows compress the same
    way)."""
    df = doc_values
    if domain is not None:
        df = df.join(domain.select("doc_id"), "doc_id", "left_semi")
    lat, lon = F.col(lat_col), F.col(lon_col)
    cell_h = (max_lat - min_lat) / rows
    cell_w = (max_lon - min_lon) / cols
    in_box = (
        (lat >= min_lat) & (lat <= max_lat)
        & (lon >= min_lon) & (lon <= max_lon)
    )
    row = F.least(
        F.floor((lat - min_lat) / cell_h), F.lit(rows - 1)
    ).cast("int")
    col = F.least(
        F.floor((lon - min_lon) / cell_w), F.lit(cols - 1)
    ).cast("int")
    return (
        df.filter(in_box)
        .groupBy(row.alias("row"), col.alias("col"))
        .agg(F.count("*").alias("cnt"))
        .orderBy("row", "col")
    )


def facet_field(
    searcher,
    doc_values: DataFrame,
    query,
    field: str,
    tagged_filters: "dict[str, Column] | None" = None,
    exclude_tags: "tuple[str, ...] | list[str]" = (),
    top_n: int = 10,
) -> DataFrame:
    """Field facet over a (possibly excludeTags-reduced) domain —
    buckets ordered count DESC then value ASC, the facet.sort=count
    default of SimpleFacets."""
    dom = facet_domain(
        searcher, doc_values, query, tagged_filters or {}, exclude_tags
    )
    return (
        doc_values.join(dom, "doc_id", "left_semi")
        .groupBy(F.col(field).alias("bucket"))
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("bucket").asc())
        .limit(top_n)
    )
