"""JSON Facet API request interpreter — nested bucket facets.

Ref: solr/core/src/java/org/apache/solr/search/facet/FacetModule.java
(request parsing), FacetField.java / FacetFieldProcessor*.java (terms
buckets: sort/limit/mincount, per-bucket sub-accumulators),
FacetRange.java, FacetQuery.java, and the agg parsers in
solr/search/facet/*Agg.java.  A request is a dict mirroring the
reference's ``json.facet`` body::

    {"type": "terms", "field": "lang", "limit": 3,
     "sort": "count desc", "mincount": 1,
     "facet": {
         "avg_chars": "avg(n_chars)",                 # stat facet
         "by_src": {"type": "terms", "field": "source",
                    "limit": 2, "facet": {...}},       # subfacet
     }}

Spark shape — the part that matters at 10^12 docs: the whole nested
tree is computed with ONE groupBy per facet LEVEL over the composite
key (ancestor buckets + this field), never a per-bucket loop; the
reference's per-bucket sub-accumulator collection
(FacetFieldProcessorByArray) is a sequential-scan detail of its
single-node executor, not of the semantics.  Per-bucket limit/sort is
a row_number window partitioned by the ancestor key.  The flattened
output (one row per leaf bucket, ancestor values as columns) is the
relational rendering of the reference's nested bucket JSON.

Only one bucket-PRODUCING subfacet per level (stat facets unlimited):
two sibling bucket subfacets would cross-product in a flat frame;
issue two requests instead — same contract a SQL rollup has.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_STAT = re.compile(r"\s*(\w+)\s*\((.*)\)\s*")


def _stat_col(expr: str) -> Column:
    """One aggregation column from a JSON-facet stat string —
    the *Agg.java vocabulary (SumAgg, AvgAgg, MinMaxAgg, UniqueAgg,
    HLLAgg, PercentileAgg, StddevAgg, VarianceAgg, SumsqAgg,
    MissingAgg, CountValsAgg)."""
    m = _STAT.fullmatch(expr)
    if not m:
        raise ValueError(f"bad stat facet {expr!r}")
    fn, arg = m.group(1).lower(), m.group(2).strip()
    if fn == "sum":
        return F.sum(arg)
    if fn == "avg":
        return F.avg(arg)
    if fn == "min":
        return F.min(arg)
    if fn == "max":
        return F.max(arg)
    if fn == "unique":
        return F.countDistinct(arg)
    if fn == "hll":
        return F.approx_count_distinct(arg)
    if fn == "sumsq":
        c = F.col(arg).cast("double")
        return F.sum(c * c)
    if fn == "stddev":  # sample stddev — StddevAgg.java
        return F.stddev_samp(arg)
    if fn == "variance":  # sample variance — VarianceAgg.java
        return F.var_samp(arg)
    if fn == "missing":
        return F.sum(F.when(F.col(arg).isNull(), 1).otherwise(0))
    if fn == "countvals":
        return F.count(arg)
    if fn == "percentile":
        field, _, pcts = arg.partition(",")
        p = float(pcts.strip() or "50") / 100.0
        return F.expr(f"percentile({field.strip()}, {p})")
    raise ValueError(f"unknown stat facet function {fn!r}")


def _sort_key(sort: str, stats: dict) -> tuple[str, bool]:
    """'count desc' | 'index asc' | '<statKey> desc' →
    (column, ascending).  FacetField.java sort parsing."""
    parts = (sort or "count desc").split()
    key = parts[0]
    asc = len(parts) > 1 and parts[1].lower() == "asc"
    if key == "index":
        return "val", asc if len(parts) > 1 else True
    if key != "count" and key not in stats:
        raise ValueError(f"sort references unknown stat {key!r}")
    return ("count" if key == "count" else key), asc


def _bucket_expr(req: dict) -> Column:
    """The bucket-value column for one facet node."""
    ftype = req.get("type", "terms")
    if ftype == "terms":
        return F.col(req["field"])
    if ftype == "range":
        f = F.col(req["field"]).cast("double")
        start, gap = float(req["start"]), float(req["gap"])
        end = float(req["end"])
        # FacetRange.java: buckets [start, end) in gap steps; out-of-
        # range rows drop (no other/include options here)
        return F.when(
            (f >= start) & (f < end),
            F.lit(start) + F.floor((f - start) / gap) * gap,
        )
    raise ValueError(f"unknown bucket facet type {ftype!r}")


def json_facet(
    doc_values: DataFrame,
    req: dict,
    domain: DataFrame | None = None,
) -> DataFrame:
    """Evaluate one JSON facet request over ``doc_values`` (doc_id +
    field columns), optionally restricted to a ``domain`` DocSet.
    Returns the flattened bucket frame: ancestor bucket values as
    leading columns, then this level's ``val``/``count``/stat columns,
    ordered by the request's sort at every level."""
    df = doc_values
    if domain is not None:
        df = df.join(domain.select("doc_id"), "doc_id", "left_semi")
    return _facet(df, req, parent_cols=[], prefix="")


def _facet(
    df: DataFrame, req: dict, parent_cols: list[str], prefix: str
) -> DataFrame:
    ftype = req.get("type", "terms")
    val_col = f"{prefix}val"
    cnt_col = f"{prefix}count"

    if ftype == "query":
        # FacetQuery.java: a single bucket — the filter's count + stats
        q = req["q"]
        sub = df.filter(q if isinstance(q, Column) else F.expr(q))
        aggs = [F.count("*").alias(cnt_col)]
        stats = {
            k: v
            for k, v in (req.get("facet") or {}).items()
            if isinstance(v, str)
        }
        for k, s in stats.items():
            aggs.append(_stat_col(s).alias(f"{prefix}{k}"))
        if parent_cols:
            return sub.groupBy(*parent_cols).agg(*aggs)
        return sub.agg(*aggs)

    subreqs = req.get("facet") or {}
    stats = {k: v for k, v in subreqs.items() if isinstance(v, str)}
    children = {k: v for k, v in subreqs.items() if isinstance(v, dict)}
    if len(children) > 1:
        raise ValueError(
            "one bucket subfacet per level in the flattened frame; "
            f"got {sorted(children)}"
        )

    keyed = df.withColumn(val_col, _bucket_expr(req)).filter(
        F.col(val_col).isNotNull()
    )
    aggs = [F.count("*").alias(cnt_col)] + [
        _stat_col(s).alias(f"{prefix}{k}") for k, s in stats.items()
    ]
    buckets = keyed.groupBy(*parent_cols, val_col).agg(*aggs)

    mincount = int(req.get("mincount", 1))
    if mincount > 1:
        buckets = buckets.filter(F.col(cnt_col) >= mincount)

    sort_key, asc = _sort_key(req.get("sort", "count desc"), stats)
    sort_col = (
        F.col(val_col)
        if sort_key == "val"
        else F.col(f"{prefix}{sort_key}" if sort_key != "count" else cnt_col)
    )
    order = [
        sort_col.asc() if asc else sort_col.desc(),
        F.col(val_col).asc(),  # index tie-break, FacetFieldProcessor
    ]
    limit = int(req.get("limit", 10))
    if limit >= 0:
        if parent_cols:
            w = Window.partitionBy(*parent_cols).orderBy(*order)
            buckets = (
                buckets.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") <= limit)
                .drop("_rn")
            )
        else:
            buckets = buckets.orderBy(*order).limit(limit)

    for key, sub in children.items():
        child_src = keyed.join(
            buckets.select(*parent_cols, val_col),
            parent_cols + [val_col],
            "left_semi",
        )
        child = _facet(
            child_src, sub, parent_cols + [val_col], prefix=f"{key}_"
        )
        buckets = buckets.join(child, parent_cols + [val_col], "left")

    return buckets.orderBy(*(parent_cols + [val_col]))
