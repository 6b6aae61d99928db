"""Solr AnalyticsComponent: expression statistics over facet groups.

Reference: ``solr/contrib/analytics/src/java/org/apache/solr/
analytics/`` — AnalyticsParams.java (the stat + mapping-function
name tables), NumericStatsCollector.java:65 (stddev = sqrt(sos/n −
mean²), 0 when n ≤ 1), MedianCalculator.java:29-42 (average of the
two middle elements), PercentileCalculator.java:31-41 (exact element
at ``round(p·n − .5)``, no interpolation), and the expression/
mapping functions (AnalyticsParams NUMERIC_OPERATION_SET /
STRING_OPERATION_SET: const_num neg abs log add mult div pow,
const_str rev concat).

Spark shape: mapping expressions compile to Column trees (codegen,
no UDFs); the moment statistics (count missing sum sumofsquares
stddev mean unique min max) are ONE groupBy aggregation; the order
statistics (median, percentile) come from a row_number window over
the same grouping — one extra shuffle on the same keys, never a
collect.  At 100 TB each facet group streams through partial
aggregation; the rank pass is a sort within group partitions.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["parse_mapping", "analytics_stats", "AnalyticsExprError"]


class AnalyticsExprError(ValueError):
    """Malformed mapping expression."""


def _split_args(s: str) -> list[str]:
    out, depth, cur = [], 0, []
    for ch in s:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    last = "".join(cur).strip()
    if last:
        out.append(last)
    return out


def parse_mapping(expr: str) -> Column:
    """Compile a mapping-function expression to a Column.

    ``add(mult(qty, const_num(2)), neg(discount))`` — bare
    identifiers are field references; the function table is
    AnalyticsParams.java:89-110.
    """
    expr = expr.strip()
    if not expr:
        raise AnalyticsExprError("empty expression")
    if "(" in expr and expr.endswith(")"):
        name, _, rest = expr.partition("(")
        name = name.strip()
        args = _split_args(rest[:-1])
        if name == "const_num":
            return F.lit(float(args[0]))
        if name == "const_str":
            a = args[0]
            if len(a) >= 2 and a[0] in "'\"" and a[-1] == a[0]:
                a = a[1:-1]
            return F.lit(a)
        cols = [parse_mapping(a) for a in args]
        if name == "neg":
            return -cols[0]
        if name == "abs":
            return F.abs(cols[0])
        if name == "log":
            # LogDoubleFunction.java:41: log_base(a) = ln(a)/ln(base)
            # with func(a, b) = log(a)/log(b)
            return F.log(cols[0]) / F.log(cols[1])
        if name == "add":
            out = cols[0]
            for c in cols[1:]:
                out = out + c
            return out
        if name == "mult":
            out = cols[0]
            for c in cols[1:]:
                out = out * c
            return out
        if name == "div":
            return cols[0].cast("double") / cols[1]
        if name == "pow":
            return F.pow(cols[0], cols[1])
        if name == "rev":
            return F.reverse(cols[0])
        if name == "concat":
            return F.concat(*cols)
        raise AnalyticsExprError(f"unknown mapping function {name!r}")
    # literal number or field reference
    try:
        return F.lit(float(expr))
    except ValueError:
        return F.col(expr)


_MOMENT_STATS = {
    "count", "missing", "sum", "sumofsquares", "stddev", "mean",
    "unique", "min", "max",
}


def analytics_stats(
    df: DataFrame,
    expr: str | Column,
    stats: list[str],
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Compute AnalyticsComponent statistics of a mapping expression.

    ``stats`` entries are AnalyticsParams stat names; percentiles are
    spelled ``percentile_25`` (request syntax ``percentile(25, ex)``).
    With ``group_cols`` the stats compute per field-facet bucket
    (FieldFacetRequest); without, over the whole result set.
    """
    v = parse_mapping(expr) if isinstance(expr, str) else expr
    group_cols = group_cols or []
    work = df.select(*group_cols, v.cast("double").alias("_v"))

    aggs: list[Column] = []
    for s in stats:
        if s == "count":
            aggs.append(F.count("_v").alias("count"))
        elif s == "missing":
            aggs.append(
                F.sum(
                    F.when(F.col("_v").isNull(), 1).otherwise(0)
                ).alias("missing")
            )
        elif s == "sum":
            aggs.append(F.sum("_v").alias("sum"))
        elif s == "sumofsquares":
            aggs.append(
                F.sum(F.col("_v") * F.col("_v")).alias("sumofsquares")
            )
        elif s == "mean":
            aggs.append(F.avg("_v").alias("mean"))
        elif s == "stddev":
            # NumericStatsCollector.java:65 — population form from
            # running moments, 0 when n <= 1
            n = F.count("_v")
            sos = F.sum(F.col("_v") * F.col("_v"))
            mean = F.avg("_v")
            aggs.append(
                F.when(
                    n <= 1, F.lit(0.0)
                ).otherwise(
                    F.sqrt(sos / n - mean * mean)
                ).alias("stddev")
            )
        elif s == "unique":
            aggs.append(F.count_distinct(F.col("_v")).alias("unique"))
        elif s == "min":
            aggs.append(F.min("_v").alias("min"))
        elif s == "max":
            aggs.append(F.max("_v").alias("max"))
        elif s == "median" or s.startswith("percentile_"):
            continue  # order statistics, second pass below
        else:
            raise AnalyticsExprError(f"unknown statistic {s!r}")

    base = (
        work.groupBy(*group_cols).agg(*aggs)
        if aggs
        else work.groupBy(*group_cols).agg(F.count("_v").alias("_n0"))
    )

    order_stats = [
        s for s in stats if s == "median" or s.startswith("percentile_")
    ]
    if order_stats:
        part = (
            Window.partitionBy(*group_cols)
            if group_cols
            else Window.partitionBy(F.lit(1))
        )
        ranked = (
            work.filter(F.col("_v").isNotNull())
            .withColumn("_rn", F.row_number().over(part.orderBy("_v")))
            .withColumn("_n", F.count(F.lit(1)).over(part))
        )
        picks: list[Column] = []
        for s in order_stats:
            if s == "median":
                # MedianCalculator.java:29-42: size = n-1, first =
                # floor(.5*size), second = first+1 when size is odd
                size = F.col("_n") - 1
                first = F.floor(size / 2)
                second = F.when(
                    size % 2 == 1, first + 1
                ).otherwise(first)
                picks.append(
                    (
                        F.max(
                            F.when(F.col("_rn") == first + 1, F.col("_v"))
                        )
                        * 0.5
                        + F.max(
                            F.when(
                                F.col("_rn") == second + 1, F.col("_v")
                            )
                        )
                        * 0.5
                    ).alias("median")
                )
            else:
                p = float(s.split("_", 1)[1]) / 100.0
                # PercentileCalculator.java:38: round(p*n - .5)
                idx = F.round(F.lit(p) * F.col("_n") - 0.5, 0).cast(
                    "long"
                )
                picks.append(
                    F.max(
                        F.when(F.col("_rn") == idx + 1, F.col("_v"))
                    ).alias(s)
                )
        ranked_agg = ranked.groupBy(*group_cols).agg(*picks)
        base = (
            base.join(ranked_agg, group_cols, "left")
            if group_cols
            else base.crossJoin(ranked_agg)
        )

    drop = [c for c in base.columns if c == "_n0"]
    out = base.drop(*drop)
    return out.select(*group_cols, *[s for s in stats])
