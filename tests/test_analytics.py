"""AnalyticsComponent stats + mapping expressions
(solr/contrib/analytics)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.functions.analytics import (
    AnalyticsExprError,
    analytics_stats,
    parse_mapping,
)


@pytest.fixture(scope="module")
def df(spark):
    rows = [
        ("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0),
        ("b", 10.0), ("b", 20.0), ("b", 20.0),
        ("c", 7.0),
    ]
    return spark.createDataFrame(rows, "g: string, v: double")


def test_mapping_functions(spark):
    d = spark.createDataFrame([(4.0, 2.0, "xy")], "a: double, b: double, s: string")
    row = d.select(
        parse_mapping("add(a, b, const_num(1))").alias("c0"),
        parse_mapping("mult(a, b)").alias("c1"),
        parse_mapping("div(a, b)").alias("c2"),
        parse_mapping("pow(a, b)").alias("c3"),
        parse_mapping("neg(a)").alias("c4"),
        parse_mapping("abs(neg(a))").alias("c5"),
        parse_mapping("log(a, b)").alias("c6"),  # ln(a)/ln(b)
        parse_mapping("rev(s)").alias("c7"),
        parse_mapping("concat(s, const_str('z'))").alias("c8"),
    ).collect()[0]
    assert list(row[:6]) == [7.0, 8.0, 2.0, 16.0, -4.0, 4.0]
    assert row[6] == pytest.approx(2.0)  # log_2(4)
    assert row[7] == "yx" and row[8] == "xyz"
    with pytest.raises(AnalyticsExprError):
        parse_mapping("nope(a)")


def test_moment_stats(df):
    out = {
        r["g"]: r
        for r in analytics_stats(
            df, "v",
            ["count", "sum", "sumofsquares", "stddev", "mean",
             "unique", "min", "max"],
            ["g"],
        ).collect()
    }
    a = out["a"]
    assert a["count"] == 4 and a["sum"] == 10.0
    assert a["sumofsquares"] == 30.0 and a["mean"] == 2.5
    # NumericStatsCollector.java:65 population form
    assert a["stddev"] == pytest.approx(math.sqrt(30.0 / 4 - 2.5 ** 2))
    assert out["b"]["unique"] == 2
    # n == 1 -> stddev 0 by spec
    assert out["c"]["stddev"] == 0.0
    assert out["c"]["min"] == 7.0 and out["c"]["max"] == 7.0


def test_median_even_and_odd(df):
    out = {
        r["g"]: r["median"]
        for r in analytics_stats(df, "v", ["median"], ["g"]).collect()
    }
    # MedianCalculator: even count averages the two middles
    assert out["a"] == 2.5
    assert out["b"] == 20.0
    assert out["c"] == 7.0


def test_percentile_exact_index(df):
    # PercentileCalculator.java:38: idx = round(p*n - .5)
    out = {
        r["g"]: (r["percentile_25"], r["percentile_75"])
        for r in analytics_stats(
            df, "v", ["percentile_25", "percentile_75"], ["g"]
        ).collect()
    }
    # g=a n=4: p25 idx round(0.5)=1 -> 2.0; p75 idx round(2.5)=3 -> 4.0
    assert out["a"] == (2.0, 4.0)
    # g=b n=3: p25 idx round(0.25)=0 -> 10.0; p75 idx round(1.75)=2 -> 20.0
    assert out["b"] == (10.0, 20.0)


def test_global_stats_no_groups(df):
    r = analytics_stats(df, "v", ["count", "median", "max"]).collect()
    assert len(r) == 1
    assert r[0]["count"] == 8 and r[0]["max"] == 20.0


def test_missing_counts_nulls(spark):
    d = spark.createDataFrame(
        [("a", 1.0), ("a", None), ("a", 3.0)], "g: string, v: double"
    )
    r = analytics_stats(d, "v", ["count", "missing"], ["g"]).collect()[0]
    assert r["count"] == 2 and r["missing"] == 1


def test_expression_stat_composition(df):
    # stats over a mapping expression, not a raw field
    r = analytics_stats(
        df, "mult(v, const_num(2))", ["sum"], ["g"]
    ).collect()
    assert {x["g"]: x["sum"] for x in r}["a"] == 20.0
