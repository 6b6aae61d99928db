"""ValueSource function-query parser + function semantics
(solr search/ValueSourceParser.java, lucene queries/function/)."""

import math

import pytest

from lucene_solr_spark.functions.valuesource import parse_function_query


def _one(spark, expr_text, df=None, **cols):
    import pyspark.sql.functions as F

    d = spark.createDataFrame([tuple(cols.values())], list(cols.keys()))
    col = parse_function_query(expr_text, d if df is None else df)
    return d.select(col.alias("v")).collect()[0]["v"]


def test_arithmetic_tree(spark):
    assert _one(spark, "sum(2, product(3, x))", x=4) == 14.0
    assert _one(spark, "recip(x, 1, 1000, 1000)", x=0) == 1.0
    assert _one(spark, "linear(x, 2, 5)", x=10) == 25.0
    assert _one(spark, "max(x, 7)", x=3) == 7.0
    assert _one(spark, "map(x, 0, 5, 99)", x=3) == 99.0
    assert _one(spark, "map(x, 0, 5, 99)", x=9) == 9


def test_if_exists_not(spark):
    assert _one(spark, "if(exists(x), 1, 0)", x="a") == 1.0
    assert _one(spark, "not(0)") == True  # noqa: E712


def test_dist_functions(spark):
    assert _one(spark, "sqedist(x, y, 0, 0)", x=3, y=4) == 25.0
    assert _one(spark, "dist(2, x, y, 0, 0)", x=3, y=4) == pytest.approx(5.0)
    assert _one(spark, "dist(1, x, y, 0, 0)", x=3, y=4) == pytest.approx(7.0)


def test_geodist_known_pair(spark):
    # New York (40.7128, -74.0060) → London (51.5074, -0.1278) ≈ 5570 km
    got = _one(
        spark, "geodist(lat, lon, 51.5074, -0.1278)", lat=40.7128, lon=-74.0060
    )
    assert got == pytest.approx(5570, abs=10)
    # zero distance
    assert _one(spark, "geodist(lat, lon, 1.5, 2.5)", lat=1.5, lon=2.5) == 0.0


def test_strdist(spark):
    got = _one(spark, 'strdist(s, "kitten")', s="sitting")
    assert got == pytest.approx(1 - 3 / 7)
    assert _one(spark, 'strdist(s, "abc")', s="abc") == 1.0


def test_scale_uses_global_minmax(spark):
    d = spark.createDataFrame([(0,), (5,), (10,)], ["x"])
    col = parse_function_query("scale(x, 0, 1)", d)
    vals = sorted(r["v"] for r in d.select(col.alias("v")).collect())
    assert vals == [0.0, 0.5, 1.0]


def test_parse_errors(spark):
    with pytest.raises(ValueError):
        parse_function_query("nosuchfn(1)")
    with pytest.raises(ValueError):
        parse_function_query("sum(1, 2")
    with pytest.raises(ValueError):
        parse_function_query("sum(1) trailing")
