"""Lucene JS expression compiler (lucene/expressions/js/
JavascriptCompiler.java, grammar Javascript.g4)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.functions.jsexpr import (
    JSExprError,
    compile_expression,
    expression_rescore,
)


@pytest.fixture(scope="module")
def row(spark):
    df = spark.createDataFrame([(2.0, 3.0, 10.0)], ["a", "b", "_score"])
    bindings = {
        "a": F.col("a"),
        "b": F.col("b"),
        "_score": F.col("_score"),
    }

    def ev(*sources):
        r = df.select(
            *[
                compile_expression(s, bindings).alias(f"c{i}")
                for i, s in enumerate(sources)
            ]
        ).collect()[0]
        return r[0] if len(sources) == 1 else list(r)

    return ev


def test_precedence_and_arith(row):
    assert row("1 + 2*3 - 4/2") == 5.0
    assert row("(a + b) * 2") == 10.0
    assert row("2 + 3 * 4 % 5") == 4.0  # JLS: % binds like *
    assert row("-a % 3") == -2.0  # Java remainder keeps dividend sign


def test_literals(row):
    # hex and legacy octal (Javascript.g4 HEX/OCTAL rules)
    assert row("0x1F + 010") == 39.0
    assert row("1e2 + .5") == 100.5


def test_ternary_boolean_comparison(row):
    assert row("a < b ? 100 : 200") == 100.0
    assert row("1 ? 2 ? 3 : 4 : 5") == 3.0  # right-associative
    assert row("a == 2 && b == 3") == 1.0
    assert row("!(a == 2) || b == 4") == 0.0
    assert row("!0") == 1.0 and row("!42") == 0.0
    assert row("a >= 2") == 1.0 and row("a > 2") == 0.0


def test_bitwise_and_shifts(row):
    assert row("7 & 3 | 8 ^ 1") == 11.0
    assert row("1 << 3") == 8.0
    assert row("-16 >> 2") == -4.0
    # >>> is the unsigned long shift; count masked to 6 bits (JLS 15.19)
    assert row("-16 >>> 60") == 15.0
    assert row("1 << 64") == 1.0  # 64 & 63 == 0
    assert row("~5") == -6.0


def test_functions(row):
    assert row("max(a, b) + min(a, b)") == 5.0
    assert row("ln(exp(1))") == pytest.approx(1.0)
    assert row("logn(2, 8)") == pytest.approx(3.0)
    assert row("pow(a, b)") == 8.0
    assert row("sqrt(_score*_score)") == 10.0
    assert row("atan2(0, -1)") == pytest.approx(math.pi)
    assert row("acosh(1)") == 0.0
    assert row("haversin(40.7143528, -74.0059731, 40.759011, -73.9844722)") == pytest.approx(5.285, abs=0.05)


def test_java_division_semantics(row):
    # Java double division: x/0 -> +-Inf, 0/0 -> NaN (ANSI-safe guard)
    assert row("1/0") == float("inf")
    assert row("-1/0") == float("-inf")
    assert math.isnan(row("0/0"))
    assert math.isnan(row("5 % 0"))


def test_parse_errors(row):
    for bad in ("1 +", "foo(1)", "unbound", "1 2", "(1"):
        with pytest.raises(JSExprError):
            row(bad)


def test_expression_rescore_sorts_by_expression(spark):
    main = spark.createDataFrame(
        [(0, 5.0), (1, 4.0), (2, 3.0), (3, 2.0)], ["doc_id", "score"]
    )
    features = spark.createDataFrame(
        [(0, 1.0), (1, 10.0), (2, 100.0)], ["doc_id", "boostf"]
    )
    out = expression_rescore(
        main, features, "_score + ln(boostf + 1)", ["boostf"],
        rerank_docs=3, k=3,
    ).collect()
    # window = docs 0,1,2; doc 3 excluded by rerank_docs
    assert [r["doc_id"] for r in out] == [2, 1, 0]
    assert out[0]["expr_score"] == pytest.approx(
        round(3.0 + math.log(101.0), 4)
    )
    # missing feature binds as 0: doc 3 absent anyway, doc 0 has 1.0
    assert out[2]["expr_score"] == pytest.approx(round(5.0 + math.log(2.0), 4))
