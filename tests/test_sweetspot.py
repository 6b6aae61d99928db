"""SweetSpotSimilarity kernels (lucene/misc/SweetSpotSimilarity.java)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.scoring.sweetspot import (
    baseline_tf,
    compute_length_norm,
    hyperbolic_tf,
)


def _eval(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def test_baseline_tf(spark):
    # reference TestSweetSpotSimilarity.testSweetSpotTf expectations:
    # base=1.5, min=2 -> freq<=2 gives 1.5, above follows sqrt curve
    def tf(f):
        return _eval(spark, baseline_tf(F.lit(f), 1.5, 2.0))

    assert tf(0) == 0.0
    assert tf(1) == 1.5 and tf(2) == 1.5
    assert tf(3) == pytest.approx(math.sqrt(3 + 1.5 * 1.5 - 2.0))
    # defaults (base=0, min=0) reduce to sqrt(freq) = ClassicSimilarity
    assert _eval(spark, baseline_tf(F.lit(9.0))) == 3.0


def test_hyperbolic_tf_bounds(spark):
    def tf(f):
        return _eval(
            spark, hyperbolic_tf(F.lit(f), 0.0, 2.0, 1.3, 10.0)
        )

    assert tf(0) == 0.0
    # tends to min well below xoffset, max well above; 1.0 at xoffset
    assert tf(1) < 0.2
    assert tf(10) == pytest.approx(1.0)
    assert tf(100) == pytest.approx(2.0, abs=1e-6)
    assert tf(5) < tf(10) < tf(15)


def test_length_norm_plateau(spark):
    # SweetSpotSimilarity.java:117-133 — 1.0 across [min,max],
    # symmetric falloff outside
    def norm(n):
        return _eval(
            spark, compute_length_norm(F.lit(n), 8, 12, 0.5)
        )

    assert norm(8) == 1.0 and norm(10) == 1.0 and norm(12) == 1.0
    assert norm(7) == pytest.approx(1.0 / math.sqrt(0.5 * 2 + 1))
    assert norm(13) == norm(7)  # symmetric
    assert norm(20) < norm(13)
    # steepness=0.5, min=max=1 default: norm(1)=1
    assert _eval(spark, compute_length_norm(F.lit(1))) == 1.0


def test_sweetspot_searcher_mode(spark):
    from lucene_solr_spark.index.builder import build_tables
    from lucene_solr_spark.queries.query import TermQuery
    from lucene_solr_spark.queries.searcher import IndexSearcher

    docs = spark.createDataFrame(
        [
            (0, "spark " * 10 + "pad " * 0),   # len 10 (plateau)
            (1, "spark " + "pad " * 19),        # len 20, tf 1
            (2, "spark spark spark " + "pad " * 7),  # len 10, tf 3
        ],
        ["doc_id", "text"],
    )
    t = build_tables(docs, id_col="doc_id", text_col="text")
    s = IndexSearcher(
        t,
        scoring="sweetspot_exact",
        sweetspot={
            "tf_base": 1.5, "tf_min": 2.0,
            "ln_min": 8, "ln_max": 12, "steepness": 0.5,
        },
    )
    rows = {
        r["doc_id"]: r["score"]
        for r in s.docs(TermQuery("spark")).collect()
    }
    idf = math.log((3 + 1) / (3 + 1.0)) + 1.0  # df=3, N=3
    assert rows[0] == pytest.approx(idf * math.sqrt(10 + 2.25 - 2) * 1.0)
    assert rows[2] == pytest.approx(idf * math.sqrt(3 + 2.25 - 2) * 1.0)
    norm20 = 1.0 / math.sqrt(0.5 * (12 + 8 - 4) + 1)
    assert rows[1] == pytest.approx(idf * 1.5 * norm20)
