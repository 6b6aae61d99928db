"""Query time budget (TimeLimitingCollector.java analog)."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.queries.timelimit import (
    TimeExceededError,
    run_with_time_budget,
)


def test_fast_query_completes_within_budget(spark, searcher):
    from lucene_solr_spark.queries.query import TermQuery

    rows = run_with_time_budget(
        spark,
        lambda: searcher.search(TermQuery("spark"), k=5).collect(),
        budget_ms=120_000,
    )
    assert len(rows) == 5


def test_runaway_query_is_cancelled(spark):
    """A deliberately huge cross join must be killed at the budget, not
    run to completion — and the wall clock must show it was cut off."""
    big = spark.range(0, 3_000_000)

    def runaway():
        return big.alias("a").crossJoin(big.alias("b")).count()

    t0 = time.monotonic()
    with pytest.raises(TimeExceededError) as ei:
        run_with_time_budget(spark, runaway, budget_ms=1_500)
    elapsed = time.monotonic() - t0
    assert ei.value.budget_ms == 1_500
    # cancelled promptly: nowhere near what the 9e12-row count needs
    assert elapsed < 30


def test_real_failures_propagate(spark):
    def boom():
        return spark.range(1).select(
            F.assert_true(F.lit(False), F.lit("inner failure"))
        ).collect()

    with pytest.raises(Exception, match="inner failure"):
        run_with_time_budget(spark, boom, budget_ms=60_000)
