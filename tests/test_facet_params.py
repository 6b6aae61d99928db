"""SimpleFacets parameter surface (prefix/mincount/sort/offset/limit/
missing) — SimpleFacets.java getTermCounts semantics."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def fdf(spark):
    rows = [
        (1, "aa"), (2, "aa"), (3, "aa"),
        (4, "ab"), (5, "ab"),
        (6, "b"),
        (7, None),
        (8, None),
    ]
    return spark.createDataFrame(rows, ["doc_id", "val"])


def _run(fdf, **kw):
    from lucene_solr_spark.queries.facets import facet_field_params

    return [
        (r.bucket, r.cnt) for r in facet_field_params(fdf, "val", **kw).collect()
    ]


def test_count_sort_with_value_tiebreak(fdf):
    assert _run(fdf) == [("aa", 3), ("ab", 2), ("b", 1)]


def test_prefix_restricts_enum(fdf):
    assert _run(fdf, prefix="a") == [("aa", 3), ("ab", 2)]


def test_mincount_floors(fdf):
    assert _run(fdf, mincount=2) == [("aa", 3), ("ab", 2)]


def test_index_sort_offset_limit(fdf):
    assert _run(fdf, sort="index", offset=1, limit=1) == [("ab", 2)]


def test_missing_appends_null_bucket(fdf):
    out = _run(fdf, missing=True)
    assert out[-1] == (None, 2)
    assert out[:-1] == [("aa", 3), ("ab", 2), ("b", 1)]


def test_domain_restriction(fdf, spark):
    dom = spark.createDataFrame([(1,), (4,), (7,)], ["doc_id"])
    assert _run(fdf, domain=dom, missing=True) == [
        ("aa", 1), ("ab", 1), (None, 1)
    ]
