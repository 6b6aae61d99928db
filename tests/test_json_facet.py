"""JSON Facet API interpreter (search/facet/FacetModule.java,
FacetField/FacetRange/FacetQuery + *Agg.java) — nested buckets,
per-bucket limits, stat facets, over a hand-checkable corpus."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.queries.json_facet import json_facet

ROWS = [
    # (doc_id, lang, source, n_chars)
    (0, "en", "a", 10),
    (1, "en", "a", 30),
    (2, "en", "b", 20),
    (3, "fr", "b", 40),
    (4, "fr", "b", 60),
    (5, "fr", "c", 50),
    (6, "de", "c", 70),
]


@pytest.fixture(scope="module")
def dv(spark):
    return spark.createDataFrame(
        ROWS, ["doc_id", "lang", "source", "n_chars"]
    )


def test_terms_with_stats_and_sort(dv):
    out = json_facet(
        dv,
        {
            "type": "terms",
            "field": "lang",
            "limit": 2,
            "sort": "avg_chars desc",
            "facet": {"avg_chars": "avg(n_chars)", "u_src": "unique(source)"},
        },
    ).collect()
    # avg: de=70, fr=50, en=20 -> top-2 de, fr; ordered by val afterwards
    got = {r["val"]: (r["count"], r["avg_chars"], r["u_src"]) for r in out}
    assert got == {"de": (1, 70.0, 1), "fr": (3, 50.0, 2)}


def test_terms_mincount_index_sort(dv):
    out = json_facet(
        dv,
        {"type": "terms", "field": "lang", "sort": "index", "mincount": 2},
    ).collect()
    assert [(r["val"], r["count"]) for r in out] == [("en", 3), ("fr", 3)]


def test_nested_terms_per_bucket_limit(dv):
    """The FacetModule core: subfacet buckets limited PER PARENT, with
    parent stats intact — one groupBy per level, no per-bucket loop."""
    out = json_facet(
        dv,
        {
            "type": "terms",
            "field": "lang",
            "limit": 2,
            "sort": "count desc",
            "facet": {
                "sum_chars": "sum(n_chars)",
                "by_src": {
                    "type": "terms",
                    "field": "source",
                    "limit": 1,
                    "sort": "count desc",
                },
            },
        },
    ).collect()
    # en and fr tie at 3 (index tie-break keeps both); each keeps ONE
    # source bucket: en->a (2), fr->b (2)
    got = {
        r["val"]: (r["count"], r["sum_chars"], r["by_src_val"], r["by_src_count"])
        for r in out
    }
    assert got == {"en": (3, 60, "a", 2), "fr": (3, 150, "b", 2)}


def test_range_and_query_facets(dv):
    out = json_facet(
        dv,
        {"type": "range", "field": "n_chars", "start": 0, "end": 80,
         "gap": 40, "sort": "index", "limit": 10},
    ).collect()
    assert [(r["val"], r["count"]) for r in out] == [(0.0, 3), (40.0, 4)]
    q = json_facet(
        dv,
        {"type": "query", "q": F.col("n_chars") >= 40,
         "facet": {"mx": "max(n_chars)"}},
    ).collect()
    assert (q[0]["count"], q[0]["mx"]) == (4, 70)


def test_domain_and_errors(dv, spark):
    dom = spark.createDataFrame([(0,), (1,), (3,)], ["doc_id"])
    out = json_facet(
        dv, {"type": "terms", "field": "lang", "sort": "index"}, domain=dom
    ).collect()
    assert [(r["val"], r["count"]) for r in out] == [("en", 2), ("fr", 1)]
    with pytest.raises(ValueError, match="one bucket subfacet"):
        json_facet(
            dv,
            {"type": "terms", "field": "lang",
             "facet": {"a": {"type": "terms", "field": "source"},
                       "b": {"type": "terms", "field": "source"}}},
        )
    with pytest.raises(ValueError, match="unknown stat"):
        json_facet(
            dv, {"type": "terms", "field": "lang", "facet": {"x": "frob(y)"}}
        )


def test_heatmap_facet(spark):
    """facet.heatmap grid counts (SpatialHeatmapFacets +
    HeatmapFacetCounter): floor-grid bucketing, max-edge clamp,
    out-of-box drop."""
    from lucene_solr_spark.queries.facets import heatmap_facet

    pts = spark.createDataFrame(
        [
            (0, -9.0, -9.0),   # cell (0,0)
            (1, -1.0, -1.0),   # cell (0,0)
            (2, 1.0, 1.0),     # cell (1,1)
            (3, 10.0, 10.0),   # max edges clamp -> cell (1,1)
            (4, 11.0, 0.0),    # out of box -> dropped
        ],
        ["doc_id", "lat", "lon"],
    )
    out = heatmap_facet(pts, "lat", "lon", -10, 10, -10, 10, 2, 2)
    assert [tuple(r) for r in out.collect()] == [(0, 0, 2), (1, 1, 2)]
    dom = spark.createDataFrame([(0,), (2,)], ["doc_id"])
    out = heatmap_facet(pts, "lat", "lon", -10, 10, -10, 10, 2, 2, domain=dom)
    assert [tuple(r) for r in out.collect()] == [(0, 0, 1), (1, 1, 1)]
