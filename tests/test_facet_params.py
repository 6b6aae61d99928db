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


# ---------------------------------------------------------------------------
# facet.range parameter surface (RangeFacetRequest.computeRanges)
# ---------------------------------------------------------------------------

def _ranges(**kw):
    from lucene_solr_spark.queries.facets import compute_ranges

    return compute_ranges(**kw)


def test_soft_end_extends_to_last_gap():
    # RangeFacetRequest.java:575-580 — without hardend the end moves UP
    r = _ranges(start=0, end=10, gap=4)
    assert [(n, lo, hi) for n, lo, hi, *_ in r] == [
        ("0", 0.0, 4.0), ("4", 4.0, 8.0), ("8", 8.0, 12.0)
    ]
    # default include=lower: [lo, hi) everywhere
    assert all((il, iu) == (True, False) for *_, il, iu in r)


def test_hardend_clips_last_bucket():
    r = _ranges(start=0, end=10, gap=4, hardend=True)
    assert [(n, lo, hi) for n, lo, hi, *_ in r] == [
        ("0", 0.0, 4.0), ("4", 4.0, 8.0), ("8", 8.0, 10.0)
    ]


def test_include_edge_first_last_only():
    r = _ranges(start=0, end=12, gap=4, include={"edge"})
    flags = [(il, iu) for *_, il, iu in r]
    # first bucket closed-lower, last closed-upper, interior open-open
    assert flags == [(True, False), (False, False), (False, True)]


def test_other_buckets_complementary_openness():
    r = _ranges(start=0, end=12, gap=4, include={"lower"}, others={"all"})
    d = {n: (lo, hi, il, iu) for n, lo, hi, il, iu in r}
    # before: (*, 0) — upper OPEN because the first gap bucket claims 0
    assert d["before"] == (None, 0.0, False, False)
    # after: (12, *) — lower OPEN? no: last bucket is [8,12) so 12 is
    # unclaimed; include=lower has no 'upper'/'edge' → after claims it
    assert d["after"] == (12.0, None, True, False)
    assert d["between"] == (0.0, 12.0, True, False)


def test_other_outer_forces_closed_bounds():
    r = _ranges(start=0, end=12, gap=4, include={"lower", "upper", "outer"},
                others={"before", "after"})
    d = {n: (il, iu) for n, _lo, _hi, il, iu in r if n in ("before", "after")}
    assert d["before"] == (False, True)
    assert d["after"] == (True, False)


def test_range_facet_params_counts(spark):
    from lucene_solr_spark.queries.facets import range_facet_params

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate([50, 100, 250, 300, 400, 449, 450, 600])],
        ["doc_id", "v"],
    )
    out = dict(
        range_facet_params(
            df, "v", start=100, end=450, gap=150, hardend=True,
            include={"edge"}, others={"all"},
        ).collect()
    )
    # include=edge: 250 and 400 fall in NO gap bucket (interior
    # boundaries open both sides) but DO count in 'between'
    assert out == {
        "100": 1,      # 100 (first bucket closed-lower)
        "250": 1,      # 300 only
        "400": 2,      # 449, 450 (last bucket closed-upper at the end)
        "before": 1,   # 50
        "after": 1,    # 600
        "between": 6,  # 100..450 inclusive both ends
    }
