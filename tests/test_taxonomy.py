"""lucene/facet analogs: taxonomy rollup counts, getTopChildren,
DrillSideways near-miss domains, association sums — hand-checkable
corpus, semantics pinned against brute-force Python."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.queries.taxonomy import (
    association_sums,
    drill_sideways_counts,
    prefix_counts,
    top_children,
)

ROWS = [
    # (doc_id, path [dim-level-1, dim-level-2], weight)
    (0, ["books", "fiction"], 3),
    (1, ["books", "fiction"], 5),
    (2, ["books", "scifi"], 2),
    (3, ["music", "rock"], 7),
    (4, ["music", "rock"], 1),
    (5, ["music", "jazz"], 4),
    (6, ["books", "scifi"], 6),
    (7, ["books", "poetry"], 8),
]


@pytest.fixture(scope="module")
def taxo_df(spark):
    return spark.createDataFrame(ROWS, ["doc_id", "path", "w"])


@pytest.fixture(scope="module")
def counts(taxo_df):
    return prefix_counts(taxo_df, "path").cache()


def test_rollup_prefix_counts(counts):
    got = {(r.depth, r.path): r.cnt for r in counts.collect()}
    # depth-1 values are subtree totals (IntTaxonomyFacets.rollup)
    assert got[(1, "books")] == 5
    assert got[(1, "music")] == 3
    assert got[(2, "books/fiction")] == 2
    assert got[(2, "books/scifi")] == 2
    assert got[(2, "books/poetry")] == 1
    assert got[(2, "music/rock")] == 2
    assert got[(2, "music/jazz")] == 1
    assert len(got) == 7


def test_top_children_root_and_path(counts):
    root = top_children(counts, [], 10).collect()
    assert [(r.label, r.cnt) for r in root] == [("books", 5), ("music", 3)]
    kids = top_children(counts, ["books"], 2).collect()
    # fiction/scifi tie at 2 -> label asc; poetry (1) cut by topN=2
    assert [(r.label, r.cnt) for r in kids] == [("fiction", 2), ("scifi", 2)]


def test_top_children_label_not_whole_path(counts):
    kids = top_children(counts, ["music"], 10).collect()
    assert {r.label for r in kids} == {"rock", "jazz"}


def test_drill_sideways_near_miss_domains(spark):
    df = spark.createDataFrame(
        [
            # (brand, color) drill-down: brand='a', color='red'
            ("a", "red"),
            ("a", "red"),
            ("a", "blue"),   # fails color only -> counts in color dim
            ("b", "red"),    # fails brand only -> counts in brand dim
            ("b", "blue"),   # fails both -> counts nowhere
        ],
        ["brand", "color"],
    )
    out = drill_sideways_counts(
        df,
        {"brand": F.col("brand") == "a", "color": F.col("color") == "red"},
        {"brand": "brand", "color": "color"},
    )
    got = {(r.dim, r.value): r.cnt for r in out.collect()}
    # brand dim: domain = color='red' only -> a:2, b:1 (near-miss b kept)
    assert got[("brand", "a")] == 2
    assert got[("brand", "b")] == 1
    # color dim: domain = brand='a' only -> red:2, blue:1
    assert got[("color", "red")] == 2
    assert got[("color", "blue")] == 1
    # drill-down hits: brand='a' AND color='red'
    assert got[("_hits", "_all")] == 2
    assert len(got) == 5


def test_association_sums(taxo_df):
    out = association_sums(
        taxo_df,
        F.element_at(F.col("path"), 1),
        F.col("w"),
        F.col("w") * F.lit(0.5),
        10,
    ).collect()
    assert [(r.label, r.sum_int, r.sum_float) for r in out] == [
        ("books", 24, 12.0),
        ("music", 12, 6.0),
    ]


def test_association_topn_cut(taxo_df):
    out = association_sums(
        taxo_df,
        F.element_at(F.col("path"), 2),
        F.col("w"),
        F.lit(0.0),
        2,
    ).collect()
    # fiction 8, rock 8 tie -> label asc; scifi 8 also ties: fiction, rock
    labels = [r.label for r in out]
    assert len(labels) == 2
    assert labels == sorted(labels)
