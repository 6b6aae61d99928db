"""Exact repeated-substring dedup (Lee et al. 2021 semantics,
functions/dedup.py::exact_substring_dedup)."""

from __future__ import annotations

from lucene_solr_spark.functions.dedup import exact_substring_dedup


def test_keep_first_occurrence(spark):
    span = "one two three four"
    df = spark.createDataFrame(
        [
            (1, f"{span} alpha beta"),
            (2, f"gamma {span} delta"),
            (3, "totally unrelated words here now"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in exact_substring_dedup(df, k=4).collect()}
    # doc 1 holds the first occurrence (smallest doc_id, pos) — intact
    assert out[1]["text"] == f"{span} alpha beta"
    assert out[1]["removed"] == 0
    # doc 2 loses exactly the 4-token repeated span
    assert out[2]["text"] == "gamma delta"
    assert out[2]["removed"] == 4
    assert out[3]["removed"] == 0


def test_within_doc_repeat(spark):
    # the SAME doc repeating a span keeps only the first copy
    df = spark.createDataFrame(
        [(1, "a b c d x y z a b c d")], "doc_id long, text string"
    )
    out = exact_substring_dedup(df, k=4).collect()[0]
    assert out["text"] == "a b c d x y z"
    assert out["removed"] == 4


def test_overlapping_grams_mask_union(spark):
    # a 5-token repeat at k=4 masks the union of its two 4-gram windows
    df = spark.createDataFrame(
        [(1, "p q r s t tail1 end1"), (2, "head2 p q r s t tail2")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in exact_substring_dedup(df, k=4).collect()}
    assert out[1]["removed"] == 0
    assert out[2]["text"] == "head2 tail2"
    assert out[2]["removed"] == 5


def test_short_docs_untouched(spark):
    df = spark.createDataFrame(
        [(1, "a b"), (2, "a b")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in exact_substring_dedup(df, k=4).collect()}
    assert out[1]["removed"] == 0 and out[2]["removed"] == 0
