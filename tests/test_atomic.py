"""Atomic update merge + RealTimeGet (update/processor/
AtomicUpdateDocumentMerger.java, handler/RealTimeGetComponent.java)."""

from __future__ import annotations

import pytest

from lucene_solr_spark.index.atomic import apply_atomic_updates, realtime_get

FIELDS = {"count": "scalar", "title": "scalar", "tags": "array"}


@pytest.fixture(scope="module")
def base(spark):
    return spark.createDataFrame(
        [
            (1, "one", 10, ["a", "b"]),
            (2, "two", 20, ["c"]),
            (3, "three", 30, None),
        ],
        ["doc_id", "title", "count", "tags"],
    )


def _cmds(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id bigint, version bigint, field string, op string, value string"
    )


def test_scalar_set_inc_ordering(spark, base):
    """inc BEFORE a set is discarded; incs AFTER accumulate on it —
    the version-ordered merge of AtomicUpdateDocumentMerger."""
    cmds = _cmds(spark, [
        (1, 1, "count", "inc", "5"),    # discarded by the later set
        (1, 2, "count", "set", "100"),
        (1, 3, "count", "inc", "7"),
        (2, 1, "count", "inc", "-3"),   # no set: applies to base
        (3, 1, "title", "set", "drei"),
    ])
    out = {
        r["doc_id"]: (r["title"], r["count"], r["tags"])
        for r in apply_atomic_updates(base, cmds, FIELDS).collect()
    }
    assert out[1] == ("one", 107, ["a", "b"])
    assert out[2] == ("two", 17, ["c"])
    assert out[3] == ("drei", 30, None)


def test_array_add_remove_set(spark, base):
    cmds = _cmds(spark, [
        (1, 1, "tags", "add", "z"),
        (1, 2, "tags", "remove", "a"),
        (2, 1, "tags", "set", "x"),
        (2, 2, "tags", "add", "y"),
        (3, 1, "tags", "add", "n"),      # null base -> empty array
    ])
    out = {
        r["doc_id"]: r["tags"]
        for r in apply_atomic_updates(base, cmds, FIELDS).collect()
    }
    assert out == {1: ["b", "z"], 2: ["x", "y"], 3: ["n"]}


def test_upsert_creates_doc(spark, base):
    cmds = _cmds(spark, [
        (9, 1, "title", "set", "new"),
        (9, 2, "count", "inc", "4"),
        (9, 3, "tags", "add", "t"),
    ])
    out = apply_atomic_updates(base, cmds, FIELDS)
    assert out.count() == 4
    r = out.filter("doc_id = 9").collect()[0]
    assert (r["title"], r["count"], r["tags"]) == ("new", 4, ["t"])


def test_realtime_get(spark, base):
    cmds = _cmds(spark, [
        (2, 1, "count", "inc", "1"),
        (9, 1, "title", "set", "uncommitted"),
    ])
    got = realtime_get(base, cmds, [2, 9], FIELDS)
    rows = got.collect()
    assert [r["doc_id"] for r in rows] == [2, 9]
    assert rows[0]["count"] == 21
    assert rows[1]["title"] == "uncommitted"
