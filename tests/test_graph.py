"""Graph traversal streams (solrj io/graph/GatherNodesStream.java,
ShortestPathStream.java)."""

import pytest

from lucene_solr_spark.streaming.graph import gather_nodes, shortest_path


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, ["src", "dst"])


def test_gather_nodes_levels(spark):
    # a -> b -> c -> d, a -> c (shortcut)
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("a", "c")])
    roots = spark.createDataFrame([("a",)], ["node"])
    got = {
        (r["node"], r["level"])
        for r in gather_nodes(e, roots, "src", "dst", hops=3).collect()
    }
    # c is reached at level 1 via the shortcut — emitted ONCE at its
    # first discovery level (GatherNodesStream unique-nodes semantics)
    assert got == {("b", 1), ("c", 1), ("d", 2)}


def test_gather_nodes_does_not_revisit_roots(spark):
    e = _edges(spark, [("a", "b"), ("b", "a")])
    roots = spark.createDataFrame([("a",)], ["node"])
    got = {
        (r["node"], r["level"])
        for r in gather_nodes(e, roots, "src", "dst", hops=2).collect()
    }
    assert got == {("b", 1)}


def test_shortest_path(spark):
    e = _edges(
        spark,
        [("a", "b"), ("b", "c"), ("c", "d"), ("x", "y")],
    )
    assert shortest_path(e, "a", "d", "src", "dst") == 3
    assert shortest_path(e, "a", "y", "src", "dst") is None
    assert shortest_path(e, "a", "b", "src", "dst") == 1


def test_score_nodes_tfidf(spark):
    """ScoreNodesStream.java:242 — float32 tf-idf per node."""
    import math

    import numpy as np

    from lucene_solr_spark.streaming.graph import gather_counts, score_nodes

    # edges: root r reaches a twice, b once; global freqs differ
    e = _edges(
        spark,
        [("r", "a"), ("r", "a"), ("r", "b"), ("x", "a"), ("x", "b"),
         ("x", "b"), ("y", "b")],
    )
    roots = spark.createDataFrame([("r",)], ["node"])
    nodes = gather_counts(e, roots, "src", "dst")
    got_counts = {r["node"]: r["count"] for r in nodes.collect()}
    assert got_counts == {"a": 2, "b": 1}

    tf = e.groupBy(e.dst.alias("node")).count().withColumnRenamed(
        "count", "docfreq"
    )
    n_docs = e.count()
    got = {
        r["node"]: r["node_score"]
        for r in score_nodes(nodes, tf, n_docs).collect()
    }
    for node, cnt, dfq in (("a", 2, 3), ("b", 1, 4)):
        f1 = np.float32(math.log(cnt) + 1.0)
        f2 = np.float32(math.log((n_docs + 1) / (dfq + 1.0)) + 1.0)
        want = float(np.float32(float(f1) * float(f2)))
        assert got[node] == pytest.approx(round(want, 4)), node


def test_freetext_bigram_model(spark):
    from lucene_solr_spark.queries.suggest import suggest_freetext

    df = spark.createDataFrame(
        [
            (1, "run the query engine"),
            (2, "query engine wins"),
            (3, "query plan beats query engine"),
        ],
        ["doc_id", "text"],
    )
    got = [
        (r["term"], r["weight"])
        for r in suggest_freetext(df, "query", n=5).collect()
    ]
    assert got == [("engine", 3), ("plan", 1)]


def test_shortest_paths_enumerates_all(spark):
    """Diamond + longer detour: exactly the two 3-hop paths come back,
    the 4-hop detour does not (ShortestPathStream emits only paths of
    the first level where the target is found)."""
    from lucene_solr_spark.streaming.graph import shortest_paths

    e = _edges(spark, [
        ("a", "b1"), ("a", "b2"), ("b1", "c"), ("b2", "c"), ("c", "z"),
        # detour a->x->y->c->z (4 hops to z)
        ("a", "x"), ("x", "y"), ("y", "c"),
    ])
    got = sorted(
        r["path"]
        for r in shortest_paths(e, "a", "z", "src", "dst", 6).collect()
    )
    assert got == ["a->b1->c->z", "a->b2->c->z"]


def test_shortest_paths_respects_max_hops_and_unreachable(spark):
    from lucene_solr_spark.streaming.graph import shortest_paths

    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    assert shortest_paths(e, "a", "d", "src", "dst", 2).count() == 0
    assert [
        r["path"]
        for r in shortest_paths(e, "a", "d", "src", "dst", 3).collect()
    ] == ["a->b->c->d"]
    # fully unreachable node
    assert shortest_paths(e, "a", "zz", "src", "dst", 6).count() == 0


def test_shortest_paths_duplicate_edges_collapse(spark):
    """Multigraph edges (the events relation repeats (user, type)
    pairs) must not duplicate path tuples."""
    from lucene_solr_spark.streaming.graph import shortest_paths

    e = _edges(spark, [("a", "b"), ("a", "b"), ("b", "z")])
    assert [
        r["path"]
        for r in shortest_paths(e, "a", "z", "src", "dst", 4).collect()
    ] == ["a->b->z"]
