"""Graph traversal streams (solrj io/graph/GatherNodesStream.java,
ShortestPathStream.java)."""

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
