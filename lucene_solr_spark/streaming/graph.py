"""Graph traversal streams — Solr's gatherNodes/shortestPath surface.

Refs: solr/solrj/src/java/org/apache/solr/client/solrj/io/graph/
GatherNodesStream.java (breadth-first frontier expansion over an edge
relation, with per-node aggregations and a visited set) and
ShortestPathStream.java (iterative BFS with path tracking).

Spark-first: one hop = a semi-join of the edge table against the
current frontier + an except against the visited set — the classic
iterative-BFS-on-DataFrames shape.  Each hop is a separate shuffle
stage; the visited set stays distributed (no driver collect), so a walk
over a 10^12-edge table behaves like any other join pipeline (AQE
handles frontier skew)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def gather_nodes(
    edges: DataFrame,
    roots: DataFrame,
    from_col: str,
    to_col: str,
    hops: int = 1,
) -> DataFrame:
    """Expand ``hops`` breadth-first levels from ``roots``.

    ``edges``: relation with ``from_col``/``to_col``; ``roots``: one
    column named ``node`` (level-0 frontier).  Returns
    (node, level) for every node first reached at level 1..hops —
    GatherNodesStream's unique-nodes semantics (a node is emitted at
    its FIRST discovery level; roots are not re-emitted)."""
    visited = roots.select(F.col("node")).distinct()
    frontier = visited
    out: DataFrame | None = None
    for level in range(1, hops + 1):
        nxt = (
            edges.join(
                frontier.withColumnRenamed("node", from_col), from_col
            )
            .select(F.col(to_col).alias("node"))
            .distinct()
            .join(visited, "node", "left_anti")
        )
        lvl = nxt.select("node", F.lit(level).alias("level"))
        out = lvl if out is None else out.unionByName(lvl)
        visited = visited.unionByName(nxt)
        frontier = nxt
    assert out is not None
    return out


def gather_counts(
    edges: DataFrame, roots: DataFrame, from_col: str, to_col: str
) -> DataFrame:
    """One traversal hop emitting reach multiplicity — the
    ``count(*)`` aggregation GatherNodesStream attaches to each node
    (GatherNodesStream.java, default metric): (node, count) where
    count = number of edges from the root frontier into the node."""
    return (
        edges.join(roots.withColumnRenamed("node", from_col), from_col)
        .groupBy(F.col(to_col).alias("node"))
        .agg(F.count("*").alias("count"))
    )


def score_nodes(
    nodes: DataFrame,
    term_freqs: DataFrame,
    num_docs: int,
) -> DataFrame:
    """ScoreNodesStream (solrj io/stream/ScoreNodesStream.java:226-245):
    tf-idf over traversal nodes — nodeScore =
    (float)(ln(termFreq)+1) · (float)(ln((numDocs+1)/(docFreq+1))+1),
    float32 per factor and a float32 product, exactly as the reference's
    Java float arithmetic.  ``nodes`` carries (node, count) from
    gather_counts; ``term_freqs`` carries (node, docfreq) — the node
    term's frequency over the whole edge relation (the index stats the
    reference fetches via its FacetStream/terms lookups)."""
    f1 = (F.log(F.col("count").cast("double")) + 1.0).cast("float")
    f2 = (
        F.log(
            F.lit(float(num_docs + 1)) / (F.col("docfreq").cast("double") + 1.0)
        )
        + 1.0
    ).cast("float")
    # float*float in Java rounds the exact product to float32; the
    # product of two float32s is exactly representable in double, so
    # double-multiply + one float32 cast is bit-identical and avoids
    # engine-specific REAL promotion rules
    prod = (f1.cast("double") * f2.cast("double")).cast("float")
    return (
        nodes.join(term_freqs, "node")
        .select(
            "node",
            "count",
            "docfreq",
            F.round(prod.cast("double"), 4).alias("node_score"),
        )
        .orderBy(F.col("node_score").desc(), F.col("node").asc())
    )


def shortest_path(
    edges: DataFrame,
    src: object,
    dst: object,
    from_col: str,
    to_col: str,
    max_hops: int = 6,
) -> int | None:
    """BFS distance from ``src`` to ``dst`` (ShortestPathStream.java's
    level count), or None if unreachable within ``max_hops``."""
    spark = edges.sparkSession
    roots = spark.createDataFrame([(src,)], ["node"])
    visited = roots
    frontier = roots
    for level in range(1, max_hops + 1):
        nxt = (
            edges.join(
                frontier.withColumnRenamed("node", from_col), from_col
            )
            .select(F.col(to_col).alias("node"))
            .distinct()
            .join(visited, "node", "left_anti")
        )
        if nxt.filter(F.col("node") == dst).limit(1).count() > 0:
            return level
        if nxt.limit(1).count() == 0:
            return None
        visited = visited.unionByName(nxt)
        frontier = nxt
    return None


def shortest_paths(
    edges: DataFrame,
    src: object,
    dst: object,
    from_col: str,
    to_col: str,
    max_hops: int = 6,
) -> DataFrame:
    """ALL shortest paths from ``src`` to ``dst`` as '->'-joined path
    strings — ShortestPathStream.java's tuple output (each emitted
    tuple carries the full node path), bounded by ``max_hops`` (the
    stream's maxDepth parameter).

    Two distributed phases, no driver-side path materialization:

    1. BFS levels (the gather_nodes frontier loop) until ``dst`` is
       first reached, remembering each node's discovery level — the
       per-level loop is driver-controlled but every set stays a
       DataFrame.
    2. Path enumeration restricted to the SHORTEST-PATH DAG: only
       edges (u, v) with level(v) = level(u)+1 can appear on a
       shortest path, so d successive joins of the path frontier
       against the level-filtered edge table enumerate exactly the
       shortest paths; path count is the output size, never an
       intermediate blow-up.

    Returns a DataFrame with one ``path`` string column (empty if
    ``dst`` is unreachable within ``max_hops``)."""
    spark = edges.sparkSession
    roots = spark.createDataFrame([(src,)], ["node"])
    levels = roots.select("node", F.lit(0).alias("level"))
    visited = roots
    frontier = roots
    dist = None
    for level in range(1, max_hops + 1):
        nxt = (
            edges.join(
                frontier.withColumnRenamed("node", from_col), from_col
            )
            .select(F.col(to_col).alias("node"))
            .distinct()
            .join(visited, "node", "left_anti")
        )
        nxt = nxt.persist()
        if nxt.limit(1).count() == 0:
            nxt.unpersist()
            break
        levels = levels.unionByName(
            nxt.select("node", F.lit(level).alias("level"))
        )
        if nxt.filter(F.col("node") == dst).limit(1).count() > 0:
            dist = level
            break
        visited = visited.unionByName(nxt)
        frontier = nxt
    if dist is None:
        return spark.createDataFrame([], "path string")
    # phase 2: enumerate over the level DAG
    lv = levels.withColumnRenamed("node", "_lnode")
    paths = roots.select(
        F.col("node").alias("endpoint"),
        F.col("node").cast("string").alias("path"),
    )
    for level in range(1, dist + 1):
        step = (
            edges.join(
                paths.withColumnRenamed("endpoint", from_col), from_col
            )
            .join(
                lv.filter(F.col("level") == level),
                F.col(to_col) == F.col("_lnode"),
            )
            .select(
                F.col(to_col).alias("endpoint"),
                F.concat(
                    F.col("path"), F.lit("->"), F.col(to_col)
                ).alias("path"),
            )
            .distinct()
        )
        paths = step
    return paths.filter(F.col("endpoint") == dst).select("path")
