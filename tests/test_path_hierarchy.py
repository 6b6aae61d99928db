"""PathHierarchyTokenizer vs the reference's complete test vectors
(TestPathHierarchyTokenizer.java:28-200)."""

import pytest

from lucene_solr_spark.analysis.path_hierarchy import (
    path_hierarchy_col,
    path_tokens,
)

# (path, delimiter, replacement, skip, expected) — every vector of the
# reference test
VECTORS = [
    ("/a/b/c", "/", None, 0, ["/a", "/a/b", "/a/b/c"]),
    ("/a/b/c/", "/", None, 0, ["/a", "/a/b", "/a/b/c", "/a/b/c/"]),
    ("a/b/c", "/", None, 0, ["a", "a/b", "a/b/c"]),
    ("a/b/c/", "/", None, 0, ["a", "a/b", "a/b/c", "a/b/c/"]),
    ("/", "/", None, 0, ["/"]),
    ("//", "/", None, 0, ["/", "//"]),
    ("/a/b/c", "/", "\\", 0, ["\\a", "\\a\\b", "\\a\\b\\c"]),
    ("c:\\a\\b\\c", "\\", None, 0, ["c:", "c:\\a", "c:\\a\\b", "c:\\a\\b\\c"]),
    ("c:\\a\\b\\c", "\\", "/", 0, ["c:", "c:/a", "c:/a/b", "c:/a/b/c"]),
    ("/a/b/c", "/", None, 1, ["/b", "/b/c"]),
    ("/a/b/c/", "/", None, 1, ["/b", "/b/c", "/b/c/"]),
    ("a/b/c", "/", None, 1, ["/b", "/b/c"]),
    ("a/b/c/", "/", None, 1, ["/b", "/b/c", "/b/c/"]),
    ("/", "/", None, 1, []),
    ("//", "/", None, 1, ["/"]),
]


@pytest.mark.parametrize("path,delim,repl,skip,want", VECTORS)
def test_reference_vectors(path, delim, repl, skip, want):
    assert path_tokens(path, delim, repl, skip) == want


def test_column_matches_python(spark):
    import pyspark.sql.functions as F

    for path, delim, repl, skip, want in VECTORS:
        df = spark.createDataFrame([(path,)], "p string")
        got = df.select(
            path_hierarchy_col(F.col("p"), delim, repl, skip).alias("t")
        ).first()["t"]
        assert list(got) == want, (path, delim, repl, skip)


def test_column_random_paths(spark):
    import random

    import pyspark.sql.functions as F

    rng = random.Random(9)
    paths = [
        "".join(rng.choice("ab/") for _ in range(rng.randint(1, 12)))
        for _ in range(120)
    ]
    paths = [p for p in paths if p]
    df = spark.createDataFrame([(p,) for p in paths], "p string")
    for skip in (0, 1, 2):
        got = {
            r["p"]: list(r["t"])
            for r in df.select(
                "p", path_hierarchy_col(F.col("p"), "/", None, skip).alias("t")
            ).collect()
        }
        for p in paths:
            assert got[p] == path_tokens(p, "/", None, skip), (p, skip)
