"""JDBCStream end-to-end gate (streaming/expressions.py _h_jdbc).

The JDBC driver jar must sit on the JVM classpath at session start, so
the round-trip runs in a SUBPROCESS with its own SparkSession: create
and populate an on-disk DuckDB database through plain java.sql (the
read-only JDBCStream contract — the table pre-exists), then evaluate a
``jdbc(...)`` stream expression against it and check rows, schema
inference, sort enforcement, and the partitioned-scan branch.

Skips (with the documented reason) when no JDBC driver jar is present
on the machine — the mapping itself stays covered by the parse test
below, which needs no JVM driver.
"""

from __future__ import annotations

import glob
import os
import subprocess
import sys
import textwrap

import pytest


def _find_driver_jar() -> str | None:
    # bounded search: env override + the dependency-cache trees where
    # build tools place driver jars (never the whole home directory —
    # a recursive $HOME glob at collection time can stall for minutes)
    env = os.environ.get("DUCKDB_JDBC_JAR")
    if env and os.path.exists(env):
        return env
    pats = [
        os.path.expanduser("~/.cache/coursier/**/duckdb_jdbc-*.jar"),
        os.path.expanduser("~/.m2/**/duckdb_jdbc-*.jar"),
        os.path.expanduser("~/.ivy2/**/duckdb_jdbc-*.jar"),
    ]
    for p in pats:
        hits = glob.glob(p, recursive=True)
        if hits:
            return hits[0]
    return None


_SUB = textwrap.dedent(
    """
    import glob, os, sys
    jar, db = sys.argv[1], sys.argv[2]
    from pyspark.sql import SparkSession
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("jdbc-gate")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.jars", jar)
        .config("spark.driver.extraClassPath", jar)
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    url = f"jdbc:duckdb:{db}"
    jvm = spark._jvm
    jvm.Class.forName("org.duckdb.DuckDBDriver")
    conn = jvm.java.sql.DriverManager.getConnection(url)
    st = conn.createStatement()
    st.execute("CREATE TABLE people (id BIGINT, name VARCHAR, score DOUBLE)")
    st.execute(
        "INSERT INTO people SELECT i, 'n' || i, i * 1.5 FROM range(100) t(i)"
    )
    st.close(); conn.close()

    from lucene_solr_spark.streaming.expressions import StreamFactory
    # any table registers the session; jdbc() never touches it
    ev = StreamFactory({"dummy": spark.range(1)})
    out = ev.df(
        'jdbc(connection="' + url + '", '
        'sql="SELECT id, name, score FROM people WHERE id < 50", '
        'sort="id desc", driver="org.duckdb.DuckDBDriver")'
    )
    rows = out.collect()
    assert len(rows) == 50, len(rows)
    assert [r["id"] for r in rows[:3]] == [49, 48, 47], rows[:3]
    assert rows[0]["name"] == "n49" and abs(rows[0]["score"] - 73.5) < 1e-9
    # partitioned-scan branch: ranges ANDed into the derived table
    part = ev.df(
        'jdbc(connection="' + url + '", '
        'sql="SELECT id, score FROM people", sort="id asc", '
        'driver="org.duckdb.DuckDBDriver", partitionColumn="id", '
        'lowerBound="0", upperBound="100", numPartitions="4")'
    )
    # the JDBC SCAN is 4-way (the sort's range exchange then owns the
    # output partitioning, so read the scan from the plan, not the rdd)
    plan = part._jdf.queryExecution().toString()
    assert "numPartitions=4" in plan, plan
    got = [r["id"] for r in part.collect()]
    assert got == sorted(got) and len(got) == 100
    print("JDBC-GATE-OK")
    """
)


@pytest.mark.skipif(
    _find_driver_jar() is None,
    reason="no JDBC driver jar on this machine (environment gate)",
)
def test_jdbc_stream_roundtrip_subprocess(tmp_path):
    jar = _find_driver_jar()
    db = str(tmp_path / "gate.db")
    r = subprocess.run(
        [sys.executable, "-c", _SUB, jar, db],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    assert "JDBC-GATE-OK" in r.stdout


def test_jdbc_requires_connection_sql_sort(spark):
    from lucene_solr_spark.streaming.expressions import StreamFactory

    ev = StreamFactory({"dummy": spark.range(1)})
    with pytest.raises(ValueError, match="jdbc\\(\\) requires"):
        ev.df('jdbc(connection="jdbc:duckdb:", sql="SELECT 1")')
