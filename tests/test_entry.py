"""Fast in-suite replica of the driver's correctness gate for a
representative subset of __spark_entry__ queries at sf0.001 —
the same comparison discipline (row count, column names, order-
insensitive canonicalized values vs DuckDB)."""

from __future__ import annotations

import math
import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).parent.parent))

import __spark_entry__ as entrymod  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"
# EVERY registry entry that publishes an oracle is replicated in-suite
# (registry order preserved), so entries past the driver's ~50-entry gate
# window still carry full oracle evidence.  Entries without an oracle
# (engine-specific / non-SQL-expressible, e.g. float32 lucene-mode
# scoring, MinHash/SimHash/ANN, segment_merge) are covered by their own
# dedicated test modules instead.
_ORACLES = entrymod.oracle_sql()
SUBSET = [k for k in entrymod.queries() if k in _ORACLES]


@pytest.fixture(scope="module")
def ducked():
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else f"{v:.9g}"
    return str(v)


@pytest.mark.parametrize("name", SUBSET)
def test_entry_query_matches_oracle(spark, ducked, name):
    fn = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    sdf = fn(spark, SF_DIR)
    srows = sdf.collect()
    res = ducked.execute(sql)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    assert sorted(sdf.columns) == sorted(ocols)
    assert len(srows) == len(orows), name
    s_ord = sorted(range(len(sdf.columns)), key=lambda i: sdf.columns[i])
    o_ord = sorted(range(len(ocols)), key=lambda i: ocols[i])
    smulti = sorted("|".join(canon(r[i]) for i in s_ord) for r in srows)
    omulti = sorted("|".join(canon(r[i]) for i in o_ord) for r in orows)
    assert smulti == omulti, name


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0 and set(df.columns) == {"doc_id", "score"}


def test_lucene_buffer_boundary(spark):
    """q_term_query_lucene's k=40 unrounded-score buffer must contain
    the full rounded top-10 (a rounded tie group crossing the buffer
    edge would let an outside doc into the oracle's rounded ranking)."""
    from lucene_solr_spark.queries.parser import parse_query

    got = [tuple(r) for r in entrymod.q_term_query_lucene(spark, SF_DIR).collect()]
    s = entrymod._searcher(spark, SF_DIR, scoring="lucene")
    raw = s.search(parse_query("+spark +window vector"), k=100000, use_cache=False)
    want = [tuple(r) for r in entrymod._topk(raw, 10).collect()]
    assert got == want
