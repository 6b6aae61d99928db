"""Strict replica of the grading driver's correctness compare.

Unlike check_oracle.py (which canonicalizes floats via %.9g and so
masks dtype artifacts), this mimics the driver: both results go
through pandas (Spark .toPandas(), DuckDB .df()), columns are sorted
by name, rows sorted by all columns, and every CELL is compared via
repr() — so int64 5 vs float64 5.0 is a mismatch, exactly like the
driver's value-hash, and unsortable cells (lists) raise like the
driver's canonicalizer does.

Usage: python scripts/driver_strict.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

import duckdb

import __spark_entry__ as entrymod

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canonize(pdf):
    pdf = pdf[sorted(pdf.columns)]
    pdf = pdf.sort_values(list(pdf.columns), kind="mergesort")
    pdf = pdf.reset_index(drop=True)
    return [
        "|".join(repr(v) for v in row) for row in pdf.itertuples(index=False)
    ]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]"
        )
        .appName("driver-strict")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in oracles:
            print(f"skip  {name}: rows-only entry")
            continue
        t0 = time.time()
        try:
            spdf = fn(spark, sf_dir).toPandas()
            opdf = con.execute(oracles[name]).df()
            if sorted(spdf.columns) != sorted(opdf.columns):
                raise AssertionError(
                    f"columns {sorted(spdf.columns)} vs {sorted(opdf.columns)}"
                )
            if len(spdf) != len(opdf):
                raise AssertionError(f"rowcount {len(spdf)} vs {len(opdf)}")
            sm, om = canonize(spdf), canonize(opdf)
            bad = [(a, b) for a, b in zip(sm, om) if a != b]
            if bad:
                raise AssertionError(f"{len(bad)} differing rows, e.g. {bad[:2]}")
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: {e}")
            continue
        print(f"ok    {name}: {len(spdf)} rows hash-match ({time.time()-t0:.1f}s)")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
