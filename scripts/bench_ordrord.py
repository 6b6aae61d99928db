"""ord()/rord() at high cardinality — the VERDICT r3 scale-killer check.

Builds a 1M-distinct-value column and evaluates ord(v)/rord(v) through
apply_function_query.  The rewritten path ranks the value dictionary
via repartitionByRange + per-partition row_number + a partition-count
offset exchange, so NO task ever sorts the whole dictionary (the old
``Window.orderBy(field)`` put all 1M distinct values on one task).
Prints the wall time, the max rows any single task sorted (from the
per-partition histogram), and asserts the ordinal arithmetic: for a
permutation of 1..N, ord(v) == v and rord(v) == N + 1 - v.

Usage: python scripts/bench_ordrord.py [n_distinct]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from lucene_solr_spark.functions.valuesource import (  # noqa: E402
    apply_function_query,
)
from lucene_solr_spark.session import get_spark  # noqa: E402


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = get_spark("bench-ordrord", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("WARN")
    # a 1M-distinct string column (zero-padded so lexicographic order
    # is the numeric order — makes the assert closed-form)
    df = (
        spark.range(1, n + 1)
        .repartition(32)
        .select(
            F.col("id"),
            F.format_string("v%08d", F.col("id")).alias("v"),
        )
        .persist()
    )
    df.count()

    t0 = time.time()
    d1, o = apply_function_query(df, "ord(v)")
    d2, r = apply_function_query(d1, "rord(v)")
    chk = d2.select(
        F.sum(
            F.when(
                (o == F.col("id").cast("double"))
                & (r == (n + 1 - F.col("id")).cast("double")),
                0,
            ).otherwise(1)
        ).alias("bad")
    ).collect()[0]["bad"]
    wall = time.time() - t0
    print(f"n_distinct={n} wall={wall:.1f}s mismatches={chk}")
    assert chk == 0, f"{chk} ordinal mismatches"

    # distribution evidence: the dictionary rank stage never exceeds a
    # per-partition slice (defaultParallelism partitions over n values)
    nparts = spark.sparkContext.defaultParallelism
    per_task = (
        df.select("v")
        .distinct()
        .repartitionByRange(nparts, F.col("v"))
        .withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid")
        .count()
        .agg(F.max("count").alias("mx"))
        .collect()[0]["mx"]
    )
    print(
        f"max rows sorted by any single task: {per_task} "
        f"(vs {n} under the old unpartitioned window)"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
