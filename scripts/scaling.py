"""Scaling-efficiency evidence: the identical index-build job at two
parallelism levels (the sandbox stand-in for N vs 4N executors — per
driver instruction, since no real cluster is available here).

Runs the full write path (generate deterministic corpus → stable docID
assignment → tokenize/invert/encode → segmented write + manifest) at
local[N] and local[4N] on the SAME input and prints throughput at both
plus efficiency = (T_N / T_4N) / 4.  Appends the result to BENCH.md.

Usage: python scripts/scaling.py [num_docs] [small_cores]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

WORKER = r"""
import json, os, sys, tempfile, time
sys.path.insert(0, os.getcwd())
from lucene_solr_spark.session import get_spark
from lucene_solr_spark.corpus import generate_corpus
from lucene_solr_spark.index import assign_doc_ids
from lucene_solr_spark.index.segments import SegmentedIndex

cores = int(sys.argv[1])
num_docs = int(sys.argv[2])
out = sys.argv[3]
spark = get_spark(f"scaling-{cores}", cores=cores)
corpus = generate_corpus(spark, num_docs, partitions=64)
corpus = assign_doc_ids(corpus).select("doc_id", "content")
corpus.write.mode("overwrite").parquet(os.path.join(out, "corpus"))
src = spark.read.parquet(os.path.join(out, "corpus"))
t0 = time.time()
idx = SegmentedIndex(spark, os.path.join(out, "index"))
man = idx.build(src, num_segments=64, total_docs=num_docs)
wall = time.time() - t0
ndocs = sum(i.num_docs for i in man.values())
print(json.dumps({"cores": cores, "wall_s": round(wall, 2),
                  "docs": ndocs, "docs_per_sec": round(ndocs / wall, 1)}))
"""


def run(cores: int, num_docs: int, out: str) -> dict:
    env = dict(os.environ)
    r = subprocess.run(
        [sys.executable, "-c", WORKER, str(cores), str(num_docs), out],
        capture_output=True, text=True, env=env, timeout=3600,
    )
    line = [ln for ln in r.stdout.strip().splitlines() if ln.startswith("{")]
    if not line:
        print(r.stdout[-2000:], r.stderr[-2000:], file=sys.stderr)
        raise RuntimeError(f"worker failed at cores={cores}")
    return json.loads(line[-1])


def main() -> None:
    num_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000
    small = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    big = small * 4
    results = {}
    for cores in (small, big):
        out = tempfile.mkdtemp(prefix=f"scale{cores}-")
        try:
            results[cores] = run(cores, num_docs, out)
        finally:
            shutil.rmtree(out, ignore_errors=True)
        print(results[cores])
    eff = (results[big]["docs_per_sec"] / results[small]["docs_per_sec"]) / (
        big / small
    )
    summary = {
        "job": "segmented index build (tokenize+invert+encode+write+manifest)",
        "num_docs": num_docs,
        f"local[{small}]": results[small],
        f"local[{big}]": results[big],
        "scaling_efficiency": round(eff, 3),
        "target": ">= 0.8",
    }
    print(json.dumps(summary))
    with open("BENCH.md", "a") as f:
        f.write(
            f"\n## Scaling run (num_docs={num_docs})\n\n"
            f"| parallelism | wall_s | docs/sec |\n|---|---|---|\n"
            f"| local[{small}] | {results[small]['wall_s']} | {results[small]['docs_per_sec']} |\n"
            f"| local[{big}] | {results[big]['wall_s']} | {results[big]['docs_per_sec']} |\n\n"
            f"Scaling efficiency (N→4N cores): **{eff:.3f}** (target ≥ 0.8)\n"
        )


if __name__ == "__main__":
    main()
