"""10× scale rehearsal (VERDICT r3 item 7): run the heavy operators on
a corpus 10× the bench scale on the same box, and check that no stage
blows past ~linear scaling (skew, hot buckets, driver-side state, and
window sorts all surface as super-linear cliffs the sf0.1 bench can't
see).

Synthesizes a deterministic 10× corpus in the sf-dir layout (documents
+ embeddings parquet), then times the SAME registry callables the
driver gates — index build, minhash_lsh, semantic_dedup, wand_topk —
against it, next to their sf0.1 times from the same session.

Replication is near-dup-realistic, not degenerate: each of the 10
copies perturbs ~1/3 of tokens (copy-indexed suffix) so MinHash sees a
web-like mix of near and far pairs rather than 10-cliques everywhere;
embeddings get a small deterministic per-copy rotation.

Usage: python scripts/scale_rehearsal.py [factor]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from lucene_solr_spark.index.builder import build_tables  # noqa: E402
from lucene_solr_spark.session import get_spark  # noqa: E402

BASE = "/root/testdata/sf0.1"
OPS = ["minhash_lsh", "semantic_dedup", "wand_topk", "substring_dedup"]


def synth(spark, factor: int, out_dir: str) -> None:
    """Materialize a factor× corpus, plus a PLANTED degenerate cluster
    of 300·factor identical boilerplate docs (r4 VERDICT item 7: the
    minhash hot-bucket guard must be exercised AT scale, in both legs,
    proportionally — so the 10×/1× wall ratio covers the guard path
    too, not just the clique path)."""
    docs = spark.read.parquet(os.path.join(BASE, "documents.parquet"))
    n = docs.count()
    copies = spark.range(factor).select(F.col("id").alias("_copy"))
    rep = docs.crossJoin(copies)
    # perturb ~1/3 of tokens per copy (deterministically, keyed on
    # (token position + copy)): copy 0 keeps the original text
    toks = F.split(F.col("text"), " ")
    perturbed = F.array_join(
        F.transform(
            toks,
            lambda t, i: F.when(
                (F.col("_copy") > 0) & ((i + F.col("_copy")) % 3 == 0),
                F.concat(t, F.lit("x"), F.col("_copy").cast("string")),
            ).otherwise(t),
        ),
        " ",
    )
    big_docs = rep.select(
        (F.col("doc_id") + F.col("_copy") * n).alias("doc_id"),
        perturbed.alias("text"),
        "lang",
        "source",
        F.length(perturbed).cast("int").alias("n_chars"),
    )
    boiler = (
        "breaking news subscribe to our newsletter all rights reserved "
        "terms of service privacy policy cookie settings contact us "
        "about advertise careers sitemap back to top share this story"
    )
    planted = spark.range(300 * factor).select(
        (F.col("id") + factor * n + 1_000_000).alias("doc_id"),
        F.lit(boiler).alias("text"),
        F.lit("en").alias("lang"),
        F.lit("planted").alias("source"),
        F.lit(len(boiler)).cast("int").alias("n_chars"),
    )
    big_docs.unionByName(planted).write.mode("overwrite").parquet(
        os.path.join(out_dir, "documents.parquet")
    )
    emb = spark.read.parquet(os.path.join(BASE, "embeddings.parquet"))
    m = emb.count()
    big_emb = (
        emb.crossJoin(copies)
        .select(
            (F.col("vec_id") + F.col("_copy") * m).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x, i: x
                + (F.col("_copy").cast("float") * 0.01)
                * F.cos(i.cast("double") + F.col("_copy")).cast("float"),
            ).alias("embedding"),
            "label",
        )
    )
    big_emb.write.mode("overwrite").parquet(
        os.path.join(out_dir, "embeddings.parquet")
    )


def main() -> int:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark("scale-rehearsal")
    spark.sparkContext.setLogLevel("WARN")
    out_dir = tempfile.mkdtemp(prefix="rehearsal-")
    base_dir = tempfile.mkdtemp(prefix="rehearsal-1x-")
    try:
        synth(spark, 1, base_dir)
        synth(spark, factor, out_dir)
        qs = entrymod.queries()
        report = []
        for sf_dir, tag in ((base_dir, "sf0.1"), (out_dir, f"{factor}x")):
            docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
            docs.count()  # warm listing
            t0 = time.time()
            t = build_tables(docs, id_col="doc_id", text_col="text")
            nterms = t.term_stats.count()  # force the build
            report.append((tag, "index_build", time.time() - t0, nterms))
            for op in OPS:
                t0 = time.time()
                cnt = qs[op](spark, sf_dir).count()
                report.append((tag, op, time.time() - t0, cnt))
        print(f"\n{'scale':8s} {'stage':16s} {'wall_s':>8s} {'rows':>10s}")
        by = {}
        for tag, op, w, c in report:
            print(f"{tag:8s} {op:16s} {w:8.1f} {c:10d}")
            by[(tag, op)] = w
        print("\nratios (10x wall / sf0.1 wall; linear == ~10):")
        ok = True
        for op in ["index_build", *OPS]:
            r = by[(f"{factor}x", op)] / by[("sf0.1", op)]
            flag = "" if r <= factor else "  <-- SUPER-LINEAR"
            if r > factor:
                ok = False
            print(f"  {op:16s} {r:5.1f}x{flag}")
        return 0 if ok else 1
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
        shutil.rmtree(base_dir, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
