"""Index-build invariants (CheckIndex-style, FIXTURES.md §4):
df/ttf consistency, norm recompute, sha256 preservation, docID stability."""

import numpy as np
from pyspark.sql import functions as F

from lucene_solr_spark.corpus import generate_corpus, with_sha256
from lucene_solr_spark.index import assign_doc_ids, build_tables
from lucene_solr_spark.scoring import encode_norm


def test_term_stats_consistent_with_postings(tables):
    # df == count of postings rows per term; ttf == sum(tf)
    recomputed = tables.postings.groupBy("term").agg(
        F.count("*").alias("df2"), F.sum("tf").alias("ttf2")
    )
    joined = tables.term_stats.join(recomputed, "term", "full")
    bad = joined.filter(
        (F.col("df") != F.col("df2")) | (F.col("ttf") != F.col("ttf2"))
    ).count()
    assert bad == 0


def test_positions_sorted_and_tf_matches(tables):
    pdf = tables.postings.limit(2000).toPandas()
    for _, row in pdf.iterrows():
        pos = list(row["positions"])
        assert pos == sorted(pos)
        assert len(pos) == row["tf"]
        assert len(set(pos)) == len(pos)


def test_norms_match_recompute(tables):
    pdf = tables.doc_norms.toPandas()
    want = encode_norm(pdf["length"].to_numpy())
    assert (pdf["norm_byte"].to_numpy() == want.astype(np.int32)).all()


def test_collection_stats(tables):
    assert tables.stats.doc_count == tables.doc_norms.count()
    sttf = tables.doc_norms.agg(F.sum("length")).collect()[0][0]
    assert tables.stats.sum_total_term_freq == sttf


def test_corpus_sha256_preserved(spark):
    corpus = with_sha256(generate_corpus(spark, 100))
    # invariant column survives the docID assignment + any downstream
    assigned = assign_doc_ids(corpus)
    rows = assigned.select("content", "content_sha256").limit(20).collect()
    import hashlib

    for r in rows:
        assert hashlib.sha256(r["content"].encode()).hexdigest() == r["content_sha256"]


def test_corpus_sha256_roundtrip_full(spark, tmp_path):
    """The north-rule per-row invariant, end-to-end and over EVERY row:
    write the docID-assigned corpus to the parquet store (the Iceberg-
    equivalent stored-fields table), read it back, and require the
    (doc_id, content_sha256) set to match the input exactly — checked
    with distributed anti-joins, no driver-side sampling."""
    corpus = assign_doc_ids(with_sha256(generate_corpus(spark, 300)))
    out = str(tmp_path / "stored")
    corpus.write.mode("overwrite").parquet(out)
    back = spark.read.parquet(out)
    # recompute the hash from the stored content and compare against
    # the carried invariant column (JVM sha2 == input hash per row)
    bad = back.filter(
        F.sha2(F.col("content"), 256) != F.col("content_sha256")
    ).count()
    assert bad == 0
    a = corpus.select("doc_id", "content_sha256")
    b = back.select("doc_id", "content_sha256")
    assert a.join(b, ["doc_id", "content_sha256"], "left_anti").count() == 0
    assert b.join(a, ["doc_id", "content_sha256"], "left_anti").count() == 0
    assert back.count() == corpus.count()


def test_doc_ids_stable_across_runs(spark):
    corpus = generate_corpus(spark, 200)
    a = assign_doc_ids(corpus).select("repo", "path", "doc_id").toPandas()
    b = assign_doc_ids(corpus.repartition(7)).select("repo", "path", "doc_id").toPandas()
    a = a.sort_values(["repo", "path"]).reset_index(drop=True)
    b = b.sort_values(["repo", "path"]).reset_index(drop=True)
    assert (a["doc_id"] == b["doc_id"]).all()  # retry/repartition stable


def test_doc_ids_dense_and_unique(spark):
    corpus = generate_corpus(spark, 150)
    ids = assign_doc_ids(corpus).select("doc_id").toPandas()["doc_id"].to_numpy()
    assert len(np.unique(ids)) == 150
    assert ids.min() == 0 and ids.max() == 149


def test_corpus_deterministic(spark):
    a = generate_corpus(spark, 50).orderBy("path").toPandas()
    b = generate_corpus(spark, 50, partitions=3).orderBy("path").toPandas()
    assert (a["content"] == b["content"]).all()


def test_build_on_synthetic_corpus(spark):
    corpus = assign_doc_ids(generate_corpus(spark, 120))
    t = build_tables(corpus, cache=False)
    assert t.stats.doc_count > 0
    hot = t.term_stats.filter(F.col("term") == "import").collect()
    assert hot and hot[0]["df"] > 10  # Zipf-skewed hot term present
