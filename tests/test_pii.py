"""PII redaction, C4 cleaning, deterministic split (functions/pii.py)."""

from __future__ import annotations

import pyspark.sql.functions as F

from lucene_solr_spark.functions.pii import c4_clean, hash_split, pii_redact


def test_pii_redact_masks_and_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "write to bob@corp.example.org or alice@a.io today"),
            (2, "ssn 123-45-6789 phone 555-123-4567 ip 192.168.0.1"),
            (3, "nothing sensitive here"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in pii_redact(df).collect()}
    assert rows[1]["n_email"] == 2
    assert "|||EMAIL|||" in rows[1]["text"]
    assert "bob@" not in rows[1]["text"]
    assert (rows[2]["n_ssn"], rows[2]["n_phone"], rows[2]["n_ipv4"]) == (1, 1, 1)
    assert "|||SSN|||" in rows[2]["text"]
    assert "|||PHONE|||" in rows[2]["text"]
    assert "|||IP|||" in rows[2]["text"]
    assert rows[3]["text"] == "nothing sensitive here"
    assert (
        rows[3]["n_email"],
        rows[3]["n_ssn"],
        rows[3]["n_phone"],
        rows[3]["n_ipv4"],
    ) == (0, 0, 0, 0)


def test_c4_rules(spark):
    keep = "this good line has five words.\nanother line with enough words.\na third fine line right here."
    df = spark.createDataFrame(
        [
            (1, keep),
            (2, keep + "\nlorem ipsum dolor sit amet."),  # page drop
            (3, keep + "\nif (x) { y }."),  # page drop: '{'
            (4, "too short.\nno terminal punct line\nonly one good line stays here."),  # < 3 kept lines
            (5, keep + "\nplease enable javascript to continue now."),  # line drop only
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["text"] for r in c4_clean(df).collect()}
    assert set(out) == {1, 5}
    assert out[1] == keep
    assert out[5] == keep  # javascript line removed, page survives


def test_hash_split_deterministic_and_complete(spark):
    df = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
    a = hash_split(df).collect()
    b = hash_split(df).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    splits = {r["split"] for r in a}
    assert splits == {"train", "val", "test"}
    by = {r["doc_id"]: r for r in a}
    for r in a:
        if r["bucket"] >= 90:
            assert r["split"] == "test"
        elif r["bucket"] >= 80:
            assert r["split"] == "val"
        else:
            assert r["split"] == "train"
    # roughly proportional (md5 is uniform; wide tolerance, no flake)
    n_train = sum(1 for r in a if r["split"] == "train")
    assert 300 <= n_train <= 460
    assert by[42]["bucket"] == 84  # pinned cross-engine value


def test_weighted_sample_deterministic_and_rate(spark):
    from lucene_solr_spark.functions.pii import weighted_sample

    df = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "de") for i in range(1000)],
        "doc_id long, lang string",
    )
    a = weighted_sample(df, {"en": 0.3}).collect()
    b = weighted_sample(df, {"en": 0.3}).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    en = sum(1 for r in a if r["lang"] == "en")
    de = sum(1 for r in a if r["lang"] == "de")
    assert de == 500  # default rate 1.0 keeps everything
    assert 100 <= en <= 200  # ~0.3 of 500, md5-uniform
    # a different salt draws an independent sample
    c = weighted_sample(df, {"en": 0.3}, salt="other").collect()
    assert sorted(map(tuple, a)) != sorted(map(tuple, c))


def test_leakage_split_hot_cluster_stays_together(spark):
    """The LSH hot-bucket guard's star edges keep every member of a
    planted degenerate cluster (300 identical boilerplate docs + a
    near dup reachable through the representative) in ONE connected
    component, so leakage_safe_split routes the whole cluster to the
    same train/val/test bucket even with the cap engaged."""
    from lucene_solr_spark.functions.dedup import minhash_lsh_pairs
    from lucene_solr_spark.functions.pii import leakage_safe_split

    boiler = (
        "the quick brown fox jumps over the lazy dog again and again"
    )
    rows = [(i, boiler) for i in range(300)]
    rows += [(1000, "completely different text with novel words here")]
    rows += [(1001, boiler.replace("dog", "cat"))]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = minhash_lsh_pairs(df, threshold=0.5, max_bucket_size=50)
    out = leakage_safe_split(df, pairs).collect()
    split = {r["doc_id"]: r["split"] for r in out}
    cluster = {split[i] for i in range(300)} | {split[1001]}
    assert len(cluster) == 1, cluster
    # the unrelated doc hashes independently (own id as group key)
    key = {r["doc_id"]: r["group_key"] for r in out}
    assert key[1000] == 1000
    assert len({key[i] for i in range(300)} | {key[1001]}) == 1
