"""STC search-result clustering (solr/contrib/clustering)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.functions.clustering import (
    base_clusters,
    cluster_results,
    merge_base_clusters,
)


@pytest.fixture(scope="module")
def corpus(spark):
    # docs sharing "hash join" / "merge sort" phrase families
    texts = {
        0: "hash join fast",
        1: "hash join slow",
        2: "hash join again",
        3: "merge sort one",
        4: "merge sort two",
        5: "other words here",
    }
    rows = []
    for d, txt in texts.items():
        toks = txt.split()
        for t in set(toks):
            rows.append(
                (d, t, [i for i, x in enumerate(toks) if x == t])
            )
    postings = spark.createDataFrame(
        rows, "doc_id: bigint, term: string, positions: array<int>"
    )
    cand = spark.createDataFrame(
        [(d,) for d in texts], "doc_id: bigint"
    )
    return postings, cand


def test_base_clusters_scoring(corpus):
    postings, cand = corpus
    out = base_clusters(postings, cand, min_docs=2, top_k=10).collect()
    by_phrase = {r["phrase"]: r for r in out}
    # bigram "hash join" in 3 docs -> score 6, top cluster
    assert by_phrase["hash join"]["score"] == 6
    assert by_phrase["hash join"]["cluster_id"] == 1
    assert by_phrase["merge sort"]["score"] == 4
    # unigram "hash" in 3 docs -> score 3
    assert by_phrase["hash"]["score"] == 3
    assert "other" not in by_phrase  # below min_docs


def test_merge_overlapping_clusters(corpus):
    postings, cand = corpus
    base = base_clusters(postings, cand, min_docs=2, top_k=10)
    merged = merge_base_clusters(base, postings, cand, threshold=0.5)
    groups = {}
    for r in merged.collect():
        groups.setdefault(r["merged_id"], set()).add(r["phrase"])
    comps = list(groups.values())
    # "hash join"/"hash"/"join" share 100% of docs -> one component;
    # same for the merge-sort family; the two families stay apart
    hashc = next(c for c in comps if "hash join" in c)
    assert {"hash", "join", "hash join"} <= hashc
    sortc = next(c for c in comps if "merge sort" in c)
    assert {"merge", "sort", "merge sort"} <= sortc
    assert hashc.isdisjoint(sortc)


def test_cluster_results_labels(corpus):
    postings, cand = corpus
    out = cluster_results(
        postings, cand, min_docs=2, top_k=10
    ).collect()
    labels = [r["label"] for r in out]
    # highest-scoring base phrase labels each final cluster,
    # ranked by best_score
    assert labels[0] == "hash join"
    assert "merge sort" in labels
    top = out[0]
    assert top["best_score"] == 6 and top["n_base"] >= 3
