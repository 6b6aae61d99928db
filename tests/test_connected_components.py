"""Alternating large-star/small-star connected components vs a
pure-Python union-find oracle (Kiveris et al. SoCC'14 semantics:
labels are the component MINIMUM id).
"""

from __future__ import annotations

import random

import pytest

from lucene_solr_spark.functions.dedup import (
    connected_components,
    dedup_clusters,
)


def _uf_labels(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # resolve to component minimum
    return {n: find(n) for n in parent}


def _run(spark, edges: list[tuple[int, int]]) -> dict[int, int]:
    df = spark.createDataFrame(edges, ["ida", "idb"])
    out = connected_components(df).collect()
    return {r["doc_id"]: r["rep"] for r in out}


def test_two_disjoint_chains(spark):
    edges = [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12)]
    assert _run(spark, edges) == _uf_labels(edges)


def test_long_chain_converges_fast(spark):
    # a 40-node path: min-label propagation would need 40 rounds;
    # the star algorithm must finish inside the max_iter=25 budget
    edges = [(i, i + 1) for i in range(40)]
    labels = _run(spark, edges)
    assert set(labels.values()) == {0}
    assert len(labels) == 41


def test_self_loops_and_duplicates_ignored(spark):
    edges = [(5, 5), (1, 2), (2, 1), (1, 2)]
    assert _run(spark, edges) == {1: 1, 2: 1}


def test_randomized_vs_union_find(spark):
    rng = random.Random(42)
    nodes = list(range(60))
    edges = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(70)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    assert _run(spark, edges) == _uf_labels(edges)


def test_cluster_sizes(spark):
    edges = [(1, 2), (2, 3), (7, 8)]
    df = spark.createDataFrame(edges, ["ida", "idb"])
    out = {r["doc_id"]: (r["rep"], r["cluster_size"])
           for r in dedup_clusters(df).collect()}
    assert out == {
        1: (1, 3), 2: (1, 3), 3: (1, 3), 7: (7, 2), 8: (7, 2)
    }


# ---------------------------------------------------------------------------
# TextProfileSignature (update/processor/TextProfileSignature.java)
# ---------------------------------------------------------------------------

def test_text_profile_signature_semantics(spark):
    import hashlib

    from lucene_solr_spark.functions.dedup import text_profile_signature

    # doc 1/2: same quantized profile despite different rare tokens
    # (freq-1 tokens are discarded once maxFreq > 1); doc 3 differs.
    docs = spark.createDataFrame(
        [
            (1, "alpha alpha beta beta gamma!"),
            (2, "alpha alpha beta beta delta?"),
            (3, "omega omega omega"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r["signature"]
           for r in text_profile_signature(docs).collect()}
    # maxFreq=2 -> quant=2; gamma/delta quantize to 0 and drop;
    # profile = "alpha 2\nbeta 2" for docs 1 and 2
    exp12 = hashlib.md5(b"alpha 2\nbeta 2").hexdigest()
    exp3 = hashlib.md5(b"omega 2").hexdigest()  # 3//2*2 = 2
    assert out[1] == exp12 and out[2] == exp12
    assert out[3] == exp3


def test_text_profile_short_tokens_and_empty(spark):
    import hashlib

    from lucene_solr_spark.functions.dedup import (
        signature_dedup,
        text_profile_signature,
    )

    docs = spark.createDataFrame(
        [(1, "ab cd ef"), (2, ""), (3, "xyz")], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r["signature"]
           for r in text_profile_signature(docs).collect()}
    # len<=2 tokens all dropped -> empty profile, like the empty doc
    empty = hashlib.md5(b"").hexdigest()
    assert out[1] == empty and out[2] == empty
    assert out[3] == hashlib.md5(b"xyz 1").hexdigest()  # maxFreq=1 -> quant=1
    kept = {r["doc_id"]: r["kept"] for r in signature_dedup(docs).collect()}
    assert kept == {1: True, 2: False, 3: True}
