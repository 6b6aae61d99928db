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


# ---------------------------------------------------------------------------
# lookup3ycs64 (solr/common/util/Hash.java) — C-derived vectors
# ---------------------------------------------------------------------------

def test_lookup3ycs_c_vectors():
    """TestHash.testEqualsLOOKUP3: hashword() outputs from lookup3.c
    for prefixes of "hello world" at seed i*12345; ycs variants take
    initval + (len<<2)."""
    from lucene_solr_spark.functions.lookup3 import lookup3ycs, lookup3ycs64

    hashes = [0xC4C20DD5, 0x3AB04CC3, 0xEBE874A3, 0x0E770EF3, 0xEC321498,
              0x73845E86, 0x8A2DB728, 0x03C313BB, 0xFE5B9199, 0x95965125,
              0xCBC4E7C2]
    s = "hello world"
    for i in range(len(s)):
        ln = i + 1
        seed = i * 12345 + (ln << 2)
        got = lookup3ycs(s[:ln], seed)
        want = hashes[i] - (1 << 32) if hashes[i] >= (1 << 31) else hashes[i]
        assert got == want, (i, hex(got & 0xFFFFFFFF))
        # low 32 bits of the 64-bit variant agree at the same seed
        assert (lookup3ycs64(s[:ln], seed) & 0xFFFFFFFF) == hashes[i]


def test_lookup3_signature_chaining():
    from lucene_solr_spark.functions.lookup3 import (
        lookup3_signature,
        lookup3ycs64,
    )

    # each add() seeds with the previous hash (Lookup3Signature.add)
    h1 = lookup3ycs64("field one", 0)
    h2 = lookup3ycs64("field two", h1)
    assert lookup3_signature("field one", "field two") == h2.to_bytes(8, "big").hex()
    # order sensitivity
    assert lookup3_signature("a", "b") != lookup3_signature("b", "a")


def test_lookup3_signature_df(spark):
    from lucene_solr_spark.functions.lookup3 import (
        lookup3_signature,
        lookup3_signature_df,
    )

    df = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, "other")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r["signature"]
           for r in lookup3_signature_df(df).collect()}
    assert out[1] == out[2] == lookup3_signature("same text")
    assert out[3] != out[1]
