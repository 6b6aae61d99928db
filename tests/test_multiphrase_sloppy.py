"""Sloppy MultiPhraseQuery goldens mirroring the reference's
TestMultiPhraseQuery (lucene/core/src/test/org/apache/lucene/search/
TestMultiPhraseQuery.java:60-128): per-slot term alternatives with
slop route through the SloppyPhraseScorer machinery over each slot's
union postings (MultiPhraseQuery.java:55,83-90)."""

from __future__ import annotations

import numpy as np
import pytest

from lucene_solr_spark.index import build_tables
from lucene_solr_spark.queries import IndexSearcher
from lucene_solr_spark.queries.query import MultiPhraseQuery
from lucene_solr_spark.queries.sloppy import sloppy_phrase_freq


@pytest.fixture(scope="module")
def pizza_searcher(spark):
    # TestMultiPhraseQuery.testPhrasePrefix corpus
    rows = [
        (0, "blueberry pie"),
        (1, "blueberry strudel"),
        (2, "blueberry pizza"),
        (3, "blueberry chewing gum"),
        (4, "bluebird pizza"),
        (5, "bluebird foobar pizza"),
        (6, "piccadilly circus"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return IndexSearcher(build_tables(df, id_col="doc_id", text_col="text"))


def test_slop0_prefix_disjunction(pizza_searcher):
    # "(blueberry bluebird) pizza" slop=0 → blueberry pizza, bluebird pizza
    q = MultiPhraseQuery((("blueberry", "bluebird"), ("pizza",)))
    got = {r["doc_id"] for r in pizza_searcher.docs(q).collect()}
    assert got == {2, 4}


def test_slop1_reaches_gapped_doc(pizza_searcher):
    # setSlop(1) → blueberry pizza, bluebird pizza, bluebird foobar pizza
    # (TestMultiPhraseQuery.java:120-128)
    q = MultiPhraseQuery((("blueberry", "bluebird"), ("pizza",)), slop=1)
    got = {r["doc_id"] for r in pizza_searcher.docs(q).collect()}
    assert got == {2, 4, 5}


def test_negative_slop_rejected():
    # Builder.setSlop rejects negatives (MultiPhraseQuery.java:84-86)
    with pytest.raises(ValueError):
        MultiPhraseQuery((("a",), ("b",)), slop=-1)


def test_overlapping_slots_use_mtp_branch(pizza_searcher):
    # a term shared across slots takes the reference's multi-term
    # repeat branch (SloppyPhraseScorer MTP) — implemented; doc 2
    # 'blueberry pizza' satisfies slot1=blueberry@0 slot2=pizza@1
    q = MultiPhraseQuery((("pizza", "blueberry"), ("pizza",)), slop=2)
    got = {r["doc_id"] for r in pizza_searcher.docs(q).collect()}
    assert 2 in got


def test_sloppy_freq_matches_union_postings_kernel(pizza_searcher):
    """Engine freq for the slop=1 multi-phrase equals the scalar sloppy
    kernel run over hand-built union position lists, doc by doc."""
    corpus = {
        0: "blueberry pie",
        1: "blueberry strudel",
        2: "blueberry pizza",
        3: "blueberry chewing gum",
        4: "bluebird pizza",
        5: "bluebird foobar pizza",
        6: "piccadilly circus",
    }
    slots = (("blueberry", "bluebird"), ("pizza",))
    q = MultiPhraseQuery(slots, slop=1)
    rows = {r["doc_id"]: r["score"] for r in pizza_searcher.docs(q).collect()}
    for doc_id, text in corpus.items():
        toks = text.split()
        lists = []
        for slot in slots:
            ps = sorted(i for i, t in enumerate(toks) if t in slot)
            lists.append(np.asarray(ps, dtype=np.int64))
        expected = (
            0.0
            if any(len(p) == 0 for p in lists)
            else sloppy_phrase_freq(lists, [0, 1], 1)
        )
        assert (doc_id in rows) == (expected > 0.0), (doc_id, expected)


# ------------------------------------------------- multi-term repeats
def _union(P, *ts):
    return np.asarray(sorted(set(sum((P[t] for t in ts), []))), dtype=np.int64)


def test_zero_pos_incr_goldens():
    """TestMultiPhraseQuery.testZeroPosIncrSloppy{PqAnd,MpqAnd,
    MpqAndOrMatch,MpqAndOrNoMatch}: the canned doc
    'x a|1 m b|1 n c y' (incr-0 pairs), hits iff slop ≥ 2 for the
    matching shapes, never for the NO_MATCH shape."""
    from lucene_solr_spark.queries.sloppy import sloppy_phrase_freq_slots

    # positions from INCR_0_DOC_TOKENS: x@0 a@1 1@1 m@2 b@3 1@3 n@4 c@5 y@6
    P = {"x": [0], "a": [1], "1": [1, 3], "m": [2], "b": [3], "1b": [3],
         "n": [4], "c": [5], "y": [6]}
    offs = [0, 0, 1, 1, 2]

    # PQ/MPQ AND: (a)@0 (1)@0 (b)@1 (1)@1 (c)@2 — single-term repeats
    slots = [_union(P, "a"), _union(P, "1"), _union(P, "b"),
             _union(P, "1"), _union(P, "c")]
    ts = [frozenset(["a"]), frozenset(["1"]), frozenset(["b"]),
          frozenset(["1"]), frozenset(["c"])]
    for slop, hits in ((0, 0), (1, 0), (2, 1)):
        f = sloppy_phrase_freq_slots(slots, offs, slop, ts)
        assert (f > 0) == (hits > 0), (slop, f)

    # MPQ AND_OR MATCH: {a}@0 {x,1}@0 {b}@1 {x,1}@1 {c}@2 — the
    # multi-term repeat branch (connected groups + iterative init)
    slots = [_union(P, "a"), _union(P, "x", "1"), _union(P, "b"),
             _union(P, "x", "1"), _union(P, "c")]
    ts = [frozenset(["a"]), frozenset(["x", "1"]), frozenset(["b"]),
          frozenset(["x", "1"]), frozenset(["c"])]
    for slop, hits in ((0, 0), (1, 0), (2, 1)):
        f = sloppy_phrase_freq_slots(slots, offs, slop, ts)
        assert (f > 0) == (hits > 0), (slop, f)

    # MPQ AND_OR NO_MATCH: {x}@0 {a,1}@0 {x}@1 {b,1}@1 {c}@2
    slots = [_union(P, "x"), _union(P, "a", "1"), _union(P, "x"),
             _union(P, "b", "1"), _union(P, "c")]
    ts = [frozenset(["x"]), frozenset(["a", "1"]), frozenset(["x"]),
          frozenset(["b", "1"]), frozenset(["c"])]
    for slop in (0, 2):
        assert sloppy_phrase_freq_slots(slots, offs, slop, ts) == 0.0


def test_engine_multi_term_repeats(pizza_searcher):
    """Overlapping slot term sets route through the per-doc MTP engine
    instead of raising: {blueberry,pizza} {pizza} finds the adjacent
    pair, and repeated singleton slots use the batch kernel."""
    q = MultiPhraseQuery((("blueberry", "pizza"), ("pizza",)), slop=2)
    got = {r["doc_id"] for r in pizza_searcher.docs(q).collect()}
    # doc 2 'blueberry pizza': slot1 matches blueberry@0 (or pizza@1),
    # slot2 pizza@1 — within slop.  docs 4/5 match via bluebird? no —
    # slot1 has no bluebird, but pizza@1 / pizza@2 serve slot1 with
    # slot2 colliding → repeat machinery must refuse the same token
    # for both slots (single pizza occurrence can't fill both).
    assert 2 in got
    assert 6 not in got and 0 not in got
    # repeated singleton slots: (pizza)(pizza) needs TWO occurrences —
    # no doc in this corpus has two
    q2 = MultiPhraseQuery((("pizza",), ("pizza",)), slop=3)
    assert pizza_searcher.docs(q2).count() == 0


def test_mtp_random_stress_properties():
    """Random overlapping-slot shapes through the full MTP machinery:
    never crashes, freq ≥ 0, and freq is MONOTONE nondecreasing in
    slop (a window scored at slop s is scored at every s' > s — the
    traversal only ever adds score events as slop grows)."""
    import random

    from lucene_solr_spark.queries.sloppy import sloppy_phrase_freq_slots

    rng = random.Random(23)
    terms = list("abcdef")
    for _ in range(300):
        n_pp = rng.randint(2, 4)
        tsets = []
        for _j in range(n_pp):
            k = rng.randint(1, 3)
            tsets.append(frozenset(rng.sample(terms, k)))
        positions = {t: sorted(rng.sample(range(15), rng.randint(1, 5)))
                     for t in terms}
        slots = []
        for s in tsets:
            u = sorted(set(sum((positions[t] for t in s), [])))
            slots.append(np.asarray(u, dtype=np.int64))
        offs = sorted(rng.sample(range(8), n_pp))
        prev = -1.0
        for slop in range(0, 8):
            f = sloppy_phrase_freq_slots(slots, offs, slop, tsets)
            assert f >= 0.0
            assert f >= prev - 1e-6, (tsets, offs, slop, prev, f)
            prev = f
