"""Sloppy phrase (SloppyPhraseScorer semantics, distinct terms).

Golden cases from the reference's own Javadoc
(search/SloppyPhraseScorer.java:83-95): for query "a b"~2 the document
"x a b a y" scores two matches — "a b" at distance 0 and "b a" at
distance 2 — so phraseFreq = 1/1 + 1/3.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lucene_solr_spark.queries.parser import parse_query
from lucene_solr_spark.queries.query import PhraseQuery
from lucene_solr_spark.queries.sloppy import sloppy_phrase_freq


def test_javadoc_golden_case():
    # doc "x a b a y": a at positions 1,3; b at 2
    freq = sloppy_phrase_freq([np.array([1, 3]), np.array([2])], [0, 1], slop=2)
    assert freq == pytest.approx(1.0 + 1.0 / 3.0, abs=1e-6)


def test_exact_alignment_scores_one():
    freq = sloppy_phrase_freq([np.array([5]), np.array([6])], [0, 1], slop=0)
    assert freq == 1.0


def test_out_of_slop_scores_zero():
    freq = sloppy_phrase_freq([np.array([0])], [0], slop=0)
    assert freq == 1.0
    freq = sloppy_phrase_freq([np.array([0]), np.array([10])], [0, 1], slop=3)
    assert freq == 0.0


def test_reversed_within_slop():
    # "a b"~2 on "b a": b at 0, a at 1 -> adjusted a=1, b=-1 -> distance 2
    freq = sloppy_phrase_freq([np.array([1]), np.array([0])], [0, 1], slop=2)
    assert freq == pytest.approx(1.0 / 3.0, abs=1e-6)


@given(
    st.lists(st.integers(0, 60), min_size=1, max_size=8, unique=True),
    st.lists(st.integers(0, 60), min_size=1, max_size=8, unique=True),
)
@settings(max_examples=300, deadline=None)
def test_slop0_counts_exact_alignments(pa, pb):
    """At slop=0 the greedy traversal must find every exact alignment
    (equivalence with ExactPhraseScorer counting for 2 distinct terms)."""
    a = np.array(sorted(pa))
    b = np.array(sorted(pb))
    exact = len(set(a.tolist()) & set((b - 1).tolist()))
    got = sloppy_phrase_freq([a, b], [0, 1], slop=0)
    assert got == pytest.approx(float(exact), abs=1e-6)


def test_parser_slop_syntax():
    q = parse_query('"spark window"~3')
    assert isinstance(q, PhraseQuery) and q.slop == 3


def test_engine_sloppy_superset_of_exact(searcher):
    exact_docs = {
        r["doc_id"] for r in searcher.docs(PhraseQuery(("spark", "window"))).collect()
    }
    sloppy = {
        r["doc_id"]: r["score"]
        for r in searcher.docs(
            PhraseQuery(("spark", "window"), slop=3)
        ).collect()
    }
    assert exact_docs <= set(sloppy)
    assert len(sloppy) > len(exact_docs)  # slop must widen the match set
    assert all(s > 0 for s in sloppy.values())


def test_repeats_exact_alignment():
    """"a b a"~0 on doc "a b a" — one match, hand-traced through the
    SloppyPhraseScorer repeat machinery (collision advances the lesser
    pp, which exhausts; the final window scores 1/1)."""
    a, b = np.array([0, 2]), np.array([1])
    got = sloppy_phrase_freq([a, b], [0, 1, 2], slop=0, term_idx=[0, 1, 0])
    assert got == pytest.approx(1.0)


def test_repeats_adjacent_pair():
    """"a a"~1 on doc "a a a" — windows (0,1) and (1,2), both at
    matchLength 0 (hand-traced): freq = 2.0."""
    a = np.array([0, 1, 2])
    got = sloppy_phrase_freq([a], [0, 1], slop=1, term_idx=[0, 0])
    assert got == pytest.approx(2.0)


def test_repeats_gap_scores_by_distance():
    """"a a"~k on doc "a x a": the two a-pps sit one apart after the
    offset shift (matchLength 1) — no match at slop 0, 1/2 at slop 2."""
    a = np.array([0, 2])
    assert sloppy_phrase_freq([a], [0, 1], slop=0, term_idx=[0, 0]) == 0.0
    got = sloppy_phrase_freq([a], [0, 1], slop=2, term_idx=[0, 0])
    assert got == pytest.approx(0.5)


def test_repeats_insufficient_positions():
    """A group of 3 pps over a term with only 2 positions cannot
    initialize (advanceRepeatGroups exhausts) — freq 0."""
    a = np.array([4, 9])
    got = sloppy_phrase_freq([a], [0, 1, 2], slop=5, term_idx=[0, 0, 0])
    assert got == 0.0


def test_repeats_random_stress():
    """Random phrases with repeated terms terminate and return sane
    freqs; exact self-phrase "t t ... t"~0 over positions 0..k-1
    scores exactly 1 (one aligned window)."""
    import random

    rng = random.Random(7)
    for _ in range(300):
        n_terms = rng.randint(1, 3)
        lists = [
            np.array(
                sorted(rng.sample(range(20), rng.randint(1, 6))),
                dtype=np.int64,
            )
            for _ in range(n_terms)
        ]
        n_pos = rng.randint(2, 5)
        tidx = [rng.randrange(n_terms) for _ in range(n_pos)]
        offs = list(range(n_pos))
        slop = rng.randint(0, 6)
        freq = sloppy_phrase_freq(lists, offs, slop, tidx)
        assert freq >= 0.0

    for k in (2, 3, 4):
        pos = np.arange(k, dtype=np.int64)
        got = sloppy_phrase_freq([pos], list(range(k)), 0, [0] * k)
        assert got == pytest.approx(1.0), k


def test_engine_repeated_terms_scores(searcher):
    rows = searcher.docs(PhraseQuery(("spark", "spark"), slop=4)).collect()
    # repeats no longer raise; any doc with two 'spark' occurrences
    # within the slop window scores positively
    assert all(r["score"] > 0 for r in rows)
    assert len(rows) > 0


# ------------------------------------------------------- batch kernel
from lucene_solr_spark.queries.sloppy import sloppy_phrase_freq_batch  # noqa: E402


def _batch_vs_scalar(cols, offsets, slop, tidx):
    D = len(cols[0])
    batch = sloppy_phrase_freq_batch(cols, offsets, slop, tidx)
    for d in range(D):
        lists = [
            np.asarray(c[d] if c[d] is not None else [], dtype=np.int64)
            for c in cols
        ]
        ref = sloppy_phrase_freq(lists, offsets, slop, tidx)
        assert batch[d] == ref, (d, ref, batch[d])


@settings(max_examples=200, deadline=None)
@given(st.data())
def test_batch_kernel_equals_scalar(data):
    """Doc-parallel batch state machine == per-doc reference port,
    bit-for-bit (float32 equality), over random position lists incl.
    repeated terms, None docs, ties, and adjusted-position collisions."""
    n_uniq = data.draw(st.integers(1, 3))
    n_pp = data.draw(st.integers(1, 4))
    tidx = [data.draw(st.integers(0, n_uniq - 1)) for _ in range(n_pp)]
    offsets = data.draw(
        st.lists(
            st.integers(0, 7), min_size=n_pp, max_size=n_pp, unique=True
        )
    )
    slop = data.draw(st.integers(0, 6))
    D = data.draw(st.integers(1, 12))
    cols = []
    for _ in range(n_uniq):
        col = np.empty(D, dtype=object)
        for d in range(D):
            ps = data.draw(
                st.lists(st.integers(0, 20), max_size=6, unique=True)
            )
            col[d] = (
                None
                if not ps and data.draw(st.booleans())
                else np.array(sorted(ps), dtype=np.int64)
            )
        cols.append(col)
    _batch_vs_scalar(cols, offsets, slop, tidx)


def test_batch_kernel_repeats_dense_collisions():
    """Dense repeated-terms stress: every doc drives the collision /
    rptStack machinery; exact float32 agreement with the scalar."""
    import random

    rng = random.Random(11)
    for _ in range(60):
        D = rng.randint(1, 25)
        col = np.empty(D, dtype=object)
        for d in range(D):
            col[d] = np.array(
                sorted(rng.sample(range(12), rng.randint(2, 8))),
                dtype=np.int64,
            )
        n_pp = rng.randint(2, 4)
        tidx = [0] * n_pp  # all phrase positions share ONE term
        offs = sorted(rng.sample(range(6), n_pp))
        slop = rng.randint(0, 8)
        _batch_vs_scalar([col], offs, slop, tidx)


# ------------------------------------------- batch kernel: MTP branch
from lucene_solr_spark.queries.sloppy import (  # noqa: E402
    sloppy_phrase_freq_slots,
)


def _batch_vs_scalar_slots(cols, offsets, slop, tidx, tsets):
    D = len(cols[0])
    batch = sloppy_phrase_freq_batch(cols, offsets, slop, tidx, tsets)
    for d in range(D):
        pls = [
            np.asarray(
                cols[tidx[j]][d] if cols[tidx[j]][d] is not None else [],
                dtype=np.int64,
            )
            for j in range(len(offsets))
        ]
        ref = sloppy_phrase_freq_slots(pls, offsets, slop, tsets)
        assert batch[d] == ref, (d, ref, batch[d])


@settings(max_examples=200, deadline=None)
@given(st.data())
def test_batch_mtp_equals_scalar_slots(data):
    """MultiPhrase slots shape: the doc-parallel kernel with term_sets
    (connected-component repeat groups + vectorized iterative init) ==
    the per-doc generalized slots engine, bit-for-bit, over random
    multi-term slots incl. repeating terms that touch multi-term slots
    (hasMultiTermRpts), duplicate offsets, and dense collisions."""
    n_terms = data.draw(st.integers(1, 4))
    n_pp = data.draw(st.integers(2, 4))
    slots = [
        frozenset(
            data.draw(
                st.sets(
                    st.integers(0, n_terms - 1), min_size=1, max_size=3
                )
            )
        )
        for _ in range(n_pp)
    ]
    # duplicate offsets ALLOWED — pins the lesser() full-tie branch
    offsets = [data.draw(st.integers(0, 5)) for _ in range(n_pp)]
    slop = data.draw(st.integers(0, 6))
    D = data.draw(st.integers(1, 10))
    key_ids: dict = {}
    tidx = [key_ids.setdefault(tuple(sorted(s)), len(key_ids)) for s in slots]
    cols = []
    for _ in range(len(key_ids)):
        col = np.empty(D, dtype=object)
        for d in range(D):
            ps = data.draw(
                st.lists(st.integers(0, 16), max_size=6, unique=True)
            )
            col[d] = np.array(sorted(ps), dtype=np.int64)
        cols.append(col)
    _batch_vs_scalar_slots(cols, offsets, slop, tidx, slots)


def test_batch_mtp_dense_collision_stress():
    """Dense MTP stress: repeating terms always touch a multi-term
    slot, positions drawn from a tiny range so every doc exercises the
    iterative init + rptStack machinery."""
    import random

    rng = random.Random(23)
    for _ in range(80):
        n_terms = rng.randint(2, 4)
        n_pp = rng.randint(2, 4)
        # force hasMultiTermRpts: slot 0 is multi-term and shares a
        # term with slot 1
        t0, t1 = rng.sample(range(n_terms), 2)
        slots = [frozenset([t0, t1]), frozenset([t0])]
        for _ in range(n_pp - 2):
            slots.append(
                frozenset(
                    rng.sample(range(n_terms), rng.randint(1, n_terms))
                )
            )
        offs = [rng.randint(0, 4) for _ in range(n_pp)]
        slop = rng.randint(0, 8)
        D = rng.randint(1, 20)
        key_ids: dict = {}
        tidx = [
            key_ids.setdefault(tuple(sorted(s)), len(key_ids))
            for s in slots
        ]
        cols = []
        for _ in range(len(key_ids)):
            col = np.empty(D, dtype=object)
            for d in range(D):
                col[d] = np.array(
                    sorted(rng.sample(range(10), rng.randint(1, 7))),
                    dtype=np.int64,
                )
            cols.append(col)
        _batch_vs_scalar_slots(cols, offs, slop, tidx, list(slots))


def test_batch_kernel_duplicate_slot_full_tie():
    """ADVICE r4: two repeat-group pps with equal adjusted position AND
    equal query offset (duplicate slot) must resolve via the scalar's
    `else j2` branch, not the heap ordinal.  Deterministic pin plus a
    randomized sweep with duplicate (term, offset) pairs."""
    import random

    # duplicate (term, offset): both pps identical → every collision is
    # a full tie
    col = np.empty(3, dtype=object)
    col[0] = np.array([0, 1, 2, 5], dtype=np.int64)
    col[1] = np.array([3, 4], dtype=np.int64)
    col[2] = np.array([7], dtype=np.int64)
    for slop in range(0, 6):
        _batch_vs_scalar([col], [2, 2], slop, [0, 0])
        _batch_vs_scalar([col], [1, 1, 3], slop, [0, 0, 0])

    rng = random.Random(7)
    for _ in range(60):
        D = rng.randint(1, 15)
        col = np.empty(D, dtype=object)
        for d in range(D):
            col[d] = np.array(
                sorted(rng.sample(range(10), rng.randint(2, 7))),
                dtype=np.int64,
            )
        n_pp = rng.randint(2, 4)
        off0 = rng.randint(0, 3)
        offs = [off0, off0] + [
            rng.randint(0, 5) for _ in range(n_pp - 2)
        ]
        tidx = [0] * n_pp
        _batch_vs_scalar([col], offs, rng.randint(0, 8), tidx)
