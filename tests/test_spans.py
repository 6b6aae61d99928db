"""Span queries — golden traversal cases + Spark integration.

Golden expectations are hand-derived from the reference algorithms
(spans/NearSpansOrdered.java, NearSpansUnordered.java, SpanNotQuery.java,
SpanFirstQuery.java, SpanScorer.java) — see each case's comment for the
step-by-step trace.
"""

from __future__ import annotations

import numpy as np
import pytest

from lucene_solr_spark.queries.query import PhraseQuery, TermQuery
from lucene_solr_spark.queries.spans import (
    SpanFirstQuery,
    SpanNearQuery,
    SpanNotQuery,
    SpanOrQuery,
    SpanTermQuery,
    eval_spans,
    span_freq,
    span_terms,
)


def P(**kw):
    return {k: np.asarray(v, dtype=np.int64) for k, v in kw.items()}


A = SpanTermQuery("a")
B = SpanTermQuery("b")
C = SpanTermQuery("c")


# ------------------------------------------------------------ pure kernel
class TestEvalSpans:
    def test_term_spans_width_zero(self):
        # TermSpans.width() == 0 (TermSpans.java:110-112)
        assert eval_spans(A, P(a=[0, 3, 7])) == [(0, 1, 0), (3, 4, 0), (7, 8, 0)]
        assert eval_spans(A, P(b=[1])) == []

    def test_ordered_adjacent(self):
        # "a b" on doc a@0 b@1: gap 0
        q = SpanNearQuery((A, B), slop=0, in_order=True)
        assert eval_spans(q, P(a=[0], b=[1])) == [(0, 2, 0)]

    def test_ordered_gap_and_slop(self):
        # doc: a . . b  → gap = 2; matches only at slop >= 2
        q1 = SpanNearQuery((A, B), slop=1, in_order=True)
        q2 = SpanNearQuery((A, B), slop=2, in_order=True)
        pos = P(a=[0], b=[3])
        assert eval_spans(q1, pos) == []
        assert eval_spans(q2, pos) == [(0, 4, 2)]

    def test_ordered_stateful_pointer(self):
        # "a a b", near(a, b) slop=0: a@0 advances b-pointer to (2,3)
        # with width 1 (no match), a@1 sees the SAME b span (pointer
        # never rewinds — NearSpansOrdered.java:120-128) width 0 → match
        q = SpanNearQuery((A, B), slop=0, in_order=True)
        assert eval_spans(q, P(a=[0, 1], b=[2])) == [(1, 3, 0)]

    def test_ordered_driver_order(self):
        # "b a b a": near(b, a) slop=0 matches at both b positions
        q = SpanNearQuery((B, A), slop=0, in_order=True)
        assert eval_spans(q, P(b=[0, 2], a=[1, 3])) == [(0, 2, 0), (2, 4, 0)]

    def test_ordered_non_overlap_required(self):
        # near(a, a) ordered would need two distinct positions — with a
        # single sub-list per clause both clauses share the positions
        q = SpanNearQuery((A, A), slop=5, in_order=True)
        # a@0: clause2 advances to start >= 1 → a@4, width 3 ≤ 5 → match
        # a@4: clause2 needs start >= 5 → exhausted
        assert eval_spans(q, P(a=[0, 4])) == [(0, 5, 3)]

    def test_unordered_reversed(self):
        # "b x a": unordered near(a, b) slop=1:
        # window b@(0,1), a@(2,3); top=b: maxEnd(3) - 0 - totalLen(2)=1 ≤ 1
        # → match (0, 3, width=3); advance b → exhausted
        q = SpanNearQuery((A, B), slop=1, in_order=False)
        assert eval_spans(q, P(b=[0], a=[2])) == [(0, 3, 3)]
        # slop=0 rejects it
        q0 = SpanNearQuery((A, B), slop=0, in_order=False)
        assert eval_spans(q0, P(b=[0], a=[2])) == []

    def test_unordered_multiple(self):
        # "a b a": unordered (a,b) slop=0:
        # window a@0,b@1: 2-0-2=0 → match (0,2,2); advance a→2
        # window b@1,a@2: 3-1-2=0 → match (1,3,2); advance b → exhausted
        q = SpanNearQuery((A, B), slop=0, in_order=False)
        assert eval_spans(q, P(a=[0, 2], b=[1])) == [(0, 2, 2), (1, 3, 2)]

    def test_span_or_merges_sorted(self):
        q = SpanOrQuery((A, B))
        assert eval_spans(q, P(a=[0, 5], b=[2])) == [
            (0, 1, 0),
            (2, 3, 0),
            (5, 6, 0),
        ]

    def test_span_not(self):
        # keep a-spans not colliding with b-spans (pre=post=0: only an
        # overlapping exclude rejects — same position for term spans)
        q = SpanNotQuery(A, B)
        assert eval_spans(q, P(a=[0, 2, 4], b=[2])) == [(0, 1, 0), (4, 5, 0)]

    def test_span_not_pre_post(self):
        # pre=1: exclude ending within 1 before candidate start rejects
        q = SpanNotQuery(A, B, pre=1, post=0)
        # b@1 ends at 2 > (3-1)=2? exclude.end (2) <= cand.start - pre (2)
        # → advanced past; accept.  b@2 ends at 3 > 2 → overlap window,
        # cand.end+post (4) <= exclude.start (2)? no → reject.
        assert eval_spans(q, P(a=[3], b=[1])) == [(3, 4, 0)]
        assert eval_spans(q, P(a=[3], b=[2])) == []

    def test_span_first(self):
        q = SpanFirstQuery(A, end=3)
        assert eval_spans(q, P(a=[0, 2, 3, 9])) == [(0, 1, 0), (2, 3, 0)]

    def test_nested_near(self):
        # near(near(a,b,0,ordered), c, slop=1, ordered) on "a b x c"
        inner = SpanNearQuery((A, B), slop=0, in_order=True)
        outer = SpanNearQuery((inner, C), slop=1, in_order=True)
        assert eval_spans(outer, P(a=[0], b=[1], c=[3])) == [(0, 4, 1)]

    def test_span_freq_float32_slop_factors(self):
        # Javadoc semantics: freq = Σ 1/(1+width)
        q = SpanNearQuery((A, B), slop=2, in_order=True)
        # a@0→b@1 width 0 (1.0); a@4→b@7 width 2 (1/3)
        f = span_freq(q, P(a=[0, 4], b=[1, 7]))
        assert f == pytest.approx(float(np.float32(1.0) + np.float32(1 / 3)))

    def test_span_terms_distinct_ordered(self):
        q = SpanOrQuery((SpanNearQuery((A, B)), SpanNearQuery((B, C))))
        assert span_terms(q) == ["a", "b", "c"]


# ------------------------------------------------------------ integration
@pytest.fixture(scope="module")
def span_searcher(spark):
    from lucene_solr_spark.index import build_tables
    from lucene_solr_spark.queries import IndexSearcher

    rows = [
        (0, "spark window merge"),
        (1, "window spark spark"),
        (2, "spark stream window window"),
        (3, "merge stream batch"),
        (4, "spark a window"),  # stopword gap: spark@0, window@2
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return IndexSearcher(build_tables(df, id_col="doc_id", text_col="text"))


def _hits(df):
    return {r["doc_id"]: r["score"] for r in df.collect()}


class TestSpanSearch:
    def test_span_term_equals_term_query(self, span_searcher):
        st = _hits(span_searcher.docs(SpanTermQuery("spark")))
        tq = _hits(span_searcher.docs(TermQuery("spark")))
        assert st == tq  # width 0 ⇒ freq == tf ⇒ identical BM25

    def test_ordered_near_slop0_equals_phrase(self, span_searcher):
        sp = _hits(
            span_searcher.docs(
                SpanNearQuery(
                    (SpanTermQuery("spark"), SpanTermQuery("window")),
                    slop=0,
                    in_order=True,
                )
            )
        )
        ph = _hits(span_searcher.docs(PhraseQuery(("spark", "window"))))
        assert sp == ph
        # doc 2 has a term between; doc 4 a stopword position gap
        assert set(sp) == {0}

    def test_ordered_near_slop_spans_stopword_gap(self, span_searcher):
        sp = _hits(
            span_searcher.docs(
                SpanNearQuery(
                    (SpanTermQuery("spark"), SpanTermQuery("window")),
                    slop=1,
                    in_order=True,
                )
            )
        )
        assert set(sp) == {0, 2, 4}

    def test_unordered_near(self, span_searcher):
        sp = _hits(
            span_searcher.docs(
                SpanNearQuery(
                    (SpanTermQuery("spark"), SpanTermQuery("window")),
                    slop=0,
                    in_order=False,
                )
            )
        )
        # doc1: window@0 spark@1 adjacent reversed → matches unordered;
        # doc2 has an intervening term (width 1 > slop 0)
        assert set(sp) == {0, 1}

    def test_span_not_and_first(self, span_searcher):
        notq = SpanNotQuery(SpanTermQuery("window"), SpanTermQuery("spark"))
        assert set(_hits(span_searcher.docs(notq))) == {0, 1, 2, 4}
        firstq = SpanFirstQuery(SpanTermQuery("window"), end=1)
        assert set(_hits(span_searcher.docs(firstq))) == {1}

    def test_span_or_counts(self, span_searcher):
        orq = SpanOrQuery((SpanTermQuery("merge"), SpanTermQuery("batch")))
        assert set(_hits(span_searcher.docs(orq))) == {0, 3}

    def test_match_and_count(self, span_searcher):
        q = SpanNearQuery(
            (SpanTermQuery("spark"), SpanTermQuery("window")), slop=0, in_order=True
        )
        assert span_searcher.count(q) == 1


class TestBatchEquivalence:
    """eval_spans_batch must emit exactly the per-doc evaluator's spans
    (same docs, same (start, end, width), same order) on randomized
    corpora and span trees."""

    def _random_tree(self, rng, vocab, depth=0):
        import random as _r

        kind = rng.choice(
            ["term", "near_o", "near_u", "or", "not", "first"]
            if depth < 2
            else ["term"]
        )
        if kind == "term":
            return SpanTermQuery(rng.choice(vocab))
        if kind in ("near_o", "near_u"):
            n = rng.randint(2, 3)
            return SpanNearQuery(
                tuple(self._random_tree(rng, vocab, depth + 1) for _ in range(n)),
                slop=rng.randint(0, 4),
                in_order=(kind == "near_o"),
            )
        if kind == "or":
            n = rng.randint(2, 3)
            return SpanOrQuery(
                tuple(self._random_tree(rng, vocab, depth + 1) for _ in range(n))
            )
        if kind == "not":
            return SpanNotQuery(
                self._random_tree(rng, vocab, depth + 1),
                self._random_tree(rng, vocab, depth + 1),
                pre=rng.randint(0, 2),
                post=rng.randint(0, 2),
            )
        return SpanFirstQuery(self._random_tree(rng, vocab, depth + 1),
                              end=rng.randint(1, 8))

    def test_random_equivalence(self):
        import random

        import numpy as np

        from lucene_solr_spark.queries.spans import (
            batch_from_position_lists,
            eval_spans,
            eval_spans_batch,
        )

        rng = random.Random(42)
        vocab = ["a", "b", "c", "d"]
        for trial in range(200):
            n_docs = rng.randint(1, 8)
            docs = []
            for _ in range(n_docs):
                n_tok = rng.randint(0, 12)
                docs.append([rng.choice(vocab) for _ in range(n_tok)])
            per_doc = []
            cols = {t: [] for t in vocab}
            for toks in docs:
                pos = {
                    t: np.asarray(
                        [i for i, x in enumerate(toks) if x == t], dtype=np.int64
                    )
                    for t in vocab
                }
                per_doc.append({t: p for t, p in pos.items() if len(p)})
                for t in vocab:
                    cols[t].append(pos[t] if len(pos[t]) else None)
            batches = {
                t: batch_from_position_lists(cols[t]) for t in vocab
            }
            q = self._random_tree(rng, vocab)
            off, bs, be, bw = eval_spans_batch(q, batches, n_docs)
            for d in range(n_docs):
                ref = eval_spans(q, per_doc[d])
                a, z = int(off[d]), int(off[d + 1])
                got = list(zip(bs[a:z].tolist(), be[a:z].tolist(), bw[a:z].tolist()))
                assert got == ref, (
                    f"trial {trial} doc {d} q={q}: batch={got} ref={ref}"
                )
