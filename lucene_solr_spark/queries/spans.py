"""Span queries — the reference's proximity-query algebra re-expressed.

Spans are (startPosition, endPosition, width) triples per document
(search/spans/Spans.java).  The reference evaluates them as stateful
lazy iterators; at Spark scale the per-doc position arrays are already
materialized columns, so each doc is evaluated by a vectorized batch
kernel (Arrow-batched pandas UDF) running the SAME traversal order as
the reference iterators — which matters, because the greedy stateful
algorithms define WHICH combinations are emitted:

- SpanTermQuery  (spans/SpanTermQuery.java): one span (p, p+1) per
  position; ``width() == 0`` (TermSpans.java:110-112), so each
  occurrence contributes slopFactor 1/(1+0) = 1 and spanTerm freq == tf.
- SpanNearQuery ordered (spans/NearSpansOrdered.java:59-135): the first
  clause drives; ``stretchToOrder`` advances each later clause's
  iterator forward-only until start >= prev.end (non-overlapping, in
  order), accumulating ``matchWidth += start - prev.end``; a match is
  emitted iff matchWidth <= slop, with width = matchWidth.  Iterators
  are NEVER rewound between driver positions (:100-119) — mirrored here
  with persistent index pointers.
- SpanNearQuery unordered (spans/NearSpansUnordered.java:43-165): a
  window (priority queue by (start, end)) over one current span per
  clause; match iff ``maxEnd - top.start - totalSpanLength <= slop``
  (:94), emitting (top.start, maxEnd) with width = maxEnd - top.start
  (:163-165); each step advances the queue top.
- SpanOrQuery (spans/SpanOrQuery.java:325-345): merge union by
  (start, end); each span keeps its own width.
- SpanNotQuery (spans/SpanNotQuery.java:146-186): include spans kept
  unless an exclude span overlaps [start-pre, end+post); the exclude
  iterator advances while ``exclude.end <= candidate.start - pre``
  (:173) and the candidate is accepted iff
  ``candidate.end + post <= exclude.start`` (:181) or excludes ran out.
- SpanFirstQuery (spans/SpanFirstQuery.java:34-46): keep spans with
  ``end <= n``; iteration can stop once ``start >= n`` (:40).

Scoring (spans/SpanScorer.java:84-115): per emitted span,
``freq += computeSlopFactor(width)`` = 1/(1+width)
(BM25Similarity.java:262-264) accumulated in float32; the query weight
is BM25 with idf summed over the tree's DISTINCT terms
(spans/SpanWeight.java buildSimWeight over the termContexts key set).
"""

from __future__ import annotations

import heapq
from dataclasses import dataclass

import numpy as np

from lucene_solr_spark.queries.query import Query


class SpanQuery(Query):
    """Marker base (spans/SpanQuery.java)."""

    __slots__ = ()


@dataclass(frozen=True)
class SpanTermQuery(SpanQuery):
    term: str


@dataclass(frozen=True)
class SpanNearQuery(SpanQuery):
    clauses: tuple[SpanQuery, ...]
    slop: int = 0
    in_order: bool = True

    def __post_init__(self) -> None:
        if len(self.clauses) < 1:
            raise ValueError("SpanNearQuery needs at least one clause")
        if self.slop < 0:
            raise ValueError("slop must be >= 0")


@dataclass(frozen=True)
class SpanOrQuery(SpanQuery):
    clauses: tuple[SpanQuery, ...]


@dataclass(frozen=True)
class SpanNotQuery(SpanQuery):
    include: SpanQuery
    exclude: SpanQuery
    pre: int = 0
    post: int = 0


@dataclass(frozen=True)
class SpanFirstQuery(SpanQuery):
    match: SpanQuery
    end: int


def span_terms(q: SpanQuery) -> list[str]:
    """Distinct terms of the tree in first-seen order (SpanWeight's
    termContexts key set — used for the idf sum and stats round)."""
    out: dict[str, None] = {}

    def walk(n: SpanQuery) -> None:
        if isinstance(n, SpanTermQuery):
            out.setdefault(n.term)
        elif isinstance(n, (SpanNearQuery, SpanOrQuery)):
            for c in n.clauses:
                walk(c)
        elif isinstance(n, SpanNotQuery):
            walk(n.include)
            walk(n.exclude)
        elif isinstance(n, SpanFirstQuery):
            walk(n.match)
        else:  # pragma: no cover
            raise TypeError(f"not a span query: {type(n).__name__}")

    walk(q)
    return list(out)


# A span is (start, end, width).  Lists are in iterator emission order,
# which for every operator here is nondecreasing (start, end).
Span = tuple[int, int, int]


def eval_spans(q: SpanQuery, positions: dict[str, np.ndarray]) -> list[Span]:
    """Enumerate the spans of ``q`` in one document, in the reference
    iterators' emission order."""
    if isinstance(q, SpanTermQuery):
        pos = positions.get(q.term)
        if pos is None:
            return []
        return [(int(p), int(p) + 1, 0) for p in pos]
    if isinstance(q, SpanOrQuery):
        lists = [eval_spans(c, positions) for c in q.clauses]
        return list(heapq.merge(*lists, key=lambda s: (s[0], s[1])))
    if isinstance(q, SpanFirstQuery):
        out = []
        for s in eval_spans(q.match, positions):
            if s[0] >= q.end:  # SpanFirstQuery.java:40 — no later span fits
                break
            if s[1] <= q.end:
                out.append(s)
        return out
    if isinstance(q, SpanNotQuery):
        includes = eval_spans(q.include, positions)
        excludes = eval_spans(q.exclude, positions)
        out = []
        j = 0
        for cand in includes:
            # advance exclude while it ends at/before the guarded window
            while j < len(excludes) and excludes[j][1] <= cand[0] - q.pre:
                j += 1
            if j >= len(excludes) or cand[1] + q.post <= excludes[j][0]:
                out.append(cand)
        return out
    if isinstance(q, SpanNearQuery):
        subs = [eval_spans(c, positions) for c in q.clauses]
        if any(not s for s in subs):
            return []
        if len(subs) == 1:
            return subs[0]
        if q.in_order:
            return _near_ordered(subs, q.slop)
        return _near_unordered(subs, q.slop)
    raise TypeError(f"not a span query: {type(q).__name__}")


def _near_ordered(subs: list[list[Span]], slop: int) -> list[Span]:
    """NearSpansOrdered.java:59-135 with persistent pointers."""
    n = len(subs)
    idx = [0] * n
    out: list[Span] = []
    for first in subs[0]:
        prev_end = first[1]
        width = 0
        for i in range(1, n):
            # advancePosition (:120-128): forward-only, start >= prev_end
            while idx[i] < len(subs[i]) and subs[i][idx[i]][0] < prev_end:
                idx[i] += 1
            if idx[i] >= len(subs[i]):
                return out  # oneExhaustedInCurrentDoc
            s = subs[i][idx[i]]
            width += s[0] - prev_end
            prev_end = s[1]
        if width <= slop:
            out.append((first[0], prev_end, width))
    return out


def _near_unordered(subs: list[list[Span]], slop: int) -> list[Span]:
    """NearSpansUnordered.java:43-165: sliding window, advance the
    queue top until one clause is exhausted."""
    n = len(subs)
    idx = [0] * n
    cur = [subs[i][0] for i in range(n)]
    total_len = sum(s[1] - s[0] for s in cur)
    max_end = max(s[1] for s in cur)
    # queue ordered by (start, end) — positionsOrdered (:105-110); ties
    # cannot collide further because one token occupies one position
    heap = [(cur[i][0], cur[i][1], i) for i in range(n)]
    heapq.heapify(heap)
    out: list[Span] = []
    while True:
        top_start = heap[0][0]
        if max_end - top_start - total_len <= slop:  # atMatch (:93-95)
            out.append((top_start, max_end, max_end - top_start))
        _, _, i = heapq.heappop(heap)
        idx[i] += 1
        if idx[i] >= len(subs[i]):
            return out
        old = cur[i]
        s = cur[i] = subs[i][idx[i]]
        total_len += (s[1] - s[0]) - (old[1] - old[0])
        if s[1] > max_end:
            max_end = s[1]
        heapq.heappush(heap, (s[0], s[1], i))


def span_freq(q: SpanQuery, positions: dict[str, np.ndarray]) -> float:
    """Sloppy freq of one doc: float32 Σ 1/(1+width)
    (SpanScorer.java:109, BM25Similarity.java:262-264)."""
    freq = np.float32(0.0)
    for _s, _e, w in eval_spans(q, positions):
        freq = np.float32(freq + np.float32(1.0 / (1.0 + w)))
    return float(freq)
