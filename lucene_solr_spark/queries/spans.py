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


# ----------------------------------------------------------------- batch
# Flat-array batch evaluation: one kernel call evaluates a span tree
# over a whole Arrow batch of documents instead of a Python traversal
# per doc.  A span set over N docs is (off, starts, ends, widths):
# ``off`` is an int64[N+1] prefix of per-doc span counts; spans of doc d
# live at [off[d], off[d+1]) sorted in the reference iterators' emission
# order (nondecreasing (start, end) within a doc).  Equivalence with
# the per-doc evaluator is pytest-gated (tests/test_spans.py).

SpanBatch = tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]

# combined-key multiplier for per-doc searchsorted over flat arrays;
# positions are token indices (< 2^40 with room to spare)
_KEY = np.int64(1) << 41


def _doc_of(off: np.ndarray, total: int) -> np.ndarray:
    """doc index of every flat slot (mark-boundaries + cumsum gather —
    np.repeat is pathologically slow for this shape)."""
    d = np.zeros(total, dtype=np.int64)
    nz = off[1:-1]
    np.add.at(d, nz[nz < total], 1)
    return np.cumsum(d)


def _empty_batch(n_docs: int) -> SpanBatch:
    z = np.zeros(0, dtype=np.int64)
    return np.zeros(n_docs + 1, dtype=np.int64), z, z, z


def eval_spans_batch(
    q: SpanQuery, positions: dict[str, SpanBatch], n_docs: int
) -> SpanBatch:
    """Batch analog of eval_spans.  ``positions[t]`` is a SpanBatch of
    the term's occurrences ((p, p+1, 0) spans, positions ascending)."""
    if isinstance(q, SpanTermQuery):
        return positions.get(q.term, _empty_batch(n_docs))
    if isinstance(q, SpanOrQuery):
        subs = [eval_spans_batch(c, positions, n_docs) for c in q.clauses]
        return _or_batch(subs, n_docs)
    if isinstance(q, SpanFirstQuery):
        off, s, e, w = eval_spans_batch(q.match, positions, n_docs)
        # end <= n implies start < n, so the early-stop at start >= n
        # (SpanFirstQuery.java:40) drops nothing the filter keeps
        keep = e <= q.end
        return _filter_batch(off, s, e, w, keep)
    if isinstance(q, SpanNotQuery):
        inc = eval_spans_batch(q.include, positions, n_docs)
        exc = eval_spans_batch(q.exclude, positions, n_docs)
        return _not_batch(inc, exc, q.pre, q.post, n_docs)
    if isinstance(q, SpanNearQuery):
        subs = [eval_spans_batch(c, positions, n_docs) for c in q.clauses]
        if len(subs) == 1:
            return subs[0]
        if q.in_order:
            return _near_ordered_batch(subs, q.slop, n_docs)
        return _near_unordered_batch(subs, q.slop, n_docs)
    raise TypeError(f"not a span query: {type(q).__name__}")


def _filter_batch(
    off: np.ndarray, s: np.ndarray, e: np.ndarray, w: np.ndarray,
    keep: np.ndarray,
) -> SpanBatch:
    if len(s) == 0:
        return off.copy(), s, e, w
    docs = _doc_of(off, len(s))
    new_off = np.zeros(len(off), dtype=np.int64)
    np.cumsum(np.bincount(docs[keep], minlength=len(off) - 1), out=new_off[1:])
    return new_off, s[keep], e[keep], w[keep]


def _or_batch(subs: list[SpanBatch], n_docs: int) -> SpanBatch:
    tot = sum(len(s[1]) for s in subs)
    if tot == 0:
        return _empty_batch(n_docs)
    docs = np.concatenate(
        [_doc_of(b[0], len(b[1])) for b in subs if len(b[1])]
    )
    s = np.concatenate([b[1] for b in subs if len(b[1])])
    e = np.concatenate([b[2] for b in subs if len(b[2])])
    w = np.concatenate([b[3] for b in subs if len(b[3])])
    # heapq.merge order: (start, end) per doc; ties keep clause order
    # (np.lexsort is stable over the clause-ordered concatenation)
    order = np.lexsort((e, s, docs))
    docs, s, e, w = docs[order], s[order], e[order], w[order]
    off = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(np.bincount(docs, minlength=n_docs), out=off[1:])
    return off, s, e, w


def _not_batch(
    inc: SpanBatch, exc: SpanBatch, pre: int, post: int, n_docs: int
) -> SpanBatch:
    ioff, is_, ie, iw = inc
    eoff, es, ee, _ew = exc
    if len(is_) == 0 or len(es) == 0:
        return inc
    idocs = _doc_of(ioff, len(is_))
    edocs = _doc_of(eoff, len(es))
    # the reference's forward-only exclude pointer stops at the FIRST
    # exclude whose end > candidate.start - pre (SpanNotQuery.java:173);
    # with non-monotonic ends that is the first index where the prefix
    # max of ends exceeds the threshold — searchsorted over the per-doc
    # prefix-max via the combined (doc, value) key
    pmax = _segmented_prefix_max(ee, eoff)
    ck = edocs * _KEY + pmax
    # clamp the threshold at 0: span ends are >= 1, so a negative
    # start-pre advances nothing (the combined key must not underflow
    # into the previous doc's key range)
    th = idocs * _KEY + np.maximum(is_ - pre, 0)
    j = np.searchsorted(ck, th, side="right")
    seg_end = eoff[idocs + 1]
    exhausted = j >= seg_end
    jc = j.clip(max=len(es) - 1)
    keep = exhausted | ((ie + post) <= es[jc])
    return _filter_batch(ioff, is_, ie, iw, keep)


def _segmented_prefix_max(vals: np.ndarray, off: np.ndarray) -> np.ndarray:
    """Per-segment running max of ``vals`` (segments from ``off``)."""
    if len(vals) == 0:
        return vals
    # offset trick: add a per-segment ramp so the running max can never
    # carry across a segment boundary, accumulate, subtract the ramp
    ramp = _doc_of(off, len(vals)) * _KEY
    return np.maximum.accumulate(vals + ramp) - ramp


def _near_ordered_batch(
    subs: list[SpanBatch], slop: int, n_docs: int
) -> SpanBatch:
    """NearSpansOrdered.java:59-135 vectorized: the first clause's spans
    drive; each later clause's persistent forward-only pointer is a
    per-doc searchsorted (first start >= prev_end) composed with a
    running max (pointers never rewind even when prev_end decreases)."""
    doff, ds, de, _dw = subs[0]
    if len(ds) == 0:
        return _empty_batch(n_docs)
    ddocs = _doc_of(doff, len(ds))
    alive = np.ones(len(ds), dtype=bool)
    prev_end = de.copy()
    width = np.zeros(len(ds), dtype=np.int64)
    for i in range(1, len(subs)):
        off_i, s_i, e_i, _w_i = subs[i]
        if len(s_i) == 0:
            return _empty_batch(n_docs)
        sdocs = _doc_of(off_i, len(s_i))
        ck = sdocs * _KEY + s_i
        th = ddocs * _KEY + prev_end
        j = np.searchsorted(ck, th, side="left")
        # persistent pointer: global indices are monotone across docs,
        # so one running max implements per-doc forward-only advance
        # (an exhausted doc's pointer equals the next doc's base and
        # cannot push it past real matches)
        j = np.maximum.accumulate(j)
        seg_end = off_i[ddocs + 1]
        alive &= j < seg_end
        jc = j.clip(max=len(s_i) - 1)
        width = width + np.where(alive, s_i[jc] - prev_end, 0)
        prev_end = np.where(alive, e_i[jc], prev_end)
    keep = alive & (width <= slop)
    return _filter_batch(doff, ds, prev_end, width, keep)


def _near_unordered_batch(
    subs: list[SpanBatch], slop: int, n_docs: int
) -> SpanBatch:
    """Unordered near: the sliding-window priority queue is inherently
    sequential per doc (NearSpansUnordered.java:43-165); run the per-doc
    reference loop over numpy slices (no pandas row overhead).  Docs
    where any clause is empty are skipped up front."""
    outs_s: list[list[int]] = []
    outs_e: list[list[int]] = []
    outs_w: list[list[int]] = []
    off = np.zeros(n_docs + 1, dtype=np.int64)
    total = 0
    for d in range(n_docs):
        lists = []
        empty = False
        for o, s, e, w in subs:
            a, z = int(o[d]), int(o[d + 1])
            if a == z:
                empty = True
                break
            lists.append(
                list(zip(s[a:z].tolist(), e[a:z].tolist(), w[a:z].tolist()))
            )
        if not empty:
            spans = _near_unordered(lists, slop)
            if spans:
                outs_s.append([sp[0] for sp in spans])
                outs_e.append([sp[1] for sp in spans])
                outs_w.append([sp[2] for sp in spans])
                total += len(spans)
        off[d + 1] = total
    if total == 0:
        return _empty_batch(n_docs)
    return (
        off,
        np.concatenate([np.asarray(x, dtype=np.int64) for x in outs_s]),
        np.concatenate([np.asarray(x, dtype=np.int64) for x in outs_e]),
        np.concatenate([np.asarray(x, dtype=np.int64) for x in outs_w]),
    )


def batch_from_position_lists(col: "list[np.ndarray | None]") -> SpanBatch:
    """Build a term's SpanBatch from per-doc position arrays (None/empty
    for docs without the term)."""
    n = len(col)
    off = np.zeros(n + 1, dtype=np.int64)
    arrs = []
    t = 0
    for d, v in enumerate(col):
        if v is not None and len(v):
            a = np.asarray(v, dtype=np.int64)
            arrs.append(a)
            t += len(a)
        off[d + 1] = t
    if t == 0:
        return _empty_batch(n)
    starts = np.concatenate(arrs)
    return off, starts, starts + 1, np.zeros(t, dtype=np.int64)


def span_freqs_batch(
    q: SpanQuery, positions: dict[str, SpanBatch], n_docs: int,
    exact: bool,
) -> np.ndarray:
    """Per-doc sloppy freq over a batch: float64 Σ 1/(1+width) in exact
    mode (order-free — the gated slops make every factor dyadic), or the
    reference's sequential float32 accumulation in lucene mode."""
    off, _s, _e, w = eval_spans_batch(q, positions, n_docs)
    out = np.zeros(n_docs, dtype=np.float64)
    if len(w) == 0:
        return out
    factors = 1.0 / (1.0 + w.astype(np.float64))
    if exact:
        docs = _doc_of(off, len(w))
        np.add.at(out, docs, factors)
        return out
    f32 = factors.astype(np.float32)
    for d in range(n_docs):
        a, z = int(off[d]), int(off[d + 1])
        if a == z:
            continue
        acc = np.float32(0.0)
        for k in range(a, z):
            acc = np.float32(acc + f32[k])
        out[d] = float(acc)
    return out
