"""Sloppy phrase matching — SloppyPhraseScorer semantics re-expressed.

Faithful port of the reference algorithm for phrases with DISTINCT
terms (search/SloppyPhraseScorer.java:95-133 phraseFreq; the repeating-
terms collision machinery at :147-199 is a documented exclusion —
``sloppy_phrase_freq`` raises for repeated terms):

- every term's positions are query-offset-adjusted (PhrasePositions:
  position = nextPosition() − offset), so an exact alignment is equal
  adjusted positions;
- a min-heap over (adjusted position, offset) repeatedly advances the
  least PhrasePosition; when the popped pp overtakes the next-least, the
  current window's matchLength = end − min is scored if ≤ slop with
  weight computeSlopFactor(matchLength) = 1/(1+matchLength)
  (BM25Similarity.java:262-264), accumulating in float32 exactly like
  the Java float ``freq +=``;
- the greedy least-first traversal (and therefore WHICH combinations
  get scored) matches the reference, including its documented
  asymmetries (see the Javadoc example: "a b"~2 on "x a b a y" scores
  1/1 + 1/3).
"""

from __future__ import annotations

import heapq

import numpy as np


def sloppy_phrase_freq(
    pos_lists: list[np.ndarray], offsets: list[int], slop: int
) -> float:
    """phraseFreq for one document (float32-accumulated)."""
    n = len(pos_lists)
    if n != len(set(offsets)):
        raise ValueError("offsets must be distinct")
    if n == 0 or any(len(p) == 0 for p in pos_lists):
        return 0.0
    if n == 1:
        return float(np.float32(len(pos_lists[0])))
    adj = [np.asarray(p, dtype=np.int64) - off for p, off in zip(pos_lists, offsets)]
    idx = [0] * n
    heap = [(int(adj[i][0]), offsets[i], i) for i in range(n)]
    heapq.heapify(heap)
    end = max(int(a[0]) for a in adj)
    freq = np.float32(0.0)
    pos, off, i = heapq.heappop(heap)
    match_length = end - pos
    next_pos = heap[0][0]
    while True:
        idx[i] += 1
        if idx[i] >= len(adj[i]):
            break  # pp exhausted
        new_pos = int(adj[i][idx[i]])
        if new_pos > end:
            end = new_pos
        if new_pos > next_pos:  # done minimizing current match-length
            if match_length <= slop:
                freq = np.float32(
                    freq + np.float32(1.0) / np.float32(match_length + 1)
                )
            heapq.heappush(heap, (new_pos, off, i))
            pos, off, i = heapq.heappop(heap)
            next_pos = heap[0][0]
            match_length = end - pos
        else:
            ml2 = end - new_pos
            if ml2 < match_length:
                match_length = ml2
    if match_length <= slop:
        freq = np.float32(freq + np.float32(1.0) / np.float32(match_length + 1))
    return float(freq)
