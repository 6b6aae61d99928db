"""Sloppy phrase matching — SloppyPhraseScorer semantics re-expressed.

Faithful port of the reference algorithm including the repeating-terms
machinery (search/SloppyPhraseScorer.java):

- every term's positions are query-offset-adjusted (PhrasePositions:
  position = nextPosition() − offset), so an exact alignment is equal
  adjusted positions;
- a min-heap ordered by (adjusted position, offset, ord) — the
  PhraseQueue.lessThan order (search/PhraseQueue.java:28-40) —
  repeatedly advances the least PhrasePosition; when the popped pp
  overtakes the next-least, the current window's matchLength =
  end − min is scored if ≤ slop with computeSlopFactor(matchLength) =
  1/(1+matchLength) (BM25Similarity.java:262-264), accumulating in
  float32 exactly like the Java float ``freq +=``;
- repeated terms (SloppyPhraseScorer.java:147-199, 262-290): pps of the
  same term form a repeat group sorted by query offset; at doc init the
  j-th member is advanced j positions so no two occupy the same term
  position (advanceRepeatGroups, non-multi-term branch:300-306); after
  every advance, collisions (equal *actual* term position within a
  group) are resolved by advancing the lesser pp, and queue entries
  touched during resolution are re-queued via the rptStack drain
  (advanceRpts:147-185) — including its quirk that the drain matches
  marked rptInds regardless of group;
- the greedy least-first traversal (and therefore WHICH combinations
  get scored) matches the reference, including its documented
  asymmetries (see the Javadoc example: "a b"~2 on "x a b a y" scores
  1/1 + 1/3).
"""

from __future__ import annotations

import heapq

import numpy as np


def sloppy_phrase_freq(
    pos_lists: list[np.ndarray],
    offsets: list[int],
    slop: int,
    term_idx: list[int] | None = None,
) -> float:
    """phraseFreq for one document (float32-accumulated).

    ``pos_lists`` holds one sorted position array per UNIQUE term;
    ``offsets`` one query offset per phrase position; ``term_idx[j]``
    maps phrase position j to its term's array (identity when omitted —
    the distinct-terms case).
    """
    n = len(offsets)
    if term_idx is None:
        term_idx = list(range(n))
    if len(term_idx) != n:
        raise ValueError("term_idx must align with offsets")
    if n == 0:
        return 0.0
    lists = [
        np.asarray(pos_lists[term_idx[j]], dtype=np.int64) for j in range(n)
    ]
    if any(len(p) == 0 for p in lists):
        return 0.0
    if n == 1:
        return float(np.float32(len(lists[0])))
    adj = [p - off for p, off in zip(lists, offsets)]

    # repeat groups: phrase positions sharing a term, sorted by offset
    by_term: dict[int, list[int]] = {}
    for j, t in enumerate(term_idx):
        by_term.setdefault(t, []).append(j)
    rpt_groups = [
        sorted(g, key=lambda j: offsets[j])
        for g in by_term.values()
        if len(g) > 1
    ]
    grp = [-1] * n
    rpt_ind = [0] * n
    for gi, g in enumerate(rpt_groups):
        for k, j in enumerate(g):
            grp[j] = gi
            rpt_ind[j] = k
    has_rpts = bool(rpt_groups)

    idx = [0] * n
    # advanceRepeatGroups (non-multi-term): j-th group member starts at
    # its term's j-th position — the no-collision start condition
    for g in rpt_groups:
        for k, j in enumerate(g):
            if k >= len(adj[j]):
                return 0.0
            idx[j] = k
    pos = [int(adj[j][idx[j]]) for j in range(n)]
    end = max(pos)

    def advance_pp(j: int) -> bool:
        nonlocal end
        idx[j] += 1
        if idx[j] >= len(adj[j]):
            return False
        pos[j] = int(adj[j][idx[j]])
        if pos[j] > end:
            end = pos[j]
        return True

    def collide(j: int) -> int:
        tp = pos[j] + offsets[j]
        for j2 in rpt_groups[grp[j]]:
            if j2 != j and pos[j2] + offsets[j2] == tp:
                return rpt_ind[j2]
        return -1

    heap = [(pos[j], offsets[j], j) for j in range(n)]
    heapq.heapify(heap)

    def advance_rpts(j0: int) -> bool:
        """Resolve collisions caused by advancing pp j0; re-queue any
        group member whose heap entry went stale."""
        if grp[j0] < 0:
            return True
        rg = rpt_groups[grp[j0]]
        k0 = rpt_ind[j0]
        bits: set[int] = set()
        j = j0
        while True:
            k = collide(j)
            if k < 0:
                break
            j2 = rg[k]
            # advance the lesser of the two colliding pps
            j = j if (pos[j], offsets[j]) < (pos[j2], offsets[j2]) else j2
            if not advance_pp(j):
                return False
            if k != k0:
                bits.add(k)
        # drain the queue until every marked rptInd was seen, then put
        # the drained pps back with their current positions (rptStack
        # discipline — the rptInd match is group-blind, as in the ref)
        stack: list[int] = []
        while bits:
            _, _, jq = heapq.heappop(heap)
            stack.append(jq)
            if grp[jq] >= 0 and rpt_ind[jq] in bits:
                bits.discard(rpt_ind[jq])
        for jq in reversed(stack):
            heapq.heappush(heap, (pos[jq], offsets[jq], jq))
        return True

    freq = np.float32(0.0)
    _, _, j = heapq.heappop(heap)
    match_length = end - pos[j]
    next_pos = heap[0][0]
    while advance_pp(j):
        if has_rpts and not advance_rpts(j):
            break
        if pos[j] > next_pos:  # done minimizing current match-length
            if match_length <= slop:
                freq = np.float32(
                    freq + np.float32(1.0) / np.float32(match_length + 1)
                )
            heapq.heappush(heap, (pos[j], offsets[j], j))
            _, _, j = heapq.heappop(heap)
            next_pos = heap[0][0]
            match_length = end - pos[j]
        else:
            ml2 = end - pos[j]
            if ml2 < match_length:
                match_length = ml2
    if match_length <= slop:
        freq = np.float32(
            freq + np.float32(1.0) / np.float32(match_length + 1)
        )
    return float(freq)
