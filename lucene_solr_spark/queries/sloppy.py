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

The per-doc evaluator (``sloppy_phrase_freq``) is the line-faithful
reference port; ``sloppy_phrase_freq_batch`` runs the IDENTICAL state
machine doc-parallel — numpy arrays hold every candidate doc's heap
keys / positions / match state, each iteration advances one event in
EVERY still-active doc, and the per-iteration work is a handful of
vectorized ops grouped by leader index (n groups, n = phrase length).
A high-df phrase over millions of candidates therefore costs
O(max events per doc) numpy steps of batch width instead of millions
of interpreted heap traversals.  The heap is modeled as one key slot
per PhrasePosition (the real heap always holds exactly n−1 entries);
keys are allowed to go STALE exactly where the reference's rptStack
drain leaves them stale (the group-blind rptInd match), so the
repeated-terms quirks survive.  Equivalence batch-vs-scalar is
hypothesis-gated in tests/test_sloppy.py.
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
    the distinct-terms case).  Thin wrapper over the generalized
    per-slot engine with singleton term sets."""
    n = len(offsets)
    if term_idx is None:
        term_idx = list(range(n))
    if len(term_idx) != n:
        raise ValueError("term_idx must align with offsets")
    if n == 0:
        return 0.0
    per_pp = [
        np.asarray(pos_lists[term_idx[j]], dtype=np.int64) for j in range(n)
    ]
    return sloppy_phrase_freq_slots(
        per_pp, offsets, slop, [frozenset([term_idx[j]]) for j in range(n)]
    )


def sloppy_phrase_freq_slots(
    pos_lists: "list[np.ndarray]",
    offsets: "list[int]",
    slop: int,
    term_sets: "list[frozenset] | None" = None,
) -> float:
    """phraseFreq for one doc over PER-SLOT position lists — the full
    SloppyPhraseScorer machinery INCLUDING the multi-term repeat branch
    (SloppyPhraseScorer.java:285-345,414-446): ``pos_lists[j]`` is
    slot j's UNION postings positions (UnionPostingsEnum merge),
    ``term_sets[j]`` the slot's term identities.  Repeating terms are
    those appearing in ≥2 slots; when any repeating slot is multi-term
    (hasMultiTermRpts), repeat groups are the connected components of
    the repeating-term co-occurrence graph (ppTermsBitSets +
    unionTermGroups + termGroups) and doc init resolves collisions
    iteratively (advanceRepeatGroups MTP branch, incl. the
    ``rptInd < i → incr=0`` restart quirk); otherwise groups are
    per-term and the j-th member starts at its j-th position."""
    n = len(offsets)
    if n == 0:
        return 0.0
    adj = [
        np.asarray(p, dtype=np.int64) - off
        for p, off in zip(pos_lists, offsets)
    ]
    if any(len(p) == 0 for p in adj):
        return 0.0
    if n == 1:
        return float(np.float32(len(adj[0])))
    if term_sets is None:
        term_sets = [frozenset([j]) for j in range(n)]

    # repeatingTerms / repeatingPPs (SloppyPhraseScorer.java:449-480)
    tcnt: dict = {}
    for s in term_sets:
        for t in s:
            tcnt[t] = tcnt.get(t, 0) + 1
    rpt_terms = {t for t, c in tcnt.items() if c >= 2}
    rpp = [j for j in range(n) if term_sets[j] & rpt_terms]
    has_multi = any(len(term_sets[j]) > 1 for j in rpp)
    groups: list[list[int]]
    if not rpt_terms:
        groups = []
    elif not has_multi:
        by_t: dict = {}
        for j in rpp:
            (t,) = term_sets[j]
            by_t.setdefault(t, []).append(j)
        groups = [g for g in by_t.values() if len(g) > 1]
    else:
        # gatherRptGroups MTP branch: merge intersecting repeating-term
        # sets to a fixed point (unionTermGroups), then collect each
        # group's member pps
        bb: list[set] = []
        for j in rpp:
            s = set(term_sets[j] & rpt_terms)
            if s:
                bb.append(s)
        i = 0
        while i < len(bb) - 1:
            merged = False
            j2 = i + 1
            while j2 < len(bb):
                if bb[i] & bb[j2]:
                    bb[i] |= bb[j2]
                    del bb[j2]
                    merged = True
                else:
                    j2 += 1
            if not merged:
                i += 1
        tg = {t: gi for gi, s in enumerate(bb) for t in s}
        mem: list[set] = [set() for _ in bb]
        for j in rpp:
            for t in term_sets[j]:
                gi = tg.get(t)
                if gi is not None:
                    mem[gi].add(j)
        groups = [sorted(g) for g in mem if len(g) > 1]
    rpt_groups = [sorted(g, key=lambda j: offsets[j]) for g in groups]
    grp = [-1] * n
    rpt_ind = [0] * n
    for gi, g in enumerate(rpt_groups):
        for k, j in enumerate(g):
            grp[j] = gi
            rpt_ind[j] = k
    has_rpts = bool(rpt_groups)

    idx = [0] * n
    pos = [int(adj[j][0]) for j in range(n)]
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

    # advanceRepeatGroups (:285-315)
    if has_rpts:
        if has_multi:
            for rg in rpt_groups:
                gi = 0
                while gi < len(rg):
                    incr = 1
                    j = rg[gi]
                    while True:
                        k = collide(j)
                        if k < 0:
                            break
                        j2 = rg[k]
                        adv = (
                            j
                            if (pos[j], offsets[j]) < (pos[j2], offsets[j2])
                            else j2
                        )
                        if not advance_pp(adv):
                            return 0.0
                        if rpt_ind[adv] < gi:
                            incr = 0
                            break
                    gi += incr
        else:
            # j-th group member starts at its term's j-th position —
            # the no-collision start condition
            for g in rpt_groups:
                for k, j in enumerate(g):
                    for _ in range(k):
                        if not advance_pp(j):
                            return 0.0
    end = max(pos)

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


# ------------------------------------------------------------------ batch
_INF = np.int64(np.iinfo(np.int64).max)


def _flatten(col) -> "tuple[np.ndarray, np.ndarray]":
    """Object column of per-doc position arrays → (flat, lens)."""
    D = len(col)
    lens = np.zeros(D, dtype=np.int64)
    parts: list[np.ndarray] = []
    for d in range(D):
        a = col[d]
        if a is None:
            continue
        k = len(a)
        if k:
            lens[d] = k
            parts.append(np.asarray(a, dtype=np.int64))
    flat = np.concatenate(parts) if parts else np.zeros(0, dtype=np.int64)
    return flat, lens


def sloppy_phrase_freq_batch(
    pos_cols: "list[np.ndarray]",
    offsets: "list[int]",
    slop: int,
    term_idx: "list[int] | None" = None,
    term_sets: "list[frozenset] | None" = None,
) -> np.ndarray:
    """Batched phraseFreq: run sloppy_phrase_freq's EXACT state machine
    over every doc at once.

    ``pos_cols[u]`` is an object ndarray (one per-doc position array —
    or None — per UNIQUE term): ``offsets``/``term_idx``/``slop`` as in
    sloppy_phrase_freq.  Returns float32[D] freqs.

    With ``term_sets`` (one frozenset of term identities per phrase
    position — the MultiPhraseQuery slot shape), the kernel runs the
    full sloppy_phrase_freq_slots machinery doc-parallel: repeat
    groups become the connected components of the repeating-term
    co-occurrence graph (gatherRptGroups' unionTermGroups /
    termGroups, SloppyPhraseScorer.java:414-446), and doc init is the
    iterative collision-resolution branch (advanceRepeatGroups MTP
    branch:285-315) vectorized — per event, every still-colliding doc
    advances its lesser pp at once.  ``pos_cols`` then holds one
    column per DISTINCT slot key (union postings), ``term_idx`` maps
    slot→column.  Equivalence vs the scalar slots engine is
    hypothesis-gated in tests/test_sloppy.py.

    Doc-parallel restatement of the heap traversal: the PhraseQueue is
    one int64 key slot per PhrasePosition (``hk``; the real heap always
    holds exactly n−1 entries — every pp except the leader), with
    key = adjusted_pos·n + perm[j] encoding the (pos, offset, ord)
    lessThan order; keys go stale exactly where the reference leaves
    heap entries stale (advanceRpts' group-blind rptStack drain), so
    the repeated-terms quirks are preserved bit-for-bit.  Each while
    iteration advances ONE event in every active doc via numpy ops
    grouped by leader index; float32 accumulation order per doc is
    identical to the scalar loop.  Equivalence is hypothesis-gated.
    """
    n = len(offsets)
    if term_idx is None:
        term_idx = list(range(n))
    if len(term_idx) != n:
        raise ValueError("term_idx must align with offsets")
    D = len(pos_cols[0]) if pos_cols else 0
    freq = np.zeros(D, dtype=np.float32)
    if n == 0 or D == 0:
        return freq

    flats: list[np.ndarray] = []
    lens_u: list[np.ndarray] = []
    offs_u: list[np.ndarray] = []
    for col in pos_cols:
        fl, ln = _flatten(col)
        flats.append(fl)
        lens_u.append(ln)
        off = np.zeros(D + 1, dtype=np.int64)
        np.cumsum(ln, out=off[1:])
        offs_u.append(off)

    used = sorted(set(term_idx))
    alive_mask = np.ones(D, dtype=bool)
    for u in used:
        alive_mask &= lens_u[u] > 0

    if n == 1:
        u = term_idx[0]
        freq[alive_mask] = lens_u[u][alive_mask].astype(np.float32)
        return freq

    # repeat groups.  Single-term slots: phrase positions sharing a
    # term (== sharing a postings column), offset-sorted.  With
    # term_sets and a repeating term touching a multi-term slot
    # (hasMultiTermRpts), groups are the connected components of the
    # repeating-term co-occurrence graph — the scalar slots engine's
    # gatherRptGroups MTP branch, replicated order-exactly.
    has_multi = False
    if term_sets is not None:
        if len(term_sets) != n:
            raise ValueError("term_sets must align with offsets")
        tcnt2: dict = {}
        for s in term_sets:
            for t in s:
                tcnt2[t] = tcnt2.get(t, 0) + 1
        rpt_terms = {t for t, c in tcnt2.items() if c >= 2}
        rpp = [j for j in range(n) if term_sets[j] & rpt_terms]
        has_multi = any(len(term_sets[j]) > 1 for j in rpp)
    if has_multi:
        bb: list[set] = []
        for j in rpp:
            s = set(term_sets[j] & rpt_terms)
            if s:
                bb.append(s)
        i0 = 0
        while i0 < len(bb) - 1:
            merged = False
            j2_ = i0 + 1
            while j2_ < len(bb):
                if bb[i0] & bb[j2_]:
                    bb[i0] |= bb[j2_]
                    del bb[j2_]
                    merged = True
                else:
                    j2_ += 1
            if not merged:
                i0 += 1
        tg = {t: gi for gi, s in enumerate(bb) for t in s}
        memsets: list[set] = [set() for _ in bb]
        for j in rpp:
            for t in term_sets[j]:
                gi = tg.get(t)
                if gi is not None:
                    memsets[gi].add(j)
        groups = [sorted(g) for g in memsets if len(g) > 1]
        rpt_groups = [sorted(g, key=lambda j: offsets[j]) for g in groups]
    else:
        by_term: dict[int, list[int]] = {}
        for j, t in enumerate(term_idx):
            by_term.setdefault(t, []).append(j)
        rpt_groups = [
            sorted(g, key=lambda j: offsets[j])
            for g in by_term.values()
            if len(g) > 1
        ]
    grp = np.full(n, -1, dtype=np.int64)
    rpt_ind = np.zeros(n, dtype=np.int64)
    init_k = np.zeros(n, dtype=np.int64)
    for gi, g in enumerate(rpt_groups):
        for k, j in enumerate(g):
            grp[j] = gi
            rpt_ind[j] = k
            # MTP groups init at position 0 and resolve collisions
            # iteratively below; single-term groups start the k-th
            # member at its k-th position (no-collision condition)
            init_k[j] = 0 if has_multi else k
    has_rpts = bool(rpt_groups)

    # advanceRepeatGroups init: the k-th group member needs a k-th
    # position — docs without one score 0 (scalar early return)
    for j in range(n):
        if init_k[j]:
            alive_mask &= lens_u[term_idx[j]] >= init_k[j] + 1
    alive = np.nonzero(alive_mask)[0]
    A = alive.size
    if A == 0:
        return freq

    offv = np.asarray(offsets, dtype=np.int64)
    # perm encodes the heap tie-break (offset, ord) — unique per pp
    order = sorted(range(n), key=lambda j: (offsets[j], j))
    perm = np.empty(n, dtype=np.int64)
    for r, j in enumerate(order):
        perm[j] = r

    base = np.empty((n, A), dtype=np.int64)   # flat base ptr per pp/doc
    ln = np.empty((n, A), dtype=np.int64)
    for j in range(n):
        u = term_idx[j]
        base[j] = offs_u[u][alive]
        ln[j] = lens_u[u][alive]

    idx = np.tile(init_k[:, None], (1, A))
    cur = np.empty((n, A), dtype=np.int64)
    for j in range(n):
        cur[j] = flats[term_idx[j]][base[j] + idx[j]] - offv[j]
    end = cur.max(axis=0)
    ar = np.arange(A)
    fq = np.zeros(A, dtype=np.float32)
    done = np.zeros(A, dtype=bool)

    def _score(docs: np.ndarray) -> None:
        # float32 accumulation identical to the scalar:
        # freq = f32(freq + f32(1) / f32(ml + 1))
        m = ml[docs] <= slop
        dd = docs[m]
        if dd.size:
            fq[dd] = fq[dd] + np.float32(1.0) / (ml[dd] + 1).astype(
                np.float32
            )

    def _advance(docs: np.ndarray, jarr: np.ndarray) -> np.ndarray:
        """advance_pp for docs (leader index jarr per doc); returns a
        bool exhausted mask (cur/end updated for the survivors)."""
        exh = np.zeros(docs.size, dtype=bool)
        for j in range(n):
            m = np.nonzero(jarr == j)[0]
            if m.size == 0:
                continue
            dd = docs[m]
            ii = idx[j, dd] + 1
            ex = ii >= ln[j, dd]
            ok = ~ex
            do = dd[ok]
            idx[j, do] = ii[ok]
            npv = flats[term_idx[j]][base[j, do] + ii[ok]] - offv[j]
            cur[j, do] = npv
            end[do] = np.maximum(end[do], npv)
            exh[m] = ex
        return exh

    if has_multi and has_rpts:
        # advanceRepeatGroups, multi-term branch: per group (query
        # order), walk gi over the members; while the gi-th member
        # collides (equal ACTUAL position with an earlier-found group
        # member, group order), advance the lesser pp.  One vectorized
        # event per loop step across every still-colliding doc; a doc
        # that exhausts a list scores 0 (scalar `return 0.0` — no
        # trailing score).  The scalar's incr/restart quirk re-enters
        # the same gi, which this event loop reproduces by leaving gi
        # unchanged on a collision.
        for rg in rpt_groups:
            rg_arr = np.asarray(rg, dtype=np.int64)
            glen = len(rg)
            gi_d = np.zeros(A, dtype=np.int64)
            act0 = np.nonzero(~done)[0]
            while act0.size:
                jj = rg_arr[gi_d[act0]]
                tp = cur[jj, act0] + offv[jj]
                found = np.full(act0.size, -1, dtype=np.int64)
                for kpos in range(glen):
                    j2s = rg[kpos]
                    hit = (found == -1) & (jj != j2s) & (
                        cur[j2s, act0] + offv[j2s] == tp
                    )
                    found[hit] = kpos
                no = found < 0
                gi_d[act0[no]] += 1
                coll = act0[~no]
                if coll.size:
                    jjc = jj[~no]
                    j2c = rg_arr[found[~no]]
                    lt = (cur[jjc, coll] < cur[j2c, coll]) | (
                        (cur[jjc, coll] == cur[j2c, coll])
                        & (offv[jjc] < offv[j2c])
                    )
                    advj = np.where(lt, jjc, j2c)
                    exh0 = _advance(coll, advj)
                    ed0 = coll[exh0]
                    if ed0.size:
                        done[ed0] = True
                act0 = np.nonzero(~done & (gi_d < glen))[0]
        # scalar recomputes end = max(pos) after init
        end = cur.max(axis=0)

    key0 = cur * n + perm[:, None]
    leader = key0.argmin(axis=0)
    hk = key0
    hk[leader, ar] = _INF
    nextp = hk.min(axis=0) // n
    ml = end - cur[leader, ar]

    # per-group member matrix for collide()/drain lookups
    mem = None
    if has_rpts:
        gmax = max(len(g) for g in rpt_groups)
        mem = np.full((len(rpt_groups), gmax), -1, dtype=np.int64)
        for gi, g in enumerate(rpt_groups):
            for k, j in enumerate(g):
                mem[gi, k] = j

    def _advance_rpts(docs: np.ndarray) -> None:
        """Vectorized advanceRpts for docs whose leader is in a repeat
        group: resolve actual-position collisions by advancing the
        lesser pp, then drain-and-requeue heap slots per the rptStack
        discipline (group-blind rptInd match).  Docs that exhaust a
        list mid-resolution final-score and go done (scalar `return
        False` → break → trailing score)."""
        j_cur = leader[docs].copy()
        k0 = rpt_ind[leader[docs]]
        bits = np.zeros(docs.size, dtype=np.int64)
        act = np.arange(docs.size)
        while act.size:
            jj = j_cur[act]
            colk = np.full(act.size, -1, dtype=np.int64)
            for j in range(n):
                if grp[j] < 0:
                    continue
                m = np.nonzero(jj == j)[0]
                if m.size == 0:
                    continue
                dd = docs[act[m]]
                tp = cur[j, dd] + offv[j]
                found = np.full(m.size, -1, dtype=np.int64)
                for j2 in rpt_groups[grp[j]]:
                    if j2 == j:
                        continue
                    hit = (found == -1) & (cur[j2, dd] + offv[j2] == tp)
                    found[hit] = rpt_ind[j2]
                colk[m] = found
            hitm = colk >= 0
            act = act[hitm]
            if act.size == 0:
                break
            kk = colk[hitm]
            jj = j_cur[act]
            gg = grp[jj]
            j2 = mem[gg, kk]
            dd = docs[act]
            # lesser(pp, pp2) compares (position, offset) ONLY — on a
            # full tie (duplicate slot: equal adjusted position AND
            # equal query offset) the scalar's `else j2` advances the
            # collision partner, so strict-less here, no ord tie-break
            # (the heap's perm rank would wrongly pick the lower ord)
            lt = (cur[jj, dd] < cur[j2, dd]) | (
                (cur[jj, dd] == cur[j2, dd]) & (offv[jj] < offv[j2])
            )
            adv = np.where(lt, jj, j2)
            exh = _advance(dd, adv)
            # exhausted: scalar returns False → main breaks → final
            # score with the CURRENT match length
            ed = dd[exh]
            if ed.size:
                _score(ed)
                done[ed] = True
            ok = ~exh
            act = act[ok]
            sel = np.nonzero(ok)[0]
            nb = np.nonzero(kk[ok] != k0[act])[0]
            if nb.size:
                a2 = act[nb]
                bits[a2] |= np.int64(1) << kk[ok][nb]
            j_cur[act] = adv[ok]
        # rptStack drain: pop ascending heap keys until every marked
        # rptInd was seen (group-blind), then requeue the drained pps
        # at their CURRENT positions — un-drained stale entries stay
        # stale, as in the reference
        dm = np.nonzero((bits != 0) & ~done[docs])[0]
        if dm.size == 0:
            return
        dd = docs[dm]
        bb = bits[dm]
        drained = np.zeros((n, dm.size), dtype=bool)
        act2 = np.arange(dm.size)
        while act2.size:
            sub = dd[act2]
            K = hk[:, sub].copy()
            K[drained[:, act2]] = _INF
            jq = K.argmin(axis=0)
            drained[jq, act2] = True
            rk = rpt_ind[jq]
            ingrp = grp[jq] >= 0
            match = ingrp & (((bb[act2] >> rk) & 1) == 1)
            msel = np.nonzero(match)[0]
            if msel.size:
                a3 = act2[msel]
                bb[a3] &= ~(np.int64(1) << rk[msel])
            act2 = act2[bb[act2] != 0]
        for j in range(n):
            m = drained[j]
            if m.any():
                do = dd[m]
                hk[j, do] = cur[j, do] * n + perm[j]

    act = np.nonzero(~done)[0]
    while act.size:
        ld = leader[act]
        exh = _advance(act, ld)
        ed = act[exh]
        if ed.size:
            _score(ed)
            done[ed] = True
        rem = act[~exh]
        if rem.size and has_rpts:
            rp = rem[grp[leader[rem]] >= 0]
            if rp.size:
                _advance_rpts(rp)
                rem = rem[~done[rem]]
        if rem.size:
            cl = cur[leader[rem], rem]
            ovm = cl > nextp[rem]
            ov = rem[ovm]
            if ov.size:
                _score(ov)
                oldl = leader[ov]
                hk[oldl, ov] = cur[oldl, ov] * n + perm[oldl]
                nl = hk[:, ov].argmin(axis=0)
                leader[ov] = nl
                hk[nl, ov] = _INF
                nextp[ov] = hk[:, ov].min(axis=0) // n
                ml[ov] = end[ov] - cur[nl, ov]
            sh = rem[~ovm]
            if sh.size:
                ml[sh] = np.minimum(
                    ml[sh], end[sh] - cur[leader[sh], sh]
                )
        # incremental active set: rem already excludes this step's
        # exhausted/finished docs (no full-array rescan per event)
        act = rem

    freq[alive] = fq
    return freq
