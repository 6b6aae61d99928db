"""TermAutomatonQuery — a token-level automaton as a query.

Reference: lucene/sandbox/src/java/org/apache/lucene/search/
TermAutomatonQuery.java (builder: addTransition / addAnyTransition /
setAccept / finish→determinize, :1-483) and TermAutomatonScorer.java
(:226-345), whose countMatches sweep defines the semantics this module
ports exactly:

- positions carry NFA/DFA state multisets; processing the query terms
  of a doc in position order, each real-term token steps every state
  at its position (and a fresh start from state 0), writing successors
  to position+1 and incrementing ``freq`` each time a step lands on an
  accept state (:306-330);
- ANY transitions advance pending states across the intermediate
  positions between consecutive query-term tokens (:266-292) but never
  increment freq and never start a match — matches must both START and
  END on a real term transition (step(0, termID) is the only match
  seed, :320);
- after determinization state multiplicities equal distinct start
  offsets, so ``freq`` = number of accepted (start, end) token spans;
- score = the similarity over that freq with the idf SUM of all the
  automaton's terms (TermAutomatonQuery.TermAutomatonWeight builds one
  SimWeight over every term's TermStatistics, :341-393) — the same
  shape as PhraseQuery/span scoring.

Spark-first restatement: the automaton itself is request-sized and
determinizes on the driver; matching is the span-kernel shape — a
sargable candidate scan (docs holding ≥1 automaton term, a correct
superset since every counted match ends on a term step), per-term
position arrays joined on, one Arrow-batched kernel running the sweep
per doc, then the JVM-side BM25 column kernel.  Nothing corpus-sized
leaves the executors.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import reduce

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ANY = "*"  # anyTermID analog (TermAutomatonQuery.java ANY transitions)


@dataclass
class TermAutomatonQuery:
    """Builder mirroring the reference API; ``finish()`` determinizes."""

    transitions: list[tuple[int, int, str]] = field(default_factory=list)
    accept_states: set[int] = field(default_factory=set)
    _dfa: "_DFA | None" = None

    def add_transition(self, src: int, dest: int, term: str) -> None:
        self.transitions.append((src, dest, term))

    def add_any_transition(self, src: int, dest: int) -> None:
        self.transitions.append((src, dest, ANY))

    def set_accept(self, state: int, accept: bool = True) -> None:
        if accept:
            self.accept_states.add(state)
        else:
            self.accept_states.discard(state)

    def finish(self) -> "TermAutomatonQuery":
        """Determinize (TermAutomatonQuery.finish → Operations
        .determinize).  Subset construction over the alphabet of terms
        plus the ANY symbol — the scorer steps term ids and ANY as
        independent symbols, so ANY stays an ordinary letter here."""
        if not self.accept_states:
            raise ValueError("no accept states")
        nfa: dict[tuple[int, str], set[int]] = {}
        for s, d, t in self.transitions:
            nfa.setdefault((s, t), set()).add(d)
        labels = sorted({t for _, _, t in self.transitions})
        start = frozenset([0])
        subsets = {start: 0}
        step: dict[tuple[int, str], int] = {}
        accept: set[int] = set()
        work = [start]
        while work:
            cur = work.pop()
            cid = subsets[cur]
            if cur & self.accept_states:
                accept.add(cid)
            for lab in labels:
                nxt = frozenset(
                    d for s in cur for d in nfa.get((s, lab), ())
                )
                if not nxt:
                    continue
                if nxt not in subsets:
                    subsets[nxt] = len(subsets)
                    work.append(nxt)
                step[(cid, lab)] = subsets[nxt]
        self._dfa = _DFA(step=step, accept=accept)
        return self

    @property
    def terms(self) -> list[str]:
        return sorted({t for _, _, t in self.transitions if t != ANY})

    @property
    def has_any(self) -> bool:
        return any(t == ANY for _, _, t in self.transitions)


@dataclass(frozen=True)
class _DFA:
    step: dict[tuple[int, str], int]
    accept: set[int]


def _count_matches(
    events: list[tuple[int, str]], dfa: _DFA, has_any: bool
) -> int:
    """Line-port of TermAutomatonScorer.countMatches (:226-345) over
    one doc's (position, term) events, sorted by position."""
    step, accept = dfa.step, dfa.accept
    positions: dict[int, list[int]] = {}
    freq = 0
    last_pos = -1
    for pos, term in events:
        if last_pos != -1 and has_any:
            lp, start_lp = last_pos, last_pos
            while lp < pos:
                cur = positions.get(lp)
                if not cur and lp > start_lp:
                    break  # petered out (:271-275)
                for q in cur or ():
                    nq = step.get((q, ANY))
                    if nq is not None:
                        positions.setdefault(lp + 1, []).append(nq)
                lp += 1
        for q in positions.get(pos, ()):  # match current token (:306)
            nq = step.get((q, term))
            if nq is not None:
                positions.setdefault(pos + 1, []).append(nq)
                if nq in accept:
                    freq += 1
        nq = step.get((0, term))  # start a new match here (:320)
        if nq is not None:
            positions.setdefault(pos + 1, []).append(nq)
            if nq in accept:
                freq += 1
        last_pos = pos
    return freq


def automaton_freqs_batch(
    taq: TermAutomatonQuery,
    pos_lists: dict[str, np.ndarray],
    n_rows: int,
) -> np.ndarray:
    """Per-doc freq for a batch: pos_lists[term][row] is that row's
    position array (or None)."""
    dfa = taq._dfa
    if dfa is None:
        raise RuntimeError("finish() first")
    has_any = taq.has_any
    out = np.zeros(n_rows, dtype=np.float64)
    terms = list(pos_lists)
    for i in range(n_rows):
        events: list[tuple[int, str]] = []
        for t in terms:
            pl = pos_lists[t][i]
            if pl is None:
                continue
            events.extend((int(p), t) for p in pl)
        events.sort(key=lambda e: e[0])
        out[i] = _count_matches(events, dfa, has_any)
    return out


def term_automaton_docs(
    searcher, taq: TermAutomatonQuery, boost: float = 1.0
) -> DataFrame:
    """All matching (doc_id, score) — the _exec_span execution shape
    (candidates → position join → kernel → JVM score column)."""
    if taq._dfa is None:
        taq.finish()
    terms = taq.terms
    stats = searcher.term_statistics(terms)
    live = [t for t in terms if stats[t][0] > 0]
    if not live:
        return searcher._empty_scored()
    # TermAutomatonWeight builds the SimWeight over ALL terms'
    # statistics (df=0 included — idf(0) is well-defined)
    idf_sum = sum(searcher._idf(stats[t][0]) for t in terms)
    weight = searcher._weight(idf_sum, boost)
    cands = reduce(
        DataFrame.unionByName,
        (
            searcher._term_postings(t).select("doc_id")
            for t in live
        ),
    ).distinct()
    base = cands.join(searcher._live_norms, "doc_id")
    for i, t in enumerate(live):
        pl = searcher._term_postings(t).select(
            "doc_id", F.col("positions").alias(f"_p{i}")
        )
        base = base.join(pl, "doc_id", "left")
    term_order = list(live)

    @F.pandas_udf("double")
    def auto_udf(*pcols: pd.Series) -> pd.Series:
        lists = {
            t: c.to_numpy() for t, c in zip(term_order, pcols)
        }
        return pd.Series(
            automaton_freqs_batch(taq, lists, len(pcols[0]))
        )

    out = base.withColumn(
        "freq", auto_udf(*[F.col(f"_p{i}") for i in range(len(live))])
    ).filter(F.col("freq") > 0)
    return searcher._score_col(weight, out).select("doc_id", "score")
