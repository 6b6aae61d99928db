"""TermAutomatonQuery (sandbox/search/TermAutomatonQuery.java +
TermAutomatonScorer.java countMatches port)."""

import pytest

from lucene_solr_spark.queries.query import PhraseQuery
from lucene_solr_spark.queries.term_automaton import (
    TermAutomatonQuery,
    _count_matches,
    term_automaton_docs,
)


def taq(transitions, accepts):
    q = TermAutomatonQuery()
    for s, d, t in transitions:
        if t == "*":
            q.add_any_transition(s, d)
        else:
            q.add_transition(s, d, t)
    for a in accepts:
        q.set_accept(a)
    return q.finish()


def freq(q, tokens):
    events = [(i, t) for i, t in enumerate(tokens) if t in set(q.terms)]
    return _count_matches(events, q._dfa, q.has_any)


def test_simple_chain_is_exact_phrase():
    q = taq([(0, 1, "a"), (1, 2, "b")], [2])
    assert freq(q, ["a", "b"]) == 1
    assert freq(q, ["a", "b", "a", "b"]) == 2
    assert freq(q, ["a", "x", "b"]) == 0
    assert freq(q, ["b", "a"]) == 0


def test_any_gap():
    q = taq([(0, 1, "a"), (1, 2, "*"), (2, 3, "b")], [3])
    assert freq(q, ["a", "x", "b"]) == 1
    assert freq(q, ["a", "b", "b"]) == 1   # gap consumes the first b
    assert freq(q, ["a", "b"]) == 0        # no room for the gap
    assert freq(q, ["a", "x", "x", "b"]) == 0  # exactly one ANY


def test_union_and_multi_accept():
    # (a|c) b — two start arcs into the same chain
    q = taq([(0, 1, "a"), (0, 1, "c"), (1, 2, "b")], [2])
    assert freq(q, ["a", "b", "c", "b"]) == 2
    # prefix accept: "a" and "a b" both accepted → two accept events
    q2 = taq([(0, 1, "a"), (1, 2, "b")], [1, 2])
    assert freq(q2, ["a", "b"]) == 2
    assert freq(q2, ["a", "x"]) == 1


def test_determinize_collapses_duplicate_paths():
    # two NFA paths accept the same string "a b" — one (start,end) span
    q = taq([(0, 1, "a"), (0, 2, "a"), (1, 3, "b"), (2, 3, "b")], [3])
    assert freq(q, ["a", "b"]) == 1


def test_leading_and_trailing_any_never_fire():
    """Matches must start AND end on a real term transition
    (TermAutomatonScorer: freq++ only on termID steps; the only match
    seed is step(0, termID))."""
    lead = taq([(0, 1, "*"), (1, 2, "a")], [2])
    assert freq(lead, ["x", "a"]) == 0
    trail = taq([(0, 1, "a"), (1, 2, "*")], [2])
    assert freq(trail, ["a", "x"]) == 0


def test_overlapping_starts_counted():
    q = taq([(0, 1, "a"), (1, 2, "a")], [2])
    # "a a a": spans (0,1) and (1,2)
    assert freq(q, ["a", "a", "a"]) == 2


def test_scores_match_exact_phrase(searcher):
    """The chain automaton must score identically to PhraseQuery —
    same freq, same idf-sum weight, same norm."""
    q = taq([(0, 1, "spark"), (1, 2, "window")], [2])
    got = {
        r["doc_id"]: r["score"]
        for r in term_automaton_docs(searcher, q).collect()
    }
    want = {
        r["doc_id"]: r["score"]
        for r in searcher.docs(PhraseQuery(("spark", "window"))).collect()
    }
    assert got == want and got


def test_any_gap_on_corpus(searcher):
    """'spark ? window' ⊇ nothing of exact phrase; every match doc
    must contain spark and window two positions apart."""
    q = taq([(0, 1, "spark"), (1, 2, "*"), (2, 3, "window")], [3])
    rows = term_automaton_docs(searcher, q).collect()
    assert rows, "fixture corpus should contain 'spark x window'"
    posmap = {}
    for r in (
        searcher._postings_for_terms(["spark", "window"])
        .select("doc_id", "term", "positions")
        .collect()
    ):
        posmap.setdefault(r["doc_id"], {})[r["term"]] = list(r["positions"])
    for r in rows:
        pm = posmap[r["doc_id"]]
        assert any(p + 2 in pm.get("window", []) for p in pm.get("spark", []))
