"""Property test: the TermAutomatonScorer sweep port equals an
independent per-start NFA simulation (multiset semantics, ANY between
term steps, accepts only on term steps) on random automata/streams."""

import random

from lucene_solr_spark.queries.term_automaton import (
    TermAutomatonQuery,
    _count_matches,
)

VOCAB = ["a", "b", "c", "d"]


def per_start_freq(q, tokens):
    """Sum over start positions of a straightforward simulation:
    states seed at step(0, tok_s) (token step, accept counted), then
    each later position steps EVERY held state via the token symbol
    (accept counted) AND via ANY (never counted) — exactly the
    reference's path-multiset semantics, but start-by-start instead of
    the interleaved sweep."""
    step, accept = q._dfa.step, q._dfa.accept
    qterms = set(q.terms)
    freq = 0
    n = len(tokens)
    for s in range(n):
        if tokens[s] not in qterms:
            continue
        q0 = step.get((0, tokens[s]))
        if q0 is None:
            continue
        if q0 in accept:
            freq += 1
        states = [q0]
        p = s + 1
        while p < n and states:
            new = []
            tok = tokens[p]
            if tok in qterms:
                for st in states:
                    nx = step.get((st, tok))
                    if nx is not None:
                        new.append(nx)
                        if nx in accept:
                            freq += 1
            for st in states:
                nx = step.get((st, "*"))
                if nx is not None:
                    new.append(nx)
            states = new
            p += 1
    return freq


def random_automaton(rng):
    q = TermAutomatonQuery()
    n_states = rng.randint(2, 5)
    n_trans = rng.randint(2, 8)
    has_term = False
    for _ in range(n_trans):
        src = rng.randrange(n_states)
        dst = rng.randrange(n_states)
        if rng.random() < 0.25:
            q.add_any_transition(src, dst)
        else:
            q.add_transition(src, dst, rng.choice(VOCAB))
            has_term = True
    if not has_term:
        q.add_transition(0, 1, "a")
    q.set_accept(rng.randrange(n_states))
    q.set_accept(rng.randrange(n_states))
    return q.finish()


def test_sweep_equals_per_start_simulation():
    rng = random.Random(42)
    checked_nonzero = 0
    for trial in range(300):
        q = random_automaton(rng)
        tokens = [rng.choice(VOCAB + ["x", "y"]) for _ in range(rng.randint(0, 25))]
        events = [
            (i, t) for i, t in enumerate(tokens) if t in set(q.terms)
        ]
        got = _count_matches(events, q._dfa, q.has_any)
        want = per_start_freq(q, tokens)
        assert got == want, (trial, q.transitions, q.accept_states, tokens)
        if want:
            checked_nonzero += 1
    assert checked_nonzero > 30  # the trials actually exercise matches


def test_batch_kernel_equals_per_doc_port():
    """The doc-parallel counts-vector kernel (automaton_freqs_batch)
    equals the literal countMatches port (automaton_freqs_loop) on
    random automata — ANY gaps, same-position multi-term events, None
    docs — exactly (integer freqs)."""
    import numpy as np

    from lucene_solr_spark.queries.term_automaton import (
        TermAutomatonQuery,
        automaton_freqs_batch,
        automaton_freqs_loop,
    )

    rng = np.random.default_rng(17)
    for _ in range(200):
        n_states = int(rng.integers(2, 6))
        terms = [f"t{i}" for i in range(int(rng.integers(1, 4)))]
        taq = TermAutomatonQuery()
        for _t in range(int(rng.integers(1, 8))):
            s, d = int(rng.integers(0, n_states)), int(rng.integers(0, n_states))
            if rng.random() < 0.3:
                taq.add_any_transition(s, d)
            else:
                taq.add_transition(s, d, terms[int(rng.integers(0, len(terms)))])
        taq.set_accept(int(rng.integers(0, n_states)))
        taq.finish()
        D = int(rng.integers(1, 16))
        pls = {}
        for t in terms:
            col = np.empty(D, dtype=object)
            for d in range(D):
                k = int(rng.integers(0, 6))
                col[d] = (
                    None
                    if (k == 0 and rng.random() < 0.5)
                    else np.sort(
                        rng.choice(np.arange(0, 15), size=k, replace=False)
                    ).astype(np.int64)
                )
            pls[t] = col
        a = automaton_freqs_loop(taq, pls, D)
        b = automaton_freqs_batch(taq, pls, D)
        assert np.array_equal(a, b), (a, b)
