"""Property tests for the Lucene RegExp DFA engine: on the operator
subset shared with Python ``re`` (literals, ., |, *, +, ?, {n,m},
classes, groups), random patterns must agree with ``re.fullmatch`` on
random inputs; the Lucene-only operators obey their algebraic laws."""

from __future__ import annotations

import random
import re as pyre

from lucene_solr_spark.queries.luceneregexp import LuceneRegExp

ALPHA = "abc"


def _rand_pattern(rng: random.Random, depth: int = 0) -> str:
    choices = ["lit", "class", "dot"]
    if depth < 3:
        choices += ["concat", "union", "star", "plus", "opt", "group", "rep"]
    kind = rng.choice(choices)
    if kind == "lit":
        return rng.choice(ALPHA)
    if kind == "class":
        chars = rng.sample(ALPHA, rng.randint(1, 3))
        neg = "^" if rng.random() < 0.3 else ""
        return "[" + neg + "".join(sorted(chars)) + "]"
    if kind == "dot":
        return "."
    if kind == "concat":
        return _rand_pattern(rng, depth + 1) + _rand_pattern(rng, depth + 1)
    if kind == "union":
        return (
            "("
            + _rand_pattern(rng, depth + 1)
            + "|"
            + _rand_pattern(rng, depth + 1)
            + ")"
        )
    if kind == "star":
        return "(" + _rand_pattern(rng, depth + 1) + ")*"
    if kind == "plus":
        return "(" + _rand_pattern(rng, depth + 1) + ")+"
    if kind == "opt":
        return "(" + _rand_pattern(rng, depth + 1) + ")?"
    if kind == "rep":
        n = rng.randint(0, 2)
        m = n + rng.randint(0, 2)
        return "(" + _rand_pattern(rng, depth + 1) + ")" + f"{{{n},{m}}}"
    return "(" + _rand_pattern(rng, depth + 1) + ")"


def test_agrees_with_python_re_on_shared_subset():
    rng = random.Random(42)
    checked = 0
    for _ in range(300):
        pat = _rand_pattern(rng)
        try:
            pyc = pyre.compile(pat)
        except pyre.error:
            continue
        lrx = LuceneRegExp(pat)
        for _ in range(25):
            s = "".join(
                rng.choice(ALPHA) for _ in range(rng.randint(0, 6))
            )
            assert lrx.matches(s) == bool(pyc.fullmatch(s)), (pat, s)
            checked += 1
    assert checked > 3000


def test_complement_law():
    rng = random.Random(7)
    for _ in range(100):
        pat = _rand_pattern(rng)
        try:
            lrx = LuceneRegExp(pat)
            crx = LuceneRegExp("~(" + pat + ")")
        except ValueError:
            continue
        for _ in range(20):
            s = "".join(
                rng.choice(ALPHA) for _ in range(rng.randint(0, 5))
            )
            assert lrx.matches(s) != crx.matches(s), (pat, s)


def test_intersection_law():
    rng = random.Random(13)
    for _ in range(100):
        p1 = _rand_pattern(rng)
        p2 = _rand_pattern(rng)
        try:
            a = LuceneRegExp(p1)
            b = LuceneRegExp(p2)
            both = LuceneRegExp("(" + p1 + ")&(" + p2 + ")")
        except ValueError:
            continue
        for _ in range(20):
            s = "".join(
                rng.choice(ALPHA) for _ in range(rng.randint(0, 5))
            )
            assert both.matches(s) == (a.matches(s) and b.matches(s)), (
                p1,
                p2,
                s,
            )


def test_interval_exhaustive_small():
    rx = LuceneRegExp("<3-27>")
    for n in range(0, 40):
        want = 3 <= n <= 27
        assert rx.matches(str(n)) == want, n
        assert rx.matches("0" + str(n)) == want, n  # leading zero ok
    fixed = LuceneRegExp("<03-27>")  # equal width fixes digits at 2
    assert fixed.matches("03") and fixed.matches("27") and fixed.matches("10")
    assert not fixed.matches("3") and not fixed.matches("027")
