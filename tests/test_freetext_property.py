"""Property test: FreeTextSuggester.lookup equals a brute-force
stupid-backoff reference on random corpora/keys."""

import random
from collections import Counter

import pytest

from lucene_solr_spark.queries.freetext import ALPHA, FreeTextSuggester

VOCAB = ["ab", "cd", "ef", "gh", "ij"]


def brute_lookup(corpus, grams, key, num):
    """Independent reimplementation straight from the reference's
    lookup() spec (FreeTextSuggester.java:423-689)."""
    counts = {n: Counter() for n in range(1, grams + 1)}
    for text in corpus:
        toks = text.split()
        for n in range(1, grams + 1):
            for i in range(len(toks) - n + 1):
                counts[n][" ".join(toks[i:i + n])] += 1
    tot = sum(counts[1].values())

    tokens = key.lower().split()
    ended = key.endswith(" ")
    levels = [None] * grams
    for g in range(grams):
        if ended:
            if g == 0:
                continue
            if len(tokens) >= g:
                levels[g] = (tokens[-g:], "")
        else:
            if len(tokens) >= g + 1:
                levels[g] = (tokens[-(g + 1):-1] if g else [], tokens[-1])

    results, seen = [], set()
    backoff = 1.0
    for g in range(grams - 1, -1, -1):
        if levels[g] is None:
            continue
        ctx_tokens, frag = levels[g]
        ctx = " ".join(ctx_tokens)
        cands = []
        for gram, cnt in counts[g + 1].items():
            parts = gram.split()
            if " ".join(parts[:-1]) != ctx:
                continue
            if frag and not parts[-1].startswith(frag):
                continue
            if parts[-1] in seen:
                continue
            cands.append((gram, parts[-1], cnt))
        cands.sort(key=lambda t: (-t[2], t[0]))
        denom = float(tot) if g == 0 else float(counts[g].get(ctx, 0) or 1)
        for gram, last, cnt in cands[:num]:
            results.append((gram, backoff * cnt / denom))
            seen.add(last)
        backoff *= ALPHA
    results.sort(key=lambda t: (-t[1], t[0]))
    return results[:num]


@pytest.mark.parametrize("grams", [2, 3])
def test_lookup_matches_brute_force(spark, grams):
    rng = random.Random(7)
    corpora = []
    for _ in range(4):
        corpora.append(
            [
                " ".join(rng.choice(VOCAB) for _ in range(rng.randint(1, 8)))
                for _ in range(rng.randint(3, 12))
            ]
        )
    nonempty = 0
    for corpus in corpora:
        sug = FreeTextSuggester(grams=grams).build(
            spark.createDataFrame([(t,) for t in corpus], "text string")
        )
        keys = [
            "ab ",
            "ab c",
            "cd ef ",
            "e",
            "zz ",
            "ab cd e",
        ]
        for key in keys:
            got = [
                (r["key"], r["score"]) for r in sug.lookup(key, num=4).collect()
            ]
            want = brute_lookup(corpus, grams, key, 4)
            assert [k for k, _ in got] == [k for k, _ in want], (corpus, key)
            for (_, gs), (_, ws) in zip(got, want):
                assert gs == pytest.approx(ws, rel=1e-12)
            nonempty += bool(got)
    assert nonempty > 10
