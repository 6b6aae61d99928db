"""BoostingQuery, DiversifiedTopDocsCollector, and TermsComponent.

Refs: queries/BoostingQuery.java:44-121,
lucene/misc/.../search/DiversifiedTopDocsCollector.java:1-220,
solr/core/.../handler/component/TermsComponent.java:110-245.
"""

import pyspark.sql.functions as F
import pytest

from lucene_solr_spark.queries.diversity import diversified_topk
from lucene_solr_spark.queries.query import BoostingQuery, TermQuery
from lucene_solr_spark.queries.terms_enum import terms_enumerate


# ------------------------------------------------------------ BoostingQuery
def test_boosting_demotes_context_matches(searcher):
    base = {
        r["doc_id"]: r["score"]
        for r in searcher.docs(TermQuery("spark")).collect()
    }
    ctx_docs = {
        r["doc_id"]
        for r in searcher.docs(TermQuery("join")).select("doc_id").collect()
    }
    q = BoostingQuery(TermQuery("spark"), TermQuery("join"), 0.5)
    got = {r["doc_id"]: r["score"] for r in searcher.docs(q).collect()}
    # selection is match-only: same doc set, context-only docs excluded
    assert set(got) == set(base)
    for d, s in got.items():
        want = base[d] * 0.5 if d in ctx_docs else base[d]
        assert s == pytest.approx(want, rel=1e-9)
    assert any(d in ctx_docs for d in got), "fixture must exercise the demote"
    assert any(d not in ctx_docs for d in got)


def test_boosting_no_context_match_is_identity(searcher):
    q = BoostingQuery(TermQuery("spark"), TermQuery("zzzznothere"), 0.1)
    base = {
        r["doc_id"]: r["score"]
        for r in searcher.docs(TermQuery("spark")).collect()
    }
    got = {r["doc_id"]: r["score"] for r in searcher.docs(q).collect()}
    assert got == base


# ------------------------------------------------- DiversifiedTopDocsCollector
def test_diversified_topk_caps_per_key(spark, searcher, docs_df):
    scored = searcher.docs(TermQuery("vector")).select(
        "doc_id", F.round(F.col("score").cast("double"), 4).alias("score")
    )
    keys = docs_df.select("doc_id", "lang")
    out = diversified_topk(
        scored, keys, k=10, max_hits_per_key=2, key_col="lang"
    ).collect()
    assert len(out) == 10
    per_key = {}
    for r in out:
        per_key[r["lang"]] = per_key.get(r["lang"], 0) + 1
    assert max(per_key.values()) <= 2
    assert len(per_key) >= 5  # diversity actually happened on 5 langs


def test_diversified_equals_greedy_reference(spark, searcher, docs_df):
    """Cap-filter + global top-k == greedy by score skipping full keys
    (the collector's net selection)."""
    scored = searcher.docs(TermQuery("vector")).select(
        "doc_id", F.round(F.col("score").cast("double"), 4).alias("score")
    )
    keys = {r["doc_id"]: r["lang"] for r in docs_df.select("doc_id", "lang").collect()}
    rows = sorted(
        ((r["score"], r["doc_id"]) for r in scored.collect()),
        key=lambda t: (-t[0], t[1]),
    )
    taken, seen = [], {}
    for score, doc in rows:
        k = keys[doc]
        if seen.get(k, 0) >= 2:
            continue
        seen[k] = seen.get(k, 0) + 1
        taken.append((doc, score))
        if len(taken) == 10:
            break
    got = [
        (r["doc_id"], r["score"])
        for r in diversified_topk(
            scored, docs_df.select("doc_id", "lang"), k=10,
            max_hits_per_key=2, key_col="lang",
        ).collect()
    ]
    assert got == taken


# ------------------------------------------------------------ TermsComponent
@pytest.fixture(scope="module")
def tstats(tables):
    return tables.term_stats


def _all_terms(tstats):
    return {
        r["term"]: r["df"] for r in tstats.select("term", "df").collect()
    }


def test_terms_sort_count_order(tstats):
    got = [
        (r["term"], r["docfreq"])
        for r in terms_enumerate(tstats, prefix="s", limit=5).collect()
    ]
    vocab = sorted(
        ((t, d) for t, d in _all_terms(tstats).items() if t.startswith("s")),
        key=lambda p: (-p[1], p[0]),
    )
    assert got == vocab[:5]


def test_terms_sort_index_and_bounds(tstats):
    got = [
        r["term"]
        for r in terms_enumerate(
            tstats, lower="s", upper="t", sort="index", limit=100
        ).collect()
    ]
    vocab = sorted(t for t in _all_terms(tstats) if "s" <= t < "t")
    assert got == vocab


def test_terms_lower_exclusive_upper_inclusive(tstats):
    vocab = sorted(_all_terms(tstats))
    lo = vocab[3]
    got = [
        r["term"]
        for r in terms_enumerate(
            tstats, lower=lo, lower_incl=False, upper=vocab[8],
            upper_incl=True, sort="index", limit=100,
        ).collect()
    ]
    assert got == vocab[4:9]


def test_terms_mincount_maxcount(tstats):
    all_t = _all_terms(tstats)
    dfs = sorted(set(all_t.values()))
    mid = dfs[len(dfs) // 2]
    got = {
        r["term"]: r["docfreq"]
        for r in terms_enumerate(
            tstats, mincount=mid, maxcount=mid, limit=-1, sort="index"
        ).collect()
    }
    want = {t: d for t, d in all_t.items() if d == mid}
    assert got == want


def test_terms_regexp(tstats):
    got = {
        r["term"]
        for r in terms_enumerate(
            tstats, regexp="^s.*k$", limit=-1, sort="index"
        ).collect()
    }
    want = {t for t in _all_terms(tstats) if t.startswith("s") and t.endswith("k")}
    assert got == want


def test_diversified_random_greedy_equivalence(spark):
    """Randomized: cap-filter + global top-k == greedy by (score desc,
    id asc) skipping full keys, on random score/key tables."""
    import random

    rng = random.Random(5)
    for _ in range(5):
        n = rng.randint(5, 60)
        rows = [
            (i, round(rng.uniform(0, 3), 1), rng.choice("pqrs"))
            for i in range(n)
        ]
        cap = rng.randint(1, 3)
        k = rng.randint(1, 12)
        scored = spark.createDataFrame(
            [(i, s) for i, s, _ in rows], "doc_id long, score double"
        )
        keys = spark.createDataFrame(
            [(i, g) for i, _, g in rows], "doc_id long, key string"
        )
        got = [
            (r["doc_id"], r["score"])
            for r in diversified_topk(scored, keys, k=k, max_hits_per_key=cap).collect()
        ]
        taken, seen = [], {}
        for i, s, g in sorted(rows, key=lambda t: (-t[1], t[0])):
            if seen.get(g, 0) >= cap:
                continue
            seen[g] = seen.get(g, 0) + 1
            taken.append((i, s))
            if len(taken) == k:
                break
        assert got == taken, (rows, cap, k)
