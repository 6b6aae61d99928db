"""Top-k semantics: tie-break, paging, expansion queries
(mirrors CheckHits + TopDocs.merge tie-break tests)."""

from conftest import assert_rank_identical
from lucene_solr_spark.queries import PrefixQuery, TermRangeQuery, WildcardQuery, FuzzyQuery


def test_tie_break_score_desc_docid_asc(searcher, oracle):
    # equal float32 scores must order by doc_id ascending (HitQueue.java:76-81)
    top = searcher.search("table", 50).collect()
    scores = [r["score"] for r in top]
    for i in range(1, len(top)):
        if scores[i] == scores[i - 1]:
            assert top[i]["doc_id"] > top[i - 1]["doc_id"]
    assert_rank_identical(
        searcher.search("table", 50), oracle.top_k(oracle.term_scores("table"), 50)
    )


def test_search_after_paging(searcher, oracle):
    page1 = searcher.search("table", 10).collect()
    last = page1[-1]
    page2 = searcher.search_after("table", last["score"], last["doc_id"], 10).collect()
    want = oracle.top_k(oracle.term_scores("table"), 20)[10:20]
    got = [(r["doc_id"], r["score"]) for r in page2]
    assert [g[0] for g in got] == [w[0] for w in want]


def test_prefix_query(searcher, oracle):
    want = set()
    for t, pl in oracle.postings.items():
        if t.startswith("wind"):
            want |= set(pl)
    got = {r["doc_id"] for r in searcher.docs(PrefixQuery("wind")).collect()}
    assert got == want


def test_wildcard_query(searcher, oracle):
    import re

    pat = re.compile(r"^w.ndow$")
    want = set()
    for t, pl in oracle.postings.items():
        if pat.match(t):
            want |= set(pl)
    got = {r["doc_id"] for r in searcher.docs(WildcardQuery("w?ndow")).collect()}
    assert got == want


def test_term_range_query(searcher, oracle):
    want = set()
    for t, pl in oracle.postings.items():
        if "table" <= t <= "tables":
            want |= set(pl)
    got = {
        r["doc_id"]
        for r in searcher.docs(TermRangeQuery("table", "tables")).collect()
    }
    assert got == want


def test_fuzzy_query(searcher, oracle):
    # levenshtein ≤ 1 from 'tble' should reach 'table'
    got = {r["doc_id"] for r in searcher.docs(FuzzyQuery("tble", 1)).collect()}
    assert set(oracle.term_docs("table")) <= got


def test_fuzzy_pruning_matches_unpruned(searcher, oracle):
    """The pigeonhole/length pre-filters must not drop any true match:
    expanded term set == brute-force levenshtein over the dictionary,
    including edits at the string head (the case a naive shared-prefix
    filter would lose)."""

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    for q, k in [("tble", 1), ("xindow", 1), ("windoww", 2), ("able", 2)]:
        want = sorted(t for t in oracle.postings if lev(t, q) <= k)
        got = sorted(
            searcher._expand_terms(FuzzyQuery(q, k, transpositions=False))
        )
        assert got == want, (q, k, got, want)


def test_fuzzy_transpositions_osa(searcher, oracle):
    """Default mode (FuzzyQuery.java:58 transpositions=true): OSA
    distance — adjacent swaps are one edit; verified against a
    brute-force OSA over the whole dictionary."""
    from lucene_solr_spark.queries.searcher import osa_distance

    # metric spot checks incl. the OSA-vs-full-Damerau separator
    assert osa_distance("tabel", "table") == 1
    assert osa_distance("ab", "ba") == 1
    assert osa_distance("ca", "abc") == 3  # full Damerau would say 2
    for q, k in [("tabel", 1), ("sprak", 1), ("windoww", 2), ("able", 2)]:
        want = sorted(
            t for t in oracle.postings if osa_distance(t, q) <= k
        )
        got = sorted(searcher._expand_terms(FuzzyQuery(q, k)))
        assert got == want, (q, k, got, want)


def test_exact_mode_matches_double_precision_oracle(tables, oracle):
    """Exact scoring mode (double precision, unquantized norms) must match
    an independent double-precision computation — this is the mode the
    external SQL oracle cross-checks."""
    import math

    from lucene_solr_spark.queries import IndexSearcher

    s2 = IndexSearcher(tables, scoring="exact", cache_postings=False)
    n = oracle.doc_count
    avgdl = oracle.sum_ttf / n
    k1, b = 1.2, 0.75
    term = "spark"
    pl = oracle.postings[term]
    idf = math.log(1.0 + (n - len(pl) + 0.5) / (len(pl) + 0.5))
    want = {
        d: idf * (k1 + 1) * len(p) / (
            len(p) + k1 * (1 - b + b * oracle.lengths[d] / avgdl)
        )
        for d, p in pl.items()
    }
    top = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = [(r["doc_id"], r["score"]) for r in s2.search(term, 10).collect()]
    assert [g[0] for g in got] == [w[0] for w in top]
    for (gd, gs), (wd, ws) in zip(got, top):
        assert abs(gs - ws) < 1e-12


def test_search_batch_equals_individual(searcher):
    """One-job batched execution must reproduce per-query search()."""
    queries = {
        "a": "spark",
        "b": "+spark +window",
        "c": "vector hash",
        "d": '"spark window"',
    }
    batched = searcher.search_batch(queries, k=10).collect()
    by_q: dict[str, list] = {}
    for r in batched:
        by_q.setdefault(r["query_id"], []).append((r["doc_id"], r["score"]))
    for qid, qs in queries.items():
        solo = [
            (r["doc_id"], r["score"])
            for r in searcher.search(qs, k=10).collect()
        ]
        got = sorted(by_q.get(qid, []), key=lambda t: (-t[1], t[0]))
        assert got == solo, qid


def test_leading_wildcard_reversed_prefix(searcher, oracle):
    """Leading-wildcard expansion carries the ReversedWildcard-style
    sargable pre-filter (prefix on the reversed term) and still
    matches the oracle exactly; literal-prefix patterns carry a
    StartsWith on the term itself."""
    import re

    for pattern, rx in [("*dow", r"^.*dow$"), ("wi*ow", r"^wi.*ow$")]:
        pat = re.compile(rx)
        want = set()
        for t, pl in oracle.postings.items():
            if pat.match(t):
                want |= set(pl)
        got = {
            r["doc_id"]
            for r in searcher.docs(WildcardQuery(pattern)).collect()
        }
        assert got == want, pattern
    # the pre-filters are visible in the expansion plan
    ts = searcher.tables.term_stats
    from pyspark.sql import functions as F

    lead_plan = ts.filter(
        F.col("term").startswith("wi") & F.col("term").rlike("^wi.*ow$")
    )._jdf.queryExecution().optimizedPlan().toString()
    assert "StartsWith" in lead_plan


def test_spellcheck_osa_and_oracle_metric_agreement(searcher, oracle):
    """DirectSpellChecker candidates use the OSA metric; the DuckDB
    oracle uses full damerau_levenshtein — audit that the two metrics
    agree on every (vocab term, query) pair the gates touch, and that
    the ranking matches a brute-force recomputation."""
    from lucene_solr_spark.queries.mlt import spellcheck
    from lucene_solr_spark.queries.searcher import osa_distance

    def full_damerau(a, b):
        # textbook unrestricted Damerau (Lowrance-Wagner)
        da = {}
        maxd = len(a) + len(b)
        d = [[maxd] * (len(b) + 2) for _ in range(len(a) + 2)]
        for i in range(len(a) + 1):
            d[i + 1][1] = i
            d[i + 1][0] = maxd
        for j in range(len(b) + 1):
            d[1][j + 1] = j
            d[0][j + 1] = maxd
        for i in range(1, len(a) + 1):
            db = 0
            for j in range(1, len(b) + 1):
                k = da.get(b[j - 1], 0)
                l = db
                if a[i - 1] == b[j - 1]:
                    cost = 0
                    db = j
                else:
                    cost = 1
                d[i + 1][j + 1] = min(
                    d[i][j] + cost,
                    d[i + 1][j] + 1,
                    d[i][j + 1] + 1,
                    d[k][l] + (i - k - 1) + 1 + (j - l - 1),
                )
            da[a[i - 1]] = i
        return d[len(a) + 1][len(b) + 1]

    for q in ("windoe", "sprak", "tabel"):
        for t in oracle.postings:
            assert osa_distance(t, q) == full_damerau(t, q), (t, q)
        got = [
            (r["term"], r["dist"])
            for r in spellcheck(searcher, q, max_suggestions=3).collect()
        ]
        for term, dist in got:
            assert osa_distance(term, q) == dist
        # transpositions reach the adjacent-swap neighbor in ONE edit
    assert osa_distance("windoe", "window") == 1


def test_wildcard_escape(searcher, oracle):
    """WildcardQuery.WILDCARD_ESCAPE (WildcardQuery.java:50,90-97):
    '\\*' is a literal star (matches nothing in this corpus), '\\w*'
    escapes an ordinary char (same as unescaped), and a trailing
    backslash is lenient."""
    # escaped star: no vocabulary term contains '*'
    assert searcher._expand_terms(WildcardQuery(r"\*")) == []
    # escaping an ordinary char is a no-op
    a = sorted(searcher._expand_terms(WildcardQuery(r"\wind*")))
    b = sorted(searcher._expand_terms(WildcardQuery("wind*")))
    assert a == b and a
    # escaped '?' mid-pattern is literal → no match
    assert searcher._expand_terms(WildcardQuery(r"wind\?w")) == []
    # unescaped still wildcards
    assert "window" in searcher._expand_terms(WildcardQuery("wind?w"))
