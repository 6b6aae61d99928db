"""URLClassifyProcessor parity tests (update/processor/
URLClassifyProcessor.java:45-240): RFC 3986 dot-segment fold edge
cases, landing-suffix order, and the reference's canonical-URL
replaceFirst quirks."""

from pyspark.sql import functions as F

from lucene_solr_spark.functions.urls import (
    canonical_url_dedup,
    url_classify,
)


def _classify(spark, urls):
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "doc_id long, url string"
    )
    rows = url_classify(df).orderBy("doc_id").collect()
    return {u: r for u, r in zip(urls, rows)}


def test_dot_segment_normalization(spark):
    out = _classify(
        spark,
        [
            "http://h.com/a/./b",          # '.' dropped
            "http://h.com/a/x/../b",       # pair removed
            "http://h.com/a/b/..",         # trailing '..' -> directory
            "http://h.com/a/b/.",          # trailing '.' -> directory
            "http://h.com/a/x/../y/../b",  # two independent pairs
            "http://h.com/a/x/y/../../b",  # nested pops
            "http://h.com/a/..",           # pops to root
        ],
    )
    assert out["http://h.com/a/./b"].url_norm == "http://h.com/a/b"
    assert out["http://h.com/a/x/../b"].url_norm == "http://h.com/a/b"
    assert out["http://h.com/a/b/.."].url_norm == "http://h.com/a/"
    assert out["http://h.com/a/b/."].url_norm == "http://h.com/a/b/"
    assert out["http://h.com/a/x/../y/../b"].url_norm == "http://h.com/a/b"
    assert out["http://h.com/a/x/y/../../b"].url_norm == "http://h.com/a/b"
    assert out["http://h.com/a/.."].url_norm == "http://h.com/"


def test_levels_toplevel_landing(spark):
    out = _classify(
        spark,
        [
            "http://h.com/",
            "http://h.com/?q=1",
            "http://h.com/a/b/index.html",
            "http://h.com/a/b/index.html?q=1",
            "http://h.com/welcome.php",
            "http://h.com/a/b/c",
        ],
    )
    root = out["http://h.com/"]
    assert (root.url_levels, root.url_toplevel, root.url_landingpage) == (0, 1, 1)
    # query disables both toplevel and landingpage (isTopLevelPage/isLandingPage)
    q = out["http://h.com/?q=1"]
    assert (q.url_toplevel, q.url_landingpage) == (0, 0)
    idx = out["http://h.com/a/b/index.html"]
    # '/a/b/index.html' minus suffix -> '/a/b' -> 2 levels, landing page
    assert (idx.url_levels, idx.url_landingpage) == (2, 1)
    assert out["http://h.com/a/b/index.html?q=1"].url_landingpage == 0
    # '/welcome.php' strips to '' -> toplevel like the reference
    wp = out["http://h.com/welcome.php"]
    assert (wp.url_levels, wp.url_toplevel, wp.url_landingpage) == (0, 1, 1)
    assert out["http://h.com/a/b/c"].url_levels == 3


def test_suffix_order_slash_wins(spark):
    # path ending '/' matches suffix "/" FIRST even when a longer
    # suffix ('index.html') appears earlier in the path
    out = _classify(spark, ["http://h.com/index.html/"])
    r = out["http://h.com/index.html/"]
    assert r.url_landingpage == 1
    # canonical: '/' + '/' = '//$' never matches a normalized URL ->
    # unchanged (the reference quirk)
    assert r.url_canonical == "http://h.com/index.html/"


def test_canonical_quirks(spark):
    out = _classify(
        spark,
        [
            "http://h.com/a/index.html",    # -> /a/
            "http://h.com/a/Index.HTML",    # case-sensitive replace: unchanged
            "http://h.com/a/index.html?x=1",  # query blocks the $ anchor
        ],
    )
    assert out["http://h.com/a/index.html"].url_canonical == "http://h.com/a/"
    assert (
        out["http://h.com/a/Index.HTML"].url_canonical == "http://h.com/a/Index.HTML"
    )
    assert (
        out["http://h.com/a/index.html?x=1"].url_canonical
        == "http://h.com/a/index.html?x=1"
    )


def test_fragment_semantics(spark):
    """java.net.URL fragment rules: the '#fragment' survives into
    url_norm (URI.normalize().toURL().toString() keeps the ref) and a
    '?' INSIDE the fragment is NOT a query — 'http://h/p#a?b' has
    getQuery()==null, so toplevel/landingpage checks see no query."""
    out = _classify(
        spark,
        [
            "http://h.com/a/./b#sec1",       # normalized path + fragment kept
            "http://h.com/#a?b",             # '?' in fragment: NOT a query
            "http://h.com/?q=1#frag",        # query AND fragment
            "http://h.com/a/index.html#top", # fragment doesn't unblock landing
        ],
    )
    assert out["http://h.com/a/./b#sec1"].url_norm == "http://h.com/a/b#sec1"
    r = out["http://h.com/#a?b"]
    assert r.url_norm == "http://h.com/#a?b"
    # no query: root stays toplevel + landing despite the '?' in the fragment
    assert (r.url_toplevel, r.url_landingpage) == (1, 1)
    q = out["http://h.com/?q=1#frag"]
    assert q.url_norm == "http://h.com/?q=1#frag"
    assert (q.url_toplevel, q.url_landingpage) == (0, 0)
    lp = out["http://h.com/a/index.html#top"]
    # landing suffix check runs on getPath() (fragment-free) with no query
    assert lp.url_landingpage == 1
    # canonical replaceFirst('/'+lps+'$') is anchored on the FULL string:
    # a trailing fragment means no match, url returned unchanged
    assert lp.url_canonical == "http://h.com/a/index.html#top"


def test_domain_and_port_preserved(spark):
    out = _classify(spark, ["https://Sub.Host.com:8080/a/"])
    r = out["https://Sub.Host.com:8080/a/"]
    # reference does not lowercase the host nor strip ports
    assert r.url_domain == "Sub.Host.com"
    assert r.url_norm == "https://Sub.Host.com:8080/a/"


def test_canonical_dedup_merges_equivalent_forms(spark):
    urls = [
        "http://h.com/docs/guide1",
        "http://h.com/docs/x/../guide1",     # normalizes onto row 0
        "http://h.com/docs/guide1/",
        "http://h.com/docs/guide1/index.html",  # canonicalizes onto row 2
        "http://h.com/other",
    ]
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "doc_id long, url string"
    )
    groups = {
        r.url_canonical: r
        for r in canonical_url_dedup(url_classify(df)).collect()
    }
    assert groups["http://h.com/docs/guide1"].dup_count == 2
    assert groups["http://h.com/docs/guide1"].rep_id == 0
    assert groups["http://h.com/docs/guide1/"].dup_count == 2
    assert groups["http://h.com/docs/guide1/"].rep_id == 2
    assert groups["http://h.com/other"].dup_count == 1


def _rfc3986_remove_dot_segments(path: str) -> str:
    """Pure-Python reference model (RFC 3986 §5.2.4 restricted to the
    absolute, well-behaved inputs url_classify handles: no '//' runs,
    no rootless '..')."""
    last = path.split("/")[-1]
    trailing_dir = last in ("", ".", "..")
    acc: list[str] = []
    for seg in [s for s in path.split("/")[1:] if s != ""]:
        if seg == ".":
            continue
        if seg == "..":
            if acc:
                acc.pop()
            continue
        acc.append(seg)
    if not acc:
        return "/"
    return "/" + "/".join(acc) + ("/" if trailing_dir else "")


def test_fold_matches_rfc_model_on_generated_paths(spark):
    """Property-style sweep: the F.aggregate fold equals the pure-Python
    RFC model over an exhaustive small grammar of segment sequences
    (every 1-4 length combination of real segments and dot segments
    with/without trailing slash — 1,248 paths)."""
    import itertools

    segs = ["a", "bb", ".", ".."]
    paths = []
    for n in (1, 2, 3, 4):
        for combo in itertools.product(segs, repeat=n):
            # skip rootless '..' (pops past root are engine-divergent
            # by design; URI.normalize keeps them, we clamp)
            depth = 0
            ok = True
            for s in combo:
                if s == "a" or s == "bb":
                    depth += 1
                elif s == "..":
                    if depth == 0:
                        ok = False
                        break
                    depth -= 1
            if not ok:
                continue
            for trail in ("", "/"):
                paths.append("/" + "/".join(combo) + trail)
    urls = [f"http://h.com{p}" for p in dict.fromkeys(paths)]
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "doc_id long, url string"
    )
    got = {
        r["url"]: r["url_norm"]
        for r in url_classify(df).select("url", "url_norm").collect()
    }
    bad = []
    for u in urls:
        path = u[len("http://h.com"):]
        want = "http://h.com" + _rfc3986_remove_dot_segments(path)
        if got[u] != want:
            bad.append((u, got[u], want))
    assert not bad, bad[:10]


def test_url_classify_plan_is_shuffle_free(spark):
    """Scale shape: classification is one linear pass — the physical
    plan has no Exchange (shuffle) and no Python UDF (BatchEvalPython /
    ArrowEvalPython); the only shuffle in the dedup path is the final
    canonical groupBy."""
    df = spark.createDataFrame([(0, "http://h.com/a/./b")], "doc_id long, url string")
    plan = url_classify(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "EvalPython" not in plan, plan
    dedup_plan = (
        canonical_url_dedup(url_classify(df))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "EvalPython" not in dedup_plan, dedup_plan
