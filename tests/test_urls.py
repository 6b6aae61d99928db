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
