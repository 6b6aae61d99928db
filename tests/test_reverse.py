"""ReverseStringFilter / ReversedWildcardFilter, pinned on the
reference's own vectors (TestReversedWildcardFilterFactory.java:68-161,
TestReverseStringFilter.java)."""

from __future__ import annotations

from lucene_solr_spark.analysis.reverse import (
    START_OF_HEADING_MARKER as M,
    reverse_marked,
    reverse_str,
    reversed_wildcard_tokens,
    rewrite_wildcard,
    sargable_prefix,
    should_reverse,
)


def test_reverse_str_plain():
    # TestReverseStringFilter: "Do have a nice day" -> "oD", "evah", ...
    for src, want in [("Do", "oD"), ("have", "evah"), ("day", "yad")]:
        assert reverse_str(src) == want


def test_reverse_marked_supplementary():
    # the reference's si𝄞x vector: supplementary char stays
    # intact (ReversedWildcardFilter.reverse keeps surrogate order;
    # Python codepoints make that automatic)
    tok = "si\U0001D11Ex"
    assert reverse_marked(tok) == M + "x\U0001D11Eis"


def test_reversed_wildcard_tokens_with_original():
    # TestReversedWildcardFilterFactory.testReversedTokens: reversed
    # first, original second at the SAME position
    out = reversed_wildcard_tokens(["simple", "text"], with_original=True)
    assert out == [
        (M + "elpmis", 0),
        ("simple", 0),
        (M + "txet", 1),
        ("text", 1),
    ]
    out = reversed_wildcard_tokens(["simple", "text"], with_original=False)
    assert out == [(M + "elpmis", 0), (M + "txet", 1)]


def test_should_reverse_reference_vectors():
    # TestReversedWildcardFilterFactory.testQueryParsing with the
    # schema-reversed.xml args: maxPosAsterisk=3, maxPosQuestion=2,
    # maxFractionAsterisk=0.33, minTrailing=2
    kw = dict(
        max_pos_asterisk=3,
        max_pos_question=2,
        max_fraction_asterisk=0.33,
        min_trailing=2,
    )
    assert should_reverse("*hree", **kw)
    assert should_reverse("t*ree", **kw)
    assert should_reverse("th*ee", **kw)
    assert not should_reverse("thr*e", **kw)
    assert should_reverse("?hree", **kw)
    assert should_reverse("t?ree", **kw)
    assert not should_reverse("th?ee", **kw)
    assert not should_reverse("th?*ee", **kw)
    assert not should_reverse("short*token", **kw)
    assert should_reverse("ver*longtoken", **kw)
    # not a wildcard: never reversed (factory Note 2)
    assert not should_reverse("three", **kw)


def test_rewrite_and_prefix():
    assert rewrite_wildcard("*ion") == M + "noi*"
    assert sargable_prefix(M + "noi*") == M + "noi"
    assert rewrite_wildcard("f*ur") == M + "ru*f"
    # forward patterns keep their own literal prefix
    assert sargable_prefix("gr*up") == "gr"


def test_gate_plan_is_sargable(spark):
    # the reversed branch must plan as a StartsWith pushed filter on
    # the doubled dictionary, not a bare full-vocabulary rlike
    import __spark_entry__ as entrymod

    sf_dir = "/root/testdata/sf0.001"
    df = entrymod.q_reversed_wildcard(spark, sf_dir)
    rows = {(r["wc"], r["doc_id"]) for r in df.collect()}
    # semantic spot check vs a direct forward evaluation
    t = entrymod._index_tables(spark, sf_dir)
    import pyspark.sql.functions as F

    want_er = {
        ("*er", r["doc_id"])
        for r in t.postings.filter(F.col("term").rlike("^.*er$"))
        .select("doc_id")
        .distinct()
        .collect()
    }
    want_gr = {
        ("gr*up", r["doc_id"])
        for r in t.postings.filter(F.col("term").rlike("^gr.*up$"))
        .select("doc_id")
        .distinct()
        .collect()
    }
    assert rows == want_er | want_gr
    assert want_er and want_gr  # both branches exercised
    # the reversed branch must carry a literal StartsWith prefix in
    # the optimized plan (the sargable range-scan shape), not a bare
    # full-vocabulary rlike
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "StartsWith" in plan
