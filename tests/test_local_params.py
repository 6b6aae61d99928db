"""Local-params QParser dispatch ({!type k=v}q — solr search/QParser.java
getParser + *QParserPlugin.java routing)."""

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.queries.local_params import (
    BoostByFunctionQuery,
    FunctionQuery,
    FunctionRangeQuery,
    SolrQueryDispatcher,
    parse_local_params,
)
from lucene_solr_spark.queries.query import (
    BooleanQuery,
    ConstantScoreQuery,
    Occur,
    PrefixQuery,
    TermQuery,
)


def test_parse_local_params_syntax():
    t, kv, rest = parse_local_params('{!prefix f=name v=spa}')
    assert t == "prefix" and kv == {"f": ["name"], "v": ["spa"]} and rest == ""
    t, kv, rest = parse_local_params('{!term f=lang}en')
    assert t == "term" and rest == "en"
    t, kv, rest = parse_local_params('{!type=frange l=0 u=10}sum(x, 1)')
    assert t == "frange" and kv["l"] == ["0"] and rest == "sum(x, 1)"
    # quoted values keep spaces; repeated keys accumulate
    t, kv, rest = parse_local_params('{!bool must="a b" must=c}')
    assert kv["must"] == ["a b", "c"]
    # no local params → lucene passthrough
    t, kv, rest = parse_local_params("plain query")
    assert t is None and rest == "plain query"


def test_parse_dollar_refs():
    t, kv, _ = parse_local_params("{!term v=$qq}", params={"qq": "spark"})
    assert kv["v"] == ["spark"]
    with pytest.raises(ValueError):
        parse_local_params("{!term v=$missing}")


def _dispatcher(searcher=None, doc_values=None, params=None):
    return SolrQueryDispatcher(searcher, doc_values, params)


def test_dispatch_builds_query_trees():
    d = _dispatcher()
    assert d.parse("{!term v=spark}") == TermQuery("spark")
    assert d.parse("{!prefix}spa") == PrefixQuery("spa")
    q = d.parse("{!terms}a,b,c")
    assert isinstance(q, ConstantScoreQuery)
    inner = q.query
    assert isinstance(inner, BooleanQuery)
    assert [c.query.term for c in inner.clauses] == ["a", "b", "c"]
    assert all(c.occur == Occur.SHOULD for c in inner.clauses)
    assert d.parse("{!func}recip(x, 1, 1000, 1000)") == FunctionQuery(
        "recip(x, 1, 1000, 1000)"
    )
    fr = d.parse("{!frange l=5 u=9 incu=false}sum(x, 1)")
    assert fr == FunctionRangeQuery("sum(x, 1)", 5.0, 9.0, True, False)
    bq = d.parse('{!bool must="{!term v=spark}" should="{!prefix v=ha}" mm=0}')
    assert isinstance(bq, BooleanQuery)
    assert bq.clauses[0].occur == Occur.MUST
    assert bq.clauses[0].query == TermQuery("spark")
    assert bq.clauses[1].query == PrefixQuery("ha")
    bb = d.parse("{!boost b=log(n_chars)}spark")
    assert isinstance(bb, BoostByFunctionQuery)
    assert bb.boost_text == "log(n_chars)"


@pytest.fixture(scope="module")
def corpus(spark):
    from lucene_solr_spark.index import build_tables
    from lucene_solr_spark.queries.searcher import IndexSearcher

    docs = spark.createDataFrame(
        [
            (0, "spark index merge", 10),
            (1, "spark spark query", 20),
            (2, "hash join probe", 30),
            (3, "merge sort spill", 40),
        ],
        ["doc_id", "text", "n_chars"],
    )
    t = build_tables(docs, id_col="doc_id", text_col="text")
    s = IndexSearcher(t, scoring="exact")
    return s, docs


def test_exec_func_and_frange(spark, corpus):
    s, docs = corpus
    d = _dispatcher(s, docs)
    got = {
        r["doc_id"]: r["score"]
        for r in d.docs("{!func}product(n_chars, 2)").collect()
    }
    assert got == {0: 20.0, 1: 40.0, 2: 60.0, 3: 80.0}
    ids = sorted(
        r["doc_id"] for r in d.docs("{!frange l=20 u=40 incu=false}field(n_chars)").collect()
    )
    assert ids == [1, 2]


def test_exec_boost_and_term(spark, corpus):
    s, docs = corpus
    d = _dispatcher(s, docs)
    base = {r["doc_id"]: r["score"] for r in d.docs("{!term v=spark}").collect()}
    boosted = {
        r["doc_id"]: r["score"]
        for r in d.docs("{!boost b=n_chars}{!term v=spark}").collect()
    }
    assert set(base) == set(boosted) == {0, 1}
    assert boosted[0] == pytest.approx(base[0] * 10)
    assert boosted[1] == pytest.approx(base[1] * 20)


def test_exec_terms_filter(spark, corpus):
    s, docs = corpus
    d = _dispatcher(s, docs)
    ids = sorted(r["doc_id"] for r in d.docs("{!terms}hash,spill").collect())
    assert ids == [2, 3]
    # constant score semantics
    scores = {r["score"] for r in d.docs("{!terms}hash,spill").collect()}
    assert scores == {1.0}


def test_unknown_parser_raises():
    with pytest.raises(ValueError):
        _dispatcher().parse("{!nosuch}x")


def test_join_qparser_semi_join(spark):
    from lucene_solr_spark.queries.local_params import (
        JoinQuery,
        SolrQueryDispatcher,
    )

    cust = spark.createDataFrame(
        [(1, 50.0), (2, 200.0), (3, 500.0)],
        "doc_id long, c_acctbal double",
    ).withColumn("c_custkey", F.col("doc_id"))
    orders = spark.createDataFrame(
        [(10, 1), (11, 2), (12, 2), (13, 3), (14, 9)],
        "doc_id long, o_custkey long",
    )
    d = SolrQueryDispatcher(None, orders, tables={"cust": cust})
    q = d.parse("{!join from=c_custkey to=o_custkey fromIndex=cust}{!frange l=100}c_acctbal")
    assert q == JoinQuery(
        "c_custkey", "o_custkey", d.parse("{!frange l=100}c_acctbal"), "cust"
    )
    got = {(r["doc_id"], r["score"]) for r in d.docs(q).collect()}
    # customers 2, 3 pass the frange; order 14's custkey matches nobody
    assert got == {(11, 1.0), (12, 1.0), (13, 1.0)}


def test_geofilt_and_bbox_superset(spark):
    from lucene_solr_spark.queries.local_params import SolrQueryDispatcher

    pts = spark.createDataFrame(
        [
            (0, 40.7, -74.0),   # the query point itself
            (1, 41.0, -73.0),   # ~90 km away
            (2, 48.85, 2.35),   # Paris, ~5800 km
            (3, 40.7, -70.0),   # ~337 km due east — inside d=400
        ],
        "doc_id long, store_lat double, store_lon double",
    )
    d = SolrQueryDispatcher(None, pts)
    circle = sorted(
        r["doc_id"]
        for r in d.docs("{!geofilt sfield=store pt=40.7,-74.0 d=400}").collect()
    )
    assert circle == [0, 1, 3]
    box = sorted(
        r["doc_id"]
        for r in d.docs("{!bbox sfield=store pt=40.7,-74.0 d=400}").collect()
    )
    # the box is a SUPERSET of the circle (SpatialUtils.calcBoxByDistFromPt)
    assert set(circle) <= set(box)
    assert 2 not in box


def test_bbox_east_west_extreme_included(spark):
    """The asin-form longitude half-width must cover points just inside
    the circle at the due-east extreme, where the linear d/(R·cos φ)
    approximation under-covers (DistanceUtils.calcBoxByDistFromPtDEG)."""
    import math

    from lucene_solr_spark.functions.valuesource import EARTH_RADIUS_KM
    from lucene_solr_spark.queries.local_params import SolrQueryDispatcher

    lat, lon, d_km = 60.0, 10.0, 1000.0
    # the true easternmost point of the circle is NOT at the center's
    # latitude; place a point near the maximal longitude offset
    r = d_km / EARTH_RADIUS_KM
    dlon_true = math.degrees(math.asin(math.sin(r) / math.cos(math.radians(lat))))
    pts = spark.createDataFrame(
        [(0, 61.2, lon + dlon_true * 0.999)],
        "doc_id long, store_lat double, store_lon double",
    )
    disp = SolrQueryDispatcher(None, pts)
    box = {r["doc_id"] for r in disp.docs(
        f"{{!bbox sfield=store pt={lat},{lon} d={d_km}}}").collect()}
    assert 0 in box


def test_bbox_dateline_and_pole(spark):
    from lucene_solr_spark.queries.local_params import SolrQueryDispatcher

    pts = spark.createDataFrame(
        [
            (0, 0.0, 179.5),    # just west of the dateline
            (1, 0.0, -179.5),   # just east, across the dateline
            (2, 0.0, 170.0),    # well outside a 100 km box at (0, 179.9)
            (3, 89.5, 13.0),    # near the north pole, arbitrary lon
            (4, 89.5, -120.0),  # near the pole, other side
        ],
        "doc_id long, store_lat double, store_lon double",
    )
    disp = SolrQueryDispatcher(None, pts)
    near_dateline = {
        r["doc_id"]
        for r in disp.docs("{!bbox sfield=store pt=0,179.9 d=100}").collect()
    }
    assert near_dateline == {0, 1}
    near_pole = {
        r["doc_id"]
        for r in disp.docs("{!bbox sfield=store pt=89.9,0 d=100}").collect()
    }
    # circle crosses the pole: every longitude in the lat band qualifies
    assert near_pole == {3, 4}


# ---------------------------------------------------------------------------
# round-3 plugins: field / raw / switch / surround / complexphrase
# ---------------------------------------------------------------------------

def test_field_parser_analyzes(spark, corpus):
    from lucene_solr_spark.queries.query import PhraseQuery

    s, docs = corpus
    d = _dispatcher(s, docs)
    # single token → term; no analysis for raw
    assert d.parse("{!field}Spark") == TermQuery("spark")
    assert d.parse("{!raw}Spark") == TermQuery("Spark")
    q = d.parse("{!field}Spark Index")
    assert isinstance(q, PhraseQuery) and q.terms == ("spark", "index")
    ids = sorted(r["doc_id"] for r in d.docs("{!field}Spark Index").collect())
    assert ids == [0]


def test_switch_parser_routes(spark, corpus):
    s, docs = corpus
    d = _dispatcher(s, docs)
    q = '{!switch case.a="{!term v=spark}" default="{!term v=hash}"}a'
    assert d.parse(q) == TermQuery("spark")
    q2 = '{!switch case.a="{!term v=spark}" default="{!term v=hash}"}zz'
    assert d.parse(q2) == TermQuery("hash")
    with pytest.raises(ValueError, match="no case"):
        d.parse("{!switch case.a=x}b")


def test_surround_parse_and_exec(spark, corpus):
    from lucene_solr_spark.queries.spans import (
        SpanNearQuery,
        SpanOrQuery,
        SpanTermQuery,
    )

    s, docs = corpus
    d = _dispatcher(s, docs)
    q = d.parse("{!surround}3w(spark, merge)")
    assert q == SpanNearQuery(
        (SpanTermQuery("spark"), SpanTermQuery("merge")), slop=2, in_order=True
    )
    # infix W = distance 1 ordered; N unordered
    assert d.parse("{!surround}spark w index") == SpanNearQuery(
        (SpanTermQuery("spark"), SpanTermQuery("index")), slop=0, in_order=True
    )
    assert d.parse("{!surround}index n spark") == SpanNearQuery(
        (SpanTermQuery("index"), SpanTermQuery("spark")),
        slop=0,
        in_order=False,
    )
    # truncation inside a distance op expands to SpanOr
    q2 = d.parse("{!surround}w(spark, me*)")
    assert isinstance(q2.clauses[1], SpanOrQuery)
    assert {c.term for c in q2.clauses[1].clauses} == {"merge"}
    # boolean level
    from lucene_solr_spark.queries.query import BooleanQuery, Occur

    q3 = d.parse("{!surround}spark AND merge")
    assert isinstance(q3, BooleanQuery)
    assert all(c.occur == Occur.MUST for c in q3.clauses)
    # execution: ordered adjacency matches doc 0 only ("spark index
    # merge"); unordered matches the same tokens reversed
    ids = sorted(r["doc_id"] for r in d.docs("{!surround}spark w index").collect())
    assert ids == [0]
    ids = sorted(r["doc_id"] for r in d.docs("{!surround}index n spark").collect())
    assert ids == [0]
    ids = sorted(
        r["doc_id"] for r in d.docs("{!surround}2n(merge, sort)").collect()
    )
    assert ids == [3]
    # AND/NOT are illegal inside a distance op
    with pytest.raises(ValueError, match="distance subquery"):
        d.parse("{!surround}w(spark AND merge, index)")


def test_complexphrase_parse_and_exec(spark, corpus):
    from lucene_solr_spark.queries.spans import SpanNearQuery, SpanOrQuery

    s, docs = corpus
    d = _dispatcher(s, docs)
    q = d.parse('{!complexphrase}"spark inde*"')
    assert isinstance(q, SpanNearQuery) and q.slop == 0 and q.in_order
    ids = sorted(
        r["doc_id"]
        for r in d.docs('{!complexphrase}"spark inde*"').collect()
    )
    assert ids == [0]
    # slop form
    q2 = d.parse('{!complexphrase}"spark mer*"~2')
    assert q2.slop == 2
    ids = sorted(
        r["doc_id"] for r in d.docs('{!complexphrase}"spark mer*"~2').collect()
    )
    assert ids == [0]
    # wildcard that matches nothing → MatchNoDocs
    from lucene_solr_spark.queries.query import MatchNoDocsQuery

    assert isinstance(
        d.parse('{!complexphrase}"zzz* spark"'), MatchNoDocsQuery
    )


def test_graph_qparser_traversal(spark, corpus):
    """{!graph from=mgr to=emp} walks the edge relation to the fixpoint;
    maxDepth bounds hops; returnRoot=false drops the roots."""
    s, _ = corpus
    org = spark.createDataFrame(
        # doc: (id, emp, mgr) — 1←2←3 chain plus isolated 4
        [(0, "a", ""), (1, "b", "a"), (2, "c", "b"), (3, "d", "zz")],
        ["doc_id", "emp", "mgr"],
    )
    d = _dispatcher(s, org)
    # roots: doc 0 (emp=a); frontier from-values = emp; match docs whose
    # mgr equals a frontier emp → walks down the reporting chain
    ids = sorted(
        r["doc_id"]
        for r in d.docs('{!graph from=emp to=mgr}{!term f=emp v=a}').collect()
    )
    assert ids == [0, 1, 2]
    ids = sorted(
        r["doc_id"]
        for r in d.docs(
            '{!graph from=emp to=mgr maxDepth=1}{!term f=emp v=a}'
        ).collect()
    )
    assert ids == [0, 1]
    ids = sorted(
        r["doc_id"]
        for r in d.docs(
            '{!graph from=emp to=mgr returnRoot=false}{!term f=emp v=a}'
        ).collect()
    )
    assert ids == [1, 2]


def test_mlt_qparser(spark, corpus):
    s, docs = corpus
    d = _dispatcher(s, docs)
    got = {r["doc_id"] for r in d.docs("{!mlt}0").collect()}
    # doc 0 = "spark index merge": docs sharing any interesting term,
    # source excluded
    assert 0 not in got and got and got <= {1, 2, 3}


def test_maxscore_parser():
    """{!maxscore}: SHOULD clauses → one DisjunctionMax SHOULD clause,
    MUST/MUST_NOT pass through (MaxScoreQParser.java:56-89)."""
    from lucene_solr_spark.queries.query import DisjunctionMaxQuery

    d = _dispatcher()
    q = d.parse("{!maxscore tie=0.3}+spark merge sort -probe")
    assert isinstance(q, BooleanQuery)
    occs = [c.occur for c in q.clauses]
    assert occs.count(Occur.SHOULD) == 1
    dm = next(c.query for c in q.clauses if c.occur == Occur.SHOULD)
    assert isinstance(dm, DisjunctionMaxQuery) and dm.tie_breaker == 0.3
    assert {getattr(x, "term", None) for x in dm.disjuncts} == {"merge", "sort"}
    # non-boolean passthrough
    assert d.parse("{!maxscore}spark") == TermQuery("spark")


# ------------------------------------------------------- block join
@pytest.fixture(scope="module")
def block_corpus(spark):
    """Two 3-doc blocks: parent last (Lucene's positional block), each
    doc carrying its block root in _root_ (Solr's _root_ field)."""
    from lucene_solr_spark.index import build_tables
    from lucene_solr_spark.queries.searcher import IndexSearcher

    docs = spark.createDataFrame(
        [
            (0, "spark child red", 2, "c"),
            (1, "child blue", 2, "c"),
            (2, "parent alpha spark", 2, "p"),
            (3, "spark spark child", 5, "c"),
            (4, "child green", 5, "c"),
            (5, "parent beta", 5, "p"),
        ],
        ["doc_id", "text", "_root_", "kind"],
    )
    t = build_tables(docs, id_col="doc_id", text_col="text")
    s = IndexSearcher(t, scoring="exact")
    return s, docs


def test_parent_qparser(spark, block_corpus):
    """{!parent}: parents of blocks with a child match; score modes
    aggregate CHILD scores only (the parent's own 'spark' in doc 2
    must not contribute — ToParentBlockJoinQuery's child/parent
    disjointness)."""
    s, docs = block_corpus
    d = _dispatcher(s, docs)
    base = "{!parent which='{!term f=kind v=p}' score=%s}spark"
    got = {r["doc_id"]: r["score"] for r in d.docs(base % "none").collect()}
    assert got == {2: 1.0, 5: 1.0}
    child = {r["doc_id"]: r["score"] for r in d.docs("{!term v=spark}").collect()}
    mx = {r["doc_id"]: r["score"] for r in d.docs(base % "max").collect()}
    assert mx[2] == pytest.approx(child[0])
    assert mx[5] == pytest.approx(child[3])
    tot = {r["doc_id"]: r["score"] for r in d.docs(base % "total").collect()}
    assert tot[2] == pytest.approx(child[0])
    assert tot[5] == pytest.approx(child[3])
    # a child-only term: block 2 has no child match -> only parent 2
    got = {
        r["doc_id"]
        for r in d.docs("{!parent which='{!term f=kind v=p}'}red").collect()
    }
    assert got == {2}


def test_child_qparser(spark, block_corpus):
    """{!child}: children of matched parents, inheriting the parent's
    score (ToChildBlockJoinQuery ChildScorer.score())."""
    s, docs = block_corpus
    d = _dispatcher(s, docs)
    parent = {r["doc_id"]: r["score"] for r in d.docs("{!term v=alpha}").collect()}
    got = {
        r["doc_id"]: r["score"]
        for r in d.docs("{!child of='{!term f=kind v=p}'}alpha").collect()
    }
    assert set(got) == {0, 1}
    assert got[0] == pytest.approx(parent[2])
    assert got[1] == pytest.approx(parent[2])


def test_block_join_requires_root_column(spark, corpus):
    s, docs = corpus  # no _root_ column
    d = _dispatcher(s, docs)
    with pytest.raises(ValueError, match="_root_"):
        d.docs("{!parent which='{!term f=kind v=p}'}spark")


def test_facet_block_domains(spark, block_corpus):
    """blockChildren / blockParent domain changes (FacetRequest.java
    :86-99) over the _root_ column."""
    from lucene_solr_spark.queries.facets import (
        to_children_domain,
        to_parent_domain,
    )

    _, docs = block_corpus
    parents = docs.filter(F.col("kind") == "p").select("doc_id")
    dom = spark.createDataFrame([(2,)], ["doc_id"])
    kids = sorted(
        r["doc_id"] for r in to_children_domain(dom, docs, parents).collect()
    )
    assert kids == [0, 1]
    dom = spark.createDataFrame([(3,), (4,)], ["doc_id"])
    pars = sorted(
        r["doc_id"] for r in to_parent_domain(dom, docs, parents).collect()
    )
    assert pars == [5]


# ---------------------------------------------------------- payloads
def test_payload_qparser_dispatch(spark):
    """{!payload_score}/{!payload_check} route onto the payload
    postings surface (PayloadScoreQParserPlugin.java /
    PayloadCheckQParserPlugin.java)."""
    from lucene_solr_spark.queries.payloads import payload_postings

    docs = spark.createDataFrame(
        [
            (0, "go|1 fast|3 go|2"),
            (1, "go|5 slow|1"),
            (2, "stop|4 go|1 fast|2"),
        ],
        ["doc_id", "text"],
    )
    pp = payload_postings(docs)
    d = SolrQueryDispatcher(None, docs, payload_postings=pp)
    got = {
        r["doc_id"]: r["score"]
        for r in d.docs("{!payload_score func=max}go").collect()
    }
    assert got == {0: 2.0, 1: 5.0, 2: 1.0}
    # phrase payload_score: fold over BOTH clause payloads of each span
    got = {
        r["doc_id"]: r["score"]
        for r in d.docs("{!payload_score func=sum}go fast").collect()
    }
    assert got == {0: 4.0, 2: 3.0}
    # payload_check: span kept only when payloads equal the list
    got = {
        r["doc_id"]: r["score"]
        for r in d.docs("{!payload_check payloads='1 3'}go fast").collect()
    }
    assert got == {0: 1.0}
    with pytest.raises(ValueError, match="payloads="):
        d.parse("{!payload_check}go fast")
    with pytest.raises(ValueError, match="payload_postings"):
        SolrQueryDispatcher(None, docs).docs("{!payload_score}go")


def test_collapse_qparser(spark, corpus):
    """{!collapse field=}: max-score head per group, doc_id tie-break
    (CollapsingQParserPlugin.java default score selector)."""
    s, docs = corpus
    d = _dispatcher(s, docs.withColumn(
        "grp", (F.col("doc_id") % 2).cast("string")))
    base = {r["doc_id"]: r["score"] for r in d.docs("{!term v=spark}").collect()}
    got = {r["doc_id"]: r["score"]
           for r in d.docs("{!collapse field=grp}{!term v=spark}").collect()}
    # docs 0 (grp 0) and 1 (grp 1) both match -> both are their group's head
    assert set(got) == {0, 1}
    assert got[0] == pytest.approx(base[0])
    with pytest.raises(ValueError, match="field="):
        d.parse("{!collapse}spark")


def test_rerank_qparser(spark, corpus):
    """{!rerank}: combined = main + weight*rerank within the window
    (ReRankQParserPlugin.java)."""
    s, docs = corpus
    d = _dispatcher(s, docs, params={"rqq": "{!term v=merge}"})
    main = {r["doc_id"]: r["score"] for r in d.docs("{!term v=spark}").collect()}
    rr = {r["doc_id"]: r["score"] for r in d.docs("{!term v=merge}").collect()}
    got = {r["doc_id"]: r["score"] for r in d.docs(
        "{!rerank reRankQuery=$rqq reRankWeight=3}{!term v=spark}").collect()}
    assert set(got) == set(main)
    for did, sc in got.items():
        assert sc == pytest.approx(main[did] + 3 * rr.get(did, 0.0))


def test_hash_qparser(spark, corpus):
    """{!hash}: the N worker filters partition the doc set disjointly
    and completely (HashQParserPlugin.java's ParallelStream contract)."""
    s, docs = corpus
    d = _dispatcher(s, docs)
    parts = [
        {r["doc_id"] for r in d.docs(
            f"{{!hash workers=3 worker={w} keys=doc_id}}").collect()}
        for w in range(3)
    ]
    all_ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    assert set().union(*parts) == all_ids
    assert sum(len(p) for p in parts) == len(all_ids)
    # deterministic across invocations
    again = {r["doc_id"] for r in d.docs(
        "{!hash workers=3 worker=0 keys=doc_id}").collect()}
    assert again == parts[0]
    with pytest.raises(ValueError, match="keys="):
        d.parse("{!hash workers=2 worker=0}")


def test_join_qparser_score_modes(spark):
    """{!join score=max|total|avg|min} (ScoreJoinQParserPlugin.java →
    JoinUtil ScoreMode): from-side scores aggregate per join value and
    carry to the to-side docs."""
    cust = spark.createDataFrame(
        [(1, 50.0), (2, 200.0), (3, 500.0), (4, 300.0)],
        "doc_id long, c_acctbal double",
    ).withColumn("grp", (F.col("doc_id") % 2))
    orders = spark.createDataFrame(
        [(10, 0), (11, 1), (14, 9)], "doc_id long, o_grp long",
    )
    d = SolrQueryDispatcher(None, orders, tables={"cust": cust})
    base = "{!join from=grp to=o_grp fromIndex=cust score=%s}{!func}c_acctbal"
    # grp 0: custs 2 (200), 4 (300); grp 1: custs 1 (50), 3 (500)
    for mode, want in [
        ("max", {(10, 300.0), (11, 500.0)}),
        ("min", {(10, 200.0), (11, 50.0)}),
        ("total", {(10, 500.0), (11, 550.0)}),
        ("avg", {(10, 250.0), (11, 275.0)}),
    ]:
        got = {(r["doc_id"], r["score"]) for r in d.docs(base % mode).collect()}
        assert got == want, (mode, got)
    with pytest.raises(ValueError, match="score mode"):
        d.parse("{!join from=grp to=o_grp score=nope}x")


def test_filters_qparser_tree():
    """{!filters} (FiltersQParserPlugin): v -> MUST, each param= ->
    FILTER, excludeTags drops tagged filters (multi-select faceting)."""
    d = _dispatcher(
        params={"fqs": ["{!tag=pop}{!term v=spark}", "{!term v=hash}"]}
    )
    q = d.parse("{!filters param=$fqs v='{!term v=window}'}")
    assert isinstance(q, BooleanQuery)
    occ = [c.occur for c in q.clauses]
    assert occ == [Occur.MUST, Occur.FILTER, Occur.FILTER]
    # excludeTags removes the tagged filter only
    q2 = d.parse("{!filters param=$fqs excludeTags=pop v='{!term v=window}'}")
    assert [c.occur for c in q2.clauses] == [Occur.MUST, Occur.FILTER]
    assert q2.clauses[1].query == TermQuery("hash")
    # filters-only (no v) is legal: pure filter conjunction
    q3 = d.parse("{!filters param=$fqs}")
    assert all(c.occur == Occur.FILTER for c in q3.clauses)


def test_ltr_qparser(spark, corpus):
    """{!ltr model=m reRankDocs= rows=}main (LTRQParserPlugin +
    LTRRescorer): main-query window rescored by a registered linear
    model over doc_values features + original_score; cross-checked
    against the direct ltr_rescore composition."""
    from lucene_solr_spark.queries.local_params import SolrQueryDispatcher
    from lucene_solr_spark.queries.ltr import LinearModel, ltr_rescore

    s, docs = corpus
    model = LinearModel((("original_score", 1.0), ("n_chars", 0.1)))
    d = SolrQueryDispatcher(
        s, docs, ltr_models={"m": (model, ["n_chars"])}
    )
    got = d.docs("{!ltr model=m reRankDocs=4 rows=2}spark merge")
    assert got.columns == ["doc_id", "score"]
    want = ltr_rescore(
        d.docs("spark merge"), docs, model, ["n_chars"],
        rerank_docs=4, k=2,
    )
    assert [tuple(r) for r in got.collect()] == [
        tuple(r) for r in want.collect()
    ]
    with pytest.raises(ValueError, match="unknown LTR model"):
        d.docs("{!ltr model=nope}spark")


def test_nested_query_qparser():
    """{!query v=$q1} — NestedQParserPlugin parameter indirection
    (NestedQParserPlugin.java createParser)."""
    d = _dispatcher(params={"q1": "{!term v=spark}"})
    assert d.parse("{!query v=$q1}") == TermQuery("spark")
    # inline value, full re-parse of any {!type}
    assert d.parse("{!query v='{!prefix v=ha}'}") == PrefixQuery("ha")
    # chained indirection: $q2 -> {!query v=$q1} -> term
    d2 = _dispatcher(
        params={"q1": "{!term v=spark}", "q2": "{!query v=$q1}"}
    )
    assert d2.parse("{!query v=$q2}") == TermQuery("spark")
