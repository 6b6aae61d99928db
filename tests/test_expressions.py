"""Streaming-expression language (StreamExpressionParser + StreamFactory
— solr/solrj/.../io/stream/expr/*.java)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.streaming.expressions import (
    StreamExpr,
    StreamFactory,
    parse_expression,
)


# --------------------------------------------------------------- parser

def test_parse_nested_expression():
    n = parse_expression(
        'innerJoin(search(a, q="*:*", fl="x,y"), search(b), on="x=z")'
    )
    assert n.name == "innerJoin"
    assert [a.name for a in n.args] == ["search", "search"]
    assert n.named == {"on": "x=z"}
    inner = n.args[0]
    assert inner.args == ["a"]
    assert inner.named == {"q": "*:*", "fl": "x,y"}


def test_parse_quotes_and_metrics():
    n = parse_expression('rollup(search(t), over="a", sum(x), count(*))')
    assert n.named["over"] == "a"
    assert [a.name for a in n.args[1:]] == ["sum", "count"]
    assert n.args[1].args == ["x"]
    assert n.args[2].args == ["*"]


def test_parse_errors():
    with pytest.raises(ValueError, match="trailing"):
        parse_expression("search(a) extra")
    with pytest.raises(ValueError):
        parse_expression("search(a")
    with pytest.raises(ValueError):
        parse_expression("(a)")


# -------------------------------------------------------------- factory

@pytest.fixture(scope="module")
def factory(spark):
    people = spark.createDataFrame(
        [(1, "ada", 10), (2, "bob", 20), (3, "cat", 20), (4, "dan", 30)],
        ["id", "name", "dept"],
    )
    depts = spark.createDataFrame(
        [(10, "eng"), (20, "ops"), (30, "hr")], ["dept_id", "dept_name"]
    )
    tags = spark.createDataFrame(
        [(1, ["red", "blue"]), (2, ["red"])], ["id", "tags"]
    )
    return StreamFactory({"people": people, "depts": depts, "tags": tags})


def _rows(df):
    return [tuple(r) for r in df.collect()]


def test_search_select_sort(factory):
    got = _rows(factory.df('search(people, fl="name,dept", sort="name desc", rows=2)'))
    assert got == [("dan", 30), ("cat", 20)]
    got = _rows(factory.df('select(search(people, fl="id,name"), "id", "name as who")'))
    assert ("who" in factory.df(
        'select(search(people, fl="id,name"), "id", "name as who")'
    ).columns) and len(got) == 4


def test_joins_and_fetch(factory):
    j = factory.df(
        'innerJoin(search(people, fl="id,name,dept", sort="id asc"),'
        ' search(depts, sort="dept_id asc"), on="dept=dept_id")'
    )
    got = {(r["name"], r["dept_name"]) for r in j.collect()}
    assert got == {("ada", "eng"), ("bob", "ops"), ("cat", "ops"), ("dan", "hr")}
    h = factory.df(
        'hashJoin(search(people, fl="id,dept"), search(depts), on="dept=dept_id")'
    )
    assert h.count() == 4
    f = factory.df(
        'fetch(depts, search(people, fl="id,name,dept"), on="dept=dept_id", fl="dept_name")'
    )
    assert {r["dept_name"] for r in f.collect()} == {"eng", "ops", "hr"}


def test_rollup_having_stats(factory):
    r = factory.df(
        'rollup(search(people, fl="dept,id", sort="dept asc"), over="dept",'
        " count(*), sum(id))"
    )
    assert r.columns == ["dept", "count(*)", "sum(id)"]
    got = {r["dept"]: (r["count(*)"], r["sum(id)"]) for r in r.collect()}
    assert got == {10: (1, 1), 20: (2, 5), 30: (1, 4)}
    h = factory.df(
        'having(rollup(search(people, fl="dept,id", sort="dept asc"),'
        ' over="dept", count(*)), gt(count(*), 1))'
    )
    assert _rows(h) == [(20, 2)]
    s = factory.df("stats(people, sum(dept), max(id))")
    assert _rows(s) == [(80, 4)]


def test_merge_unique_top_intersect_complement(factory):
    m = factory.df(
        'merge(search(people, fl="id,name"), search(people, fl="id,name"),'
        ' on="id asc")'
    )
    assert m.count() == 8
    u = factory.df('unique(search(people, fl="dept,name"), over="dept")')
    assert u.count() == 3
    t = factory.df('top(n=1, search(people, fl="id,name"), sort="id desc")')
    assert _rows(t) == [(4, "dan")]
    i = factory.df(
        'intersect(search(people, fl="id,name"),'
        ' search(tags, fl="id"), on="id=id")'
    )
    assert sorted(r["id"] for r in i.collect()) == [1, 2]
    c = factory.df(
        'complement(search(people, fl="id,name"),'
        ' search(tags, fl="id"), on="id=id")'
    )
    assert sorted(r["id"] for r in c.collect()) == [3, 4]


def test_cartesian_let_get_echo(factory):
    x = factory.df("cartesianProduct(search(tags), tags)")
    assert sorted((r["id"], r["tags"]) for r in x.collect()) == [
        (1, "blue"), (1, "red"), (2, "red"),
    ]
    l = factory.df(
        'let(a=search(people, fl="id,dept"),'
        ' having(rollup(get(a), over="dept", count(*)), gt(count(*), 1)))'
    )
    assert _rows(l) == [(20, 2)]
    e = factory.df('echo("hello world")')
    assert _rows(e) == [("hello world",)]


def test_facet_expression(factory):
    f = factory.df(
        'facet(people, buckets="dept", bucketSorts="count(*) desc, dept asc",'
        " bucketSizeLimit=2, count(*))"
    )
    assert _rows(f) == [(20, 2), (10, 1)]


def test_boolean_evaluators(factory):
    h = factory.df(
        'having(search(people, fl="id,dept"),'
        " and(gteq(id, 2), not(eq(dept, 30))))"
    )
    assert sorted(r["id"] for r in h.collect()) == [2, 3]


def test_unknown_function_raises(factory):
    with pytest.raises(ValueError, match="unknown stream function"):
        factory.df("bogus(search(people))")
    with pytest.raises(ValueError, match="needs a text searcher"):
        factory.df('search(people, q="name:ada")')


def test_null_list_plist(factory):
    # null() drains and counts — one tuple, no timer field (deterministic)
    out = factory.df("null(search(people))").collect()
    assert len(out) == 1 and out[0]["nullCount"] == 4
    # list() concatenates; missing columns null-fill
    rows = factory.df(
        'list(search(people, fl="id,name"), search(depts))'
    ).collect()
    assert len(rows) == 7
    # people rows have no dept_id (null-filled); depts rows have no id
    assert sum(r["dept_id"] is None for r in rows) == 4
    assert sum(r["id"] is None for r in rows) == 3
    # plist is the same plan
    assert factory.df("plist(search(people), search(people))").count() == 8
    with pytest.raises(ValueError, match="at least one"):
        factory.df("list()")


def test_eval_stream(factory):
    expr = 'eval(tuple(expr_s="sort(search(people, fl=\'id\'), by=\'id desc\')"))'
    rows = factory.df(expr).collect()
    assert [r["id"] for r in rows] == [4, 3, 2, 1]
    with pytest.raises(ValueError, match="expr_s"):
        factory.df('eval(tuple(other="x"))')


def test_daemon_stream(factory):
    rows = factory.df(
        'daemon(search(people, fl="id"), id="d1", runInterval="1000")'
    ).collect()
    assert len(rows) == 4


def test_reduce_stream_expression(spark, factory):
    """reduce(stream, by=, group(sort=, n=)) — ReducerStream.java +
    GroupOperation.java: top-n per group of the sorted input."""
    out = factory.df(
        'reduce(search(people, fl="id,name,dept"),'
        ' by="dept", group(sort="id desc", n="1"))'
    )
    rows = {r["dept"]: r["id"] for r in out.collect()}
    # dept 20 has ids 2,3 -> keeps 3 (id desc top-1)
    assert rows == {10: 1, 20: 3, 30: 4}


def test_parallel_stream_expression(spark, factory):
    """parallel(workers=, partitionKeys=, stream) — result equality with
    the wrapped stream plus the requested partitioning."""
    inner = 'rollup(search(people, fl="dept,id"), over="dept", count(*))'
    seq = {tuple(r) for r in factory.df(inner).collect()}
    par_df = factory.df(
        f'parallel(workers="4", partitionKeys="dept", {inner})'
    )
    assert {tuple(r) for r in par_df.collect()} == seq
    assert par_df.rdd.getNumPartitions() == 4


def test_random_stream_expression(spark, factory):
    out1 = factory.df('random(people, rows="2", seed="7", fl="id")')
    out2 = factory.df('random(people, rows="2", seed="7", fl="id")')
    a, b = out1.collect(), out2.collect()
    assert len(a) == 2 and a == b  # deterministic under a seed
    seen = {
        tuple(r["id"] for r in factory.df(
            f'random(people, rows="2", seed="{s}", fl="id")').collect())
        for s in range(6)
    }
    assert len(seen) > 1  # seed actually varies the sample


def test_timeseries_stream_expression(spark, factory):
    import datetime as dt

    ev = factory.tables["people"].sparkSession.createDataFrame(
        [
            (dt.datetime(2024, 1, 1, 5), 1.0),
            (dt.datetime(2024, 1, 1, 9), 2.0),
            (dt.datetime(2024, 1, 3, 0), 4.0),
        ],
        ["ts", "value"],
    )
    from lucene_solr_spark.streaming.expressions import StreamFactory

    fac = StreamFactory({"events": ev})
    out = fac.df(
        'timeseries(events, field="ts", gap="+1DAY", count(*), sum(value))'
    )
    rows = [tuple(r) for r in out.collect()]
    assert rows == [("2024-01-01", 2, 3.0), ("2024-01-03", 1, 4.0)]
    out = fac.df(
        'timeseries(events, field="ts", gap="+1DAY", start="2024-01-02",'
        ' count(*))'
    )
    assert [tuple(r) for r in out.collect()] == [("2024-01-03", 1)]


def test_nodes_stream_expression(spark):
    """nodes() — GatherNodesStream BFS expansion over an edge table."""
    from lucene_solr_spark.streaming.expressions import StreamFactory

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("a", "c")], ["src", "dst"]
    )
    fac = StreamFactory({"edges": edges})
    out = fac.df('nodes(edges, root="a", walk="src->dst", maxHops="2")')
    got = {(r["node"], r["level"]) for r in out.collect()}
    # level 1: b, c (c via the direct edge); level 2: d (first reached)
    assert got == {("b", 1), ("c", 1), ("d", 2)}


def test_shortest_path_stream_expression(spark):
    from lucene_solr_spark.streaming.expressions import StreamFactory

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 3)], ["src", "dst"]
    )
    fac = StreamFactory({"edges": edges})
    out = fac.df('shortestPath(edges, from="1", to="4", edge="src->dst")')
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["level"] == 2  # 1->3->4
    out = fac.df('shortestPath(edges, from="4", to="1", edge="src->dst")')
    assert out.collect() == []  # unreachable -> no tuples


def test_sql_stream_expression(spark, factory):
    """sql(stmt=) — the Solr SQL handler surface: Spark SQL over the
    factory's registered collections."""
    out = factory.df(
        'sql(stmt="SELECT dept, count(*) AS cnt FROM people'
        ' GROUP BY dept ORDER BY dept")'
    )
    assert [tuple(r) for r in out.collect()] == [(10, 1), (20, 2), (30, 1)]


def test_update_commit_streams(spark):
    """update()/commit() — drain into a collection, ack tuple out."""
    from lucene_solr_spark.streaming.expressions import StreamFactory

    a = spark.createDataFrame([(1, "x"), (2, "y")], ["id", "v"])
    fac = StreamFactory({"a": a})
    out = fac.df('commit(dest, update(dest, search(a, fl="id,v")))')
    assert [tuple(r) for r in out.collect()] == [(2,)]
    assert {tuple(r) for r in fac.tables["dest"].collect()} == {(1, "x"), (2, "y")}
    # second update appends
    fac.df('update(dest, search(a, fl="id,v"))')
    assert fac.tables["dest"].count() == 4


# ------------------------------------------------- ML / stats functions

@pytest.fixture(scope="module")
def ml_factory(spark):
    """Factory over a tiny indexed corpus: 'signal' correlates with
    lang='en' — the FeaturesSelectionStream fixture shape."""
    from lucene_solr_spark.index.builder import build_tables
    from lucene_solr_spark.queries.searcher import IndexSearcher

    docs = spark.createDataFrame(
        [
            (0, "signal alpha beta", "en"),
            (1, "signal alpha", "en"),
            (2, "signal gamma gamma", "en"),
            (3, "noise alpha", "xx"),
            (4, "noise beta", "xx"),
            (5, "noise gamma", "xx"),
            (6, "signal noise", "en"),
            (7, "beta gamma", "xx"),
        ],
        ["doc_id", "text", "lang"],
    )
    t = build_tables(docs, id_col="doc_id", text_col="text")
    return StreamFactory(
        {"docs": docs},
        searcher=IndexSearcher(t),
        search_collection="docs",
        index=t,
    )


def test_significant_terms_expression(ml_factory):
    """significantTerms(): fg/bg ratio over the q='signal' doc set.
    'signal' itself: fg_df=4 of fg_n=4 vs bg_df=4 of 8 -> ratio 2.0."""
    out = ml_factory.df(
        'significantTerms(docs, q="signal", limit=3)'
    ).collect()
    assert out[0]["term"] == "signal"
    assert (out[0]["foreground"], out[0]["background"]) == (4, 4)
    assert out[0]["score"] == 2.0
    assert len(out) == 3


def test_features_selection_expression(ml_factory):
    """featuresSelection(): IGain top terms — the class-defining terms
    'signal'/'noise' outrank the uncorrelated ones."""
    out = ml_factory.df(
        'featuresSelection(docs, outcome="lang", positiveLabel="en",'
        " numTerms=2)"
    ).collect()
    assert {r["term"] for r in out} == {"signal", "noise"}
    assert set(out[0].asDict()) == {"term", "score", "docfreq", "idf"}


def test_train_classify_expression(ml_factory):
    """train() flattened model rows feed classify(); probability is
    sigmoid-bounded and 'signal' docs outscore 'noise' docs."""
    model = ml_factory.df(
        'train(docs, featuresSelection(docs, outcome="lang",'
        ' positiveLabel="en", numTerms=2),'
        ' outcome="lang", positiveLabel="en", maxIterations=5)'
    )
    rows = model.collect()
    # 5 iterations x (intercept + 2 weights)
    assert len(rows) == 15
    assert rows[0]["idx"] == 0 and rows[0]["term"] is None
    scored = ml_factory.df(
        'classify(train(docs, featuresSelection(docs, outcome="lang",'
        ' positiveLabel="en", numTerms=2),'
        ' outcome="lang", positiveLabel="en", maxIterations=5), docs)'
    ).collect()
    assert len(scored) == 8
    p = {r["doc_id"]: r["probability"] for r in scored}
    assert all(0.0 <= v <= 1.0 for v in p.values())
    # pure-signal docs above pure-noise docs after 5 GD steps
    assert p[1] > p[5]


def test_score_nodes_expression(spark):
    """scoreNodes(nodes(...)) — tf-idf over a one-hop counted frontier,
    cross-checked against the direct graph.py composition."""
    from lucene_solr_spark.streaming.graph import gather_counts, score_nodes

    edges = spark.createDataFrame(
        [("e", "u1"), ("e", "u1"), ("e", "u2"), ("w", "u2"), ("w", "u3")],
        ["src", "dst"],
    )
    fac = StreamFactory({"ev": edges})
    got = fac.df('scoreNodes(nodes(ev, root="e", walk="src->dst"))')
    roots = spark.createDataFrame([("e",)], ["node"])
    want = score_nodes(
        gather_counts(edges, roots, "src", "dst"),
        edges.groupBy(F.col("dst").alias("node")).agg(
            F.count("*").alias("docfreq")
        ),
        edges.count(),
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_select_evaluators(factory):
    """StreamEvaluators inside select() (solrj io/eval/*Evaluator.java):
    arithmetic/conditional projections with 'as' aliases — pure column
    expressions."""
    out = factory.df(
        'select(search(people, fl="id,name,dept", sort="id asc"),'
        ' "name", mult(dept, 2) as d2,'
        ' if(gt(dept, 15), add(dept, 100), dept) as adj,'
        ' round(div(dept, 3), 1) as third)'
    )
    rows = [tuple(r) for r in out.collect()]
    assert rows[0] == ("ada", 20, 10, 3.3)
    assert rows[1] == ("bob", 40, 120, 6.7)
    assert rows[3] == ("dan", 60, 130, 10.0)
    with pytest.raises(ValueError, match="needs 'as name'"):
        factory.df('select(search(people), mult(dept, 2))')
    with pytest.raises(ValueError, match="unknown stream evaluator"):
        factory.df('select(search(people), frob(dept) as x)')
