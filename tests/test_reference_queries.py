"""Reference query set, rank-identical on the synthetic source-code
corpus (the north-rule input shape).

Styled after the reference benchmark query files
(lucene/benchmark/conf/query-terms.txt, query-phrases.txt): every line
of fixtures/queries.txt runs through (a) the Spark engine in float32
lucene mode and (b) the pure-Python Lucene-faithful oracle, and the
top-k (docIDs, order, float32 scores) must be identical — the golden
discipline of TestBoolean2.queriesTest + CheckHits.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pytest

from lucene_solr_spark.queries.parser import parse_query
from lucene_solr_spark.queries.query import (
    BooleanQuery,
    BoostQuery,
    ConstantScoreQuery,
    MatchAllDocsQuery,
    MatchNoDocsQuery,
    Occur,
    PhraseQuery,
    Query,
    SynonymQuery,
    TermQuery,
)
from lucene_solr_spark.queries.rewriter import rewrite

QUERY_FILE = Path(__file__).parent.parent / "fixtures" / "queries.txt"
QUERIES = [q.strip() for q in QUERY_FILE.read_text().splitlines() if q.strip()]


@pytest.fixture(scope="module")
def code_corpus(spark):
    from lucene_solr_spark.corpus import generate_corpus
    from lucene_solr_spark.index import assign_doc_ids

    df = assign_doc_ids(generate_corpus(spark, 1500, partitions=8))
    return df.select("doc_id", "content")


@pytest.fixture(scope="module")
def code_searcher(code_corpus):
    from lucene_solr_spark.index import build_tables
    from lucene_solr_spark.queries import IndexSearcher

    return IndexSearcher(build_tables(code_corpus, text_col="content"))


@pytest.fixture(scope="module")
def code_oracle(code_corpus):
    from oracle import OracleIndex

    pdf = code_corpus.toPandas()
    return OracleIndex.build(dict(zip(pdf["doc_id"], pdf["content"])))


def oracle_eval(o, q: Query) -> dict[int, np.float32]:
    """Evaluate a parsed query tree with the oracle primitives,
    mirroring the engine's combination arithmetic (per-clause float32
    subscores, cross-clause sum in float64 → float32)."""
    if isinstance(q, MatchNoDocsQuery):
        return {}
    if isinstance(q, MatchAllDocsQuery):
        return {d: np.float32(1.0) for d in o.norm_byte}
    if isinstance(q, BoostQuery):
        return {
            d: np.float32(s) for d, s in oracle_eval_boost(o, q.query, q.boost).items()
        }
    if isinstance(q, ConstantScoreQuery):
        return {d: np.float32(q.score) for d in oracle_eval(o, q.query)}
    if isinstance(q, TermQuery):
        return o.term_scores(q.term)
    if isinstance(q, SynonymQuery):
        raise NotImplementedError
    if isinstance(q, PhraseQuery):
        return o.phrase_scores(list(q.terms), list(q.positions))
    if isinstance(q, BooleanQuery):
        musts = [c.query for c in q.clauses if c.occur == Occur.MUST]
        filters = [c.query for c in q.clauses if c.occur == Occur.FILTER]
        shoulds = [c.query for c in q.clauses if c.occur == Occur.SHOULD]
        must_nots = [c.query for c in q.clauses if c.occur == Occur.MUST_NOT]
        msm = q.minimum_number_should_match
        req: dict[int, float] | None = None
        for m in musts:
            sub = oracle_eval(o, m)
            if req is None:
                req = {d: float(s) for d, s in sub.items()}
            else:
                req = {d: v + float(sub[d]) for d, v in req.items() if d in sub}
        for f in filters:
            sub = set(oracle_eval(o, f))
            if req is None:
                req = {d: 0.0 for d in sub}
            else:
                req = {d: v for d, v in req.items() if d in sub}
        sh: dict[int, list[float]] = {}
        for s_ in shoulds:
            for d, sc in oracle_eval(o, s_).items():
                sh.setdefault(d, []).append(float(sc))
        if req is not None:
            out = {}
            for d, v in req.items():
                extra = sh.get(d, [])
                if msm > 0 and len(extra) < msm:
                    continue
                out[d] = np.float32(v + sum(extra))
        else:
            out = {
                d: np.float32(sum(ss))
                for d, ss in sh.items()
                if len(ss) >= max(msm, 1)
            }
        for mn in must_nots:
            excl = set(oracle_eval(o, mn))
            out = {d: v for d, v in out.items() if d not in excl}
        return out
    raise TypeError(type(q).__name__)


def oracle_eval_boost(o, q: Query, boost: float) -> dict[int, np.float32]:
    if isinstance(q, TermQuery):
        return o.term_scores(q.term, boost=boost)
    if isinstance(q, PhraseQuery):
        return o.phrase_scores(list(q.terms), list(q.positions), boost=boost)
    return {d: np.float32(np.float32(boost) * s) for d, s in oracle_eval(o, q).items()}


@pytest.mark.parametrize("qs", QUERIES, ids=[q[:30] for q in QUERIES])
def test_reference_query_rank_identity(code_searcher, code_oracle, qs):
    q = rewrite(parse_query(qs))
    expect = code_oracle.top_k(oracle_eval(code_oracle, q), 10)
    got = [
        (r["doc_id"], r["score"])
        for r in code_searcher.search(q, k=10).collect()
    ]
    assert [d for d, _ in got] == [d for d, _ in expect], (qs, got, expect)
    for (gd, gs), (ed, es) in zip(got, expect):
        assert abs(gs - es) <= 1e-6 * max(1.0, abs(es)), (qs, gd, gs, es)
