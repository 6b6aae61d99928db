"""Logical query rewrites, run to fixpoint before planning.

Mirrors BooleanQuery.rewrite (search/BooleanQuery.java:206-300) and the
rewrite loop of IndexSearcher.rewrite (search/IndexSearcher.java:671-676):

- empty BooleanQuery → MatchNoDocs; 1-clause MUST/SHOULD unwrap
- pure-negative (only MUST_NOT) → MatchNoDocs
- duplicate FILTER / MUST_NOT clause dedup
- same query as MUST and MUST_NOT → MatchNoDocs
- MUST_NOT MatchAllDocs → MatchNoDocs; MUST_NOT MatchNoDocs dropped
- FILTER clause duplicating a MUST clause removed
- MatchAllDocs FILTER removed when other required clauses exist
- nested single-clause unwrapping, recursive child rewrite
- BoostQuery(boost=1) unwrap; nested boost multiply
"""

from __future__ import annotations

from lucene_solr_spark.queries.query import (
    BooleanClause,
    BooleanQuery,
    BoostingQuery,
    BoostQuery,
    ConstantScoreQuery,
    MatchAllDocsQuery,
    MatchNoDocsQuery,
    Occur,
    Query,
)

_MAX_ITER = 16  # safety net; Lucene loops to fixpoint too


def rewrite(query: Query) -> Query:
    for _ in range(_MAX_ITER):
        new = _rewrite_once(query)
        if new == query:
            return new
        query = new
    return query


def _rewrite_once(q: Query) -> Query:
    if isinstance(q, BoostQuery):
        inner = _rewrite_once(q.query)
        if isinstance(inner, BoostQuery):
            return BoostQuery(inner.query, q.boost * inner.boost)
        if isinstance(inner, MatchNoDocsQuery):
            return inner
        if q.boost == 1.0:
            return inner
        return BoostQuery(inner, q.boost)
    if isinstance(q, ConstantScoreQuery):
        inner = _rewrite_once(q.query)
        if isinstance(inner, MatchNoDocsQuery):
            return inner
        return ConstantScoreQuery(inner, q.score)
    if isinstance(q, BoostingQuery):
        # BoostingQuery.rewrite rewrites both children (:56-64); a
        # no-match match query kills the whole thing, a no-match
        # context degenerates to the plain match query (scorer():95-99)
        match = _rewrite_once(q.match)
        context = _rewrite_once(q.context)
        if isinstance(match, MatchNoDocsQuery):
            return match
        if isinstance(context, MatchNoDocsQuery):
            return match
        return BoostingQuery(match, context, q.boost)
    if not isinstance(q, BooleanQuery):
        return q

    clauses = [BooleanClause(c.occur, _rewrite_once(c.query)) for c in q.clauses]
    msm = q.minimum_number_should_match

    # drop MUST_NOT MatchNoDocs; MUST_NOT MatchAll kills the query
    kept: list[BooleanClause] = []
    for c in clauses:
        if c.occur == Occur.MUST_NOT and isinstance(c.query, MatchNoDocsQuery):
            continue
        if c.occur == Occur.MUST_NOT and isinstance(c.query, MatchAllDocsQuery):
            return MatchNoDocsQuery("pure negation of all docs")
        if c.occur in (Occur.MUST, Occur.FILTER) and isinstance(
            c.query, MatchNoDocsQuery
        ):
            return MatchNoDocsQuery("required clause matches nothing")
        kept.append(c)
    clauses = kept

    # dedup FILTER and MUST_NOT (BooleanQuery.java:252-271)
    seen: set[tuple[Occur, Query]] = set()
    deduped: list[BooleanClause] = []
    for c in clauses:
        key = (c.occur, c.query)
        if c.occur in (Occur.FILTER, Occur.MUST_NOT) and key in seen:
            continue
        seen.add(key)
        deduped.append(c)
    clauses = deduped

    musts = {c.query for c in clauses if c.occur == Occur.MUST}
    must_nots = {c.query for c in clauses if c.occur == Occur.MUST_NOT}
    if musts & must_nots:  # BooleanQuery.java:273-283
        return MatchNoDocsQuery("MUST and MUST_NOT of same query")

    # FILTER ⊆ MUST removal; MatchAll FILTER removal when other required
    required = [c for c in clauses if c.occur in (Occur.MUST, Occur.FILTER)]
    if len(required) > 1:
        clauses = [
            c
            for c in clauses
            if not (c.occur == Occur.FILTER and c.query in musts)
            and not (
                c.occur == Occur.FILTER and isinstance(c.query, MatchAllDocsQuery)
            )
        ]

    shoulds = [c for c in clauses if c.occur == Occur.SHOULD]
    if not clauses:
        return MatchNoDocsQuery("empty BooleanQuery")
    if all(c.occur == Occur.MUST_NOT for c in clauses):
        return MatchNoDocsQuery("pure negative BooleanQuery")
    if msm > len(shoulds):
        return MatchNoDocsQuery("minShouldMatch > number of SHOULD clauses")

    # single-clause unwrap (only for scoring-compatible occurs)
    if len(clauses) == 1 and msm <= (1 if shoulds else 0):
        c = clauses[0]
        if c.occur == Occur.MUST or c.occur == Occur.SHOULD:
            return c.query
        if c.occur == Occur.FILTER:
            return ConstantScoreQuery(c.query, 0.0)

    return BooleanQuery(tuple(clauses), minimum_number_should_match=msm)
