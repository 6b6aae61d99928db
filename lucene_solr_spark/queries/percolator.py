"""Percolation: match MANY registered queries against MANY documents.

Reference: ``lucene/memory/src/java/org/apache/lucene/index/memory/
MemoryIndex.java`` — a single-document in-RAM index built per
incoming doc so every stored query can be executed against it (the
classic percolator / alerting primitive; MemoryIndex.java:1-170
class javadoc describes exactly this "prospective search" use).

The reference shape is doc-at-a-time: build a tiny index, loop M
queries.  The Spark-native shape inverts it — queries become DATA.
All M queries decompose into one long ``(query_id, term, role)``
relation that joins the postings table ONCE (broadcast: the query
relation is tiny), and a single groupBy evaluates every boolean
matrix cell (doc x query) in one shuffle.  Phrase constraints verify
on the candidate set only, with the same offset-shifted
array_intersect kernel the phrase scorer uses.  At 100 TB this is
one broadcast join + one aggregation over postings regardless of M,
instead of M index scans.

Supported query surface: TermQuery, PhraseQuery (exact), and ONE
level of BooleanQuery with MUST / FILTER / SHOULD / MUST_NOT /
minimumNumberShouldMatch — the match-set semantics of
BooleanWeight; percolation is match-only (scores are not needed to
decide alert delivery).
"""
from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lucene_solr_spark.queries.query import (
    BooleanQuery,
    Occur,
    PhraseQuery,
    Query,
    TermQuery,
)

__all__ = ["PercolatorQuery", "decompose", "percolate"]


@dataclass(frozen=True)
class PercolatorQuery:
    """One registered query in match-normal form."""

    query_id: int
    must: tuple[str, ...] = ()
    should: tuple[str, ...] = ()
    must_not: tuple[str, ...] = ()
    min_should_match: int = 0  # effective mm (>=1 for pure-SHOULD)
    phrases: tuple[tuple[str, ...], ...] = ()


def decompose(query_id: int, q: Query) -> PercolatorQuery:
    """Normalize a parsed query tree for set-membership evaluation.

    Mirrors BooleanWeight's clause bucketing: FILTER folds into MUST
    (identical match sets, BooleanClause.java:26-34), a pure-SHOULD
    query needs at least one clause (Boolean2ScorerSupplier.java:75-83).
    """
    must: list[str] = []
    should: list[str] = []
    must_not: list[str] = []
    phrases: list[tuple[str, ...]] = []
    mm = 0

    def add(occur: Occur, sub: Query) -> None:
        if isinstance(sub, TermQuery):
            dst = {
                Occur.MUST: must,
                Occur.FILTER: must,
                Occur.SHOULD: should,
                Occur.MUST_NOT: must_not,
            }[occur]
            dst.append(sub.term)
        elif isinstance(sub, PhraseQuery):
            if occur in (Occur.SHOULD, Occur.MUST_NOT):
                raise NotImplementedError(
                    "percolator phrases must be required clauses"
                )
            if sub.slop:
                raise NotImplementedError("percolator is exact-phrase only")
            phrases.append(tuple(sub.terms))
            must.extend(sub.terms)  # conjunctive prefilter
        else:
            raise NotImplementedError(
                f"percolator does not support nested {type(sub).__name__}"
            )

    if isinstance(q, BooleanQuery):
        for c in q.clauses:
            add(c.occur, c.query)
        mm = q.minimum_number_should_match
    else:
        add(Occur.MUST, q)
    if not must and should and mm == 0:
        mm = 1
    return PercolatorQuery(
        query_id,
        tuple(dict.fromkeys(must)),
        tuple(dict.fromkeys(should)),
        tuple(dict.fromkeys(must_not)),
        mm,
        tuple(phrases),
    )


def percolate(
    postings: DataFrame, queries: list[PercolatorQuery]
) -> DataFrame:
    """Evaluate every registered query against every doc.

    ``postings`` is the standard inverted relation (doc_id, term, tf,
    positions).  Returns (query_id, doc_id) — one row per match.
    """
    spark = postings.sparkSession
    rows = []
    reqs = []
    for pq in queries:
        for t in pq.must:
            rows.append((pq.query_id, t, "must"))
        for t in pq.should:
            rows.append((pq.query_id, t, "should"))
        for t in pq.must_not:
            rows.append((pq.query_id, t, "not"))
        reqs.append((pq.query_id, len(pq.must), pq.min_should_match))
    qterms = spark.createDataFrame(
        rows, "query_id: bigint, term: string, role: string"
    )
    qreqs = spark.createDataFrame(
        reqs, "query_id: bigint, n_must: int, mm: int"
    )

    hits = (
        postings.select("doc_id", "term")
        .join(F.broadcast(qterms), "term")
        .groupBy("doc_id", "query_id")
        .agg(
            F.count_distinct(
                F.when(F.col("role") == "must", F.col("term"))
            ).alias("must_hit"),
            F.count_distinct(
                F.when(F.col("role") == "should", F.col("term"))
            ).alias("should_hit"),
            F.max(
                F.when(F.col("role") == "not", F.lit(1)).otherwise(0)
            ).alias("not_hit"),
        )
    )
    matched = (
        hits.join(F.broadcast(qreqs), "query_id")
        .filter(
            (F.col("must_hit") == F.col("n_must"))
            & (F.col("should_hit") >= F.col("mm"))
            & (F.col("not_hit") == 0)
        )
        .select("query_id", "doc_id")
    )

    # Phrase verification on the candidate set: the offset-shifted
    # array_intersect kernel (ExactPhraseScorer semantics), one chain
    # per registered phrase (registered phrases are few; the heavy
    # doc-side work happened in the single join above).
    for pq in queries:
        for phrase in pq.phrases:
            verified = None
            uniq = list(dict.fromkeys(phrase))
            for i, t in enumerate(uniq):
                pl = postings.filter(F.col("term") == t).select(
                    "doc_id", F.col("positions").alias(f"_p{i}")
                )
                verified = (
                    pl
                    if verified is None
                    else verified.join(pl, "doc_id")
                )
            def _shift(off: int):
                # one-arg lambda: F.transform passes (elem, idx) to
                # TWO-arg callables, which would clobber a default arg
                return lambda x: x - F.lit(off)

            inter = None
            for off, t in enumerate(phrase):
                i = uniq.index(t)
                shifted = F.transform(F.col(f"_p{i}"), _shift(off))
                inter = (
                    shifted
                    if inter is None
                    else F.array_intersect(inter, shifted)
                )
            ok = (
                verified.filter(F.size(inter) > 0)
                .select("doc_id")
                .withColumn("query_id", F.lit(pq.query_id))
                .withColumn("_ok", F.lit(1))
            )
            # one left join per phrase — rows of OTHER queries pass
            # through; this query's rows survive only when verified
            # (no union, so the boolean-matrix subtree is not
            # duplicated per phrase)
            matched = (
                matched.join(ok, ["query_id", "doc_id"], "left")
                .filter(
                    (F.col("query_id") != F.lit(pq.query_id))
                    | F.col("_ok").isNotNull()
                )
                .drop("_ok")
            )

    return matched
