"""CommonTermsQuery (lucene/queries/src/java/org/apache/lucene/
queries/CommonTermsQuery.java).

Splits query terms by document frequency at ``maxTermFrequency``
(absolute when >= 1, else a fraction of maxDoc, buildQuery:169-186):
low-frequency terms form the REQUIRED group (scored, with its own
minimumNumberShouldMatch), high-frequency "common" terms form an
OPTIONAL group that only boosts — the classic stopword-tolerant
query.  When every term is common, the high group is rewritten to a
MUST conjunction (buildQuery:196-204) so the query stays selective.

The build step here is driver-side query REWRITING onto the engine's
BooleanQuery tree (docFreq lookups hit the term_stats table — the
reference's collectTermContext pass); execution inherits the
searcher's plan: rarest-first conjunction, ReqOptSum for the
optional group.
"""
from __future__ import annotations

import math

from lucene_solr_spark.queries.query import (
    BooleanClause,
    BooleanQuery,
    BoostQuery,
    MatchNoDocsQuery,
    Occur,
    Query,
    TermQuery,
)

__all__ = ["build_common_terms_query"]


def _min_nr_should_match(value: float, num_optional: int) -> int:
    """CommonTermsQuery.minNrShouldMatch:142-147: >=1 or 0 is an
    absolute count; a fraction rounds over the optional clauses."""
    if value >= 1.0 or value == 0.0:
        return int(value)
    return round(value * num_optional)


def build_common_terms_query(
    terms: list[str],
    doc_freqs: dict[str, int],
    max_doc: int,
    max_term_frequency: float = 0.01,
    low_freq_occur: Occur = Occur.SHOULD,
    high_freq_occur: Occur = Occur.SHOULD,
    low_freq_min_should_match: float = 0.0,
    high_freq_min_should_match: float = 0.0,
) -> Query:
    """buildQuery:162-213 — partition by docFreq and assemble.

    ``doc_freqs`` carries each term's df (0 / absent = unseen term,
    which lands in the low group like a null TermContext).
    """
    if low_freq_occur == Occur.MUST_NOT or high_freq_occur == Occur.MUST_NOT:
        raise ValueError("occur must be MUST or SHOULD, not MUST_NOT")
    low: list[str] = []
    high: list[str] = []
    for t in terms:
        df = doc_freqs.get(t, 0)
        if df == 0:
            low.append(t)
        elif (max_term_frequency >= 1.0 and df > max_term_frequency) or (
            df > int(math.ceil(max_term_frequency * float(max_doc)))
        ):
            high.append(t)
        else:
            low.append(t)

    low_mm = (
        _min_nr_should_match(low_freq_min_should_match, len(low))
        if low_freq_occur == Occur.SHOULD and low
        else 0
    )
    high_mm = (
        _min_nr_should_match(high_freq_min_should_match, len(high))
        if high_freq_occur == Occur.SHOULD and high
        else 0
    )
    if not low and not high:
        return MatchNoDocsQuery("no terms")
    # all-common rewrite: conjunction instead of a slow full disjunction
    if not low and high_mm == 0 and high_freq_occur != Occur.MUST:
        high_freq_occur = Occur.MUST

    clauses: list[BooleanClause] = []
    if low:
        lowq = BooleanQuery(
            tuple(
                BooleanClause(low_freq_occur, TermQuery(t)) for t in low
            ),
            minimum_number_should_match=low_mm,
        )
        clauses.append(BooleanClause(Occur.MUST, BoostQuery(lowq, 1.0)))
    if high:
        highq = BooleanQuery(
            tuple(
                BooleanClause(high_freq_occur, TermQuery(t)) for t in high
            ),
            minimum_number_should_match=high_mm,
        )
        # top-level occur is ALWAYS SHOULD (buildQuery:208-211); with
        # an empty low group the pure-SHOULD boolean still requires
        # its single clause, and the rewrite above made the INNER
        # group a conjunction
        clauses.append(BooleanClause(Occur.SHOULD, BoostQuery(highq, 1.0)))
    return BooleanQuery(tuple(clauses))
