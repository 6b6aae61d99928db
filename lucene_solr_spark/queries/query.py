"""Immutable Query trees — the reference's first IR.

Ref: org.apache.lucene.search.Query subclasses (TermQuery.java,
BooleanQuery.java, PhraseQuery.java, ...).  Queries are frozen
dataclasses so rewrites build new trees (Lucene queries are likewise
immutable; rewrite() returns new instances — IndexSearcher.java:671-676).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum


class Occur(Enum):
    """BooleanClause.Occur (search/BooleanClause.java:26-46)."""

    MUST = "MUST"
    FILTER = "FILTER"        # required, does not score
    SHOULD = "SHOULD"
    MUST_NOT = "MUST_NOT"


class Query:
    """Marker base class."""

    __slots__ = ()


@dataclass(frozen=True)
class TermQuery(Query):
    term: str


@dataclass(frozen=True)
class BooleanClause:
    occur: Occur
    query: Query


# Max clause count, ref: search/BooleanQuery.java:43
MAX_CLAUSE_COUNT = 1024


@dataclass(frozen=True)
class BooleanQuery(Query):
    clauses: tuple[BooleanClause, ...]
    minimum_number_should_match: int = 0

    def __post_init__(self) -> None:
        if len(self.clauses) > MAX_CLAUSE_COUNT:
            raise ValueError("maxClauseCount is set to 1024")

    def with_occur(self, occur: Occur) -> tuple[Query, ...]:
        return tuple(c.query for c in self.clauses if c.occur == occur)


@dataclass(frozen=True)
class PhraseQuery(Query):
    """Phrase with explicit per-term positions and optional slop —
    PhraseQuery.Builder.add(term, position) semantics, which is how
    stop-gap phrases are expressed (ref: search/PhraseQuery.java).
    slop=0 → exact (ExactPhraseScorer); slop>0 → sloppy
    (SloppyPhraseScorer semantics, distinct terms only)."""

    terms: tuple[str, ...]
    positions: tuple[int, ...] = ()
    slop: int = 0

    def __post_init__(self) -> None:
        if not self.positions:
            object.__setattr__(self, "positions", tuple(range(len(self.terms))))
        if len(self.positions) != len(self.terms):
            raise ValueError("terms and positions must align")
        if self.slop < 0:
            raise ValueError("slop must be >= 0")


@dataclass(frozen=True)
class SynonymQuery(Query):
    """Terms scored as one pseudo-term (search/SynonymQuery.java:233 LoC:
    summed tf, max df)."""

    terms: tuple[str, ...]


@dataclass(frozen=True)
class MatchAllDocsQuery(Query):
    pass


@dataclass(frozen=True)
class MatchNoDocsQuery(Query):
    reason: str = ""


@dataclass(frozen=True)
class BoostQuery(Query):
    query: Query
    boost: float


@dataclass(frozen=True)
class ConstantScoreQuery(Query):
    query: Query
    score: float = 1.0


@dataclass(frozen=True)
class BoostingQuery(Query):
    """Demote (don't exclude) docs matching ``context``
    (queries/BoostingQuery.java:44-121): selection is ``match`` alone —
    context-only matches are ignored — and a matching doc's score is
    multiplied by ``boost`` (< 1 demotes) iff it ALSO matches
    ``context``, whose own score is never computed (createWeight with
    needsScores=false, :70)."""

    match: Query
    context: Query
    boost: float


@dataclass(frozen=True)
class PrefixQuery(Query):
    """Term-expansion query; rewritten against the term dictionary with
    CONSTANT_SCORE_REWRITE like the reference's MultiTermQuery default."""

    prefix: str


@dataclass(frozen=True)
class WildcardQuery(Query):
    pattern: str  # '*' any, '?' one — ref: search/WildcardQuery.java


@dataclass(frozen=True)
class RegexpQuery(Query):
    """Regular-expression term expansion (search/RegexpQuery.java via
    util/automaton/RegExp.java).  Lucene regexps match the WHOLE term
    (implicit anchoring).  The FULL grammar (flags=ALL) is supported —
    incl. the Lucene-specific ~ (complement), & (intersection),
    <n-m> (numeric interval), @ (any string) and # (empty language)
    operators — by the DFA engine in queries/luceneregexp.py; named
    automata <identifier> raise (no provider), like the reference."""

    pattern: str


@dataclass(frozen=True)
class TermRangeQuery(Query):
    lower: str | None
    upper: str | None
    include_lower: bool = True
    include_upper: bool = True


@dataclass(frozen=True)
class FuzzyQuery(Query):
    term: str
    max_edits: int = 2  # ref: search/FuzzyQuery.java defaultMaxEdits
    # ref: FuzzyQuery.java:58 defaultTranspositions = true — adjacent
    # transpositions count as ONE edit (OSA / restricted Damerau, the
    # metric LevenshteinAutomata builds); False = classic Levenshtein
    transpositions: bool = True


def boolean(
    *clauses: tuple[Occur, Query], min_should_match: int = 0
) -> BooleanQuery:
    """Convenience builder."""
    return BooleanQuery(
        tuple(BooleanClause(o, q) for o, q in clauses),
        minimum_number_should_match=min_should_match,
    )


@dataclass(frozen=True)
class DisjunctionMaxQuery(Query):
    """Score = max(subscores) + tie_breaker · Σ(other subscores).

    Ref: search/DisjunctionMaxQuery.java (DisjunctionMaxScorer:
    score = max + tieBreakerMultiplier * (sum - max))."""

    disjuncts: tuple[Query, ...]
    tie_breaker: float = 0.0


@dataclass(frozen=True)
class MultiPhraseQuery(Query):
    """Phrase with term alternatives per position slot.

    Ref: search/MultiPhraseQuery.java — each slot is a term set; the
    position join unions each slot's postings first.  ``slop`` follows
    Builder.setSlop (MultiPhraseQuery.java:83-90, rejecting negatives)
    and routes execution through the SloppyPhraseScorer machinery with
    the slot's union postings as one PhrasePositions each — INCLUDING
    the multi-term repeat branch for overlapping slot term sets
    (connected-component repeat groups + iterative collision init,
    SloppyPhraseScorer.java:285-345; goldens mirror
    TestMultiPhraseQuery.testZeroPosIncrSloppy*)."""

    slots: tuple[tuple[str, ...], ...]
    positions: tuple[int, ...] = ()
    slop: int = 0

    def __post_init__(self) -> None:
        if not self.positions:
            object.__setattr__(self, "positions", tuple(range(len(self.slots))))
        if len(self.positions) != len(self.slots):
            raise ValueError("slots and positions must align")
        if self.slop < 0:
            raise ValueError("slop value cannot be negative")


@dataclass(frozen=True)
class FieldQuery(Query):
    """A sub-query bound to a named field.

    The reference's queries are field-scoped at the Term level
    (index/Term.java: (field, text)); our single-field core makes field
    an explicit wrapper instead, dispatched by MultiFieldSearcher."""

    field: str
    query: Query
