"""Surround query language parser — span-oriented proximity syntax.

Ref: lucene/queryparser/src/java/org/apache/lucene/queryparser/surround/
parser/QueryParser.jj (grammar) and surround/query/{DistanceQuery,
SrndBooleanQuery,SrndTermQuery,SrndTruncQuery}.java (tree construction),
routed by solr/core/src/java/org/apache/solr/search/
SurroundQParserPlugin.java.

Grammar subset (the reference's operator precedence, lowest→highest:
OR, AND, NOT, N, W; all operators case-insensitive):

    query   := orq
    orq     := andq (OR andq)*
    andq    := notq (AND notq)*
    notq    := nq (NOT nq)*
    nq      := wq (N wq)*                 # unordered adjacent (dist 1)
    wq      := prim (W prim)*             # ordered adjacent (dist 1)
    prim    := PREFIXOP '(' query (',' query)* ')' | '(' query ')' | term
    PREFIXOP:= [digits] (W|N) | AND | OR | NOT

Tree mapping (surround/query → this engine):

- ``kW(a,b,…)`` → ``SpanNearQuery(slop=k−1, in_order=True)``
  (DistanceQuery opDistance=k ordered; infix ``a W b`` is k=1)
- ``kN(a,b,…)`` → ``SpanNearQuery(slop=k−1, in_order=False)``
- ``OR``/``AND``/``NOT`` at span level inside a distance op: only OR
  is a legal distance subquery (DistanceQuery.distanceSubQueryNotAllowed
  rejects and/not), mapped to ``SpanOrQuery``
- top level ``OR``/``AND``/``NOT`` → BooleanQuery SHOULD / MUST /
  MUST+MUST_NOT (SrndBooleanQuery.makeLuceneQueryField)
- truncated terms (``pre*``, ``te?t``) → dictionary expansion
  (SrndTruncQuery.visitMatchingTerms); inside a distance op the
  expansion becomes a ``SpanOrQuery`` of ``SpanTermQuery``; at top
  level the engine's native multi-term queries execute it
- terms are matched VERBATIM — the surround parser performs no
  analysis (BasicQueryFactory builds the Term from the raw token), so
  query tokens must match the index's (lowercased) term form, exactly
  as in the reference.
"""

from __future__ import annotations

import re
from collections.abc import Callable

from .query import (
    BooleanClause,
    BooleanQuery,
    MatchNoDocsQuery,
    Occur,
    PrefixQuery,
    Query,
    WildcardQuery,
)
from .spans import (
    SpanNearQuery,
    SpanOrQuery,
    SpanQuery,
    SpanTermQuery,
)

# token := parens/comma | prefixed distance op | word (may carry * ?)
_TOKEN = re.compile(r"\(|\)|,|[^\s(),]+")

ExpandFn = Callable[[Query], list[str]]


class SurroundParser:
    """Recursive-descent parser for the surround grammar subset.

    ``expand`` resolves truncated terms against the term dictionary
    (the searcher's MultiTermQuery rewrite, 1024-term cap) — needed at
    parse time because span operands must be concrete term spans."""

    def __init__(self, text: str, expand: ExpandFn) -> None:
        self.toks = _TOKEN.findall(text)
        self.i = 0
        self.expand = expand

    # ------------------------------------------------------------ lexer
    def _peek(self) -> str | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def _next(self) -> str:
        t = self._peek()
        if t is None:
            raise ValueError("unexpected end of surround query")
        self.i += 1
        return t

    @staticmethod
    def _dist_op(tok: str | None) -> tuple[int, bool] | None:
        """``3w``/``n``/… → (distance, ordered) or None."""
        if tok is None:
            return None
        m = re.fullmatch(r"(\d*)([wWnN])", tok)
        if not m:
            return None
        return (int(m.group(1) or 1), m.group(2).lower() == "w")

    # ---------------------------------------------------------- parsing
    def parse(self) -> Query:
        q = self._or()
        if self._peek() is not None:
            raise ValueError(f"trailing input at {self._peek()!r}")
        return q

    def _or(self) -> Query:
        left = self._and()
        parts = [left]
        while (t := self._peek()) is not None and t.lower() == "or":
            self._next()
            parts.append(self._and())
        return self._mk_or(parts)

    def _and(self) -> Query:
        parts = [self._not()]
        while (t := self._peek()) is not None and t.lower() == "and":
            self._next()
            parts.append(self._not())
        if len(parts) == 1:
            return parts[0]
        return BooleanQuery(
            tuple(BooleanClause(Occur.MUST, p) for p in parts)
        )

    def _not(self) -> Query:
        left = self._near()
        excl: list[Query] = []
        while (t := self._peek()) is not None and t.lower() == "not":
            self._next()
            excl.append(self._near())
        if not excl:
            return left
        return BooleanQuery(
            (BooleanClause(Occur.MUST, left),)
            + tuple(BooleanClause(Occur.MUST_NOT, e) for e in excl)
        )

    def _near(self) -> Query:
        """Infix N then W (W binds tighter), both distance 1."""
        parts = [self._w()]
        while (op := self._dist_op(self._peek())) is not None and not op[1]:
            dist = op[0]
            self._next()
            parts.append(self._w())
            parts = [self._mk_near(parts, dist, ordered=False)]
        return parts[0]

    def _w(self) -> Query:
        parts = [self._prim()]
        while (op := self._dist_op(self._peek())) is not None and op[1]:
            dist = op[0]
            self._next()
            parts.append(self._prim())
            parts = [self._mk_near(parts, dist, ordered=True)]
        return parts[0]

    def _prim(self) -> Query:
        t = self._next()
        if t == "(":
            q = self._or()
            if self._next() != ")":
                raise ValueError("expected ')'")
            return q
        low = t.lower()
        if self._peek() == "(" and (
            low in ("or", "and", "not") or self._dist_op(t) is not None
        ):
            args = self._args()
            if low == "or":
                return self._mk_or(args)
            if low == "and":
                return BooleanQuery(
                    tuple(BooleanClause(Occur.MUST, a) for a in args)
                )
            if low == "not":
                if len(args) < 2:
                    raise ValueError("not(...) needs >= 2 arguments")
                return BooleanQuery(
                    (BooleanClause(Occur.MUST, args[0]),)
                    + tuple(
                        BooleanClause(Occur.MUST_NOT, a) for a in args[1:]
                    )
                )
            dist, ordered = self._dist_op(t)
            return self._mk_near(args, dist, ordered)
        if t in ("(", ")", ","):
            raise ValueError(f"unexpected {t!r}")
        return self._term(t)

    def _args(self) -> list[Query]:
        assert self._next() == "("
        args = [self._or()]
        while self._peek() == ",":
            self._next()
            args.append(self._or())
        if self._next() != ")":
            raise ValueError("expected ')'")
        return args

    # ------------------------------------------------------ construction
    def _term(self, tok: str) -> Query:
        """Verbatim term; ``*``/``?`` make it a truncation
        (SrndTruncQuery / SrndPrefixQuery)."""
        if "*" in tok or "?" in tok:
            if tok.endswith("*") and "*" not in tok[:-1] and "?" not in tok:
                return PrefixQuery(tok[:-1])
            return WildcardQuery(tok)
        return SpanTermQuery(tok)

    def _as_span(self, q: Query) -> SpanQuery:
        """Distance subquery legality (DistanceQuery.java:
        distanceSubQueryNotAllowed): terms, truncations, OR, nested
        distance ops — never AND/NOT."""
        if isinstance(q, SpanQuery):
            return q
        if isinstance(q, (PrefixQuery, WildcardQuery)):
            terms = self.expand(q)
            if not terms:
                # an empty expansion matches nothing; poison the whole
                # distance op like an absent term does
                return SpanOrQuery((SpanTermQuery("\x00-no-match"),))
            return SpanOrQuery(tuple(SpanTermQuery(t) for t in terms))
        raise ValueError(
            f"{type(q).__name__} is not allowed as a distance subquery "
            "(surround DistanceQuery accepts terms, truncations, OR and "
            "nested distance ops)"
        )

    def _mk_near(
        self, parts: list[Query], dist: int, ordered: bool
    ) -> Query:
        if dist < 1:
            raise ValueError("distance must be >= 1")
        return SpanNearQuery(
            tuple(self._as_span(p) for p in parts),
            slop=dist - 1,
            in_order=ordered,
        )

    def _mk_or(self, parts: list[Query]) -> Query:
        if len(parts) == 1:
            return parts[0]
        if all(isinstance(p, SpanQuery) for p in parts):
            return SpanOrQuery(tuple(parts))
        return BooleanQuery(
            tuple(BooleanClause(Occur.SHOULD, p) for p in parts)
        )


def parse_surround(text: str, expand: ExpandFn) -> Query:
    """Parse a surround query string → Query tree.

    Single bare terms come back as ``SpanTermQuery`` (executed as a
    span — same postings, same score as the term query)."""
    return SurroundParser(text, expand).parse()


def parse_complex_phrase(
    text: str,
    expand: ExpandFn,
    analyze: Callable[[str], tuple[list[str], list[int]]],
    in_order: bool = True,
) -> Query:
    """ComplexPhraseQueryParser's phrase rewrite
    (lucene/queryparser/.../complexPhrase/ComplexPhraseQueryParser.java:
    ComplexPhraseQuery.rewrite, routed by Solr's
    ComplexPhraseQParserPlugin): a quoted phrase whose slots may be
    wildcards/prefixes becomes ``SpanNearQuery`` over per-slot
    ``SpanTermQuery`` / ``SpanOrQuery`` (the wildcard slots expand
    against the term dictionary), with ``~k`` as slop.

    Non-wildcard slots run through the analyzer (the reference parses
    the phrase body with the field's analyzer); a slot that analyzes
    away (stopword) is dropped with its position gap preserved by the
    following slots' positions — matching the exact-phrase behavior of
    the engine's PhraseQuery path."""
    text = text.strip()
    slop = 0
    m = re.fullmatch(r'"(.*)"\s*~\s*(\d+)', text, re.S)
    if m:
        body, slop = m.group(1), int(m.group(2))
    else:
        m2 = re.fullmatch(r'"(.*)"', text, re.S)
        body = m2.group(1) if m2 else text
    slots: list[SpanQuery] = []
    for raw in body.split():
        if "*" in raw or "?" in raw:
            mq: Query = (
                PrefixQuery(raw[:-1].lower())
                if raw.endswith("*") and "*" not in raw[:-1] and "?" not in raw
                else WildcardQuery(raw.lower())
            )
            terms = expand(mq)
            if not terms:
                return MatchNoDocsQuery(f"no terms match {raw!r}")
            slots.append(
                SpanTermQuery(terms[0])
                if len(terms) == 1
                else SpanOrQuery(tuple(SpanTermQuery(t) for t in terms))
            )
        else:
            toks, _pos = analyze(raw)
            if not toks:
                continue  # stopword slot
            slots.append(SpanTermQuery(toks[0]))
    if not slots:
        return MatchNoDocsQuery("phrase analyzed to no terms")
    if len(slots) == 1:
        return slots[0]
    return SpanNearQuery(tuple(slots), slop=slop, in_order=in_order)
