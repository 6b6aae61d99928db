"""XML query parser — the CoreParser element vocabulary over this
engine's query objects.

Ref: lucene/queryparser/src/java/org/apache/lucene/queryparser/xml/
CoreParser.java:69-111 (the builder registry: TermQuery, TermsQuery,
MatchAllDocsQuery, BooleanQuery, PointRangeQuery, RangeQuery,
DisjunctionMaxQuery, UserQuery, ConstantScoreQuery, SpanTerm, SpanNear,
SpanOr, SpanOrTerms, SpanFirst, SpanNot) and the per-element builders
under xml/builders/*.java; surfaced in Solr as {!xmlparser}
(solr/core/.../search/XmlQParserPlugin.java → SolrCoreParser).

Each element maps onto a query object that already exists in this
engine — like the local-params layer, the XML layer is pure routing:

- ``<TermQuery fieldName="f">text</TermQuery>`` — raw term, NO analysis
  (TermQueryBuilder.java:34-40 builds the Term from the element text
  verbatim); ``boost`` attribute → BoostQuery.
- ``<TermsQuery fieldName minimumNumberShouldMatch>`` — element text IS
  analyzed (TermsQueryBuilder.java:49-70), one SHOULD TermQuery per
  token.
- ``<BooleanQuery minimumNumberShouldMatch>`` with ``<Clause
  occurs="must|mustNot|should|filter">`` children
  (BooleanQueryBuilder.java:48-84; occurs defaults to should).
- ``<RangeQuery fieldName lowerTerm upperTerm includeLower
  includeUpper>`` → TermRangeQuery (RangeQueryBuilder.java:33-38;
  string order, matching the reference's term-range semantics).
- ``<PointRangeQuery fieldName lowerTerm upperTerm type>`` → numeric
  doc-values range = FunctionRangeQuery over the field, both ends
  inclusive (PointRangeQueryBuilder.java:74-98: newRangeQuery with
  MIN/MAX defaults).
- ``<DisjunctionMaxQuery tieBreaker>`` (DisjunctionMaxQueryBuilder
  .java:48).
- ``<ConstantScoreQuery>`` wrapping one sub-query.
- ``<UserQuery>classic syntax</UserQuery>`` → the classic parser
  (UserInputQueryBuilder.java:61-76).
- ``<MatchAllDocsQuery/>``.
- Spans: ``<SpanTerm>`` (verbatim text), ``<SpanNear slop inOrder>``
  (slop REQUIRED, inOrder defaults false — SpanNearBuilder.java:42-44),
  ``<SpanOr>``, ``<SpanOrTerms fieldName>`` (analyzed →
  SpanOr-of-SpanTerm, SpanOrTermsBuilder.java:49-64), ``<SpanFirst
  end>`` (end defaults 1), ``<SpanNot><Include>…</Include>
  <Exclude>…</Exclude></SpanNot>``.

``fieldName`` follows the reference's attribute inheritance
(DOMUtils.getAttributeWithInheritance: nearest ancestor wins); a
fieldName differing from the default field wraps the result in
FieldQuery, the engine's field-scoping convention.  ``boost`` on a
nested span element raises (the engine has no SpanBoost node; the
reference's SpanBoostQuery only affects scoring of the top-level tree,
which the top-level BoostQuery wrap preserves).

Out of vocabulary (raise ValueError): BoostingTermQuery (payload
scoring lives in queries/payloads.py against the payload postings
table, not the main searcher), FuzzyLikeThisQuery / LikeThisQuery
(MLT lives in queries/mlt.py with its own {!mlt} route).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from typing import Callable

from .query import (
    BooleanClause,
    BooleanQuery,
    BoostQuery,
    ConstantScoreQuery,
    DisjunctionMaxQuery,
    FieldQuery,
    MatchAllDocsQuery,
    MatchNoDocsQuery,
    Occur,
    Query,
    TermQuery,
    TermRangeQuery,
)
from .spans import (
    SpanFirstQuery,
    SpanNearQuery,
    SpanNotQuery,
    SpanOrQuery,
    SpanQuery,
    SpanTermQuery,
)

_OCCURS = {
    "must": Occur.MUST,
    "mustnot": Occur.MUST_NOT,
    "should": Occur.SHOULD,
    "filter": Occur.FILTER,
}

_SPAN_ELEMENTS = {
    "SpanTerm", "SpanNear", "SpanOr", "SpanOrTerms", "SpanFirst", "SpanNot",
}


def _text(e: ET.Element) -> str:
    # DOMUtils.getText concatenates all text descendants
    return "".join(e.itertext())


def _boost(e: ET.Element) -> float:
    return float(e.get("boost", "1"))


class XmlQueryParser:
    """parse(xml) → Query.  ``analyze`` is the query-time analyzer for
    the analyzed elements (TermsQuery, SpanOrTerms, UserQuery);
    ``default_field`` controls FieldQuery wrapping as in
    LocalParamsParser."""

    def __init__(
        self,
        analyze: Callable[[str], tuple[list[str], list[int]]] | None = None,
        default_field: str | None = None,
        fields: frozenset[str] | set[str] = frozenset(),
    ) -> None:
        if analyze is None:
            from lucene_solr_spark.analysis import analyze_text

            analyze = analyze_text
        self.analyze = analyze
        self.default_field = default_field
        self.fields = frozenset(fields)

    # ---------------------------------------------------------------- api
    def parse(self, xml_text: str) -> Query:
        try:
            root = ET.fromstring(xml_text)
        except ET.ParseError as exc:
            raise ValueError(f"malformed query XML: {exc}") from exc
        return self._query(root, None)

    # ------------------------------------------------------------ helpers
    def _field(self, e: ET.Element, inherited: str | None) -> str | None:
        # DOMUtils.getAttributeWithInheritance
        return e.get("fieldName", inherited)

    def _wrap_field(self, q: Query, fname: str | None) -> Query:
        if fname is not None and fname != self.default_field:
            return FieldQuery(fname, q)
        return q

    def _children(self, e: ET.Element) -> list[ET.Element]:
        return list(e)

    def _one_child(self, e: ET.Element) -> ET.Element:
        kids = self._children(e)
        if len(kids) != 1:
            raise ValueError(
                f"<{e.tag}> expects exactly one child query element"
            )
        return kids[0]

    # -------------------------------------------------------------- query
    def _query(self, e: ET.Element, inherited_field: str | None) -> Query:
        tag = e.tag
        if tag in _SPAN_ELEMENTS:
            fname = self._field(e, inherited_field)
            q = self._span(e, inherited_field, top=True)
            return self._wrap_field(q, fname)
        h = getattr(self, f"_q_{tag}", None)
        if h is None:
            raise ValueError(f"unknown query element <{tag}>")
        return h(e, inherited_field)

    def _q_TermQuery(self, e: ET.Element, inh: str | None) -> Query:
        q: Query = TermQuery(_text(e))
        q = self._wrap_field(q, self._field(e, inh))
        b = _boost(e)
        return BoostQuery(q, b) if b != 1.0 else q

    def _q_TermsQuery(self, e: ET.Element, inh: str | None) -> Query:
        fname = self._field(e, inh)
        toks, _pos = self.analyze(_text(e))
        if not toks:
            return MatchNoDocsQuery("TermsQuery text analyzed to no terms")
        q: Query = BooleanQuery(
            tuple(BooleanClause(Occur.SHOULD, TermQuery(t)) for t in toks),
            minimum_number_should_match=int(
                e.get("minimumNumberShouldMatch", "0")
            ),
        )
        q = self._wrap_field(q, fname)
        b = _boost(e)
        return BoostQuery(q, b) if b != 1.0 else q

    def _q_MatchAllDocsQuery(self, e: ET.Element, inh: str | None) -> Query:
        return MatchAllDocsQuery()

    def _q_BooleanQuery(self, e: ET.Element, inh: str | None) -> Query:
        inh = self._field(e, inh)
        clauses = []
        for c in self._children(e):
            if c.tag != "Clause":
                raise ValueError(
                    f"<BooleanQuery> children must be <Clause>, got <{c.tag}>"
                )
            occs = (c.get("occurs") or "should").lower()
            if occs not in _OCCURS:
                raise ValueError(
                    f'invalid value for "occurs" attribute of clause: {occs}'
                )
            clauses.append(
                BooleanClause(_OCCURS[occs], self._query(self._one_child(c), inh))
            )
        q: Query = BooleanQuery(
            tuple(clauses),
            minimum_number_should_match=int(
                e.get("minimumNumberShouldMatch", "0")
            ),
        )
        b = _boost(e)
        return BoostQuery(q, b) if b != 1.0 else q

    def _q_RangeQuery(self, e: ET.Element, inh: str | None) -> Query:
        fname = self._field(e, inh)
        q: Query = TermRangeQuery(
            e.get("lowerTerm"),
            e.get("upperTerm"),
            include_lower=e.get("includeLower", "true").lower() == "true",
            include_upper=e.get("includeUpper", "true").lower() == "true",
        )
        return self._wrap_field(q, fname)

    def _q_PointRangeQuery(self, e: ET.Element, inh: str | None) -> Query:
        from .local_params import FunctionRangeQuery

        fname = self._field(e, inh)
        if fname is None:
            raise ValueError("<PointRangeQuery> requires fieldName")
        lo, hi = e.get("lowerTerm"), e.get("upperTerm")
        return FunctionRangeQuery(
            fname,
            lower=float(lo) if lo is not None else None,
            upper=float(hi) if hi is not None else None,
            include_lower=True,
            include_upper=True,
        )

    def _q_DisjunctionMaxQuery(self, e: ET.Element, inh: str | None) -> Query:
        inh = self._field(e, inh)
        q: Query = DisjunctionMaxQuery(
            tuple(self._query(c, inh) for c in self._children(e)),
            tie_breaker=float(e.get("tieBreaker", "0")),
        )
        b = _boost(e)
        return BoostQuery(q, b) if b != 1.0 else q

    def _q_ConstantScoreQuery(self, e: ET.Element, inh: str | None) -> Query:
        q: Query = ConstantScoreQuery(
            self._query(self._one_child(e), self._field(e, inh))
        )
        b = _boost(e)
        return BoostQuery(q, b) if b != 1.0 else q

    def _q_UserQuery(self, e: ET.Element, inh: str | None) -> Query:
        from .parser import parse_query

        q = parse_query(_text(e), self.analyze, self.fields)
        b = _boost(e)
        return BoostQuery(q, b) if b != 1.0 else q

    # -------------------------------------------------------------- spans
    def _span(
        self, e: ET.Element, inherited_field: str | None, top: bool = False
    ) -> SpanQuery | Query:
        tag = e.tag
        if tag not in _SPAN_ELEMENTS:
            raise ValueError(f"<{tag}> is not a span query element")
        b = _boost(e)
        if b != 1.0 and not top:
            raise ValueError(
                "boost on a nested span element is not supported (the "
                "engine has no SpanBoost node; boost the top-level span)"
            )
        inh = self._field(e, inherited_field)
        q: SpanQuery
        if tag == "SpanTerm":
            q = SpanTermQuery(_text(e))
        elif tag == "SpanNear":
            slop = e.get("slop")
            if slop is None:
                raise ValueError("<SpanNear> requires the slop attribute")
            q = SpanNearQuery(
                tuple(self._span(c, inh) for c in self._children(e)),
                slop=int(slop),
                in_order=e.get("inOrder", "false").lower() == "true",
            )
        elif tag == "SpanOr":
            q = SpanOrQuery(
                tuple(self._span(c, inh) for c in self._children(e))
            )
        elif tag == "SpanOrTerms":
            toks, _pos = self.analyze(_text(e))
            if not toks:
                raise ValueError("SpanOrTerms text analyzed to no terms")
            q = SpanOrQuery(tuple(SpanTermQuery(t) for t in toks))
        elif tag == "SpanFirst":
            q = SpanFirstQuery(
                self._span(self._one_child(e), inh), int(e.get("end", "1"))
            )
        else:  # SpanNot
            inc = exc = None
            for c in self._children(e):
                if c.tag == "Include":
                    inc = self._span(self._one_child(c), inh)
                elif c.tag == "Exclude":
                    exc = self._span(self._one_child(c), inh)
            if inc is None or exc is None:
                raise ValueError(
                    "<SpanNot> requires <Include> and <Exclude> children"
                )
            q = SpanNotQuery(inc, exc)
        if top and b != 1.0:
            return BoostQuery(q, b)
        return q


def parse_xml_query(
    xml_text: str,
    analyze: Callable[[str], tuple[list[str], list[int]]] | None = None,
    default_field: str | None = None,
    fields: frozenset[str] | set[str] = frozenset(),
) -> Query:
    """One-shot CoreParser.parse analog."""
    return XmlQueryParser(analyze, default_field, fields).parse(xml_text)
