"""Solr local-params query dispatch — ``{!type key=val}query`` syntax.

Ref: solr/core/src/java/org/apache/solr/search/QParser.java (local-params
recognition in getParser), LocalParamsParser via
solr/solrj/.../util/ClientUtils + solr/core/.../search/*QParserPlugin.java
(the ~30 registered plugins, QParserPlugin.java standardPlugins).

Implemented plugin dispatch (each maps onto an operator that already
exists in this engine — the plugin layer is pure routing, exactly as in
the reference):

- ``{!lucene}``      → classic parser (`queries/parser.py`)
- ``{!term f v}``    → raw TermQuery, no analysis (TermQParserPlugin)
- ``{!prefix f v}``  → PrefixQuery (PrefixQParserPlugin)
- ``{!terms f separator}`` → constant-score OR over the term set
  (TermsQParserPlugin — filter semantics, method=booleanQuery)
- ``{!func}``        → FunctionQuery: score IS the function value
  (FunctionQParserPlugin → FunctionQuery.java)
- ``{!frange l u incl incu}`` → FunctionRangeQuery: docs whose function
  value is in range, constant score (FunctionRangeQParserPlugin →
  ValueSourceRangeFilter.java)
- ``{!bool must should must_not filter mm}`` → BooleanQuery composition
  of sub query strings (BoolQParserPlugin)
- ``{!boost b}``     → score × function value (BoostQParserPlugin)
- ``$ref`` value dereference from a params map (the request's
  parameter substitution, LocalSolrQueryRequest params)

Field-scoped types wrap in FieldQuery when ``f`` names a non-default
field (our Term analog carries the field via the wrapper).

Not routed here (already first-class elsewhere, as the SURVEY table
maps them): collapse → grouping_collapse, join → block_join/JoinUtil,
rerank → queries/rerank.py, graph → streaming/graph.py, xmlparser/
surround/spatial → out of scope.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .parser import parse_query
from .query import (
    BooleanClause,
    BooleanQuery,
    ConstantScoreQuery,
    FieldQuery,
    Occur,
    PrefixQuery,
    Query,
    TermQuery,
)


@dataclass(frozen=True)
class FunctionQuery(Query):
    """score = the function value (queries/function/FunctionQuery.java:
    score() returns qWeight * vals.floatVal(doc))."""

    text: str


@dataclass(frozen=True)
class FunctionRangeQuery(Query):
    """Constant-score filter: l <= func(doc) <= u
    (search/FunctionRangeQuery.java + ValueSourceRangeFilter)."""

    text: str
    lower: float | None = None
    upper: float | None = None
    include_lower: bool = True
    include_upper: bool = True


@dataclass(frozen=True)
class BoostByFunctionQuery(Query):
    """score(sub) × func(doc) (search/BoostQParserPlugin →
    FunctionScoreQuery.boostByValue)."""

    query: Query
    boost_text: str


_KV = re.compile(r"""(\w+)=(?:"([^"]*)"|'([^']*)'|(\S+))|(\S+)""")


def _split_local_params(s: str) -> tuple[str, str] | None:
    """Return (body, rest) for a leading ``{!body}rest``, honoring quotes
    — the closing brace may not be inside a quoted value (a nested
    sub-query like must="{!term v=x}")."""
    if not s.startswith("{!"):
        return None
    quote = None
    for i in range(2, len(s)):
        c = s[i]
        if quote:
            if c == quote:
                quote = None
        elif c in "\"'":
            quote = c
        elif c == "}":
            return s[2:i], s[i + 1:].strip()
    raise ValueError(f"unterminated local params in {s!r}")


def parse_local_params(
    qstr: str, params: dict[str, str] | None = None
) -> tuple[str | None, dict[str, list[str]], str]:
    """Split ``{!type k=v ...}rest`` → (type, multi-value param dict,
    rest).  A leading bare word is the parser type (``{!prefix f=x}``);
    ``type=`` is accepted too.  ``$name`` values dereference ``params``."""
    split = _split_local_params(qstr.strip())
    if split is None:
        return None, {}, qstr.strip()
    body, rest = split
    ptype: str | None = None
    kv: dict[str, list[str]] = {}
    first = True
    for t in _KV.finditer(body):
        if t.group(5) is not None:  # bare word
            if first:
                ptype = t.group(5)
            first = False
            continue
        first = False
        key = t.group(1)
        val = next(v for v in t.groups()[1:4] if v is not None)
        if val.startswith("$"):
            if params is None or val[1:] not in params:
                raise ValueError(f"unresolved parameter reference {val}")
            val = params[val[1:]]
        if key == "type":
            ptype = val
        else:
            kv.setdefault(key, []).append(val)
    return ptype or "lucene", kv, rest


class SolrQueryDispatcher:
    """Routes local-params query strings onto the engine's operators.

    ``doc_values`` is the per-doc field table (doc_id + columns) that
    function queries evaluate over — the docValues analog."""

    def __init__(
        self,
        searcher,
        doc_values: DataFrame | None = None,
        params: dict[str, str] | None = None,
        default_field: str | None = None,
    ):
        self.searcher = searcher
        self.doc_values = doc_values
        self.params = params or {}
        self.default_field = default_field

    # ------------------------------------------------------------ parse
    def parse(self, qstr: str) -> Query:
        ptype, kv, rest = parse_local_params(qstr, self.params)
        if ptype is None or ptype == "lucene":
            return parse_query(rest)

        def one(key: str, default: str | None = None) -> str | None:
            vals = kv.get(key)
            return vals[0] if vals else default

        def wrap_field(q: Query) -> Query:
            f = one("f")
            if f is not None and f != self.default_field:
                return FieldQuery(f, q)
            return q

        if ptype == "term":
            return wrap_field(TermQuery(one("v", rest) or ""))
        if ptype == "prefix":
            return wrap_field(PrefixQuery(one("v", rest) or ""))
        if ptype == "terms":
            sep = one("separator", ",")
            terms = [t for t in (one("v", rest) or "").split(sep) if t]
            clauses = tuple(
                BooleanClause(Occur.SHOULD, TermQuery(t)) for t in terms
            )
            return wrap_field(ConstantScoreQuery(BooleanQuery(clauses)))
        if ptype == "func":
            return FunctionQuery(one("v", rest) or "")
        if ptype == "frange":
            def num(key):
                v = one(key)
                return float(v) if v is not None else None
            return FunctionRangeQuery(
                one("v", rest) or "",
                lower=num("l"),
                upper=num("u"),
                include_lower=(one("incl", "true") == "true"),
                include_upper=(one("incu", "true") == "true"),
            )
        if ptype == "bool":
            occur_map = {
                "must": Occur.MUST,
                "must_not": Occur.MUST_NOT,
                "should": Occur.SHOULD,
                "filter": Occur.FILTER,
            }
            clauses = []
            for key, occ in occur_map.items():
                for sub in kv.get(key, []):
                    clauses.append(BooleanClause(occ, self.parse(sub)))
            return BooleanQuery(
                tuple(clauses),
                minimum_number_should_match=int(one("mm", "0") or 0),
            )
        if ptype == "boost":
            b = one("b")
            if b is None:
                raise ValueError("{!boost} requires b=<function>")
            return BoostByFunctionQuery(self.parse(rest), b)
        raise ValueError(f"unknown query parser type {ptype!r}")

    # ------------------------------------------------------------ exec
    def _func_col(self, text: str):
        from lucene_solr_spark.functions.valuesource import parse_function_query

        if self.doc_values is None:
            raise ValueError("function queries need a doc_values table")
        return parse_function_query(
            text, self.doc_values, tables=getattr(self.searcher, "tables", None)
        )

    def docs(self, qstr_or_query: str | Query) -> DataFrame:
        """Scored doc-set for a local-params query string or tree →
        DataFrame(doc_id, score double)."""
        q = (
            self.parse(qstr_or_query)
            if isinstance(qstr_or_query, str)
            else qstr_or_query
        )
        if isinstance(q, FunctionQuery):
            col = self._func_col(q.text)
            return self.doc_values.select(
                "doc_id", col.cast("double").alias("score")
            )
        if isinstance(q, FunctionRangeQuery):
            col = self._func_col(q.text).cast("double")
            cond = F.lit(True)
            if q.lower is not None:
                cond = cond & (
                    (col >= q.lower) if q.include_lower else (col > q.lower)
                )
            if q.upper is not None:
                cond = cond & (
                    (col <= q.upper) if q.include_upper else (col < q.upper)
                )
            return self.doc_values.filter(cond).select(
                "doc_id", F.lit(1.0).alias("score")
            )
        if isinstance(q, BoostByFunctionQuery):
            base = self.docs(q.query)
            col = self._func_col(q.boost_text).cast("double")
            dv = self.doc_values.select("doc_id", col.alias("_b"))
            return base.join(dv, "doc_id").select(
                "doc_id",
                (F.col("score").cast("double") * F.col("_b")).alias("score"),
            )
        return self.searcher.docs(q)
