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

- ``{!join from to fromIndex}inner`` → field-value semi-join
  (JoinQParserPlugin.java: docs of THIS collection whose ``to`` field
  value occurs among the ``from`` values of inner-query matches;
  scores=none ⇒ constant score)
- ``{!geofilt sfield pt d}`` → great-circle distance filter
  (SpatialFilterQParserPlugin → LatLonType.createSpatialQuery; the
  sfield point lives in ``<sfield>_lat``/``<sfield>_lon`` doc-values
  columns, distance = haversine on the GEO mean radius)
- ``{!bbox sfield pt d}``    → bounding-box pre-filter of geofilt
  (SpatialUtils.calcBoxByDistFromPt: ±d/R latitude, ±d/(R·cos lat)
  longitude — the standard cheap superset box)

- ``{!term}`` / ``{!raw}``  → verbatim TermQuery, no analysis
- ``{!field f}value``       → analyzed term/phrase (FieldQParserPlugin)
- ``{!switch case… default}`` → routes the input onto another query
  string (SwitchQParserPlugin)
- ``{!surround}``           → span proximity language (W/N/AND/OR/NOT,
  truncations) via queries/surround.py (SurroundQParserPlugin)
- ``{!complexphrase}"a b*"~2`` → wildcard-bearing phrase as span-near
  (ComplexPhraseQParserPlugin)

- ``{!graph from to maxDepth returnRoot}`` → iterative frontier
  traversal over doc-values edges (GraphQParserPlugin)
- ``{!mlt maxqt}docid``     → interesting-terms boolean (MLTQParserPlugin)

- ``{!xmlparser}<BooleanQuery>…`` → CoreParser XML element vocabulary
  (queries/xmlparser.py; XmlQParserPlugin.java)
- ``{!maxscore tie=}``     → lucene parse with top-level SHOULD
  clauses folded into DisjunctionMax (MaxScoreQParser.java)

- ``{!parent which score}``/``{!child of}`` → block join over the
  ``_root_`` doc-values column (BlockJoinParentQParser.java /
  BlockJoinChildQParser.java; Solr's nested docs carry the block root
  in _root_, the relational form of Lucene's consecutive-docID blocks)
- ``{!payload_check f v payloads}``/``{!payload_score f v func}`` →
  queries/payloads.py span queries over the payload postings table
- ``{!collapse field=}`` → max-score head per group value
  (CollapsingQParserPlugin.java, nullPolicy=ignore)
- ``{!rerank reRankQuery reRankDocs reRankWeight}`` → queries/rerank.py
  two-pass window rescoring (ReRankQParserPlugin.java)
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .parser import parse_query
from .payloads import _PayloadQueryBase
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


@dataclass(frozen=True)
class DisMaxExtras(Query):
    """The (e)dismax boost plumbing around the user query
    (ExtendedDismaxQParser.addBoostQuery/addBoostFunctions +
    the multiplicative `boost` param): selection comes from ``base``
    alone; each ``bq`` adds its score where it ALSO matches, each
    ``bf`` function value adds unconditionally, and ``boost_fn``
    multiplies last — exactly the outer BooleanQuery of MUST(user) +
    SHOULD(bq…) + SHOULD(bf…) the reference builds, with the boost
    wrapper on top."""

    base: Query
    bqs: tuple[Query, ...] = ()
    bfs: tuple[str, ...] = ()
    boost_fn: str | None = None


@dataclass(frozen=True)
class JoinQuery(Query):
    """Field-value join (search/JoinQParserPlugin.java → JoinQuery;
    score= modes from ScoreJoinQParserPlugin.java → lucene/join/
    JoinUtil.createJoinQuery ScoreMode): match docs whose ``to_field``
    value appears among the ``from_field`` values of ``inner``-matched
    docs.  score=none (default) ⇒ constant score semi-join;
    avg/max/min/total aggregate the from-side scores per join value and
    carry them to the to-side docs."""

    from_field: str
    to_field: str
    inner: Query
    from_index: str | None = None
    score_mode: str = "none"


@dataclass(frozen=True)
class GraphQuery(Query):
    """{!graph} traversal filter (search/join/GraphQuery.java via
    GraphQParserPlugin): starting from the root query's matches,
    repeatedly find docs whose ``to_field`` value appears among the
    frontier's ``from_field`` values; ``max_depth=-1`` walks to the
    fixpoint.  Constant score, ``return_root`` as in the reference."""

    from_field: str
    to_field: str
    root: Query
    max_depth: int = -1
    return_root: bool = True


@dataclass(frozen=True)
class MoreLikeThisQuery(Query):
    """{!mlt}docid (MLTQParserPlugin): boolean SHOULD over the doc's
    interesting terms, source doc excluded."""

    doc_id: int
    max_query_terms: int = 25


@dataclass(frozen=True)
class BlockJoinParentQuery(Query):
    """{!parent which=<allParents> score=<mode>}childQuery
    (search/join/BlockJoinParentQParser.java → lucene/join/
    ToParentBlockJoinQuery.java): match the parents whose block contains
    a child matching ``child``; parent score aggregates the block's
    child scores per ScoreMode (none|avg|max|min|total).

    The reference encodes blocks positionally (consecutive docIDs,
    parent last); the relational equivalent is Solr's own ``_root_``
    field — every doc carries its block root — which is what the
    dispatcher's ``root_field`` doc-values column holds.  Spark shape:
    child matches → root via the root column → groupBy(root) agg →
    semi-join the ``which`` parent set.  One narrow shuffle on root;
    no positional scan."""

    which: Query
    child: Query
    score_mode: str = "none"


@dataclass(frozen=True)
class BlockJoinChildQuery(Query):
    """{!child of=<allParents>}parentQuery (BlockJoinChildQParser.java →
    ToChildBlockJoinQuery.java): match every NON-parent doc whose block
    root matched ``parent``; each child inherits its parent's score
    (ToChildBlockJoinQuery.java ChildScorer.score() returns
    parentScore)."""

    of: Query
    parent: Query


@dataclass(frozen=True)
class HashQuery(Query):
    """{!hash workers=N worker=i keys=f1,f2}
    (search/HashQParserPlugin.java:50-95, the ParallelStream worker
    filter): constant-score filter keeping the docs whose key-hash
    lands on this worker.  The reference's contract is a deterministic
    disjoint-and-covering partition of the doc set by key — the hash
    function itself is engine-internal (here xxhash64, Spark's native
    shuffle hash family)."""

    workers: int
    worker: int
    keys: "tuple[str, ...]"


@dataclass(frozen=True)
class CollapseQuery(Query):
    """{!collapse field=} (search/CollapsingQParserPlugin.java): keep
    one representative per group value — the max-score head, doc_id
    tie-break (the plugin's default score selector); docs with a null
    group value are dropped (nullPolicy=ignore, the default)."""

    field: str
    inner: Query


@dataclass(frozen=True)
class ReRankQuery(Query):
    """{!rerank reRankQuery= reRankDocs= reRankWeight=}main
    (search/ReRankQParserPlugin.java): two-pass scoring over the main
    query's top-reRankDocs window."""

    main: Query
    rerank_q: Query
    rerank_docs: int = 200
    rerank_weight: float = 2.0
    rows: int = 10


@dataclass(frozen=True)
class LTRQuery(Query):
    """{!ltr model= reRankDocs=}main (solr/contrib/ltr
    LTRQParserPlugin.java): rerank the main query's window with a
    registered learned model; features come from the dispatcher's
    doc_values columns plus 'original_score'
    (OriginalScoreFeature.java)."""

    main: Query
    model_name: str
    rerank_docs: int = 200
    rows: int = 10


@dataclass(frozen=True)
class GeoFilterQuery(Query):
    """{!geofilt}/{!bbox} spatial filter (SpatialFilterQParserPlugin):
    docs whose ``sfield`` point is within ``d`` km of ``pt``; ``bbox``
    uses the rectangular superset box instead of the exact circle."""

    sfield: str
    lat: float
    lon: float
    d_km: float
    bbox: bool = False


# keys may be dotted (SwitchQParserPlugin's case.<value> params)
_KV = re.compile(r"""([\w.]+)=(?:"([^"]*)"|'([^']*)'|(\S+))|(\S+)""")


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
        elif isinstance(val, list):
            # a $ref may name a MULTI-VALUED request param (Solr's
            # SolrParams.getParams, used by {!filters param=$fqs})
            kv.setdefault(key, []).extend(val)
        else:
            kv.setdefault(key, []).append(val)
    return ptype or "lucene", kv, rest


class _WrongCorpusSearcher:
    """Stand-in searcher for {!join fromIndex=X} inner queries: any
    text-query dispatch is an error (the inner query must run against
    the fromIndex corpus, not this collection's inverted index —
    JoinQParserPlugin.java resolves the fromIndex core's searcher)."""

    def __init__(self, from_index: str) -> None:
        self.from_index = from_index

    def __getattr__(self, name: str):
        if name in ("docs", "search", "count", "parse"):
            raise NotImplementedError(
                f"{{!join fromIndex={self.from_index}}} with a text-query "
                "inner clause needs a per-index text searcher; only "
                "doc-values-side inner queries (frange/geofilt/bbox) are "
                "supported against a fromIndex table"
            )
        # benign introspection (e.g. getattr(searcher, "tables", None))
        raise AttributeError(name)


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
        tables: dict[str, DataFrame] | None = None,
        root_field: str = "_root_",
        payload_postings: DataFrame | None = None,
        ltr_models: dict | None = None,
    ):
        self.searcher = searcher
        self.doc_values = doc_values
        self.params = params or {}
        self.default_field = default_field
        # {!join fromIndex=name} cross-collection sources (each a
        # doc-values DataFrame carrying doc_id — the other "core").
        self.tables = tables or {}
        # block-join root column (Solr's _root_ nested-doc field): every
        # doc's doc-values row names its block root's doc_id
        self.root_field = root_field
        # {!payload_score}/{!payload_check} query the payload postings
        # table (queries/payloads.py), a parallel index surface
        self.payload_postings = payload_postings
        # {!ltr model=name}: the ManagedModelStore analog — name →
        # (LinearModel|TreesModel, feature_cols over doc_values)
        self.ltr_models = ltr_models or {}

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

        if ptype in ("term", "raw"):
            # TermQParserPlugin / RawQParserPlugin: both build the Term
            # from the raw value with no analysis (TermQParserPlugin
            # .java createParser; RawQParserPlugin.java)
            return wrap_field(TermQuery(one("v", rest) or ""))
        if ptype == "query":
            # NestedQParserPlugin: delegate the (usually $-referenced)
            # value to a full re-parse — the {!query v=$q1} indirection
            # every boost-function nesting uses (NestedQParserPlugin
            # .java createParser → subQuery(v).getQuery())
            return self.parse(one("v", rest) or "")
        if ptype == "field":
            # FieldQParserPlugin.java: analyze the value with the
            # field's analyzer; one token → TermQuery, several →
            # PhraseQuery with the analysis positions (stop gaps kept)
            from lucene_solr_spark.analysis import analyze_text

            toks, pos = analyze_text(one("v", rest) or "")
            if not toks:
                from .query import MatchNoDocsQuery

                return MatchNoDocsQuery("field value analyzed to no terms")
            if len(toks) == 1:
                return wrap_field(TermQuery(toks[0]))
            from .query import PhraseQuery

            return wrap_field(PhraseQuery(tuple(toks), tuple(pos)))
        if ptype == "switch":
            # SwitchQParserPlugin.java: route on the trimmed input —
            # empty input → case=, else case.<input>=, else default=
            val = (one("v", rest) or "").strip()
            target = one("case") if not val else one(f"case.{val}")
            if target is None:
                target = one("default")
            if target is None:
                raise ValueError(
                    f"{{!switch}} has no case matching {val!r} and no "
                    "default"
                )
            return self.parse(target)
        if ptype == "maxscore":
            # MaxScoreQParser.java:56-89: parse exactly like lucene,
            # then pull the top-level SHOULD clauses into one
            # DisjunctionMaxQuery(tie) SHOULD clause; MUST/MUST_NOT/
            # FILTER clauses pass through unchanged.
            from .query import DisjunctionMaxQuery

            q = parse_query(one("v", rest) or "")
            if not isinstance(q, BooleanQuery):
                return q
            tie = float(one("tie", "0") or 0)
            should = [c.query for c in q.clauses if c.occur == Occur.SHOULD]
            rest_clauses = [c for c in q.clauses if c.occur != Occur.SHOULD]
            if should:
                rest_clauses.append(
                    BooleanClause(
                        Occur.SHOULD,
                        DisjunctionMaxQuery(tuple(should), tie_breaker=tie),
                    )
                )
            return BooleanQuery(
                tuple(rest_clauses),
                minimum_number_should_match=q.minimum_number_should_match,
            )
        if ptype == "xmlparser":
            # XmlQParserPlugin.java → SolrCoreParser (CoreParser over
            # the solr schema analyzers); the element vocabulary lives
            # in queries/xmlparser.py
            from .xmlparser import parse_xml_query

            return parse_xml_query(
                one("v", rest) or "", default_field=self.default_field
            )
        if ptype == "surround":
            from .surround import parse_surround

            return parse_surround(
                one("v", rest) or "", self.searcher._expand_terms
            )
        if ptype == "complexphrase":
            from lucene_solr_spark.analysis import analyze_text

            from .surround import parse_complex_phrase

            return parse_complex_phrase(
                one("v", rest) or "",
                self.searcher._expand_terms,
                analyze_text,
                in_order=(one("inOrder", "true") == "true"),
            )
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
        if ptype == "filters":
            # FiltersQParserPlugin (solr/core/.../search/
            # FiltersQParserPlugin.java): v as the scoring MUST clause,
            # every param= query as a FILTER clause; filters whose
            # {!tag=…} intersects excludeTags are dropped (the
            # multi-select faceting contract).
            exclude: set[str] = set()
            for ex in kv.get("excludeTags", []):
                exclude.update(t.strip() for t in ex.split(",") if t.strip())
            clauses = []
            main = one("v", rest)
            if main:
                clauses.append(BooleanClause(Occur.MUST, self.parse(main)))
            for fq in kv.get("param", []):
                _, fkv, _ = parse_local_params(fq, self.params)
                tags: set[str] = set()
                for tv in fkv.get("tag", []):
                    tags.update(t.strip() for t in tv.split(","))
                if tags & exclude:
                    continue
                clauses.append(BooleanClause(Occur.FILTER, self.parse(fq)))
            return BooleanQuery(tuple(clauses))
        if ptype == "boost":
            b = one("b")
            if b is None:
                raise ValueError("{!boost} requires b=<function>")
            return BoostByFunctionQuery(self.parse(rest), b)
        if ptype == "graph":
            frm, to = one("from"), one("to")
            if not frm or not to:
                raise ValueError("{!graph} requires from= and to=")
            return GraphQuery(
                frm,
                to,
                self.parse(rest),
                max_depth=int(one("maxDepth", "-1") or -1),
                return_root=(one("returnRoot", "true") == "true"),
            )
        if ptype == "mlt":
            return MoreLikeThisQuery(
                int(one("v", rest) or 0),
                max_query_terms=int(one("maxqt", "25") or 25),
            )
        if ptype == "hash":
            keys = tuple((one("keys") or "").split(","))
            if not keys or keys == ("",):
                raise ValueError("{!hash} requires keys=")
            return HashQuery(
                int(one("workers", "1") or 1),
                int(one("worker", "0") or 0),
                keys,
            )
        if ptype == "collapse":
            fld = one("field")
            if fld is None:
                raise ValueError("{!collapse} requires field=")
            return CollapseQuery(fld, self.parse(one("v", rest) or ""))
        if ptype == "ltr":
            model = one("model")
            if model is None:
                raise ValueError("{!ltr} requires model=")
            return LTRQuery(
                self.parse(one("v", rest) or ""),
                model,
                rerank_docs=int(one("reRankDocs", "200") or 200),
                rows=int(one("rows", "10") or 10),
            )
        if ptype == "rerank":
            rq = one("reRankQuery")
            if rq is None:
                raise ValueError("{!rerank} requires reRankQuery=")
            return ReRankQuery(
                self.parse(one("v", rest) or ""),
                self.parse(rq),
                rerank_docs=int(one("reRankDocs", "200") or 200),
                rerank_weight=float(one("reRankWeight", "2.0") or 2.0),
                rows=int(one("rows", "10") or 10),
            )
        if ptype == "parent":
            # BlockJoinParentQParser.java: which= names the all-parents
            # filter; score= the ScoreMode (default none)
            which = one("which")
            if which is None:
                raise ValueError("{!parent} requires which=<allParents>")
            mode = (one("score", "none") or "none").lower()
            if mode not in ("none", "avg", "max", "min", "total"):
                raise ValueError(f"unknown block-join score mode {mode!r}")
            return BlockJoinParentQuery(
                self.parse(which), self.parse(one("v", rest) or ""), mode
            )
        if ptype == "child":
            of = one("of")
            if of is None:
                raise ValueError("{!child} requires of=<allParents>")
            return BlockJoinChildQuery(
                self.parse(of), self.parse(one("v", rest) or "")
            )
        if ptype in ("payload_check", "payload_score"):
            # PayloadCheckQParserPlugin.java / PayloadScoreQParserPlugin
            # .java: whitespace-analyzed value terms over the payload
            # postings; payloads= one required payload per term, func=
            # the PayloadFunction
            from .payloads import PayloadCheckQuery, PayloadScoreQuery

            terms = tuple((one("v", rest) or "").split())
            if ptype == "payload_check":
                pay = one("payloads")
                if pay is None:
                    raise ValueError("{!payload_check} requires payloads=")
                return PayloadCheckQuery(
                    terms, tuple(float(p) for p in pay.split())
                )
            return PayloadScoreQuery(terms, one("func", "sum") or "sum")
        if ptype == "join":
            frm, to = one("from"), one("to")
            if not frm or not to:
                raise ValueError("{!join} requires from= and to=")
            mode = (one("score", "none") or "none").lower()
            if mode not in ("none", "avg", "max", "min", "total"):
                raise ValueError(f"unknown join score mode {mode!r}")
            return JoinQuery(
                frm, to, self.parse(rest), one("fromIndex"), mode
            )
        if ptype in ("dismax", "edismax"):
            # DisMaxQParser.java / ExtendedDismaxQParser.java: the
            # per-field DisjunctionMax tree lives in queries/edismax.py;
            # this branch is the param plumbing (qf/pf/tie/mm).  mm here
            # is the absolute-count form; percentage mm is resolved
            # upstream by callers that know the clause count.
            from .edismax import parse_edismax

            qf = one("qf")
            if qf is None:
                raise ValueError(f"{{!{ptype}}} requires qf=")
            mm_raw = (one("mm", "0") or "0").strip()
            if mm_raw.endswith("%"):
                raise ValueError(
                    "percentage mm is resolved by the caller (absolute "
                    "count form only here)"
                )
            base = parse_edismax(
                one("v", rest) or "",
                qf=qf,
                pf=one("pf"),
                tie=float(one("tie", "0") or 0),
                mm=int(mm_raw or 0),
                ps=int(one("ps", "0") or 0),
            )
            # bq / bf / boost plumbing (ExtendedDismaxQParser
            # .addBoostQuery:?/getBoostFunctions + boost= wrapper)
            bqs = tuple(self.parse(b) for b in kv.get("bq", []))
            bfs = tuple(kv.get("bf", []))
            boost_fn = one("boost")
            if bqs or bfs or boost_fn:
                return DisMaxExtras(base, bqs, bfs, boost_fn)
            return base
        if ptype == "simple":
            # SimpleQParserPlugin.java: Lucene SimpleQueryParser over
            # q.op / q.operators
            from .simple import ALL_OPERATORS, parse_simple

            op = (one("q.op", "OR") or "OR").upper()
            ops_raw = one("q.operators")
            ops = (
                frozenset(
                    s.strip().upper()
                    for s in ops_raw.split(",")
                    if s.strip()
                )
                if ops_raw
                else ALL_OPERATORS
            )
            return wrap_field(
                parse_simple(
                    one("v", rest) or "",
                    default_op=Occur.MUST if op == "AND" else Occur.SHOULD,
                    operators=ops,
                )
            )
        if ptype == "graphTerms":
            # GraphTermsQParserPlugin.java: a constant-score terms query
            # that SKIPS high-frequency terms (docFreq > maxDocFreq) —
            # gatherNodes uses it to avoid hub explosion.  The df lookup
            # is the searcher's cached stats round (bounded by the
            # query's own term count, like every term-stats collect).
            terms = [t for t in (one("v", rest) or "").split(",") if t]
            max_df = int(one("maxDocFreq", "-1") or -1)
            if max_df >= 0 and terms:
                stats = self.searcher.term_statistics(terms)
                terms = [t for t in terms if stats[t][0] <= max_df]
            if not terms:
                from .query import MatchNoDocsQuery

                return MatchNoDocsQuery("all graphTerms pruned")
            return wrap_field(
                ConstantScoreQuery(
                    BooleanQuery(
                        tuple(
                            BooleanClause(Occur.SHOULD, TermQuery(t))
                            for t in terms
                        )
                    )
                )
            )
        if ptype in ("min_hash", "minhash"):
            # MinHashQParser.java: analyze v with the MinHash chain,
            # one SHOULD clause per sketch hash, sim → min-should-match
            from .minhash import (
                DEFAULT_BUCKETS,
                DEFAULT_SHINGLE_N,
                MinHashQuery,
            )

            return MinHashQuery(
                text=one("v", rest) or "",
                field=one("field", self.default_field or "text"),
                sim=float(one("sim", "0") or 0.0),
                shingle_n=int(one("shingleN", str(DEFAULT_SHINGLE_N))),
                bucket_count=int(one("buckets", str(DEFAULT_BUCKETS))),
            )
        if ptype in ("geofilt", "bbox"):
            sfield = one("sfield")
            pt = one("pt")
            d = one("d")
            if not sfield or not pt or d is None:
                raise ValueError(f"{{!{ptype}}} requires sfield=, pt=, d=")
            lat_s, lon_s = pt.split(",", 1)
            return GeoFilterQuery(
                sfield, float(lat_s), float(lon_s), float(d), bbox=(ptype == "bbox")
            )
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
        from .minhash import MinHashQuery, minhash_match

        if isinstance(q, MinHashQuery):
            if self.doc_values is None:
                raise ValueError("{!min_hash} needs a doc_values table")
            return minhash_match(self.doc_values, q)
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
        if isinstance(q, DisMaxExtras):
            out = self.docs(q.base)
            for i, bq in enumerate(q.bqs):
                bqs = self.docs(bq).select(
                    "doc_id", F.col("score").cast("double").alias(f"_bq{i}")
                )
                out = out.join(bqs, "doc_id", "left").select(
                    "doc_id",
                    (
                        F.col("score").cast("double")
                        + F.coalesce(F.col(f"_bq{i}"), F.lit(0.0))
                    ).alias("score"),
                )
            for i, bf in enumerate(q.bfs):
                col = self._func_col(bf).cast("double")
                dv = self.doc_values.select("doc_id", col.alias(f"_bf{i}"))
                out = out.join(dv, "doc_id", "left").select(
                    "doc_id",
                    (
                        F.col("score").cast("double")
                        + F.coalesce(F.col(f"_bf{i}"), F.lit(0.0))
                    ).alias("score"),
                )
            if q.boost_fn:
                col = self._func_col(q.boost_fn).cast("double")
                dv = self.doc_values.select("doc_id", col.alias("_bst"))
                out = out.join(dv, "doc_id").select(
                    "doc_id",
                    (F.col("score").cast("double") * F.col("_bst")).alias(
                        "score"
                    ),
                )
            return out
        if isinstance(q, JoinQuery):
            # JoinQuery.createWeight: collect the inner matches' from-
            # field TERM SET, then hit this collection's to-field
            # (JoinQParserPlugin.java).  Spark shape: the from-value set
            # is a DISTINCT projection (small after dedup) and the hit
            # is a left-semi join — broadcastable when the value set is
            # small, a plain shuffled semi-join otherwise; never a
            # driver-side collect.
            src = (
                self.tables[q.from_index]
                if q.from_index is not None
                else self.doc_values
            )
            if src is None:
                raise ValueError("{!join} needs a from-side doc_values table")
            # fromIndex swaps only the doc_values side; this collection's
            # TEXT searcher must not silently serve the inner query (it
            # would match the wrong corpus — JoinQParserPlugin runs the
            # whole inner query against the fromIndex core).  Until a
            # per-table searcher registry exists, doc-values-side inner
            # queries (frange/geofilt/bbox) are supported and text inner
            # queries fail loudly.
            inner_searcher = (
                _WrongCorpusSearcher(q.from_index)
                if q.from_index is not None
                else self.searcher
            )
            sub = SolrQueryDispatcher(
                inner_searcher, src, self.params, self.default_field, self.tables
            )
            if self.doc_values is None:
                raise ValueError("{!join} needs a to-side doc_values table")
            inner_hits = sub.docs(q.inner).join(src, "doc_id")
            if q.score_mode == "none":
                vals = inner_hits.select(
                    F.col(q.from_field).alias("_jv")
                ).distinct()
                return (
                    self.doc_values.join(
                        vals,
                        self.doc_values[q.to_field] == vals["_jv"],
                        "left_semi",
                    )
                    .select("doc_id", F.lit(1.0).alias("score"))
                )
            # ScoreJoinQParserPlugin / JoinUtil ScoreMode: aggregate the
            # from-side scores per join value (partial+final agg — the
            # same one-narrow-shuffle shape as the semi-join), then an
            # inner join carries the value's score to the to-side docs
            agg = {
                "avg": F.avg("score"),
                "max": F.max("score"),
                "min": F.min("score"),
                "total": F.sum("score"),
            }[q.score_mode]
            vals = inner_hits.groupBy(
                F.col(q.from_field).alias("_jv")
            ).agg(agg.cast("double").alias("_jscore"))
            return (
                self.doc_values.join(
                    vals, self.doc_values[q.to_field] == vals["_jv"]
                )
                .select("doc_id", F.col("_jscore").alias("score"))
            )
        if isinstance(q, HashQuery):
            if self.doc_values is None:
                raise ValueError("{!hash} needs a doc_values table")
            missing = [k for k in q.keys if k not in self.doc_values.columns]
            if missing:
                raise ValueError(f"{{!hash}} unknown key columns {missing}")
            part = F.pmod(
                F.xxhash64(*[F.col(k) for k in q.keys]), F.lit(q.workers)
            )
            return self.doc_values.filter(part == q.worker).select(
                "doc_id", F.lit(1.0).alias("score")
            )
        if isinstance(q, CollapseQuery):
            from pyspark.sql import Window

            if self.doc_values is None or q.field not in self.doc_values.columns:
                raise ValueError(
                    f"{{!collapse}} needs a doc_values column {q.field!r}"
                )
            hits = self.docs(q.inner).join(
                self.doc_values.select("doc_id", q.field), "doc_id"
            ).filter(F.col(q.field).isNotNull())
            w = Window.partitionBy(q.field).orderBy(
                F.col("score").desc(), F.col("doc_id").asc()
            )
            return (
                hits.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .select("doc_id", "score")
            )
        if isinstance(q, LTRQuery):
            from .ltr import ltr_rescore

            if q.model_name not in self.ltr_models:
                raise ValueError(f"unknown LTR model {q.model_name!r}")
            if self.doc_values is None:
                raise ValueError("{!ltr} needs a doc_values feature table")
            model, feature_cols = self.ltr_models[q.model_name]
            return ltr_rescore(
                self.docs(q.main),
                self.doc_values,
                model,
                list(feature_cols),
                rerank_docs=q.rerank_docs,
                k=q.rows,
            ).select("doc_id", F.col("ltr_score").alias("score"))
        if isinstance(q, ReRankQuery):
            from .rerank import rerank

            return rerank(
                self.docs(q.main),
                self.docs(q.rerank_q),
                rerank_weight=q.rerank_weight,
                rerank_docs=q.rerank_docs,
                k=q.rows,
            )
        if isinstance(q, BlockJoinParentQuery):
            if (
                self.doc_values is None
                or self.root_field not in self.doc_values.columns
            ):
                raise ValueError(
                    "{!parent} needs a doc_values table with a "
                    f"{self.root_field!r} block-root column"
                )
            parents = self.docs(q.which).select("doc_id")
            # a child query matching a parent doc is illegal in the
            # reference (ToParentBlockJoinQuery asserts child < parent);
            # the relational equivalent drops parent rows from the
            # child match set
            child_hits = self.docs(q.child).join(
                parents, "doc_id", "left_anti"
            )
            rooted = child_hits.join(
                self.doc_values.select(
                    "doc_id", F.col(self.root_field).alias("_root")
                ),
                "doc_id",
            )
            agg = {
                "none": F.lit(1.0),
                "avg": F.avg("score"),
                "max": F.max("score"),
                "min": F.min("score"),
                "total": F.sum("score"),
            }[q.score_mode]
            if q.score_mode == "none":
                grouped = (
                    rooted.select(F.col("_root").alias("doc_id"))
                    .distinct()
                    .select("doc_id", F.lit(1.0).alias("score"))
                )
            else:
                grouped = rooted.groupBy(
                    F.col("_root").alias("doc_id")
                ).agg(agg.cast("double").alias("score"))
            return grouped.join(parents, "doc_id", "left_semi")
        if isinstance(q, BlockJoinChildQuery):
            if (
                self.doc_values is None
                or self.root_field not in self.doc_values.columns
            ):
                raise ValueError(
                    "{!child} needs a doc_values table with a "
                    f"{self.root_field!r} block-root column"
                )
            of_set = self.docs(q.of).select("doc_id")
            parent_hits = (
                self.docs(q.parent)
                .join(of_set, "doc_id", "left_semi")
                .select(F.col("doc_id").alias("_p"), "score")
            )
            children = self.doc_values.select(
                "doc_id", F.col(self.root_field).alias("_root")
            ).join(of_set, "doc_id", "left_anti")
            return children.join(
                parent_hits, children["_root"] == parent_hits["_p"]
            ).select("doc_id", F.col("score").cast("double").alias("score"))
        if isinstance(q, _PayloadQueryBase):
            if self.payload_postings is None:
                raise ValueError(
                    "payload queries need a payload_postings table"
                )
            return q.docs(self.payload_postings)
        if isinstance(q, FieldQuery) and (
            self.doc_values is not None
            and q.field in self.doc_values.columns
            and isinstance(q.query, TermQuery)
        ):
            # a term query against a non-text (docValues string) field
            # is an exact value match, as the reference's StrField
            # produces (schema.FieldType term query on an untokenized
            # field); constant score like the other filter parsers
            return self.doc_values.filter(
                F.col(q.field) == q.query.term
            ).select("doc_id", F.lit(1.0).alias("score"))
        if isinstance(q, GraphQuery):
            # GraphQuery.createWeight's frontier loop: each hop is a
            # distinct-project of the frontier's from-values + a semi-
            # join against the to-field — the same narrow-row shuffle
            # shape as {!join}; visited accumulates doc ids so a cyclic
            # graph terminates (frontier strictly shrinks to empty).
            if self.doc_values is None:
                raise ValueError("{!graph} needs a doc_values table")
            dv = self.doc_values
            roots = self.docs(q.root).select("doc_id")
            visited = roots
            frontier = roots
            depth = 0
            while q.max_depth < 0 or depth < q.max_depth:
                vals = (
                    frontier.join(dv, "doc_id")
                    .select(F.col(q.from_field).alias("_gv"))
                    .distinct()
                )
                nxt = (
                    dv.join(vals, dv[q.to_field] == vals["_gv"], "left_semi")
                    .select("doc_id")
                    .join(visited, "doc_id", "left_anti")
                )
                # driver-side emptiness probe bounds the loop (the
                # reference's traversal is likewise iterative); rows are
                # never collected, only counted
                if nxt.isEmpty():
                    break
                visited = visited.unionByName(nxt).persist()
                frontier = nxt
                depth += 1
            out = visited if q.return_root else visited.join(
                roots, "doc_id", "left_anti"
            )
            return out.select("doc_id", F.lit(1.0).alias("score"))
        if isinstance(q, MoreLikeThisQuery):
            from .mlt import interesting_terms

            terms = [
                t
                for t, _ in interesting_terms(
                    self.searcher, q.doc_id, q.max_query_terms
                )
            ]
            if not terms:
                return self.searcher._empty_scored()
            bq = BooleanQuery(
                tuple(
                    BooleanClause(Occur.SHOULD, TermQuery(t)) for t in terms
                )
            )
            return self.searcher.docs(bq).filter(F.col("doc_id") != q.doc_id)
        if isinstance(q, GeoFilterQuery):
            from lucene_solr_spark.functions.valuesource import (
                EARTH_RADIUS_KM,
                geodist_km,
            )
            import math

            if self.doc_values is None:
                raise ValueError("spatial filters need a doc_values table")
            lat_c = F.col(f"{q.sfield}_lat")
            lon_c = F.col(f"{q.sfield}_lon")
            if q.bbox:
                # DistanceUtils.calcBoxByDistFromPtDEG (LatLonType.
                # createSpatialQuery): dlat = d/R; dlon uses the
                # asin(sin(d/R)/cos φ) form, a guaranteed SUPERSET of
                # the circle (the linear d/(R·cos φ) approximation
                # under-covers points near the east/west extremes).
                # Pole crossing clamps latitude and admits every
                # longitude; dateline crossing splits into two ranges.
                r = q.d_km / EARTH_RADIUS_KM
                dlat = math.degrees(r)
                lat_min, lat_max = q.lat - dlat, q.lat + dlat
                if lat_min <= -90.0 or lat_max >= 90.0:
                    cond = (lat_c >= max(lat_min, -90.0)) & (
                        lat_c <= min(lat_max, 90.0)
                    )
                else:
                    dlon = math.degrees(
                        math.asin(
                            min(1.0, math.sin(r) / math.cos(math.radians(q.lat)))
                        )
                    )
                    lon_min, lon_max = q.lon - dlon, q.lon + dlon
                    lat_cond = (lat_c >= lat_min) & (lat_c <= lat_max)
                    if lon_min < -180.0:
                        lon_cond = (lon_c >= lon_min + 360.0) | (
                            lon_c <= lon_max
                        )
                    elif lon_max > 180.0:
                        lon_cond = (lon_c >= lon_min) | (
                            lon_c <= lon_max - 360.0
                        )
                    else:
                        lon_cond = (lon_c >= lon_min) & (lon_c <= lon_max)
                    cond = lat_cond & lon_cond
            else:
                cond = (
                    geodist_km(F.lit(q.lat), F.lit(q.lon), lat_c, lon_c)
                    <= q.d_km
                )
            return self.doc_values.filter(cond).select(
                "doc_id", F.lit(1.0).alias("score")
            )
        return self.searcher.docs(q)
