"""Extended-dismax (edismax) query parsing — the Solr qf/pf surface.

Ref: solr/core/src/java/org/apache/solr/search/ExtendedDismaxQParserPlugin.java
(query fields ``qf`` with per-field boosts, phrase fields ``pf``,
``tie``, ``mm``) and DisMaxQParser.java.  The parser turns a user query
string into the existing Query algebra:

- each user term becomes DisjunctionMax over the qf fields (per-field
  BM25 with per-field stats — MultiFieldSearcher semantics), each arm
  boosted by its qf weight;
- '+'/'-' prefixes keep their classic MUST / MUST_NOT meaning, bare
  terms are SHOULD with ``mm`` applied (minNrShouldMatch);
- quoted phrases become per-field PhraseQuery dismax arms;
- ``pf`` adds one SHOULD clause per phrase field: the whole query text
  as an exact phrase, boosted — the "boost docs with the words in
  sequence" behavior that makes edismax rank full matches first.

Terms are analyzed with the same chain as the index (stopwords drop,
multi-token splits become phrases), mirroring how the reference parser
sends query text through the field's analyzer.
"""

from __future__ import annotations

import re

from lucene_solr_spark.analysis import analyze_text
from lucene_solr_spark.queries.query import (
    BooleanClause,
    BooleanQuery,
    BoostQuery,
    DisjunctionMaxQuery,
    FieldQuery,
    MatchNoDocsQuery,
    Occur,
    PhraseQuery,
    Query,
    TermQuery,
)

_FIELD_BOOST_RE = re.compile(r"^([A-Za-z_][\w.]*)(?:\^([0-9.]+))?$")


def parse_field_boosts(spec: str) -> dict[str, float]:
    """'text^2 title source^0.5' → {'text': 2.0, 'title': 1.0, ...}."""
    out: dict[str, float] = {}
    for part in spec.split():
        m = _FIELD_BOOST_RE.match(part)
        if not m:
            raise ValueError(f"bad qf/pf entry: {part!r}")
        out[m.group(1)] = float(m.group(2)) if m.group(2) else 1.0
    return out


def _analyzed_query(text: str) -> Query | None:
    """One user chunk → field-local query (term / phrase / None)."""
    terms, positions = analyze_text(text)
    if not terms:
        return None
    if len(terms) == 1:
        return TermQuery(terms[0])
    base = positions[0]
    return PhraseQuery(
        tuple(terms), tuple(p - base for p in positions), slop=0
    )


def _per_field_dismax(
    sub_of_field: "dict[str, Query | None]",
    boosts: dict[str, float],
    tie: float,
) -> Query | None:
    arms = []
    for f, b in boosts.items():
        sub = sub_of_field.get(f)
        if sub is None:
            continue
        arm: Query = FieldQuery(f, sub)
        if b != 1.0:
            arm = BoostQuery(arm, b)
        arms.append(arm)
    if not arms:
        return None
    if len(arms) == 1:
        return arms[0]
    return DisjunctionMaxQuery(tuple(arms), tie_breaker=tie)


_CHUNK_RE = re.compile(r'([+-]?)("(?:[^"\\]|\\.)*"|\S+)')


def calculate_min_should_match(optional_clause_count: int, spec: str) -> int:
    """Solr's full mm spec grammar (SolrPluginUtils.java:686-723,
    calculateMinShouldMatch): absolute ("3"), negative ("-2"),
    percentage ("75%", "-25%" — int-truncated toward zero, negatives
    subtract from the clause count), and conditional chains
    ("2<-25% 9<-3": each 'n<spec' applies its spec only when the
    optional clause count EXCEEDS n; the first unexceeded bound
    returns the result so far).  Result clamps to [0, n]."""
    import re as _re

    result = optional_clause_count
    spec = spec.strip()
    if "<" in spec:
        spec = _re.sub(r"(\s+<\s*)|(\s*<\s+)", "<", spec)
        for s in _re.split(r"\s+", spec):
            parts = s.split("<")
            upper_bound = int(parts[0])
            if optional_clause_count <= upper_bound:
                return result
            result = calculate_min_should_match(
                optional_clause_count, parts[1]
            )
        return result
    if "%" in spec:
        percent = int(spec[: spec.rindex("%")])
        calc = (result * percent) / 100.0
        result = result + int(calc) if calc < 0 else int(calc)
    else:
        calc = int(spec)
        result = result + calc if calc < 0 else calc
    if optional_clause_count < result:
        return optional_clause_count
    return 0 if result < 0 else result


def parse_edismax(
    user_query: str,
    qf: "str | dict[str, float]",
    pf: "str | dict[str, float] | None" = None,
    tie: float = 0.0,
    mm: "int | str" = 0,
    ps: int = 0,
) -> Query:
    """Build the edismax query tree.

    ``mm`` accepts Solr's full spec grammar (string: "75%",
    "2<-25% 9<-3", ...) or an absolute int count; ``ps`` is the pf
    phrase slop (ExtendedDismaxQParser's ps param)."""
    qf_boosts = parse_field_boosts(qf) if isinstance(qf, str) else dict(qf)
    if not qf_boosts:
        raise ValueError("qf must name at least one field")
    pf_boosts = (
        parse_field_boosts(pf) if isinstance(pf, str) else dict(pf or {})
    )
    clauses: list[BooleanClause] = []
    all_terms: list[str] = []
    for mod, chunk in _CHUNK_RE.findall(user_query):
        quoted = chunk.startswith('"')
        text = chunk[1:-1] if quoted else chunk
        sub = _analyzed_query(text)
        if sub is None:
            continue
        if isinstance(sub, TermQuery):
            all_terms.append(sub.term)
        elif isinstance(sub, PhraseQuery):
            all_terms.extend(sub.terms)
        arm = _per_field_dismax(
            {f: sub for f in qf_boosts}, qf_boosts, tie
        )
        if arm is None:
            continue
        occur = (
            Occur.MUST
            if mod == "+"
            else Occur.MUST_NOT
            if mod == "-"
            else Occur.SHOULD
        )
        clauses.append(BooleanClause(occur, arm))
    # pf: whole query as a phrase over each phrase field, SHOULD-boost
    if len(all_terms) >= 2 and pf_boosts:
        phrase = PhraseQuery(
            tuple(all_terms), tuple(range(len(all_terms))), slop=int(ps)
        )
        pf_arm = _per_field_dismax(
            {f: phrase for f in pf_boosts}, pf_boosts, tie
        )
        if pf_arm is not None:
            clauses.append(BooleanClause(Occur.SHOULD, pf_arm))
    if not clauses:
        return MatchNoDocsQuery()
    n_should = sum(1 for c in clauses if c.occur is Occur.SHOULD)
    if isinstance(mm, str):
        msm = calculate_min_should_match(n_should, mm)
    else:
        msm = min(mm, n_should) if mm else 0
    return BooleanQuery(tuple(clauses), minimum_number_should_match=msm)
