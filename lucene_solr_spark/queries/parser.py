"""Classic query-parser subset (recursive descent).

Covers the named subset of the reference grammar
(lucene/queryparser/.../classic/QueryParser.jj:78-226,299-313):
terms, AND/OR/NOT/&&/||/!, +/- modifiers, "quoted phrases", grouping
parens, ^boost, trailing-* prefix, ?/* wildcards, [a TO b] / {a TO b}
term ranges, fuzzy~N.  Default operator is OR (SHOULD), like the
reference.  Query-side text runs through the same analyzer as the index
(Lucene analyzes query terms too); a term that analyzes to multiple
tokens becomes a phrase, a stopword term is dropped.
"""

from __future__ import annotations

import re
from collections.abc import Callable

from lucene_solr_spark.analysis import analyze_text
from lucene_solr_spark.queries.query import (
    BooleanClause,
    FieldQuery,
    BooleanQuery,
    BoostQuery,
    FuzzyQuery,
    MatchNoDocsQuery,
    Occur,
    PhraseQuery,
    PrefixQuery,
    Query,
    TermQuery,
    TermRangeQuery,
    WildcardQuery,
)

_TOKEN_RE = re.compile(
    r"""
    \s*(
      \(|\)                              # grouping
    | "(?:[^"\\]|\\.)*"                  # quoted phrase
    | /(?:[^/\\]|\\.)*/                  # /regex/ literal (REGEXPTERM)
    | \[[^\]]*\]|\{[^}]*\}               # term range
    | \&\&|\|\||!                        # symbolic operators
    | \^[0-9.]+                          # boost
    | [+\-]                              # modifiers
    | [^\s()^"]+                         # term (may contain * ?)
    )""",
    re.VERBOSE,
)


def _lex(text: str) -> list[str]:
    out, i = [], 0
    while i < len(text):
        m = _TOKEN_RE.match(text, i)
        if not m:
            break
        out.append(m.group(1))
        i = m.end()
    return out


class _Parser:
    def __init__(
        self,
        tokens: list[str],
        analyze: Callable[[str], tuple[list[str], list[int]]],
        fields: frozenset[str] = frozenset(),
        precedence: bool = False,
    ):
        self.toks = tokens
        self.i = 0
        self.analyze = analyze
        self.fields = fields
        self.precedence = precedence

    def peek(self) -> str | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> str:
        tok = self.toks[self.i]
        self.i += 1
        return tok

    # ------------------------------------------------------------- grammar
    def parse(self) -> Query:
        q = self.query()
        return q

    def query(self) -> Query:
        if self.precedence:
            return self.query_precedence()
        return self.query_classic()

    def query_precedence(self) -> Query:
        """PrecedenceQueryParser semantics (queryparser/flexible/
        precedence/processors/BooleanModifiersQueryNodeProcessor.java):
        AND binds tighter than OR — consecutive AND-joined clauses form
        one MUST group, OR separates SHOULD clauses at the outer level.
        Pinned on TestPrecedenceQueryParser: 'a AND b' → '+a +b',
        'c OR (a AND b)' → 'c (+a +b)', 'a AND NOT b' → '+a -b',
        '((a OR b) AND NOT c) OR d' → '(+(a b) -c) d'."""
        segs: list[list[BooleanClause]] = []
        pend_and = False
        while True:
            tok = self.peek()
            if tok is None or tok == ")":
                break
            if tok in ("AND", "&&"):
                self.next()
                pend_and = True
                continue
            if tok in ("OR", "||"):
                self.next()
                pend_and = False
                continue
            occur = Occur.SHOULD
            if tok in ("NOT", "!"):
                self.next()
                occur = Occur.MUST_NOT
                tok = self.peek()
            elif tok == "+":
                self.next()
                occur = Occur.MUST
                tok = self.peek()
            elif tok == "-":
                self.next()
                occur = Occur.MUST_NOT
                tok = self.peek()
            if tok is None or tok == ")":
                break
            sub = self.atom()
            nxt = self.peek()
            if nxt and nxt.startswith("^"):
                self.next()
                sub = BoostQuery(sub, float(nxt[1:]))
            if sub is None:  # stopword-only clause drops out
                pend_and = False
                continue
            cl = BooleanClause(occur, sub)
            if pend_and and segs:
                seg = segs[-1]
                if seg[-1].occur == Occur.SHOULD:
                    seg[-1] = BooleanClause(Occur.MUST, seg[-1].query)
                if cl.occur == Occur.SHOULD:
                    cl = BooleanClause(Occur.MUST, cl.query)
                seg.append(cl)
            else:
                segs.append([cl])
            pend_and = False
        if not segs:
            return MatchNoDocsQuery("empty query")
        outs: list[BooleanClause] = []
        for seg in segs:
            if len(seg) == 1:
                outs.append(seg[0])
            else:
                outs.append(
                    BooleanClause(Occur.SHOULD, BooleanQuery(tuple(seg)))
                )
        if len(outs) == 1 and outs[0].occur in (Occur.SHOULD, Occur.MUST):
            return outs[0].query
        return BooleanQuery(tuple(outs))

    def query_classic(self) -> Query:
        """Clause list with Lucene's addClause conjunction semantics
        (queryparser/classic/QueryParserBase.java addClause)."""
        clauses: list[BooleanClause] = []
        conj = None  # None | "AND" | "OR"
        while True:
            tok = self.peek()
            if tok is None or tok == ")":
                break
            if tok in ("AND", "&&"):
                self.next()
                conj = "AND"
                continue
            if tok in ("OR", "||"):
                self.next()
                conj = "OR"
                continue
            occur = Occur.SHOULD
            if tok in ("NOT", "!"):
                self.next()
                occur = Occur.MUST_NOT
                tok = self.peek()
            elif tok == "+":
                self.next()
                occur = Occur.MUST
                tok = self.peek()
            elif tok == "-":
                self.next()
                occur = Occur.MUST_NOT
                tok = self.peek()
            if tok is None or tok == ")":
                break
            sub = self.atom()
            # boost suffix
            nxt = self.peek()
            if nxt and nxt.startswith("^"):
                self.next()
                sub = BoostQuery(sub, float(nxt[1:]))
            if conj == "AND":
                if occur == Occur.SHOULD:
                    occur = Occur.MUST
                # promote the previous SHOULD clause to MUST (Lucene does this)
                if clauses and clauses[-1].occur == Occur.SHOULD:
                    clauses[-1] = BooleanClause(Occur.MUST, clauses[-1].query)
            conj = None
            if sub is not None:
                clauses.append(BooleanClause(occur, sub))
        if not clauses:
            return MatchNoDocsQuery("empty query")
        if len(clauses) == 1 and clauses[0].occur in (Occur.SHOULD, Occur.MUST):
            return clauses[0].query
        return BooleanQuery(tuple(clauses))

    def atom(self) -> Query | None:
        tok = self.next()
        if tok == "(":
            q = self.query()
            if self.peek() == ")":
                self.next()
            return q
        if tok.startswith('"'):
            text = tok[1:-1]
            terms, positions = self.analyze(text)
            slop = 0
            nxt = self.peek()
            if nxt and re.fullmatch(r"~\d+", nxt):  # "..."~N sloppy phrase
                self.next()
                slop = int(nxt[1:])
            if not terms:
                return None
            if len(terms) == 1:
                return TermQuery(terms[0])
            return PhraseQuery(tuple(terms), tuple(positions), slop)
        if tok.startswith("[") or tok.startswith("{"):
            inc_lo = tok.startswith("[")
            inc_hi = tok.endswith("]")
            body = tok[1:-1].strip()
            m = re.match(r"(\S+)\s+TO\s+(\S+)", body, re.IGNORECASE)
            if not m:
                return None
            lo = None if m.group(1) == "*" else m.group(1).lower()
            hi = None if m.group(2) == "*" else m.group(2).lower()
            return TermRangeQuery(lo, hi, inc_lo, inc_hi)
        # field:term syntax (queryparser/classic/QueryParser.jj Clause
        # rule).  A KNOWN field name wraps the sub-query in FieldQuery;
        # an unknown prefix is stripped (legacy single-field behavior).
        if ":" in tok and not tok.startswith("http"):
            prefix, rest = tok.split(":", 1)
            if self.fields and prefix in self.fields:
                if rest:
                    sub = self._term_like(rest)
                else:  # field:"quoted phrase" lexes as two tokens
                    nxt = self.peek()
                    sub = self.atom() if nxt is not None and nxt != ")" else None
                return FieldQuery(prefix, sub) if sub is not None else None
            tok = rest
        return self._term_like(tok)

    def _term_like(self, tok: str) -> Query | None:
        # /regex/ literal (QueryParserBase.handleBareTokenQuery REGEXPTERM
        # — the reference's lucene parser builds a RegexpQuery; body is
        # NOT analyzed, matching whole terms via the automaton)
        if len(tok) >= 2 and tok.startswith("/") and tok.endswith("/"):
            from lucene_solr_spark.queries.query import RegexpQuery

            return RegexpQuery(tok[1:-1])
        # fuzzy
        m = re.match(r"(.+)~(\d*)$", tok)
        if m and "*" not in tok and "?" not in tok:
            base = m.group(1).lower()
            edits = int(m.group(2)) if m.group(2) else 2
            return FuzzyQuery(base, edits)
        if tok.endswith("*") and "*" not in tok[:-1] and "?" not in tok:
            return PrefixQuery(tok[:-1].lower())
        if "*" in tok or "?" in tok:
            return WildcardQuery(tok.lower())
        terms, positions = self.analyze(tok)
        if not terms:
            return None  # stopword-only term drops out
        if len(terms) == 1:
            return TermQuery(terms[0])
        return PhraseQuery(tuple(terms), tuple(positions))


def parse_query(
    text: str,
    analyze: Callable[[str], tuple[list[str], list[int]]] = analyze_text,
    fields: frozenset[str] | set[str] = frozenset(),
) -> Query:
    """Parse classic query syntax → Query tree (not yet rewritten).

    ``fields``: known field names — ``name:term`` with a known name
    produces ``FieldQuery(name, ...)``; unknown prefixes are stripped
    (single-field compatibility)."""
    return _Parser(_lex(text), analyze, frozenset(fields)).parse()


def parse_flexible_query(
    text: str,
    analyze: Callable[[str], tuple[list[str], list[int]]] = analyze_text,
    fields: frozenset[str] | set[str] = frozenset(),
) -> Query:
    """The flexible StandardQueryParser surface
    (queryparser/flexible/standard/StandardQueryParser.java).

    At the reference's 7.x behavior the flexible parser is a
    reimplementation of the classic grammar with IDENTICAL semantics
    for everything this engine's subset covers (same default-OR, same
    addClause conjunction promotion, same modifiers/boosts/ranges/
    fuzzy/wildcards), so this is a documented alias of parse_query.
    Known deltas OUTSIDE the subset, for migrators: the flexible
    parser's pluggable processor pipeline (custom QueryNodeProcessors),
    numeric PointsConfig fields, and interval functions (8.x+) are not
    part of the classic subset here — use the engine's typed query
    objects for those."""
    return parse_query(text, analyze, fields)


def parse_precedence_query(
    text: str,
    analyze: Callable[[str], tuple[list[str], list[int]]] = analyze_text,
    fields: frozenset[str] | set[str] = frozenset(),
) -> Query:
    """PrecedenceQueryParser (queryparser/flexible/precedence/): same
    grammar, but AND binds tighter than OR — 'a AND b OR c' parses as
    '(+a +b) c' instead of classic's '+a +b c'."""
    return _Parser(
        _lex(text), analyze, frozenset(fields), precedence=True
    ).parse()
