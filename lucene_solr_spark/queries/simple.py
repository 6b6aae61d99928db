"""Lucene SimpleQueryParser — the ``{!simple}`` QParser's query language.

Reference: lucene/queryparser/src/java/org/apache/lucene/queryparser/
simple/SimpleQueryParser.java (operator vocabulary at :60-77) and
solr/core/src/java/org/apache/solr/search/SimpleQParserPlugin.java.

Operator surface (each may be disabled via the ``operators`` mask, the
analog of SimpleQParserPlugin's q.operators param):

- ``+``  infix AND            (AND_OPERATOR)
- ``|``  infix OR             (OR_OPERATOR)
- ``-``  prefix NOT           (NOT_OPERATOR)
- ``"…"`` phrase, ``"…"~N`` sloppy phrase  (PHRASE_OPERATOR / NEAR_OPERATOR)
- ``term*`` prefix            (PREFIX_OPERATOR)
- ``term~N`` fuzzy            (FUZZY_OPERATOR)
- ``( … )`` precedence        (PRECEDENCE_OPERATORS)
- ``\\x`` escape              (ESCAPE_OPERATOR)
- whitespace → the default operator (q.op; Lucene default OR)

Precedence follows SimpleQueryParser's tree building: AND binds
tighter than OR (``a | b + c`` ≡ ``a OR (b AND c)``).

Deviation from the reference, documented: SimpleQueryParser never
throws — malformed input degrades to term queries char-by-char.  This
implementation degrades for the common cases (an unmatched ``)`` or a
dangling operator is treated as a literal/ignored) but keeps the parse
strictly linear; exotic degradations (e.g. a ``"`` inside a term) may
tokenize slightly differently.  All well-formed queries match.
"""

from __future__ import annotations

from dataclasses import dataclass

from .query import (
    BooleanClause,
    BooleanQuery,
    FuzzyQuery,
    MatchAllDocsQuery,
    MatchNoDocsQuery,
    Occur,
    PhraseQuery,
    PrefixQuery,
    Query,
    TermQuery,
)

# q.operators flags (SimpleQParserPlugin.OPERATORS)
OP_AND = "AND"
OP_OR = "OR"
OP_NOT = "NOT"
OP_PREFIX = "PREFIX"
OP_PHRASE = "PHRASE"
OP_PRECEDENCE = "PRECEDENCE"
OP_ESCAPE = "ESCAPE"
OP_FUZZY = "FUZZY"
OP_NEAR = "NEAR"
ALL_OPERATORS = frozenset(
    {OP_AND, OP_OR, OP_NOT, OP_PREFIX, OP_PHRASE, OP_PRECEDENCE,
     OP_ESCAPE, OP_FUZZY, OP_NEAR}
)


@dataclass(frozen=True)
class _Tok:
    kind: str  # "term" | "phrase" | "and" | "or" | "not" | "lp" | "rp"
    text: str = ""
    suffix_num: int = -1  # ~N value (fuzzy edits / phrase slop), -1 = none
    prefix: bool = False  # trailing * on a term


def _tokenize(text: str, ops: frozenset[str]) -> list[_Tok]:
    toks: list[_Tok] = []
    i, n = 0, len(text)

    def read_suffix_num(j: int) -> tuple[int, int]:
        # ``~N`` after a term/phrase; bare ``~`` means default (2 edits
        # for fuzzy, 0 slop handled by caller via -2 sentinel)
        if j < n and text[j] == "~":
            k = j + 1
            while k < n and text[k].isdigit():
                k += 1
            if k > j + 1:
                return int(text[j + 1 : k]), k
            return -2, j + 1  # bare ~
        return -1, j

    while i < n:
        c = text[i]
        if c.isspace():
            i += 1
            continue
        if c == "+" and OP_AND in ops:
            toks.append(_Tok("and"))
            i += 1
            continue
        if c == "|" and OP_OR in ops:
            toks.append(_Tok("or"))
            i += 1
            continue
        if c == "-" and OP_NOT in ops:
            toks.append(_Tok("not"))
            i += 1
            continue
        if c == "(" and OP_PRECEDENCE in ops:
            toks.append(_Tok("lp"))
            i += 1
            continue
        if c == ")" and OP_PRECEDENCE in ops:
            toks.append(_Tok("rp"))
            i += 1
            continue
        if c == '"' and OP_PHRASE in ops:
            j = i + 1
            buf: list[str] = []
            while j < n and text[j] != '"':
                if text[j] == "\\" and OP_ESCAPE in ops and j + 1 < n:
                    buf.append(text[j + 1])
                    j += 2
                else:
                    buf.append(text[j])
                    j += 1
            j = min(j + 1, n)  # consume closing quote if present
            num, j = (
                read_suffix_num(j) if OP_NEAR in ops else (-1, j)
            )
            toks.append(_Tok("phrase", "".join(buf), suffix_num=num))
            i = j
            continue
        # term: run of non-special chars (specials only when enabled)
        specials = set(' \t\r\n')
        for flag, chars in (
            (OP_AND, "+"), (OP_OR, "|"), (OP_NOT, "-"),
            (OP_PRECEDENCE, "()"), (OP_PHRASE, '"'),
        ):
            if flag in ops:
                specials.update(chars)
        buf = []
        j = i
        is_prefix = False
        while j < n and text[j] not in specials:
            if text[j] == "\\" and OP_ESCAPE in ops and j + 1 < n:
                buf.append(text[j + 1])
                j += 2
                continue
            if text[j] == "*" and OP_PREFIX in ops:
                # trailing * only; a mid-term * is literal
                if j + 1 >= n or text[j + 1] in specials:
                    is_prefix = True
                    j += 1
                    break
            if text[j] == "~" and OP_FUZZY in ops:
                break
            buf.append(text[j])
            j += 1
        num = -1
        if not is_prefix and OP_FUZZY in ops:
            num, j = read_suffix_num(j)
        if buf or is_prefix:
            toks.append(
                _Tok("term", "".join(buf), suffix_num=num, prefix=is_prefix)
            )
        elif j == i:
            i += 1  # lone special char that produced nothing
            continue
        i = j
    return toks


class _Parser:
    def __init__(
        self, toks: list[_Tok], default_op: Occur, analyze
    ) -> None:
        self.toks = toks
        self.pos = 0
        self.default_op = default_op
        self.analyze = analyze

    def peek(self) -> _Tok | None:
        return self.toks[self.pos] if self.pos < len(self.toks) else None

    def _primary(self) -> tuple[Query | None, bool]:
        """→ (query, negated).  None = token analyzed away / degraded."""
        t = self.peek()
        if t is None:
            return None, False
        if t.kind == "not":
            self.pos += 1
            q, neg = self._primary()
            return q, not neg
        if t.kind == "lp":
            self.pos += 1
            q = self._or_expr()
            nxt = self.peek()
            if nxt is not None and nxt.kind == "rp":
                self.pos += 1
            return q, False
        if t.kind == "rp":
            # unmatched ) — degrade: skip it (the reference treats it
            # as a syntax char with no effect at top level)
            self.pos += 1
            return self._primary()
        if t.kind == "phrase":
            self.pos += 1
            terms, positions = self.analyze(t.text)
            if not terms:
                return None, False
            slop = max(t.suffix_num, 0) if t.suffix_num != -1 else 0
            if len(terms) == 1:
                return TermQuery(terms[0]), False
            return (
                PhraseQuery(tuple(terms), tuple(positions), slop=slop),
                False,
            )
        if t.kind == "term":
            self.pos += 1
            if t.prefix:
                # prefix text is lowercased, not stemmed (the reference
                # sends it through newPrefixQuery on the raw lowercased
                # fragment)
                return PrefixQuery(t.text.lower()), False
            terms, positions = self.analyze(t.text)
            if not terms:
                return None, False
            if t.suffix_num != -1:
                edits = 2 if t.suffix_num == -2 else min(t.suffix_num, 2)
                return FuzzyQuery(terms[0], max_edits=edits), False
            if len(terms) == 1:
                return TermQuery(terms[0]), False
            # one whitespace-free chunk analyzing to several tokens
            # (e.g. synonym-free hyphenation) → phrase, per
            # SimpleQueryParser.newDefaultQuery's analyzeBoolean with
            # positions — phrase is the faithful single-chunk shape
            return PhraseQuery(tuple(terms), tuple(positions)), False
        # operator in clause position (dangling + / |) — degrade: skip
        self.pos += 1
        return self._primary()

    @staticmethod
    def _fold(
        arms: list[tuple[Query, bool]], positive_occur: Occur
    ) -> "tuple[Query, bool] | None":
        """Combine (query, negated) arms into one boolean where negated
        arms become MUST_NOT clauses of the SAME BooleanQuery — the
        reference's buildQueryTree folds '-' into the enclosing boolean
        (``a -b`` → {SHOULD a, MUST_NOT b}), never into a nested
        pure-negative arm."""
        if not arms:
            return None
        if len(arms) == 1:
            return arms[0]
        bc = [
            BooleanClause(Occur.MUST_NOT if neg else positive_occur, q_)
            for q_, neg in arms
        ]
        if all(c.occur is Occur.MUST_NOT for c in bc):
            # pure negation needs a positive leg (the lucene parser's
            # pure-negative handling adds *:*)
            bc.append(BooleanClause(Occur.MUST, MatchAllDocsQuery()))
        return BooleanQuery(tuple(bc)), False

    def _and_expr(self) -> "tuple[Query, bool] | None":
        arms: list[tuple[Query, bool]] = []
        q = self._primary()
        if q[0] is not None:
            arms.append(q)  # type: ignore[arg-type]
        while True:
            t = self.peek()
            explicit_and = t is not None and t.kind == "and"
            implicit = (
                t is not None
                and t.kind in ("term", "phrase", "not", "lp")
                and self.default_op is Occur.MUST
            )
            if not explicit_and and not implicit:
                break
            if explicit_and:
                self.pos += 1
            nxt = self._primary()
            if nxt[0] is not None:
                arms.append(nxt)  # type: ignore[arg-type]
        return self._fold(arms, Occur.MUST)

    def _or_expr(self) -> Query | None:
        arms: list[tuple[Query, bool]] = []
        q = self._and_expr()
        if q is not None:
            arms.append(q)
        while True:
            t = self.peek()
            explicit_or = t is not None and t.kind == "or"
            implicit = (
                t is not None
                and t.kind in ("term", "phrase", "not", "lp")
                and self.default_op is Occur.SHOULD
            )
            if not explicit_or and not implicit:
                break
            if explicit_or:
                self.pos += 1
            nxt = self._and_expr()
            if nxt is not None:
                arms.append(nxt)
        folded = self._fold(arms, Occur.SHOULD)
        if folded is None:
            return None
        q_, neg = folded
        if neg:
            # a lone negated clause at this level (``-a`` or ``(-a)``)
            return BooleanQuery(
                (
                    BooleanClause(Occur.MUST_NOT, q_),
                    BooleanClause(Occur.MUST, MatchAllDocsQuery()),
                )
            )
        return q_


def parse_simple(
    text: str,
    default_op: Occur = Occur.SHOULD,
    operators: "frozenset[str] | set[str]" = ALL_OPERATORS,
    analyze=None,
) -> Query:
    """Parse a SimpleQueryParser expression → Query tree.

    ``default_op`` is q.op (Occur.SHOULD = OR, the Lucene default);
    ``operators`` the enabled-operator mask (q.operators); ``analyze``
    the text analyzer ``str -> (terms, positions)`` (defaults to the
    StandardAnalyzer chain)."""
    if analyze is None:
        from lucene_solr_spark.analysis import analyze_text as analyze
    ops = frozenset(operators)
    toks = _tokenize(text, ops)
    if not toks:
        return MatchNoDocsQuery("empty simple query")
    q = _Parser(toks, default_op, analyze)._or_expr()
    return q if q is not None else MatchNoDocsQuery("all terms analyzed away")
