"""Full Lucene RegExp grammar (util/automaton/RegExp.java, flags=ALL):
beyond the Java-regex-compatible core (union, concat, ?, *, +, {n,m},
char classes, '.', groups, escapes, "quoted"), the Lucene-specific
operators — ``~e`` complement, ``e&f`` intersection, ``<n-m>`` numeric
intervals, ``@`` any-string, ``#`` empty-language — compiled exactly
as the reference does: RegExp → NFA → DFA (subset construction), with
complement via completed-DFA accept-flip and intersection via the
product construction (util/automaton/Operations.java).

Precedence, verbatim from RegExp.java:1026-1106: union < intersection
< concatenation < repetition < complement < char-class < simple.
``<n-m>`` follows Automata.makeDecimalInterval: equal-width bounds fix
the digit count, otherwise any number of leading zeros is accepted.
Named automata ``<identifier>`` (RegExp.AUTOMATON) need a provider map
and raise here, like a reference build without one.

Matching is anchored whole-term (RegexpQuery semantics).  At scale the
DFA walk runs as a vocabulary-bounded Arrow batch over the pushed-down
term dictionary — the same cost class as the reference's
CompiledAutomaton intersection with the terms enum.
"""

from __future__ import annotations

from dataclasses import dataclass, field

MAX_CP = 0x10FFFF


# --------------------------------------------------------------------- NFA

@dataclass
class _Nfa:
    # transitions[state] = list of (lo, hi, dest); eps[state] = [dest]
    transitions: list = field(default_factory=list)
    eps: list = field(default_factory=list)
    start: int = 0
    accept: int = 0

    def new_state(self) -> int:
        self.transitions.append([])
        self.eps.append([])
        return len(self.transitions) - 1


def _nfa_empty_language() -> _Nfa:
    n = _Nfa()
    s, a = n.new_state(), n.new_state()
    n.start, n.accept = s, a  # no path start→accept
    return n


def _nfa_string(s: str) -> _Nfa:
    n = _Nfa()
    cur = n.new_state()
    n.start = cur
    for ch in s:
        nxt = n.new_state()
        n.transitions[cur].append((ord(ch), ord(ch), nxt))
        cur = nxt
    n.accept = cur
    return n


def _nfa_ranges(ranges: list[tuple[int, int]]) -> _Nfa:
    n = _Nfa()
    s, a = n.new_state(), n.new_state()
    for lo, hi in ranges:
        n.transitions[s].append((lo, hi, a))
    n.start, n.accept = s, a
    return n


def _copy_into(dst: _Nfa, src: _Nfa) -> tuple[int, int]:
    off = len(dst.transitions)
    for trans in src.transitions:
        dst.transitions.append([(lo, hi, t + off) for lo, hi, t in trans])
    for es in src.eps:
        dst.eps.append([t + off for t in es])
    return src.start + off, src.accept + off


def _nfa_concat(a: _Nfa, b: _Nfa) -> _Nfa:
    n = _Nfa()
    s1, a1 = _copy_into(n, a)
    s2, a2 = _copy_into(n, b)
    n.eps[a1].append(s2)
    n.start, n.accept = s1, a2
    return n


def _nfa_union(a: _Nfa, b: _Nfa) -> _Nfa:
    n = _Nfa()
    s = n.new_state()
    acc = n.new_state()
    s1, a1 = _copy_into(n, a)
    s2, a2 = _copy_into(n, b)
    n.eps[s] += [s1, s2]
    n.eps[a1].append(acc)
    n.eps[a2].append(acc)
    n.start, n.accept = s, acc
    return n


def _nfa_star(a: _Nfa) -> _Nfa:
    n = _Nfa()
    s = n.new_state()
    acc = n.new_state()
    s1, a1 = _copy_into(n, a)
    n.eps[s] += [s1, acc]
    n.eps[a1] += [s1, acc]
    n.start, n.accept = s, acc
    return n


def _nfa_optional(a: _Nfa) -> _Nfa:
    return _nfa_union(a, _nfa_string(""))


def _nfa_repeat(a: _Nfa, n_min: int, n_max: int | None) -> _Nfa:
    out = _nfa_string("")
    for _ in range(n_min):
        out = _nfa_concat(out, a)
    if n_max is None:
        out = _nfa_concat(out, _nfa_star(a))
    else:
        for _ in range(n_max - n_min):
            out = _nfa_concat(out, _nfa_optional(a))
    return out


# --------------------------------------------------------------------- DFA

@dataclass
class Dfa:
    """transitions[state] = sorted list of (lo, hi, dest); accepting set."""

    transitions: list
    accepting: frozenset
    start: int

    def matches(self, s: str) -> bool:
        st = self.start
        for ch in s:
            cp = ord(ch)
            nxt = -1
            for lo, hi, d in self.transitions[st]:
                if lo <= cp <= hi:
                    nxt = d
                    break
            if nxt < 0:
                return False
            st = nxt
        return st in self.accepting


def _eclose(nfa: _Nfa, states: frozenset) -> frozenset:
    out = set(states)
    stack = list(states)
    while stack:
        s = stack.pop()
        for t in nfa.eps[s]:
            if t not in out:
                out.add(t)
                stack.append(t)
    return frozenset(out)


def _determinize(nfa: _Nfa) -> Dfa:
    start = _eclose(nfa, frozenset([nfa.start]))
    index = {start: 0}
    trans: list[list] = [[]]
    work = [start]
    while work:
        cur = work.pop()
        ci = index[cur]
        # alphabet partition from the outgoing range boundaries
        bounds = set()
        for s in cur:
            for lo, hi, _ in nfa.transitions[s]:
                bounds.add(lo)
                bounds.add(hi + 1)
        cuts = sorted(bounds)
        for i, lo in enumerate(cuts):
            hi = (cuts[i + 1] - 1) if i + 1 < len(cuts) else MAX_CP
            if lo > MAX_CP:
                continue
            dest = set()
            for s in cur:
                for tlo, thi, t in nfa.transitions[s]:
                    if tlo <= lo and hi <= thi:
                        dest.add(t)
                    elif tlo <= lo <= thi:
                        # partial overlap can't happen after cutting at
                        # boundaries, but keep the guard tight
                        dest.add(t)
            if not dest:
                continue
            dd = _eclose(nfa, frozenset(dest))
            if dd not in index:
                index[dd] = len(trans)
                trans.append([])
                work.append(dd)
            trans[ci].append((lo, hi, index[dd]))
    accepting = frozenset(
        i for st, i in index.items() if nfa.accept in st
    )
    for row in trans:
        row.sort()
    return Dfa(trans, accepting, 0)


def _complete(dfa: Dfa) -> Dfa:
    """Add a sink so every state covers [0, MAX_CP]."""
    trans = [list(row) for row in dfa.transitions]
    sink = len(trans)
    trans.append([(0, MAX_CP, sink)])
    for si in range(len(trans) - 1):
        row = sorted(trans[si])
        out = []
        cur = 0
        for lo, hi, d in row:
            if lo > cur:
                out.append((cur, lo - 1, sink))
            out.append((lo, hi, d))
            cur = hi + 1
        if cur <= MAX_CP:
            out.append((cur, MAX_CP, sink))
        trans[si] = out
    return Dfa(trans, dfa.accepting, dfa.start)


def _complement(dfa: Dfa) -> Dfa:
    c = _complete(dfa)
    acc = frozenset(
        i for i in range(len(c.transitions)) if i not in c.accepting
    )
    return Dfa(c.transitions, acc, c.start)


def _intersect(a: Dfa, b: Dfa) -> Dfa:
    a, b = _complete(a), _complete(b)
    index: dict[tuple[int, int], int] = {(a.start, b.start): 0}
    trans: list[list] = [[]]
    work = [(a.start, b.start)]
    while work:
        sa, sb = work.pop()
        ci = index[(sa, sb)]
        for alo, ahi, ad in a.transitions[sa]:
            for blo, bhi, bd in b.transitions[sb]:
                lo, hi = max(alo, blo), min(ahi, bhi)
                if lo > hi:
                    continue
                key = (ad, bd)
                if key not in index:
                    index[key] = len(trans)
                    trans.append([])
                    work.append(key)
                trans[ci].append((lo, hi, index[key]))
    acc = frozenset(
        i
        for (sa, sb), i in index.items()
        if sa in a.accepting and sb in b.accepting
    )
    for row in trans:
        row.sort()
    return Dfa(trans, acc, 0)


def _dfa_to_nfa(dfa: Dfa) -> _Nfa:
    """Re-embed a DFA (complement/intersection result) as an NFA
    fragment with a single accept via epsilon edges."""
    n = _Nfa()
    for _ in range(len(dfa.transitions)):
        n.new_state()
    acc = n.new_state()
    for si, row in enumerate(dfa.transitions):
        n.transitions[si] = list(row)
        if si in dfa.accepting:
            n.eps[si].append(acc)
    n.start, n.accept = dfa.start, acc
    return n


# ------------------------------------------------------------------ parser

def _digit_range_patterns(lo: str, hi: str) -> list[str]:
    """Regex alternatives (digits/classes only) matching integers in
    [lo, hi] written WITHOUT leading zeros beyond the value itself —
    the classic digit-range expansion."""

    def rng(a: int, b: int) -> str:
        return f"[{a}-{b}]" if a != b else str(a)

    def expand(lo: str, hi: str) -> list[str]:
        if len(lo) < len(hi):
            out = []
            # numbers with the same width as lo, up to all-9s
            out += expand(lo, "9" * len(lo))
            # widths strictly between
            for w in range(len(lo) + 1, len(hi)):
                out.append("[1-9]" + "[0-9]" * (w - 1))
            out += expand("1" + "0" * (len(hi) - 1), hi)
            return out
        # equal width
        if lo == hi:
            return [lo]
        if len(lo) == 1:
            return [rng(int(lo), int(hi))]
        if lo[0] == hi[0]:
            return [lo[0] + p for p in expand(lo[1:], hi[1:])]
        out = []
        n = len(lo)
        if lo[1:] == "0" * (n - 1) and hi[1:] == "9" * (n - 1):
            return [rng(int(lo[0]), int(hi[0])) + "[0-9]" * (n - 1)]
        # lo's leading digit up to its ceiling
        out += [lo[0] + p for p in expand(lo[1:], "9" * (n - 1))]
        if int(hi[0]) - int(lo[0]) > 1:
            out.append(
                rng(int(lo[0]) + 1, int(hi[0]) - 1) + "[0-9]" * (n - 1)
            )
        out += [hi[0] + p for p in expand("0" * (n - 1), hi[1:])]
        return out

    return expand(lo, hi)


class LuceneRegExp:
    """Parser per RegExp.java:1026-1180 → DFA."""

    def __init__(self, pattern: str):
        self.s = pattern
        self.pos = 0
        nfa = self._union_exp()
        if self.pos != len(self.s):
            raise ValueError(f"unexpected char at position {self.pos}")
        self.dfa = _determinize(nfa)

    def matches(self, term: str) -> bool:
        return self.dfa.matches(term)

    # -- grammar ----------------------------------------------------------

    def _more(self) -> bool:
        return self.pos < len(self.s)

    def _peek(self, chars: str) -> bool:
        return self._more() and self.s[self.pos] in chars

    def _match(self, ch: str) -> bool:
        if self._peek(ch):
            self.pos += 1
            return True
        return False

    def _union_exp(self) -> _Nfa:
        e = self._inter_exp()
        if self._match("|"):
            e = _nfa_union(e, self._union_exp())
        return e

    def _inter_exp(self) -> _Nfa:
        e = self._concat_exp()
        if self._match("&"):
            d = _intersect(_determinize(e), _determinize(self._inter_exp()))
            e = _dfa_to_nfa(d)
        return e

    def _concat_exp(self) -> _Nfa:
        e = self._repeat_exp()
        if self._more() and not self._peek(")|") and not self._peek("&"):
            e = _nfa_concat(e, self._concat_exp())
        return e

    def _repeat_exp(self) -> _Nfa:
        e = self._compl_exp()
        while self._peek("?*+{"):
            if self._match("?"):
                e = _nfa_optional(e)
            elif self._match("*"):
                e = _nfa_star(e)
            elif self._match("+"):
                e = _nfa_concat(e, _nfa_star(e))
            elif self._match("{"):
                start = self.pos
                while self._peek("0123456789"):
                    self.pos += 1
                if start == self.pos:
                    raise ValueError(f"integer expected at {self.pos}")
                n = int(self.s[start : self.pos])
                m: int | None = n
                if self._match(","):
                    start = self.pos
                    while self._peek("0123456789"):
                        self.pos += 1
                    m = int(self.s[start : self.pos]) if start != self.pos else None
                if not self._match("}"):
                    raise ValueError(f"expected '}}' at {self.pos}")
                e = _nfa_repeat(e, n, m)
        return e

    def _compl_exp(self) -> _Nfa:
        if self._match("~"):
            return _dfa_to_nfa(_complement(_determinize(self._compl_exp())))
        return self._char_class_exp()

    def _char_class_exp(self) -> _Nfa:
        if self._match("["):
            negate = self._match("^")
            ranges: list[tuple[int, int]] = []
            while self._more() and not self._peek("]"):
                c1 = self._char_exp()
                if self._peek("-"):
                    save = self.pos
                    self.pos += 1
                    if self._peek("]"):
                        self.pos = save
                        ranges.append((c1, c1))
                    else:
                        c2 = self._char_exp()
                        ranges.append((min(c1, c2), max(c1, c2)))
                else:
                    ranges.append((c1, c1))
            if not self._match("]"):
                raise ValueError(f"expected ']' at {self.pos}")
            if negate:
                d = _intersect(
                    _determinize(_nfa_ranges([(0, MAX_CP)])),
                    _complement(_determinize(_nfa_ranges(ranges))),
                )
                return _dfa_to_nfa(d)
            return _nfa_ranges(ranges)
        return self._simple_exp()

    def _simple_exp(self) -> _Nfa:
        if self._match("."):
            return _nfa_ranges([(0, MAX_CP)])
        if self._match("#"):
            return _nfa_empty_language()
        if self._match("@"):
            return _nfa_star(_nfa_ranges([(0, MAX_CP)]))
        if self._match('"'):
            start = self.pos
            while self._more() and not self._peek('"'):
                self.pos += 1
            if not self._match('"'):
                raise ValueError(f'expected closing quote at {self.pos}')
            return _nfa_string(self.s[start : self.pos - 1])
        if self._match("("):
            if self._match(")"):
                return _nfa_string("")
            e = self._union_exp()
            if not self._match(")"):
                raise ValueError(f"expected ')' at {self.pos}")
            return e
        if self._match("<"):
            start = self.pos
            while self._more() and not self._peek(">"):
                self.pos += 1
            if not self._match(">"):
                raise ValueError(f"expected '>' at {self.pos}")
            body = self.s[start : self.pos - 1]
            i = body.find("-")
            if i <= 0 or i == len(body) - 1 or i != body.rfind("-"):
                raise ValueError(
                    "named automata <id> need a provider "
                    "(RegExp.AUTOMATON); only <min-max> intervals here"
                )
            smin, smax = body[:i], body[i + 1 :]
            imin, imax = int(smin), int(smax)
            if imin > imax:
                imin, imax = imax, imin
            fixed = len(smin) if len(smin) == len(smax) else 0
            if fixed:
                alts = [
                    p.rjust(fixed, "0")
                    for p in []
                ]
                # fixed width: pad every alternative to exactly `fixed`
                pats = _digit_range_patterns(str(imin), str(imax))
                nfa: _Nfa | None = None
                for p in pats:
                    width = _pattern_width(p)
                    padded = "0" * (fixed - width) + p
                    sub = LuceneRegExp._class_only(padded)
                    nfa = sub if nfa is None else _nfa_union(nfa, sub)
                return nfa if nfa is not None else _nfa_empty_language()
            # free width: any number of leading zeros
            pats = _digit_range_patterns(str(imin), str(imax))
            nfa = None
            for p in pats:
                sub = LuceneRegExp._class_only(p)
                nfa = sub if nfa is None else _nfa_union(nfa, sub)
            zeros = _nfa_star(_nfa_ranges([(ord("0"), ord("0"))]))
            return _nfa_concat(zeros, nfa)
        return _nfa_ranges([(self._char_exp(),) * 2])

    @staticmethod
    def _class_only(pattern: str) -> _Nfa:
        """Compile a digit-range alternative (digits + [a-b] classes)."""
        n = _nfa_string("")
        i = 0
        while i < len(pattern):
            if pattern[i] == "[":
                j = pattern.index("]", i)
                lo, hi = pattern[i + 1], pattern[j - 1]
                n = _nfa_concat(n, _nfa_ranges([(ord(lo), ord(hi))]))
                i = j + 1
            else:
                n = _nfa_concat(
                    n, _nfa_ranges([(ord(pattern[i]), ord(pattern[i]))])
                )
                i += 1
        return n

    def _char_exp(self) -> int:
        if self._match("\\"):
            if not self._more():
                raise ValueError("trailing backslash")
        ch = self.s[self.pos]
        self.pos += 1
        return ord(ch)


def _pattern_width(p: str) -> int:
    """Character count matched by a digit-range alternative."""
    w = 0
    i = 0
    while i < len(p):
        if p[i] == "[":
            i = p.index("]", i) + 1
        else:
            i += 1
        w += 1
    return w


def regexp_matches(pattern: str, term: str) -> bool:
    """One-shot anchored match (compile-per-call; cache LuceneRegExp
    for dictionaries)."""
    return LuceneRegExp(pattern).matches(term)
