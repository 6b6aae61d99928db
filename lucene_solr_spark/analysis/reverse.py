"""ReverseStringFilter / ReversedWildcardFilter — the leading-wildcard
accelerator.

Refs:
- lucene/analysis/common/src/java/org/apache/lucene/analysis/reverse/
  ReverseStringFilter.java:60-112 (reverse every token, optional marker
  char appended BEFORE the reversal so it ends up as a prefix).
- solr/core/src/java/org/apache/solr/analysis/ReversedWildcardFilter
  .java:40-80 (withOriginal=true emits the REVERSED token first, then
  the original at positionIncrement 0 — both share the position).
- solr/core/src/java/org/apache/solr/analysis/
  ReversedWildcardFilterFactory.java:95-135 (shouldReverse — the
  query-time policy rule) and solr/core/src/java/org/apache/solr/
  parser/SolrQueryParserBase.java:1081-1099 (the automaton rewrite:
  reversed branch = reverse(pattern + marker); non-reversed branch
  must SUBTRACT marker-prefixed terms, the false positives that the
  doubled index would otherwise match).

Why this matters at 10^12 docs: a leading wildcard ``*suffix`` against
the term dictionary is otherwise a full-vocabulary regex scan per
query.  With reversed-marked terms persisted in the dictionary, the
rewrite turns it into ``term LIKE '\\x01xiffus%'`` — a sargable
StartsWith that reaches the parquet scan as a PushedFilter (range
pruning on the sorted dictionary), exactly the BlockTree seekCeil the
reference gets from its reversed terms.

The reference's surrogate-pair juggling in reverse() is a UTF-16
buffer artifact; Python strings are codepoint sequences, so ``s[::-1]``
reverses codepoints and keeps every supplementary character intact —
verified against the reference's own si\U0001D11Ex test vector.
"""

from __future__ import annotations

START_OF_HEADING_MARKER = ""


def reverse_str(s: str) -> str:
    """Codepoint-safe reverse (ReverseStringFilter.reverse)."""
    return s[::-1]


def reverse_marked(token: str, marker: str = START_OF_HEADING_MARKER) -> str:
    """Marker appended, then the whole buffer reversed — so the marker
    becomes the leading char (ReverseStringFilter.incrementToken)."""
    return reverse_str(token + marker)


def reversed_wildcard_tokens(
    tokens: list[str],
    with_original: bool = True,
    marker: str = START_OF_HEADING_MARKER,
) -> list[tuple[str, int]]:
    """Index-time ReversedWildcardFilter over one doc's token list.

    Returns (term, position) pairs.  withOriginal=True emits the
    reversed token first and the original at the SAME position
    (positionIncrement 0 on the second, ReversedWildcardFilter.java:
    54-69); zero-length tokens pass through unreversed (:61-62).
    """
    out: list[tuple[str, int]] = []
    for pos, tok in enumerate(tokens):
        if len(tok) == 0:
            out.append((tok, pos))
            continue
        out.append((reverse_marked(tok, marker), pos))
        if with_original:
            out.append((tok, pos))
    return out


def should_reverse(
    token: str,
    max_pos_asterisk: int = 2,
    max_pos_question: int = 1,
    min_trailing: int = 2,
    max_fraction_asterisk: float = 0.0,
) -> bool:
    """ReversedWildcardFilterFactory.shouldReverse:95-135 — reverse the
    query when the wildcard sits near the FRONT of the pattern (where
    the forward dictionary scan is unbounded) and enough literal
    trailing characters remain to make the reversed prefix selective."""
    pos_q = token.find("?")
    pos_a = token.find("*")
    if pos_q == -1 and pos_a == -1:
        return False  # not a wildcard query
    last_pos = max(token.rfind("?"), token.rfind("*"))
    if pos_q != -1:
        pos = min(pos_q, pos_a) if pos_a != -1 else pos_q
    else:
        pos = pos_a
    if len(token) - last_pos < min_trailing:
        return False
    if pos_q != -1 and pos_q < max_pos_question:
        return True
    if pos_a != -1 and pos_a < max_pos_asterisk:
        return True
    if max_fraction_asterisk > 0.0 and pos < len(token) * max_fraction_asterisk:
        return True
    return False


def rewrite_wildcard(
    pattern: str, marker: str = START_OF_HEADING_MARKER
) -> str:
    """The reversed-branch automaton rewrite (SolrQueryParserBase.java:
    1088-1090): concatenate the marker then reverse.  ``*`` / ``?`` are
    single symbols, so reversing the pattern STRING reverses the
    automaton: ``*ion`` → ``\\x01noi*``."""
    return reverse_str(pattern + marker)


def sargable_prefix(pattern: str) -> str:
    """Leading literal run of a wildcard pattern — the part a term
    dictionary range scan can push down (WildcardQuery.java's automaton
    common prefix)."""
    out = []
    for ch in pattern:
        if ch in "*?":
            break
        out.append(ch)
    return "".join(out)
