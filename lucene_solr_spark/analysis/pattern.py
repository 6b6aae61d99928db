"""Pattern-based tokenizer and filters.

References:
- analysis/pattern/PatternTokenizer.java — group=-1 splits on the
  pattern (empty tokens dropped); group>=0 emits that capture group of
  every match.
- analysis/pattern/PatternReplaceFilter.java — per-token regex
  replace (all or first).
- analysis/pattern/PatternReplaceCharFilter.java — pre-tokenize text
  replace.
- analysis/pattern/PatternCaptureGroupTokenFilter.java:76-180 —
  emits every non-empty capture group of every match of every pattern,
  ordered by start offset (ties: earlier pattern), all at the same
  position; preserveOriginal keeps the input token first and skips a
  group spanning the whole token.
- analysis/pattern/SimplePattern{Split,}Tokenizer.java — the
  non-backtracking variants; for the regex subset used here the
  semantics coincide with the Pattern forms.

Verified on TestPatternTokenizer / TestPatternCaptureGroupTokenFilter
vectors (tests/test_pattern.py).
"""

from __future__ import annotations

import re


def pattern_tokenize(text: str, pattern: str, group: int = -1) -> list[str]:
    """PatternTokenizer: split (group=-1, empties dropped) or emit the
    capture group of each match (group>=0)."""
    rx = re.compile(pattern)
    if group >= 0:
        return [
            m.group(group)
            for m in rx.finditer(text)
            if m.group(group)
        ]
    return [t for t in rx.split(text) if t]


def pattern_replace(token: str, pattern: str, replacement: str,
                    replace_all: bool = True) -> str:
    """PatternReplaceFilter: regex replace within one token."""
    return re.sub(pattern, replacement, token,
                  count=0 if replace_all else 1)


def pattern_replace_char(text: str, pattern: str,
                         replacement: str) -> str:
    """PatternReplaceCharFilter: replace across the whole pre-tokenize
    text (offset correction is positional here — tokens downstream
    carry ordinal positions, not char offsets)."""
    return re.sub(pattern, replacement, text)


def pattern_capture(token: str, patterns, preserve_original: bool
                    ) -> list[str]:
    """PatternCaptureGroupTokenFilter: all capture groups of all
    patterns in start-offset order (ties to the earlier pattern)."""
    per_matcher: list[list[tuple[int, int]]] = []
    n = len(token)
    for pat in patterns:
        spans = []
        for m in re.compile(pat).finditer(token):
            for g in range(1, (m.re.groups or 0) + 1):
                s, e = m.start(g), m.end(g)
                if s == e or s < 0:
                    continue
                if preserve_original and s == 0 and e == n:
                    continue
                spans.append((s, e))
        per_matcher.append(spans)
    heads = [0] * len(per_matcher)
    out: list[str] = []
    while True:
        best = -1
        best_start = None
        for i, spans in enumerate(per_matcher):
            if heads[i] < len(spans):
                s = spans[heads[i]][0]
                if best_start is None or s < best_start:
                    best_start = s
                    best = i
        if best == -1:
            break
        s, e = per_matcher[best][heads[best]]
        heads[best] += 1
        out.append(token[s:e])
    if preserve_original:
        return [token] + out
    return out if out else [token]


# the documented camelCase configuration
# (PatternCaptureGroupTokenFilter.java:56-67)
CAMEL_CASE_PATTERNS = (
    r"([A-Z]{2,})",
    r"(?<![A-Z])([A-Z][a-z]+)",
    r"(?:^|\b|(?<=[0-9_])|(?<=[A-Z]{2}))([a-z]+)",
    r"([0-9]+)",
)


def camel_case_capture(token: str,
                       preserve_original: bool = True) -> list[str]:
    return pattern_capture(token, CAMEL_CASE_PATTERNS,
                           preserve_original)
