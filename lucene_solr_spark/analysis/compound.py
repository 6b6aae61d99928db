"""DictionaryCompoundWordTokenFilter — compound-word decomposition.

Ref: lucene/analysis/common/src/java/org/apache/lucene/analysis/
compound/DictionaryCompoundWordTokenFilter.java (decompose: every
start offset, subword lengths min..max, dictionary membership;
onlyLongestMatch keeps one per start) over CompoundWordTokenFilterBase
(only tokens >= minWordSize decompose; the ORIGINAL token is always
emitted first; every subword shares the original's position —
posIncrement 0 — and offsets).

Spark shape: decomposition is per-token pure Python over the
analyzer's token arrays inside the existing Arrow-batched analyze UDF
(a bounded O(len·maxSubword) scan against a broadcast frozenset
dictionary), so the stage rides the same mapInArrow pass as
tokenize/stem — no extra shuffle, no per-row Python in the plan.
"""

from __future__ import annotations

import pandas as pd

DEFAULT_MIN_WORD_SIZE = 5
DEFAULT_MIN_SUBWORD_SIZE = 2
DEFAULT_MAX_SUBWORD_SIZE = 15


def decompose(
    token: str,
    dictionary: frozenset,
    min_word_size: int = DEFAULT_MIN_WORD_SIZE,
    min_subword_size: int = DEFAULT_MIN_SUBWORD_SIZE,
    max_subword_size: int = DEFAULT_MAX_SUBWORD_SIZE,
    only_longest_match: bool = False,
) -> list[str]:
    """Subwords of ``token`` found in ``dictionary`` (lowercased
    membership, original-case emission — CharArraySet ignoreCase).
    The original token is NOT included; callers emit it first."""
    n = len(token)
    if n < min_word_size:
        return []
    low = token.lower()
    out: list[str] = []
    for i in range(0, n - min_subword_size + 1):
        longest = -1
        for j in range(min_subword_size, max_subword_size + 1):
            if i + j > n:
                break
            if low[i: i + j] in dictionary:
                if only_longest_match:
                    longest = j
                else:
                    out.append(token[i: i + j])
        if only_longest_match and longest > 0:
            out.append(token[i: i + longest])
    return out


def decompose_tokens(
    terms: list[str],
    positions: list[int],
    dictionary: frozenset,
    **kw,
) -> tuple[list[str], list[int]]:
    """Expand one doc's (terms, positions) arrays: each original token
    followed by its subwords AT THE SAME POSITION (posIncrement 0)."""
    out_t: list[str] = []
    out_p: list[int] = []
    for t, p in zip(terms, positions):
        out_t.append(t)
        out_p.append(p)
        for sub in decompose(t, dictionary, **kw):
            out_t.append(sub)
            out_p.append(p)
    return out_t, out_p


def decompose_batch(
    terms_col: pd.Series, positions_col: pd.Series, dictionary: frozenset, **kw
) -> tuple[pd.Series, pd.Series]:
    """Vectorized batch form over the analyzer's array columns."""
    ts, ps = [], []
    for terms, poss in zip(terms_col, positions_col):
        t, p = decompose_tokens(list(terms), list(poss), dictionary, **kw)
        ts.append(t)
        ps.append(p)
    return pd.Series(ts), pd.Series(ps)


# ---------------------------------------------------------------------------
# HyphenationCompoundWordTokenFilter — Liang hyphenation + dictionary
# check.  Refs: compound/HyphenationCompoundWordTokenFilter.java:134-201
# (the decompose loop over hyphenation points with the min/max subword
# window, the genitive partLength-1 fallback, onlyLongestMatch) and
# compound/hyphenation/HyphenationTree.java:302-390 (Liang's algorithm:
# '.'-padded word, max interletter digit per position, break where odd,
# remain/push edge constraints, exception stoplist).  Patterns are the
# standard TeX hyphenation pattern strings (digits interleaved with
# letters) — load any language's published pattern set; tests pin the
# algorithm on hand-derived patterns and pin the decompose loop on the
# reference's own da_UTF8 vectors via injected hyphenation points.
# ---------------------------------------------------------------------------


class Hyphenator:
    """Liang hyphenation over TeX pattern strings."""

    def __init__(self, patterns, exceptions=()):
        self.pat: dict[str, tuple] = {}
        self.max_pat_len = 0
        for p in patterns:
            chars = []
            vals = [0]
            for ch in p:
                if ch.isdigit():
                    vals[len(chars)] = int(ch)
                else:
                    chars.append(ch)
                    vals.append(0)
            key = "".join(chars)
            self.pat[key] = tuple(vals[: len(chars) + 1])
            self.max_pat_len = max(self.max_pat_len, len(key))
        self.exceptions: dict[str, list[int]] = {}
        for e in exceptions:
            word = e.replace("-", "")
            offs, j = [], 0
            for part in e.split("-")[:-1]:
                j += len(part)
                offs.append(j)
            self.exceptions[word] = offs

    def hyphenation_points(
        self, word: str, remain: int = 1, push: int = 1
    ) -> "list[int] | None":
        """[0, break offsets..., len(word)] or None when unbreakable —
        Hyphenation.getHyphenationPoints() with the synthetic ends."""
        n = len(word)
        if n < remain + push:
            return None
        low = word.lower()
        if low in self.exceptions:
            ks = [
                j
                for j in self.exceptions[low]
                if j >= remain and j < n - push
            ]
            return [0] + ks + [n] if ks else None
        padded = "." + low + "."
        il = [0] * (len(padded) + 1)
        for i in range(len(padded)):
            lim = min(len(padded), i + self.max_pat_len)
            for j in range(i + 1, lim + 1):
                vals = self.pat.get(padded[i:j])
                if vals:
                    for k, v in enumerate(vals):
                        if v > il[i + k]:
                            il[i + k] = v
        # il[i+1] odd => break after i letters (HyphenationTree:371-377)
        ks = [
            i
            for i in range(n)
            if (il[i + 1] & 1) == 1 and remain <= i <= n - push
        ]
        return [0] + ks + [n] if ks else None


def hyphenation_decompose(
    token: str,
    hyphenator: "Hyphenator",
    dictionary: "frozenset | None" = None,
    min_word_size: int = DEFAULT_MIN_WORD_SIZE,
    min_subword_size: int = DEFAULT_MIN_SUBWORD_SIZE,
    max_subword_size: int = DEFAULT_MAX_SUBWORD_SIZE,
    only_longest_match: bool = False,
    points: "list[int] | None" = None,
) -> list[str]:
    """Subwords per HyphenationCompoundWordTokenFilter.decompose()
    (original token NOT included; callers emit it first).  ``points``
    injects precomputed hyphenation points (the test seam that pins
    the loop on the reference's da_UTF8 vectors without the pattern
    file)."""
    if len(token) < min_word_size:
        return []
    hyp = points if points is not None else hyphenator.hyphenation_points(
        token, 1, 1
    )
    if hyp is None:
        return []
    low = token.lower()
    out: list[str] = []
    for i in range(len(hyp)):
        remaining = len(hyp) - i
        start = hyp[i]
        longest: "str | None" = None
        for j in range(1, remaining):
            part_len = hyp[i + j] - start
            if part_len > max_subword_size:
                break
            if part_len < min_subword_size:
                continue
            cand = None
            if dictionary is None or low[start : start + part_len] in dictionary:
                cand = token[start : start + part_len]
            elif low[start : start + part_len - 1] in dictionary:
                # genitive-s / binding-character fallback
                cand = token[start : start + part_len - 1]
            if cand is not None:
                if only_longest_match:
                    if longest is None or len(longest) < len(cand):
                        longest = cand
                else:
                    out.append(cand)
        if only_longest_match and longest is not None:
            out.append(longest)
    return out
