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
