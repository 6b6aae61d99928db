"""Miscellaneous token filters: CommonGrams, Fingerprint,
HyphenatedWords, RemoveDuplicates, Keep/Length/Trim/LimitTokenCount.

Refs: lucene/analysis/common/src/java/org/apache/lucene/analysis/
commongrams/CommonGramsFilter.java + CommonGramsQueryFilter.java
(stopword bigrams — the classic phrase-query accelerator: a phrase
containing 'the' reads the the_fox bigram posting instead of the
corpus-sized 'the' posting list, which is exactly the high-df skew
problem at 10^12 docs), miscellaneous/FingerprintFilter.java,
HyphenatedWordsFilter.java, RemoveDuplicatesTokenFilter.java,
KeepWordFilter.java, LengthFilter.java, TrimFilter.java,
LimitTokenCountFilter.java.

All are per-doc pure list functions riding the analyzer's Arrow
batch; the trivial ones are one-liners kept for chain-configuration
parity.
"""

from __future__ import annotations

GRAM_TYPE = "gram"


def common_grams(
    tokens: list[str], common: frozenset, separator: str = "_"
) -> list[tuple[str, bool]]:
    """CommonGramsFilter: every unigram, plus a bigram at position-
    increment 0 between each pair where EITHER member is a common
    word.  Returns (term, is_gram) in stream order."""
    out: list[tuple[str, bool]] = []
    for i, w in enumerate(tokens):
        if i > 0 and (tokens[i - 1] in common or w in common):
            out.append((tokens[i - 1] + separator + w, True))
        out.append((w, False))
    return out


def common_grams_query(
    tokens: list[str], common: frozenset, separator: str = "_"
) -> list[str]:
    """CommonGramsQueryFilter.incrementToken's lag-one state machine
    verbatim: a gram replaces the buffered previous token; a unigram
    flushes the buffer; the final pending token is emitted only when
    the LAST FLUSH was not a gram (so bigrams fully cover the common
    words and uncovered unigrams survive)."""
    prev: tuple[str, bool] | None = None
    last_emitted_gram = False
    out: list[str] = []
    for term, is_gram in common_grams(tokens, common, separator):
        if prev is not None and not is_gram:
            out.append(prev[0])
            last_emitted_gram = prev[1]
        prev = (term, is_gram)
    if prev is not None and not last_emitted_gram:
        out.append(prev[0])
    return out


def fingerprint(
    tokens: list[str], max_output_token_size: int = 1024, separator: str = " "
) -> list[str]:
    """FingerprintFilter: ONE token = sorted unique input terms joined
    by the separator; empty output when it would exceed
    maxOutputTokenSize (the reference's all-or-nothing rule)."""
    if not tokens:
        return []
    uniq = sorted(set(tokens))
    joined = separator.join(uniq)
    if len(joined) > max_output_token_size:
        return []
    return [joined]


def hyphenated_words(tokens: list[str]) -> list[str]:
    """HyphenatedWordsFilter: a token ending in '-' joins the next
    token (line-wrap hyphenation); a trailing unpaired hyphen is
    stripped at end of stream."""
    out: list[str] = []
    buf = ""
    for t in tokens:
        if t.endswith("-") and len(t) > 1:
            buf += t[:-1]
        elif buf:
            out.append(buf + t)
            buf = ""
        else:
            out.append(t)
    if buf:
        out.append(buf)
    return out


def remove_duplicates(tokens: list[str], positions: list[int]) -> tuple[list[str], list[int]]:
    """RemoveDuplicatesTokenFilter: drop a token equal to another at
    the SAME position (posIncrement 0 stack)."""
    seen: set[tuple[int, str]] = set()
    out_t, out_p = [], []
    for t, p in zip(tokens, positions):
        if (p, t) not in seen:
            seen.add((p, t))
            out_t.append(t)
            out_p.append(p)
    return out_t, out_p


def keep_words(tokens: list[str], keep: frozenset) -> list[str]:
    """KeepWordFilter — inverse stop filter."""
    return [t for t in tokens if t in keep]


def length_filter(tokens: list[str], min_len: int, max_len: int) -> list[str]:
    """LengthFilter."""
    return [t for t in tokens if min_len <= len(t) <= max_len]


def trim_filter(tokens: list[str]) -> list[str]:
    """TrimFilter (whitespace-trim each term, keep empties out)."""
    return [s for s in (t.strip() for t in tokens) if s]


def limit_token_count(tokens: list[str], max_count: int) -> list[str]:
    """LimitTokenCountFilter."""
    return tokens[:max_count]
