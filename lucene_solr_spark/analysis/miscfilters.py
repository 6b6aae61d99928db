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


_MAX = 2**31 - 1


def capitalize(
    token: str,
    only_first_word: bool = True,
    keep: frozenset | None = None,
    keep_ignore_case: bool = False,
    force_first_letter: bool = True,
    ok_prefix: tuple[str, ...] = (),
    min_word_length: int = 0,
    max_word_count: int = _MAX,
    max_token_length: int = _MAX,
) -> str:
    """CapitalizationFilter (miscellaneous/CapitalizationFilter.java:
    100-188), per token — words inside the token split at chars
    <= ' ' or '.', mutated in place so separators survive verbatim.

    Faithful quirks kept: the scan loop's extra ``i++`` after a
    processed word means the char AFTER a separator is never tested as
    a separator itself (a run of two spaces folds the second space into
    the next word); ``maxWordCount`` restores the ORIGINAL token only
    after the mutation pass counted too many words; a token at or above
    ``maxTokenLength`` passes through untouched.
    """
    if len(token) >= max_token_length:
        return token
    buf = list(token)
    keepset = (
        frozenset(w.lower() for w in keep)
        if keep is not None and keep_ignore_case
        else keep
    )

    def in_keep(word: str) -> bool:
        if keepset is None:
            return False
        return (word.lower() if keep_ignore_case else word) in keepset

    def process(offset: int, length: int, word_count: int) -> None:
        if length < 1:
            return
        word = "".join(buf[offset : offset + length])
        if only_first_word and word_count > 0:
            for i in range(length):
                buf[offset + i] = buf[offset + i].lower()
            return
        if in_keep(word):
            if word_count == 0 and force_first_letter:
                buf[offset] = buf[offset].upper()
            return
        if length < min_word_length:
            return
        for p in ok_prefix:
            if length >= len(p) and word.startswith(p):
                return
        buf[offset] = buf[offset].upper()
        for i in range(1, length):
            buf[offset + i] = buf[offset + i].lower()

    word_count = 0
    last_word_start = 0
    i = 0
    n = len(buf)
    while i < n:
        c = buf[i]
        if c <= " " or c == ".":
            length = i - last_word_start
            if length > 0:
                process(last_word_start, length, word_count)
                word_count += 1
                last_word_start = i + 1
                i += 1  # the reference's double increment
        i += 1
    if last_word_start < n:
        process(last_word_start, n - last_word_start, word_count)
        word_count += 1
    if word_count > max_word_count:
        return token
    return "".join(buf)


def truncate_token(tokens: list[str], length: int) -> list[str]:
    """TruncateTokenFilter (miscellaneous/TruncateTokenFilter.java:
    48-58) — fixed-prefix truncation (the F5 Turkish stemming method);
    keyword-attributed terms are exempt in the reference, and this
    engine's keyword protection happens upstream of the chain."""
    if length < 1:
        raise ValueError("length parameter must be a positive number")
    return [t[:length] for t in tokens]


def codepoint_count_filter(
    tokens: list[str], min_len: int, max_len: int
) -> list[str]:
    """CodepointCountFilter (miscellaneous/CodepointCountFilter.java:
    57-72) — length measured in Unicode CODEPOINTS; the reference's
    utf16-halving shortcut is a JVM artifact, Python len() is already
    the codepoint count."""
    if min_len < 0:
        raise ValueError("minimum length must be greater than or equal to zero")
    if min_len > max_len:
        raise ValueError("maximum length must not be greater than minimum length")
    return [t for t in tokens if min_len <= len(t) <= max_len]


def standard_token_type(token: str) -> str:
    """Token type under the UAX#29 numeric rules: a token with no
    letters and at least one digit is <NUM> (digits joined by MidNum
    continuers like '.'/',' stay one numeric token), everything else
    <ALPHANUM> (standard/StandardTokenizer.java TOKEN_TYPES)."""
    has_digit = any(ch.isdigit() for ch in token)
    has_alpha = any(ch.isalpha() for ch in token)
    return "<NUM>" if has_digit and not has_alpha else "<ALPHANUM>"


def type_token_filter(
    tokens: list[str],
    types: list[str],
    stop_types: frozenset,
    use_white_list: bool = False,
) -> list[str]:
    """TypeTokenFilter (core/TypeTokenFilter.java:52-56): drop tokens
    whose type is in ``stop_types`` (or KEEP only those, when
    useWhiteList)."""
    return [
        t
        for t, ty in zip(tokens, types)
        if (ty in stop_types) == use_white_list
    ]


def scandinavian_normalization(token: str) -> str:
    """ScandinavianNormalizationFilter (miscellaneous/
    ScandinavianNormalizationFilter.java:60-130): normalize the
    interchangeable Scandinavian chars äÄöÖ and the digraphs
    aa/ao/ae/oe/oo to åÅæÆøØ — the less-destructive alternative to
    ScandinavianFolding (å/ä are NOT folded to a).  Ported loop-exact:
    single-char maps first, digraph collapse only when a next char
    remains, scan continues past each rewrite."""
    buf = list(token)
    length = len(buf)
    i = 0
    while i < length:
        c = buf[i]
        if c == "ä":
            buf[i] = "æ"
        elif c == "Ä":
            buf[i] = "Æ"
        elif c == "ö":
            buf[i] = "ø"
        elif c == "Ö":
            buf[i] = "Ø"
        elif length - 1 > i:
            n = buf[i + 1]
            if c == "a" and n in ("a", "o", "A", "O"):
                del buf[i + 1]
                length -= 1
                buf[i] = "å"
            elif c == "A" and n in ("a", "A", "o", "O"):
                del buf[i + 1]
                length -= 1
                buf[i] = "Å"
            elif c == "a" and n in ("e", "E"):
                del buf[i + 1]
                length -= 1
                buf[i] = "æ"
            elif c == "A" and n in ("e", "E"):
                del buf[i + 1]
                length -= 1
                buf[i] = "Æ"
            elif c == "o" and n in ("e", "E", "o", "O"):
                del buf[i + 1]
                length -= 1
                buf[i] = "ø"
            elif c == "O" and n in ("e", "E", "o", "O"):
                del buf[i + 1]
                length -= 1
                buf[i] = "Ø"
        i += 1
    return "".join(buf[:length])


def keyword_repeat_stem(tokens: list[str], stem_fn) -> list[tuple[str, int]]:
    """KeywordRepeatFilter → stemmer → RemoveDuplicatesTokenFilter
    (miscellaneous/KeywordRepeatFilter.java + RemoveDuplicatesToken
    Filter.java): every token is emitted once keyword-protected
    (unstemmed) and once stemmed at the SAME position; the duplicate
    filter then drops the stemmed copy when stemming was a no-op.
    Returns (term, position) pairs — the standard exact+stemmed
    retrieval chain."""
    out: list[tuple[str, int]] = []
    for pos, tok in enumerate(tokens):
        out.append((tok, pos))
        stemmed = stem_fn(tok)
        if stemmed != tok:
            out.append((stemmed, pos))
    return out


def limit_token_offset(
    tokens: list[str],
    start_offsets: list[int],
    max_start_offset: int,
) -> list[str]:
    """LimitTokenOffsetFilter (consumeAllTokens=false semantics): keep
    tokens whose start offset is ≤ maxStartOffset."""
    return [
        t for t, o in zip(tokens, start_offsets) if o <= max_start_offset
    ]


def limit_token_position(
    tokens: list[str],
    positions: list[int],
    max_token_position: int,
) -> list[str]:
    """LimitTokenPositionFilter: keep tokens whose (1-based, gap-aware)
    position is ≤ maxTokenPosition."""
    return [
        t
        for t, p in zip(tokens, positions)
        if p + 1 <= max_token_position
    ]


def date_recognizer(tokens: list[str], fmt: str = "%m/%d/%Y") -> list[str]:
    """DateRecognizerFilter (miscellaneous/DateRecognizerFilter.java:
    50-58): keep only tokens that parse as dates under the supplied
    format (the reference delegates to a DateFormat; the default here
    is the en-US short date the factory examples use)."""
    from datetime import datetime

    out = []
    for t in tokens:
        try:
            datetime.strptime(t, fmt)
            out.append(t)
        except ValueError:
            continue
    return out


def keyword_marker_stem(
    tokens: list[str],
    stem_fn,
    keywords: "frozenset | None" = None,
    pattern: "str | None" = None,
) -> list[str]:
    """{Set,Pattern}KeywordMarkerFilter → stemmer (miscellaneous/
    SetKeywordMarkerFilter.java / PatternKeywordMarkerFilter.java +
    KeywordAttribute contract): tokens in the protected set, or fully
    matching the protect pattern, bypass the stemmer unchanged."""
    import re as _re

    pat = _re.compile(pattern) if pattern is not None else None
    out = []
    for t in tokens:
        protected = (keywords is not None and t in keywords) or (
            pat is not None and pat.fullmatch(t) is not None
        )
        out.append(t if protected else stem_fn(t))
    return out
