"""WordDelimiterFilter + NGram/EdgeNGram token filters.

Ref: lucene/analysis/common/src/java/org/apache/lucene/analysis/
miscellaneous/WordDelimiterFilter.java + WordDelimiterIterator.java
(char classification getType:289-315, isBreak:204-221, leading/
trailing-delimiter bounds + final-possessive trim), and
analysis/ngram/NGramTokenFilter.java / EdgeNGramTokenFilter.java.

Per-token pure functions, applied inside the analyzer's Arrow batch
like the compound filter — no extra shuffle.  Position note: the
reference's graph posIncrement/posLength bookkeeping is an artifact of
its streaming TokenFilter contract; in the batch (terms, positions)
arrays the injected original/catenations share the first part's slot
and subsequent parts take consecutive slots.
"""

from __future__ import annotations

import unicodedata

LOWER, UPPER, DIGIT, DELIM = 1, 2, 4, 8
ALPHA = LOWER | UPPER

_CAT_TYPE = {
    "Lu": UPPER,
    "Ll": LOWER,
    "Lt": ALPHA, "Lm": ALPHA, "Lo": ALPHA,
    "Mn": ALPHA, "Me": ALPHA, "Mc": ALPHA,
    "Nd": DIGIT, "Nl": DIGIT, "No": DIGIT,
    "Cs": ALPHA | DIGIT,  # surrogate: prevent splitting
}


def _char_type(c: str) -> int:
    return _CAT_TYPE.get(unicodedata.category(c), DELIM)


def _is_break(last: int, cur: int, case_change: bool, numerics: bool) -> bool:
    """WordDelimiterIterator.isBreak:204-221 verbatim."""
    if cur & last:
        return False
    if not case_change and (last & ALPHA) and (cur & ALPHA):
        return False
    if (last & UPPER) and (cur & ALPHA):
        return False  # UPPER->letter: PowerShot keeps 'Shot' whole
    if not numerics and (
        ((last & ALPHA) and (cur & DIGIT))
        or ((last & DIGIT) and (cur & ALPHA))
    ):
        return False
    return True


def word_delimiter(
    token: str,
    generate_word_parts: bool = True,
    generate_number_parts: bool = True,
    split_on_case_change: bool = True,
    split_on_numerics: bool = True,
    stem_english_possessive: bool = True,
    catenate_words: bool = False,
    catenate_numbers: bool = False,
    catenate_all: bool = False,
    preserve_original: bool = False,
    protected: frozenset = frozenset(),
) -> list[str]:
    """Emit the filter's output tokens for one input token, in stream
    order (original first when preserved, then parts, catenations
    last).  A token that is a single subword passes through unchanged
    (even when generate flags are off), matching the reference."""
    if token in protected:
        return [token]
    types = [_char_type(c) for c in token]
    # setBounds: skip leading/trailing delimiters
    start, end = 0, len(token)
    while start < end and types[start] == DELIM:
        start += 1
    while end > start and types[end - 1] == DELIM:
        end -= 1
    if start >= end:
        return [token] if preserve_original else []
    # final-possessive trim ('s at the very end of the bounded token)
    if (
        stem_english_possessive
        and end - start >= 2
        and token[end - 2] == "'"
        and token[end - 1] in ("s", "S")
    ):
        end -= 2
    # scan into subword parts
    parts: list[tuple[str, int]] = []  # (text, or'd type)
    i = start
    while i < end:
        if types[i] == DELIM:
            i += 1
            continue
        j, ptype = i + 1, types[i]
        while j < end and types[j] != DELIM and not _is_break(
            types[j - 1], types[j], split_on_case_change, split_on_numerics
        ):
            ptype |= types[j]
            j += 1
        parts.append((token[i:j], ptype))
        i = j
    if len(parts) == 1 and parts[0][0] == token:
        return [token]
    out: list[str] = []
    if preserve_original:
        out.append(token)
    for text, ptype in parts:
        if (ptype & ALPHA and generate_word_parts) or (
            ptype & DIGIT and not ptype & ALPHA and generate_number_parts
        ):
            out.append(text)
    if catenate_all and len(parts) > 1:
        out.append("".join(t for t, _ in parts))
    else:
        # a single-subword concatenation is only emitted when the
        # corresponding generate flag did NOT already emit the part
        # (WordDelimiterFilter flushConcatenation's subwordCount>1 ||
        # !shouldGenerateParts test)
        if catenate_words:
            out.extend(
                _catenate_runs(
                    parts, lambda t: bool(t & ALPHA), generate_word_parts
                )
            )
        if catenate_numbers:
            out.extend(
                _catenate_runs(
                    parts,
                    lambda t: bool(t & DIGIT) and not t & ALPHA,
                    generate_number_parts,
                )
            )
    return out


def _catenate_runs(parts, pred, generated: bool) -> list[str]:
    runs: list[str] = []
    cur: list[str] = []

    def flush():
        if cur and (len(cur) > 1 or not generated):
            runs.append("".join(cur))
        cur.clear()

    for text, ptype in parts:
        if pred(ptype):
            cur.append(text)
        else:
            flush()
    flush()
    return runs


def ngrams(token: str, min_gram: int = 1, max_gram: int = 2) -> list[str]:
    """NGramTokenFilter.java: at each start offset emit gram sizes
    min..max ascending (7.x order: by start, then size)."""
    out = []
    n = len(token)
    for i in range(n):
        for g in range(min_gram, max_gram + 1):
            if i + g > n:
                break
            out.append(token[i: i + g])
    return out


def edge_ngrams(token: str, min_gram: int = 1, max_gram: int = 1) -> list[str]:
    """EdgeNGramTokenFilter.java: front-anchored prefixes of sizes
    min..max ascending."""
    return [
        token[:g] for g in range(min_gram, min(max_gram, len(token)) + 1)
    ]
