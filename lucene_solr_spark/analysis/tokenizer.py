"""StandardTokenizer-equivalent tokenization (UAX#29 word-break subset).

Behavioral contract (from the reference grammar
lucene/analysis/standard/StandardTokenizerImpl.jflex, Unicode 6.3 rules,
and StandardTokenizer.java):

- A word token is a maximal run of letters / digits / underscores
  (``_`` is WB:ExtendNumLet and joins adjacent runs AND attaches at run
  ends — WB13a/b, .jflex:59,131-132 — so ``snake_case``, ``foo_``,
  ``_bar`` each stay ONE token).
- A single MidLetter/MidNumLet/Single_Quote char between two LETTERS
  joins them (WB6/WB7, .jflex:57,145-146): ``foo.bar``, ``can't``,
  ``l·l`` are one token.  Doubles break (``foo..bar`` → two tokens).
- A single MidNum/MidNumLet/Single_Quote char between two DIGITS joins
  them (WB11/WB12, .jflex:58,129-130): ``1,000`` / ``3.14`` / ``1;2``
  are one numeric token each.
- No EMAIL/URL tokens: the 7.0 grammar emits only ALPHANUM / NUM / CJK
  token classes (.jflex:70-73,135-197).
- Han / Hiragana ideographs tokenize one char per token; Katakana forms
  runs (jflex CJK rules).
- Tokens longer than ``max_token_length`` (default 255,
  StandardAnalyzer.java:56) are SKIPPED but still consume a position —
  the next kept token sees a position-increment bump
  (StandardTokenizer.java:182-192).

Everything is implemented as one compiled regex applied per document via
``re.finditer`` inside Arrow-batched pandas kernels — there is no
per-token Python in the Spark hot path beyond the C regex engine.
"""

from __future__ import annotations

import re

DEFAULT_MAX_TOKEN_LENGTH = 255

# CJK ranges that the reference tokenizes char-at-a-time (Han + Hiragana).
_HAN_HIRAGANA = "一-鿿㐀-䶿豈-﫿々〇぀-ゟ"
_KATAKANA = "゠-ヿㇰ-ㇿ"

# A "segment" is a maximal run of word chars (letters/digits/underscore)
# excluding the CJK ranges handled separately.
_SEG = rf"(?:(?![{_HAN_HIRAGANA}{_KATAKANA}])\w)+"

# Joiners: one MidLetter/MidNumLet/Single_Quote between letters, or one
# MidNum/MidNumLet/Single_Quote between digits.  Unicode 6.3 classes:
#   MidLetter   : U+00B7, U+05F4, U+2027, U+003A was removed in 6.1
#   MidNumLet   : . ' ‘ ’ ． ＇
#   Single_Quote: '
#   MidNum      : , ; ٬ ...
_LETTER = r"[^\W\d_]"
_MID_LETTER = "[.'‘’·״‧．＇]"
_MID_NUM = "[.,;'‘’٫٬．＇︐︓︔]"
_JOIN = (
    rf"(?:(?<={_LETTER}){_MID_LETTER}(?={_LETTER})"
    rf"|(?<=\d){_MID_NUM}(?=\d))"
)

_TOKEN_RE = re.compile(
    rf"[{_KATAKANA}]+"          # katakana run
    rf"|[{_HAN_HIRAGANA}]"      # han/hiragana: one char per token
    rf"|{_SEG}(?:{_JOIN}{_SEG})*"  # word/number with mid-joins
)


# Fast-path guards.  The full pattern only behaves differently from a
# plain word-char-run scan when a mid-joiner or CJK char is present; for
# ASCII text the only joiner candidates are . ' , ;  — so:
#   tier 1: ASCII, no joiners, separators are plain whitespace → split()
#   tier 2: ASCII, no joiners → simple [A-Za-z0-9_]+ findall
#   tier 2.5: ASCII with joiners → ASCII-specialized UAX#29 pattern
#             (explicit [A-Za-z…] classes, no Unicode \w lookaheads, no
#             CJK alternates — measured 2.2× the full pattern; token
#             equivalence fuzz-pinned in tests/test_analyzer.py)
#   tier 3: anything else → the full UAX#29 pattern
# (measured: tier 1 is ~9× the full pattern on the benchmark corpus;
# semantics are identical by construction of the guards)
_NEEDS_FULL = re.compile(r"[.',;]|[^\x00-\x7f]")
_NON_ASCII = re.compile(r"[^\x00-\x7f]")
_NON_WORD_SPACE = re.compile(r"[^A-Za-z0-9_ \t\r\n]")
_ASCII_SEG = re.compile(r"[A-Za-z0-9_]+")
# ASCII projection of the full pattern: same joiner rules restricted to
# the ASCII members of MidLetter/MidNumLet/Single_Quote (. ') and
# MidNum/MidNumLet/Single_Quote (. , ; ').
_ASCII_FULL = re.compile(
    r"[A-Za-z0-9_]+"
    r"(?:(?:(?<=[A-Za-z])['.](?=[A-Za-z])"
    r"|(?<=[0-9])[.,;'](?=[0-9]))[A-Za-z0-9_]+)*"
)


def raw_tokens(text: str) -> list[str]:
    """All raw token strings of one document (no length filter) —
    the C-level fast path for batch analysis."""
    if not _NEEDS_FULL.search(text):
        if not _NON_WORD_SPACE.search(text):
            return text.split()
        return _ASCII_SEG.findall(text)
    if not _NON_ASCII.search(text):
        return _ASCII_FULL.findall(text)
    return _TOKEN_RE.findall(text)


def tokenize(
    text: str, max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH
) -> tuple[list[str], list[int]]:
    """Tokenize one document → (tokens, positions).

    Positions number every produced token; tokens longer than
    ``max_token_length`` are dropped but still consume their position
    (the max-token skip rule, StandardTokenizer.java:182-192).
    """
    tokens: list[str] = []
    positions: list[int] = []
    pos = -1
    for m in _TOKEN_RE.finditer(text):
        pos += 1
        tok = m.group(0)
        if len(tok) > max_token_length:
            continue
        tokens.append(tok)
        positions.append(pos)
    return tokens, positions
