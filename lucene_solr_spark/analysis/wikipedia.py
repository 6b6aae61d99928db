"""WikipediaTokenizer — wiki-markup-aware tokenization with token
types (the boilerplate-structure extractor for wiki-style corpora).

Refs: lucene/analysis/common/src/java/org/apache/lucene/analysis/
wikipedia/WikipediaTokenizerImpl.jflex:120-335 (the whole grammar:
token macros ALPHANUM/APOSTROPHE/ACRONYM/COMPANY/EMAIL/NUM/HOST/CJ,
the state machine over [[internal links]], [[Category:...]],
[external links], ''italics'' / '''bold''' / '''''bold-italics''''',
==headings== / ===sub headings===, {{citations}} / <ref> citations,
and the global TAGS-or-any-char ignore) and WikipediaTokenizer.java:
38-60 (type names).  Scope: TOKENS_ONLY output (the default mode);
UNTOKENIZED_ONLY/BOTH collapse modes are a documented omission.

The scanner reproduces JFlex semantics exactly: at each position every
live rule (current state's rules first, then the global ignore) is
tried, the LONGEST match wins, ties break to the earliest rule.
Pinned on the reference's WikipediaTokenizerTest vectors including the
full 98-token testHandwritten pin.

Scale shape: a per-doc pure function riding the Arrow-batched analyzer
(same contract as every other chain); wiki markup never crosses doc
boundaries so there is no cross-row state.
"""

from __future__ import annotations

import re

ALPHANUM_T = "<ALPHANUM>"
APOSTROPHE_T = "<APOSTROPHE>"
ACRONYM_T = "<ACRONYM>"
COMPANY_T = "<COMPANY>"
EMAIL_T = "<EMAIL>"
HOST_T = "<HOST>"
NUM_T = "<NUM>"
CJ_T = "<CJ>"
INTERNAL_LINK = "il"
EXTERNAL_LINK = "el"
EXTERNAL_LINK_URL = "elu"
CITATION = "ci"
CATEGORY = "c"
BOLD = "b"
ITALICS = "i"
BOLD_ITALICS = "bi"
HEADING = "h"
SUB_HEADING = "sh"

# character classes, verbatim from the .jflex macros
_LETTER = r"A-Za-zÀ-ÖØ-öø-ÿĀ-῿ﾠ-ￜ"
_DIGIT = (
    r"0-9٠-٩۰-۹०-९০-৯"
    r"੦-੯૦-૯୦-୯௧-௯౦-౯"
    r"೦-೯൦-൯๐-๙໐-໙၀-၉"
)
_KOREAN = r"가-힯ᄀ-ᇿ"
_CJ = (
    r"぀-㆏㄀-ㄯ゠-ヿㇰ-ㇿ㌀-㍿"
    r"㐀-䶿一-鿿豈-﫿･-ﾟ"
)
_ALNUM = f"[{_LETTER}{_DIGIT}{_KOREAN}]+"
_ALPHA = f"[{_LETTER}]+"
_P = r"[_\-/.,]"
_HAS_DIGIT = f"[{_LETTER}{_DIGIT}]*[{_DIGIT}][{_LETTER}{_DIGIT}]*"
_NUM = (
    f"(?:{_ALNUM}{_P}{_HAS_DIGIT}(?:{_P}{_ALNUM}{_P}{_HAS_DIGIT})+"
    f"|{_HAS_DIGIT}{_P}{_ALNUM}(?:{_P}{_HAS_DIGIT}{_P}{_ALNUM})+"
    f"|{_ALNUM}(?:{_P}{_HAS_DIGIT}{_P}{_ALNUM})+"
    f"|{_HAS_DIGIT}(?:{_P}{_ALNUM}{_P}{_HAS_DIGIT})+"
    f"|{_ALNUM}{_P}{_HAS_DIGIT}"
    f"|[{_DIGIT}]+{_P}[{_DIGIT}]+"
    f"|{_HAS_DIGIT}{_P}{_ALNUM})"
)
_WS = r"(?:\r\n|[ \r\n\t\f])"
_TAGS = f'</?{_ALNUM}(?:{_WS}*{_ALNUM}="{_ALNUM}")*>'
_HOST = f"{_ALNUM}(?:\\.{_ALNUM})+"
_URL = f"(?:http://|https://){_HOST}(?:/?(?:{_ALNUM}|{_P}|[?&=#])*)*"

YYINITIAL = "initial"
CAT_S = "category"
ILINK_S = "internal_link"
ELINK_S = "external_link"
TWO_SQ = "two_sq"
THREE_SQ = "three_sq"
FIVE_SQ = "five_sq"
DBL_EQ = "double_equals"
DBL_BRACE = "double_brace"
STRING_S = "string"


class _Scanner:
    """One JFlex-equivalent pass over a document; yields
    (text, type, position_increment)."""

    def __init__(self, text: str):
        self.text = text
        self.i = 0
        self.state = YYINITIAL
        self.tok_type = None
        self.num_balanced = 0
        self.pos_inc = 1
        self.num_link_toks = 0

    # -- actions (each returns a token tuple or None) ----------------------

    def _emit(self, m, ttype, pos_inc=None):
        if pos_inc is not None:
            self.pos_inc = pos_inc
        return (m.group(0), ttype, self.pos_inc)

    def tokens(self):
        rules = _RULES
        while self.i < len(self.text):
            best = None  # (length, rule_index, match, action)
            for ri, (state, rx, action) in enumerate(rules):
                if state is not None and state != self.state:
                    continue
                m = rx.match(self.text, self.i)
                if m and (best is None or m.end() - m.start() > best[0]):
                    best = (m.end() - m.start(), ri, m, action)
            _, _, m, action = best
            self.i = m.end() if m.end() > m.start() else self.i + 1
            tok = action(self, m)
            if tok is not None:
                yield tok


def _ignore(s, m):
    return None


def _ignore_reset(s, m):
    s.pos_inc = 1
    return None


def _mk_simple(ttype):
    def act(s, m):
        s.pos_inc = 1
        return (m.group(0), ttype, 1)

    return act


def _open_ilink(s, m):
    s.pos_inc = 1
    s.tok_type = INTERNAL_LINK
    s.state = ILINK_S
    return None


def _open_cat(s, m):
    s.pos_inc = 1
    s.tok_type = CATEGORY
    s.state = CAT_S
    return None


def _open_elink(s, m):
    s.pos_inc = 1
    s.tok_type = EXTERNAL_LINK_URL
    s.state = ELINK_S
    return None


def _two_quotes(s, m):
    s.pos_inc = 1
    if s.num_balanced == 0:
        s.num_balanced += 1
        s.state = TWO_SQ
    else:
        s.num_balanced = 0
    return None


def _open_dbl_eq(s, m):
    s.pos_inc = 1
    s.state = DBL_EQ
    return None


def _open_citation(s, m):
    s.pos_inc = 1
    s.tok_type = CITATION
    s.state = DBL_BRACE
    return None


def _cur(s, m):
    return (m.group(0), s.tok_type, s.pos_inc)


def _ilink_close(s, m):
    s.num_link_toks = 0
    s.state = YYINITIAL
    return None


def _elink_url(s, m):
    s.pos_inc = 1
    return (m.group(0), s.tok_type, 1)


def _elink_word(s, m):
    s.pos_inc = 0 if s.num_link_toks == 0 else 1
    s.tok_type = EXTERNAL_LINK
    s.num_link_toks += 1
    return (m.group(0), s.tok_type, s.pos_inc)


def _elink_close(s, m):
    s.num_link_toks = 0
    s.pos_inc = 0
    s.state = YYINITIAL
    return None


def _to_initial(s, m):
    s.state = YYINITIAL
    return None


def _q_bold(s, m):
    s.tok_type = BOLD
    s.state = THREE_SQ
    return None


def _q_bold_italics(s, m):
    s.tok_type = BOLD_ITALICS
    s.state = FIVE_SQ
    return None


def _q_italics_word(s, m):
    s.tok_type = ITALICS
    s.state = STRING_S
    return (m.group(0), s.tok_type, s.pos_inc)


def _quote_ilink(s, m):
    # quote-state link overrides do NOT reset numBalanced (only the
    # STRING-state ones do — .jflex:246-249 vs :311-313)
    s.tok_type = INTERNAL_LINK
    s.state = ILINK_S
    return None


def _quote_cat(s, m):
    s.tok_type = CATEGORY
    s.state = CAT_S
    return None


def _quote_elink(s, m):
    s.tok_type = EXTERNAL_LINK
    s.state = ELINK_S
    return None


def _override_ilink(s, m):
    s.num_balanced = 0
    s.tok_type = INTERNAL_LINK
    s.state = ILINK_S
    return None


def _override_cat(s, m):
    s.num_balanced = 0
    s.tok_type = CATEGORY
    s.state = CAT_S
    return None


def _override_elink(s, m):
    s.num_balanced = 0
    s.tok_type = EXTERNAL_LINK
    s.state = ELINK_S
    return None


def _word_to_string(s, m):
    s.state = STRING_S
    return (m.group(0), s.tok_type, s.pos_inc)


def _sub_heading(s, m):
    s.tok_type = SUB_HEADING
    s.state = STRING_S
    return None


def _heading_word(s, m):
    s.tok_type = HEADING
    return (m.group(0), s.tok_type, s.pos_inc)


def _string_end(s, m):
    s.num_balanced = 0
    s.tok_type = ALPHANUM_T
    s.state = YYINITIAL
    return None


def _string_word(s, m):
    return (m.group(0), s.tok_type, s.pos_inc)


def _string_pipe(s, m):
    return (m.group(0), s.tok_type, s.pos_inc)


def _c(p):
    return re.compile(p)


_DBL_BRACKET_CAT = r"\[\[:?Category:"

# (state | None=global, regex, action) — JFlex order; longest match
# wins, ties to the earliest entry
_RULES = [
    (YYINITIAL, _c(_ALNUM), _mk_simple(ALPHANUM_T)),
    (YYINITIAL, _c(f"{_ALPHA}(?:'{_ALPHA})+"), _mk_simple(APOSTROPHE_T)),
    (YYINITIAL, _c(f"{_ALPHA}\\.(?:{_ALPHA}\\.)+"), _mk_simple(ACRONYM_T)),
    (YYINITIAL, _c(f"{_ALPHA}[&@]{_ALPHA}"), _mk_simple(COMPANY_T)),
    (
        YYINITIAL,
        _c(f"{_ALNUM}(?:[._\\-]{_ALNUM})*@{_ALNUM}(?:[.\\-]{_ALNUM})+"),
        _mk_simple(EMAIL_T),
    ),
    (YYINITIAL, _c(_NUM), _mk_simple(NUM_T)),
    (YYINITIAL, _c(_HOST), _mk_simple(HOST_T)),
    (YYINITIAL, _c(f"[{_CJ}]"), _mk_simple(CJ_T)),
    (YYINITIAL, _c(r"\[\["), _open_ilink),
    (YYINITIAL, _c(_DBL_BRACKET_CAT), _open_cat),
    (YYINITIAL, _c(r"\["), _open_elink),
    (YYINITIAL, _c(r"''"), _two_quotes),
    (YYINITIAL, _c(r"=="), _open_dbl_eq),
    (YYINITIAL, _c(r"\{\{"), _open_citation),
    (YYINITIAL, _c(r"<ref>"), _open_citation),
    (YYINITIAL, _c(r"(?s:.)"), _ignore_reset),
    # internal link
    (ILINK_S, _c(_ALNUM), _cur),
    (ILINK_S, _c(r"\]\]"), _ilink_close),
    (ILINK_S, _c(r"(?s:.)"), _ignore_reset),
    # external link
    (ELINK_S, _c(_URL), _elink_url),
    (ELINK_S, _c(_ALNUM), _elink_word),
    (ELINK_S, _c(r"\]"), _elink_close),
    (ELINK_S, _c(_WS), _ignore_reset),
    # category
    (CAT_S, _c(_ALNUM), _cur),
    (CAT_S, _c(r"\]\]"), _to_initial),
    (CAT_S, _c(r"(?s:.)"), _ignore_reset),
    # '' — italics opener (or bold/bold-italics when more quotes follow)
    (TWO_SQ, _c(r"'"), _q_bold),
    (TWO_SQ, _c(r"'''"), _q_bold_italics),
    (TWO_SQ, _c(_ALNUM), _q_italics_word),
    (TWO_SQ, _c(r"\[\["), _quote_ilink),
    (TWO_SQ, _c(_DBL_BRACKET_CAT), _quote_cat),
    (TWO_SQ, _c(r"\["), _quote_elink),
    (TWO_SQ, _c(r"(?s:.)"), _ignore),
    # ''' — bold
    (THREE_SQ, _c(_ALNUM), _word_to_string),
    (THREE_SQ, _c(r"\[\["), _quote_ilink),
    (THREE_SQ, _c(_DBL_BRACKET_CAT), _quote_cat),
    (THREE_SQ, _c(r"\["), _quote_elink),
    (THREE_SQ, _c(r"(?s:.)"), _ignore),
    # ''''' — bold italics
    (FIVE_SQ, _c(_ALNUM), _word_to_string),
    (FIVE_SQ, _c(r"\[\["), _quote_ilink),
    (FIVE_SQ, _c(_DBL_BRACKET_CAT), _quote_cat),
    (FIVE_SQ, _c(r"\["), _quote_elink),
    (FIVE_SQ, _c(r"(?s:.)"), _ignore),
    # == headings
    (DBL_EQ, _c(r"="), _sub_heading),
    (DBL_EQ, _c(_ALNUM), _heading_word),
    (DBL_EQ, _c(r"=="), _to_initial),
    (DBL_EQ, _c(r"(?s:.)"), _ignore),
    # {{ }} / <ref> citations
    (DBL_BRACE, _c(_ALNUM), _cur),
    (DBL_BRACE, _c(r"\}\}"), _to_initial),
    (DBL_BRACE, _c(r"</ref>"), _to_initial),
    (DBL_BRACE, _c(r"(?s:.)"), _ignore),
    # inside markup body (STRING)
    (STRING_S, _c(r"'''''"), _string_end),
    (STRING_S, _c(r"'''"), _string_end),
    (STRING_S, _c(r"''"), _string_end),
    (STRING_S, _c(r"==="), _string_end),
    (STRING_S, _c(_ALNUM), _string_word),
    (STRING_S, _c(r"\[\["), _override_ilink),
    (STRING_S, _c(_DBL_BRACKET_CAT), _override_cat),
    (STRING_S, _c(r"\["), _override_elink),
    (STRING_S, _c(r"\|"), _string_pipe),
    (STRING_S, _c(r"(?s:.)"), _ignore),
    # global lowest-priority ignore: whole tags, else one char
    (None, _c(f"(?:{_TAGS}|(?s:.))"), _ignore),
]


def wikipedia_tokenize(text: str) -> list[tuple[str, str, int]]:
    """TOKENS_ONLY token stream: (term, type, positionIncrement)."""
    return list(_Scanner(text).tokens())
