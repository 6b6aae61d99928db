"""Char-filter stage: HTML strip + ASCII folding.

The analyzer chain's missing pre-tokenize stage (reference:
analysis/charfilter/HTMLStripCharFilter.java — a 31k-line generated
DFA — and analysis/miscellaneous/ASCIIFoldingFilter.java:1-2104).
Spark-first shape: char filters are COLUMN transforms applied before
tokenization, so the whole stage stays JVM-side (regexp_replace /
translate inside whole-stage codegen); the Python mirrors exist for
offset-corrected single-doc use and for the golden tests.

Scope notes vs the reference:
- HTML strip: comments, <script>/<style> blocks (with content), all
  tags, and the common named entities are handled; numeric character
  references are stripped to a space rather than decoded (a Column
  expression cannot synthesize chr(n)); exotic named entities pass
  through as text.  Tags become a single space so token boundaries
  survive (`a<br>b` tokenizes as two tokens, like the reference).
- ASCII folding: the Latin-1 Supplement + Latin Extended-A block (the
  overwhelming share of real-corpus accents: résumé, naïve, Å, ø, ß)
  plus the standard multi-char expansions (Æ→AE, ß→ss, Œ→OE, Þ→TH);
  the reference's full BMP table (Greek ligatures, fullwidth forms,
  dingbats) is documented out of scope.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------- HTML
_COMMENT = r"<!--.*?-->"
_SCRIPT_STYLE = r"(?is)<(?:script|style)\b[^>]*>.*?</(?:script|style)\s*>"
_TAG = r"</?[A-Za-z!][^>]*>"
_NUMERIC_ENTITY = r"&#(?:[0-9]{1,7}|x[0-9a-fA-F]{1,6});"

# single-pass entity decode: '&amp;' must be LAST so '&amp;lt;' yields
# the literal text '&lt;' (one level of decoding, like the reference)
_ENTITIES = [
    ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&apos;", "'"),
    ("&nbsp;", " "), ("&copy;", "©"), ("&reg;", "®"),
    ("&ndash;", "–"), ("&mdash;", "—"), ("&hellip;", "…"),
    ("&amp;", "&"),
]


def html_strip_col(col: Column) -> Column:
    """HTML strip as a pure column expression (JVM regexp_replace chain)."""
    out = F.regexp_replace(col, _COMMENT, " ")
    out = F.regexp_replace(out, _SCRIPT_STYLE, " ")
    out = F.regexp_replace(out, _TAG, " ")
    out = F.regexp_replace(out, _NUMERIC_ENTITY, " ")
    for ent, rep in _ENTITIES:
        out = F.regexp_replace(out, re.escape(ent), rep)
    return out


def html_strip(text: str) -> str:
    """Python mirror of html_strip_col (identical output, single doc)."""
    out = re.sub(_COMMENT, " ", text, flags=re.DOTALL)
    out = re.sub(_SCRIPT_STYLE, " ", out)
    out = re.sub(_TAG, " ", out)
    out = re.sub(_NUMERIC_ENTITY, " ", out)
    for ent, rep in _ENTITIES:
        out = out.replace(ent, rep)
    return out


def html_strip_with_offsets(text: str) -> tuple[str, list[int]]:
    """HTML strip with offset correction: returns (stripped_text,
    offsets) where offsets[i] is the ORIGINAL character index of
    stripped_text[i] — the correctOffset contract of
    HTMLStripCharFilter (BaseCharFilter.java:36-58), so highlighters
    can map token offsets back into the raw markup.

    Replacement characters (the space standing in for a tag, or the
    first char of a decoded entity) carry the original span's start.
    """
    spans: list[tuple[int, int, str]] = []  # (start, end, replacement)
    taken: list[bool] = [False] * len(text)

    def _mark(pattern: str, repl, flags=0):
        for m in re.finditer(pattern, text, flags):
            if any(taken[m.start() : m.end()]):
                continue  # inside an outer construct already handled
            for i in range(m.start(), m.end()):
                taken[i] = True
            spans.append(
                (m.start(), m.end(), repl(m) if callable(repl) else repl)
            )

    _mark(_COMMENT, " ", re.DOTALL)
    _mark(_SCRIPT_STYLE, " ")
    _mark(_TAG, " ")
    _mark(_NUMERIC_ENTITY, " ")
    for ent, rep in _ENTITIES:
        _mark(re.escape(ent), rep)
    spans.sort()
    out: list[str] = []
    offs: list[int] = []
    pos = 0
    for start, end, rep in spans:
        for i in range(pos, start):
            out.append(text[i])
            offs.append(i)
        for ch in rep:
            out.append(ch)
            offs.append(start)
        pos = end
    for i in range(pos, len(text)):
        out.append(text[i])
        offs.append(i)
    return "".join(out), offs


# ------------------------------------------------------------- folding
# Latin-1 Supplement + Latin Extended-A single-char foldings
# (ASCIIFoldingFilter.java — the subset with 1:1 ASCII images)
_FOLD_1TO1 = {
    "À": "A", "Á": "A", "Â": "A", "Ã": "A", "Ä": "A", "Å": "A",
    "Ç": "C", "È": "E", "É": "E", "Ê": "E", "Ë": "E",
    "Ì": "I", "Í": "I", "Î": "I", "Ï": "I", "Ñ": "N",
    "Ò": "O", "Ó": "O", "Ô": "O", "Õ": "O", "Ö": "O", "Ø": "O",
    "Ù": "U", "Ú": "U", "Û": "U", "Ü": "U", "Ý": "Y",
    "à": "a", "á": "a", "â": "a", "ã": "a", "ä": "a", "å": "a",
    "ç": "c", "è": "e", "é": "e", "ê": "e", "ë": "e",
    "ì": "i", "í": "i", "î": "i", "ï": "i", "ñ": "n",
    "ò": "o", "ó": "o", "ô": "o", "õ": "o", "ö": "o", "ø": "o",
    "ù": "u", "ú": "u", "û": "u", "ü": "u", "ý": "y", "ÿ": "y",
    "Ā": "A", "ā": "a", "Ă": "A", "ă": "a", "Ą": "A", "ą": "a",
    "Ć": "C", "ć": "c", "Ĉ": "C", "ĉ": "c", "Ċ": "C", "ċ": "c",
    "Č": "C", "č": "c", "Ď": "D", "ď": "d", "Đ": "D", "đ": "d",
    "Ē": "E", "ē": "e", "Ĕ": "E", "ĕ": "e", "Ė": "E", "ė": "e",
    "Ę": "E", "ę": "e", "Ě": "E", "ě": "e",
    "Ĝ": "G", "ĝ": "g", "Ğ": "G", "ğ": "g", "Ġ": "G", "ġ": "g",
    "Ģ": "G", "ģ": "g", "Ĥ": "H", "ĥ": "h", "Ħ": "H", "ħ": "h",
    "Ĩ": "I", "ĩ": "i", "Ī": "I", "ī": "i", "Ĭ": "I", "ĭ": "i",
    "Į": "I", "į": "i", "İ": "I", "ı": "i",
    "Ĵ": "J", "ĵ": "j", "Ķ": "K", "ķ": "k",
    "Ĺ": "L", "ĺ": "l", "Ļ": "L", "ļ": "l", "Ľ": "L", "ľ": "l",
    "Ŀ": "L", "ŀ": "l", "Ł": "L", "ł": "l",
    "Ń": "N", "ń": "n", "Ņ": "N", "ņ": "n", "Ň": "N", "ň": "n",
    "Ō": "O", "ō": "o", "Ŏ": "O", "ŏ": "o", "Ő": "O", "ő": "o",
    "Ŕ": "R", "ŕ": "r", "Ŗ": "R", "ŗ": "r", "Ř": "R", "ř": "r",
    "Ś": "S", "ś": "s", "Ŝ": "S", "ŝ": "s", "Ş": "S", "ş": "s",
    "Š": "S", "š": "s", "Ţ": "T", "ţ": "t", "Ť": "T", "ť": "t",
    "Ŧ": "T", "ŧ": "t",
    "Ũ": "U", "ũ": "u", "Ū": "U", "ū": "u", "Ŭ": "U", "ŭ": "u",
    "Ů": "U", "ů": "u", "Ű": "U", "ű": "u", "Ų": "U", "ų": "u",
    "Ŵ": "W", "ŵ": "w", "Ŷ": "Y", "ŷ": "y", "Ÿ": "Y",
    "Ź": "Z", "ź": "z", "Ż": "Z", "ż": "z", "Ž": "Z", "ž": "z",
}
_FOLD_MULTI = [
    ("Æ", "AE"), ("æ", "ae"), ("Œ", "OE"), ("œ", "oe"),
    ("ß", "ss"), ("Þ", "TH"), ("þ", "th"), ("Ð", "D"), ("ð", "d"),
    ("Ĳ", "IJ"), ("ĳ", "ij"), ("ŉ", "'n"), ("ſ", "s"),
]
_TRANS = str.maketrans(_FOLD_1TO1)
_FROM = "".join(_FOLD_1TO1)
_TO = "".join(_FOLD_1TO1.values())


def ascii_fold_col(col: Column) -> Column:
    """ASCII folding as a column expression: one JVM translate() for
    the 1:1 table + a short replace chain for multi-char expansions."""
    out = F.translate(col, _FROM, _TO)
    for src, rep in _FOLD_MULTI:
        out = F.replace(out, F.lit(src), F.lit(rep))
    return out


def ascii_fold(text: str) -> str:
    """Python mirror of ascii_fold_col."""
    out = text.translate(_TRANS)
    for src, rep in _FOLD_MULTI:
        out = out.replace(src, rep)
    return out


# ------------------------------------------------------------- mapping
def parse_mapping_rules(lines) -> list[tuple[str, str]]:
    """Parse the reference's mapping-rule syntax ('"a" => "e"', one per
    line, # comments) — MappingCharFilterFactory.parseRules."""
    rules = []
    for ln in lines:
        ln = ln.strip()
        if not ln or ln.startswith("#"):
            continue
        m = re.fullmatch(r'"((?:[^"\\]|\\.)*)"\s*=>\s*"((?:[^"\\]|\\.)*)"', ln)
        if not m:
            raise ValueError(f"bad mapping rule: {ln!r}")
        unesc = lambda s: s.encode().decode("unicode_escape")  # noqa: E731
        rules.append((unesc(m.group(1)), unesc(m.group(2))))
    return rules


def mapping_filter(text: str, rules: list[tuple[str, str]]) -> str:
    """MappingCharFilter (analysis/charfilter/MappingCharFilter.java):
    greedy LONGEST pattern match at each offset (the reference walks an
    FST; a by-first-char longest-first table is the same contract at
    mapping-table sizes).  Replacement may be empty."""
    by_first: dict[str, list[tuple[str, str]]] = {}
    for pat, rep in sorted(rules, key=lambda r: -len(r[0])):
        if not pat:
            raise ValueError("empty mapping pattern")
        by_first.setdefault(pat[0], []).append((pat, rep))
    out: list[str] = []
    i, n = 0, len(text)
    while i < n:
        for pat, rep in by_first.get(text[i], ()):
            if text.startswith(pat, i):
                out.append(rep)
                i += len(pat)
                break
        else:
            out.append(text[i])
            i += 1
    return "".join(out)


def mapping_filter_col(col: Column, rules: list[tuple[str, str]]):
    """Column form of the mapping char filter.  A pure 1:1 char map
    runs as ONE JVM translate() (single-pass, so replacements are
    never re-matched — exactly the stream semantics).  Anything else
    needs the single-scan greedy matcher: sequential replace() chains
    are WRONG there (an earlier replacement can feed a later pattern,
    and equal-length overlaps resolve by chain order, not offset), so
    multi-char rules go through an Arrow-batched pandas UDF running
    mapping_filter."""
    if all(len(p) == 1 and len(r) == 1 for p, r in rules):
        return F.translate(
            col,
            "".join(p for p, _ in rules),
            "".join(r for _, r in rules),
        )
    from pyspark.sql.functions import pandas_udf

    def _map_batch(s):
        return s.map(lambda t: mapping_filter(t or "", rules))

    return pandas_udf(_map_batch, "string")(col)


def icu_fold(text: str) -> str:
    """ICUFoldingFilter-equivalent Unicode folding (lucene/analysis/icu
    ICUFoldingFilter.java: NFKC → UTR#30 foldings → case fold).

    Composition here: NFKC compatibility normalization (ligatures,
    fullwidth forms, circled digits), Unicode case folding (ß → ss,
    final sigma), NFKD + combining-mark strip (the UTR#30
    diacritic-removal folding), NFC recompose.  Covers the accent/
    width/case/ligature foldings the reference test suite exercises;
    the long tail of UTR#30 script-specific foldings (Hangul jamo
    compat, symbol foldings beyond NFKC) is a documented divergence —
    the reference needs the ICU data files for those too.

    Unlike ``ascii_fold`` this KEEPS non-Latin scripts (Greek, Cyrillic,
    CJK) intact while still de-accenting them — the right filter when
    the corpus is multilingual and ASCIIFolding would destroy it.
    """
    import unicodedata as ud

    s = ud.normalize("NFKC", text)
    s = s.casefold()
    s = ud.normalize("NFKD", s)
    s = "".join(c for c in s if not ud.combining(c))
    return ud.normalize("NFC", s)


def icu_fold_col(col: Column) -> Column:
    """Column form via an Arrow-batched pandas UDF (unicodedata is the
    folding table; the JVM has no NFKC+casefold composition built in).
    Vocabulary-level use (fold the term dictionary, not every posting)
    keeps the Python cost off the hot path at scale."""
    from pyspark.sql import functions as F

    def _fold(s):
        return s.map(lambda t: icu_fold(t) if t is not None else None)

    return F.pandas_udf(_fold, "string")(col)
