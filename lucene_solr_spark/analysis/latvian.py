"""Latvian light stemmer + analyzer chain.

References:
- analysis/lv/LatvianStemmer.java:35-174 (Kreslin's algorithm, light
  variant): strip the FIRST matching affix from the ordered table when
  the word keeps >vc vowels and ≥3 chars, then un-palatalize for the
  declension II/V/VI suffixes (the char BEYOND the new length — the
  just-removed suffix head — selects the -u-only rules);
- analysis/lv/LatvianAnalyzer.java: tokenize → lowercase → lv stop →
  LatvianStemFilter.  Pinned on the reference's complete
  TestLatvianStemmer golden set (fixtures/latvian_stem_goldens.tsv).
"""

from __future__ import annotations

# (affix, vowel_count, palatalizes) — LatvianStemmer.affixes, in order
_AFFIXES = [
    ("ajiem", 3, False), ("ajai", 3, False),
    ("ajam", 2, False), ("ajām", 2, False),
    ("ajos", 2, False), ("ajās", 2, False),
    ("iem", 2, True), ("ajā", 2, False),
    ("ais", 2, False), ("ai", 2, False),
    ("ei", 2, False), ("ām", 1, False),
    ("am", 1, False), ("ēm", 1, False),
    ("īm", 1, False), ("im", 1, False),
    ("um", 1, False), ("us", 1, True),
    ("as", 1, False), ("ās", 1, False),
    ("es", 1, False), ("os", 1, True),
    ("ij", 1, False), ("īs", 1, False),
    ("ēs", 1, False), ("is", 1, False),
    ("ie", 1, False), ("u", 1, True),
    ("a", 1, True), ("i", 1, True),
    ("e", 1, False), ("ā", 1, False),
    ("ē", 1, False), ("ī", 1, False),
    ("ū", 1, False), ("o", 1, False),
    ("s", 0, False), ("š", 0, False),
]

_VOWELS = set("aeiouāīēū")


def _unpalatalize(s: list[str], ln: int) -> int:
    """LatvianStemmer.unpalatalize (:88-152) — ``s[ln]`` is the first
    char of the suffix just removed."""
    def ew(suffix: str) -> bool:
        return ln >= len(suffix) and "".join(s[ln - len(suffix):ln]) == suffix

    if s[ln] == "u":
        if ew("kš"):
            # kš -> kst: Java bumps len BEFORE writing, so the 's','t'
            # land at the last two slots of the GROWN stem
            ln += 1
            s[ln - 2] = "s"
            s[ln - 1] = "t"
            return ln
        if ew("ņņ"):
            s[ln - 2] = "n"
            s[ln - 1] = "n"
            return ln
    if ew("pj") or ew("bj") or ew("mj") or ew("vj"):
        return ln - 1  # labial consonant
    if ew("šņ"):
        s[ln - 2] = "s"
        s[ln - 1] = "n"
        return ln
    if ew("žņ"):
        s[ln - 2] = "z"
        s[ln - 1] = "n"
        return ln
    if ew("šļ"):
        s[ln - 2] = "s"
        s[ln - 1] = "l"
        return ln
    if ew("žļ"):
        s[ln - 2] = "z"
        s[ln - 1] = "l"
        return ln
    if ew("ļņ"):
        s[ln - 2] = "l"
        s[ln - 1] = "n"
        return ln
    if ew("ļļ"):
        s[ln - 2] = "l"
        s[ln - 1] = "l"
        return ln
    if s[ln - 1] == "č":
        s[ln - 1] = "c"
        return ln
    if s[ln - 1] == "ļ":
        s[ln - 1] = "l"
        return ln
    if s[ln - 1] == "ņ":
        s[ln - 1] = "n"
        return ln
    return ln


def latvian_stem(word: str) -> str:
    """LatvianStemmer.stem (:38-51): strip the first matching affix
    (vowel-count + min-length guarded), un-palatalizing when flagged."""
    s = list(word)
    ln = len(s)
    num_vowels = sum(1 for ch in s if ch in _VOWELS)
    for affix, vc, palatalizes in _AFFIXES:
        if (
            num_vowels > vc
            and ln >= len(affix) + 3
            and "".join(s[ln - len(affix):ln]) == affix
        ):
            ln -= len(affix)
            if palatalizes:
                ln = _unpalatalize(s, ln)
            return "".join(s[:ln])
    return word
