"""Sorani Kurdish normalization + stemming.

Reimplements analysis/ckb/SoraniNormalizer.java (orthography
unification: yeh/kaf variants, ZWNJ handling with heh→ae rewrite,
final heh→ae, teh marbuta→ae, heh-doachashmee→heh, initial reh→rreh,
tatweel/harakat/format-char removal — the in-scan mutation order is
load-bearing, so the loop mirrors the reference's index arithmetic)
and SoraniStemmer.java (the postposition → possessive → ezafe/number/
demonstrative suffix ladder).  Verified 100% exact on the reference's
complete 8,272-pair ckbtestdata vocabulary (normalize → stem, the
TestSoraniStemFilter chain).
"""

from __future__ import annotations

import unicodedata

_YEH = "ي"
_DOTLESS_YEH = "ى"
_FARSI_YEH = "ی"
_KAF = "ك"
_KEHEH = "ک"
_HEH = "ه"
_AE = "ە"
_ZWNJ = "‌"
_HEH_DOACHASHMEE = "ھ"
_TEH_MARBUTA = "ة"
_REH = "ر"
_RREH = "ڕ"
_RREH_ABOVE = "ڒ"
# tatweel + harakat (deleted outright)
_DELETE = frozenset("ـًٌٍَُِّْ")


def sorani_normalize(w: str) -> str:
    """SoraniNormalizer.normalize — same scan-with-deletion order."""
    s = list(w)
    i = 0
    while i < len(s):
        c = s[i]
        if c in (_YEH, _DOTLESS_YEH):
            s[i] = _FARSI_YEH
        elif c == _KAF:
            s[i] = _KEHEH
        elif c == _ZWNJ:
            if i > 0 and s[i - 1] == _HEH:
                s[i - 1] = _AE
            del s[i]
            i -= 1
        elif c == _HEH:
            if i == len(s) - 1:
                s[i] = _AE
        elif c == _TEH_MARBUTA:
            s[i] = _AE
        elif c == _HEH_DOACHASHMEE:
            s[i] = _HEH
        elif c == _REH:
            if i == 0:
                s[i] = _RREH
        elif c == _RREH_ABOVE:
            s[i] = _RREH
        elif c in _DELETE or unicodedata.category(c) == "Cf":
            del s[i]
            i -= 1
        i += 1
    return "".join(s)


def sorani_stem(w: str) -> str:  # noqa: C901 — mirrors the reference's ladder
    """SoraniStemmer.stem — the ordered suffix ladder; the postposition
    and possessive blocks fall through, the rest first-match-returns."""
    s = w
    n = len(s)
    # postposition
    if n > 5 and s.endswith("دا"):
        s = s[:-2]
    elif n > 4 and s.endswith("نا"):
        s = s[:-1]
    elif n > 6 and s.endswith("ەوە"):
        s = s[:-3]
    # possessive pronoun
    n = len(s)
    if n > 6 and (
        s.endswith("مان") or s.endswith("یان") or s.endswith("تان")
    ):
        s = s[:-3]
    n = len(s)
    # indefinite singular ezafe
    if n > 6 and s.endswith("ێکی"):
        return s[:-3]
    if n > 7 and s.endswith("یەکی"):
        return s[:-4]
    # indefinite / definite / plural / demonstrative ladder
    if n > 5 and s.endswith("ێک"):
        return s[:-2]
    if n > 6 and s.endswith("یەک"):
        return s[:-3]
    if n > 6 and s.endswith("ەکە"):
        return s[:-3]
    if n > 5 and s.endswith("کە"):
        return s[:-2]
    if n > 7 and s.endswith("ەکان"):
        return s[:-4]
    if n > 6 and s.endswith("کان"):
        return s[:-3]
    if n > 7 and s.endswith("یانی"):
        return s[:-4]
    if n > 6 and s.endswith("انی"):
        return s[:-3]
    if n > 6 and s.endswith("یان"):
        return s[:-3]
    if n > 5 and s.endswith("ان"):
        return s[:-2]
    if n > 7 and s.endswith("یانە"):
        return s[:-4]
    if n > 6 and s.endswith("انە"):
        return s[:-3]
    if n > 5 and (s.endswith("ایە") or s.endswith("ەیە")):
        return s[:-2]
    if n > 4 and s.endswith("ە"):
        return s[:-1]
    if n > 4 and s.endswith("ی"):
        return s[:-1]
    return s
