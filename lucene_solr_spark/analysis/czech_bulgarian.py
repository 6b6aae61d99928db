"""Czech and Bulgarian light stemmers.

Reimplements analysis/cz/CzechStemmer.java (Dolamic & Savoy: case
ending removal → possessive removal → palatalization-aware normalize)
and analysis/bg/BulgarianStemmer.java (Nakov: article → plural →
final-vowel → -ен/-ъN rewrites).  Pinned on the reference's inline
test goldens (TestCzechStemmer ~60 cases, TestBulgarianStemmer).
"""

from __future__ import annotations

_CZ_3 = (
    "ech", "ich", "ích", "ého", "ěmi", "emi", "ému", "ěte", "ete",
    "ěti", "eti", "ího", "iho", "ími", "ímu", "imu", "ách", "ata",
    "aty", "ých", "ama", "ami", "ové", "ovi", "ými",
)
_CZ_2 = ("em", "es", "ém", "ím", "ům", "at", "ám", "os", "us", "ým", "mi", "ou")
_CZ_V = set("aeiouůyáéíýě")


def _cz_remove_case(s: str) -> str:
    n = len(s)
    if n > 7 and s.endswith("atech"):
        return s[:-5]
    if n > 6 and (s.endswith("ětem") or s.endswith("etem") or s.endswith("atům")):
        return s[:-4]
    if n > 5 and s[-3:] in _CZ_3:
        return s[:-3]
    if n > 4 and s[-2:] in _CZ_2:
        return s[:-2]
    if n > 3 and s[-1] in _CZ_V:
        return s[:-1]
    return s


def czech_stem(w: str) -> str:
    """CzechStemmer.java:51-148."""
    s = _cz_remove_case(w)
    # possessives
    if len(s) > 5 and s[-2:] in ("ov", "in", "ův"):
        s = s[:-2]
    if not s:
        return s
    # normalize (palatalization)
    if s.endswith("čt"):
        return s[:-2] + "ck"
    if s.endswith("št"):
        return s[:-2] + "sk"
    if s[-1] in "cč":
        return s[:-1] + "k"
    if s[-1] in "zž":
        return s[:-1] + "h"
    if len(s) > 1 and s[-2] == "e":
        return s[:-2] + s[-1]
    if len(s) > 2 and s[-2] == "ů":
        return s[:-2] + "o" + s[-1]
    return s


def bulgarian_stem(w: str) -> str:
    """BulgarianStemmer.java:31-112."""
    if len(w) < 4:
        return w
    if len(w) > 5 and w.endswith("ища"):
        return w[:-3]
    s = _bg_remove_article(w)
    s = _bg_remove_plural(s)
    if len(s) > 3:
        if s.endswith("я"):
            s = s[:-1]
        if s and s[-1] in "аое":
            s = s[:-1]
    if len(s) > 4 and s.endswith("ен"):
        s = s[:-2] + "н"
    if len(s) > 5 and s[-2] == "ъ":
        s = s[:-2] + s[-1]
    return s


def _bg_remove_article(s: str) -> str:
    n = len(s)
    if n > 6 and s.endswith("ият"):
        return s[:-3]
    if n > 5 and s[-2:] in ("ът", "то", "те", "та", "ия"):
        return s[:-2]
    if n > 4 and s.endswith("ят"):
        return s[:-2]
    return s


def _bg_remove_plural(s: str) -> str:
    n = len(s)
    if n > 6:
        if s.endswith("овци"):
            return s[:-3]
        if s.endswith("ове"):
            return s[:-3]
        if s.endswith("еве"):
            return s[:-3] + "й"
    if n > 5:
        if s.endswith("ища"):
            return s[:-3]
        if s.endswith("та"):
            return s[:-2]
        if s.endswith("ци"):
            return s[:-2] + "к"
        if s.endswith("зи"):
            return s[:-2] + "г"
        if s[-3] == "е" and s[-1] == "и":
            return s[:-3] + "я" + s[-2]
    if n > 4:
        if s.endswith("си"):
            return s[:-2] + "х"
        if s.endswith("и"):
            return s[:-1]
    return s
