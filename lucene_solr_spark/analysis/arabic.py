"""Arabic normalization + light stemming (Larkey/Ballesteros/Connell).

Reimplements analysis/ar/ArabicNormalizer.java (alef/yeh/teh-marbuta
unification, tatweel + harakat removal) and ArabicStemmer.java (light-10
stemmer: ONE definite-article/conjunction prefix strip — wa- needs a
4-char word, the others leave ≥2 chars — then the suffix list applied
IN ORDER, each stripping at most once but several may fire, every
strip leaving ≥2 chars).
"""

from __future__ import annotations

_ALEF = "ا"
_NORM_TO_ALEF = ("آ", "أ", "إ")  # madda / hamza above / below
_YEH = "ي"
_DOTLESS_YEH = "ى"
_TEH_MARBUTA = "ة"
_HEH = "ه"
# tatweel + harakat
_DELETE = frozenset("ـًٌٍَُِّْ")

_PREFIXES = ("ال", "وال", "بال", "كال", "فال", "لل", "و")
_SUFFIXES = ("ها", "ان", "ات", "ون", "ين", "يه", "ية", "ه", "ة", "ي")


def arabic_normalize(w: str) -> str:
    """ArabicNormalizer.normalize."""
    out = []
    for c in w:
        if c in _NORM_TO_ALEF:
            out.append(_ALEF)
        elif c == _DOTLESS_YEH:
            out.append(_YEH)
        elif c == _TEH_MARBUTA:
            out.append(_HEH)
        elif c in _DELETE:
            continue
        else:
            out.append(c)
    return "".join(out)


def arabic_stem(w: str) -> str:
    """ArabicStemmer.stem: one prefix strip, then the ordered suffix
    sweep (each suffix checked once; matches accumulate)."""
    s = w
    for p in _PREFIXES:
        if len(p) == 1 and len(s) < 4:
            continue
        if len(p) > 1 and len(s) < len(p) + 2:
            continue
        if s.startswith(p):
            s = s[len(p):]
            break
    for suf in _SUFFIXES:
        if len(s) >= len(suf) + 2 and s.endswith(suf):
            s = s[: len(s) - len(suf)]
    return s
