"""Serbian normalization filters.

References:
- analysis/sr/SerbianNormalizationFilter.java:30-210 — Cyrillic and
  Latin input folded to "bald" Latin: diacritics dropped (ž/č/ć/š →
  z/c/c/s), đ/ђ → dj, љ → lj, њ → nj, џ → dz; expects lowercased input.
- analysis/sr/SerbianNormalizationRegularFilter.java:31- — Cyrillic
  folded to REGULAR Latin (diacritics kept: ж → ž, ћ → ć, ч → č,
  љ → lj, њ → nj, џ → dž); Latin input passes through unchanged.

Both verified on the complete TestSerbianNormalization*Filter.java
alphabet vectors.
"""

from __future__ import annotations

_CYR_COMMON = {
    "а": "a", "б": "b", "в": "v", "г": "g", "д": "d", "е": "e",
    "з": "z", "и": "i", "ј": "j", "к": "k", "л": "l", "м": "m",
    "н": "n", "о": "o", "п": "p", "р": "r", "с": "s", "т": "t",
    "у": "u", "ф": "f", "х": "h", "ц": "c",
    "љ": "lj", "њ": "nj",
}

_BALD = dict(_CYR_COMMON)
_BALD.update({
    "ђ": "dj", "đ": "dj", "ж": "z", "ž": "z", "ћ": "c", "ч": "c",
    "č": "c", "ć": "c", "џ": "dz", "ш": "s", "š": "s",
})

_REGULAR = dict(_CYR_COMMON)
_REGULAR.update({
    "ђ": "đ", "ж": "ž", "ћ": "ć", "ч": "č", "џ": "dž", "ш": "š",
})


def serbian_normalize(w: str) -> str:
    """SerbianNormalizationFilter: fold to bald Latin."""
    return "".join(_BALD.get(c, c) for c in w)


def serbian_normalize_regular(w: str) -> str:
    """SerbianNormalizationRegularFilter: Cyrillic to regular Latin."""
    return "".join(_REGULAR.get(c, c) for c in w)
