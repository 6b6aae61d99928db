"""Porter stemming — the EnglishAnalyzer's stem stage.

Implements the Porter algorithm (Porter 1980, "An algorithm for suffix
stripping", Program 14(3), public algorithm) in the REVISED variant the
reference ships (analysis/en/PorterStemmer.java: ``bli``→``ble`` and
``logi``→``log`` in step 3, the two published "Bug 1/2" guards, and the
no-stem guard for words of length ≤ 2).  Behavior-parity is gated by
golden stem pairs in tests/test_porter.py.

Scale shape: stemming is applied to the *factorized vocabulary*, not
the token stream — a batch of 10^6 tokens typically holds 10^3–10^4
unique terms, so the per-word Python cost is amortized ~100× before it
ever meets Spark (see ``stem_vocab``).
"""

from __future__ import annotations

import numpy as np

_VOWELS = frozenset("aeiou")


def _is_cons(w: str, i: int) -> bool:
    c = w[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return True if i == 0 else not _is_cons(w, i - 1)
    return True


def _measure(w: str) -> int:
    """m(): number of VC sequences in ``w``."""
    n = 0
    i = 0
    ln = len(w)
    # skip initial consonants
    while i < ln and _is_cons(w, i):
        i += 1
    while i < ln:
        # in a vowel run; skip it
        while i < ln and not _is_cons(w, i):
            i += 1
        if i >= ln:
            return n
        n += 1
        while i < ln and _is_cons(w, i):
            i += 1
    return n


def _has_vowel(w: str) -> bool:
    return any(not _is_cons(w, i) for i in range(len(w)))


def _double_cons(w: str) -> bool:
    return len(w) >= 2 and w[-1] == w[-2] and _is_cons(w, len(w) - 1)


def _cvc(w: str) -> bool:
    """consonant-vowel-consonant ending, last consonant not w/x/y."""
    if len(w) < 3:
        return False
    if not (_is_cons(w, len(w) - 1) and not _is_cons(w, len(w) - 2) and _is_cons(w, len(w) - 3)):
        return False
    return w[-1] not in "wxy"


def _replace_if_m(w: str, suffix: str, repl: str, min_m: int = 1) -> str | None:
    """If w ends with suffix and m(stem) >= min_m, replace; else None."""
    if not w.endswith(suffix):
        return None
    stem = w[: len(w) - len(suffix)]
    if _measure(stem) >= min_m:
        return stem + repl
    return w  # suffix matched but condition failed — stop this step


def porter_stem(word: str) -> str:
    """Stem one lowercase word."""
    if len(word) <= 2:  # ref guard: k <= k0+1 words pass through
        return word
    w = word

    # ---- step 1a: plurals
    if w.endswith("s"):
        if w.endswith("sses"):
            w = w[:-2]
        elif w.endswith("ies"):
            w = w[:-3] + "i"
        elif not w.endswith("ss"):
            w = w[:-1]

    # ---- step 1b: -eed / -ed / -ing
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    else:
        stem = None
        if w.endswith("ed") and _has_vowel(w[:-2]):
            stem = w[:-2]
        elif w.endswith("ing") and _has_vowel(w[:-3]):
            stem = w[:-3]
        if stem is not None:
            w = stem
            if w.endswith(("at", "bl", "iz")):
                w = w + "e"
            elif _double_cons(w):
                if w[-1] not in "lsz":
                    w = w[:-1]
            elif _measure(w) == 1 and _cvc(w):
                w = w + "e"

    # ---- step 1c: y → i after a vowel
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # ---- step 2 (reference step3): double suffixes, keyed by penultimate char
    if len(w) >= 2:
        rules2 = {
            "a": (("ational", "ate"), ("tional", "tion")),
            "c": (("enci", "ence"), ("anci", "ance")),
            "e": (("izer", "ize"),),
            "l": (("bli", "ble"), ("alli", "al"), ("entli", "ent"), ("eli", "e"), ("ousli", "ous")),
            "o": (("ization", "ize"), ("ation", "ate"), ("ator", "ate")),
            "s": (("alism", "al"), ("iveness", "ive"), ("fulness", "ful"), ("ousness", "ous")),
            "t": (("aliti", "al"), ("iviti", "ive"), ("biliti", "ble")),
            "g": (("logi", "log"),),
        }
        for suf, repl in rules2.get(w[-2], ()):
            out = _replace_if_m(w, suf, repl)
            if out is not None:
                w = out
                break

    # ---- step 3 (reference step4): -icate, -ative, ...
    rules3 = {
        "e": (("icate", "ic"), ("ative", ""), ("alize", "al")),
        "i": (("iciti", "ic"),),
        "l": (("ical", "ic"), ("ful", "")),
        "s": (("ness", ""),),
    }
    for suf, repl in rules3.get(w[-1], ()):
        out = _replace_if_m(w, suf, repl)
        if out is not None:
            w = out
            break

    # ---- step 4 (reference step5): strip residual suffix when m > 1
    if len(w) >= 2:
        suffixes4 = {
            "a": ("al",),
            "c": ("ance", "ence"),
            "e": ("er",),
            "i": ("ic",),
            "l": ("able", "ible"),
            "n": ("ant", "ement", "ment", "ent"),
            "o": ("ion", "ou"),
            "s": ("ism",),
            "t": ("ate", "iti"),
            "u": ("ous",),
            "v": ("ive",),
            "z": ("ize",),
        }
        for suf in suffixes4.get(w[-2], ()):
            if w.endswith(suf):
                stem = w[: len(w) - len(suf)]
                # -ion only strips after s/t (ref Bug-2 guard: stem nonempty)
                if suf == "ion" and not (stem and stem[-1] in "st"):
                    break
                if _measure(stem) > 1:
                    w = stem
                break

    # ---- step 5 (reference step6): final -e and -ll
    if w.endswith("e"):
        m = _measure(w[:-1])
        if m > 1 or (m == 1 and not _cvc(w[:-1])):
            w = w[:-1]
    if w.endswith("ll") and _measure(w) > 1:
        w = w[:-1]
    return w


_POSSESSIVE = ("'s", "’s", "＇s")


def strip_possessive(word: str) -> str:
    """EnglishPossessiveFilter: drop a trailing 's (any apostrophe
    variant — analysis/en/EnglishPossessiveFilter.java)."""
    for suf in _POSSESSIVE:
        if word.endswith(suf):
            return word[: -len(suf)]
    return word


def stem_vocab(vocab: np.ndarray) -> np.ndarray:
    """Stem an array of UNIQUE terms (the factorized vocabulary)."""
    return np.array([porter_stem(t) for t in vocab], dtype=object)
