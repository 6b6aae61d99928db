"""Hindi, Persian, and Indonesian analysis.

- HindiNormalizer (analysis/hi/HindiNormalizer.java:42-180: Pingali &
  Varma word normalization + the Larkey CLIR additions — dead n →
  anusvara, candrabindu → bindu, nukta folds/deletions, ZWJ/ZWNJ and
  virama deletion, chandra and long→short vowel folds) and
  HindiStemmer (analysis/hi/HindiStemmer.java:32-121: the Ramanathan &
  Rao lightweight suffix ladder, longest-first with per-tier minimum
  lengths).
- PersianNormalizer (analysis/fa/PersianNormalizer.java:36-88: farsi
  yeh / yeh barree → arabic yeh, keheh → kaf, heh+hamza / heh goal →
  heh, hamza-above deleted).  PersianAnalyzer runs the ARABIC
  normalizer first, then this one; no stemming (fa/PersianAnalyzer
  .java:41-52).
- IndonesianStemmer (analysis/id/IndonesianStemmer.java:30-272:
  Asian, Tan & Williams-style rule stemmer — particle + possessive
  inflection, then first-order prefix / suffix / second-order prefix
  with the REMOVED_* flag constraints and syllable budget).
"""

from __future__ import annotations

# --- Hindi -------------------------------------------------------------

_HI_CHAR_MAP = {
    "ँ": "ं",  # candrabindu -> bindu
    "ऩ": "न", "ऱ": "र", "ऴ": "ळ",
    "क़": "क", "ख़": "ख", "ग़": "ग",
    "ज़": "ज", "ड़": "ड", "ढ़": "ढ",
    "फ़": "फ", "य़": "य",
    "ॅ": "े", "ॆ": "े",
    "ॉ": "ो", "ॊ": "ो",
    "ऍ": "ए", "ऎ": "ए",
    "ऑ": "ओ", "ऒ": "ओ",
    "ॲ": "अ",
    "आ": "अ", "ई": "इ", "ऊ": "उ",
    "ॠ": "ऋ", "ॡ": "ऌ",
    "ऐ": "ए", "औ": "ओ",
    "ी": "ि", "ू": "ु", "ॄ": "ृ",
    "ॣ": "ॢ", "ै": "े", "ौ": "ो",
}
_HI_DELETE = {"़", "‍", "‌", "्"}


def hindi_normalize(s: str) -> str:
    """HindiNormalizer.normalize — single left-to-right pass; the
    dead-n rule (NA + virama → anusvara) consumes the virama, every
    other rule is a 1:1 fold or a deletion."""
    out: list[str] = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c == "न" and i + 1 < n and s[i + 1] == "्":
            out.append("ं")
            i += 2
            continue
        if c in _HI_DELETE:
            i += 1
            continue
        out.append(_HI_CHAR_MAP.get(c, c))
        i += 1
    return "".join(out)


# (suffix tier, min surviving length + 1): longest-first exactly as the
# reference's cascaded ifs — a tier fires only when len > len(sfx) + 1
_HI_SUFFIXES = [
    (6, ["ाएंगी", "ाएंगे", "ाऊंगी", "ाऊंगा", "ाइयाँ", "ाइयों", "ाइयां"]),
    (5, ["ाएगी", "ाएगा", "ाओगी", "ाओगे", "एंगी", "ेंगी", "एंगे", "ेंगे",
         "ूंगी", "ूंगा", "ातीं", "नाओं", "नाएं", "ताओं", "ताएं", "ियाँ",
         "ियों", "ियां"]),
    (4, ["ाकर", "ाइए", "ाईं", "ाया", "ेगी", "ेगा", "ोगी", "ोगे", "ाने",
         "ाना", "ाते", "ाती", "ाता", "तीं", "ाओं", "ाएं", "ुओं", "ुएं",
         "ुआं"]),
    (3, ["कर", "ाओ", "िए", "ाई", "ाए", "ने", "नी", "ना", "ते", "ीं",
         "ती", "ता", "ाँ", "ां", "ों", "ें"]),
    (2, ["ो", "े", "ू", "ु", "ी", "ि", "ा"]),
]


def hindi_stem(s: str) -> str:
    """HindiStemmer.stem: drop the longest matching suffix whose tier's
    minimum length holds (len > suffix_len + 1)."""
    n = len(s)
    for min_len, sfxs in _HI_SUFFIXES:
        if n > min_len:
            for sfx in sfxs:
                if s.endswith(sfx):
                    return s[: n - len(sfx)]
    return s


# --- Persian -----------------------------------------------------------

_FA_MAP = {
    "ی": "ي",  # FARSI YEH -> YEH
    "ے": "ي",  # YEH BARREE -> YEH
    "ک": "ك",  # KEHEH -> KAF
    "ۀ": "ه",  # HEH + YEH above -> HEH
    "ہ": "ه",  # HEH GOAL -> HEH
}


def persian_normalize(s: str) -> str:
    """PersianNormalizer.normalize (hamza-above U+0654 deleted, the
    rest 1:1 folds)."""
    return "".join(
        _FA_MAP.get(c, c) for c in s if c != "ٔ"
    )


# --- Indonesian --------------------------------------------------------

_REMOVED_KE = 1
_REMOVED_PENG = 2
_REMOVED_DI = 4
_REMOVED_MENG = 8
_REMOVED_TER = 16
_REMOVED_BER = 32
_REMOVED_PE = 64

_ID_VOWELS = set("aeiou")


def indonesian_stem(s: str, derivational: bool = True) -> str:
    """IndonesianStemmer.stem — stateful rule passes with the
    reference's flag interlocks and the syllable budget (each fired
    rule spends one syllable; passes only run while > 2 remain)."""
    state = {
        "n": sum(1 for c in s if c in _ID_VOWELS),
        "flags": 0,
    }

    def remove_particle(t: str) -> str:
        if t.endswith(("kah", "lah", "pun")):
            state["n"] -= 1
            return t[:-3]
        return t

    def remove_possessive(t: str) -> str:
        if t.endswith(("ku", "mu")):
            state["n"] -= 1
            return t[:-2]
        if t.endswith("nya"):
            state["n"] -= 1
            return t[:-3]
        return t

    def remove_first_order_prefix(t: str) -> str:
        f = state["flags"]
        if t.startswith("meng"):
            state["flags"] = f | _REMOVED_MENG; state["n"] -= 1
            return t[4:]
        if t.startswith("meny") and len(t) > 4 and t[4] in _ID_VOWELS:
            state["flags"] = f | _REMOVED_MENG; state["n"] -= 1
            return "s" + t[4:]
        if t.startswith(("men", "mem")):
            state["flags"] = f | _REMOVED_MENG; state["n"] -= 1
            return t[3:]
        if t.startswith("me"):
            state["flags"] = f | _REMOVED_MENG; state["n"] -= 1
            return t[2:]
        if t.startswith("peng"):
            state["flags"] = f | _REMOVED_PENG; state["n"] -= 1
            return t[4:]
        if t.startswith("peny") and len(t) > 4 and t[4] in _ID_VOWELS:
            state["flags"] = f | _REMOVED_PENG; state["n"] -= 1
            return "s" + t[4:]
        if t.startswith("peny"):
            state["flags"] = f | _REMOVED_PENG; state["n"] -= 1
            return t[4:]
        if t.startswith("pen") and len(t) > 3 and t[3] in _ID_VOWELS:
            state["flags"] = f | _REMOVED_PENG; state["n"] -= 1
            return "t" + t[3:]
        if t.startswith("pen"):
            state["flags"] = f | _REMOVED_PENG; state["n"] -= 1
            return t[3:]
        if t.startswith("pem"):
            state["flags"] = f | _REMOVED_PENG; state["n"] -= 1
            return t[3:]
        if t.startswith("di"):
            state["flags"] = f | _REMOVED_DI; state["n"] -= 1
            return t[2:]
        if t.startswith("ter"):
            state["flags"] = f | _REMOVED_TER; state["n"] -= 1
            return t[3:]
        if t.startswith("ke"):
            state["flags"] = f | _REMOVED_KE; state["n"] -= 1
            return t[2:]
        return t

    def remove_second_order_prefix(t: str) -> str:
        f = state["flags"]
        if t.startswith("ber"):
            state["flags"] = f | _REMOVED_BER; state["n"] -= 1
            return t[3:]
        if t == "belajar":
            state["flags"] = f | _REMOVED_BER; state["n"] -= 1
            return t[3:]
        if (t.startswith("be") and len(t) > 4
                and t[2] not in _ID_VOWELS and t[3] == "e" and t[4] == "r"):
            state["flags"] = f | _REMOVED_BER; state["n"] -= 1
            return t[2:]
        if t.startswith("per"):
            state["n"] -= 1
            return t[3:]
        if t == "pelajar":
            state["n"] -= 1
            return t[3:]
        if t.startswith("pe"):
            state["flags"] = f | _REMOVED_PE; state["n"] -= 1
            return t[2:]
        return t

    def remove_suffix(t: str) -> str:
        f = state["flags"]
        if (t.endswith("kan") and not f & _REMOVED_KE
                and not f & _REMOVED_PENG and not f & _REMOVED_PE):
            state["n"] -= 1
            return t[:-3]
        if (t.endswith("an") and not f & _REMOVED_DI
                and not f & _REMOVED_MENG and not f & _REMOVED_TER):
            state["n"] -= 1
            return t[:-2]
        if (t.endswith("i") and not t.endswith("si")
                and not f & _REMOVED_BER and not f & _REMOVED_KE
                and not f & _REMOVED_PENG):
            state["n"] -= 1
            return t[:-1]
        return t

    if state["n"] > 2:
        s = remove_particle(s)
    if state["n"] > 2:
        s = remove_possessive(s)
    if derivational:
        old = s
        if state["n"] > 2:
            s = remove_first_order_prefix(s)
        if old != s:
            old = s
            if state["n"] > 2:
                s = remove_suffix(s)
            if old != s and state["n"] > 2:
                s = remove_second_order_prefix(s)
        else:
            if state["n"] > 2:
                s = remove_second_order_prefix(s)
            if state["n"] > 2:
                s = remove_suffix(s)
    return s
