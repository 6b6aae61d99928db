"""PhoneticFilter + the commons-codec encoder family.

Ref: lucene/analysis/phonetic/src/java/org/apache/lucene/analysis/
phonetic/PhoneticFilter.java (inject=true emits the PHONETIC form
first, then the original at the same position; encode failures and
identity encodings pass the token through).  PhoneticFilterFactory
maps encoder names to commons-codec classes; implemented here to
commons-codec semantics, each verified against the reference's
TestPhoneticFilter.testAlgorithms goldens
(lucene/analysis/phonetic/src/test/.../TestPhoneticFilter.java:40-71):
Soundex (H/W suppression), RefinedSoundex (every char coded, adjacent
dedupe), Metaphone (maxCodeLen=4 rule table), Caverphone2 (the fixed
rewrite cascade, 10-char 1-padded), Nysiis (strict 6-char).
DoubleMetaphone and BeiderMorse are documented out of scope.
"""

from __future__ import annotations

import re

# commons-codec US_ENGLISH_MAPPING_STRING
_MAP = "01230120022455012623010202"


def _code(c: str) -> str:
    return _MAP[ord(c) - 65]


def _mapping_code(s: str, i: int) -> str | None:
    """commons-codec Soundex.getMappingCode: None = HW-suppressed
    (same code group straddling an H/W, coded once)."""
    mapped = _code(s[i])
    if i > 1 and mapped != "0":
        hw = s[i - 1]
        if hw in ("H", "W"):
            pre = s[i - 2]
            if _code(pre) == mapped or pre in ("H", "W"):
                return None
    return mapped


def soundex(word: str) -> str:
    """4-char US-English Soundex (commons-codec Soundex.soundex)."""
    s = "".join(c for c in word.upper() if "A" <= c <= "Z")
    if not s:
        return ""
    out = [s[0], "0", "0", "0"]
    last = _mapping_code(s, 0)
    count, i = 1, 1
    while i < len(s) and count < 4:
        mapped = _mapping_code(s, i)
        i += 1
        if mapped is not None:
            if mapped != "0" and mapped != last:
                out[count] = mapped
                count += 1
            last = mapped
    return "".join(out)


# commons-codec RefinedSoundex US_ENGLISH mapping
_REFINED_MAP = "01360240043788015936020505"


def refined_soundex(word: str) -> str:
    """commons-codec RefinedSoundex.soundex: first letter + a code for
    EVERY letter (vowels code 0), collapsing adjacent equal codes; no
    length cap."""
    s = "".join(c for c in word.upper() if "A" <= c <= "Z")
    if not s:
        return ""
    out = [s[0]]
    last = None
    for c in s:
        code = _REFINED_MAP[ord(c) - 65]
        if code != last:
            out.append(code)
        last = code
    return "".join(out)


_FRONTV = "EIY"   # letters that make C and G "soft"
_VARSON = "CSPTG"  # son of a varson: H silent after these
_VOWELS = "AEIOU"


def metaphone(txt: str, max_code_len: int = 4) -> str:
    """commons-codec Metaphone.metaphone, rule for rule (including the
    quirks the goldens pin: adjacent duplicates dropped EXCEPT C,
    vowels kept only word-initially, TH→0)."""
    if not txt:
        return ""
    if len(txt) == 1:
        return txt.upper()
    inwd = txt.upper()
    # initial two-character exceptions
    if inwd[0] in "KGP" and inwd[1] == "N":
        local = inwd[1:]
    elif inwd[0] == "A" and inwd[1] == "E":
        local = inwd[1:]
    elif inwd[0] == "W" and inwd[1] == "R":
        local = inwd[1:]
    elif inwd[0] == "W" and inwd[1] == "H":
        local = "W" + inwd[2:]
    elif inwd[0] == "X":
        local = "S" + inwd[1:]
    else:
        local = inwd
    wdsz = len(local)
    code: list[str] = []
    n = 0

    def is_vowel(i: int) -> bool:
        return 0 <= i < wdsz and local[i] in _VOWELS

    def prev_is(i: int, c: str) -> bool:
        return i > 0 and local[i - 1] == c

    def next_is(i: int, c: str) -> bool:
        return i + 1 < wdsz and local[i + 1] == c

    def region(i: int, s: str) -> bool:
        return local[i:i + len(s)] == s and i + len(s) <= wdsz

    while len(code) < max_code_len and n < wdsz:
        symb = local[n]
        if symb != "C" and prev_is(n, symb):
            n += 1
            continue
        if symb in _VOWELS:
            if n == 0:
                code.append(symb)
        elif symb == "B":
            if not (prev_is(n, "M") and n == wdsz - 1):  # silent MB$
                code.append("B")
        elif symb == "C":
            if prev_is(n, "S") and n + 1 < wdsz and local[n + 1] in _FRONTV:
                pass  # SCI/SCE/SCY: discard
            elif region(n, "CIA"):
                code.append("X")
            elif n + 1 < wdsz and local[n + 1] in _FRONTV:
                code.append("S")  # CI/CE/CY
            elif prev_is(n, "S") and next_is(n, "H"):
                code.append("K")  # SCH
            elif next_is(n, "H"):
                # commons-codec 1.10 quirk: initial CH with a vowel at
                # index 2 -> K (the comment in the Java source says
                # "CH consonant" but the code tests isVowel(local, 2))
                if n == 0 and wdsz >= 3 and is_vowel(2):
                    code.append("K")
                else:
                    code.append("X")
            else:
                code.append("K")
        elif symb == "D":
            if (n + 2 < wdsz and next_is(n, "G")
                    and local[n + 2] in _FRONTV):
                code.append("J")  # DGE/DGI/DGY
                n += 2
            else:
                code.append("T")
        elif symb == "G":
            if n + 2 == wdsz and next_is(n, "H"):
                pass  # GH$ silent
            elif (n + 2 < wdsz and next_is(n, "H") and not is_vowel(n + 2)):
                pass  # GH + consonant silent
            elif n > 0 and (region(n, "GN") or region(n, "GNED")):
                pass  # silent GN
            else:
                soft = n + 1 < wdsz and local[n + 1] in _FRONTV
                code.append("J" if soft else "K")
        elif symb == "H":
            if n == wdsz - 1:
                pass  # terminal H
            elif n > 0 and local[n - 1] in _VARSON:
                pass
            elif is_vowel(n + 1):
                code.append("H")
        elif symb in "FJLMNR":
            code.append(symb)
        elif symb == "K":
            if n == 0 or not prev_is(n, "C"):
                code.append("K")
        elif symb == "P":
            code.append("F" if next_is(n, "H") else "P")
        elif symb == "Q":
            code.append("K")
        elif symb == "S":
            if region(n, "SH") or region(n, "SIO") or region(n, "SIA"):
                code.append("X")
            else:
                code.append("S")
        elif symb == "T":
            if region(n, "TIA") or region(n, "TIO"):
                code.append("X")
            elif region(n, "TCH"):
                pass  # silent
            elif region(n, "TH"):
                code.append("0")
            else:
                code.append("T")
        elif symb == "V":
            code.append("F")
        elif symb in "WY":
            if n + 1 < wdsz and is_vowel(n + 1):
                code.append(symb)
        elif symb == "X":
            code.append("K")
            code.append("S")
        elif symb == "Z":
            code.append("S")
        n += 1
        del code[max_code_len:]
    return "".join(code)


# Caverphone 2.0 rewrite cascade (commons-codec Caverphone2.encode),
# applied strictly in order
_CAVERPHONE2_RULES: "list[tuple[str, str]]" = [
    (r"e$", ""),
    (r"^cough", "cou2f"), (r"^rough", "rou2f"), (r"^tough", "tou2f"),
    (r"^enough", "enou2f"), (r"^trough", "trou2f"), (r"^gn", "2n"),
    (r"mb$", "m2"),
    (r"cq", "2q"), (r"ci", "si"), (r"ce", "se"), (r"cy", "sy"),
    (r"tch", "2ch"), (r"c", "k"), (r"q", "k"), (r"x", "k"), (r"v", "f"),
    (r"dg", "2g"), (r"tio", "sio"), (r"tia", "sia"), (r"d", "t"),
    (r"ph", "fh"), (r"b", "p"), (r"sh", "s2h"), (r"z", "s"),
    (r"^[aeiou]", "A"), (r"[aeiou]", "3"),
    (r"j", "y"), (r"^y3", "Y3"), (r"^y", "A"), (r"y", "3"),
    (r"3gh3", "3kh3"), (r"gh", "22"), (r"g", "k"),
    (r"s+", "S"), (r"t+", "T"), (r"p+", "P"), (r"k+", "K"),
    (r"f+", "F"), (r"m+", "M"), (r"n+", "N"),
    (r"w3", "W3"), (r"wh3", "Wh3"), (r"w$", "3"), (r"w", "2"),
    (r"^h", "A"), (r"h", "2"),
    (r"r3", "R3"), (r"r$", "3"), (r"r", "2"),
    (r"l3", "L3"), (r"l$", "3"), (r"l", "2"),
    (r"2", ""), (r"3$", "A"), (r"3", ""),
]


def caverphone2(word: str) -> str:
    txt = re.sub(r"[^a-z]", "", word.lower())
    for pat, rep in _CAVERPHONE2_RULES:
        txt = re.sub(pat, rep, txt)
    return (txt + "1111111111")[:10]


def _nysiis_is_vowel(c: str) -> bool:
    return c in "AEIOU"


def _nysiis_transcode(prev: str, curr: str, nxt: str, anext: str) -> str:
    """commons-codec Nysiis.transcodeRemaining."""
    if curr == "E" and nxt == "V":
        return "AF"
    if _nysiis_is_vowel(curr):
        return "A"
    if curr == "Q":
        return "G"
    if curr == "Z":
        return "S"
    if curr == "M":
        return "N"
    if curr == "K":
        return "NN" if nxt == "N" else "C"
    if curr == "S" and nxt == "C" and anext == "H":
        return "SSS"
    if curr == "P" and nxt == "H":
        return "FF"
    if curr == "H" and (not _nysiis_is_vowel(prev) or not _nysiis_is_vowel(nxt)):
        return prev
    if curr == "W" and _nysiis_is_vowel(prev):
        return prev
    return curr


def nysiis(word: str, strict: bool = True) -> str:
    """commons-codec Nysiis.encode: first/last pattern rewrites, the
    per-char transcode table written back INTO the working array (so a
    rewrite feeds the next char's prev/next context), adjacent dedupe
    on append, terminal S/AY/A trimming, 6-char cap when strict."""
    s = "".join(c for c in word.upper() if "A" <= c <= "Z")
    if not s:
        return ""
    s = re.sub(r"^MAC", "MCC", s)
    s = re.sub(r"^KN", "NN", s)
    s = re.sub(r"^K", "C", s)
    s = re.sub(r"^(PH|PF)", "FF", s)
    s = re.sub(r"^SCH", "SSS", s)
    s = re.sub(r"(EE|IE)$", "Y", s)
    s = re.sub(r"(DT|RT|RD|NT|ND)$", "D", s)
    chars = list(s)
    key = [chars[0]]
    for i in range(1, len(chars)):
        nxt = chars[i + 1] if i + 1 < len(chars) else " "
        anext = chars[i + 2] if i + 2 < len(chars) else " "
        transcoded = _nysiis_transcode(chars[i - 1], chars[i], nxt, anext)
        # write back into the working array (commons-codec arraycopy)
        for j, tc in enumerate(transcoded):
            if i + j < len(chars):
                chars[i + j] = tc
        if chars[i] != key[-1]:
            key.append(chars[i])
    out = "".join(key)
    if out.endswith("S") and len(out) > 1:
        out = out[:-1]
    if out.endswith("AY") and len(out) > 2:
        out = out[:-2] + "Y"
    if out.endswith("A") and len(out) > 1:
        out = out[:-1]
    return out[:6] if strict else out


ENCODERS = {
    "Soundex": soundex,
    "RefinedSoundex": refined_soundex,
    "Metaphone": metaphone,
    "Caverphone2": caverphone2,
    "Caverphone": caverphone2,  # factory alias (2.0 is the default impl)
    "Nysiis": nysiis,
}


def phonetic_tokens(
    token: str, inject: bool = True, encoder: str = "Soundex"
) -> list[str]:
    """PhoneticFilter.incrementToken: replace (inject=False) or emit
    [phonetic, original] — phonetic first, both at one position."""
    if not token:
        return [token]
    enc = ENCODERS[encoder](token)
    if not enc or enc == token:
        return [token]
    return [enc, token] if inject else [enc]
