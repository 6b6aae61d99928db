"""PhoneticFilter + Soundex encoder.

Ref: lucene/analysis/phonetic/src/java/org/apache/lucene/analysis/
phonetic/PhoneticFilter.java (inject=true emits the PHONETIC form
first, then the original at the same position; encode failures and
identity encodings pass the token through) with the commons-codec
US-English Soundex encoder the factory maps for encoder="Soundex"
(mapping table + the H/W same-code suppression rule).  The other
factory encoders (DoubleMetaphone, BeiderMorse, Caverphone, ...) are
documented out of scope — Soundex pins the filter contract.
"""

from __future__ import annotations

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


def phonetic_tokens(token: str, inject: bool = True) -> list[str]:
    """PhoneticFilter.incrementToken: replace (inject=False) or emit
    [phonetic, original] — phonetic first, both at one position."""
    if not token:
        return [token]
    enc = soundex(token)
    if not enc or enc == token:
        return [token]
    return [enc, token] if inject else [enc]
