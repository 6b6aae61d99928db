"""Brazilian Portuguese stemmer + analyzer chain.

Reference: analysis/br/BrazilianStemmer.java:40-1024 (an Orengo-style
rule stemmer predating the snowball module) and BrazilianAnalyzer.java
(tokenize -> lowercase -> standard -> br stop -> BrazilianStemFilter).
The rule tables below reproduce the reference's ordered if-chains
verbatim as data, INCLUDING its quirks: the un-assigned `logias`
replacement (matches but leaves the term unchanged), the `ira` rule
that removes "ava", and regions computed once and never re-marked.
Verified on the complete TestBrazilianAnalyzer/TestBrazilianStemmer
golden set (tests/test_brazilian.py).
"""

from __future__ import annotations

_VOWELS = set("aeiou")

_ACCENTS = str.maketrans({
    "\u00e1": "a", "\u00e2": "a", "\u00e3": "a",
    "\u00e9": "e", "\u00ea": "e",
    "\u00ed": "i",
    "\u00f3": "o", "\u00f4": "o", "\u00f5": "o",
    "\u00fa": "u", "\u00fc": "u",
    "\u00e7": "c", "\u00f1": "n",
})

# (length_gate, suffix, region, preceded-by, assigned, remove_arg,
#  replace_to) — extracted from BrazilianStemmer.java step1/step2
# if-chains in order; first match wins
_BR_STEP1 = (
    (0, 'uciones', 'R2', None, True, 'uciones', 'u'),
    (6, 'imentos', 'R2', None, True, 'imentos', None),
    (6, 'amentos', 'R2', None, True, 'amentos', None),
    (6, 'adores', 'R2', None, True, 'adores', None),
    (6, 'adoras', 'R2', None, True, 'adoras', None),
    (6, 'logias', 'R2', None, False, 'logias', 'log'),
    (6, 'encias', 'R2', None, True, 'encias', 'ente'),
    (6, 'amente', 'R1', None, True, 'amente', None),
    (6, 'idades', 'R2', None, True, 'idades', None),
    (5, 'acoes', 'R2', None, True, 'acoes', None),
    (5, 'imento', 'R2', None, True, 'imento', None),
    (5, 'amento', 'R2', None, True, 'amento', None),
    (5, 'adora', 'R2', None, True, 'adora', None),
    (5, 'ismos', 'R2', None, True, 'ismos', None),
    (5, 'istas', 'R2', None, True, 'istas', None),
    (5, 'logia', 'R2', None, True, 'logia', 'log'),
    (5, 'ucion', 'R2', None, True, 'ucion', 'u'),
    (5, 'encia', 'R2', None, True, 'encia', 'ente'),
    (5, 'mente', 'R2', None, True, 'mente', None),
    (5, 'idade', 'R2', None, True, 'idade', None),
    (4, 'acao', 'R2', None, True, 'acao', None),
    (4, 'ezas', 'R2', None, True, 'ezas', None),
    (4, 'icos', 'R2', None, True, 'icos', None),
    (4, 'icas', 'R2', None, True, 'icas', None),
    (4, 'ismo', 'R2', None, True, 'ismo', None),
    (4, 'avel', 'R2', None, True, 'avel', None),
    (4, 'ivel', 'R2', None, True, 'ivel', None),
    (4, 'ista', 'R2', None, True, 'ista', None),
    (4, 'osos', 'R2', None, True, 'osos', None),
    (4, 'osas', 'R2', None, True, 'osas', None),
    (4, 'ador', 'R2', None, True, 'ador', None),
    (4, 'ivas', 'R2', None, True, 'ivas', None),
    (4, 'ivos', 'R2', None, True, 'ivos', None),
    (4, 'iras', 'RV', 'e', True, 'iras', 'ir'),
    (3, 'eza', 'R2', None, True, 'eza', None),
    (3, 'ico', 'R2', None, True, 'ico', None),
    (3, 'ica', 'R2', None, True, 'ica', None),
    (3, 'oso', 'R2', None, True, 'oso', None),
    (3, 'osa', 'R2', None, True, 'osa', None),
    (3, 'iva', 'R2', None, True, 'iva', None),
    (3, 'ivo', 'R2', None, True, 'ivo', None),
    (3, 'ira', 'RV', 'e', True, 'ira', 'ir'),
)

_BR_STEP2 = (
    (7, 'issemos', None, None, True, 'issemos', None),
    (7, 'essemos', None, None, True, 'essemos', None),
    (7, 'assemos', None, None, True, 'assemos', None),
    (7, 'ariamos', None, None, True, 'ariamos', None),
    (7, 'eriamos', None, None, True, 'eriamos', None),
    (7, 'iriamos', None, None, True, 'iriamos', None),
    (6, 'iremos', None, None, True, 'iremos', None),
    (6, 'eremos', None, None, True, 'eremos', None),
    (6, 'aremos', None, None, True, 'aremos', None),
    (6, 'avamos', None, None, True, 'avamos', None),
    (6, 'iramos', None, None, True, 'iramos', None),
    (6, 'eramos', None, None, True, 'eramos', None),
    (6, 'aramos', None, None, True, 'aramos', None),
    (6, 'asseis', None, None, True, 'asseis', None),
    (6, 'esseis', None, None, True, 'esseis', None),
    (6, 'isseis', None, None, True, 'isseis', None),
    (6, 'arieis', None, None, True, 'arieis', None),
    (6, 'erieis', None, None, True, 'erieis', None),
    (6, 'irieis', None, None, True, 'irieis', None),
    (5, 'irmos', None, None, True, 'irmos', None),
    (5, 'iamos', None, None, True, 'iamos', None),
    (5, 'armos', None, None, True, 'armos', None),
    (5, 'ermos', None, None, True, 'ermos', None),
    (5, 'areis', None, None, True, 'areis', None),
    (5, 'ereis', None, None, True, 'ereis', None),
    (5, 'ireis', None, None, True, 'ireis', None),
    (5, 'asses', None, None, True, 'asses', None),
    (5, 'esses', None, None, True, 'esses', None),
    (5, 'isses', None, None, True, 'isses', None),
    (5, 'astes', None, None, True, 'astes', None),
    (5, 'assem', None, None, True, 'assem', None),
    (5, 'essem', None, None, True, 'essem', None),
    (5, 'issem', None, None, True, 'issem', None),
    (5, 'ardes', None, None, True, 'ardes', None),
    (5, 'erdes', None, None, True, 'erdes', None),
    (5, 'irdes', None, None, True, 'irdes', None),
    (5, 'ariam', None, None, True, 'ariam', None),
    (5, 'eriam', None, None, True, 'eriam', None),
    (5, 'iriam', None, None, True, 'iriam', None),
    (5, 'arias', None, None, True, 'arias', None),
    (5, 'erias', None, None, True, 'erias', None),
    (5, 'irias', None, None, True, 'irias', None),
    (5, 'estes', None, None, True, 'estes', None),
    (5, 'istes', None, None, True, 'istes', None),
    (5, 'areis', None, None, True, 'areis', None),
    (5, 'aveis', None, None, True, 'aveis', None),
    (4, 'aria', None, None, True, 'aria', None),
    (4, 'eria', None, None, True, 'eria', None),
    (4, 'iria', None, None, True, 'iria', None),
    (4, 'asse', None, None, True, 'asse', None),
    (4, 'esse', None, None, True, 'esse', None),
    (4, 'isse', None, None, True, 'isse', None),
    (4, 'aste', None, None, True, 'aste', None),
    (4, 'este', None, None, True, 'este', None),
    (4, 'iste', None, None, True, 'iste', None),
    (4, 'arei', None, None, True, 'arei', None),
    (4, 'erei', None, None, True, 'erei', None),
    (4, 'irei', None, None, True, 'irei', None),
    (4, 'aram', None, None, True, 'aram', None),
    (4, 'eram', None, None, True, 'eram', None),
    (4, 'iram', None, None, True, 'iram', None),
    (4, 'avam', None, None, True, 'avam', None),
    (4, 'arem', None, None, True, 'arem', None),
    (4, 'erem', None, None, True, 'erem', None),
    (4, 'irem', None, None, True, 'irem', None),
    (4, 'ando', None, None, True, 'ando', None),
    (4, 'endo', None, None, True, 'endo', None),
    (4, 'indo', None, None, True, 'indo', None),
    (4, 'arao', None, None, True, 'arao', None),
    (4, 'erao', None, None, True, 'erao', None),
    (4, 'irao', None, None, True, 'irao', None),
    (4, 'adas', None, None, True, 'adas', None),
    (4, 'idas', None, None, True, 'idas', None),
    (4, 'aras', None, None, True, 'aras', None),
    (4, 'eras', None, None, True, 'eras', None),
    (4, 'iras', None, None, True, 'iras', None),
    (4, 'avas', None, None, True, 'avas', None),
    (4, 'ares', None, None, True, 'ares', None),
    (4, 'eres', None, None, True, 'eres', None),
    (4, 'ires', None, None, True, 'ires', None),
    (4, 'ados', None, None, True, 'ados', None),
    (4, 'idos', None, None, True, 'idos', None),
    (4, 'amos', None, None, True, 'amos', None),
    (4, 'emos', None, None, True, 'emos', None),
    (4, 'imos', None, None, True, 'imos', None),
    (4, 'iras', None, None, True, 'iras', None),
    (4, 'ieis', None, None, True, 'ieis', None),
    (3, 'ada', None, None, True, 'ada', None),
    (3, 'ida', None, None, True, 'ida', None),
    (3, 'ara', None, None, True, 'ara', None),
    (3, 'era', None, None, True, 'era', None),
    (3, 'ira', None, None, True, 'ava', None),
    (3, 'iam', None, None, True, 'iam', None),
    (3, 'ado', None, None, True, 'ado', None),
    (3, 'ido', None, None, True, 'ido', None),
    (3, 'ias', None, None, True, 'ias', None),
    (3, 'ais', None, None, True, 'ais', None),
    (3, 'eis', None, None, True, 'eis', None),
    (3, 'ira', None, None, True, 'ira', None),
    (3, 'ear', None, None, True, 'ear', None),
    (2, 'ia', None, None, True, 'ia', None),
    (2, 'ei', None, None, True, 'ei', None),
    (2, 'am', None, None, True, 'am', None),
    (2, 'em', None, None, True, 'em', None),
    (2, 'ar', None, None, True, 'ar', None),
    (2, 'er', None, None, True, 'er', None),
    (2, 'ir', None, None, True, 'ir', None),
    (2, 'as', None, None, True, 'as', None),
    (2, 'es', None, None, True, 'es', None),
    (2, 'is', None, None, True, 'is', None),
    (2, 'eu', None, None, True, 'eu', None),
    (2, 'iu', None, None, True, 'iu', None),
    (2, 'iu', None, None, True, 'iu', None),
    (2, 'ou', None, None, True, 'ou', None),
)


def _get_r1(v):
    """BrazilianStemmer.getR1 (:127-158): after the first non-vowel
    following a vowel — note the reference scans only to length-1."""
    if v is None:
        return None
    i = len(v) - 1
    j = 0
    while j < i and v[j] not in _VOWELS:
        j += 1
    if not j < i:
        return None
    while j < i and v[j] in _VOWELS:
        j += 1
    if not j < i:
        return None
    return v[j + 1:]


def _get_rv(v):
    """BrazilianStemmer.getRV (:179-238)."""
    if v is None:
        return None
    i = len(v) - 1
    if i > 0 and v[1] not in _VOWELS:
        j = 2
        while j < i and v[j] not in _VOWELS:
            j += 1
        if j < i:
            return v[j + 1:]
    if i > 1 and v[0] in _VOWELS and v[1] in _VOWELS:
        j = 2
        while j < i and v[j] in _VOWELS:
            j += 1
        if j < i:
            return v[j + 1:]
    if i > 2:
        return v[3:]
    return None


def _remove(v, suf):
    return v[: -len(suf)] if v.endswith(suf) else v


def _apply(ct, r1, r2, rv, rules, step1):
    """Run one ordered rule table; returns (new_ct, matched)."""
    regions = {"R1": r1, "R2": r2, "RV": rv}
    outer = ct if step1 else rv
    if outer is None:
        return ct, False
    for gate, suf, reg, prec, assigned, rm_arg, rep_to in rules:
        if gate and len(outer) < gate:
            continue
        if not outer.endswith(suf):
            continue
        if reg is not None:
            r = regions[reg]
            if r is None or not r.endswith(suf):
                continue
        if prec is not None and not _remove(ct, suf).endswith(prec):
            continue
        if assigned:
            if rep_to is not None:
                ct2 = _remove(ct, rm_arg)
                ct = ct if ct2 == ct else ct2 + rep_to
            else:
                ct = _remove(ct, rm_arg)
        return ct, True
    return ct, False


def brazilian_stem(term: str) -> str | None:
    """BrazilianStemmer.stem (:46-78).  Expects the raw (lowercased-
    by-the-chain) token; returns the discriminator, the cleaned term
    for unstemmable input, or None when not indexable (the filter
    keeps the original token in those cases)."""
    # createCT: lowercase, fold accents, strip one leading/trailing
    # punctuation char (:240-404)
    ct = term.lower().translate(_ACCENTS)
    if len(ct) >= 2 and ct[0] in "\"'-,;.?!":
        ct = ct[1:]
    if len(ct) >= 2 and ct[-1] in "-,;.?!'\"":
        ct = ct[:-1]
    if not (2 < len(ct) < 30):
        return None
    if not ct.isalpha():
        return ct
    r1 = _get_r1(ct)
    r2 = _get_r1(r1)
    rv = _get_rv(ct)

    ct, altered = _apply(ct, r1, r2, rv, _BR_STEP1, step1=True)
    if not altered:
        ct, altered = _apply(ct, r1, r2, rv, _BR_STEP2, step1=False)
    if altered:
        # step3: i preceded by c, in RV
        if rv is not None and rv.endswith("i") and _remove(rv, "i").endswith("c"):
            ct = _remove(ct, "i")
    else:
        # step4: residual suffix
        if rv is not None:
            for suf in ("os", "a", "i", "o"):
                if rv.endswith(suf):
                    ct = _remove(ct, suf)
                    break
    # step5
    if rv is not None and rv.endswith("e"):
        if _remove(rv, "e").endswith("gu"):
            ct = _remove(ct, "e")
            ct = _remove(ct, "u")
        elif _remove(rv, "e").endswith("ci"):
            ct = _remove(ct, "e")
            ct = _remove(ct, "i")
        else:
            ct = _remove(ct, "e")
    return ct
