"""Irish snowball stemmer + analyzer chain.

Reference: org/tartarus/snowball/ext/IrishStemmer.java (g_v at :108 =
aeiou + fada vowels; initial_morph a_0 24 mutation prefixes, noun_sfx
a_1 16, deriv a_2 25, verb_sfx a_3 12) and ga/IrishAnalyzer.java:
132-142 (tokenize -> StopFilter(HYPHENATIONS h/n/t) -> ElisionFilter
(d/m/b) -> IrishLowerCaseFilter -> ga stop -> SnowballFilter(Irish));
ga/IrishLowerCaseFilter.java:40-85 inserts '-' after an initial n/t
before an uppercase vowel, then lowercases.  Verified on the
reference's TestIrishAnalyzer / TestIrishLowerCaseFilter goldens.
"""

from __future__ import annotations

_GA_VOWELS = frozenset("aeiou\u00e1\u00e9\u00ed\u00f3\u00fa")
_GA_UPPER_VOWELS = frozenset("AEIOU\u00c1\u00c9\u00cd\u00d3\u00da")

_GA_INITIAL = (
    ("b'",4), ('bh',14), ('bhf',9), ('bp',11), ('ch',15), ("d'",2),
    ("d'fh",3), ('dh',16), ('dt',13), ('fh',17), ('gc',7), ('gh',18),
    ('h-',1), ("m'",4), ('mb',6), ('mh',19), ('n-',1), ('nd',8),
    ('ng',10), ('ph',20), ('sh',5), ('t-',1), ('th',21), ('ts',12),
)

_GA_NOUN = (
    ('íochta',1), ('aíochta',1), ('ire',2), ('aire',2), ('abh',1),
    ('eabh',1), ('ibh',1), ('aibh',1), ('amh',1), ('eamh',1), ('imh',1),
    ('aimh',1), ('íocht',1), ('aíocht',1), ('irí',2), ('airí',2),
)

_GA_DERIV = (
    ('óideacha',6), ('patacha',5), ('achta',1), ('arcachta',2),
    ('eachta',1), ('grafaíochta',4), ('paite',5), ('ach',1), ('each',1),
    ('óideach',6), ('gineach',3), ('patach',5), ('grafaíoch',4),
    ('pataigh',5), ('óidigh',6), ('achtúil',1), ('eachtúil',1),
    ('gineas',3), ('ginis',3), ('acht',1), ('arcacht',2), ('eacht',1),
    ('grafaíocht',4), ('arcachtaí',2), ('grafaíochtaí',4),
)

_GA_VERB = (
    ('imid',1), ('aimid',1), ('ímid',1), ('aímid',1), ('adh',2),
    ('eadh',2), ('faidh',1), ('fidh',1), ('áil',2), ('ain',2), ('tear',2),
    ('tar',2),
)


# initial_morph case -> replacement ('' = delete the prefix)
_GA_INITIAL_ACT = {
    1: "", 2: "", 3: "f", 4: "", 5: "s", 6: "b", 7: "c", 8: "d",
    9: "f", 10: "g", 11: "p", 12: "s", 13: "t", 14: "b", 15: "c",
    16: "d", 17: "f", 18: "g", 19: "m", 20: "p", 21: "t",
}
_GA_NOUN_ACT = {1: "R1", 2: "R2"}
_GA_DERIV_ACT = {1: ("R2", ""), 2: (None, "arc"), 3: (None, "gin"),
                 4: (None, "graf"), 5: (None, "paite"),
                 6: (None, "\u00f3id")}
_GA_VERB_ACT = {1: "RV", 2: "R1"}


def irish_lowercase(tok: str) -> str:
    """IrishLowerCaseFilter: n/t + uppercase vowel -> n-/t- prefix."""
    if len(tok) > 1 and tok[0] in ("n", "t") and tok[1] in _GA_UPPER_VOWELS:
        return tok[0] + "-" + tok[1:].lower()
    return tok[0] + tok[1:].lower() if tok else tok


def _ga_longest_suffix(w, table):
    best = None
    for suf, case in table:
        if (best is None or len(suf) > len(best[0])) and w.endswith(suf):
            best = (suf, case)
    return best


def irish_stem(w: str) -> str:
    # initial_morph: longest matching mutation prefix, de-mutated
    best = None
    for pre, case in _GA_INITIAL:
        if (best is None or len(pre) > len(best[0])) and w.startswith(pre):
            best = (pre, case)
    if best is not None:
        w = _GA_INITIAL_ACT[best[1]] + w[len(best[0]):]

    # mark_regions: pV after the first vowel; p1/p2 standard
    n = len(w)
    i = 0
    while i < n and w[i] not in _GA_VOWELS:
        i += 1
    pv = i + 1 if i < n else n

    def scan(start):
        j = start
        while j < n and w[j] not in _GA_VOWELS:
            j += 1
        while j < n and w[j] in _GA_VOWELS:
            j += 1
        return j + 1 if j < n else n

    p1 = scan(0)
    p2 = scan(p1) if p1 < n else n
    regions = {"RV": pv, "R1": p1, "R2": p2}

    # noun_sfx, deriv, verb_sfx — each a do-block at the word end
    m = _ga_longest_suffix(w, _GA_NOUN)
    if m is not None and len(w) - len(m[0]) >= regions[_GA_NOUN_ACT[m[1]]]:
        w = w[: -len(m[0])]
    m = _ga_longest_suffix(w, _GA_DERIV)
    if m is not None:
        region, rep = _GA_DERIV_ACT[m[1]]
        if region is None or len(w) - len(m[0]) >= regions[region]:
            w = w[: -len(m[0])] + rep
    m = _ga_longest_suffix(w, _GA_VERB)
    if m is not None and len(w) - len(m[0]) >= regions[_GA_VERB_ACT[m[1]]]:
        w = w[: -len(m[0])]
    return w
