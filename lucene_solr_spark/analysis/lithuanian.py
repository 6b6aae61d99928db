"""Lithuanian snowball stemmer + analyzer chain.

Reference: org/tartarus/snowball/ext/LithuanianStemmer.java (g_v at
:315, step1 a_0 206 case endings, step2 a_1 62 derivational suffixes,
fix_conflicts a_2, fix_chdz/fix_gd) and lt/LithuanianAnalyzer.java
(tokenize -> lowercase -> lt stop -> SnowballFilter(Lithuanian)).
Order of operations (stem():595-737): fix_conflicts, step1 (R1-limited
delete), fix_chdz, step2 (repeated R1-limited delete), fix_chdz,
fix_gd.  The two mojibake entries in a_0 ('omÄ\x97s'/'otÄ\x97s' — the
generated table's own bytes) are reproduced verbatim.  Pinned on the
reference's complete TestLithuanianStemming golden set.
"""

from __future__ import annotations

_LT_VOWELS = frozenset("aeiouy\u0105\u0119\u0117\u012f\u016b\u0173")

_LT_STEP1 = (
    'a', 'ia', 'eria', 'osna', 'iosna', 'uosna', 'iuosna', 'ysna', 'ėsna',
    'e', 'ie', 'enie', 'erie', 'oje', 'ioje', 'uje', 'iuje', 'yje',
    'enyje', 'eryje', 'ėje', 'ame', 'iame', 'sime', 'ome', 'ėme',
    'tumėme', 'ose', 'iose', 'uose', 'iuose', 'yse', 'enyse', 'eryse',
    'ėse', 'ate', 'iate', 'ite', 'kite', 'site', 'ote', 'tute', 'ėte',
    'tumėte', 'i', 'ai', 'iai', 'eriai', 'ei', 'tumei', 'ki', 'imi',
    'erimi', 'umi', 'iumi', 'si', 'asi', 'iasi', 'esi', 'iesi', 'siesi',
    'isi', 'aisi', 'eisi', 'tumeisi', 'uisi', 'osi', 'ėjosi', 'uosi',
    'iuosi', 'siuosi', 'usi', 'ausi', 'čiausi', 'ąsi', 'ėsi', 'ųsi',
    'tųsi', 'ti', 'enti', 'inti', 'oti', 'ioti', 'uoti', 'iuoti', 'auti',
    'iauti', 'yti', 'ėti', 'telėti', 'inėti', 'terėti', 'ui', 'iui',
    'eniui', 'oj', 'ėj', 'k', 'am', 'iam', 'iem', 'im', 'sim', 'om',
    'tum', 'ėm', 'tumėm', 'an', 'on', 'ion', 'un', 'iun', 'ėn', 'o', 'io',
    'enio', 'ėjo', 'uo', 's', 'as', 'ias', 'es', 'ies', 'is', 'ais',
    'iais', 'tumeis', 'imis', 'enimis', 'omis', 'iomis', 'umis', 'ėmis',
    'enis', 'asis', 'ysis', 'ams', 'iams', 'iems', 'ims', 'enims',
    'erims', 'oms', 'ioms', 'ums', 'ėms', 'ens', 'os', 'ios', 'uos',
    'iuos', 'ers', 'us', 'aus', 'iaus', 'ius', 'ys', 'enys', 'erys',
    'omÄ\x97s', 'otÄ\x97s', 'ąs', 'iąs', 'ės', 'amės', 'iamės', 'imės',
    'kimės', 'simės', 'omės', 'ėmės', 'tumėmės', 'atės', 'iatės', 'sitės',
    'otės', 'ėtės', 'tumėtės', 'įs', 'ūs', 'tųs', 'at', 'iat', 'it',
    'sit', 'ot', 'ėt', 'tumėt', 'u', 'au', 'iau', 'čiau', 'iu', 'eniu',
    'siu', 'y', 'ą', 'ią', 'ė', 'ę', 'į', 'enį', 'erį', 'ų', 'ių', 'erų',
)

_LT_STEP2 = (
    'ing', 'aj', 'iaj', 'iej', 'oj', 'ioj', 'uoj', 'iuoj', 'auj', 'ąj',
    'iąj', 'ėj', 'ųj', 'iųj', 'ok', 'iok', 'iuk', 'uliuk', 'učiuk', 'išk',
    'iul', 'yl', 'ėl', 'am', 'dam', 'jam', 'zgan', 'ain', 'esn', 'op',
    'iop', 'ias', 'ies', 'ais', 'iais', 'os', 'ios', 'uos', 'iuos', 'aus',
    'iaus', 'ąs', 'iąs', 'ęs', 'utėait', 'ant', 'iant', 'siant', 'int',
    'ot', 'uot', 'iuot', 'yt', 'ėt', 'ykšt', 'iau', 'dav', 'sv', 'šv',
    'ykšč', 'ę', 'ėję',
)

# fix_conflicts replacements (LithuanianStemmer.java:292-303,418-514)
_LT_CONFLICTS = (
    ("okat\u0117s", "okat\u0117"), ("okate", "okat\u0117"),
    ("ait\u0117s", "ait\u0117"), ("aite", "ait\u0117"),
    ("uot\u0117s", "uot\u0117"), ("uote", "uot\u0117"),
    ("\u0117jime", "\u0117jimas"), ("avime", "avimas"),
    ("ojime", "ojimas"), ("asius", "asys"), ("esiu", "esys"),
)


def _lt_longest(w, p1, suffixes):
    best = None
    for suf in suffixes:
        if (
            (best is None or len(suf) > len(best))
            and len(w) - len(suf) >= p1
            and w.endswith(suf)
        ):
            best = suf
    return best


def lithuanian_stem(w: str) -> str:
    # mark_regions with the reference quirk: words starting with 'a'
    # longer than 6 chars compute R1 from position 1
    n = len(w)
    start = 1 if n > 6 and w.startswith("a") else 0
    i = start
    while i < n and w[i] not in _LT_VOWELS:
        i += 1
    while i < n and w[i] in _LT_VOWELS:
        i += 1
    p1 = i + 1 if i < n else n

    # fix_conflicts (longest match, replace)
    best = None
    for suf, rep in _LT_CONFLICTS:
        if (best is None or len(suf) > len(best[0])) and w.endswith(suf):
            best = (suf, rep)
    if best is not None:
        w = w[: -len(best[0])] + best[1]

    # step1: one R1-limited case-ending delete
    m = _lt_longest(w, p1, _LT_STEP1)
    if m is not None:
        w = w[: -len(m)]

    def fix_chdz(v: str) -> str:
        if v.endswith("\u010d"):
            return v[:-1] + "t"
        if v.endswith("d\u017e"):
            return v[:-2] + "d"
        return v

    w = fix_chdz(w)

    # step2: repeated R1-limited derivational-suffix delete
    while True:
        m = _lt_longest(w, p1, _LT_STEP2)
        if m is None:
            break
        w = w[: -len(m)]

    w = fix_chdz(w)
    if w.endswith("gd"):
        w = w[:-1]
    return w
