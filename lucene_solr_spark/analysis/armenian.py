"""Armenian snowball stemmer + analyzer chain.

Reference: org/tartarus/snowball/ext/ArmenianStemmer.java (g_v at
:222 — the 8 Armenian vowels; a_0 adjective 23, a_1 verb 71, a_2 noun
40, a_3 ending 57 suffix tables) and hy/ArmenianAnalyzer.java
(tokenize -> lowercase -> hy stop -> SnowballFilter(Armenian)).
stem() (:421-497): the whole backward pass is limited to start >= pV
(after the first vowel); ending is additionally R2-limited; then
verb, adjective, noun deletes run in sequence, each a longest-match
delete.  Verified on the reference's TestArmenianAnalyzer goldens.
"""

from __future__ import annotations

_HY_VOWELS = frozenset("\u0561\u0565\u0567\u0568\u056b\u0578\u0582\u0585")

_HY_ADJ = (
    'րորդ', 'երորդ', 'ալի', 'ակի', 'որակ', 'եղ', 'ական', 'արան', 'են',
    'եկեն', 'երեն', 'որէն', 'ին', 'գին', 'ովին', 'լայն', 'վուն', 'պես',
    'իվ', 'ատ', 'ավետ', 'կոտ', 'բար',
)

_HY_VERB = (
    'ա', 'ացա', 'եցա', 'վե', 'ացրի', 'ացի', 'եցի', 'վեցի', 'ալ', 'ըալ',
    'անալ', 'ենալ', 'ացնալ', 'ել', 'ըել', 'նել', 'ցնել', 'եցնել', 'չել',
    'վել', 'ացվել', 'եցվել', 'տել', 'ատել', 'ոտել', 'կոտել', 'ված', 'ում',
    'վում', 'ան', 'ցան', 'ացան', 'ացրին', 'ացին', 'եցին', 'վեցին', 'ալիս',
    'ելիս', 'ավ', 'ացավ', 'եցավ', 'ալով', 'ելով', 'ար', 'ացար', 'եցար',
    'ացրիր', 'ացիր', 'եցիր', 'վեցիր', 'աց', 'եց', 'ացրեց', 'ալուց',
    'ելուց', 'ալու', 'ելու', 'աք', 'ցաք', 'ացաք', 'ացրիք', 'ացիք', 'եցիք',
    'վեցիք', 'անք', 'ցանք', 'ացանք', 'ացրինք', 'ացինք', 'եցինք', 'վեցինք',
)

_HY_NOUN = (
    'որդ', 'ույթ', 'ուհի', 'ցի', 'իլ', 'ակ', 'յակ', 'անակ', 'իկ', 'ուկ',
    'ան', 'պան', 'ստան', 'արան', 'եղէն', 'յուն', 'ություն', 'ածո', 'իչ',
    'ուս', 'ուստ', 'գար', 'վոր', 'ավոր', 'ոց', 'անօց', 'ու', 'ք', 'չեք',
    'իք', 'ալիք', 'անիք', 'վածք', 'ույք', 'ենք', 'ոնք', 'ունք', 'մունք',
    'իչք', 'արք',
)

_HY_ENDING = (
    'սա', 'վա', 'ամբ', 'դ', 'անդ', 'ությանդ', 'վանդ', 'ոջդ', 'երդ',
    'ներդ', 'ուդ', 'ը', 'անը', 'ությանը', 'վանը', 'ոջը', 'երը', 'ները',
    'ի', 'վի', 'երի', 'ների', 'անում', 'երում', 'ներում', 'ն', 'ան',
    'ության', 'վան', 'ին', 'երին', 'ներին', 'ությանն', 'երն', 'ներն',
    'ուն', 'ոջ', 'ությանս', 'վանս', 'ոջս', 'ով', 'անով', 'վով', 'երով',
    'ներով', 'եր', 'ներ', 'ց', 'ից', 'վանից', 'ոջից', 'վից', 'երից',
    'ներից', 'ցից', 'ոց', 'ուց',
)


def _hy_longest(w, p, suffixes):
    best = None
    for suf in suffixes:
        if (
            (best is None or len(suf) > len(best))
            and len(w) - len(suf) >= p
            and w.endswith(suf)
        ):
            best = suf
    return best


def armenian_stem(w: str) -> str:
    n = len(w)
    # mark_regions: pV after the first vowel; p2 after the non-vowel
    # following the second vowel group
    i = 0
    while i < n and w[i] not in _HY_VOWELS:
        i += 1
    if i >= n:
        return w
    pv = i + 1
    # p2: gopast non-vowel, gopast vowel, gopast non-vowel (best
    # effort — an early end leaves p2 at the word end, 'do' semantics)
    p2 = n
    i = pv
    while i < n and w[i] in _HY_VOWELS:
        i += 1
    if i < n:  # first non-vowel passed
        i += 1
        while i < n and w[i] not in _HY_VOWELS:
            i += 1
        if i < n:  # second vowel passed
            i += 1
            while i < n and w[i] in _HY_VOWELS:
                i += 1
            if i < n:  # second non-vowel passed
                p2 = i + 1

    # ending: longest match within the pV setlimit, then a post-hoc R2
    # check on THAT match (no shorter-entry retry), like the reference
    m = _hy_longest(w, pv, _HY_ENDING)
    if m is not None and len(w) - len(m) >= p2:
        w = w[: -len(m)]
    for table in (_HY_VERB, _HY_ADJ, _HY_NOUN):
        m = _hy_longest(w, pv, table)
        if m is not None:
            w = w[: -len(m)]
    return w
