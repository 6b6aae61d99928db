"""Snowball stemmers for the analyzer chains that end in SnowballFilter.

Implemented from the published Snowball algorithm descriptions
(snowballstem.org) and pinned, word-for-word, on the reference's
COMPLETE vocabulary fixtures — the voc.txt/output.txt pairs the
reference itself tests its generated stemmers with
(lucene/analysis/common/src/test/org/apache/lucene/analysis/snowball/
TestSnowballVocab.java:38-58, TestSnowballVocabData.zip):
danish 23,829 words, dutch 45,669, romanian 22,570, turkish 96,325.

Reference chain provenance:
- analysis/da/DanishAnalyzer.java:105-115 (tokenize -> lowercase ->
  da stop -> SnowballFilter(DanishStemmer))
- analysis/nl/DutchAnalyzer.java:122-133 (adds a 4-entry
  StemmerOverrideFilter before the snowball step)
- analysis/ro/RomanianAnalyzer.java:107-117
- analysis/tr/TurkishAnalyzer.java:103-114 (ApostropheFilter ->
  TurkishLowerCaseFilter -> tr stop -> SnowballFilter(TurkishStemmer))

The generated Java in org/tartarus/snowball/ext/ was consulted only to
pin the suffix tables and region rules (file:line cites per stemmer);
the code here is a direct expression of each algorithm over Python
strings, not a mechanical translation of the interpreter-style
generated code.
"""

from __future__ import annotations


def _longest_suffix(w: str, p: int, suffixes) -> str | None:
    """Longest entry that is a suffix of ``w`` AND starts at or after
    region position ``p`` (Snowball's find_among_b under setlimit)."""
    best = None
    for suf in suffixes:
        if (
            (best is None or len(suf) > len(best))
            and len(w) - len(suf) >= p
            and w.endswith(suf)
        ):
            best = suf
    return best


# ------------------------------------------------------- English (Porter2)

_EN_V = frozenset("aeiouy")
_EN_V_WXY = _EN_V | {"w", "x", "Y"}
_EN_VALID_LI = frozenset("cdeghkmnrt")
_EN_DOUBLE = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_EN_EXC1 = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    "sky": "sky", "news": "news", "howe": "howe", "atlas": "atlas",
    "cosmos": "cosmos", "bias": "bias", "andes": "andes",
}
_EN_EXC2 = frozenset(
    ("succeed", "proceed", "exceed", "canning", "inning", "earring",
     "herring", "outing")
)
_EN_STEP2 = {
    "tional": "tion", "enci": "ence", "anci": "ance", "abli": "able",
    "entli": "ent", "izer": "ize", "ization": "ize",
    "ational": "ate", "ation": "ate", "ator": "ate", "alism": "al",
    "aliti": "al", "alli": "al", "fulness": "ful", "ousli": "ous",
    "ousness": "ous", "iveness": "ive", "iviti": "ive",
    "biliti": "ble", "bli": "ble", "fulli": "ful", "lessli": "less",
}
_EN_STEP3 = {
    "tional": "tion", "ational": "ate", "alize": "al",
    "icate": "ic", "iciti": "ic", "ical": "ic", "ful": "", "ness": "",
}
_EN_STEP4 = (
    "ic", "ance", "ence", "able", "ible", "ate", "ive", "ize", "iti",
    "al", "ism", "er", "ous", "ant", "ent", "ment", "ement",
)


def _en_shortv(w: str, end: int) -> bool:
    """shortv at position ``end`` (EnglishStemmer.java:373-412):
    non-WXY-vowel + vowel + non-vowel, or word-initial vowel +
    non-vowel."""
    if end >= 3:
        if (
            w[end - 1] not in _EN_V_WXY
            and w[end - 2] in _EN_V
            and w[end - 3] not in _EN_V
        ):
            return True
    if end == 2 and w[0] in _EN_V and w[1] not in _EN_V:
        return True
    return False


def english_stem(w: str) -> str:  # noqa: C901 — Porter2's rule ladder
    """Snowball English / Porter2 (EnglishStemmer.java) — the
    SnowballPorterFilterFactory language="English" configuration (the
    default EnglishAnalyzer keeps classic Porter, analysis/porter.py)."""
    if w in _EN_EXC1:
        return _EN_EXC1[w]
    if len(w) < 3:
        return w

    # prelude: strip a leading apostrophe; y -> Y at start/after vowel
    if w.startswith("'"):
        w = w[1:]
    s = list(w)
    if s and s[0] == "y":
        s[0] = "Y"
    for k in range(1, len(s)):
        if s[k] == "y" and s[k - 1] in _EN_V:
            s[k] = "Y"
    w = "".join(s)

    # mark_regions (special gener/commun/arsen prefixes)
    n = len(w)
    p1 = None
    for pre in ("gener", "commun", "arsen"):
        if w.startswith(pre):
            p1 = len(pre)
            break
    if p1 is None:
        i = 0
        while i < n and w[i] not in _EN_V:
            i += 1
        while i < n and w[i] in _EN_V:
            i += 1
        p1 = i + 1 if i < n else n
    i = p1
    while i < n and w[i] not in _EN_V:
        i += 1
    while i < n and w[i] in _EN_V:
        i += 1
    p2 = i + 1 if i < n else n

    # step 0: 's' / 's / '
    for suf in ("'s'", "'s", "'"):
        if w.endswith(suf):
            w = w[: -len(suf)]
            break

    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith(("ied", "ies")):
        w = w[:-3] + ("i" if len(w) - 3 > 1 else "ie")
    elif w.endswith(("ss", "us")):
        pass
    elif w.endswith("s"):
        if any(c in _EN_V for c in w[: -2]):
            w = w[:-1]

    if w in _EN_EXC2:
        return w

    # step 1b
    m = _longest_suffix(w, 0, ("ed", "eed", "ing", "edly", "eedly",
                               "ingly"))
    if m in ("eed", "eedly"):
        if len(w) - len(m) >= p1:
            w = w[: -len(m)] + "ee"
    elif m is not None:
        stem = w[: -len(m)]
        if any(c in _EN_V for c in stem):
            w = stem
            if w.endswith(("at", "bl", "iz")):
                w += "e"
            elif w.endswith(_EN_DOUBLE):
                w = w[:-1]
            elif len(w) == p1 and _en_shortv(w, len(w)):
                w += "e"

    # step 1c: y/Y -> i after a non-vowel that is not word-initial
    if (
        len(w) > 2
        and w[-1] in ("y", "Y")
        and w[-2] not in _EN_V
    ):
        w = w[:-1] + "i"

    # step 2 (R1)
    m = _longest_suffix(w, 0, tuple(_EN_STEP2) + ("ogi", "li"))
    if m is not None and len(w) - len(m) >= p1:
        if m == "ogi":
            if w[:-3].endswith("l"):
                w = w[:-1]
        elif m == "li":
            if w[:-2].endswith(tuple(_EN_VALID_LI)):
                w = w[:-2]
        else:
            w = w[: -len(m)] + _EN_STEP2[m]

    # step 3 (R1; ative needs R2)
    m = _longest_suffix(w, 0, tuple(_EN_STEP3) + ("ative",))
    if m is not None and len(w) - len(m) >= p1:
        if m == "ative":
            if len(w) - 5 >= p2:
                w = w[:-5]
        else:
            w = w[: -len(m)] + _EN_STEP3[m]

    # step 4 (R2; ion after s/t)
    m = _longest_suffix(w, 0, _EN_STEP4 + ("ion",))
    if m is not None and len(w) - len(m) >= p2:
        if m == "ion":
            if w[:-3].endswith(("s", "t")):
                w = w[:-3]
        else:
            w = w[: -len(m)]

    # step 5
    if w.endswith("e"):
        if len(w) - 1 >= p2 or (
            len(w) - 1 >= p1 and not _en_shortv(w, len(w) - 1)
        ):
            w = w[:-1]
    elif w.endswith("l"):
        if len(w) - 1 >= p2 and w[:-1].endswith("l"):
            w = w[:-1]

    return w.replace("Y", "y")


# --------------------------------------------------------------- German2

_DE2_VOWELS = frozenset("aeiouyäöü")
_DE2_S_END = frozenset("bdfghklmnrt")
_DE2_ST_END = frozenset("bdfghklmnt")


def german2_stem(w: str) -> str:
    """Snowball German2 (German2Stemmer.java:20-85 tables, stem():
    690-745) — the SnowballPorterFilterFactory language="German2"
    configuration: folds ae/oe/ue spellings to umlauts in the prelude
    (skipping qu), ß -> ss, u/y between vowels marked as consonants."""
    # prelude part 1: u/y between vowels -> U/Y
    s = list(w)
    for k in range(1, len(s) - 1):
        if (
            s[k] in ("u", "y")
            and s[k - 1] in _DE2_VOWELS
            and s[k + 1] in _DE2_VOWELS
        ):
            s[k] = s[k].upper()
    # prelude part 2: left-to-right substitution sweep
    out: list[str] = []
    k = 0
    n = len(s)
    while k < n:
        two = "".join(s[k:k + 2])
        if s[k] == "ß":
            out.append("ss")
            k += 1
        elif two == "qu":
            # 'qu' hops TWO more chars (German2Stemmer.java:205-215):
            # the following pair is protected from folding; if fewer
            # than 2 chars remain the sweep stops entirely
            if k + 4 <= n:
                out.extend(s[k:k + 4])
                k += 4
            else:
                out.extend(s[k:])
                k = n
        elif two == "ae":
            out.append("ä")
            k += 2
        elif two == "oe":
            out.append("ö")
            k += 2
        elif two == "ue":
            out.append("ü")
            k += 2
        else:
            out.append(s[k])
            k += 1
    return _german_steps("".join(out))


def german_stem(w: str) -> str:
    """Snowball German (GermanStemmer.java) — identical suffix tables
    to German2 (a_1-a_4 == German2 a_2-a_5); the prelude only maps
    ß -> ss and marks u/y between vowels, with NO ae/oe/ue folding.
    SnowballPorterFilterFactory language="German" configuration."""
    s = list(w.replace("ß", "ss"))
    for k in range(1, len(s) - 1):
        if (
            s[k] in ("u", "y")
            and s[k - 1] in _DE2_VOWELS
            and s[k + 1] in _DE2_VOWELS
        ):
            s[k] = s[k].upper()
    return _german_steps("".join(s))


def _german_steps(w: str) -> str:
    """Shared German/German2 region marking + steps 1-3 + postlude."""
    # regions: standard R1/R2, R1 clamped to >= 3
    n = len(w)

    def scan(start):
        i = start
        while i < n and w[i] not in _DE2_VOWELS:
            i += 1
        while i < n and w[i] in _DE2_VOWELS:
            i += 1
        return i + 1 if i < n else n

    p1_raw = scan(0)
    p2 = scan(p1_raw) if p1_raw < n else n
    p1 = max(p1_raw, 3)

    # step 1 (a_2, post-R1-check on the longest match)
    m = _longest_suffix(w, 0, ("e", "em", "en", "ern", "er", "s",
                               "es"))
    if m is not None and len(w) - len(m) >= p1:
        if m != "s":
            w = w[: -len(m)]
        elif len(w) >= 2 and w[-2] in _DE2_S_END:
            w = w[:-1]

    # step 2 (a_3): en/er/est delete; st after st_ending with >= 3
    # more chars before it
    m = _longest_suffix(w, 0, ("en", "er", "st", "est"))
    if m is not None and len(w) - len(m) >= p1:
        if m != "st":
            w = w[: -len(m)]
        elif (
            len(w) >= 3
            and w[-3] in _DE2_ST_END
            and len(w) - 6 >= 0
        ):
            w = w[:-2]

    # step 3 (a_5, R2 derivational)
    m = _longest_suffix(w, 0, ("end", "ig", "ung", "lich", "isch",
                               "ik", "heit", "keit"))
    if m is not None and len(w) - len(m) >= p2:
        if m in ("end", "ung"):
            w = w[: -len(m)]
            if (
                w.endswith("ig")
                and len(w) - 2 >= p2
                and not w[:-2].endswith("e")
            ):
                w = w[:-2]
        elif m in ("ig", "ik", "isch"):
            if not w[: -len(m)].endswith("e"):
                w = w[: -len(m)]
        elif m in ("lich", "heit"):
            w = w[: -len(m)]
            m2 = _longest_suffix(w, p1, ("er", "en"))
            if m2 is not None:
                w = w[:-2]
        elif m == "keit":
            w = w[:-4]
            m2 = _longest_suffix(w, 0, ("lich", "ig"))
            if m2 is not None and len(w) - len(m2) >= p2:
                w = w[: -len(m2)]

    # postlude
    return (
        w.replace("U", "u").replace("Y", "y")
        .replace("ä", "a").replace("ö", "o").replace("ü", "u")
    )


# --------------------------------------------------------------- Spanish

_ES_VOWELS = frozenset("aeiouáéíóúü")
_ES_UNACCENT = str.maketrans("áéíóú", "aeiou")
_ES_PRONOUNS = ("me", "se", "sela", "selo", "selas", "selos", "la",
                "le", "lo", "las", "les", "los", "nos")
_ES_GERUNDS_ACC = {"iéndo": "iendo", "ándo": "ando", "ár": "ar",
                   "ér": "er", "ír": "ir"}
_ES_GERUNDS_PLAIN = ("ando", "iendo", "ar", "er", "ir")
_ES_S1_DELETE_R2 = (
    "anza", "anzas", "ico", "ica", "icos", "icas", "ismo", "ismos",
    "able", "ables", "ible", "ibles", "ista", "istas", "oso", "osa",
    "osos", "osas", "amiento", "amientos", "imiento", "imientos",
)
_ES_S1_IC = ("adora", "ador", "ación", "adoras", "adores", "aciones",
             "ante", "antes", "ancia", "ancias")
_ES_S2A = ("ya", "ye", "yan", "yen", "yeron", "yendo", "yo", "yó",
           "yas", "yes", "yais", "yamos")
_ES_S2B_GU = ("en", "es", "éis", "emos")
_ES_S2B = (
    "arían", "arías", "arán", "arás", "aríais", "aría", "aréis",
    "aríamos", "aremos", "ará", "aré", "erían", "erías", "erán",
    "erás", "eríais", "ería", "eréis", "eríamos", "eremos", "erá",
    "eré", "irían", "irías", "irán", "irás", "iríais", "iría",
    "iréis", "iríamos", "iremos", "irá", "iré", "aba", "ada", "ida",
    "ía", "ara", "iera", "ad", "ed", "id", "ase", "iese", "aste",
    "iste", "an", "aban", "ían", "aran", "ieran", "asen", "iesen",
    "aron", "ieron", "ado", "ido", "ando", "iendo", "ió", "ar", "er",
    "ir", "as", "abas", "adas", "idas", "ías", "aras", "ieras",
    "ases", "ieses", "ís", "áis", "abais", "íais", "arais", "ierais",
    "aseis", "ieseis", "asteis", "isteis", "ados", "idos", "amos",
    "ábamos", "íamos", "imos", "áramos", "iéramos", "iésemos",
    "ásemos",
)
_ES_S3_DELETE = ("os", "a", "o", "á", "í", "ó")


def _romance_rv(w: str, vowels) -> int:
    """RV for the Romance stemmers (SpanishStemmer.java r_mark_regions):
    second letter consonant -> after next vowel; first two letters
    vowels -> after next consonant; else after the third letter."""
    n = len(w)
    if n < 3:
        return n
    if w[1] not in vowels:
        i = 2
        while i < n and w[i] not in vowels:
            i += 1
        return i + 1 if i < n else n
    if w[0] in vowels and w[1] in vowels:
        i = 2
        while i < n and w[i] in vowels:
            i += 1
        return i + 1 if i < n else n
    return 3


def _std_regions(w: str, vowels) -> tuple[int, int]:
    """Standard R1/R2: after the first non-vowel following a vowel."""
    n = len(w)

    def scan(start):
        i = start
        while i < n and w[i] not in vowels:
            i += 1
        while i < n and w[i] in vowels:
            i += 1
        return i + 1 if i < n else n

    p1 = scan(0)
    p2 = scan(p1) if p1 < n else n
    return p1, p2


def spanish_stem(w: str) -> str:  # noqa: C901 — mirrors the rule ladder
    """Snowball Spanish (SpanishStemmer.java) — the default
    SpanishAnalyzer keeps SpanishLightStemFilter; this is the
    SnowballPorterFilterFactory language="Spanish" configuration,
    pinned on the reference's complete 28,377-word vocabulary."""
    rv = _romance_rv(w, _ES_VOWELS)
    p1, p2 = _std_regions(w, _ES_VOWELS)

    # step 0: attached pronoun (pronoun match unrestricted; the gerund/
    # infinitive ending before it must start in RV)
    pron = _longest_suffix(w, 0, _ES_PRONOUNS)
    if pron is not None:
        base = w[: -len(pron)]
        g = _longest_suffix(
            base, rv,
            tuple(_ES_GERUNDS_ACC) + _ES_GERUNDS_PLAIN + ("yendo",),
        )
        if g in _ES_GERUNDS_ACC:
            w = base[: -len(g)] + _ES_GERUNDS_ACC[g]
        elif g == "yendo":
            if len(base) > 5 and base[-6] == "u":
                w = base
        elif g is not None:
            w = base

    # step 1: standard suffix removal (single longest match, then its
    # own region condition; no fallback to shorter suffixes)
    changed = False
    m = _longest_suffix(
        w, 0,
        _ES_S1_DELETE_R2 + _ES_S1_IC
        + ("logía", "logías", "ución", "uciones", "encia", "encias",
           "amente", "mente", "idad", "idades", "iva", "ivo", "ivas",
           "ivos"),
    )
    if m is not None:
        start = len(w) - len(m)
        if m in ("logía", "logías"):
            if start >= p2:
                w = w[:start] + "log"
                changed = True
        elif m in ("ución", "uciones"):
            if start >= p2:
                w = w[:start] + "u"
                changed = True
        elif m in ("encia", "encias"):
            if start >= p2:
                w = w[:start] + "ente"
                changed = True
        elif m == "amente":
            if start >= p1:
                w = w[:start]
                changed = True
                if w.endswith("iv") and len(w) - 2 >= p2:
                    w = w[:-2]
                    if w.endswith("at") and len(w) - 2 >= p2:
                        w = w[:-2]
                else:
                    m2 = _longest_suffix(w, p2, ("os", "ic", "ad"))
                    if m2 is not None:
                        w = w[:-2]
        elif m == "mente":
            if start >= p2:
                w = w[:start]
                changed = True
                m2 = _longest_suffix(w, p2, ("ante", "able", "ible"))
                if m2 is not None:
                    w = w[: -len(m2)]
        elif m in ("idad", "idades"):
            if start >= p2:
                w = w[:start]
                changed = True
                m2 = _longest_suffix(w, p2, ("abil", "ic", "iv"))
                if m2 is not None:
                    w = w[: -len(m2)]
        elif m in ("iva", "ivo", "ivas", "ivos"):
            if start >= p2:
                w = w[:start]
                changed = True
                if w.endswith("at") and len(w) - 2 >= p2:
                    w = w[:-2]
        elif m in _ES_S1_IC:
            if start >= p2:
                w = w[:start]
                changed = True
                if w.endswith("ic") and len(w) - 2 >= p2:
                    w = w[:-2]
        else:  # plain delete-if-R2 group
            if start >= p2:
                w = w[:start]
                changed = True

    # step 2a: verb suffixes beginning y (suffix in RV, preceding u
    # may be outside RV); only if step 1 removed nothing
    if not changed:
        m = _longest_suffix(w, rv, _ES_S2A)
        if m is not None and len(w) - len(m) >= 1 \
                and w[len(w) - len(m) - 1] == "u":
            w = w[: -len(m)]
            changed = True
        if not changed:
            # step 2b: other verb suffixes in RV
            m = _longest_suffix(w, rv, _ES_S2B + _ES_S2B_GU)
            if m is not None:
                w = w[: -len(m)]
                if m in _ES_S2B_GU and w.endswith("gu"):
                    w = w[:-1]

    # step 3: residual suffix in RV
    m = _longest_suffix(w, rv, _ES_S3_DELETE + ("e", "é"))
    if m is not None:
        w = w[: -len(m)]
        if m in ("e", "é") and w.endswith("gu") and len(w) - 1 >= rv:
            w = w[:-1]

    return w.translate(_ES_UNACCENT)


# --------------------------------------------------------------- Italian

_IT_VOWELS = frozenset("aeiouàèìòù")
_IT_ACUTE = str.maketrans("áéíóú", "àèìòù")
_IT_AEIO = frozenset("aeioàèìò")
_IT_PRONOUNS = (
    "la", "cela", "gliela", "mela", "tela", "vela", "le", "cele",
    "gliele", "mele", "tele", "vele", "ne", "cene", "gliene", "mene",
    "sene", "tene", "vene", "ci", "li", "celi", "glieli", "meli",
    "teli", "veli", "gli", "mi", "si", "ti", "vi", "lo", "celo",
    "glielo", "melo", "telo", "velo",
)
_IT_S1_R2 = (
    "ica", "osa", "ista", "anza", "ice", "atrice", "iche", "abile",
    "ibile", "ose", "ante", "mente", "iste", "anze", "ici", "atrici",
    "ichi", "abili", "ibili", "ismi", "osi", "anti", "isti", "ico",
    "ismo", "oso", "istà", "istè", "istì",
)
_IT_S1_IC = ("azione", "azioni", "atore", "atori")
_IT_VERB = (
    "isca", "enda", "ata", "ita", "uta", "ava", "eva", "iva",
    "erebbe", "irebbe", "isce", "ende", "are", "ere", "ire", "asse",
    "ate", "avate", "evate", "ivate", "ete", "erete", "irete", "ite",
    "ereste", "ireste", "ute", "erai", "irai", "isci", "endi",
    "erei", "irei", "assi", "ati", "iti", "eresti", "iresti", "uti",
    "avi", "evi", "ivi", "isco", "ando", "endo", "Yamo", "iamo",
    "avamo", "evamo", "ivamo", "eremo", "iremo", "assimo", "ammo",
    "emmo", "eremmo", "iremmo", "immo", "ano", "iscano", "avano",
    "evano", "ivano", "eranno", "iranno", "ono", "iscono", "arono",
    "erono", "irono", "erebbero", "irebbero", "assero", "essero",
    "issero", "ato", "ito", "uto", "avo", "evo", "ivo", "ar", "ir",
    "erà", "irà", "erò", "irò",
)


def italian_stem(w: str) -> str:  # noqa: C901 — mirrors the rule ladder
    """Snowball Italian (ItalianStemmer.java a_0-a_7 tables) — the
    SnowballPorterFilterFactory language="Italian" configuration (the
    default ItalianAnalyzer keeps ItalianLightStem); pinned on the
    reference's complete vocabulary."""
    # prelude sweep 1: acute -> grave, qu -> qU
    w = w.translate(_IT_ACUTE)
    out: list[str] = []
    k = 0
    n = len(w)
    while k < n:
        if w[k] == "q" and k + 1 < n and w[k + 1] == "u":
            out.append("qU")
            k += 2
        else:
            out.append(w[k])
            k += 1
    s = list("".join(out))
    # prelude sweep 2: u/i between vowels -> U/I
    n = len(s)
    for k in range(1, n - 1):
        if s[k] in ("u", "i") and s[k - 1] in _IT_VOWELS \
                and s[k + 1] in _IT_VOWELS:
            s[k] = s[k].upper()
    w = "".join(s)

    rv = _romance_rv(w, _IT_VOWELS)
    p1, p2 = _std_regions(w, _IT_VOWELS)

    # step 0: attached pronoun — longest pronoun, then longest of the
    # a_3 endings, whose START must lie in RV (no fallback)
    pron = _longest_suffix(w, 0, _IT_PRONOUNS)
    if pron is not None:
        base = w[: -len(pron)]
        g = _longest_suffix(base, 0, ("ando", "endo", "ar", "er",
                                      "ir"))
        if g is not None and len(base) - len(g) >= rv:
            if g in ("ando", "endo"):
                w = base
            else:
                w = base + "e"

    # step 1: standard suffixes (longest match, then its condition)
    s1_done = False
    m = _longest_suffix(
        w, 0,
        _IT_S1_R2 + _IT_S1_IC
        + ("logia", "logie", "uzione", "uzioni", "usione", "usioni",
           "enza", "enze", "amento", "amenti", "imento", "imenti",
           "amente", "ità", "ivo", "ivi", "iva", "ive"),
    )
    if m is not None:
        start = len(w) - len(m)
        if m == "amente":
            if start >= p1:
                w = w[:start]
                s1_done = True
                m2 = _longest_suffix(w, 0, ("ic", "abil", "os", "iv"))
                if m2 is not None and len(w) - len(m2) >= p2:
                    w = w[: -len(m2)]
                    if m2 == "iv" and w.endswith("at") \
                            and len(w) - 2 >= p2:
                        w = w[:-2]
        elif m in ("amento", "amenti", "imento", "imenti"):
            if start >= rv:
                w = w[:start]
                s1_done = True
        elif m in _IT_S1_IC:
            if start >= p2:
                w = w[:start]
                s1_done = True
                if w.endswith("ic") and len(w) - 2 >= p2:
                    w = w[:-2]
        elif m in ("logia", "logie"):
            if start >= p2:
                w = w[:start] + "log"
                s1_done = True
        elif m in ("uzione", "uzioni", "usione", "usioni"):
            if start >= p2:
                w = w[:start] + "u"
                s1_done = True
        elif m in ("enza", "enze"):
            if start >= p2:
                w = w[:start] + "ente"
                s1_done = True
        elif m == "ità":
            if start >= p2:
                w = w[:start]
                s1_done = True
                m2 = _longest_suffix(w, 0, ("ic", "abil", "iv"))
                if m2 is not None and len(w) - len(m2) >= p2:
                    w = w[: -len(m2)]
        elif m in ("ivo", "ivi", "iva", "ive"):
            if start >= p2:
                w = w[:start]
                s1_done = True
                if w.endswith("at") and len(w) - 2 >= p2:
                    w = w[:-2]
                    if w.endswith("ic") and len(w) - 2 >= p2:
                        w = w[:-2]
        else:  # plain delete-if-R2
            if start >= p2:
                w = w[:start]
                s1_done = True

    # step 2: verb suffixes in RV, only if step 1 removed nothing
    if not s1_done:
        m = _longest_suffix(w, rv, _IT_VERB)
        if m is not None:
            w = w[: -len(m)]

    # step 3a: final a/e/i/o/à/è/ì/ò in RV, then a preceding i in RV
    if w and w[-1] in _IT_AEIO and len(w) - 1 >= rv:
        w = w[:-1]
        if w.endswith("i") and len(w) - 1 >= rv:
            w = w[:-1]
    # step 3b: final h after c/g — the RV check sits at the c/g
    # position (ItalianStemmer.r_vowel_suffix consumes c/g before RV)
    if w.endswith(("ch", "gh")) and len(w) - 2 >= rv:
        w = w[:-1]

    return w.replace("I", "i").replace("U", "u")


# ------------------------------------------------------------- Portuguese

_PT_VOWELS = frozenset("aeiouáéíóúâêô")
_PT_S1_R2 = (
    "ica", "ância", "adora", "osa", "ista", "eza", "ante", "ável",
    "ível", "ico", "ismo", "oso", "amento", "imento", "aça~o",
    "ador", "icas", "adoras", "osas", "istas", "ezas", "adores",
    "antes", "aço~es", "icos", "ismos", "osos", "amentos",
    "imentos",
)
_PT_VERB = (
    "ada", "ida", "ia", "aria", "eria", "iria", "ara", "era", "ira",
    "ava", "asse", "esse", "isse", "aste", "este", "iste", "ei",
    "arei", "erei", "irei", "am", "iam", "ariam", "eriam", "iriam",
    "aram", "eram", "iram", "avam", "em", "arem", "erem", "irem",
    "assem", "essem", "issem", "ado", "ido", "ando", "endo", "indo",
    "ara~o", "era~o", "ira~o", "ar", "er", "ir", "as", "adas",
    "idas", "ias", "arias", "erias", "irias", "aras", "eras",
    "iras", "avas", "es", "ardes", "erdes", "irdes", "ares", "eres",
    "ires", "asses", "esses", "isses", "astes", "estes", "istes",
    "is", "ais", "eis", "areis", "ereis", "ireis", "áreis", "éreis",
    "íreis", "ásseis", "ésseis", "ísseis", "áveis", "íeis",
    "aríeis", "eríeis", "iríeis", "ados", "idos", "amos", "áramos",
    "éramos", "íramos", "ávamos", "íamos", "aríamos", "eríamos",
    "iríamos", "emos", "aremos", "eremos", "iremos", "ássemos",
    "êssemos", "íssemos", "imos", "armos", "ermos", "irmos",
    "ámos", "arás", "erás", "irás", "eu", "iu", "ou", "ará", "erá",
    "irá",
)


def portuguese_stem(w: str) -> str:  # noqa: C901 — mirrors the rules
    """Snowball Portuguese (PortugueseStemmer.java a_0-a_8 tables) —
    the SnowballPorterFilterFactory language="Portuguese"
    configuration (the default PortugueseAnalyzer keeps
    PortugueseLightStem); pinned on the reference's vocabulary."""
    # prelude: nasal vowels become vowel + tilde consonant
    w = w.replace("ã", "a~").replace("õ", "o~")

    rv = _romance_rv(w, _PT_VOWELS)
    p1, p2 = _std_regions(w, _PT_VOWELS)

    # step 1: standard suffix removal
    s1_done = False
    m = _longest_suffix(
        w, 0,
        _PT_S1_R2
        + ("logía", "logías", "ución", "uciones", "ência", "ências",
           "amente", "mente", "idade", "idades", "iva", "ivo",
           "ivas", "ivos", "ira", "iras"),
    )
    if m is not None:
        start = len(w) - len(m)
        if m in ("logía", "logías"):
            if start >= p2:
                w = w[:start] + "log"
                s1_done = True
        elif m in ("ución", "uciones"):
            if start >= p2:
                w = w[:start] + "u"
                s1_done = True
        elif m in ("ência", "ências"):
            if start >= p2:
                w = w[:start] + "ente"
                s1_done = True
        elif m == "amente":
            if start >= p1:
                w = w[:start]
                s1_done = True
                m2 = _longest_suffix(w, 0, ("ic", "ad", "os", "iv"))
                if m2 is not None and len(w) - len(m2) >= p2:
                    w = w[: -len(m2)]
                    if m2 == "iv" and w.endswith("at") \
                            and len(w) - 2 >= p2:
                        w = w[:-2]
        elif m == "mente":
            if start >= p2:
                w = w[:start]
                s1_done = True
                m2 = _longest_suffix(w, 0, ("ante", "avel", "ível"))
                if m2 is not None and len(w) - len(m2) >= p2:
                    w = w[: -len(m2)]
        elif m in ("idade", "idades"):
            if start >= p2:
                w = w[:start]
                s1_done = True
                m2 = _longest_suffix(w, 0, ("ic", "abil", "iv"))
                if m2 is not None and len(w) - len(m2) >= p2:
                    w = w[: -len(m2)]
        elif m in ("iva", "ivo", "ivas", "ivos"):
            if start >= p2:
                w = w[:start]
                s1_done = True
                if w.endswith("at") and len(w) - 2 >= p2:
                    w = w[:-2]
        elif m in ("ira", "iras"):
            if start >= rv and start >= 1 and w[start - 1] == "e":
                w = w[:start] + "ir"
                s1_done = True
        else:
            if start >= p2:
                w = w[:start]
                s1_done = True

    # step 2: verb suffixes in RV, only if step 1 removed nothing
    verb_done = False
    if not s1_done:
        m = _longest_suffix(w, rv, _PT_VERB)
        if m is not None:
            w = w[: -len(m)]
            verb_done = True

    if s1_done or verb_done:
        # step 3: final i preceded by c, i in RV
        if w.endswith("ci") and len(w) - 1 >= rv:
            w = w[:-1]
    else:
        # step 4: residual suffix in RV
        m = _longest_suffix(w, rv, ("a", "i", "o", "os", "á", "í",
                                    "ó"))
        if m is not None:
            w = w[: -len(m)]

    # step 5: residual form (always)
    if w and w[-1] in ("e", "é", "ê"):
        if len(w) - 1 >= rv:
            w = w[:-1]
            if w.endswith("gu") and len(w) - 1 >= rv:
                w = w[:-1]
            elif w.endswith("ci") and len(w) - 1 >= rv:
                w = w[:-1]
    elif w.endswith("ç"):
        w = w[:-1] + "c"

    return w.replace("a~", "ã").replace("o~", "õ")


# ---------------------------------------------------------------- French

_FR_VOWELS = frozenset("aeiouyàâèéêëîïôùû")
_FR_KEEP_S = frozenset("aiosuè")
_FR_S1 = (
    "iqUe", "atrice", "ance", "ence", "logie", "able", "isme",
    "euse", "iste", "ive", "if", "usion", "ation", "ution", "ateur",
    "iqUes", "atrices", "ances", "ences", "logies", "ables", "ismes",
    "euses", "istes", "ives", "ifs", "usions", "ations", "utions",
    "ateurs", "ments", "ements", "issements", "ités", "ment",
    "ement", "issement", "amment", "emment", "aux", "eaux", "eux",
    "ité",
)
_FR_S2A = (
    "ira", "ie", "isse", "issante", "i", "irai", "ir", "iras",
    "ies", "îmes", "isses", "issantes", "îtes", "is", "irais",
    "issais", "irions", "issions", "irons", "issons", "issants",
    "it", "irait", "issait", "issant", "iraIent", "issaIent",
    "irent", "issent", "iront", "ît", "iriez", "issiez", "irez",
    "issez",
)
_FR_S2B_E = ("era", "ée", "erai", "er", "eras", "ées", "erais",
             "erions", "erons", "és", "erait", "eraIent", "èrent",
             "eront", "ez", "iez", "eriez", "erez", "é")
_FR_S2B_A = ("a", "asse", "ante", "ai", "as", "âmes", "asses",
             "antes", "âtes", "ais", "assions", "ants", "ait",
             "ant", "aIent", "assent", "ât", "assiez")


def _fr_mark_rv(w: str) -> int:
    """FrenchStemmer.r_mark_regions: two leading vowels -> after the
    third letter; col/par/tap prefix -> 3; else after the first vowel
    past position 0."""
    n = len(w)
    if n >= 3 and w[0] in _FR_VOWELS and w[1] in _FR_VOWELS:
        return 3
    if w[:3] in ("col", "par", "tap"):
        return 3
    i = 1
    while i < n and w[i] not in _FR_VOWELS:
        i += 1
    return i + 1 if i < n else n


def french_stem(w: str) -> str:  # noqa: C901 — mirrors the rule ladder
    """Snowball French (FrenchStemmer.java a_0-a_8 tables, stem():
    1320-1480) — the SnowballPorterFilterFactory language="French"
    configuration (the default FrenchAnalyzer keeps FrenchLightStem);
    pinned on the reference's complete 20,403-word vocabulary."""
    # prelude: mark u/i between vowels, y next to a vowel, u after q
    s = list(w)
    n = len(s)
    for k in range(n):
        c = s[k]
        prevv = k > 0 and s[k - 1] in _FR_VOWELS
        nextv = k + 1 < n and s[k + 1] in _FR_VOWELS
        if c == "u" and ((prevv and nextv) or (k > 0 and s[k - 1] == "q")):
            s[k] = "U"
        elif c == "i" and prevv and nextv:
            s[k] = "I"
        elif c == "y" and (prevv or nextv):
            s[k] = "Y"
    w = "".join(s)

    rv = _fr_mark_rv(w)
    p1, p2 = _std_regions(w, _FR_VOWELS)

    def in_r(m_len: int, p: int, word: str) -> bool:
        return len(word) - m_len >= p

    # --- step 1: standard suffix removal.  Cases 13/14/15 slice and
    # then FAIL (FrenchStemmer.java:995-1028), which sends control to
    # the verb steps; a failed region check also falls through.
    altered = False        # a suffix routine succeeded
    s1_done = False        # standard_suffix returned true
    m = _longest_suffix(w, 0, _FR_S1)
    if m is not None:
        start = len(w) - len(m)
        if m in ("amment",):
            if start >= rv:
                w = w[:start] + "ant"
        elif m in ("emment",):
            if start >= rv:
                w = w[:start] + "ent"
        elif m in ("ment", "ments"):
            idx = start - 1
            if idx >= rv and idx >= 0 and w[idx] in _FR_VOWELS:
                w = w[:start]
        elif m in ("ance", "iqUe", "isme", "able", "iste", "eux",
                   "ances", "iqUes", "ismes", "ables", "istes"):
            if start >= p2:
                w = w[:start]
                s1_done = True
        elif m in ("atrice", "ateur", "ation", "atrices", "ateurs",
                   "ations"):
            if start >= p2:
                w = w[:start]
                s1_done = True
                if w.endswith("ic"):
                    if len(w) - 2 >= p2:
                        w = w[:-2]
                    else:
                        w = w[:-2] + "iqU"
        elif m in ("logie", "logies"):
            if start >= p2:
                w = w[:start] + "log"
                s1_done = True
        elif m in ("usion", "ution", "usions", "utions"):
            if start >= p2:
                w = w[:start] + "u"
                s1_done = True
        elif m in ("ence", "ences"):
            if start >= p2:
                w = w[:start] + "ent"
                s1_done = True
        elif m in ("ement", "ements"):
            if start >= rv:
                w = w[:start]
                s1_done = True
                m2 = _longest_suffix(w, 0, ("iv", "eus", "abl", "iqU",
                                            "ièr", "Ièr"))
                if m2 == "iv" and len(w) - 2 >= p2:
                    w = w[:-2]
                    if w.endswith("at") and len(w) - 2 >= p2:
                        w = w[:-2]
                elif m2 == "eus":
                    if len(w) - 3 >= p2:
                        w = w[:-3]
                    elif len(w) - 3 >= p1:
                        w = w[:-3] + "eux"
                elif m2 in ("abl", "iqU"):
                    if len(w) - 3 >= p2:
                        w = w[:-3]
                elif m2 in ("ièr", "Ièr"):
                    if len(w) - 3 >= rv:
                        w = w[:-3] + "i"
        elif m in ("ité", "ités"):
            if start >= p2:
                w = w[:start]
                s1_done = True
                m2 = _longest_suffix(w, 0, ("abil", "ic", "iv"))
                if m2 == "abil":
                    if len(w) - 4 >= p2:
                        w = w[:-4]
                    else:
                        w = w[:-4] + "abl"
                elif m2 == "ic":
                    if len(w) - 2 >= p2:
                        w = w[:-2]
                    else:
                        w = w[:-2] + "iqU"
                elif m2 == "iv":
                    if len(w) - 2 >= p2:
                        w = w[:-2]
        elif m in ("if", "ive", "ifs", "ives"):
            if start >= p2:
                w = w[:start]
                s1_done = True
                if w.endswith("at") and len(w) - 2 >= p2:
                    w = w[:-2]
                    if w.endswith("ic"):
                        if len(w) - 2 >= p2:
                            w = w[:-2]
                        else:
                            w = w[:-2] + "iqU"
        elif m == "eaux":
            w = w[:start] + "eau"
            s1_done = True
        elif m == "aux":
            if start >= p1:
                w = w[:start] + "al"
                s1_done = True
        elif m in ("euse", "euses"):
            if start >= p2:
                w = w[:start]
                s1_done = True
            elif start >= p1:
                w = w[:start] + "eux"
                s1_done = True
        elif m in ("issement", "issements"):
            if start >= p1 and start >= 1 \
                    and w[start - 1] not in _FR_VOWELS:
                w = w[:start]
                s1_done = True

    altered = s1_done
    if not s1_done:
        # --- step 2a: i-verb suffixes in RV preceded by a non-vowel
        # (the non-vowel must itself be in RV)
        done_2a = False
        m = _longest_suffix(w, rv, _FR_S2A)
        if m is not None:
            idx = len(w) - len(m) - 1
            if idx >= rv and w[idx] not in _FR_VOWELS:
                w = w[: -len(m)]
                done_2a = True
        if not done_2a:
            # --- step 2b: other verb suffixes in RV
            m = _longest_suffix(w, rv, _FR_S2B_E + _FR_S2B_A
                                + ("ions",))
            if m == "ions":
                if len(w) - 4 >= p2:
                    w = w[:-4]
                    altered = True
            elif m in _FR_S2B_E:
                w = w[: -len(m)]
                altered = True
            elif m in _FR_S2B_A:
                w = w[: -len(m)]
                altered = True
                if w.endswith("e") and len(w) - 1 >= rv:
                    w = w[:-1]
        else:
            altered = True

    if altered:
        # --- step 3: final Y -> i, final ç -> c
        if w.endswith("Y"):
            w = w[:-1] + "i"
        elif w.endswith("ç"):
            w = w[:-1] + "c"
    else:
        # --- step 4: residual suffixes
        if w.endswith("s") and len(w) >= 2 and w[-2] not in _FR_KEEP_S:
            w = w[:-1]
        m = _longest_suffix(w, rv, ("ion", "Ière", "ière", "Ier",
                                    "ier", "e", "ë"))
        if m == "ion":
            start = len(w) - 3
            if start >= p2 and start - 1 >= rv and w[start - 1] in "st":
                w = w[:start]
        elif m in ("Ière", "ière", "Ier", "ier"):
            w = w[: -len(m)] + "i"
        elif m == "e":
            w = w[:-1]
        elif m == "ë":
            if len(w) - 3 >= rv and w.endswith("guë"):
                w = w[:-1]

    # --- un_double: enn/onn/ett/ell/eill -> drop the last letter
    if w.endswith(("enn", "onn", "ett", "ell", "eill")):
        w = w[:-1]

    # --- un_accent: é/è followed by >=1 trailing non-vowel -> e
    i = len(w) - 1
    cnt = 0
    while i >= 0 and w[i] not in _FR_VOWELS:
        i -= 1
        cnt += 1
    if cnt >= 1 and i >= 0 and w[i] in ("é", "è"):
        w = w[:i] + "e" + w[i + 1:]

    # postlude
    return w.replace("I", "i").replace("U", "u").replace("Y", "y")


# -------------------------------------------------------------- Hungarian

_HU_VOWELS = frozenset("aeiouáéíóõöúûü")
_HU_DIGRAPHS = ("dzs", "ccs", "zzs", "ggy", "lly", "nny", "tty",
                "ssz", "cs", "gy", "ly", "ny", "sz", "ty", "zs")
_HU_START_DIGRAPH = ("dzs", "cs", "gy", "ly", "ny", "sz", "ty", "zs")
_HU_DOUBLE = (
    "bb", "cc", "dd", "ff", "gg", "jj", "kk", "ll", "mm", "nn", "pp",
    "rr", "ccs", "ss", "zzs", "tt", "vv", "ggy", "lly", "nny", "tty",
    "ssz", "zz",
)
_HU_CASE = (
    "ba", "ra", "be", "re", "ig", "nak", "nek", "val", "vel", "ul",
    "nál", "nél", "ból", "ról", "tól", "bõl", "rõl", "tõl", "ül",
    "n", "an", "ban", "en", "ben", "képpen", "on", "ön", "képp",
    "kor", "t", "at", "et", "ként", "anként", "enként", "onként",
    "ot", "ért", "öt", "hez", "hoz", "höz", "vá", "vé",
)
_HU_OWNED = {
    "éi": "", "áéi": "a", "ééi": "e", "é": "", "ké": "", "aké": "",
    "eké": "", "oké": "", "áké": "a", "éké": "e", "öké": "",
    "éé": "e",
}
_HU_SING = {
    "a": "", "ja": "", "d": "", "ad": "", "ed": "", "od": "",
    "ád": "a", "éd": "e", "öd": "", "e": "", "je": "", "nk": "",
    "unk": "", "ánk": "a", "énk": "e", "ünk": "", "uk": "",
    "juk": "", "ájuk": "a", "ük": "", "jük": "", "éjük": "e",
    "m": "", "am": "", "em": "", "om": "", "ám": "a", "ém": "e",
    "o": "", "á": "a", "é": "e",
}
_HU_PLUR = {
    "id": "", "aid": "", "jaid": "", "eid": "", "jeid": "",
    "áid": "a", "éid": "e", "i": "", "ai": "", "jai": "", "ei": "",
    "jei": "", "ái": "a", "éi": "e", "itek": "", "eitek": "",
    "jeitek": "", "éitek": "e", "ik": "", "aik": "", "jaik": "",
    "eik": "", "jeik": "", "áik": "a", "éik": "e", "ink": "",
    "aink": "", "jaink": "", "eink": "", "jeink": "", "áink": "a",
    "éink": "e", "aitok": "", "jaitok": "", "áitok": "a", "im": "",
    "aim": "", "jaim": "", "eim": "", "jeim": "", "áim": "a",
    "éim": "e",
}
_HU_PLURAL = {"k": "", "ak": "", "ek": "", "ok": "", "ák": "a",
              "ék": "e", "ök": ""}


def _hu_p1(w: str) -> int:
    """HungarianStemmer.r_mark_regions (:246-317): vowel-initial words
    mark after the first consonant (a digraph counts whole); consonant-
    initial words mark after the first vowel."""
    n = len(w)
    if n == 0:
        return 0
    if w[0] in _HU_VOWELS:
        i = 1
        while i < n and w[i] in _HU_VOWELS:
            i += 1
        if i >= n:
            return n
        for d in _HU_START_DIGRAPH:
            if w.startswith(d, i):
                return i + len(d)
        return i + 1
    i = 0
    while i < n and w[i] not in _HU_VOWELS:
        i += 1
    return i + 1 if i < n else n


def _hu_v_ending(w: str, p1: int) -> str:
    # [á|é] R1 -> a|e (unrestricted longest match, post-hoc R1 check)
    if w.endswith("á") and len(w) - 1 >= p1:
        return w[:-1] + "a"
    if w.endswith("é") and len(w) - 1 >= p1:
        return w[:-1] + "e"
    return w


def _hu_match(w: str, p1: int, suffixes) -> str | None:
    """Hungarian routines run find_among_b UNRESTRICTED and only then
    check R1 on the longest match — a too-long match fails the whole
    routine, never retries a shorter entry."""
    m = _longest_suffix(w, 0, suffixes)
    if m is not None and len(w) - len(m) >= p1:
        return m
    return None


def _hu_map_step(w: str, p1: int, table: dict) -> str:
    m = _hu_match(w, p1, tuple(table))
    if m is not None:
        w = w[: -len(m)] + table[m]
    return w


def hungarian_stem(w: str) -> str:
    """Snowball Hungarian (HungarianStemmer.java:20-235 tables,
    stem():1057-1180) — the DEFAULT HungarianAnalyzer stem step
    (hu/HungarianAnalyzer.java:124)."""
    p1 = _hu_p1(w)

    def dbl(v: str) -> bool:
        return any(v.endswith(d) for d in _HU_DOUBLE)

    # instrum: al/el in R1, preceded by a doubled consonant -> delete
    # and undouble (undouble removes the SECOND-to-last char, which
    # matters for the 3-char doubles: ssz -> sz, ccs -> cs)
    m = _hu_match(w, p1, ("al", "el"))
    if m is not None and dbl(w[:-2]):
        w = w[:-2]
        w = w[:-2] + w[-1]

    # case: among in R1 -> delete, then v_ending
    m = _hu_match(w, p1, _HU_CASE)
    if m is not None:
        w = _hu_v_ending(w[: -len(m)], p1)

    # case_special: án/én/ánként in R1 -> a/e/a
    m = _hu_match(w, p1, ("án", "én", "ánként"))
    if m is not None:
        w = w[: -len(m)] + ("e" if m == "én" else "a")

    # case_other: stul/stül del; astul/estül del; ástul->a, éstül->e
    m = _hu_match(w, p1, ("stul", "astul", "ástul", "stül", "estül",
                          "éstül"))
    if m is not None:
        rep = {"ástul": "a", "éstül": "e"}.get(m, "")
        w = w[: -len(m)] + rep

    # factive: á/é in R1 after a doubled consonant -> delete, undouble
    m = _hu_match(w, p1, ("á", "é"))
    if m is not None and dbl(w[:-1]):
        w = w[:-1]
        w = w[:-2] + w[-1]

    # owned, sing_owner, plur_owner, plural (each a replacement map
    # in R1; v_ending only runs inside r_case)
    w = _hu_map_step(w, p1, _HU_OWNED)
    w = _hu_map_step(w, p1, _HU_SING)
    w = _hu_map_step(w, p1, _HU_PLUR)
    return _hu_map_step(w, p1, _HU_PLURAL)


# --------------------------------------------------------------- Finnish

_FI_V1 = frozenset("aeiouyäö")
_FI_V2 = frozenset("aeiouäö")
_FI_AEI = frozenset("aeiä")
_FI_PARTICLE_END = _FI_V1 | {"n", "t"}
_FI_LONG = ("aa", "ee", "ii", "oo", "uu", "ää", "öö")
_FI_P1 = ("pa", "kaan", "han", "kin", "hän", "kään", "ko", "pä", "kö")
_FI_CASE_UNCOND = (
    "lla", "na", "ssa", "ta", "lta", "sta", "lle", "ine", "ksi",
    "llä", "nä", "ssä", "tä", "ltä", "stä",
)
# among entries with attached condition routines (FinnishStemmer.java
# a_6:91-96): when the routine fails, find_among_b FALLS BACK to the
# parent entry 'n'
_FI_CASE_VI = ("den", "tten", "siin")   # r_VI: i after V2
_FI_CASE_LONG = ("seen",)               # r_LONG: doubled vowel
_FI_CASE_H = {"han": "a", "hen": "e", "hin": "i", "hon": "o",
              "hän": "ä", "hön": "ö"}
_FI_OTHER_1 = ("mma", "mpa", "mmi", "mpi", "mmä", "mpä")
_FI_OTHER_U = ("eja", "imma", "impa", "immi", "impi", "ejä", "immä",
               "impä")


def _fi_regions(w: str) -> tuple[int, int]:
    n = len(w)

    def scan(start):
        i = start
        while i < n and w[i] not in _FI_V1:
            i += 1
        while i < n and w[i] in _FI_V1:
            i += 1
        return i + 1 if i < n else n

    p1 = scan(0)
    p2 = scan(p1) if p1 < n else n
    return p1, p2


def finnish_stem(w: str) -> str:
    """Snowball Finnish (FinnishStemmer.java:20-155 tables, stem():
    884-1040) — the DEFAULT FinnishAnalyzer stem step
    (fi/FinnishAnalyzer.java:124)."""
    p1, p2 = _fi_regions(w)
    ending_removed = False

    # particle_etc (R1; sti additionally R2; the particle-end check is
    # outside the limit)
    m = _longest_suffix(w, p1, _FI_P1 + ("sti",))
    if m == "sti":
        if len(w) - 3 >= p2:
            w = w[:-3]
    elif m is not None:
        q = len(w) - len(m)
        if q >= 1 and w[q - 1] in _FI_PARTICLE_END:
            w = w[:q]

    # possessive (R1)
    m = _longest_suffix(
        w, p1, ("nsa", "mme", "nne", "ni", "si", "an", "en", "än",
                "nsä")
    )
    if m == "si":
        if not w[:-2].endswith("k"):
            w = w[:-2]
    elif m == "ni":
        w = w[:-2]
        if w.endswith("kse"):
            w = w[:-1] + "i"
    elif m in ("nsa", "mme", "nne", "nsä"):
        w = w[:-3]
    elif m == "an":
        if w[:-2].endswith(("lla", "na", "ssa", "ta", "lta", "sta")):
            w = w[:-2]
    elif m == "än":
        if w[:-2].endswith(("llä", "nä", "ssä", "tä", "ltä", "stä")):
            w = w[:-2]
    elif m == "en":
        if w[:-2].endswith(("lle", "ine")):
            w = w[:-2]

    # case_ending (R1)
    m = _longest_suffix(
        w, p1,
        _FI_CASE_UNCOND + _FI_CASE_VI + _FI_CASE_LONG
        + tuple(_FI_CASE_H) + ("a", "ä", "n", "tta", "ttä"),
    )
    if m in _FI_CASE_VI:
        q = len(w) - len(m)
        # r_VI under the R1 limit: 'i' after a V2 char, both in R1
        if not (
            q - 2 >= p1 and w[q - 1] == "i" and w[q - 2] in _FI_V2
        ):
            m = "n"  # method failed: fall back to the parent entry
    elif m in _FI_CASE_LONG:
        q = len(w) - len(m)
        if not (q - 2 >= p1 and w[q - 2:q] in _FI_LONG):
            m = "n"
    if m is not None:
        q = len(w) - len(m)
        ok = False
        extra = 0
        if m in _FI_CASE_UNCOND + _FI_CASE_VI + _FI_CASE_LONG:
            ok = True
        elif m in _FI_CASE_H:
            ok = q >= 1 and w[q - 1] == _FI_CASE_H[m]
        elif m in ("tta", "ttä"):
            ok = q >= 1 and w[q - 1] == "e"
        elif m in ("a", "ä"):
            # preceded by V1 preceded by non-V1
            ok = (
                q >= 2
                and w[q - 1] in _FI_V1
                and w[q - 2] not in _FI_V1
            )
        elif m == "n":
            ok = True
            # long vowel or 'ie' before the n: drop one extra char
            # (but never past the R1 setlimit floor... the extra char
            # consumes within the limited region)
            if (
                (w[:q].endswith(_FI_LONG) or w[:q].endswith("ie"))
                and q - 1 >= p1
            ):
                extra = 1
        if ok:
            w = w[: q - extra]
            ending_removed = True

    # other_endings (R2; mma/mpa family not after "po")
    m = _longest_suffix(w, p2, _FI_OTHER_1 + _FI_OTHER_U)
    if m is not None:
        if m in _FI_OTHER_U or not w[: -len(m)].endswith("po"):
            w = w[: -len(m)]

    # i_plural (if an ending was removed) else t_plural
    if ending_removed:
        m = _longest_suffix(w, p1, ("i", "j"))
        if m is not None:
            w = w[:-1]
    else:
        if (
            w.endswith("t")
            and len(w) - 1 >= p1
            and len(w) >= 2
            and w[-2] in _FI_V1
        ):
            w = w[:-1]
            m = _longest_suffix(w, p2, ("mma", "imma"))
            if m == "imma" or (
                m == "mma" and not w[:-3].endswith("po")
            ):
                w = w[: -len(m)]

    # tidy (all R1-limited except the final undouble)
    if len(w) - 2 >= p1 and w[-2:] in _FI_LONG:
        w = w[:-1]
    # the AEI / j / o checks read the preceding char under the same
    # R1 setlimit, so it must lie in R1 as well
    if (
        len(w) - 2 >= p1
        and w[-1] in _FI_AEI
        and w[-2] not in _FI_V1
    ):
        w = w[:-1]
    if len(w) - 2 >= p1 and w.endswith(("oj", "uj")):
        w = w[:-1]
    if len(w) - 2 >= p1 and w.endswith("jo"):
        w = w[:-1]
    # undouble the LAST consonant anywhere in the word
    i = len(w) - 1
    while i >= 0 and w[i] in _FI_V1:
        i -= 1
    if i >= 1 and w[i - 1] == w[i]:
        w = w[:i] + w[i + 1:]
    return w


# --------------------------------------------------------------- Russian

_RU_VOWELS = frozenset("аеиоуыэюя")
_RU_PG_1 = ("в", "вши", "вшись")            # need preceding а/я
_RU_PG_2 = ("ив", "ыв", "ивши", "ывши", "ившись", "ывшись")
_RU_ADJ = (
    "ее", "ие", "ое", "ые", "ими", "ыми", "ей", "ий", "ой", "ый",
    "ем", "им", "ом", "ым", "его", "ого", "ему", "ому", "их", "ых",
    "ею", "ою", "ую", "юю", "ая", "яя",
)
_RU_PART_1 = ("ем", "нн", "вш", "щ", "ющ")  # need preceding а/я
_RU_PART_2 = ("ивш", "ывш", "ующ")
_RU_VERB_1 = (
    "ла", "на", "ете", "йте", "ли", "й", "л", "ем", "н", "ло", "но",
    "нно", "ет", "ют", "ны", "ть", "ешь",
)
_RU_VERB_2 = (
    "ила", "ыла", "ена", "ите", "ейте", "уйте", "или", "ыли", "ей",
    "уй", "ил", "ыл", "им", "ым", "ен", "ило", "ыло", "ено", "ует",
    "ит", "ыт", "уют", "ят", "ены", "ить", "ыть", "ишь", "ю", "ую",
)
_RU_NOUN = (
    "а", "ев", "ов", "е", "ие", "ье", "и", "еи", "ии", "ами", "ями",
    "иями", "й", "ей", "ией", "ий", "ой", "ам", "ем", "ием", "ом",
    "ям", "иям", "о", "у", "ах", "ях", "иях", "ы", "ь", "ю", "ию",
    "ью", "я", "ия", "ья",
)


def _ru_among_ay(w, pv, g1, g2):
    """Longest match over g1∪g2 within RV; g1 entries additionally
    need a preceding а/я (within RV); returns new end or None."""
    m = _longest_suffix(w, pv, g1 + g2)
    if m is None:
        return None
    if m in g2:
        return len(w) - len(m)
    q = len(w) - len(m)
    if q - 1 >= pv and w[q - 1] in ("а", "я"):
        return q
    return None


def russian_stem(w: str) -> str:
    """Snowball Russian (RussianStemmer.java:20-184 tables, stem():
    582-720) — the DEFAULT RussianAnalyzer stem step
    (ru/RussianAnalyzer.java:121).  All matching runs within RV."""
    n = len(w)
    i = 0
    while i < n and w[i] not in _RU_VOWELS:
        i += 1
    if i >= n:
        return w
    pv = i + 1
    # p2 = after the second vowel-consonant sequence
    p2 = n
    i = pv
    while i < n and w[i] in _RU_VOWELS:
        i += 1
    if i < n:
        i += 1
        while i < n and w[i] not in _RU_VOWELS:
            i += 1
        if i < n:
            i += 1
            while i < n and w[i] in _RU_VOWELS:
                i += 1
            if i < n:
                p2 = i + 1

    # step 1
    q = _ru_among_ay(w, pv, _RU_PG_1, _RU_PG_2)
    if q is not None:
        w = w[:q]
    else:
        m = _longest_suffix(w, pv, ("ся", "сь"))
        if m is not None:
            w = w[: -len(m)]
        # adjectival: adjective, then try participle
        m = _longest_suffix(w, pv, _RU_ADJ)
        if m is not None:
            w = w[: -len(m)]
            q = _ru_among_ay(w, pv, _RU_PART_1, _RU_PART_2)
            if q is not None:
                w = w[:q]
        else:
            q = _ru_among_ay(w, pv, _RU_VERB_1, _RU_VERB_2)
            if q is not None:
                w = w[:q]
            else:
                m = _longest_suffix(w, pv, _RU_NOUN)
                if m is not None:
                    w = w[: -len(m)]

    # step 2: final и
    if w.endswith("и") and len(w) - 1 >= pv:
        w = w[:-1]

    # derivational: ост/ость in R2
    m = _longest_suffix(w, max(pv, p2), ("ост", "ость"))
    if m is not None:
        w = w[: -len(m)]

    # tidy_up (longest of ейше/ейш/н/ь)
    m = _longest_suffix(w, pv, ("ейше", "ейш", "н", "ь"))
    if m in ("ейше", "ейш"):
        w = w[: -len(m)]
        if w.endswith("нн") and len(w) - 1 >= pv:
            w = w[:-1]
    elif m == "н":
        if len(w) >= 2 and w[-2] == "н":
            w = w[:-1]
    elif m == "ь":
        w = w[:-1]
    return w


# --------------------------------------------------------------- Swedish

_SV_VOWELS = frozenset("aeiouyäåö")
_SV_S_END = frozenset("bcdfghjklmnoprtvy")
_SV_MAIN = (
    "a", "arna", "erna", "heterna", "orna", "ad", "e", "ade", "ande",
    "arne", "are", "aste", "en", "anden", "aren", "heten", "ern",
    "ar", "er", "heter", "or", "s", "as", "arnas", "ernas", "ornas",
    "es", "ades", "andes", "ens", "arens", "hetens", "erns", "at",
    "andet", "het", "ast",
)
_SV_OTHER = ("ig", "lig", "els", "fullt", "löst")


def swedish_stem(w: str) -> str:
    """Snowball Swedish (SwedishStemmer.java:20-77,159-300) — the
    DEFAULT SwedishAnalyzer stem step (sv/SwedishAnalyzer.java:124)."""
    p1 = _scand_r1(w, _SV_VOWELS)
    m = _longest_suffix(w, p1, _SV_MAIN)
    if m is not None:
        if m != "s":
            w = w[: -len(m)]
        elif len(w) >= 2 and w[-2] in _SV_S_END:
            w = w[:-1]
    if len(w) - 2 >= p1 and w[-2:] in (
        "dd", "gd", "nn", "dt", "gt", "kt", "tt"
    ):
        w = w[:-1]
    m = _longest_suffix(w, p1, _SV_OTHER)
    if m == "löst":
        w = w[:-1]
    elif m == "fullt":
        w = w[:-1]
    elif m is not None:
        w = w[: -len(m)]
    return w


# -------------------------------------------------------------- Norwegian

_NO_VOWELS = frozenset("aeiouyåæø")
_NO_S_END = frozenset("bcdfghjlmnoprtvyz")  # no k (guarded separately)
_NO_MAIN = (
    "a", "e", "ede", "ande", "ende", "ane", "ene", "hetene", "en",
    "heten", "ar", "er", "heter", "s", "as", "es", "edes", "endes",
    "enes", "hetenes", "ens", "hetens", "ers", "ets", "et", "het",
    "ast",
)
_NO_ERT = ("erte", "ert")
_NO_OTHER = (
    "leg", "eleg", "ig", "eig", "lig", "elig", "els", "lov", "elov",
    "slov", "hetslov",
)


def norwegian_stem(w: str) -> str:
    """Snowball Norwegian (NorwegianStemmer.java:20-72,150-290) — the
    DEFAULT NorwegianAnalyzer stem step (no/NorwegianAnalyzer.java:
    124).  The s-ending accepts k only after a non-vowel."""
    p1 = _scand_r1(w, _NO_VOWELS)
    m = _longest_suffix(w, p1, _NO_MAIN + _NO_ERT)
    if m is not None:
        if m in _NO_ERT:
            w = w[: -len(m)] + "er"
        elif m != "s":
            w = w[: -len(m)]
        elif len(w) >= 2 and (
            w[-2] in _NO_S_END
            or (w[-2] == "k" and len(w) >= 3 and w[-3] not in _NO_VOWELS)
        ):
            w = w[:-1]
    if len(w) - 2 >= p1 and w[-2:] in ("dt", "vt"):
        w = w[:-1]
    m = _longest_suffix(w, p1, _NO_OTHER)
    if m is not None:
        w = w[: -len(m)]
    return w


# --------------------------------------------------------------- Turkish
#
# Snowball Turkish (Evren Kapusuz Çilden's algorithm;
# TurkishStemmer.java).  All routines work on an explicit cursor p:
# suffix matching consumes characters of w[:p] from the right; slices
# are permanent, cursor restores are relative to the end (Snowball
# backward-mode semantics).  A mark_* routine returns the new cursor or
# None.  Per SnowballFilter.java:94-97 the mutated buffer is kept even
# when stem() aborts mid-way, so partial mutations are returned.

_TR_VOWELS = frozenset("aeıiouöü")
_TR_U = frozenset("ıiuü")
# vowel-harmony partner groups (TurkishStemmer.java:236-507)
_TR_HARMONY = {
    "a": "aıou", "e": "eiöü", "ı": "aı", "i": "ei",
    "o": "ou", "ö": "öü", "u": "ou", "ü": "öü",
}


def _tr_harmony(w: str, p: int) -> bool:
    j = p - 1
    while j >= 0 and w[j] not in _TR_VOWELS:
        j -= 1
    if j < 0:
        return False
    group = _TR_HARMONY[w[j]]
    k = j - 1
    while k >= 0 and w[k] not in group:
        k -= 1
    return k >= 0


def _tr_opt_cons(w: str, p: int, c: str) -> int | None:
    """mark_suffix_with_optional_{n,s,y}_consonant (:509-751): the
    optional consonant must ride on a vowel; without it the previous-
    but-one char must be a vowel."""
    if p >= 1 and w[p - 1] == c:
        if p >= 2 and w[p - 2] in _TR_VOWELS:
            return p - 1
        return None
    if p >= 2 and w[p - 2] in _TR_VOWELS:
        return p
    return None


def _tr_opt_u(w: str, p: int) -> int | None:
    """mark_suffix_with_optional_U_vowel (:752-830): optional U rides
    on a consonant."""
    if p >= 1 and w[p - 1] in _TR_U:
        if p >= 2 and w[p - 2] not in _TR_VOWELS:
            return p - 1
        return None
    if p >= 2 and w[p - 2] not in _TR_VOWELS:
        return p
    return None


def _tr_among(w: str, p: int, suffixes) -> int | None:
    best = None
    for suf in suffixes:
        if (best is None or len(suf) > len(best)) and w[:p].endswith(suf):
            best = suf
    return p - len(best) if best is not None else None


def _mk_possessives(w, p):
    q = _tr_among(w, p, ("m", "n", "miz", "niz", "muz", "nuz",
                         "müz", "nüz", "mız", "nız"))
    return None if q is None else _tr_opt_u(w, q)


def _mk_sU(w, p):
    if not _tr_harmony(w, p):
        return None
    if p >= 1 and w[p - 1] in _TR_U:
        return _tr_opt_cons(w, p - 1, "s")
    return None


def _mk_lArI(w, p):
    return _tr_among(w, p, ("leri", "ları"))


def _mk_yU(w, p):
    if not _tr_harmony(w, p):
        return None
    if p >= 1 and w[p - 1] in _TR_U:
        return _tr_opt_cons(w, p - 1, "y")
    return None


def _mk_nU(w, p):
    if not _tr_harmony(w, p):
        return None
    return _tr_among(w, p, ("ni", "nu", "nü", "nı"))


def _mk_nUn(w, p):
    if not _tr_harmony(w, p):
        return None
    q = _tr_among(w, p, ("in", "un", "ün", "ın"))
    return None if q is None else _tr_opt_cons(w, q, "n")


def _mk_yA(w, p):
    if not _tr_harmony(w, p):
        return None
    q = _tr_among(w, p, ("a", "e"))
    return None if q is None else _tr_opt_cons(w, q, "y")


def _mk_nA(w, p):
    if not _tr_harmony(w, p):
        return None
    return _tr_among(w, p, ("na", "ne"))


def _mk_DA(w, p):
    if not _tr_harmony(w, p):
        return None
    return _tr_among(w, p, ("da", "ta", "de", "te"))


def _mk_ndA(w, p):
    if not _tr_harmony(w, p):
        return None
    return _tr_among(w, p, ("nda", "nde"))


def _mk_DAn(w, p):
    if not _tr_harmony(w, p):
        return None
    return _tr_among(w, p, ("dan", "tan", "den", "ten"))


def _mk_ndAn(w, p):
    if not _tr_harmony(w, p):
        return None
    return _tr_among(w, p, ("ndan", "nden"))


def _mk_ylA(w, p):
    if not _tr_harmony(w, p):
        return None
    q = _tr_among(w, p, ("la", "le"))
    return None if q is None else _tr_opt_cons(w, q, "y")


def _mk_ki(w, p):
    return p - 2 if w[:p].endswith("ki") else None


def _mk_ncA(w, p):
    if not _tr_harmony(w, p):
        return None
    q = _tr_among(w, p, ("ca", "ce"))
    return None if q is None else _tr_opt_cons(w, q, "n")


def _mk_yUm(w, p):
    if not _tr_harmony(w, p):
        return None
    q = _tr_among(w, p, ("im", "um", "üm", "ım"))
    return None if q is None else _tr_opt_cons(w, q, "y")


def _mk_sUn(w, p):
    if not _tr_harmony(w, p):
        return None
    return _tr_among(w, p, ("sin", "sun", "sün", "sın"))


def _mk_yUz(w, p):
    if not _tr_harmony(w, p):
        return None
    q = _tr_among(w, p, ("iz", "uz", "üz", "ız"))
    return None if q is None else _tr_opt_cons(w, q, "y")


def _mk_sUnUz(w, p):
    return _tr_among(w, p, ("siniz", "sunuz", "sünüz", "sınız"))


def _mk_lAr(w, p):
    if not _tr_harmony(w, p):
        return None
    return _tr_among(w, p, ("lar", "ler"))


def _mk_nUz(w, p):
    if not _tr_harmony(w, p):
        return None
    return _tr_among(w, p, ("niz", "nuz", "nüz", "nız"))


def _mk_DUr(w, p):
    if not _tr_harmony(w, p):
        return None
    return _tr_among(w, p, ("dir", "tir", "dur", "tur",
                            "dür", "tür", "dır", "tır"))


def _mk_cAsInA(w, p):
    return _tr_among(w, p, ("casına", "cesine"))


_TR_YDU = (
    "di", "ti", "dik", "tik", "duk", "tuk", "dük", "tük", "dık",
    "tık", "dim", "tim", "dum", "tum", "düm", "tüm", "dım", "tım",
    "din", "tin", "dun", "tun", "dün", "tün", "dın", "tın", "du",
    "tu", "dü", "tü", "dı", "tı",
)


def _mk_yDU(w, p):
    if not _tr_harmony(w, p):
        return None
    q = _tr_among(w, p, _TR_YDU)
    return None if q is None else _tr_opt_cons(w, q, "y")


def _mk_ysA(w, p):
    q = _tr_among(w, p, ("sa", "se", "sak", "sek", "sam", "sem",
                         "san", "sen"))
    return None if q is None else _tr_opt_cons(w, q, "y")


def _mk_ymUs(w, p):
    if not _tr_harmony(w, p):
        return None
    q = _tr_among(w, p, ("miş", "muş", "müş", "mış"))
    return None if q is None else _tr_opt_cons(w, q, "y")


def _mk_yken(w, p):
    if not w[:p].endswith("ken"):
        return None
    return _tr_opt_cons(w, p - 3, "y")


def _tr_first(w, p, marks):
    for mk in marks:
        q = mk(w, p)
        if q is not None:
            return q
    return None


def _tr_nominal_verb(w: str) -> tuple[str, bool]:
    """stem_nominal_verb_suffixes (TurkishStemmer.java:1277-1631).
    Returns (word, continue_stemming_noun_suffixes)."""
    n = len(w)
    # A: (ymUs_|yDU|ysA|yken) -> delete
    p = _tr_first(w, n, (_mk_ymUs, _mk_yDU, _mk_ysA, _mk_yken))
    if p is not None:
        return w[:p], True
    # B: cAsInA (sUnUz|lAr|yUm|sUn|yUz|ε) ymUs_ -> delete all
    p = _mk_cAsInA(w, n)
    if p is not None:
        q = _tr_first(w, p, (_mk_sUnUz, _mk_lAr, _mk_yUm, _mk_sUn,
                             _mk_yUz))
        if q is None:
            q = p
        r = _mk_ymUs(w, q)
        if r is not None:
            return w[:r], True
    # C: lAr -> delete; try (DUr|yDU|ysA|ymUs_) -> delete; stop nouns
    p = _mk_lAr(w, n)
    if p is not None:
        w = w[:p]
        q = _tr_first(w, len(w), (_mk_DUr, _mk_yDU, _mk_ysA, _mk_ymUs))
        if q is not None:
            w = w[:q]
        return w, False
    # D: nUz (yDU|ysA) -> delete both
    p = _mk_nUz(w, n)
    if p is not None:
        q = _tr_first(w, p, (_mk_yDU, _mk_ysA))
        if q is not None:
            return w[:q], True
    # E: (sUnUz|yUz|sUn|yUm) -> delete; try ymUs_ -> delete
    p = _tr_first(w, n, (_mk_sUnUz, _mk_yUz, _mk_sUn, _mk_yUm))
    if p is not None:
        w = w[:p]
        q = _mk_ymUs(w, len(w))
        if q is not None:
            w = w[:q]
        return w, True
    # F: DUr -> delete; try (sUnUz|lAr|yUm|sUn|yUz|ε) ymUs_ -> delete
    p = _mk_DUr(w, n)
    if p is None:
        return w, True
    w = w[:p]
    q = _tr_first(w, len(w), (_mk_sUnUz, _mk_lAr, _mk_yUm, _mk_sUn,
                              _mk_yUz))
    if q is None:
        q = len(w)
    r = _mk_ymUs(w, q)
    if r is not None:
        w = w[:r]
    return w, True


def _tr_chain_ki(w: str, cur: int) -> tuple[str, int, bool]:
    """stem_suffix_chain_before_ki (:1632-1910).  Matching runs left of
    ``cur``; deletions splice out [bra:ket] where ket is this call's
    entry cursor; returns (word, cursor, ok).  A False return never
    mutates the word."""
    ket = cur
    p = _mk_ki(w, cur)
    if p is None:
        return w, cur, False
    # branch DA
    q = _mk_DA(w, p)
    if q is not None:
        w = w[:q] + w[ket:]
        cur = q
        v2 = len(w) - cur
        ket2 = cur
        r = _mk_lAr(w, cur)
        if r is not None:
            w = w[:r] + w[ket2:]
            cur = r
            v4 = len(w) - cur
            w2, cur2, ok = _tr_chain_ki(w, cur)
            if ok:
                return w2, cur2, True
            return w, len(w) - v4, True
        r = _mk_possessives(w, cur)
        if r is None:
            return w, len(w) - v2, True
        w = w[:r] + w[ket2:]
        cur = r
        v5 = len(w) - cur
        ket3 = cur
        r2 = _mk_lAr(w, cur)
        if r2 is None:
            return w, len(w) - v5, True
        w = w[:r2] + w[ket3:]
        cur = r2
        w2, cur2, ok = _tr_chain_ki(w, cur)
        if ok:
            return w2, cur2, True
        return w, len(w) - v5, True
    # branch nUn
    q = _mk_nUn(w, p)
    if q is not None:
        w = w[:q] + w[ket:]
        cur = q
        v6 = len(w) - cur
        ket2 = cur
        r = _mk_lArI(w, cur)
        if r is not None:
            return w[:r] + w[ket2:], r, True
        r = _tr_first(w, cur, (_mk_possessives, _mk_sU))
        if r is not None:
            w = w[:r] + w[ket2:]
            cur = r
            v9 = len(w) - cur
            ket3 = cur
            r2 = _mk_lAr(w, cur)
            if r2 is not None:
                w = w[:r2] + w[ket3:]
                cur = r2
                w2, cur2, ok = _tr_chain_ki(w, cur)
                if ok:
                    return w2, cur2, True
                return w, len(w) - v9, True
            return w, len(w) - v9, True
        w2, cur2, ok = _tr_chain_ki(w, cur)
        if ok:
            return w2, cur2, True
        return w, len(w) - v6, True
    # branch ndA
    q = _mk_ndA(w, p)
    if q is None:
        return w, cur, False
    r = _mk_lArI(w, q)
    if r is not None:
        return w[:r] + w[ket:], r, True
    r = _mk_sU(w, q)
    if r is not None:
        w = w[:r] + w[ket:]
        cur = r
        v11 = len(w) - cur
        ket2 = cur
        r2 = _mk_lAr(w, cur)
        if r2 is not None:
            w = w[:r2] + w[ket2:]
            cur = r2
            w2, cur2, ok = _tr_chain_ki(w, cur)
            if ok:
                return w2, cur2, True
            return w, len(w) - v11, True
        return w, len(w) - v11, True
    w2, cur2, ok = _tr_chain_ki(w, q)
    if ok:
        return w2, cur2, True
    return w, cur, False


def _tr_try_lar_chain(w: str, cur: int) -> tuple[str, int]:
    """The recurring ``try([mark_lAr] slice stem_suffix_chain_before_ki)``
    tail: delete a lAr at ``cur``, then run the ki-chain; cursor
    restores are end-relative, slices stay."""
    v = len(w) - cur
    r = _mk_lAr(w, cur)
    if r is None:
        return w, cur
    w = w[:r] + w[cur:]
    cur = r
    w2, cur2, ok = _tr_chain_ki(w, cur)
    if ok:
        return w2, cur2
    return w, len(w) - v


def _tr_noun_suffixes(w: str) -> str:
    """stem_noun_suffixes (TurkishStemmer.java:1911-2630)."""
    n = len(w)
    # 1: [lAr] del, try(chain)
    p = _mk_lAr(w, n)
    if p is not None:
        w = w[:p]
        w2, _, ok = _tr_chain_ki(w, len(w))
        return w2 if ok else w
    # 2: [ncA] del, try( lArI-del | (poss|sU)-del try(lAr-del chain)
    #                    | lAr-del chain )
    p = _mk_ncA(w, n)
    if p is not None:
        w = w[:p]
        v3 = 0  # distance from end after the ncA slice
        q = _mk_lArI(w, len(w))
        if q is not None:
            return w[:q]
        q = _tr_first(w, len(w), (_mk_possessives, _mk_sU))
        if q is not None:
            w = w[:q]
            w, _ = _tr_try_lar_chain(w, len(w))
            return w
        q = _mk_lAr(w, len(w))
        if q is not None:
            w2 = w[:q]
            w3, _, ok = _tr_chain_ki(w2, len(w2))
            # chain failure restores cursor only; the lAr slice stays
            return w3 if ok else w2
        _ = v3
        return w
    # 3: [(ndA|nA)] ( lArI-del | sU-del try(lAr-del chain) | chain )
    p = _tr_first(w, n, (_mk_ndA, _mk_nA))
    if p is not None:
        q = _mk_lArI(w, p)
        if q is not None:
            return w[:q]
        q = _mk_sU(w, p)
        if q is not None:
            w = w[:q]
            w, _ = _tr_try_lar_chain(w, len(w))
            return w
        w2, _, ok = _tr_chain_ki(w, p)
        if ok:
            return w2
        # fall through to branch 4 only when (ndA|nA) chain fails:
        # the generated code breaks this branch and tries the next
        p = None
    # 4: [(ndAn|nU)] ( sU-del try(lAr-del chain) | lArI(no slice) )
    p = _tr_first(w, n, (_mk_ndAn, _mk_nU))
    if p is not None:
        q = _mk_sU(w, p)
        if q is not None:
            w = w[:q]
            w, _ = _tr_try_lar_chain(w, len(w))
            return w
        if _mk_lArI(w, p) is not None:
            return w  # matched but never sliced (reference quirk)
    # 5: [DAn] del, try([ poss-del try(lAr-del chain)
    #                    | lAr-del try(chain) | chain ])
    p = _mk_DAn(w, n)
    if p is not None:
        w = w[:p]
        q = _mk_possessives(w, len(w))
        if q is not None:
            w = w[:q]
            w, _ = _tr_try_lar_chain(w, len(w))
            return w
        q = _mk_lAr(w, len(w))
        if q is not None:
            w = w[:q]
            w2, _, ok = _tr_chain_ki(w, len(w))
            return w2 if ok else w
        w2, _, ok = _tr_chain_ki(w, len(w))
        return w2 if ok else w
    # 6: [(nUn|ylA)] del, try( lAr-del chain (slice permanent on
    #    chain failure, then retry next alt) | (poss|sU)-del
    #    try(lAr-del chain) | chain )
    p = _tr_first(w, n, (_mk_nUn, _mk_ylA))
    if p is not None:
        w = w[:p]
        # alt1: lAr-del + chain; chain failure keeps the slice and
        # falls through to alt2 on the SLICED word
        q = _mk_lAr(w, len(w))
        if q is not None:
            w2 = w[:q]
            w3, _, ok = _tr_chain_ki(w2, len(w2))
            if ok:
                return w3
            w = w2  # slice permanent; cursor restored for alt2
        q = _tr_first(w, len(w), (_mk_possessives, _mk_sU))
        if q is not None:
            w = w[:q]
            w, _ = _tr_try_lar_chain(w, len(w))
            return w
        w2, _, ok = _tr_chain_ki(w, len(w))
        return w2 if ok else w
    # 7: [lArI] del
    p = _mk_lArI(w, n)
    if p is not None:
        return w[:p]
    # 8: chain alone
    w2, _, ok = _tr_chain_ki(w, n)
    if ok:
        return w2
    # 9: [(DA|yU|yA)] del, try( ((poss-del try([lAr consumed]))
    #    | lAr) del; [chain] )
    p = _tr_first(w, n, (_mk_DA, _mk_yU, _mk_yA))
    if p is not None:
        w = w[:p]
        q = _mk_possessives(w, len(w))
        if q is not None:
            w = w[:q]
            r = _mk_lAr(w, len(w))
            if r is not None:
                w = w[:r]
            w2, _, ok = _tr_chain_ki(w, len(w))
            return w2 if ok else w
        q = _mk_lAr(w, len(w))
        if q is not None:
            w = w[:q]
            w2, _, ok = _tr_chain_ki(w, len(w))
            return w2 if ok else w
        return w
    # 10: [(poss|sU)] del, try(lAr-del chain); else overall failure
    p = _tr_first(w, n, (_mk_possessives, _mk_sU))
    if p is not None:
        w = w[:p]
        w, _ = _tr_try_lar_chain(w, len(w))
        return w
    return w


def _tr_append_u(w: str) -> str:
    """append_U_to_stems_ending_with_d_or_g (:2671-2924)."""
    if not w or w[-1] not in ("d", "g"):
        return w
    j = len(w) - 1
    while j >= 0 and w[j] not in _TR_VOWELS:
        j -= 1
    if j < 0:
        return w
    v = w[j]
    if v in "aı":
        return w + "ı"
    if v in "ei":
        return w + "i"
    if v in "ou":
        return w + "u"
    return w + "ü"


_TR_FINAL = {"b": "p", "c": "ç", "d": "t", "ğ": "k"}


def apostrophe_strip(s: str) -> str:
    """tr/ApostropheFilter.java:50-57: drop the first apostrophe
    (U+0027 or U+2019) and everything after it."""
    for k, ch in enumerate(s):
        if ch in ("'", "’"):
            return s[:k]
    return s


def turkish_lowercase(s: str) -> str:
    """tr/TurkishLowerCaseFilter.java:55-111: I before a combining dot
    above (other NSMs may intervene) -> i with the dot removed; bare
    I -> dotless ı; everything else code-point lowercase (İ -> i)."""
    import unicodedata

    out: list[str] = []
    i_or_after = False
    chars = list(s)
    n = len(chars)
    k = 0
    while k < n:
        ch = chars[k]
        i_or_after = (ch == "I") or (
            i_or_after and unicodedata.category(ch) == "Mn"
        )
        if i_or_after:
            if ch == "\u0307":
                k += 1  # delete the dot (composed-lowercase mimic)
                continue
            if ch == "I":
                dotted = False
                for j in range(k + 1, n):
                    if unicodedata.category(chars[j]) != "Mn":
                        break
                    if chars[j] == "\u0307":
                        dotted = True
                        break
                if dotted:
                    out.append("i")
                else:
                    out.append("ı")
                    i_or_after = False
                k += 1
                continue
        if ch == "İ":
            # Java Character.toLowerCase(U+0130) -> 'i' (single char);
            # Python str.lower() would add a combining dot
            out.append("i")
        else:
            out.append(ch.lower())
        k += 1
    return "".join(out)


def turkish_stem(w: str) -> str:
    """Snowball Turkish (TurkishStemmer.java stem():3080-3146).

    Requires >1 vowel; strips nominal verb suffixes, then (unless the
    lAr branch unset the flag) noun suffix chains with the recursive
    ki-chain; postlude appends U after d/g stems and devoices the last
    consonant.  'ad'/'soyad' are reserved (no postlude)."""
    if sum(1 for c in w if c in _TR_VOWELS) < 2:
        return w
    w, cont = _tr_nominal_verb(w)
    if not cont:
        return w
    w = _tr_noun_suffixes(w)
    if w in ("ad", "soyad"):
        return w
    w = _tr_append_u(w)
    if w and w[-1] in _TR_FINAL:
        w = w[:-1] + _TR_FINAL[w[-1]]
    return w


# ----------------------------------------------------------------- Dutch

_NL_VOWELS = frozenset("aeiouyè")          # g_v (DutchStemmer.java:69)
_NL_V_I = _NL_VOWELS | {"I"}               # g_v_I (:71)
_NL_V_J = _NL_VOWELS | {"j"}               # g_v_j (:73)
_NL_ACCENTS = str.maketrans("áäéëíïóöúü", "aaeeiioouu")


def _nl_undouble(w: str) -> str:
    """ends dd/kk/tt -> drop the last char (DutchStemmer.java:391)."""
    if w[-2:] in ("dd", "kk", "tt"):
        return w[:-1]
    return w


def _nl_en_ending(w: str, suf_len: int, p1: int) -> str | None:
    """en/ene removal guard (:455): R1, preceded by a non-vowel that is
    not the 'gem' tail; returns the new word or None."""
    stem = w[:-suf_len]
    if (
        len(w) - suf_len >= p1
        and stem
        and stem[-1] not in _NL_VOWELS
        and not stem.endswith("gem")
    ):
        return _nl_undouble(stem)
    return None


def dutch_stem(w: str) -> str:
    """Snowball Dutch (DutchStemmer.java stem():790-840)."""
    # prelude: fold accents; initial y -> Y; after a vowel, i before a
    # vowel -> I and y -> Y (replaced caps are consonants thereafter)
    w = w.translate(_NL_ACCENTS)
    s = list(w)
    if s and s[0] == "y":
        s[0] = "Y"
    for k in range(1, len(s)):
        if s[k - 1] in _NL_VOWELS:
            if s[k] == "i" and k + 1 < len(s) and s[k + 1] in _NL_VOWELS:
                s[k] = "I"
            elif s[k] == "y":
                s[k] = "Y"
    w = "".join(s)

    # mark_regions: standard R1/R2, R1 clamped to >= 3 (:241-324)
    n = len(w)

    def _scan(start: int) -> int:
        i = start
        while i < n and w[i] not in _NL_VOWELS:
            i += 1
        while i < n and w[i] in _NL_VOWELS:
            i += 1
        return i + 1 if i < n else n

    p1_raw = _scan(0)
    p2 = _scan(p1_raw) if p1_raw < n else n
    p1 = max(p1_raw, 3)

    # step 1 (a_1: heden/ene/en/se/s, longest match, no retry)
    m = _longest_suffix(w, 0, ("heden", "ene", "en", "se", "s"))
    if m == "heden":
        if len(w) - 5 >= p1:
            w = w[:-5] + "heid"
    elif m in ("en", "ene"):
        w2 = _nl_en_ending(w, len(m), p1)
        if w2 is not None:
            w = w2
    elif m in ("s", "se"):
        stem = w[: -len(m)]
        if len(w) - len(m) >= p1 and stem and stem[-1] not in _NL_V_J:
            w = stem

    # step 2 (e_ending): final e in R1 after a non-vowel
    e_found = False
    if (
        w.endswith("e")
        and len(w) - 1 >= p1
        and len(w) >= 2
        and w[-2] not in _NL_VOWELS
    ):
        w = _nl_undouble(w[:-1])
        e_found = True

    # step 3a: heid in R2 not after c; then en via en_ending
    if (
        w.endswith("heid")
        and len(w) - 4 >= p2
        and not w[:-4].endswith("c")
    ):
        w = w[:-4]
        if w.endswith("en"):
            w2 = _nl_en_ending(w, 2, p1)
            if w2 is not None:
                w = w2

    # step 3b (a_4: end/ig/ing/lijk/baar/bar, longest match)
    m = _longest_suffix(w, 0, ("end", "ig", "ing", "lijk", "baar", "bar"))
    if m in ("end", "ing"):
        if len(w) - len(m) >= p2:
            w = w[: -len(m)]
            if (
                w.endswith("ig")
                and len(w) - 2 >= p2
                and not w[:-2].endswith("e")
            ):
                w = w[:-2]
            else:
                w = _nl_undouble(w)
    elif m == "ig":
        if len(w) - 2 >= p2 and not w[:-2].endswith("e"):
            w = w[:-2]
    elif m == "lijk":
        if len(w) - 4 >= p2:
            w = w[:-4]
            if (
                w.endswith("e")
                and len(w) - 1 >= p1
                and len(w) >= 2
                and w[-2] not in _NL_VOWELS
            ):
                w = _nl_undouble(w[:-1])
    elif m == "baar":
        if len(w) - 4 >= p2:
            w = w[:-4]
    elif m == "bar":
        if len(w) - 3 >= p2 and e_found:
            w = w[:-3]

    # step 4 (undouble vowel): C vv D -> C v D for vv in aa/ee/oo/uu,
    # D a non-vowel other than I, C a non-vowel
    if (
        len(w) >= 4
        and w[-1] not in _NL_V_I
        and w[-2] == w[-3]
        and w[-2] in "aeou"
        and w[-4] not in _NL_VOWELS
    ):
        w = w[:-2] + w[-1]

    return w.replace("Y", "y").replace("I", "i")


# -------------------------------------------------------------- Romanian

_RO_VOWELS = frozenset("aeiouâîă")
# a_1 step_0 (RomanianStemmer.java:25-42): suffix -> replacement
_RO_STEP0 = {
    "ul": "", "ului": "",
    "aua": "a",
    "ea": "e", "ele": "e", "elor": "e",
    "iua": "i", "iile": "i", "iei": "i", "ii": "i", "ilor": "i",
    "iilor": "i",
    "ile": "i",  # unless preceded by "ab" (fails, no action)
    "atei": "at",
    "aţia": "aţi", "aţie": "aţi",
}
# a_2 combo suffixes (:44-90): suffix -> replacement, repeated in R1
_RO_COMBO = {}
for _sufs, _rep in (
    (("abilitate", "abilitati", "abilităi", "abilităţi"), "abil"),
    (("ibilitate",), "ibil"),
    (("ivitate", "ivitati", "ivităi", "ivităţi"), None),
    (("icitate", "icitati", "icităi", "icităţi", "icator", "icatori",
      "ical", "icala", "icale", "icali", "icală",
      "iciv", "iciva", "icive", "icivi", "icivă"), "ic"),
    (("ativ", "ativa", "ative", "ativi", "ativă", "aţiune",
      "atoare", "ator", "atori", "ătoare", "ător", "ători"), "at"),
    (("itiv", "itiva", "itive", "itivi", "itivă", "iţiune",
      "itoare", "itor", "itori"), "it"),
):
    for _s in _sufs:
        _RO_COMBO[_s] = _rep if _rep is not None else "iv"
del _sufs, _rep, _s
# NOTE: bare iv/iva/... and ical/iciv/... families appear in BOTH a_2
# and a_3 in the reference; a_2 carries the -itate composites plus the
# ic/at/it/iv/abil/ibil families with their flexions — the dict above
# mirrors a_2 exactly (46 entries).
# a_3 standard suffixes (:93-155): case 1 delete, 2 iune/iuni after ţ,
# 3 -> "ist"
_RO_STD_DEL = (
    "ica", "abila", "ibila", "oasa", "ata", "ita", "anta", "uta",
    "iva", "ic", "ice", "abile", "ibile", "oase", "ate", "itate",
    "ite", "ante", "ute", "ive", "ici", "abili", "ibili", "atori",
    "osi", "ati", "itati", "iti", "anti", "uti", "ivi", "ităi",
    "oşi", "ităţi", "abil", "ibil", "ator", "os", "at", "it", "ant",
    "ut", "iv", "ică", "abilă", "ibilă", "oasă", "ată", "ită",
    "antă", "ută", "ivă",
)
_RO_STD_IST = ("ista", "isme", "iste", "isti", "işti", "ism", "ist",
               "istă")
_RO_STD_IUNE = ("iune", "iuni")
_RO_STD_ALL = _RO_STD_DEL + _RO_STD_IST + _RO_STD_IUNE
# a_4 verb suffixes (:158-256): case 2 entries delete unconditionally;
# case 1 entries need a preceding non-vowel or 'u' (within RV)
_RO_VERB_2 = (
    "se", "sese", "sei", "seşi", "seseşi", "serăţi", "seserăţi",
    "seră", "seseră", "seserăm", "serăm", "sesem", "aţi", "eţi",
    "iţi", "âţi", "em", "im", "âm", "ăm",
)
_RO_VERB_1 = (
    "ea", "ia", "esc", "ăsc", "ind", "ând", "are", "ere", "ire",
    "âre", "ase", "ise", "use", "âse", "eşte", "ăşte", "eze", "ai",
    "eai", "iai", "eşti", "ăşti", "ui", "ezi", "âi", "aşi",
    "aseşi", "iseşi", "useşi", "âseşi", "işi", "uşi", "âşi",
    "eaţi", "iaţi", "arăţi", "aserăţi", "iserăţi", "userăţi",
    "âserăţi", "irăţi", "urăţi", "ârăţi", "am", "eam", "iam", "asem",
    "isem", "usem", "âsem", "arăm", "aserăm", "iserăm",
    "userăm", "âserăm", "irăm", "urăm", "ârăm", "au", "eau", "iau",
    "indu", "ându", "ez", "ească", "ară", "aseră", "iseră", "useră",
    "âseră", "iră", "ură", "âră", "ează",
)
_RO_VERB_ALL = tuple(set(_RO_VERB_1) | set(_RO_VERB_2))
_RO_VOWEL_SUF = ("a", "e", "ie", "i", "ă")


def _romance_regions(w: str, vowels) -> tuple[int, int, int]:
    """Standard Romance (Spanish-pattern) pV/p1/p2 marks."""
    n = len(w)
    pv = p1 = p2 = n
    # RV
    if n >= 2:
        if w[1] not in vowels:
            # consonant in 2nd position: after the next vowel
            for i in range(2, n):
                if w[i] in vowels:
                    pv = i + 1
                    break
        elif w[0] in vowels:
            # two initial vowels: after the next consonant
            for i in range(2, n):
                if w[i] not in vowels:
                    pv = i + 1
                    break
        else:
            # consonant + vowel: position 3
            pv = 3 if n >= 3 else n
    # R1 / R2: after the first non-vowel following a vowel
    def _after_nonvowel_after_vowel(start: int) -> int:
        i = start
        while i < n and w[i] not in vowels:
            i += 1
        while i < n and w[i] in vowels:
            i += 1
        return i + 1 if i < n else n

    p1 = _after_nonvowel_after_vowel(0)
    p2 = _after_nonvowel_after_vowel(p1) if p1 < n else n
    return pv, p1, p2


def romanian_stem(w: str) -> str:
    """Snowball Romanian (RomanianStemmer.java stem():768-850).

    prelude marks i/u between vowels as consonants (I/U); step_0 noun
    flexions in R1; repeated combo suffixes in R1; standard suffixes in
    R2; verb suffixes in RV only when steps 1-2 removed nothing; final
    vowel in RV; postlude folds I/U back.
    """
    # prelude: u/i between vowels -> U/I
    if len(w) >= 3:
        s = list(w)
        for k in range(1, len(s) - 1):
            if (
                s[k] in ("u", "i")
                and s[k - 1] in _RO_VOWELS
                and s[k + 1] in _RO_VOWELS
            ):
                s[k] = s[k].upper()
        w = "".join(s)
    # regions see the marked word: I/U are consonants, like g_v
    pv, p1, p2 = _romance_regions(w, _RO_VOWELS)

    # step_0 (longest among, then R1 check — no retry)
    m = _longest_suffix(w, 0, _RO_STEP0)
    if m is not None and len(w) - len(m) >= p1:
        if m == "ile" and w.endswith("abile"):
            pass  # not preceded by "ab"
        else:
            w = w[: -len(m)] + _RO_STEP0[m]

    # standard_suffix: repeat combo, then a_3 in R2
    removed = False
    while True:
        m = _longest_suffix(w, 0, _RO_COMBO)
        if m is None or len(w) - len(m) < p1:
            break
        w = w[: -len(m)] + _RO_COMBO[m]
        removed = True
    m = _longest_suffix(w, 0, _RO_STD_ALL)
    if m is not None and len(w) - len(m) >= p2:
        if m in _RO_STD_IUNE:
            if w[: -len(m)].endswith("ţ"):
                w = w[: -len(m) - 1] + "t"
                removed = True
        elif m in _RO_STD_IST:
            w = w[: -len(m)] + "ist"
            removed = True
        else:
            w = w[: -len(m)]
            removed = True

    # verb_suffix (only if steps 1-2 removed nothing), within RV
    if not removed:
        m = _longest_suffix(w, pv, _RO_VERB_ALL)
        if m is not None:
            if m in _RO_VERB_2:
                w = w[: -len(m)]
            else:
                prev = len(w) - len(m) - 1
                if prev >= pv and (
                    w[prev] not in _RO_VOWELS or w[prev] == "u"
                ):
                    w = w[: -len(m)]

    # vowel_suffix in RV
    m = _longest_suffix(w, 0, _RO_VOWEL_SUF)
    if m is not None and len(w) - len(m) >= pv:
        w = w[: -len(m)]

    return w.replace("I", "i").replace("U", "u")


# ---------------------------------------------------------------- Danish

_DA_VOWELS = frozenset("aeiouyæåø")
# valid s-endings (DanishStemmer.java:71 g_s_ending bitmask decoded)
_DA_S_END = frozenset("abcdfghjklmnoprtvyzå")
# a_0 (DanishStemmer.java:19-52); "s" handled separately (case 2)
_DA_MAIN = (
    "hed", "ethed", "ered", "e", "erede", "ende", "erende", "ene",
    "erne", "ere", "en", "heden", "eren", "er", "heder", "erer",
    "s", "heds", "es", "endes", "erendes", "enes", "ernes", "eres",
    "ens", "hedens", "erens", "ers", "ets", "erets", "et", "eret",
)
_DA_OTHER = ("ig", "lig", "elig", "els", "løst")


def _scand_r1(w: str, vowels) -> int:
    """Scandinavian mark_regions: p1 = after the first non-vowel that
    follows a vowel, clamped to >= 3 (DanishStemmer.java:84-150)."""
    n = len(w)
    if n < 3:
        return n
    i = 0
    while i < n and w[i] not in vowels:
        i += 1
    while i < n and w[i] in vowels:
        i += 1
    if i >= n:
        return n
    p1 = i + 1
    return max(p1, 3)


def _da_consonant_pair(w: str, p1: int) -> str:
    """gd/dt/gt/kt in R1 at the end -> drop the LAST letter
    (DanishStemmer.java:202-247)."""
    if len(w) - 2 >= p1 and w[-2:] in ("gd", "dt", "gt", "kt"):
        return w[:-1]
    return w


def danish_stem(w: str) -> str:
    """Snowball Danish (DanishStemmer.java stem():339-420)."""
    p1 = _scand_r1(w, _DA_VOWELS)
    # main_suffix
    m = _longest_suffix(w, p1, _DA_MAIN)
    if m is not None:
        if m != "s":
            w = w[: -len(m)]
        elif len(w) >= 2 and w[-2] in _DA_S_END:
            w = w[:-1]
    # consonant_pair
    w = _da_consonant_pair(w, p1)
    # other_suffix: "igst" drops "st" first (no region check), then
    # the R1 among; delete-cases retry consonant_pair
    if w.endswith("igst"):
        w = w[:-2]
    m = _longest_suffix(w, p1, _DA_OTHER)
    if m == "løst":
        w = w[:-1]
    elif m is not None:
        w = w[: -len(m)]
        w = _da_consonant_pair(w, p1)
    # undouble: last char in R1, non-vowel, equal to the one before it
    if (
        len(w) >= 2
        and len(w) - 1 >= p1
        and w[-1] not in _DA_VOWELS
        and w[-1] == w[-2]
    ):
        w = w[:-1]
    return w
