"""KStem — Bob Krovetz' morphological English stemmer.

Reference: analysis/en/KStemmer.java:70-1520 (the Lucene port of
kstem, used by solr.KStemFilterFactory) and KStemFilter.java.  The
head-word dictionary (KStemData1-8, 27,495 words) is reproduced as
data at fixtures/kstem_dict.txt.gz; the exception/conflation/
nationality/supplement/proper-noun tables are embedded below.  The
rule pipeline is a faithful port of the buffer (word, j, k) machinery:
each ending routine mutates the buffer and consults the dictionary,
the driver stops at the first dictionary hit, and a hit with a
conflation root rewrites to that root.  Verified against the
reference's COMPLETE kstemTestData.zip examples (12,130 pairs,
tests/test_kstem.py).
"""

from __future__ import annotations

import gzip
from pathlib import Path

_MAX_WORD_LEN = 50

_EXCEPTION_WORDS = (
    "aide", "bathe", "caste", "cute", "dame", "dime", "doge", "done",
    "dune", "envelope", "gage", "grille", "grippe", "lobe", "mane",
    "mare", "nape", "node", "pane", "pate", "plane", "pope",
    "programme", "quite", "ripe", "rote", "rune", "sage", "severe",
    "shoppe", "sine", "slime", "snipe", "steppe", "suite", "swinge",
    "tare", "tine", "tope", "tripe", "twine",
)

_DIRECT_CONFLATIONS = (
    ("aging", "age"), ("going", "go"), ("goes", "go"), ("lying", "lie"),
    ("using", "use"), ("owing", "owe"), ("suing", "sue"),
    ("dying", "die"), ("tying", "tie"), ("vying", "vie"),
    ("aged", "age"), ("used", "use"), ("vied", "vie"), ("cued", "cue"),
    ("died", "die"), ("eyed", "eye"), ("hued", "hue"), ("iced", "ice"),
    ("lied", "lie"), ("owed", "owe"), ("sued", "sue"), ("toed", "toe"),
    ("tied", "tie"), ("does", "do"), ("doing", "do"),
    ("aeronautical", "aeronautics"), ("mathematical", "mathematics"),
    ("political", "politics"), ("metaphysical", "metaphysics"),
    ("cylindrical", "cylinder"), ("nazism", "nazi"),
    ("ambiguity", "ambiguous"), ("barbarity", "barbarous"),
    ("credulity", "credulous"), ("generosity", "generous"),
    ("spontaneity", "spontaneous"), ("unanimity", "unanimous"),
    ("voracity", "voracious"), ("fled", "flee"),
    ("miscarriage", "miscarry"),
)

_SUPPLEMENT_DICT = (
    "aids", "applicator", "capacitor", "digitize", "electromagnet",
    "ellipsoid", "exosphere", "extensible", "ferromagnet", "graphics",
    "hydromagnet", "polygraph", "toroid", "superconduct",
    "backscatter", "connectionism",
)

_COUNTRY_NATIONALITY = (
    ('afghan', 'afghanistan'), ('african', 'africa'), ('albanian',
    'albania'), ('algerian', 'algeria'), ('american', 'america'),
    ('andorran', 'andorra'), ('angolan', 'angola'), ('arabian', 'arabia'),
    ('argentine', 'argentina'), ('armenian', 'armenia'), ('asian',
    'asia'), ('australian', 'australia'), ('austrian', 'austria'),
    ('azerbaijani', 'azerbaijan'), ('azeri', 'azerbaijan'),
    ('bangladeshi', 'bangladesh'), ('belgian', 'belgium'), ('bermudan',
    'bermuda'), ('bolivian', 'bolivia'), ('bosnian', 'bosnia'),
    ('botswanan', 'botswana'), ('brazilian', 'brazil'), ('british',
    'britain'), ('bulgarian', 'bulgaria'), ('burmese', 'burma'),
    ('californian', 'california'), ('cambodian', 'cambodia'), ('canadian',
    'canada'), ('chadian', 'chad'), ('chilean', 'chile'), ('chinese',
    'china'), ('colombian', 'colombia'), ('croat', 'croatia'),
    ('croatian', 'croatia'), ('cuban', 'cuba'), ('cypriot', 'cyprus'),
    ('czechoslovakian', 'czechoslovakia'), ('danish', 'denmark'),
    ('egyptian', 'egypt'), ('equadorian', 'equador'), ('eritrean',
    'eritrea'), ('estonian', 'estonia'), ('ethiopian', 'ethiopia'),
    ('european', 'europe'), ('fijian', 'fiji'), ('filipino',
    'philippines'), ('finnish', 'finland'), ('french', 'france'),
    ('gambian', 'gambia'), ('georgian', 'georgia'), ('german', 'germany'),
    ('ghanian', 'ghana'), ('greek', 'greece'), ('grenadan', 'grenada'),
    ('guamian', 'guam'), ('guatemalan', 'guatemala'), ('guinean',
    'guinea'), ('guyanan', 'guyana'), ('haitian', 'haiti'), ('hawaiian',
    'hawaii'), ('holland', 'dutch'), ('honduran', 'honduras'),
    ('hungarian', 'hungary'), ('icelandic', 'iceland'), ('indonesian',
    'indonesia'), ('iranian', 'iran'), ('iraqi', 'iraq'), ('iraqui',
    'iraq'), ('irish', 'ireland'), ('israeli', 'israel'), ('italian',
    'italy'), ('jamaican', 'jamaica'), ('japanese', 'japan'),
    ('jordanian', 'jordan'), ('kampuchean', 'cambodia'), ('kenyan',
    'kenya'), ('korean', 'korea'), ('kuwaiti', 'kuwait'), ('lankan',
    'lanka'), ('laotian', 'laos'), ('latvian', 'latvia'), ('lebanese',
    'lebanon'), ('liberian', 'liberia'), ('libyan', 'libya'),
    ('lithuanian', 'lithuania'), ('macedonian', 'macedonia'),
    ('madagascan', 'madagascar'), ('malaysian', 'malaysia'), ('maltese',
    'malta'), ('mauritanian', 'mauritania'), ('mexican', 'mexico'),
    ('micronesian', 'micronesia'), ('moldovan', 'moldova'), ('monacan',
    'monaco'), ('mongolian', 'mongolia'), ('montenegran', 'montenegro'),
    ('moroccan', 'morocco'), ('myanmar', 'burma'), ('namibian',
    'namibia'), ('nepalese', 'nepal'),
    # {"netherlands","dutch"} is commented out in the reference
    ('nicaraguan', 'nicaragua'), ('nigerian', 'nigeria'), ('norwegian',
    'norway'), ('omani', 'oman'), ('pakistani', 'pakistan'),
    ('panamanian', 'panama'), ('papuan', 'papua'), ('paraguayan',
    'paraguay'), ('peruvian', 'peru'), ('portuguese', 'portugal'),
    ('romanian', 'romania'), ('rumania', 'romania'), ('rumanian',
    'romania'), ('russian', 'russia'), ('rwandan', 'rwanda'), ('samoan',
    'samoa'), ('scottish', 'scotland'), ('serb', 'serbia'), ('serbian',
    'serbia'), ('siam', 'thailand'), ('siamese', 'thailand'), ('slovakia',
    'slovak'), ('slovakian', 'slovak'), ('slovenian', 'slovenia'),
    ('somali', 'somalia'), ('somalian', 'somalia'), ('spanish', 'spain'),
    ('swedish', 'sweden'), ('swiss', 'switzerland'), ('syrian', 'syria'),
    ('taiwanese', 'taiwan'), ('tanzanian', 'tanzania'), ('texan',
    'texas'), ('thai', 'thailand'), ('tunisian', 'tunisia'), ('turkish',
    'turkey'), ('ugandan', 'uganda'), ('ukrainian', 'ukraine'),
    ('uruguayan', 'uruguay'), ('uzbek', 'uzbekistan'), ('venezuelan',
    'venezuela'), ('vietnamese', 'viet'), ('virginian', 'virginia'),
    ('yemeni', 'yemen'), ('yugoslav', 'yugoslavia'), ('yugoslavian',
    'yugoslavia'), ('zambian', 'zambia'), ('zealander', 'zealand'),
    ('zimbabwean', 'zimbabwe'),
)

_PROPER_NOUNS = (
    'abrams', 'achilles', 'acropolis', 'adams', 'agnes', 'aires',
    'alexander', 'alexis', 'alfred', 'algiers', 'alps', 'amadeus', 'ames',
    'amos', 'andes', 'angeles', 'annapolis', 'antilles', 'aquarius',
    'archimedes', 'arkansas', 'asher', 'ashly', 'athens', 'atkins',
    'atlantis', 'avis', 'bahamas', 'bangor', 'barbados', 'barger',
    'bering', 'brahms', 'brandeis', 'brussels', 'bruxelles', 'cairns',
    'camoros', 'camus', 'carlos', 'celts', 'chalker', 'charles', 'cheops',
    'ching', 'christmas', 'cocos', 'collins', 'columbus', 'confucius',
    'conners', 'connolly', 'copernicus', 'cramer', 'cyclops', 'cygnus',
    'cyprus', 'dallas', 'damascus', 'daniels', 'davies', 'davis',
    'decker', 'denning', 'dennis', 'descartes', 'dickens', 'doris',
    'douglas', 'downs', 'dreyfus', 'dukakis', 'dulles', 'dumfries',
    'ecclesiastes', 'edwards', 'emily', 'erasmus', 'euphrates', 'evans',
    'everglades', 'fairbanks', 'federales', 'fisher', 'fitzsimmons',
    'fleming', 'forbes', 'fowler', 'france', 'francis', 'goering',
    'goodling', 'goths', 'grenadines', 'guiness', 'hades', 'harding',
    'harris', 'hastings', 'hawkes', 'hawking', 'hayes', 'heights',
    'hercules', 'himalayas', 'hippocrates', 'hobbs', 'holmes', 'honduras',
    'hopkins', 'hughes', 'humphreys', 'illinois', 'indianapolis',
    'inverness', 'iris', 'iroquois', 'irving', 'isaacs', 'italy', 'james',
    'jarvis', 'jeffreys', 'jesus', 'jones', 'josephus', 'judas', 'julius',
    'kansas', 'keynes', 'kipling', 'kiwanis', 'lansing', 'laos', 'leeds',
    'levis', 'leviticus', 'lewis', 'louis', 'maccabees', 'madras',
    'maimonides', 'maldive', 'massachusetts', 'matthews', 'mauritius',
    'memphis', 'mercedes', 'midas', 'mingus', 'minneapolis', 'mohammed',
    'moines', 'morris', 'moses', 'myers', 'myknos', 'nablus', 'nanjing',
    'nantes', 'naples', 'neal', 'netherlands', 'nevis', 'nostradamus',
    'oedipus', 'olympus', 'orleans', 'orly', 'papas', 'paris', 'parker',
    'pauling', 'peking', 'pershing', 'peter', 'peters', 'philippines',
    'phineas', 'pisces', 'pryor', 'pythagoras', 'queens', 'rabelais',
    'ramses', 'reynolds', 'rhesus', 'rhodes', 'richards', 'robins',
    'rodgers', 'rogers', 'rubens', 'sagittarius', 'seychelles',
    'socrates', 'texas', 'thames', 'thomas', 'tiberias', 'tunis', 'venus',
    'vilnius', 'wales', 'warner', 'wilkins', 'williams', 'wyoming',
    'xmas', 'yonkers', 'zeus', 'frances', 'aarhus', 'adonis', 'andrews',
    'angus', 'antares', 'aquinas', 'arcturus', 'ares', 'artemis',
    'augustus', 'ayers', 'barnabas', 'barnes', 'becker', 'bejing',
    'biggs', 'billings', 'boeing', 'boris', 'borroughs', 'briggs',
    'buenos', 'calais', 'caracas', 'cassius', 'cerberus', 'ceres',
    'cervantes', 'chantilly', 'chartres', 'chester', 'connally', 'conner',
    'coors', 'cummings', 'curtis', 'daedalus', 'dionysus', 'dobbs',
    'dolores', 'edmonds',
)

_DICT: dict[str, tuple[str | None, bool]] | None = None


def _build_dict():
    global _DICT
    if _DICT is not None:
        return _DICT
    d: dict[str, tuple[str | None, bool]] = {}
    for w in _EXCEPTION_WORDS:
        d[w] = (w, True)
    for w, root in _DIRECT_CONFLATIONS:
        d[w] = (root, False)
    for w, root in _COUNTRY_NATIONALITY:
        d[w] = (root, False)
    path = Path(__file__).resolve().parents[2] / "fixtures" / \
        "kstem_dict.txt.gz"
    with gzip.open(path, "rt", encoding="utf-8") as f:
        for line in f:
            w = line.strip()
            if w and w not in d:
                d[w] = (None, False)
    for w in _SUPPLEMENT_DICT:
        d.setdefault(w, (None, False))
    for w in _PROPER_NOUNS:
        d.setdefault(w, (None, False))
    _DICT = d
    return d


class _KState:
    """The (word, j, k) buffer of KStemmer.java:244-262."""

    __slots__ = ("w", "j", "k", "matched")

    def __init__(self, term: str):
        self.w = list(term)
        self.j = 0
        self.k = len(term) - 1
        self.matched: tuple[str | None, bool] | None = None

    # buffer ops
    def set_length(self, n: int) -> None:
        del self.w[n:]

    def write(self, ch: str) -> None:
        self.w.append(ch)

    def append(self, s: str) -> None:
        self.w.extend(s)

    def set_char(self, i: int, ch: str) -> None:
        if i < len(self.w):
            self.w[i] = ch
        else:
            # OpenStringBuilder.setCharAt beyond length writes into the
            # reserved buffer; the subsequent setLength exposes it
            while len(self.w) < i:
                self.w.append("\0")
            self.w.append(ch)

    def word(self) -> str:
        return "".join(self.w)

    # predicates
    def is_cons(self, i: int) -> bool:
        ch = self.w[i]
        if ch in "aeiou":
            return False
        if ch != "y" or i == 0:
            return True
        return not self.is_cons(i - 1)

    def is_vowel(self, i: int) -> bool:
        return not self.is_cons(i)

    def double_c(self, i: int) -> bool:
        if i < 1:
            return False
        if self.w[i] != self.w[i - 1]:
            return False
        return self.is_cons(i)

    def vowel_in_stem(self) -> bool:
        return any(self.is_vowel(i) for i in range(self.j + 1))

    # suffix matching (sets j)
    def ends_in(self, s: str) -> bool:
        if len(s) > self.k:
            return False
        if len(s) > 4:
            # the char[] variant presets j (KStemmer.java:425-436)
            self.j = self.k
        r = len(self.w) - len(s)
        for i, ch in enumerate(s):
            if self.w[r + i] != ch:
                return False
        self.j = r - 1
        return True

    def set_suffix(self, s: str) -> None:
        self.set_length(self.j + 1)
        self.append(s)
        self.k = self.j + len(s)

    # dictionary
    def lookup(self) -> bool:
        self.matched = _build_dict().get(self.word())
        return self.matched is not None

    def word_in_dict(self):
        if self.matched is not None:
            return self.matched
        e = _build_dict().get(self.word())
        if e is not None and not e[1]:
            self.matched = e
        return e


def _plural(s: _KState) -> None:
    if s.w[s.k] != "s":
        return
    if s.ends_in("ies"):
        s.set_length(s.j + 3)
        s.k -= 1
        if s.lookup():  # calories -> calorie
            return
        s.k += 1
        s.write("s")
        s.set_suffix("y")
        s.lookup()
    elif s.ends_in("es"):
        s.set_length(s.j + 2)
        s.k -= 1
        try_e = s.j > 0 and not (
            s.w[s.j] == "s" and s.w[s.j - 1] == "s"
        )
        if try_e and s.lookup():
            return
        s.set_length(s.j + 1)
        s.k -= 1
        if s.lookup():
            return
        s.write("e")
        s.k += 1
        if not try_e:
            s.lookup()
        return
    else:
        if len(s.w) > 3 and s.w[s.k - 1] != "s" and not s.ends_in("ous"):
            s.set_length(s.k)
            s.k -= 1
            s.lookup()


def _past_tense(s: _KState) -> None:
    if len(s.w) <= 4:
        return
    if s.ends_in("ied"):
        s.set_length(s.j + 3)
        s.k -= 1
        if s.lookup():  # almost always -ied -> -y (died -> die)
            return
        s.k += 1
        s.write("d")
        s.set_suffix("y")
        s.lookup()
        return
    if s.ends_in("ed") and s.vowel_in_stem():
        s.set_length(s.j + 2)
        s.k = s.j + 1
        entry = s.word_in_dict()
        if entry is not None and not entry[1]:
            return
        s.set_length(s.j + 1)
        s.k = s.j
        if s.lookup():
            return
        if s.double_c(s.k):
            s.set_length(s.k)
            s.k -= 1
            if s.lookup():
                return
            s.write(s.w[s.k])
            s.k += 1
            s.lookup()
            return
        if s.w[0] == "u" and s.w[1] == "n":
            s.write("e")
            s.write("d")
            s.k += 2
            return
        s.set_length(s.j + 1)
        s.write("e")
        s.k = s.j + 1
        return


def _aspect(s: _KState) -> None:
    if len(s.w) <= 5:
        return
    if s.ends_in("ing") and s.vowel_in_stem():
        s.set_char(s.j + 1, "e")
        s.set_length(s.j + 2)
        s.k = s.j + 1
        entry = s.word_in_dict()
        if entry is not None and not entry[1]:
            return
        s.set_length(s.k)
        s.k -= 1
        if s.lookup():
            return
        if s.double_c(s.k):
            s.k -= 1
            s.set_length(s.k + 1)
            if s.lookup():
                return
            s.write(s.w[s.k])
            s.k += 1
            s.lookup()
            return
        if s.j > 0 and s.is_cons(s.j) and s.is_cons(s.j - 1):
            s.k = s.j
            s.set_length(s.k + 1)
            return
        s.set_length(s.j + 1)
        s.write("e")
        s.k = s.j + 1
        return


def _ity_endings(s: _KState) -> None:
    old_k = s.k
    if s.ends_in("ity"):
        s.set_length(s.j + 1)
        s.k = s.j
        if s.lookup():
            return
        s.write("e")
        s.k = s.j + 1
        if s.lookup():
            return
        s.set_char(s.j + 1, "i")
        s.append("ty")
        s.k = old_k
        if s.j > 0 and s.w[s.j - 1] == "i" and s.w[s.j] == "l":
            s.set_length(s.j - 1)
            s.append("le")
            s.k = s.j
            s.lookup()
            return
        if s.j > 0 and s.w[s.j - 1] == "i" and s.w[s.j] == "v":
            s.set_length(s.j + 1)
            s.write("e")
            s.k = s.j + 1
            s.lookup()
            return
        if s.j > 0 and s.w[s.j - 1] == "a" and s.w[s.j] == "l":
            s.set_length(s.j + 1)
            s.k = s.j
            s.lookup()
            return
        if s.lookup():
            return
        s.set_length(s.j + 1)
        s.k = s.j
        return


def _nce_endings(s: _KState) -> None:
    old_k = s.k
    if s.ends_in("nce"):
        ch = s.w[s.j]
        if ch not in ("e", "a"):
            return
        s.set_length(s.j)
        s.write("e")
        s.k = s.j
        if s.lookup():
            return
        s.set_length(s.j)
        s.k = s.j - 1
        if s.lookup():
            return
        s.write(ch)
        s.append("nce")
        s.k = old_k


def _ness_endings(s: _KState) -> None:
    if s.ends_in("ness"):
        s.set_length(s.j + 1)
        s.k = s.j
        if s.w[s.j] == "i":
            s.set_char(s.j, "y")
        s.lookup()


def _ism_endings(s: _KState) -> None:
    if s.ends_in("ism"):
        s.set_length(s.j + 1)
        s.k = s.j
        s.lookup()


def _ment_endings(s: _KState) -> None:
    old_k = s.k
    if s.ends_in("ment"):
        s.set_length(s.j + 1)
        s.k = s.j
        if s.lookup():
            return
        s.append("ment")
        s.k = old_k


def _ize_endings(s: _KState) -> None:
    old_k = s.k
    if s.ends_in("ize"):
        s.set_length(s.j + 1)
        s.k = s.j
        if s.lookup():
            return
        s.write("i")
        if s.double_c(s.j):
            s.set_length(s.j)
            s.k = s.j - 1
            if s.lookup():
                return
            s.write(s.w[s.j - 1])
        s.set_length(s.j + 1)
        s.write("e")
        s.k = s.j + 1
        if s.lookup():
            return
        s.set_length(s.j + 1)
        s.append("ize")
        s.k = old_k


def _ncy_endings(s: _KState) -> None:
    if s.ends_in("ncy"):
        if s.w[s.j] not in ("e", "a"):
            return
        s.set_char(s.j + 2, "t")
        s.set_length(s.j + 3)
        s.k = s.j + 2
        if s.lookup():
            return
        s.set_char(s.j + 2, "c")
        s.write("e")
        s.k = s.j + 3
        s.lookup()


def _ble_endings(s: _KState) -> None:
    old_k = s.k
    if s.ends_in("ble"):
        if s.w[s.j] not in ("a", "i"):
            return
        ch = s.w[s.j]
        s.set_length(s.j)
        s.k = s.j - 1
        if s.lookup():
            return
        if s.double_c(s.k):
            s.set_length(s.k)
            s.k -= 1
            if s.lookup():
                return
            s.k += 1
            s.write(s.w[s.k - 1])
        s.set_length(s.j)
        s.write("e")
        s.k = s.j
        if s.lookup():
            return
        s.set_length(s.j)
        s.append("ate")
        s.k = s.j + 2
        if s.lookup():
            return
        s.set_length(s.j)
        s.write(ch)
        s.append("ble")
        s.k = old_k


def _ic_endings(s: _KState) -> None:
    if s.ends_in("ic"):
        s.set_length(s.j + 3)
        s.append("al")
        s.k = s.j + 4
        if s.lookup():
            return
        s.set_char(s.j + 1, "y")
        s.set_length(s.j + 2)
        s.k = s.j + 1
        if s.lookup():
            return
        s.set_char(s.j + 1, "e")
        if s.lookup():
            return
        s.set_length(s.j + 1)
        s.k = s.j
        if s.lookup():
            return
        s.append("ic")
        s.k = s.j + 2


def _ion_endings(s: _KState) -> None:
    old_k = s.k
    if not s.ends_in("ion"):
        return
    if s.ends_in("ization"):
        s.set_length(s.j + 3)
        s.write("e")
        s.k = s.j + 3
        s.lookup()
        return
    if s.ends_in("ition"):
        s.set_length(s.j + 1)
        s.write("e")
        s.k = s.j + 1
        if s.lookup():  # definition -> define
            return
        s.set_length(s.j + 1)
        s.append("ition")
        s.k = old_k
    elif s.ends_in("ation"):
        s.set_length(s.j + 3)
        s.write("e")
        s.k = s.j + 3
        if s.lookup():  # elimination -> eliminate
            return
        s.set_length(s.j + 1)
        s.write("e")
        s.k = s.j + 1
        if s.lookup():
            return
        s.set_length(s.j + 1)
        s.k = s.j
        if s.lookup():  # resignation -> resign
            return
        s.set_length(s.j + 1)
        s.append("ation")
        s.k = old_k
    if s.ends_in("ication"):
        s.set_length(s.j + 1)
        s.write("y")
        s.k = s.j + 1
        if s.lookup():  # amplification -> amplify
            return
        s.set_length(s.j + 1)
        s.append("ication")
        s.k = old_k
    # plain -ion
    s.j = s.k - 3
    s.set_length(s.j + 1)
    s.write("e")
    s.k = s.j + 1
    if s.lookup():
        return
    s.set_length(s.j + 1)
    s.k = s.j
    if s.lookup():
        return
    s.set_length(s.j + 1)
    s.append("ion")
    s.k = old_k


def _er_and_or_endings(s: _KState) -> None:
    old_k = s.k
    if s.w[s.k] != "r":
        return
    if s.ends_in("izer"):
        s.set_length(s.j + 4)
        s.k = s.j + 3
        s.lookup()
        return
    if s.ends_in("er") or s.ends_in("or"):
        ch = s.w[s.j + 1]
        if s.double_c(s.j):
            s.set_length(s.j)
            s.k = s.j - 1
            if s.lookup():
                return
            s.write(s.w[s.j - 1])
        if s.w[s.j] == "i":  # -ier
            s.set_char(s.j, "y")
            s.set_length(s.j + 1)
            s.k = s.j
            if s.lookup():
                return
            s.set_char(s.j, "i")
            s.write("e")
        if s.w[s.j] == "e":  # -eer
            s.set_length(s.j)
            s.k = s.j - 1
            if s.lookup():
                return
            s.write("e")
        s.set_length(s.j + 2)
        s.k = s.j + 1
        if s.lookup():
            return
        s.set_length(s.j + 1)
        s.k = s.j
        if s.lookup():
            return
        s.write("e")
        s.k = s.j + 1
        if s.lookup():
            return
        s.set_length(s.j + 1)
        s.write(ch)
        s.write("r")
        s.k = old_k


def _ly_endings(s: _KState) -> None:
    old_k = s.k
    if s.ends_in("ly"):
        s.set_char(s.j + 2, "e")  # -ly -> -le
        if s.lookup():
            return
        s.set_char(s.j + 2, "y")
        s.set_length(s.j + 1)
        s.k = s.j
        if s.lookup():
            return
        if s.j > 0 and s.w[s.j - 1] == "a" and s.w[s.j] == "l":
            return  # always convert -ally to -al
        s.append("ly")
        s.k = old_k
        if s.j > 0 and s.w[s.j - 1] == "a" and s.w[s.j] == "b":
            s.set_char(s.j + 2, "e")  # -ably -> -able
            s.k = s.j + 2
            return
        if s.w[s.j] == "i":  # militarily -> military
            s.set_length(s.j)
            s.write("y")
            s.k = s.j
            if s.lookup():
                return
            s.set_length(s.j)
            s.append("ily")
            s.k = old_k
        s.set_length(s.j + 1)
        s.k = s.j


def _al_endings(s: _KState) -> None:
    old_k = s.k
    if len(s.w) < 4:
        return
    if s.ends_in("al"):
        s.set_length(s.j + 1)
        s.k = s.j
        if s.lookup():
            return
        if s.double_c(s.j):
            s.set_length(s.j)
            s.k = s.j - 1
            if s.lookup():
                return
            s.write(s.w[s.j - 1])
        s.set_length(s.j + 1)
        s.write("e")
        s.k = s.j + 1
        if s.lookup():
            return
        s.set_length(s.j + 1)
        s.append("um")  # optimal -> optimum
        s.k = s.j + 2
        if s.lookup():
            return
        s.set_length(s.j + 1)
        s.append("al")
        s.k = old_k
        if s.j > 0 and s.w[s.j - 1] == "i" and s.w[s.j] == "c":
            s.set_length(s.j - 1)  # remove -ical
            s.k = s.j - 2
            if s.lookup():
                return
            s.set_length(s.j - 1)
            s.write("y")  # bibliographical -> bibliography
            s.k = s.j - 1
            if s.lookup():
                return
            s.set_length(s.j - 1)
            s.append("ic")  # default: -ical -> -ic
            s.k = s.j
            s.lookup()
            return
        if s.w[s.j] == "i":  # -ial
            s.set_length(s.j)
            s.k = s.j - 1
            if s.lookup():
                return
            s.append("ial")
            s.k = old_k
            s.lookup()


def _ive_endings(s: _KState) -> None:
    old_k = s.k
    if s.ends_in("ive"):
        s.set_length(s.j + 1)
        s.k = s.j
        if s.lookup():
            return
        s.write("e")
        s.k = s.j + 1
        if s.lookup():
            return
        s.set_length(s.j + 1)
        s.append("ive")
        if s.j > 0 and s.w[s.j - 1] == "a" and s.w[s.j] == "t":
            s.set_char(s.j - 1, "e")  # determinative -> determine
            s.set_length(s.j)
            s.k = s.j - 1
            if s.lookup():
                return
            s.set_length(s.j - 1)
            if s.lookup():
                return
            s.append("ative")
            s.k = old_k
        s.set_char(s.j + 2, "o")  # -ive -> -ion
        s.set_char(s.j + 3, "n")
        if s.lookup():
            return
        s.set_char(s.j + 2, "v")
        s.set_char(s.j + 3, "e")
        s.k = old_k


def kstem(term: str) -> str:
    """KStemmer.stem (KStemmer.java:1355-1513).  Expects a lowercase
    term; non a-z terms and very short/long terms pass through."""
    k = len(term) - 1
    if k <= 1 or k >= _MAX_WORD_LEN - 1:
        return term
    entry = _build_dict().get(term)
    if entry is not None:
        return entry[0] if entry[0] is not None else term
    if not all("a" <= c <= "z" for c in term):
        return term

    s = _KState(term)
    steps = (
        _plural, _past_tense, _aspect, _ity_endings, _ness_endings,
        _ion_endings, _er_and_or_endings, _ly_endings, _al_endings,
    )
    done = False
    for step in steps:
        step(s)
        if s.matched is not None:
            done = True
            break
    if not done:
        s.word_in_dict()
        for step in (_ive_endings, _ize_endings, _ment_endings,
                     _ble_endings, _ism_endings, _ic_endings,
                     _ncy_endings, _nce_endings):
            step(s)
            if s.matched is not None:
                break

    if s.matched is not None and s.matched[0] is not None:
        return s.matched[0]
    return s.word()
