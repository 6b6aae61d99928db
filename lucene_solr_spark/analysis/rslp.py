"""RSLP stemmer engine (Orengo & Huyck, "A stemming algorithm for the
Portuguese language", SPIRE 2001) + the Galician RSLG adaptation.

Reimplements the reference's rule engine semantics —
analysis/pt/RSLPStemmerBase.java (Rule / RuleWithSetExceptions /
RuleWithSuffixExceptions / Step.apply) — over rule DATA embedded in
``rslp_rules.py`` (the portuguese.rslp / galician.rslp step tables,
reproduced as Python literals the way the snowball stop lists are).

Step semantics (RSLPStemmerBase.java:96-137): a step may carry a
minimum length and a suffix pretest; the FIRST matching rule fires and
the step ends.  A rule matches when the remaining stem stays >= its
min length and the word ends with its suffix, subject to either
whole-word exceptions (type 1) or suffix exceptions (type 0).

Stemmers (flows per the reference classes):

- ``portuguese_minimal_stem``  — the Plural step only
  (pt/PortugueseMinimalStemmer.java)
- ``portuguese_rslp_stem``     — plural → adverb → feminine →
  augmentative → noun → (verb → vowel as fallbacks) → accent strip
  (pt/PortugueseStemmer.java:47-100)
- ``galician_minimal_stem``    — the Plural step only
  (gl/GalicianMinimalStemmer.java)
- ``galician_stem``            — plural → unification → adverb →
  augmentative* (to fixpoint) → noun → (verb fallback) → vowel →
  accent strip (gl/GalicianStemmer.java:47-90)
"""

from __future__ import annotations

from lucene_solr_spark.analysis.rslp_rules import RSLP_STEPS


class _Step:
    __slots__ = ("min", "suffixes", "rules")

    def __init__(self, spec):
        step_min, rtype, suffixes, rules = spec
        self.rules = []
        computed_min = None
        for suffix, rmin, repl, exceptions in rules:
            self.rules.append((suffix, rmin, repl, exceptions, rtype))
            total = rmin + len(suffix)
            if computed_min is None or total < computed_min:
                computed_min = total
        # Step ctor: min == 0 means "derive from the rules"
        self.min = step_min if step_min else (computed_min or 0)
        self.suffixes = tuple(suffixes) if suffixes else None

    def apply(self, w: str) -> str:
        if len(w) < self.min:
            return w
        if self.suffixes is not None and not w.endswith(self.suffixes):
            return w
        for suffix, rmin, repl, exceptions, rtype in self.rules:
            if len(w) - len(suffix) < rmin or not w.endswith(suffix):
                continue
            if exceptions:
                if rtype == 1:
                    # whole-word exceptions (RuleWithSetExceptions)
                    if w in exceptions:
                        continue
                else:
                    # suffix exceptions (RuleWithSuffixExceptions)
                    if w.endswith(tuple(exceptions)):
                        continue
            return w[: len(w) - len(suffix)] + repl
        return w


_STEPS: dict[str, dict[str, _Step]] = {
    lang: {name: _Step(spec) for name, spec in steps.items()}
    for lang, steps in RSLP_STEPS.items()
}

# rslp accent removal (PortugueseStemmer.java:68-98)
_PT_ACCENTS = str.maketrans(
    "àáâãäåçèéêëìíîïñòóôõöùúûüýÿ",
    "aaaaaac" "eeee" "iiii" "n" "ooooo" "uuuu" "yy",
)

# RSLG accent removal (GalicianStemmer.java:78-87)
_GL_ACCENTS = str.maketrans("áéêíóú", "aeeiou")


def portuguese_minimal_stem(w: str) -> str:
    """PortugueseMinimalStemmer.java: the RSLP Plural step."""
    return _STEPS["portuguese"]["Plural"].apply(w)


def portuguese_rslp_stem(w: str) -> str:
    """PortugueseStemmer.java:47-100 — the full RSLP flow."""
    s = _STEPS["portuguese"]
    w = s["Plural"].apply(w)
    w = s["Adverb"].apply(w)
    w = s["Feminine"].apply(w)
    w = s["Augmentative"].apply(w)
    old = w
    w = s["Noun"].apply(w)
    if w == old:
        old = w
        w = s["Verb"].apply(w)
        if w == old:
            w = s["Vowel"].apply(w)
    return w.translate(_PT_ACCENTS)


def galician_minimal_stem(w: str) -> str:
    """GalicianMinimalStemmer.java: the RSLG Plural step."""
    return _STEPS["galician"]["Plural"].apply(w)


def galician_stem(w: str) -> str:
    """GalicianStemmer.java:47-90 — the full RSLG flow (augmentative
    runs to a fixpoint; vowel applies unconditionally)."""
    s = _STEPS["galician"]
    w = s["Plural"].apply(w)
    w = s["Unification"].apply(w)
    w = s["Adverb"].apply(w)
    while True:
        old = w
        w = s["Augmentative"].apply(w)
        if w == old:
            break
    old = w
    w = s["Noun"].apply(w)
    if w == old:
        w = s["Verb"].apply(w)
    w = s["Vowel"].apply(w)
    return w.translate(_GL_ACCENTS)
