"""Text analysis operators for training-data pipelines.

All JVM-side column expressions (whole-stage codegen; no Python in the
hot path) so they hold up on a 100 TB corpus: language-ID (lexicon
n-gram heuristic), quality scoring, token counting (whitespace + a
BPE-ish regex), and deterministic document fingerprinting (md5-derived
polynomial rolling hash).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# BPE-ish pretokenization regex (letter runs / digit runs / single
# punctuation), deliberately expressible in both Spark and ANSI-ish SQL.
BPE_REGEX = "[a-z]+|[0-9]+|[^a-z0-9 ]"

# tiny per-language stopword lexicons for the heuristic language id
LANG_LEXICONS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "a"],
    "es": ["el", "la", "de", "que", "y", "los"],
    "de": ["der", "die", "und", "das", "nicht", "ist"],
    "fr": ["le", "la", "et", "les", "des", "une"],
}


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + BPE-ish subword count per document."""
    lower = F.lower(F.col(text_col))
    return df.withColumn(
        "ws_tokens", F.size(F.split(F.trim(F.col(text_col)), " +"))
    ).withColumn(
        "bpe_tokens", F.size(F.regexp_extract_all(lower, F.lit(BPE_REGEX), 0))
    )


def _lexicon_hits(normalized_text, lex: list[str]):
    """Count tokens of ``normalized_text`` (already lower+trim) equal to
    a lexicon word, where tokens are the ``split(·, ' +')`` segments.

    Token equality re-expressed as ONE compiled-regex pass over the raw
    string — ``(^| )word( |$)`` with a lookahead so adjacent hits share
    their separator — instead of a per-element interpreted higher-order
    ``filter`` lambda over the split array (the round-2 plan audit's
    slowest-query finding: 4 interpreted array passes per doc).
    Equivalence with the filter form is pinned by a randomized test."""
    # \z (absolute end), NOT $: Java's $ also matches before a final
    # line terminator, which would over-count a lexicon token followed
    # by a trailing newline (split-token equality does not).
    pat = "(?:^| )(?:" + "|".join(lex) + ")(?= |\\z)"
    return F.regexp_count(normalized_text, F.lit(pat))


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic doc-quality features + composite score in [0, 1].

    Features: length, mean word length, stopword ratio, punctuation
    ratio — the standard cheap quality filters for web-scale corpora.
    """
    text = F.col(text_col)
    lower = F.lower(text)
    # greatest(·, 1) guards: ANSI mode (Spark 4 default) raises on /0 for
    # empty documents; empty docs score ~0 either way.
    n_chars = F.greatest(F.length(text), F.lit(1))
    words = F.split(F.trim(text), " +")
    n_words = F.greatest(F.size(words), F.lit(1))
    stop_hits = _lexicon_hits(F.lower(F.trim(text)), LANG_LEXICONS["en"])
    n_punct = F.length(text) - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    mean_word_len = (n_chars - (n_words - 1)) / n_words
    score = (
        F.least(n_words / F.lit(100.0), F.lit(1.0)) * 0.4
        + F.least(stop_hits / n_words * F.lit(5.0), F.lit(1.0)) * 0.3
        + (F.lit(1.0) - F.least(n_punct / n_chars * F.lit(10.0), F.lit(1.0))) * 0.3
    )
    return (
        df.withColumn("n_words", n_words)
        .withColumn("stop_ratio", stop_hits / n_words)
        .withColumn("punct_ratio", n_punct / n_chars)
        .withColumn("quality", score)
    )


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: CJK charset check, then per-language
    stopword-lexicon hit counts; ties broken by fixed language order.

    The argmax is ONE ``greatest()`` over (score, -rank, lang) structs
    so each lexicon regexp appears exactly once in the plan — the
    equivalent fold of ``when(score > best_score, …)`` nests every
    regexp_count inside every later branch, and the generated
    processNext() blows the JVM's 64 KB method limit (whole-stage
    codegen then silently falls back to interpreted eval; this was the
    slowest bench query until rewritten)."""
    text = F.col(text_col)
    norm = F.lower(F.trim(text))
    has_cjk = F.length(F.regexp_replace(text, r"[^一-鿿]", "")) > 0
    # struct ordering is lexicographic: max score first; on ties the
    # smallest rank (earliest language in sorted order) wins via -rank
    top = F.greatest(
        *[
            F.struct(
                _lexicon_hits(norm, LANG_LEXICONS[lang]).alias("s"),
                F.lit(-i).alias("r"),
                F.lit(lang).alias("lang"),
            )
            for i, lang in enumerate(sorted(LANG_LEXICONS))
        ]
    )
    pred = (
        F.when(has_cjk, F.lit("zh"))
        .when(top["s"] > 0, top["lang"])
        .otherwise(F.lit("unknown"))
    )
    return df.withColumn("lang_pred", pred)


def doc_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic position-weighted rolling-hash fingerprint.

    fingerprint = Σ_i md5int(token_i)·(i+1) mod 2^61 — md5-derived so any
    engine reproduces it; position weighting makes it order-sensitive
    (a true content fingerprint, not a bag hash).
    """
    words = F.split(F.lower(F.trim(F.col(text_col))), " +")
    MOD = 2305843009213693951  # 2^61 - 1
    pos_hash = F.aggregate(
        F.zip_with(
            words,
            F.sequence(F.lit(1), F.size(words)),
            lambda w, i: (
                F.conv(F.substring(F.md5(w), 1, 14), 16, 10).cast("long") % MOD
            )
            * i.cast("long")
            % MOD,
        ),
        F.lit(0).cast("long"),
        lambda acc, x: (acc + x) % F.lit(MOD),
    )
    return df.withColumn("fingerprint", pos_hash)
