"""Language-identification update processor (solr/contrib/langid).

Reference: ``solr/contrib/langid/src/java/org/apache/solr/update/
processor/LanguageIdentifierUpdateProcessor.java`` — the shared
processor frame (process/detectLanguage/resolveLanguage/
getMappedField) that both the Tika and LangDetect variants plug a
detector into, with LangIdParams.java's parameter surface:
threshold, fallback, whitelist, lcmap, langField overwrite, and
``langid.map`` field routing.

The detector here is the engine's own deterministic lexicon scorer
(functions/textstats.py ``language_id`` — the reference's detector
libraries are external jars), with confidence = best-lexicon hits /
total lexicon hits, the same normalized-certainty shape
LangDetectLanguageIdentifierUpdateProcessor reads from
``DetectedLanguage.getCertainty()``.  Everything is one column
expression pass — no shuffle, no UDF; the update-processor chain at
100 TB is a narrow map over the corpus scan.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lucene_solr_spark.functions.textstats import LANG_LEXICONS, _lexicon_hits

__all__ = ["langid_processor"]


def langid_processor(
    df: DataFrame,
    text_col: str = "text",
    lang_field: str = "lang_detected",
    threshold: float = 0.0,
    fallback: str = "",
    whitelist: set[str] | None = None,
    lcmap: dict[str, str] | None = None,
    map_fields: bool = False,
    existing_lang_col: str | None = None,
    overwrite: bool = True,
) -> DataFrame:
    """Apply the langid UpdateProcessor to every doc.

    Adds ``lang_field`` (the resolved code), ``lang_confidence``, and
    — when ``map_fields`` — ``mapped_field`` = ``<text_col>_<code>``
    (LanguageIdentifierUpdateProcessor.getMappedField).

    Resolution order (resolveLanguage:258-282 + process:117-171):
    detect → certainty < threshold → fallback; whitelist miss →
    fallback; lcmap code rewrite; an existing non-empty value in
    ``existing_lang_col`` wins unless ``overwrite``.
    """
    text = F.col(text_col)
    norm = F.lower(F.trim(text))
    scores = {
        lang: _lexicon_hits(norm, lex)
        for lang, lex in LANG_LEXICONS.items()
    }
    has_cjk = F.length(F.regexp_replace(text, r"[^一-鿿]", "")) > 0

    # argmax as ONE greatest() over (score, -rank, lang) structs — the
    # when-chain fold nests every lexicon regexp inside every later
    # branch and (compounded by the confidence/resolution chain below)
    # blows codegen's 64 KB method limit; see textstats.language_id
    top = F.greatest(
        *[
            F.struct(
                scores[lang].alias("s"),
                F.lit(-i).alias("r"),
                F.lit(lang).alias("lang"),
            )
            for i, lang in enumerate(sorted(LANG_LEXICONS))
        ]
    )
    best_lang = F.when(top["s"] > 0, top["lang"]).otherwise(F.lit("unknown"))
    best_score = top["s"]
    total: Column = F.lit(0)
    for lang in sorted(LANG_LEXICONS):
        total = total + scores[lang]

    detected = F.when(has_cjk, F.lit("zh")).otherwise(best_lang)
    confidence = (
        F.when(has_cjk, F.lit(1.0))
        .when(
            total > 0,
            best_score.cast("double") / total.cast("double"),
        )
        .otherwise(F.lit(0.0))
    )

    resolved = detected
    # threshold: langid.threshold (LangIdParams:30); below -> fallback
    resolved = F.when(
        confidence < F.lit(float(threshold)), F.lit(fallback)
    ).otherwise(resolved)
    # whitelist: langid.whitelist (LangIdParams:32)
    if whitelist is not None:
        resolved = F.when(
            resolved.isin(*sorted(whitelist)), resolved
        ).otherwise(F.lit(fallback))
    # lcmap: langid.lcmap code rewriting (LangIdParams:33)
    for src, dst in sorted((lcmap or {}).items()):
        resolved = F.when(
            resolved == F.lit(src), F.lit(dst)
        ).otherwise(resolved)
    # existing value wins unless overwrite (process:117-133)
    if existing_lang_col is not None and not overwrite:
        existing = F.col(existing_lang_col)
        resolved = F.when(
            existing.isNotNull() & (existing != ""), existing
        ).otherwise(resolved)

    out = df.withColumn(lang_field, resolved).withColumn(
        "lang_confidence", confidence
    )
    if map_fields:
        out = out.withColumn(
            "mapped_field",
            F.concat(F.lit(text_col + "_"), F.col(lang_field)),
        )
    return out
