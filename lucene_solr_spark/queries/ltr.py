"""Learning-to-rank rescoring — solr/contrib/ltr re-expressed as
Catalyst column algebra.

Refs:
- solr/contrib/ltr/src/java/org/apache/solr/ltr/LTRRescorer.java
  (rescore the main query's top reRankDocs by the model score, sort
  desc, ties by docid)
- model/LinearModel.java:112-117 (dot product over normalized
  features)
- model/MultipleAdditiveTreesModel.java:241-262 (score = Σ
  tree.weight · traverse(root); node goes left when
  feature <= threshold, missing feature scores 0)
- feature/OriginalScoreFeature.java, FieldLengthFeature.java:72-99
  (decoded byte315 norm → approximated length), ValueFeature.java
- norm/MinMaxNormalizer.java:86, StandardNormalizer.java (configured
  constants, not data statistics — pure per-row transforms)

Feature vectors are COLUMNS of a DataFrame, one per feature; a model
compiles to a single Column expression (nested CASE/WHEN for trees),
so scoring stays inside whole-stage codegen — no UDF, and the same
expression is trivially mirrored in ANSI SQL for the oracle gate.
Everything is evaluated in double; the reference accumulates in
float32, which matters only at exact rank-tie boundaries (documented
deviation, same discipline as the exact-mode BM25 gates).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lucene_solr_spark.scoring.bm25 import NORM_TABLE


# ------------------------------------------------------------ norms
def minmax_norm(col: Column, lo: float, hi: float) -> Column:
    """MinMaxNormalizer.java:86 — (v − min)/(max − min), configured
    constants."""
    return (col - F.lit(float(lo))) / F.lit(float(hi) - float(lo))


def standard_norm(col: Column, avg: float, std: float) -> Column:
    """StandardNormalizer.java — (v − avg)/std, configured constants."""
    return (col - F.lit(float(avg))) / F.lit(float(std))


def field_length_feature(norm_byte: Column) -> Column:
    """FieldLengthFeature.java:72-99 — the byte315-decoded approximate
    field length (NORM_TABLE[b] = 1/byte315ToFloat(b)²), reproducing
    the reference's lossy round trip rather than the exact length."""
    table = F.array(*[F.lit(float(v)) for v in NORM_TABLE.tolist()])
    return F.element_at(table, norm_byte.cast("int") + 1)


# ------------------------------------------------------------ models
@dataclass(frozen=True)
class TreeNode:
    """One node of a MultipleAdditiveTrees tree: a leaf carries
    ``value``; an interior node tests ``feature <= threshold``."""

    value: float | None = None
    feature: str | None = None
    threshold: float | None = None
    left: "TreeNode | None" = None
    right: "TreeNode | None" = None

    def column(self, feats: dict[str, Column]) -> Column:
        if self.value is not None:
            return F.lit(float(self.value))
        if self.feature not in feats:
            # tree references a feature absent from the vector → 0
            # (MultipleAdditiveTreesModel.java:247-249)
            return F.lit(0.0)
        assert self.left is not None and self.right is not None
        return F.when(
            feats[self.feature] <= F.lit(float(self.threshold)),
            self.left.column(feats),
        ).otherwise(self.right.column(feats))


@dataclass(frozen=True)
class LinearModel:
    """LinearModel.java — dot product of feature columns and weights."""

    weights: tuple[tuple[str, float], ...]

    def column(self, feats: dict[str, Column]) -> Column:
        total = F.lit(0.0)
        for name, w in self.weights:
            total = total + F.lit(float(w)) * feats[name]
        return total


@dataclass(frozen=True)
class TreesModel:
    """MultipleAdditiveTreesModel.java — Σ weight·tree(fv)."""

    trees: tuple[tuple[float, TreeNode], ...]

    def column(self, feats: dict[str, Column]) -> Column:
        total = F.lit(0.0)
        for w, root in self.trees:
            total = total + F.lit(float(w)) * root.column(feats)
        return total


def ltr_rescore(
    main: DataFrame,
    features: DataFrame,
    model: LinearModel | TreesModel,
    feature_cols: list[str],
    rerank_docs: int = 200,
    k: int = 10,
) -> DataFrame:
    """LTRRescorer.java: take the main query's top ``rerank_docs`` by
    (score desc, doc_id asc), left-join the feature frame (missing
    features default to 0 like an empty FeatureVector), score with the
    model, return the top ``k`` by model score.

    ``main`` carries (doc_id, score); ``features`` carries doc_id plus
    ``feature_cols``.  The original score is exposed to the model as
    feature 'original_score' (OriginalScoreFeature.java)."""
    window = main.orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    ).limit(rerank_docs)
    joined = window.join(features, "doc_id", "left")
    feats: dict[str, Column] = {
        "original_score": F.col("score").cast("double")
    }
    for c in feature_cols:
        feats[c] = F.coalesce(F.col(c).cast("double"), F.lit(0.0))
    return (
        joined.select(
            "doc_id", model.column(feats).alias("_ltr")
        )
        .orderBy(F.col("_ltr").desc(), F.col("doc_id").asc())
        .limit(k)
        .select("doc_id", F.round("_ltr", 4).alias("ltr_score"))
    )
