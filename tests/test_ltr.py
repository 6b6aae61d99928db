"""LTR models vs pure-Python references (solr/contrib/ltr:
LinearModel.java:112-117, MultipleAdditiveTreesModel.java:241-262,
FieldLengthFeature.java:72-99, norm/*.java)."""

import pytest

from lucene_solr_spark.queries.ltr import (
    LinearModel,
    TreeNode,
    TreesModel,
    field_length_feature,
    ltr_rescore,
    minmax_norm,
    standard_norm,
)

from pyspark.sql import functions as F


MAIN = [(1, 5.0), (2, 4.0), (3, 3.0), (4, 2.0), (5, 1.0)]
FEATS = [(1, 10, 0), (2, 40, 2), (3, 25, 1), (5, 80, 3)]  # doc 4 missing


def _frames(spark):
    main = spark.createDataFrame(MAIN, ["doc_id", "score"])
    feats = spark.createDataFrame(FEATS, ["doc_id", "length", "tf_window"])
    return main, feats


def _ref_feats():
    f = {d: (ln, tf) for d, ln, tf in FEATS}
    return {d: (s, *f.get(d, (0, 0))) for d, s in MAIN}


def test_linear_model_dot_product(spark):
    main, feats = _frames(spark)
    model = LinearModel(
        (("original_score", 1.0), ("length", 0.1), ("tf_window", 2.0))
    )
    got = {
        r["doc_id"]: r["ltr_score"]
        for r in ltr_rescore(
            main, feats, model, ["length", "tf_window"], 50, 10
        ).collect()
    }
    for d, (s, ln, tf) in _ref_feats().items():
        want = round(1.0 * s + 0.1 * ln + 2.0 * tf, 4)
        assert got[d] == pytest.approx(want), d


def test_trees_model_traversal_and_missing_feature(spark):
    main, feats = _frames(spark)
    tree = TreeNode(
        feature="tf_window", threshold=1.0,
        left=TreeNode(value=0.25),
        right=TreeNode(
            feature="length", threshold=50.0,
            left=TreeNode(value=0.5), right=TreeNode(value=1.0),
        ),
    )
    ghost = TreeNode(feature="nope", threshold=0.0,
                     left=TreeNode(value=9.0), right=TreeNode(value=9.0))
    model = TreesModel(((2.0, tree), (1.0, ghost)))
    got = {
        r["doc_id"]: r["ltr_score"]
        for r in ltr_rescore(
            main, feats, model, ["length", "tf_window"], 50, 10
        ).collect()
    }

    def ref_tree(ln, tf):
        if tf <= 1.0:
            return 0.25
        return 0.5 if ln <= 50.0 else 1.0

    for d, (_, ln, tf) in _ref_feats().items():
        # ghost tree's feature is absent from the vector -> scores 0
        assert got[d] == pytest.approx(round(2.0 * ref_tree(ln, tf), 4)), d


def test_rescore_window_and_k(spark):
    main, feats = _frames(spark)
    model = LinearModel((("original_score", -1.0),))
    out = ltr_rescore(main, feats, model, [], rerank_docs=3, k=2).collect()
    # window = docs 1,2,3 (top main scores); model inverts the order
    assert [r["doc_id"] for r in out] == [3, 2]


def test_normalizers_and_field_length(spark):
    import numpy as np

    from lucene_solr_spark.scoring.bm25 import NORM_TABLE, encode_norm

    df = spark.createDataFrame([(20.0,)], ["v"])
    row = df.select(
        minmax_norm(F.col("v"), 10.0, 30.0).alias("mm"),
        standard_norm(F.col("v"), 25.0, 5.0).alias("st"),
    ).first()
    assert row["mm"] == pytest.approx(0.5)
    assert row["st"] == pytest.approx(-1.0)

    lengths = [1, 7, 33, 255, 4096]
    bts = [int(encode_norm(np.array([n]))[0]) for n in lengths]
    bdf = spark.createDataFrame([(b,) for b in bts], ["norm_byte"])
    got = [
        r["fl"]
        for r in bdf.select(
            field_length_feature(F.col("norm_byte")).alias("fl")
        ).collect()
    ]
    for b, g in zip(bts, got):
        assert g == pytest.approx(float(NORM_TABLE[b]), rel=1e-6)
