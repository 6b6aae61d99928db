"""langid UpdateProcessor (solr/contrib/langid)."""

from __future__ import annotations

import pytest

from lucene_solr_spark.functions.langid import langid_processor


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the cat and the dog of the house", None),       # en, high conf
        (1, "el la de que y los", None),                     # es, high conf
        (2, "xyzzy plugh foobar", None),                     # unknown
        (3, "the el der le mixed salad", None),              # low confidence
        (4, "这是中文文本", None),                            # zh via CJK
        (5, "the quick brown fox", "fr"),                    # existing lang
    ]
    return spark.createDataFrame(rows, "doc_id: bigint, text: string, lang: string")


def _run(docs, **kw):
    return {
        r["doc_id"]: r
        for r in langid_processor(docs, **kw).collect()
    }


def test_detection_and_confidence(docs):
    out = _run(docs)
    assert out[0]["lang_detected"] == "en"
    assert out[0]["lang_confidence"] == 1.0
    assert out[1]["lang_detected"] == "es"
    assert out[2]["lang_detected"] == "unknown"
    assert out[2]["lang_confidence"] == 0.0
    assert out[4]["lang_detected"] == "zh"
    assert out[4]["lang_confidence"] == 1.0


def test_threshold_fallback(docs):
    out = _run(docs, threshold=0.9, fallback="general")
    # doc 3 has mixed lexicon hits -> confidence < 0.9 -> fallback
    assert out[3]["lang_detected"] == "general"
    assert out[0]["lang_detected"] == "en"  # 1.0 passes


def test_whitelist_and_lcmap(docs):
    out = _run(
        docs,
        whitelist={"en", "zh"},
        fallback="other",
        lcmap={"zh": "cjk"},
    )
    assert out[1]["lang_detected"] == "other"  # es not whitelisted
    assert out[4]["lang_detected"] == "cjk"    # lcmap after whitelist


def test_existing_value_wins_without_overwrite(docs):
    out = _run(docs, existing_lang_col="lang", overwrite=False)
    assert out[5]["lang_detected"] == "fr"     # existing kept
    assert out[0]["lang_detected"] == "en"     # null existing -> detected
    out2 = _run(docs, existing_lang_col="lang", overwrite=True)
    assert out2[5]["lang_detected"] == "en"


def test_map_fields(docs):
    out = _run(docs, map_fields=True, lcmap={"zh": "cjk"})
    assert out[0]["mapped_field"] == "text_en"
    assert out[4]["mapped_field"] == "text_cjk"
