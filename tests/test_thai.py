"""ThaiAnalyzer pinned on the reference's TestThaiAnalyzer vectors
(lucene/analysis/common/src/test/.../th/TestThaiAnalyzer.java:44-137)."""

from __future__ import annotations

import pandas as pd

from lucene_solr_spark.analysis.thai import (
    THAI_STOP_WORDS,
    thai_analyze_batch_flat,
    thai_tokenize,
)


def _analyzed(text: str) -> list[str]:
    _, terms, _ = thai_analyze_batch_flat(pd.Series([text]))
    return list(terms)


def test_tokenizer_vector():
    assert thai_tokenize("การที่ได้ต้องแสดงว่างานดี") == [
        "การ", "ที่", "ได้", "ต้อง", "แสดง", "ว่า", "งาน", "ดี",
    ]


def test_analyzer_stop_vector():
    # ThaiAnalyzer with the default th stop set
    assert _analyzed("การที่ได้ต้องแสดงว่างานดี") == ["แสดง", "งาน", "ดี"]


def test_position_gaps_preserved():
    _, terms, pos = thai_analyze_batch_flat(
        pd.Series(["การที่ได้ต้องแสดงว่างานดี"])
    )
    # แสดง is the 5th token (positions 0-3 are stopped)
    assert list(terms) == ["แสดง", "งาน", "ดี"]
    assert list(pos) == [4, 6, 7]


def test_mixed_thai_english():
    # testBuggyTokenType / reorder variants: non-Thai runs take the
    # standard word-boundary tokens, lowercased; 'the' SURVIVES (the
    # reference chain carries only the th stop list)
    assert _analyzed("การที่ได้ต้อง the แสดงว่างานดี") == [
        "the", "แสดง", "งาน", "ดี",
    ]
    assert [
        t for t in thai_tokenize("การที่ได้ต้อง the แสดงว่างานดี")
    ] == ["การ", "ที่", "ได้", "ต้อง", "the", "แสดง", "ว่า", "งาน", "ดี"]
    assert [
        t.lower() for t in thai_tokenize("บริษัทชื่อ XY&Z คุยกับ xyz@demo.com")
    ] == ["บริษัท", "ชื่อ", "xy", "z", "คุย", "กับ", "xyz", "demo.com"]


def test_english_prefix_vector():
    assert [
        t.lower()
        for t in thai_tokenize("This is a test. การที่ได้ต้องแสดงว่างานดี")
    ] == [
        "this", "is", "a", "test",
        "การ", "ที่", "ได้", "ต้อง", "แสดง", "ว่า", "งาน", "ดี",
    ]


def test_unknown_thai_run_is_one_token():
    # a Thai span with no dictionary hit stays one maximal token
    toks = thai_tokenize("ฤๅๅ แสดง")
    assert toks == ["ฤๅๅ", "แสดง"]


def test_stop_set_complete():
    assert len(THAI_STOP_WORDS) == 115
    assert "ไม่" in THAI_STOP_WORDS and "และ" in THAI_STOP_WORDS
