"""Unified-highlighter passage selection and formatting."""

from __future__ import annotations

from lucene_solr_spark.queries.highlight import highlight_text


def test_bolds_all_matches_in_best_passage():
    out = highlight_text(
        "The spark engine runs. Nothing here. spark and spark again.",
        {"spark": 1.0},
        max_passages=2,
    )
    assert out.count("<b>spark</b>") == 3
    assert " … " in out  # two passages joined


def test_higher_weight_term_wins_passage_choice():
    text = "alpha common words here. beta rare word there."
    out = highlight_text(text, {"alpha": 0.1, "beta": 5.0}, max_passages=1)
    assert "<b>beta</b>" in out and "alpha" not in out


def test_early_position_decay_breaks_ties():
    text = "match early stuff. filler filler filler. match late stuff."
    out = highlight_text(text, {"match": 1.0}, max_passages=1)
    assert out.startswith("<b>match</b> early")


def test_unpunctuated_text_is_chunked():
    text = " ".join(["w"] * 40 + ["spark"] + ["w"] * 40)
    out = highlight_text(text, {"spark": 1.0}, max_passages=1, window=10)
    assert "<b>spark</b>" in out
    assert len(out.split()) <= 12  # one ~window-token passage


def test_no_match_returns_empty():
    assert highlight_text("nothing relevant", {"spark": 1.0}) == ""


def test_word_boundary_matching():
    out = highlight_text("sparkle is not spark", {"spark": 1.0}, max_passages=1)
    assert out.count("<b>spark</b>") == 1
    assert "<b>spark</b>le" not in out


def test_spark_side(spark):
    from lucene_solr_spark.queries.highlight import highlight

    hits = spark.createDataFrame([(0, 1.5), (1, 0.5)], "doc_id long, score double")
    corpus = spark.createDataFrame(
        [(0, "the spark engine"), (1, "no match here"), (2, "unused")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r["highlight"] for r in highlight(hits, corpus, {"spark": 1.0}).collect()}
    assert "<b>spark</b>" in rows[0]
    assert rows[1] == ""
