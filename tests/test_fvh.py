"""FastVectorHighlighter (vectorhighlight/BaseFragListBuilder.java,
WeightedFieldFragList.java, SimpleBoundaryScanner.java)."""

import math

import numpy as np
import pytest

from lucene_solr_spark.queries.fvh import (
    _find_end,
    _find_start,
    _fragments_for_doc,
    fvh_highlight,
)


W = {"foo": 2.0, "bar": 3.0}


def frags(text, terms, size, n=10, weighted=False):
    import re

    matches = [
        (m.start(), m.end(), m.group(0))
        for m in re.finditer(r"\S+", text)
        if m.group(0) in terms
    ]
    return _fragments_for_doc(
        text, matches, W, size, n, weighted, "<b>", "</b>"
    )


def test_single_fragment_centers_and_wraps():
    text = "aa bb cc foo dd ee ff"
    out = frags(text, {"foo"}, 18)
    assert len(out) == 1
    score, start, frag = out[0]
    assert "<b>foo</b>" in frag
    assert score == 1.0  # simple scorer = match count


def test_two_fragments_and_ordering():
    # two far-apart clusters; second has 2 matches → ranks first
    text = "foo " + "x " * 30 + "foo bar " + "y " * 10
    out = frags(text, {"foo", "bar"}, 20)
    assert len(out) == 2
    assert out[0][0] == 2.0 and out[1][0] == 1.0
    assert out[0][1] > out[1][1]  # higher-scored fragment starts later
    assert "<b>foo</b> <b>bar</b>" in out[0][2]


def test_fragment_never_reenters_previous_span():
    """A match inside the previous fragment's span is discarded
    (BaseFragListBuilder:58-61)."""
    text = "foo foo " + "z " * 40 + "foo w"
    out = frags(text, {"foo"}, 16)
    starts = [s for _, s, _ in out]
    assert len(out) == 2  # first two foos share a fragment
    assert out[0][0] == 2.0
    assert starts[0] != starts[1]


def test_boundary_scanner():
    text = "abcdef ghij.klmno"
    # start snaps back to just after the space within maxScan
    assert _find_start(text, 9) == 7
    # scanning hits the text start → 0 is a boundary
    assert _find_start(text, 4) == 0
    # end snaps forward to the '.'
    assert _find_end(text, 9) == 11
    # no boundary within maxScan → keep original
    assert _find_end("q" * 50, 10) == 10


def test_weighted_score_float32_chain():
    text = "foo bar foo"
    out = frags(text, {"foo", "bar"}, 64, weighted=True)
    assert len(out) == 1
    length = 3
    inv = np.float32(1.0) / np.float32(math.sqrt(length))
    norm = np.float32(np.float32(length) * inv)
    want = np.float32(
        np.float32(np.float32(2.0) * norm) + np.float32(np.float32(3.0) * norm)
    )
    assert out[0][0] == pytest.approx(float(want), abs=0)


def test_fvh_on_corpus(searcher, docs_df):
    out = fvh_highlight(
        searcher, docs_df, ["spark"], frag_char_size=60, max_num_fragments=2
    )
    rows = out.collect()
    assert rows
    for r in rows:
        assert "<b>spark</b>" in r["fragment"]
        assert 1 <= r["rank"] <= 2
    # candidate set == docs containing the term
    want = searcher.docs("spark").select("doc_id").distinct().count()
    assert len({r["doc_id"] for r in rows}) == want
