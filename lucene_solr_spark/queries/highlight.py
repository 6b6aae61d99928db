"""Passage highlighting — UnifiedHighlighter re-expressed.

Ref design: lucene/highlighter/src/java/org/apache/lucene/search/uhighlight/
UnifiedHighlighter.java (offsets from re-analysis), PassageScorer.java
(passage score = Σ over unique matching terms of idf-weighted tf, with
a position-decay norm favoring early passages), Passage.java, and the
default ``<b>…</b>`` tags of DefaultPassageFormatter.java.

Spark-first shape: highlighting the top-k hits is a per-row batch
kernel over (text) with the query terms bound in the closure — one
Arrow batch per partition of the (tiny) hit set, never the corpus.
Passages are sentence-ish units (``[.?!\\n]`` splits; over-long
sentences are re-chunked to ``window`` tokens so synthetic/unpunctuated
text still yields passages).

Simplifications vs the reference (documented): BreakIterator sentence
segmentation → regex splits; PassageScorer's BM25-per-passage →
idf(term)·(1+ln(1+tf_passage)) with the same 1/(1+ln(1+start/pivot))
early-position decay; no multi-field offsets.
"""

from __future__ import annotations

import math
import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SENT = re.compile(r"[^.?!\n]+")
_TAG_PRE, _TAG_POST = "<b>", "</b>"


def _passages(text: str, window: int) -> list[tuple[int, int]]:
    """Character spans of passage units."""
    out = []
    for m in _SENT.finditer(text):
        seg = m.group()
        toks = seg.split()
        if len(toks) <= window:
            out.append((m.start(), m.end()))
            continue
        # re-chunk long unpunctuated runs into ~window-token passages
        pos = m.start()
        count = 0
        chunk_start = m.start()
        for tm in re.finditer(r"\S+", seg):
            count += 1
            if count == window:
                out.append((chunk_start, m.start() + tm.end()))
                chunk_start = m.start() + tm.end()
                count = 0
        if count:
            out.append((chunk_start, m.end()))
    return out


def highlight_text(
    text: str,
    term_weights: dict[str, float],
    max_passages: int = 2,
    window: int = 12,
    pivot: int = 87,
) -> str:
    """Best passages with matches bolded; '' when nothing matches.

    ``pivot`` is the reference PassageScorer's early-position decay
    constant (PassageScorer.java: norm = 1/(1+ln(1+start/pivot)))."""
    low = text.lower()
    spans = _passages(text, window)
    scored = []
    for start, end in spans:
        tf: dict[str, int] = {}
        marks: list[tuple[int, int]] = []
        for t in term_weights:
            for m in re.finditer(rf"\b{re.escape(t)}\b", low[start:end]):
                tf[t] = tf.get(t, 0) + 1
                marks.append((start + m.start(), start + m.end()))
        if not tf:
            continue
        score = sum(
            term_weights[t] * (1.0 + math.log1p(c)) for t, c in tf.items()
        )
        score *= 1.0 / (1.0 + math.log1p(start / pivot))
        scored.append((score, start, end, sorted(marks)))
    scored.sort(key=lambda s: (-s[0], s[1]))
    picked = sorted(scored[:max_passages], key=lambda s: s[1])
    pieces = []
    for _score, start, end, marks in picked:
        # merge overlapping/adjacent mark intervals (one query term
        # contained in another, e.g. 'can' inside "can't") — without
        # this `cur` can pass the next mark start and the slicing loop
        # emits duplicated/garbled fragments
        merged: list[tuple[int, int]] = []
        for ms, me in marks:
            if merged and ms <= merged[-1][1]:
                merged[-1] = (merged[-1][0], max(merged[-1][1], me))
            else:
                merged.append((ms, me))
        frag = []
        cur = start
        for ms, me in merged:
            frag.append(text[cur:ms])
            frag.append(_TAG_PRE + text[ms:me] + _TAG_POST)
            cur = me
        frag.append(text[cur:end])
        pieces.append("".join(frag).strip())
    return " … ".join(pieces)


def highlight(
    hits: DataFrame,
    corpus: DataFrame,
    term_weights: dict[str, float],
    text_col: str = "text",
    max_passages: int = 2,
) -> DataFrame:
    """Join top-k hits to their stored text and emit highlighted
    passages — (doc_id, score, highlight)."""
    tw = dict(term_weights)

    @F.pandas_udf("string")
    def hl(texts: pd.Series) -> pd.Series:
        return pd.Series(
            [highlight_text(t or "", tw, max_passages) for t in texts],
            index=texts.index,
        )

    joined = hits.join(corpus.select("doc_id", text_col), "doc_id", "left")
    return joined.select(
        "doc_id", "score", hl(F.col(text_col)).alias("highlight")
    )
