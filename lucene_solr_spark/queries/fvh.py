"""FastVectorHighlighter — offset-based fragment highlighting.

Reference (lucene/highlighter/src/java/org/apache/lucene/search/
vectorhighlight/):
- FieldTermStack.java:98-119 — per-occurrence TermInfo with char
  offsets and the IDF weight ``(float)(log(maxDoc/(df+1)) + 1.0)``;
- BaseFragListBuilder.java:48-97 (SimpleFragListBuilder) — the
  fragment sweep: each fragment anchors on the first un-consumed
  match, absorbs every later match whose end fits inside ``spanStart +
  fragCharSize``, then re-centers: ``newMargin = max(0, (fragCharSize
  − matchLen)/2)``, ``spanStart = max(prevEnd, firstStart −
  newMargin)``, ``spanEnd = spanStart + max(matchLen, fragCharSize)``,
  and the next fragment may not start before ``spanEnd``;
- WeightedFieldFragList.java:44-77 — fragment score: each DISTINCT
  term's first occurrence contributes ``weight · boost``; ``norm =
  length · (1/(float)sqrt(length))`` over the total match count;
  totalBoost = Σ subBoost·norm (all float32);
  SimpleFieldFragList.java:41-52 — score = Σ boosts (match count for
  boost-1 terms);
- ScoreOrderFragmentsBuilder — fragments ranked (totalBoost DESC,
  startOffset ASC);
- SimpleBoundaryScanner.java:40-70 — snap fragment edges to the
  nearest boundary char within maxScan=20 (start scans backward and
  accepts offset 0; end scans forward, keeping the original on miss);
- BaseFragmentsBuilder.java:171-205 — splice ``<b>…</b>`` around each
  match offset of the boundary-adjusted source window.

Scope note: term queries only (each occurrence is a one-term
WeightedPhraseInfo with boost 1) — multi-term FieldPhraseList phrase
merging is the UnifiedHighlighter gate's territory.

Spark-first shape: candidates come from the inverted index (sargable
term pushdown); the per-doc sweep is one Arrow-batched kernel over
(text, matches) — doc-sized state, executor-side, no collect.
"""

from __future__ import annotations

import math
import re

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BOUNDARY_CHARS = {".", ",", "!", "?", " ", "\t", "\n"}
MAX_SCAN = 20
MARGIN = 6

_TOKEN = re.compile(r"\S+")


def _find_start(text: str, start: int) -> int:
    """SimpleBoundaryScanner.findStartOffset (:40-56)."""
    if start > len(text) or start < 1:
        return start
    offset, count = start, MAX_SCAN
    while offset > 0 and count > 0:
        if text[offset - 1] in BOUNDARY_CHARS:
            return offset
        offset -= 1
        count -= 1
    return 0 if offset == 0 else start


def _find_end(text: str, start: int) -> int:
    """SimpleBoundaryScanner.findEndOffset (:58-70)."""
    if start > len(text) or start < 0:
        return start
    offset, count = start, MAX_SCAN
    while offset < len(text) and count > 0:
        if text[offset] in BOUNDARY_CHARS:
            return offset
        offset += 1
        count -= 1
    return start


def _fragments_for_doc(
    text: str,
    matches: list[tuple[int, int, str]],
    weights: dict[str, float],
    frag_char_size: int,
    max_num_fragments: int,
    weighted: bool,
    pre_tag: str,
    post_tag: str,
) -> list[tuple[float, int, str]]:
    """(score, startOffset, fragment) list, ranked — the FragList sweep
    + WeightedFieldFragList scoring + makeFragment splice."""
    frags = []  # (score, spanStart, spanEnd, wpil)
    i, n = 0, len(matches)
    start_offset = 0
    while i < n:
        s0, e0, _t0 = matches[i]
        if s0 < start_offset:
            i += 1
            continue
        wpil = [matches[i]]
        i += 1
        span_start = max(s0 - MARGIN, start_offset)
        span_end = max(e0, span_start + frag_char_size)
        cur_end = e0
        while i < n and matches[i][1] <= span_end:
            cur_end = matches[i][1]
            wpil.append(matches[i])
            i += 1
        match_len = cur_end - s0
        new_margin = max(0, (frag_char_size - match_len) // 2)
        span_start = max(s0 - new_margin, start_offset)
        span_end = span_start + max(match_len, frag_char_size)
        start_offset = span_end

        if weighted:
            seen: set[str] = set()
            subs = []
            length = 0
            for _s, _e, t in wpil:
                b = np.float32(0.0)
                if t not in seen:
                    seen.add(t)
                    b = np.float32(weights[t]) * np.float32(1.0)
                length += 1
                subs.append(b)
            inv = np.float32(1.0) / np.float32(math.sqrt(length))
            norm = np.float32(np.float32(length) * inv)
            total = np.float32(0.0)
            for b in subs:
                total = np.float32(total + np.float32(b * norm))
            score = float(total)
        else:
            score = float(len(wpil))
        frags.append((score, span_start, span_end, wpil))

    frags.sort(key=lambda f: (-f[0], f[1]))
    out = []
    for score, s, e, wpil in frags[:max_num_fragments]:
        eo = len(text) if len(text) < e else _find_end(text, e)
        mso = _find_start(text, s)
        src = text[mso:eo]
        buf, idx = [], 0
        for ms, me, _t in wpil:
            buf.append(src[idx:ms - mso])
            buf.append(pre_tag)
            buf.append(src[ms - mso:me - mso])
            buf.append(post_tag)
            idx = me - mso
        buf.append(src[idx:])
        out.append((score, s, "".join(buf)))
    return out


def fvh_highlight(
    searcher,
    docs: DataFrame,
    terms: list[str],
    frag_char_size: int = 100,
    max_num_fragments: int = 2,
    weighted: bool = True,
    pre_tag: str = "<b>",
    post_tag: str = "</b>",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """DataFrame(doc_id, rank, score float, fragment string) over docs
    matching ≥1 term (candidates from the index, text joined on)."""
    tset = [t.lower() for t in terms]
    stats = searcher.term_statistics(tset)
    max_doc = searcher.tables.stats.doc_count
    weights = {
        t: float(np.float32(math.log(max_doc / (stats[t][0] + 1)) + 1.0))
        for t in tset
    }
    cand = searcher._postings_for_terms(
        [t for t in tset if stats[t][0] > 0]
    ).select("doc_id").distinct()
    src = cand.join(
        docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("_t")),
        "doc_id",
    )
    tlookup = set(tset)

    def kernel(batches):
        for pdf in batches:
            rows = []
            for did, text in zip(pdf["doc_id"], pdf["_t"]):
                matches = [
                    (m.start(), m.end(), m.group(0).lower())
                    for m in _TOKEN.finditer(text)
                    if m.group(0).lower() in tlookup
                ]
                if not matches:
                    continue
                for rank, (score, _s, frag) in enumerate(
                    _fragments_for_doc(
                        text, matches, weights, frag_char_size,
                        max_num_fragments, weighted, pre_tag, post_tag,
                    ),
                    start=1,
                ):
                    rows.append((did, rank, score, frag))
            yield pd.DataFrame(
                rows, columns=["doc_id", "rank", "score", "fragment"]
            ) if rows else pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype="int64"),
                    "rank": pd.Series([], dtype="int32"),
                    "score": pd.Series([], dtype="float64"),
                    "fragment": pd.Series([], dtype="object"),
                }
            )

    return src.mapInPandas(
        kernel, "doc_id long, rank int, score double, fragment string"
    )
