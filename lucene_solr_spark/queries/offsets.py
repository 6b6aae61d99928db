"""Offsets-enabled postings + offset-based highlighting.

Refs: IndexOptions.DOCS_AND_FREQS_AND_POSITIONS_AND_OFFSETS
(lucene/index/IndexOptions.java), Lucene50PostingsFormat's .pos/.pay
offset storage (codecs/lucene50/Lucene50PostingsFormat.java:60-90), and
the offsets-consuming UnifiedHighlighter strategy
(lucene/highlighter/.../uhighlight/FieldOffsetStrategy.java) — with
stored offsets a highlighter slices the stored text directly instead of
re-tokenizing every hit document at query time (the re-analysis cost is
what makes postings-offsets worth their disk at scale).

Postings schema gains two parallel arrays: ``starts``/``ends`` char
offsets per kept position.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lucene_solr_spark.analysis.stopwords import ENGLISH_STOP_WORDS
from lucene_solr_spark.analysis.tokenizer import (
    DEFAULT_MAX_TOKEN_LENGTH,
    _TOKEN_RE,
)

OFFSET_POSTINGS_SCHEMA = (
    "doc_id long, term string, tf int, positions array<int>, "
    "starts array<int>, ends array<int>"
)


def tokenize_with_offsets(
    text: str, max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH
) -> tuple[list[str], list[int], list[int], list[int]]:
    """One document → (tokens, positions, start_offsets, end_offsets).

    Same contract as ``tokenize`` (skip-but-count for >255-char tokens)
    plus the match spans — OffsetAttribute semantics
    (analysis/tokenattributes/OffsetAttribute.java)."""
    tokens: list[str] = []
    positions: list[int] = []
    starts: list[int] = []
    ends: list[int] = []
    pos = -1
    for m in _TOKEN_RE.finditer(text):
        pos += 1
        tok = m.group(0)
        if len(tok) > max_token_length:
            continue
        tokens.append(tok)
        positions.append(pos)
        starts.append(m.start())
        ends.append(m.end())
    return tokens, positions, starts, ends


def offsets_postings(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    stopwords: frozenset[str] = ENGLISH_STOP_WORDS,
) -> DataFrame:
    """Postings with per-position char offsets (lowercase + stop chain,
    position gaps preserved)."""

    def kernel(batches):
        for pdf in batches:
            rows_doc: list[int] = []
            rows_term: list[str] = []
            rows_pos: list[list[int]] = []
            rows_start: list[list[int]] = []
            rows_end: list[list[int]] = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                toks, poss, sts, ens = tokenize_with_offsets(text or "")
                per_term: dict[str, list[int]] = {}
                for i, t in enumerate(toks):
                    low = t.lower()
                    if low in stopwords:
                        continue
                    per_term.setdefault(low, []).append(i)
                for term, idxs in sorted(per_term.items()):
                    rows_doc.append(doc_id)
                    rows_term.append(term)
                    rows_pos.append([poss[i] for i in idxs])
                    rows_start.append([sts[i] for i in idxs])
                    rows_end.append([ens[i] for i in idxs])
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(rows_doc, dtype="int64"),
                    "term": pd.Series(rows_term, dtype="object"),
                    "tf": pd.Series(
                        [len(p) for p in rows_pos], dtype="int32"
                    ),
                    "positions": pd.Series(rows_pos, dtype="object"),
                    "starts": pd.Series(rows_start, dtype="object"),
                    "ends": pd.Series(rows_end, dtype="object"),
                }
            )

    src = df.select(id_col, text_col)
    return src.mapInPandas(kernel, schema=OFFSET_POSTINGS_SCHEMA)


def highlight_from_offsets(
    postings: DataFrame,
    corpus: DataFrame,
    term: str,
    window: int = 30,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Slice a snippet around each matching doc's FIRST occurrence using
    stored offsets — no query-time re-tokenization (the entire point of
    paying for offsets in the postings).  Pure column expressions."""
    hit = postings.filter(F.col("term") == term).select(
        "doc_id",
        F.element_at("starts", 1).alias("first_start"),
        F.element_at("ends", 1).alias("first_end"),
        F.col("tf").alias("n_matches"),
    )
    return hit.join(
        corpus.select(F.col(id_col).alias("doc_id"), text_col), "doc_id"
    ).select(
        "doc_id",
        "n_matches",
        "first_start",
        F.substring(
            F.col(text_col), F.col("first_start") + 1, window
        ).alias("snippet"),
    )
