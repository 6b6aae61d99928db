"""StandardAnalyzer-equivalent chain: tokenize → lowercase → stop.

Ref: lucene/analysis/standard/StandardAnalyzer.java:102-108 — the chain is
StandardTokenizer → StandardFilter (no-op in 7.0) → LowerCaseFilter →
StopFilter(33 English stopwords).

Position semantics: StopFilter *increments the position gap* across
dropped tokens (analysis/FilteringTokenFilter.java:46-60), so surviving
tokens keep their original position numbers — phrase queries must see the
gaps.  Field length for norms counts only the tokens the final stream
emits (FieldInvertState.length, index/DefaultIndexingChain.java:759-771),
i.e. kept tokens after stop removal.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd

from lucene_solr_spark.analysis.stopwords import ENGLISH_STOP_WORDS
from lucene_solr_spark.analysis.tokenizer import DEFAULT_MAX_TOKEN_LENGTH, tokenize


def analyze_text(
    text: str,
    stopwords: frozenset[str] = ENGLISH_STOP_WORDS,
    max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH,
) -> tuple[list[str], list[int]]:
    """Analyze one document → (terms, positions) with stop gaps preserved."""
    tokens, positions = tokenize(text, max_token_length)
    terms: list[str] = []
    out_pos: list[int] = []
    for tok, pos in zip(tokens, positions):
        low = tok.lower()
        if low in stopwords:
            continue
        terms.append(low)
        out_pos.append(pos)
    return terms, out_pos


def analyze_batch(
    content: pd.Series,
    stopwords: frozenset[str] = ENGLISH_STOP_WORDS,
    max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH,
) -> pd.DataFrame:
    """Vectorized batch analysis: Series[str] → DataFrame(terms, positions, length).

    This is the kernel behind every Arrow/pandas UDF boundary — one Python
    call per Arrow batch, C regex per row, no per-token Python loops in
    the aggregation (pandas/numpy handle grouping).
    """
    terms_col: list[list[str]] = []
    pos_col: list[list[int]] = []
    for text in content.astype(str).tolist():
        terms, pos = analyze_text(text, stopwords, max_token_length)
        terms_col.append(terms)
        pos_col.append(pos)
    return pd.DataFrame(
        {
            "terms": terms_col,
            "positions": pos_col,
            "length": np.fromiter((len(t) for t in terms_col), dtype=np.int64),
        },
        index=content.index,
    )


@dataclass(frozen=True)
class StandardAnalyzer:
    """Config object mirroring StandardAnalyzer's two knobs."""

    stopwords: frozenset[str] = field(default=ENGLISH_STOP_WORDS)
    max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH

    def analyze(self, text: str) -> tuple[list[str], list[int]]:
        return analyze_text(text, self.stopwords, self.max_token_length)

    def analyze_series(self, content: pd.Series) -> pd.DataFrame:
        return analyze_batch(content, self.stopwords, self.max_token_length)
