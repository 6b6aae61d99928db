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
from lucene_solr_spark.analysis.tokenizer import (
    DEFAULT_MAX_TOKEN_LENGTH,
    raw_tokens,
    tokenize,
)


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


# Batch translate table for the whole-batch ASCII tokenize path: every
# ASCII char that can neither appear inside a token ([A-Za-z0-9_]) nor
# join token segments (. ' , ;) becomes a space; \x1f survives as the
# document separator (it is mapped to itself and never occurs in ASCII
# corpus text routed here only after an isascii() check... it IS ascii —
# guarded by an explicit containment check below).
# '|' is not a token/joiner char, so every natural occurrence is
# translated to a space BEFORE the join — surviving '|' blobs are
# exactly the document separators (and '|' is not str.split whitespace,
# unlike \x1c–\x1f).
_SEP = "|"
_BLOB_KEEP = set(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789_.',;"
)
_BLOB_TABLE = str.maketrans(
    {i: " " for i in range(128) if chr(i) not in _BLOB_KEEP}
)
_PUNCT = set(".',;")


def _batch_blob_split(texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc translate + ONE split over the joined batch → (blob array,
    per-blob doc index).  Blobs are maximal runs of token/joiner chars;
    the UAX#29 work then runs once per UNIQUE blob, not once per doc."""
    big = (" " + _SEP + " ").join(t.translate(_BLOB_TABLE) for t in texts)
    blobs = np.array(big.split(), dtype=object)
    is_sep = blobs == _SEP
    doc_of_blob = np.cumsum(is_sep, dtype=np.int64)
    return blobs[~is_sep], doc_of_blob[~is_sep]


def _tokens_from_blobs(
    blobs: np.ndarray, doc_of_blob: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Expand blobs → per-token (term code, doc index) + the term
    vocabulary, running the ASCII UAX#29 pattern over the unique blobs
    only.  Returning CODES (not strings) lets the caller skip a second
    token-level factorize — the only per-token ops are int gathers."""
    from lucene_solr_spark.analysis.tokenizer import _ASCII_FULL

    codes, ublobs = pd.factorize(pd.Series(blobs, dtype=object), sort=False)
    utoks: list[list[str]] = [
        [b] if _PUNCT.isdisjoint(b) else _ASCII_FULL.findall(b)
        for b in np.asarray(ublobs, dtype=object)
    ]
    ulens = np.fromiter((len(t) for t in utoks), dtype=np.int64, count=len(utoks))
    uflat = np.empty(int(ulens.sum()), dtype=object)
    uoff = np.zeros(ulens.size + 1, dtype=np.int64)
    np.cumsum(ulens, out=uoff[1:])
    for t, o in zip(utoks, uoff[:-1].tolist()):
        uflat[o : o + len(t)] = t
    # term vocabulary over the (small) per-unique-blob token table
    tcodes_u, tvocab = pd.factorize(pd.Series(uflat, dtype=object), sort=False)
    lens = ulens[codes]
    total = int(lens.sum())
    # ragged gather: token i of blob j reads slot uoff[codes[j]] + i
    starts = np.zeros(lens.size + 1, dtype=np.int64)
    np.cumsum(lens, out=starts[1:])
    blob_of_tok = np.zeros(total, dtype=np.int64)
    nz = starts[1:-1][starts[1:-1] < total]
    np.add.at(blob_of_tok, nz, 1)
    np.cumsum(blob_of_tok, out=blob_of_tok)
    within = np.arange(total, dtype=np.int64) - starts[blob_of_tok]
    term_codes = tcodes_u[uoff[codes[blob_of_tok]] + within]
    return term_codes, np.asarray(tvocab, dtype=object), doc_of_blob[blob_of_tok]


def analyze_batch_flat(
    content: pd.Series,
    stopwords: frozenset[str] = ENGLISH_STOP_WORDS,
    max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH,
    codes_out: bool = False,
) -> tuple[np.ndarray, ...]:
    """Fully vectorized batch analysis → flat arrays
    ``(doc_index, terms, positions)``.

    All-ASCII batches (the overwhelmingly common case for source code)
    take the whole-batch path: one C-level translate + split over the
    concatenated batch, then the UAX#29 pattern once per UNIQUE blob —
    per-token and per-doc Python disappears entirely.  Mixed batches
    fall back to one ``findall`` per document.  Lowercase, the 255-char
    skip rule (dropped tokens still consume their position), and the
    stopword mask (position gaps preserved) all run as batch
    pandas/numpy ops.  This is the shape the invert kernels consume
    directly (they re-flatten anyway).
    """
    texts = content.astype(str).tolist()
    batch_ok = all(t.isascii() for t in texts)
    if texts and batch_ok:
        blobs, doc_of_blob = _batch_blob_split(texts)
        codes, vocab_arr, doc_idx_raw = _tokens_from_blobs(blobs, doc_of_blob)
        total = codes.size
        # per-doc token offsets from the per-token doc index
        counts = np.bincount(doc_idx_raw, minlength=len(texts)).astype(np.int64)
    else:
        tok_lists = [raw_tokens(t) for t in texts]
        counts = np.fromiter(
            (len(l) for l in tok_lists), dtype=np.int64, count=len(tok_lists)
        )
        total = int(counts.sum())
        flat = np.empty(total, dtype=object)
        i = 0
        for l in tok_lists:
            flat[i : i + len(l)] = l
            i += len(l)
        # Factorize FIRST, then lowercase / length-skip / stop-mask on
        # the UNIQUE vocabulary only — per-token string work collapses
        # to per-unique-term work (measured 6× on the benchmark corpus:
        # the per-token str.len + isin mask was 65% of the whole
        # kernel).  The ASCII batch path above gets its codes straight
        # from the blob expansion, skipping this factorize entirely.
        codes, vocab = pd.factorize(pd.Series(flat, dtype=object), sort=False)
        vocab_arr = np.asarray(vocab, dtype=object)
    offsets = np.zeros(counts.size + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    # doc index per token WITHOUT np.repeat (pathologically slow on
    # this host — measured 130ms/1M elements): mark doc boundaries,
    # cumsum, then gather each token's doc start for the position.
    doc_idx = np.zeros(total, dtype=np.int64)
    starts_nonempty = offsets[1:-1][offsets[1:-1] < total]
    np.add.at(doc_idx, starts_nonempty, 1)
    np.cumsum(doc_idx, out=doc_idx)
    pos = np.arange(total, dtype=np.int64) - offsets[doc_idx]
    low_vocab = np.array([v.lower() for v in vocab_arr], dtype=object)
    vlen = np.fromiter(
        (len(v) for v in vocab_arr), dtype=np.int64, count=vocab_arr.size
    )
    vkeep = (vlen <= max_token_length) & np.array(
        [v not in stopwords for v in low_vocab], dtype=bool
    )
    keep = vkeep[codes]
    if codes_out:
        # merge case variants at vocab level, hand back per-token CODES —
        # the invert kernel sorts int codes and never touches per-token
        # strings (its own terms factorize becomes unnecessary)
        lc_codes_u, lc_vocab = pd.factorize(
            pd.Series(low_vocab, dtype=object), sort=False
        )
        return (
            doc_idx[keep],
            lc_codes_u[codes[keep]],
            np.asarray(lc_vocab, dtype=object),
            pos[keep],
        )
    return doc_idx[keep], low_vocab[codes[keep]], pos[keep]


def analyze_batch_codes(
    content: pd.Series,
    stopwords: frozenset[str] = ENGLISH_STOP_WORDS,
    max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Like :func:`analyze_batch_flat` but returns
    ``(doc_index, term_codes, vocab, positions)`` — per-token ints plus
    the (lowercased, case-merged) vocabulary, so inverted-index kernels
    can sort/group by code without re-factorizing term strings."""
    return analyze_batch_flat(
        content, stopwords, max_token_length, codes_out=True
    )


def english_analyze_batch_flat(
    content: pd.Series,
    stopwords: frozenset[str] = ENGLISH_STOP_WORDS,
    max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """EnglishAnalyzer chain (analysis/en/EnglishAnalyzer.java:99-108):
    StandardTokenizer → possessive strip → lowercase → stop → Porter
    stem.  Same flat-array batch shape as ``analyze_batch_flat``; the
    stem runs on the factorized VOCABULARY (unique terms), not the
    token stream — per-word Python cost amortized by term repetition.
    """
    from lucene_solr_spark.analysis.porter import porter_stem

    doc_idx, terms, positions = analyze_batch_flat(
        content, frozenset(), max_token_length
    )
    if terms.size == 0:
        return doc_idx, terms, positions
    s = pd.Series(terms, dtype=object)
    # possessive strip (ONE suffix, like EnglishPossessiveFilter)
    # BEFORE the stop filter — chain order matters for "it's" → "it"
    stripped = s.str.replace(r"['’＇]s$", "", regex=True)
    keep = ~stripped.isin(list(stopwords)).to_numpy()
    stripped = stripped[keep]
    codes, vocab = pd.factorize(stripped, sort=False)
    stemmed = np.array([porter_stem(t) for t in vocab], dtype=object)
    return doc_idx[keep], stemmed[codes], positions[keep]


def analyze_batch(
    content: pd.Series,
    stopwords: frozenset[str] = ENGLISH_STOP_WORDS,
    max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH,
) -> pd.DataFrame:
    """Batch analysis: Series[str] → DataFrame(terms, positions, length).

    List-of-lists view over :func:`analyze_batch_flat` for callers that
    want per-document rows.
    """
    doc_idx, terms, pos = analyze_batch_flat(content, stopwords, max_token_length)
    n = len(content)
    kept_counts = np.bincount(doc_idx, minlength=n)
    splits = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(kept_counts, out=splits[1:])
    terms_col = [terms[splits[i] : splits[i + 1]].tolist() for i in range(n)]
    pos_col = [pos[splits[i] : splits[i + 1]].tolist() for i in range(n)]
    return pd.DataFrame(
        {
            "terms": terms_col,
            "positions": pos_col,
            "length": kept_counts.astype(np.int64),
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
