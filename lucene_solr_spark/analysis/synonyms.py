"""Index-time synonym and shingle token filters, batch-vectorized.

Refs: lucene/analysis/common/src/java/org/apache/lucene/analysis/
synonym/SynonymGraphFilter.java (+ FlattenGraphFilter.java — index-time
graphs are flattened) and analysis/shingle/ShingleFilter.java; rule
syntax per solr SolrSynonymParser.java ("a, b, c" equivalence classes,
"a b => c" explicit mappings).

Both filters operate on the flat (doc_idx, terms, positions) batch
arrays produced by ``analyze_batch_flat`` — no per-token Python in the
match/emit paths (vocabulary-level lookups + vectorized adjacency
masks), matching the invert kernel's data shape.

Position semantics (flattened-graph, what the index stores):

- single-token synonym: emitted at the SAME position as the matched
  token (posIncr 0 side path).
- multi-token LHS match at positions p..p+L-1: RHS token j lands at
  p + min(j, L-1) — parallel path over the same span, extra RHS
  tokens stack on the span's last position (FlattenGraphFilter's
  behavior for longer inserted paths).
- shingles: an n-gram over tokens at consecutive positions is emitted
  at its FIRST token's position (ShingleFilter posIncr semantics).
  The chain runs shingles over the full lowercased stream (no stop
  removal first), the recommended Lucene usage — stopword gaps would
  otherwise need "_" filler tokens.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd

from lucene_solr_spark.analysis.analyzer import analyze_batch_flat
from lucene_solr_spark.analysis.stopwords import ENGLISH_STOP_WORDS
from lucene_solr_spark.analysis.tokenizer import DEFAULT_MAX_TOKEN_LENGTH


@dataclass(frozen=True)
class SynonymMap:
    """Parsed rules.  ``single``: term → extra terms emitted at its
    position (original kept).  ``single_replace``: term → replacement
    terms (original dropped — explicit "a => b" rules).  ``multi``:
    LHS token tuple → (RHS tuple, keep_original)."""

    single: dict[str, tuple[str, ...]] = field(default_factory=dict)
    single_replace: dict[str, tuple[str, ...]] = field(default_factory=dict)
    multi: dict[tuple[str, ...], tuple[tuple[str, ...], bool]] = field(
        default_factory=dict
    )


def parse_synonym_rules(lines: "list[str]") -> SynonymMap:
    """SolrSynonymParser subset: '#' comments, 'a, b, c' equivalence
    (every member expands to the whole class), 'a b => c d' explicit
    (LHS replaced by RHS).  Terms are lowercased; multi-token entries
    are space-separated."""
    single: dict[str, tuple[str, ...]] = {}
    single_replace: dict[str, tuple[str, ...]] = {}
    multi: dict[tuple[str, ...], tuple[tuple[str, ...], bool]] = {}

    def toks(s: str) -> tuple[str, ...]:
        return tuple(s.strip().lower().split())

    for raw in lines:
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        if "=>" in line:
            lhs_s, rhs_s = line.split("=>", 1)
            rhs: tuple[str, ...] = ()
            for part in rhs_s.split(","):
                rhs = rhs + toks(part) if rhs else toks(part)
            for part in lhs_s.split(","):
                lhs = toks(part)
                if not lhs or not rhs:
                    continue
                if len(lhs) == 1:
                    prev = single_replace.get(lhs[0], ())
                    single_replace[lhs[0]] = prev + tuple(
                        t for t in rhs if t not in prev
                    )
                else:
                    multi[lhs] = (rhs, False)
        else:
            members = [toks(p) for p in line.split(",") if toks(p)]
            for m in members:
                others = tuple(
                    t
                    for mm in members
                    if mm != m
                    for t in mm
                )
                if len(m) == 1:
                    prev = single.get(m[0], ())
                    single[m[0]] = prev + tuple(
                        t for t in others if t not in prev
                    )
                else:
                    multi[m] = (others, True)
    return SynonymMap(single, single_replace, multi)


def apply_synonyms_flat(
    doc_idx: np.ndarray,
    terms: np.ndarray,
    pos: np.ndarray,
    smap: SynonymMap,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Apply the synonym map over flat token arrays; output re-sorted by
    (doc, position).  Single-token rules run at vocabulary level
    (factorize once, match unique terms); multi-token LHS matching is a
    vectorized adjacency mask over the flat stream."""
    if terms.size == 0:
        return doc_idx, terms, pos
    add_d: list[np.ndarray] = []
    add_t: list[np.ndarray] = []
    add_p: list[np.ndarray] = []
    drop = np.zeros(terms.size, dtype=bool)
    if smap.single or smap.single_replace:
        codes, vocab = pd.factorize(pd.Series(terms, dtype=object), sort=False)
        vocab_arr = np.asarray(vocab, dtype=object)
        for rules, replaces in ((smap.single, False), (smap.single_replace, True)):
            for vi, term in enumerate(vocab_arr):
                extra = rules.get(term)
                if not extra:
                    continue
                hit = codes == vi
                if replaces:
                    drop |= hit
                for syn in extra:
                    add_d.append(doc_idx[hit])
                    add_t.append(np.full(int(hit.sum()), syn, dtype=object))
                    add_p.append(pos[hit])
    for lhs, (rhs, keep_orig) in smap.multi.items():
        L = len(lhs)
        # adjacency: token i starts a match iff terms[i..i+L-1] == lhs,
        # same doc, consecutive positions (pre-stop stream ⇒ no gaps)
        m = terms[: terms.size - L + 1] == lhs[0]
        for j in range(1, L):
            m &= (
                (terms[j : terms.size - L + 1 + j] == lhs[j])
                & (doc_idx[j : terms.size - L + 1 + j] == doc_idx[: terms.size - L + 1])
                & (pos[j : terms.size - L + 1 + j] == pos[: terms.size - L + 1] + j)
            )
        starts = np.nonzero(m)[0]
        if starts.size == 0:
            continue
        if not keep_orig:
            for j in range(L):
                drop[starts + j] = True
        for j, syn in enumerate(rhs):
            off = min(j, L - 1)
            add_d.append(doc_idx[starts])
            add_t.append(np.full(starts.size, syn, dtype=object))
            add_p.append(pos[starts] + off)
    keep = ~drop
    out_d = [doc_idx[keep]] + add_d
    out_t = [terms[keep]] + add_t
    out_p = [pos[keep]] + add_p
    d = np.concatenate(out_d)
    t = np.concatenate(out_t)
    p = np.concatenate(out_p)
    order = np.lexsort((p, d))
    return d[order], t[order], p[order]


def synonym_analyze_batch_flat(
    content: pd.Series,
    smap: SynonymMap,
    stopwords: frozenset[str] = ENGLISH_STOP_WORDS,
    max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Chain: StandardTokenizer → lowercase → SynonymFilter → StopFilter
    (position gaps preserved) — the standard Solr index-time placement
    (synonyms before stop so class members survive stop removal)."""
    doc_idx, terms, pos = analyze_batch_flat(
        content, frozenset(), max_token_length
    )
    doc_idx, terms, pos = apply_synonyms_flat(doc_idx, terms, pos, smap)
    if terms.size == 0:
        return doc_idx, terms, pos
    keep = ~pd.Series(terms, dtype=object).isin(list(stopwords)).to_numpy()
    return doc_idx[keep], terms[keep], pos[keep]


def shingle_analyze_batch_flat(
    content: pd.Series,
    min_shingle: int = 2,
    max_shingle: int = 2,
    output_unigrams: bool = True,
    sep: str = " ",
    max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Chain: StandardTokenizer → lowercase → ShingleFilter.  Shingles
    of n consecutive tokens (same doc, consecutive positions) emitted at
    the first token's position."""
    if min_shingle < 2 or max_shingle < min_shingle:
        raise ValueError("need 2 <= min_shingle <= max_shingle")
    doc_idx, terms, pos = analyze_batch_flat(
        content, frozenset(), max_token_length
    )
    if terms.size == 0:
        return doc_idx, terms, pos
    outs_d = [doc_idx] if output_unigrams else []
    outs_t = [terms] if output_unigrams else []
    outs_p = [pos] if output_unigrams else []
    s = pd.Series(terms, dtype=object)
    for n in range(min_shingle, max_shingle + 1):
        if terms.size < n:
            break
        head = slice(0, terms.size - n + 1)
        ok = np.ones(terms.size - n + 1, dtype=bool)
        joined = s.iloc[head].reset_index(drop=True)
        for j in range(1, n):
            tail = slice(j, terms.size - n + 1 + j)
            ok &= (doc_idx[tail] == doc_idx[head]) & (pos[tail] == pos[head] + j)
            joined = joined.str.cat(
                s.iloc[tail].reset_index(drop=True), sep=sep
            )
        outs_d.append(doc_idx[head][ok])
        outs_t.append(joined.to_numpy(dtype=object)[ok])
        outs_p.append(pos[head][ok])
    d = np.concatenate(outs_d)
    t = np.concatenate(outs_t)
    p = np.concatenate(outs_p)
    order = np.lexsort((p, d))
    return d[order], t[order], p[order]
