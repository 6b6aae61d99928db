"""Pure-Python exhaustive Lucene-faithful oracle (test-only).

Implements BM25 scoring and boolean/phrase semantics directly over an
analyzed in-memory corpus, mirroring the reference arithmetic
(BM25Similarity.java:71-74,103-111,134-143,213-254; HitQueue.java:76-81
tie-break).  ~200 lines, deliberately independent of the Spark engine:
it shares only the analyzer (the analyzer itself is pinned by golden
token tests in test_analyzer.py).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np

from lucene_solr_spark.analysis import analyze_text
from lucene_solr_spark.scoring.bm25 import NORM_TABLE, encode_norm


@dataclass
class OracleIndex:
    postings: dict[str, dict[int, list[int]]] = field(default_factory=dict)
    norm_byte: dict[int, int] = field(default_factory=dict)
    lengths: dict[int, int] = field(default_factory=dict)
    doc_count: int = 0
    sum_ttf: int = 0

    @classmethod
    def build(cls, docs: dict[int, str]) -> "OracleIndex":
        idx = cls()
        for doc_id, text in docs.items():
            terms, positions = analyze_text(text)
            if not terms:
                continue
            for t, p in zip(terms, positions):
                idx.postings.setdefault(t, {}).setdefault(doc_id, []).append(p)
            idx.lengths[doc_id] = len(terms)
            idx.norm_byte[doc_id] = int(encode_norm(len(terms)))
            idx.sum_ttf += len(terms)
            idx.doc_count += 1
        return idx

    # ----------------------------------------------------------- scoring
    def idf(self, df: int) -> np.float32:
        n = self.doc_count
        return np.float32(math.log(1.0 + (n - df + 0.5) / (df + 0.5)))

    def avgdl(self) -> np.float32:
        return np.float32(self.sum_ttf / float(self.doc_count))

    def cache(self, k1=1.2, b=0.75) -> np.ndarray:
        k1, b = np.float32(k1), np.float32(b)
        return (k1 * ((np.float32(1) - b) + b * NORM_TABLE / self.avgdl())).astype(
            np.float32
        )

    def score_term(self, weight: np.float32, tf: int, doc_id: int, k1=1.2) -> np.float32:
        cache = self.cache(k1=k1)
        w = np.float32(weight) * np.float32(np.float32(k1) + np.float32(1))
        f = np.float32(tf)
        return np.float32(w * f / (f + cache[self.norm_byte[doc_id]]))

    # ----------------------------------------------------------- queries
    def term_docs(self, term: str) -> dict[int, int]:
        return {d: len(p) for d, p in self.postings.get(term, {}).items()}

    def term_scores(self, term: str, boost: float = 1.0) -> dict[int, np.float32]:
        pl = self.postings.get(term, {})
        if not pl:
            return {}
        w = np.float32(np.float32(boost) * self.idf(len(pl)))
        return {d: self.score_term(w, len(p), d) for d, p in pl.items()}

    def phrase_docs(self, terms: list[str], positions: list[int] | None = None) -> dict[int, int]:
        """doc → phraseFreq for an exact positional phrase."""
        if positions is None:
            positions = list(range(len(terms)))
        if any(t not in self.postings for t in terms):
            return {}
        docsets = [set(self.postings[t].keys()) for t in terms]
        cand = set.intersection(*docsets)
        out = {}
        for d in cand:
            aligned = [
                {p - off for p in self.postings[t][d]}
                for t, off in zip(terms, positions)
            ]
            freq = len(set.intersection(*aligned))
            if freq > 0:
                out[d] = freq
        return out

    def phrase_scores(self, terms: list[str], positions=None, boost=1.0) -> dict[int, np.float32]:
        freqs = self.phrase_docs(terms, positions)
        if not freqs:
            return {}
        idf_sum = np.float32(
            sum(float(self.idf(len(self.postings[t]))) for t in terms)
        )
        w = np.float32(np.float32(boost) * idf_sum)
        return {d: self.score_term(w, f, d) for d, f in freqs.items()}

    def boolean_and(self, terms: list[str]) -> dict[int, np.float32]:
        per_term = [self.term_scores(t) for t in terms]
        if not per_term or any(not p for p in per_term):
            return {}
        docs = set.intersection(*(set(p) for p in per_term))
        return {
            d: np.float32(sum(float(p[d]) for p in per_term)) for d in docs
        }

    def boolean_or(self, terms: list[str], msm: int = 1) -> dict[int, np.float32]:
        per_term = [self.term_scores(t) for t in terms]
        docs: dict[int, list[float]] = {}
        for p in per_term:
            for d, s in p.items():
                docs.setdefault(d, []).append(float(s))
        return {
            d: np.float32(sum(ss)) for d, ss in docs.items() if len(ss) >= msm
        }

    def top_k(self, scores: dict[int, np.float32], k: int) -> list[tuple[int, float]]:
        """score DESC, doc_id ASC tie-break (HitQueue.java:76-81)."""
        ordered = sorted(scores.items(), key=lambda kv: (-float(kv[1]), kv[0]))
        return [(d, float(s)) for d, s in ordered[:k]]
