"""Block-max WAND top-k over the segmented block-encoded index.

The reference 7.0 has NO WAND (verified: no WANDScorer/impacts in
search/ — SURVEY §4.2); this exceeds it, per the north star.  The
block metadata written by the segment writer (max_docid, max_tf per
128-posting block — the skip-list analog, Lucene50SkipWriter.java:46)
doubles as the upper-bound source:

    ub(term, block) = weight·(k1+1)·max_tf / (max_tf + k1·(1−b))

(b-term lower-bounded at zero doc length — a valid upper bound for any
norm byte, since cache[n] = k1·((1−b)+b·NORM_TABLE[n]/avgdl) ≥ k1·(1−b)).

Execution model: each segment owns a disjoint docID range, so segments
run WAND independently (one applyInPandas group per segment = the
per-leaf scoring loop of IndexSearcher.search, IndexSearcher.java:
640-655), each emitting its local top-k; the driver-side merge is
ORDER BY score DESC, doc_id ASC LIMIT k — bit-identical to
TopDocs.merge tie-breaks (search/TopDocs.java:209-260,
HitQueue.java:76-81).

Within a segment: a boundary sweep over the union of block intervals
processes elementary docID ranges in increasing-docID order, skipping
every range whose Σ block upper bounds ≤ the current heap threshold —
safe at equality *because* docIDs only increase: a later doc scoring
exactly θ loses the tie-break to the incumbent (SURVEY §7 hard part e).
Blocks are only FOR/VByte-decoded when their range survives the bound
check (the two-phase cheap-approximation / expensive-verify split,
search/TwoPhaseIterator.java).

Scoring is float32 bit-identical to the exhaustive path: per-term
float32 kernel, cross-term sum in float64, cast back to float32
(BM25Similarity.java:241-254; DisjunctionSumScorer sums in double).
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lucene_solr_spark.index.segments import SegmentedIndex
from lucene_solr_spark.scoring.bm25 import BM25, idf as idf32


def _segment_wand(
    pdf: pd.DataFrame,
    term_weights: dict[str, float],
    cache: np.ndarray | None,
    k: int,
    k1: float,
    b: float,
    avgdl: float = 1.0,
) -> pd.DataFrame:
    """WAND over one segment's block rows + norm rows → local top-k.

    ``cache`` is the 256-entry byte315 norm cache (float32 lucene mode);
    ``cache=None`` switches to EXACT double scoring where the block's
    lens payload carries the raw field length and the freq-independent
    denominator is computed directly as k1·((1−b) + b·dl/avgdl) — same
    bound logic, no quantization.

    Norms come from each block's own ``lens_bin`` payload — the group
    receives ONLY term-pruned block rows, never the norms table (the
    per-leaf .nvd locality of Lucene70NormsFormat.java:37; previously
    every query shuffled the whole collection's norm rows into every
    segment group).
    """
    from lucene_solr_spark.codecs.postings import (
        decode_block_lens,
        decode_posting_block,
    )
    from lucene_solr_spark.scoring.bm25 import encode_norm

    exact = cache is None

    terms = sorted(term_weights)
    blocks: list[dict] = []  # flat block table across terms
    for ti, term in enumerate(terms):
        g = pdf[pdf["term"] == term]
        if g.empty:
            continue
        if exact:
            wv = np.float64(term_weights[term]) * np.float64(k1 + 1)
        else:
            wv = np.float32(np.float32(term_weights[term]) * np.float32(k1 + 1))
        g = g.sort_values("base_docid")
        for base, cnt, mx, mtf, db, tb, lb in zip(
            g["base_docid"], g["count"], g["max_docid"], g["max_tf"],
            g["docs_bin"], g["tfs_bin"], g["lens_bin"],
        ):
            mtf64 = float(mtf)
            ub = float(wv) * mtf64 / (mtf64 + k1 * (1.0 - b))
            blocks.append(
                {
                    "term_i": ti,
                    "wv": wv,
                    "lo": int(base),
                    "hi": int(mx),
                    "ub": ub * (1.0 + 1e-6),  # guard float32 rounding
                    "count": int(cnt),
                    "docs_bin": db,
                    "tfs_bin": tb,
                    "lens_bin": lb,
                    "decoded": None,
                }
            )
    score_dtype = "float64" if exact else "float32"
    if not blocks:
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "score": pd.Series([], dtype=score_dtype)})

    # elementary intervals from all block boundaries; blocks enter/leave
    # the active set via an O(#blocks) event sweep, never a rescan
    bounds = np.array(
        sorted({blk["lo"] for blk in blocks} | {blk["hi"] + 1 for blk in blocks}),
        dtype=np.int64,
    )
    n_iv = len(bounds) - 1
    add_ev: list[list[dict]] = [[] for _ in range(n_iv + 1)]
    rem_ev: list[list[dict]] = [[] for _ in range(n_iv + 1)]
    for blk in blocks:
        si = int(np.searchsorted(bounds, blk["lo"]))
        ei = int(np.searchsorted(bounds, blk["hi"] + 1))
        add_ev[si].append(blk)
        rem_ev[ei].append(blk)
    heap: list[tuple[np.float32, int]] = []  # (score, -doc_id), size ≤ k

    def theta() -> float:
        return float(heap[0][0]) if len(heap) == k else -np.inf

    active: dict[int, dict] = {}
    ub_run = 0.0
    for i in range(n_iv):
        for blk in rem_ev[i]:
            del active[id(blk)]
            ub_run -= blk["ub"]
        for blk in add_ev[i]:
            active[id(blk)] = blk
            ub_run += blk["ub"]
        if not active:
            continue
        lo, hi = int(bounds[i]), int(bounds[i + 1]) - 1
        if ub_run <= theta():
            continue  # equality-safe: later docIDs lose ties (HitQueue)
        active_list = list(active.values())
        # decode + gather candidate docs in [lo, hi]
        seg_docs: list[np.ndarray] = []
        seg_scores: list[np.ndarray] = []
        for blk in active_list:
            if blk["decoded"] is None:
                d_, t_ = decode_posting_block(
                    blk["lo"], blk["count"], blk["docs_bin"], blk["tfs_bin"]
                )
                lens_ = decode_block_lens(blk["lens_bin"]).astype(np.int64)
                blk["decoded"] = (d_, t_, lens_)
            d, t, lens = blk["decoded"]
            a = np.searchsorted(d, lo, side="left")
            z = np.searchsorted(d, hi, side="right")
            if a == z:
                continue
            docs = d[a:z].astype(np.int64)
            if exact:
                tfs = t[a:z].astype(np.float64)
                dl = lens[a:z].astype(np.float64)
                norm_add = k1 * ((1.0 - b) + b * dl / avgdl)
                s = blk["wv"] * tfs / (tfs + norm_add)
            else:
                tfs = t[a:z].astype(np.float32)
                nb = encode_norm(lens[a:z])
                s = (blk["wv"] * tfs / (tfs + cache[nb & 0xFF])).astype(
                    np.float32
                )
            seg_docs.append(docs)
            seg_scores.append(s.astype(np.float64))  # float64 accumulate
        if not seg_docs:
            continue
        # vectorized per-doc accumulation: unique docIDs (sorted — the
        # increasing-docID order the equality-safe θ check relies on)
        # + np.add.at scatter, replacing the per-posting dict loop
        uniq_docs, inv = np.unique(np.concatenate(seg_docs), return_inverse=True)
        sums = np.zeros(len(uniq_docs), dtype=np.float64)
        np.add.at(sums, inv, np.concatenate(seg_scores))
        sc32s = sums if exact else sums.astype(np.float32)
        # θ only grows, so docs strictly below the current threshold can
        # never enter the heap — drop them before the Python heap loop
        if len(heap) == k:
            keep = sc32s >= heap[0][0]
            uniq_docs, sc32s = uniq_docs[keep], sc32s[keep]
        for doc, sc32 in zip(uniq_docs.tolist(), sc32s.tolist()):
            item = (sc32 if exact else np.float32(sc32), -doc)
            if len(heap) < k:
                heapq.heappush(heap, item)
            elif item > heap[0]:
                heapq.heapreplace(heap, item)
    out = sorted(heap, key=lambda x: (-float(x[0]), -x[1]))
    return pd.DataFrame(
        {
            "doc_id": pd.Series([-d for _, d in out], dtype="int64"),
            "score": pd.Series([s for s, _ in out], dtype=score_dtype),
        }
    )


def wand_topk(
    index: SegmentedIndex,
    terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    exact: bool = False,
) -> DataFrame:
    """Top-k disjunction (SHOULD over ``terms``) with block-max WAND.

    Rank-identical to exhaustive scoring (equivalence-tested); global
    term/collection statistics are gathered once and broadcast, like the
    distributed stats round (ExactStatsCache, QueryComponent.java:313-319).

    ``exact=True`` scores in full double precision with raw field lengths
    (no byte315 quantization, no float32 casts) — the mode whose results
    are directly SQL-expressible, so the driver gate can hash-compare it
    against the DuckDB oracle.  The bound logic is identical; only the
    scoring kernel changes.
    """
    import math

    spark = index.spark
    uniq = sorted(set(terms))
    stats_rows = index.term_stats().filter(F.col("term").isin(uniq)).collect()
    df_by_term = {r["term"]: int(r["df"]) for r in stats_rows}
    # collection stats straight from the manifest (SegmentInfos carries
    # num_docs + sum_len per segment) — no data scan, the role of
    # Lucene's in-memory SegmentInfos + CollectionStatistics
    man = index.manifest().values()
    doc_count = sum(i.num_docs for i in man)
    sum_len = sum(i.sum_len for i in man)
    bm25 = BM25(k1=k1, b=b)
    if exact:
        avgdl = float(sum_len) / doc_count if doc_count else 1.0
        cache = None
        # math.log(1.0 + x), NOT log1p: bit-matches the exact searcher
        # (searcher.py idf) and DuckDB's ln(1 + x)
        weights = {
            t: math.log(
                1.0 + (doc_count - df_by_term[t] + 0.5) / (df_by_term[t] + 0.5)
            )
            for t in uniq
            if df_by_term.get(t, 0) > 0
        }
    else:
        avgdl = bm25.avgdl(sum_len, doc_count)
        cache = bm25.cache(avgdl)
        weights = {
            t: float(bm25.weight(idf32(df_by_term[t], doc_count)))
            for t in uniq
            if df_by_term.get(t, 0) > 0
        }
    score_t = "double" if exact else "float"
    if not weights:
        return spark.createDataFrame([], f"doc_id long, score {score_t}")

    # term-pruned block rows ONLY — norms ride inside each block's
    # lens_bin payload, so the shuffle into the per-segment WAND groups
    # is O(matching blocks), independent of collection size
    posts = (
        index.postings()
        .filter(F.col("term").isin(list(weights)))
        .select(
            "segment", "term", "block_id", "base_docid",
            "count", "max_docid", "max_tf", "docs_bin", "tfs_bin",
            "lens_bin",
        )
    )

    def kernel(pdf):
        return _segment_wand(pdf, weights, cache, k, k1, b, avgdl=float(avgdl))

    local = posts.groupBy("segment").applyInPandas(
        kernel, schema=f"doc_id long, score {score_t}"
    )
    # TopDocs.merge: global k with the HitQueue tie-break
    return local.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(k)
