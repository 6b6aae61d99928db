"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force exact top-k — JVM-side dot product via
  zip_with + aggregate (whole-stage codegen, no UDF), the correctness
  baseline and the right plan when the query set is small.
- ``lsh_ann_topk``: random-hyperplane LSH buckets → candidate set →
  exact rerank.  The scale path: at 10^12 vectors the bucket join
  prunes the candidate set by ~2^num_planes before any dot product.
- ``embedding_near_dups``: all-pairs cosine ≥ τ via LSH-bucketed join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    # element products in double: float32 products lose ~1e-7 relative
    # accuracy, enough to flip a round(4) digit at a 5e-5 boundary
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0).cast("double"),
            lambda acc, v: acc + v,
        )
    )


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine similarity to ``query_vec`` (brute force).

    Tie-break: cosine DESC, id ASC — same discipline as search top-k.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    qn = float(np.linalg.norm(np.asarray(query_vec, dtype=np.float64)))
    if qn == 0.0:
        raise ValueError("query vector has zero norm")
    v = F.col(vec_col)
    nrm = _norm(v)
    cos = _dot(v, q) / (nrm * F.lit(qn))
    return (
        df.select(F.col(id_col).alias("vec_id"), cos.alias("cosine"), nrm.alias("_n"))
        .filter(F.col("_n") > 0)  # zero-norm rows can't rank (ANSI /0 guard)
        .drop("_n")
        .orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
        .limit(k)
    )


def _hyperplanes(dim: int, num_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((num_planes, dim))


def _bucket_udf(planes: np.ndarray):
    """Sign-LSH band bucket ids as ONE Arrow-batched float64 matmul
    (the _assign_centroids pattern) — planes is (bands, planes_per_band,
    dim); returns array<long> of per-band bucket ids.  Replaces the old
    per-plane nested F.aggregate chain, which ran interpreted per array
    element and recomputed on every query."""
    B, P, _ = planes.shape
    W = planes.reshape(B * P, -1).T.astype(np.float64)  # (dim, B*P)
    weights = (1 << np.arange(P, dtype=np.int64))[None, :]

    @F.pandas_udf("array<long>")
    def buckets(v: pd.Series) -> pd.Series:
        M = np.array([np.asarray(x, dtype=np.float64) for x in v.to_numpy()])
        bits = (M @ W) > 0  # (n, B*P)
        ids = (bits.reshape(len(M), B, P) * weights).sum(axis=2)
        return pd.Series(list(ids.astype(np.int64)), index=v.index)

    return buckets


def lsh_index(
    df: DataFrame,
    num_planes: int = 8,
    bands: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> tuple[DataFrame, np.ndarray]:
    """Build-time sign-LSH index: persist per-band bucket ids alongside
    the vectors (``_b`` array<long>, plus ``_bucket`` long for band 0).

    This is the index-time/query-time split Lucene's HNSW-adjacent
    vector formats make (lucene/core/codecs/VectorFormat): hashing
    happens ONCE at build, queries only filter on the stored bucket
    column — at scale the table is written partitionBy/bucketBy on
    ``_bucket`` so a probe is a partition-pruned read, never a rescan.
    Returns (indexed_df, planes) with planes shaped
    (bands, num_planes, dim)."""
    dim = len(df.select(vec_col).first()[0])
    planes = _hyperplanes(dim, bands * num_planes, seed).reshape(
        bands, num_planes, dim
    )
    indexed = df.withColumn("_b", _bucket_udf(planes)(F.col(vec_col)))
    indexed = indexed.withColumn("_bucket", F.col("_b")[0])
    return indexed, planes


def lsh_ann_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    num_planes: int = 8,
    probe_hamming: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    index: "tuple[DataFrame, np.ndarray] | None" = None,
) -> DataFrame:
    """Approximate top-k: persisted sign-LSH bucket + multiprobe.

    Scans only vectors whose stored bucket is within ``probe_hamming``
    bit flips of the query's bucket, then reranks those exactly.
    Recall/latency knob = (num_planes, probe_hamming).  Pass a prebuilt
    ``index`` (from lsh_index) to amortize hashing across queries;
    without one the index is built on the fly (one matmul pass)."""
    indexed, planes = (
        index
        if index is not None
        else lsh_index(df, num_planes, 1, id_col, vec_col, seed)
    )
    band0 = planes[0]
    num_planes = band0.shape[0]
    qv = np.asarray(query_vec, dtype=np.float64)
    qbucket = int(((band0 @ qv > 0) * (1 << np.arange(num_planes))).sum())
    # enumerate probe buckets within the hamming radius (small: C(p, h))
    probes = {qbucket}
    if probe_hamming >= 1:
        probes |= {qbucket ^ (1 << i) for i in range(num_planes)}
    if probe_hamming >= 2:
        probes |= {
            qbucket ^ (1 << i) ^ (1 << j)
            for i in range(num_planes)
            for j in range(i + 1, num_planes)
        }
    cand = indexed.filter(F.col("_bucket").isin([int(x) for x in probes]))
    return cosine_topk(cand, query_vec, k, id_col, vec_col)


def _assign_centroids(df: DataFrame, centroids: np.ndarray, vec_col: str) -> DataFrame:
    """Nearest-centroid assignment (L2 argmin) as one Arrow-batched
    matmul pass — ||v−c||² = ||v||² − 2v·c + ||c||², argmin over the
    −2v·c + ||c||² part; no per-row Python."""
    C = centroids.astype(np.float64)
    c_sq = (C * C).sum(axis=1)

    @F.pandas_udf("int")
    def cid(v: pd.Series) -> pd.Series:
        M = np.array([np.asarray(x, dtype=np.float64) for x in v.to_numpy()])
        d = c_sq[None, :] - 2.0 * (M @ C.T)
        return pd.Series(np.argmin(d, axis=1).astype(np.int32), index=v.index)

    return df.withColumn("_cid", cid(F.col(vec_col)))


def ivf_index(
    df: DataFrame,
    num_centroids: int = 16,
    kmeans_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, np.ndarray]:
    """IVF coarse quantizer: deterministic Lloyd k-means.

    Init = the ``num_centroids`` vectors with smallest
    (xxhash64(id), id) — a seeded pseudo-random sample that is a pure
    function of the data, so rebuilds/resumes reproduce the identical
    index.  A fixed small iteration count keeps the build at
    O(iters · scan); each iteration is one assignment pass + one
    K×dim centroid aggregation (collected to the driver — K·dim
    floats, never the vectors).

    At scale the returned assignment is written
    ``partitionBy("_cid")`` so a query reading ``nprobe`` centroids
    prunes to nprobe/K of the data at the Parquet partition level.
    """
    init = (
        df.select(F.col(id_col).alias("i"), F.col(vec_col).alias("v"))
        .orderBy(F.xxhash64(F.col("i")), F.col("i"))
        .limit(num_centroids)
        .collect()
    )
    C = np.array([r["v"] for r in init], dtype=np.float64)
    for _ in range(kmeans_iters):
        assigned = _assign_centroids(df, C, vec_col)
        # centroid update via posexplode + (cid, dim) groupBy: map-side
        # partial aggregation reduces the shuffle to K·dim rows per
        # partition regardless of corpus size — a per-dimension agg
        # COLUMN list (K separate F.sum(element_at) exprs) is fine at
        # dim=8 but pathological at dim>=512 (one codegen expr per dim)
        sums = (
            assigned.select("_cid", F.posexplode(F.col(vec_col)).alias("d", "x"))
            .groupBy("_cid", "d")
            .agg(F.sum(F.col("x").cast("double")).alias("s"),
                 F.count("*").alias("n"))
            .collect()
        )
        S = np.zeros_like(C)
        N = np.zeros(C.shape[0], dtype=np.int64)
        for r in sums:
            S[r["_cid"], r["d"]] = r["s"]
            N[r["_cid"]] = r["n"]
        nz = N > 0
        C[nz] = S[nz] / N[nz, None]
    return _assign_centroids(df, C, vec_col), C


def ivf_ann_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    num_centroids: int = 16,
    nprobe: int = 4,
    kmeans_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    index: "tuple[DataFrame, np.ndarray] | None" = None,
) -> DataFrame:
    """Approximate top-k via IVF: probe the ``nprobe`` centroids nearest
    the query, exact-rerank only their members — the classic
    IVF-Flat recall/latency trade (the alternate scale path beside
    ``lsh_ann_topk``; prunes ~nprobe/num_centroids of the corpus).

    Pass a prebuilt ``index`` (from ivf_index) to amortize the k-means
    build across queries — rebuilding the quantizer per query defeats
    the point of an index."""
    assigned, C = index if index is not None else ivf_index(
        df, num_centroids, kmeans_iters, id_col, vec_col
    )
    q = np.asarray(query_vec, dtype=np.float64)
    order = np.argsort(((C - q[None, :]) ** 2).sum(axis=1), kind="stable")
    probe = [int(c) for c in order[:nprobe]]
    cand = assigned.filter(F.col("_cid").isin(probe))
    return cosine_topk(cand, query_vec, k, id_col, vec_col)


def embedding_near_dups(
    df: DataFrame,
    threshold: float = 0.95,
    num_planes: int = 8,
    bands: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """All (a, b) pairs with cosine ≥ threshold via BANDED sign-LSH —
    the OR-amplified shape of minhash_lsh_pairs: ``bands`` independent
    plane-sets each bucket the corpus; a pair is a candidate if ANY
    band agrees (P(miss) = (1 − (1−θ/π)^planes)^bands, driven → 0 by
    adding bands); candidates are exact-verified, so false positives
    are impossible and recall is the only tunable.

    Scale shape: the band self-join carries ONLY (id, band, bucket)
    rows — vectors are joined back for the candidate pairs alone, so a
    popular bucket costs narrow-row shuffle, not vector-payload blowup;
    a single hot bucket is further bounded by the bands being
    independent (skew in one band's bucketing doesn't correlate across
    bands)."""
    indexed, _ = lsh_index(df, num_planes, bands, id_col, vec_col, seed)
    keyed = indexed.select(
        F.col(id_col).alias("vid"),
        F.posexplode("_b").alias("band", "bucket"),
    )
    a, b = keyed.alias("a"), keyed.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vid") < F.col("b.vid")),
        )
        .select(F.col("a.vid").alias("ida"), F.col("b.vid").alias("idb"))
        .distinct()  # OR-amplification: union candidates across bands
    )
    vecs = df.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("v"),
        _norm(F.col(vec_col)).alias("nrm"),
    ).filter(F.col("nrm") > 0)
    cos = _dot(F.col("a.v"), F.col("b.v")) / (F.col("a.nrm") * F.col("b.nrm"))
    return (
        pairs.join(vecs.alias("a"), F.col("ida") == F.col("a.vid"))
        .join(vecs.alias("b"), F.col("idb") == F.col("b.vid"))
        .select("ida", "idb", cos.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def cosine_all_pairs_exact(
    df: DataFrame,
    threshold: float,
    num_blocks: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """EXACT all-pairs cosine ≥ threshold via block-pair GEMM.

    The guaranteed-recall complement of the LSH path
    (``embedding_near_dups``): every row is replicated to its
    ``num_blocks`` block-pair groups (shuffle volume n·B rows), and each
    of the B·(B+1)/2 groups computes one dense numpy matmul over its two
    blocks — the classic blocked self-join that distributes inherently
    O(n²) exact work across the cluster with bounded per-task memory
    (pick B so n/B vectors fit an executor; at 10^9 rows you want the
    LSH path instead, but the exact path must exist and must scale to
    the sizes where exactness is affordable).

    Returns (ida, idb, cosine) with ida < idb, cosine in double.
    """
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("ida", LongType()),
            StructField("idb", LongType()),
            StructField("cosine", DoubleType()),
        ]
    )
    tau = float(threshold)

    def kernel(key, pdf):
        empty = pd.DataFrame(
            {
                "ida": np.array([], dtype=np.int64),
                "idb": np.array([], dtype=np.int64),
                "cosine": np.array([], dtype=np.float64),
            }
        )
        if len(pdf) == 0:
            return empty
        gi, gj = int(key[0]), int(key[1])
        ids = pdf["vid"].to_numpy().astype(np.int64)
        X = np.stack(pdf["vec"].to_numpy()).astype(np.float64)
        X /= np.linalg.norm(X, axis=1, keepdims=True)
        blk = pdf["blk"].to_numpy()
        if gi == gj:
            S = X @ X.T
            keep = S >= tau
            keep[np.tril_indices(len(ids))] = False
            iu, ju = np.nonzero(keep)
            ia, ib, c = ids[iu], ids[ju], S[iu, ju]
        else:
            ma, mb = blk == gi, blk == gj
            if not ma.any() or not mb.any():
                return empty
            S = X[ma] @ X[mb].T
            ii, jj = np.nonzero(S >= tau)
            ia, ib, c = ids[ma][ii], ids[mb][jj], S[ii, jj]
        lo, hi = np.minimum(ia, ib), np.maximum(ia, ib)
        return pd.DataFrame({"ida": lo, "idb": hi, "cosine": c})

    base = (
        df.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("vec"))
        # zero-norm vectors have no defined cosine: exclude them up front
        # instead of letting the kernel's normalize produce NaN rows
        # that silently fail the >= tau comparison
        .filter(_norm(F.col("vec")) > 0)
        .withColumn(
            "blk", F.pmod(F.xxhash64("vid"), F.lit(num_blocks)).cast("int")
        )
    )
    rep = (
        base.withColumn(
            "pb", F.explode(F.array(*[F.lit(i) for i in range(num_blocks)]))
        )
        .withColumn("gi", F.least("blk", "pb"))
        .withColumn("gj", F.greatest("blk", "pb"))
    )
    return rep.groupBy("gi", "gj").applyInPandas(kernel, out_schema)


# --------------------------------------------------------------------------
# Scalar (int8-range) quantization ANN — the storage/bandwidth play for
# 100-TB embedding corpora: 4× smaller vectors, arithmetic on
# dequantized doubles (asymmetric-free, fully engine-reproducible).
# Semantics defined by this module (the reference predates vector
# codecs); the design mirrors the global min/max scalar quantizer every
# vector store ships: code_d = round((x_d − min_d) · 255 / (max_d −
# min_d)) per dimension, dequant x̂_d = min_d + code_d · ((max_d −
# min_d) / 255).  Per-dim bounds come from ONE posexplode partial+final
# agg (dim-safe, no driver-sized state beyond 2·dim doubles); queries
# quantize symmetrically so index and query share the codebook.
# --------------------------------------------------------------------------


def sq_minmax(
    df: DataFrame, vec_col: str = "embedding"
) -> tuple[list[float], list[float]]:
    """Per-dimension (min, max) over the corpus — 2·dim doubles, the
    whole 'codebook'."""
    mm = (
        df.select(F.posexplode(F.col(vec_col)).alias("d", "x"))
        .groupBy("d")
        .agg(
            F.min(F.col("x").cast("double")).alias("mn"),
            F.max(F.col("x").cast("double")).alias("mx"),
        )
        .orderBy("d")
        .collect()
    )
    return [r["mn"] for r in mm], [r["mx"] for r in mm]


def _sq_codes(vec, mins: list[float], maxs: list[float]):
    """array<int> quantization codes: round((x−mn)·255/(mx−mn)),
    0 for constant dimensions.  Op order matches the SQL oracle
    exactly: ((x − mn) · 255.0) / (mx − mn)."""
    mn = F.array(*[F.lit(float(v)) for v in mins])
    mx = F.array(*[F.lit(float(v)) for v in maxs])

    def code(x, i):
        m = F.element_at(mn, i + 1)
        r = F.element_at(mx, i + 1) - m
        return F.when(r == 0.0, F.lit(0)).otherwise(
            F.round((x.cast("double") - m) * F.lit(255.0) / r, 0).cast("int")
        )

    return F.transform(vec, code)


def _sq_dequant(codes, mins: list[float], maxs: list[float]):
    """array<double> dequantized values: mn + code·((mx−mn)/255)."""
    mn = F.array(*[F.lit(float(v)) for v in mins])
    mx = F.array(*[F.lit(float(v)) for v in maxs])

    def deq(c, i):
        m = F.element_at(mn, i + 1)
        r = F.element_at(mx, i + 1) - m
        return m + c.cast("double") * (r / F.lit(255.0))

    return F.transform(codes, deq)


def sq_index(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, list[float], list[float]]:
    """Build-time quantization: (vec_id, _sq array<int>) plus the
    codebook.  At scale the codes column is what gets persisted — the
    float vectors never need to be read again for approximate search."""
    mins, maxs = sq_minmax(df, vec_col)
    idx = df.select(
        F.col(id_col).alias("vec_id"),
        _sq_codes(F.col(vec_col), mins, maxs).alias("_sq"),
    )
    return idx, mins, maxs


def sq_topk(
    index: tuple[DataFrame, list[float], list[float]],
    query_vec: list[float],
    k: int = 10,
) -> DataFrame:
    """Approximate top-k by cosine over dequantized codes, the query
    quantized symmetrically through the same codebook."""
    idx, mins, maxs = index
    import numpy as np  # noqa: PLC0415 — local to keep module import light

    qc = []
    for x, mn, mx in zip(query_vec, mins, maxs):
        r = mx - mn
        # floor(v+0.5) = HALF_UP — np.round is half-EVEN and would
        # disagree with Spark/DuckDB round() on exact .5 codes
        qc.append(
            0 if r == 0 else int(np.floor((float(x) - mn) * 255.0 / r + 0.5))
        )
    qh = [
        mn + c * ((mx - mn) / 255.0)
        for c, mn, mx in zip(qc, mins, maxs)
    ]
    qn = float(np.sqrt(np.sum(np.asarray(qh, dtype=np.float64) ** 2)))
    if qn == 0.0:
        raise ValueError("quantized query vector has zero norm")
    q = F.array(*[F.lit(float(v)) for v in qh])
    vh = _sq_dequant(F.col("_sq"), mins, maxs)
    dot = _dot(vh, q)
    nrm = _norm(vh)
    return (
        idx.select(
            "vec_id",
            (dot / (nrm * F.lit(qn))).alias("cosine"),
            nrm.alias("_n"),
        )
        .filter(F.col("_n") > 0)
        .drop("_n")
        .orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
        .limit(k)
    )


def semantic_dedup(
    df: DataFrame,
    threshold: float = 0.98,
    num_clusters: int = 8,
    kmeans_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540 — the LAION/LLM curation recipe): cluster the
    UNIT-NORMALIZED embeddings with the deterministic IVF Lloyd
    k-means (on the unit sphere L2-argmin ≡ cosine-argmax, i.e.
    spherical clustering), compare pairs ONLY within a cluster, and
    drop every vector that has a strictly-lower-id neighbor with
    cosine ≥ ``threshold`` (keep-first survivor — the engine's batch
    dedup convention, same as SignatureUpdateProcessor's min-id).

    Returns (id_col, kept boolean), one row per input vector.

    Scale shape: the quadratic comparison is confined to clusters
    (Σ n_c² ≪ n² — SemDeDup's whole point; the paper dedups 5B
    embeddings this way), the k-means is the existing bounded-driver
    ivf_index (K·dim floats collected, never vectors), and the pair
    comparison is one Arrow-batched chunked GEMM per cluster.  At
    100 TB the assignment is written partitionBy(_cid) so each task
    reads one cluster.  The correctness gate runs the EXACT global
    all-pairs τ-join as its oracle, so a cluster split that lost a
    τ-pair would fail the gate — blocking is verified lossless on the
    fixture, not assumed.

    Zero-norm vectors cannot be cosine-duplicates; they skip
    clustering and are kept unconditionally.

    Blocking is OVERLAPPING: every vector participates in its
    ``probes`` nearest clusters (the ε-overlap/multiprobe variant), so
    a near-dup pair sitting on a Voronoi boundary is still co-blocked
    unless it straddles past the 2nd-nearest centroid — and the gate's
    global oracle would catch exactly that.  (Measured on the sf0.01
    fixture: hard argmin assignment split one planted pair across a
    boundary; probes=2 recovers it.)
    """
    from lucene_solr_spark.functions.dedup import _persisted, release_persisted

    probes = 2
    v = F.col(vec_col)
    d = df.select(F.col(id_col), v.alias("_v")).withColumn(
        "_n", _norm(F.col("_v"))
    )
    nz = d.filter(F.col("_n") > 0).withColumn(
        # the _n > 0 filter does not guard ANSI division when Catalyst
        # collapses Filter+Project into one stage — guard in the expr
        "_u",
        F.transform(
            "_v",
            lambda x: F.when(
                F.col("_n") > 0, x.cast("double") / F.col("_n")
            ).otherwise(F.lit(0.0)),
        ),
    ).select(id_col, "_u")
    # every Lloyd pass (assign + centroid agg) re-derives this frame —
    # persist once so k-means iterations read cached unit vectors, not
    # the parquet + interpreted normalize fold each time (measured
    # 6.5 → 3.4 s warm full-pipeline at sf0.1, 2050×64)
    release_persisted()
    nz = nz.persist()
    _persisted.append(nz)
    _assigned, centroids = ivf_index(
        nz, num_clusters, kmeans_iters, id_col, "_u"
    )
    C = centroids.astype(np.float64)
    c_sq = (C * C).sum(axis=1)

    @F.pandas_udf("array<int>")
    def near_cids(vs: pd.Series) -> pd.Series:
        M = np.array([np.asarray(x, dtype=np.float64) for x in vs.to_numpy()])
        dist = c_sq[None, :] - 2.0 * (M @ C.T)
        top = np.argsort(dist, axis=1, kind="stable")[:, :probes]
        return pd.Series(list(top.astype(np.int32)), index=vs.index)

    assigned = nz.withColumn("_cid", F.explode(near_cids(F.col("_u"))))

    # Within-cluster comparison as one Arrow-batched chunked GEMM per
    # cluster (cosine_all_pairs_exact's blocked shape): row-chunks of
    # the unit matrix against the whole cluster bound per-task memory
    # to chunk×n_c, never n_c².  ~100× the interpreted per-element
    # zip_with fold a pair self-join would run (measured 6.2→0.9 s on
    # the 2050×64 fixture) and exactly the paper's per-cluster compute.
    tau = float(threshold)

    def _drop_in_cluster(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf[id_col].to_numpy()
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        U = np.array(
            [np.asarray(x, dtype=np.float64) for x in pdf["_u"].to_numpy()]
        )[order]
        dropped_ids: set[int] = set()
        chunk = 1024
        for s in range(0, len(ids), chunk):
            e = min(s + chunk, len(ids))
            G = U[s:e] @ U.T  # (chunk, n_c)
            for r in range(e - s):
                i = s + r
                hits = np.nonzero(G[r, i + 1:] >= tau)[0]
                dropped_ids.update(int(x) for x in ids[i + 1:][hits])
        return pd.DataFrame({id_col: sorted(dropped_ids)})

    dropped = (
        assigned.select("_cid", id_col, "_u")
        .groupBy("_cid")
        .applyInPandas(_drop_in_cluster, f"{id_col} long")
        .select(id_col)
        .distinct()
        .withColumn("_dropped", F.lit(True))
    )
    return (
        df.select(F.col(id_col))
        .join(dropped, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(~F.col("_dropped"), F.lit(True)).alias("kept"),
        )
    )
