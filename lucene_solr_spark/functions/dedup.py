"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Scale notes (the whole point of these implementations):

- exact: one hash-groupBy — Spark's partial+final agg handles any size.
- n-gram Jaccard: shingle-explode + self-join on shingle.  The join is
  shuffle-on-shingle; hot shingles are capped by a document-frequency
  filter (a shingle in >max_df docs carries no dedup signal — standard
  suffix-array-dedup trick) so the join never degenerates quadratically.
- MinHash+LSH: signatures via xxhash64(shingle, seed_i) min-aggregated
  per doc — one pass, no UDF; banding → bucket join on (band, band_hash)
  → candidate pairs → exact-Jaccard verification of candidates only.
- SimHash: 64-bit sign-aggregated token hashes via bit arithmetic in
  column expressions; near-dups = hamming ≤ k via bucket join on
  16-bit chunks (pigeonhole: hamming ≤ 3 ⇒ some chunk equal).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# Persisted shingle frames from minhash_lsh_pairs calls.  Each new call
# unpersists the previous call's frame (by then its consumer plan has
# been materialized); release_persisted() lets benches/tests drop the
# last one explicitly instead of waiting for the ContextCleaner.
_persisted: list[DataFrame] = []


def release_persisted() -> None:
    """Unpersist shingle frames cached by minhash_lsh_pairs."""
    while _persisted:
        _persisted.pop().unpersist()


def _tokens(text_col: str):
    return F.split(F.lower(F.trim(F.col(text_col))), " +")


def _shingles_of(toks, n: int):
    """Word n-gram shingles (distinct) from an ALREADY-MATERIALIZED
    token array column.

    The tokens MUST be a projected column, not the split expression
    inline: expressions inside a higher-order lambda are re-evaluated
    per array element (no CSE across the lambda boundary), so an
    inline split() ran once per shingle position — measured 9× slower
    at sf0.1 (6.4 s vs 0.7 s for the whole shingling pass).

    Docs with fewer than n tokens produce no shingles (guarded —
    F.sequence(0, negative) would generate a descending range)."""
    if n == 1:
        return F.array_distinct(toks)
    idx = F.sequence(F.lit(1), F.size(toks) - n + 1)
    grams = F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
    )
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def _doc_shingles(
    df: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    """(doc_id, shset) — tokens projected first (see _shingles_of)."""
    return df.select(
        F.col(id_col).alias("doc_id"), _tokens(text_col).alias("_toks")
    ).select("doc_id", _shingles_of(F.col("_toks"), n).alias("shset"))


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact duplicate groups by content hash → (rep_id, dup_count, members)."""
    return (
        df.select(F.col(id_col).alias("doc_id"), F.sha2(F.col(text_col), 256).alias("h"))
        .groupBy("h")
        .agg(
            F.min("doc_id").alias("rep_id"),
            F.count("*").alias("dup_count"),
            F.sort_array(F.collect_list("doc_id")).alias("members"),
        )
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    n: int = 3,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_shingle_df: int = 10000,
) -> DataFrame:
    """All (a, b) doc pairs with word-n-gram Jaccard ≥ threshold.

    Shingles occurring in more than ``max_shingle_df`` docs are dropped
    from pair generation (hot-key guard) but still counted in set sizes.
    """
    sh = _doc_shingles(df, id_col, text_col, n).select(
        "doc_id", F.explode("shset").alias("s")
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("size"))
    hot = sh.groupBy("s").agg(F.count("*").alias("sdf")).filter(
        F.col("sdf") > max_shingle_df
    )
    # NB on the self-join's physical shape: locally Catalyst broadcasts
    # the small shingle frame and runs the pair stage with the input's
    # parallelism; at scale the frame's stats exceed the broadcast
    # threshold and the join plans as a shuffle join on s (partitioned,
    # skew-bounded by the max_shingle_df cap).  Forcing a repartition
    # on s here measured 30% SLOWER locally (sort-merge string sort
    # dominates) and adds a redundant exchange at scale.
    sh_cold = sh.join(F.broadcast(hot.select("s")), "s", "left_anti")
    a = sh_cold.alias("a")
    b = sh_cold.alias("b")
    common = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("ida"), F.col("b.doc_id").alias("idb"))
        .agg(F.count("*").alias("common"))
    )
    sa = sizes.select(F.col("doc_id").alias("ida"), F.col("size").alias("size_a"))
    sb = sizes.select(F.col("doc_id").alias("idb"), F.col("size").alias("size_b"))
    return (
        common.join(sa, "ida")
        .join(sb, "idb")
        .withColumn(
            "jaccard",
            F.col("common") / (F.col("size_a") + F.col("size_b") - F.col("common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("ida", "idb", "common", "size_a", "size_b", "jaccard")
    )


def minhash_signatures(
    df: DataFrame,
    num_hashes: int = 16,
    n: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """MinHash signature per doc: sig_i = min over shingles of
    xxhash64(shingle, salt=i).  One exploded agg, no UDF.

    NB: the shuffle-free alternative — array_min over F.transform of
    the per-doc shingle array — measured 3× SLOWER here (higher-order
    lambdas are interpreted per element, outside whole-stage codegen),
    while this explode + partial-agg shape keeps the hash inside
    codegen and shuffles only one combined row per doc."""
    sh = _doc_shingles(df, id_col, text_col, n).select(
        "doc_id", F.explode("shset").alias("s")
    )
    aggs = [
        F.min(F.xxhash64(F.col("s"), F.lit(i))).alias(f"mh{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def minhash_lsh_pairs(
    df: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 2,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_bucket_size: int = 1000,
) -> DataFrame:
    """Near-dup pairs via banded MinHash-LSH, verified with exact Jaccard.

    bands × rows layout: a pair is a candidate if any band's row-hashes
    all collide (bucket join on (band_id, band_hash)); candidates are
    then verified against the true n-gram Jaccard — no false positives
    survive, recall is the standard LSH S-curve.

    Hot-bucket guard (``max_bucket_size``): a degenerate bucket —
    thousands of identical boilerplate docs, the NORM in web corpora —
    would emit O(|bucket|²) candidate pairs inside one join key.
    Buckets above the cap therefore switch from clique emission to the
    signature-collapse path: docs with an IDENTICAL full minhash
    signature group under a representative (min doc id) and emit
    |group|−1 star edges, and only the per-signature representatives
    pair clique-wise within the bucket.  Connectivity (what
    dedup_clusters consumes) is preserved — members reach each other
    through their representative — while the emitted edge count drops
    from quadratic to linear in the bucket size.  A bucket whose
    DISTINCT-signature count still exceeds the cap is dropped from
    pair generation, the same documented recall trade as
    ngram_jaccard_pairs' ``max_shingle_df`` hot-shingle guard.
    Buckets at or under the cap are emitted exactly as before.

    Guarantees under the guard, for downstream consumers:

    - IDENTICAL-signature members of a hot bucket are ALWAYS connected
      (the star edges are emitted unconditionally), so exact/boiler-
      plate duplicates never split across components — a
      ``leakage_safe_split`` over these pairs routes every copy to the
      same train/val/test bucket regardless of cap pressure (pinned by
      tests/test_pii.py::test_leakage_split_hot_cluster_stays_together).
    - what CAN be lost are rep-to-rep edges in a bucket whose
      distinct-signature population still exceeds the cap: two NEAR
      (not identical) duplicates whose only co-occurrence is such a
      bucket may land in different components, and a split keyed on
      those components may then separate them across train/test.
      Corpora where that matters should raise ``max_bucket_size`` or
      tighten the banding before chaining into ``leakage_safe_split``.
    """
    assert num_hashes % bands == 0
    rows = num_hashes // bands
    # Shingle ONCE into a per-doc array column and persist that frame —
    # it feeds signatures (exploded), sizes (F.size), and candidate
    # verification (array_intersect).  Keeping verification on the
    # per-doc arrays means only the CANDIDATE PAIRS ever join — the
    # round-1 plan shuffled the full exploded (doc, shingle) frame
    # twice through the verify joins, which dominated the bench.
    release_persisted()
    docsh = _doc_shingles(df, id_col, text_col, n).persist()
    _persisted.append(docsh)
    # explode + partial-agg signatures (measured: the shuffle-free
    # F.transform/array_min alternative is 3× slower — higher-order
    # lambdas run interpreted, outside whole-stage codegen; this shape
    # keeps xxhash64 in codegen and shuffles one combined row per doc)
    sh = docsh.select("doc_id", F.explode("shset").alias("s"))
    aggs = [
        F.min(F.xxhash64(F.col("s"), F.lit(i))).alias(f"mh{i}")
        for i in range(num_hashes)
    ]
    sig = sh.groupBy("doc_id").agg(*aggs)
    band_cols = [
        F.struct(
            F.lit(bi).alias("band"),
            F.xxhash64(*[F.col(f"mh{bi * rows + r}") for r in range(rows)]).alias("bh"),
        )
        for bi in range(bands)
    ]
    buckets = sig.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("b")
    ).select("doc_id", F.col("b.band").alias("band"), F.col("b.bh").alias("bh"))
    # hot-bucket census: one partial+final count per (band, bh); the
    # over-cap list is ≤ bands·n/max_bucket_size rows, so materializing
    # it on the driver is bounded by construction at any corpus size.
    # The common case — no hot buckets — then keeps the plain clique
    # plan with zero extra joins.
    hot_rows = (
        buckets.groupBy("band", "bh")
        .agg(F.count(F.lit(1)).alias("_bsz"))
        .filter(F.col("_bsz") > max_bucket_size)
        .select("band", "bh")
        .collect()
    )

    def _clique(bk: DataFrame) -> DataFrame:
        a, b = bk.alias("a"), bk.alias("b")
        return (
            a.join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.bh") == F.col("b.bh"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(
                F.col("a.doc_id").alias("ida"), F.col("b.doc_id").alias("idb")
            )
        )

    if not hot_rows:
        cand = _clique(buckets).distinct()
    else:
        spark = df.sparkSession
        hot = F.broadcast(
            spark.createDataFrame(
                [(int(r["band"]), int(r["bh"])) for r in hot_rows],
                "band int, bh long",
            )
        )
        cold = buckets.join(hot, ["band", "bh"], "left_anti")
        sig_cols = [f"mh{i}" for i in range(num_hashes)]
        hot_members = buckets.join(hot, ["band", "bh"], "left_semi")
        hot_sig = sig.join(
            hot_members.select("doc_id").distinct(), "doc_id", "left_semi"
        )
        # identical-signature groups → star edges to the min-id rep
        reps = hot_sig.groupBy(*sig_cols).agg(F.min("doc_id").alias("_rep"))
        star = (
            hot_sig.join(reps, sig_cols)
            .filter(F.col("doc_id") != F.col("_rep"))
            .select(F.col("_rep").alias("ida"), F.col("doc_id").alias("idb"))
        )
        # reps pair clique-wise within their hot buckets; a bucket whose
        # rep count still exceeds the cap is dropped (documented guard)
        rep_b = hot_members.join(
            reps.select(F.col("_rep").alias("doc_id")), "doc_id", "left_semi"
        )
        rep_hot = (
            rep_b.groupBy("band", "bh")
            .agg(F.count(F.lit(1)).alias("_rsz"))
            .filter(F.col("_rsz") > max_bucket_size)
            .select("band", "bh")
        )
        rep_cold = rep_b.join(
            F.broadcast(rep_hot), ["band", "bh"], "left_anti"
        )
        cand = (
            _clique(cold)
            .unionByName(star)
            .unionByName(_clique(rep_cold))
            .distinct()
        )
    # Exact-Jaccard verification of CANDIDATES ONLY (never all pairs —
    # the candidate set is what makes LSH sub-quadratic at 10^12 docs).
    # Per-pair array_intersect over the per-doc shingle arrays: the two
    # joins move only |candidates| rows; no exploded-shingle shuffle.
    sa = docsh.select(
        F.col("doc_id").alias("ida"),
        F.col("shset").alias("sha"),
        F.size("shset").alias("size_a"),
    )
    sb = docsh.select(
        F.col("doc_id").alias("idb"),
        F.col("shset").alias("shb"),
        F.size("shset").alias("size_b"),
    )
    inter = F.size(F.array_intersect(F.col("sha"), F.col("shb")))
    return (
        cand.join(sa, "ida")
        .join(sb, "idb")
        .withColumn("_common", inter)
        .withColumn(
            "jaccard",
            F.col("_common")
            / (F.col("size_a") + F.col("size_b") - F.col("_common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("ida", "idb", "jaccard")
    )


def simhash(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 64,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """64-bit SimHash per doc from token xxhash64s, all column expressions.

    ``hash_mode="md5"`` derives a 60-bit token hash from the first 15
    hex digits of md5 instead — engine-portable (DuckDB computes the
    identical value via CAST('0x'||substr(md5(t),1,15) AS BIGINT)), so
    the full near-dup pipeline can carry a SQL oracle; pass bits<=60
    with it.

    For each bit b: sign = Σ_tokens (bit_b(hash) ? +1 : −1); simhash bit
    b = sign > 0 ⇔ ones_b · 2 > n_tokens.

    The per-bit one-counts are packed two to a long in 32-bit lanes, so
    the aggregation state is 33 longs per doc instead of 64 (smaller
    shuffle/agg buffers at scale) and the per-token expression is a
    shift/AND/OR chain with no per-bit conditional (measured ~20%
    faster than 64 sum-of-±1 columns at sf0.1).  A 32-bit lane bounds
    n_tokens per doc at 2³² — no realistic document overflows it
    (16-bit lanes would cap at 65 k tokens, which real docs exceed)."""
    if hash_mode == "md5":
        if bits > 60:
            raise ValueError("md5 hash_mode carries 60 hash bits")
        h = F.conv(F.substring(F.md5(F.col("t")), 1, 15), 16, 10).cast("long")
    elif hash_mode == "xxhash64":
        h = F.xxhash64("t")
    else:
        raise ValueError(f"unknown hash_mode {hash_mode!r}")
    tok = df.select(
        F.col(id_col).alias("doc_id"), F.explode(_tokens(text_col)).alias("t")
    ).withColumn("h", h)
    # The vote/signature chains are built as SQL STRINGS parsed once by
    # F.expr, not per-operator Column calls: each F.* call is a py4j
    # JVM roundtrip, and the ~100-node tree here cost ~1.3 s of DRIVER
    # time per query build (measured sf0.01) — string-build + one parse
    # is ~30× cheaper and yields the identical analyzed plan.
    aggs = [F.count("*").alias("n")]
    for g in range(bits // 2):
        b0, b1 = g * 2, g * 2 + 1
        aggs.append(
            F.expr(
                f"sum((shiftright(h, {b0}) & 1) | "
                f"shiftleft(shiftright(h, {b1}) & 1, 32))"
            ).alias(f"g{g}")
        )
    votes = tok.groupBy("doc_id").agg(*aggs)
    terms = []
    for b in range(bits):
        g, li = divmod(b, 2)
        ones = f"(shiftright(g{g}, {32 * li}) & 4294967295)"
        # shiftleft(1L,63) wraps to Long.MIN_VALUE (Java <<) — the sign
        # bit needs no special case under OR-accumulation
        terms.append(f"shiftleft(if({ones} * 2 > n, 1L, 0L), {b})")
    sig = F.expr(" | ".join(terms))
    return votes.select("doc_id", sig.alias("simhash"))


def simhash_near_dups(
    df: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 64,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Pairs with hamming(simhash_a, simhash_b) ≤ max_hamming.

    Pigeonhole bucket join: split the signature into (max_hamming+1)
    chunks; any pair within distance k agrees on ≥1 chunk → join per
    chunk, verify with bit_count(xor)."""
    chunks = max_hamming + 1
    width = bits // chunks
    sig = simhash(df, id_col, text_col, bits, hash_mode)
    chunk_cols = [
        F.struct(
            F.lit(c).alias("chunk"),
            F.shiftrightunsigned(F.col("simhash"), c * width)
            .bitwiseAND(F.lit((1 << width) - 1))
            .alias("key"),
        )
        for c in range(chunks)
    ]
    keyed = sig.select(
        "doc_id", "simhash", F.explode(F.array(*chunk_cols)).alias("c")
    ).select("doc_id", "simhash", F.col("c.chunk").alias("chunk"), F.col("c.key").alias("key"))
    a, b = keyed.alias("a"), keyed.alias("b")
    return (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("ida"),
            F.col("b.doc_id").alias("idb"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def _canon_edges(e: DataFrame) -> DataFrame:
    """Orient (u, v) with u > v, drop self-loops, dedupe."""
    return (
        e.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _large_star(e: DataFrame) -> DataFrame:
    """Large-star: every node connects its STRICTLY LARGER neighbors to
    the minimum of its closed neighborhood."""
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    m = sym.groupBy("u").agg(F.min("v").alias("mn"))
    m = m.select("u", F.least(F.col("mn"), F.col("u")).alias("m"))
    return (
        sym.join(m, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Small-star: every node connects its SMALLER-OR-EQUAL neighbors
    (and itself) to the minimum of that set."""
    o = _canon_edges(e)  # u > v
    m = o.groupBy("u").agg(F.min("v").alias("m"))  # min < u always
    return (
        o.join(m, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .union(m.select(F.col("u"), F.col("m").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def connected_components(
    edges: DataFrame,
    src: str = "ida",
    dst: str = "idb",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components by the alternating large-star/small-star
    algorithm (Kiveris et al., "Connected Components in MapReduce and
    Beyond", SoCC'14): converges in O(log n) rounds regardless of
    component diameter — the scale-correct choice over min-label
    propagation, whose round count grows with the LONGEST CHAIN of
    near-dup docs (web corpora have chains thousands long).

    Each round is two groupBy-min shuffles on node id.  The edge frame
    is localCheckpoint()ed every round: iterative self-referential
    plans otherwise grow lineage exponentially (at cluster scale use
    reliable checkpointing to the cluster store instead).  Convergence
    = small-star output equals its input (checksum + count compare,
    one tiny action per round).

    Returns (doc_id, rep) for every node that appears in ``edges`` —
    rep is the component's minimum id (roots map to themselves).
    """
    e = _canon_edges(
        edges.select(
            F.col(src).cast("long").alias("u"),
            F.col(dst).cast("long").alias("v"),
        )
    ).localCheckpoint()

    def _sig(df: DataFrame):
        row = df.agg(
            F.count("*").alias("c"),
            F.coalesce(
                # decimal(38,0) sum: long-sum overflows ANSI mode
                F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")),
                F.lit(0).cast("decimal(38,0)"),
            ).alias("h"),
        ).collect()[0]
        return (row["c"], row["h"])

    prev = _sig(e)
    for _ in range(max_iter):
        e = _small_star(_large_star(e)).localCheckpoint()
        cur = _sig(e)
        if cur == prev:
            break
        prev = cur
    # star forest: every edge is (member, root); roots self-map
    members = e.select(F.col("u").alias("doc_id"), F.col("v").alias("rep"))
    roots = e.select(F.col("v").alias("doc_id"), F.col("v").alias("rep"))
    return members.union(roots).distinct()


def dedup_clusters(
    pairs: DataFrame,
    src: str = "ida",
    dst: str = "idb",
) -> DataFrame:
    """Near-dup cluster assignment from a candidate pair list:
    connected components + per-cluster size.  (doc_id, rep,
    cluster_size), one extra broadcast-sized agg-join over the
    component labels."""
    cc = connected_components(pairs, src, dst)
    sizes = cc.groupBy("rep").agg(F.count("*").alias("cluster_size"))
    return cc.join(sizes, "rep").select("doc_id", "rep", "cluster_size")


def text_profile_signature(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    quant_rate: float = 0.01,
    min_token_len: int = 2,
) -> DataFrame:
    """TextProfileSignature (solr/update/processor/TextProfileSignature
    .java:67-147, copied there from Nutch): fuzzy dedup signature =
    md5 of a quantized token-frequency profile.

    Faithful steps: alnum-run tokens lowercased, kept only if length
    STRICTLY greater than minTokenLen; quant = round(maxFreq·quantRate)
    floored at 2 (1 when maxFreq == 1); counts rounded DOWN to a
    multiple of quant, tokens falling below quant discarded; profile
    lines "token cnt" sorted by count DESC joined with newline; md5.
    Documented divergence: the reference sorts ties in HashMap
    iteration order (JVM-nondeterministic); here ties break token ASC
    so the signature is engine-reproducible.

    All column expressions + two partial+final aggs keyed by doc —
    no Python in the loop, linear at any corpus size."""
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.expr(f"regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)")
        ).alias("tok"),
    ).filter(F.length("tok") > min_token_len)
    cnt = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("cnt"))
    mx = cnt.groupBy("doc_id").agg(F.max("cnt").alias("maxfreq"))
    qv = mx.select(
        "doc_id",
        F.when(
            F.round(F.col("maxfreq") * quant_rate) < 2,
            F.when(F.col("maxfreq") > 1, F.lit(2)).otherwise(F.lit(1)),
        )
        .otherwise(F.round(F.col("maxfreq") * quant_rate))
        .cast("long")
        .alias("quant"),
    )
    quantized = (
        cnt.join(qv, "doc_id")
        .withColumn(
            "qcnt", (F.floor(F.col("cnt") / F.col("quant")) * F.col("quant"))
        )
        .filter(F.col("qcnt") >= F.col("quant"))
    )
    prof = quantized.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct((-F.col("qcnt")).alias("neg"),
                                            F.col("tok")))
                ),
                lambda s: F.concat(s["tok"], F.lit(" "),
                                   (-s["neg"]).cast("string")),
            ),
            "\n",
        ).alias("profile")
    )
    base = df.select(F.col(id_col).alias("doc_id"))
    return base.join(prof, "doc_id", "left").select(
        "doc_id", F.md5(F.coalesce(F.col("profile"), F.lit(""))).alias("signature")
    )


def signature_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """SignatureUpdateProcessorFactory with overwriteDupes=true: the
    signature field becomes the uniqueness key — of each signature
    group only one doc survives.  (doc_id, signature, kept); the
    survivor is the minimum doc_id (the reference keeps the LAST
    update to arrive; in a batch pipeline arrival order is undefined,
    so the deterministic minimum is the batch-mode policy)."""
    sig = text_profile_signature(df, id_col, text_col)
    from pyspark.sql import Window

    w = Window.partitionBy("signature")
    return sig.select(
        "doc_id",
        "signature",
        (F.col("doc_id") == F.min("doc_id").over(w)).alias("kept"),
    )


def exact_substring_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
) -> DataFrame:
    """Exact repeated-substring removal (Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better"):
    token spans of length ≥ k that occur more than once in the corpus
    are removed everywhere EXCEPT their first occurrence (smallest
    (doc_id, pos) keeps it — the deterministic stand-in for the
    paper's suffix-array order).

    Fixed-length k-gram formulation: every duplicated ≥k-token span is
    a union of duplicated k-grams, so masking the token window of
    every non-keeper duplicated k-gram removes exactly the repeated
    regions at k-token resolution.

    Scale shape: one k-gram explode (k·tokens rows, narrow), one
    groupBy gram computing (count, keeper) — partial aggregation
    server-side, no driver state — one shuffle join back, one bounded
    k× position explode, one per-doc rebuild agg.  No Python, no
    self-join on documents; the gram table is the only large
    intermediate and it shrinks by the df>1 filter before the join.

    Returns (doc_id, text, removed) — text rebuilt from surviving
    tokens in position order, removed = masked token count.
    """
    toks = F.split(F.lower(F.trim(F.col(text_col))), " +")
    base = df.select(F.col(id_col).alias("doc_id"), toks.alias("_t"))
    idx = F.sequence(F.lit(1), F.size(F.col("_t")) - k + 1)
    grams = base.select(
        "doc_id",
        F.explode(
            F.when(
                F.size(F.col("_t")) >= k,
                F.transform(
                    idx,
                    lambda i: F.struct(
                        (i - 1).cast("long").alias("pos"),
                        F.concat_ws(
                            " ", F.slice(F.col("_t"), i, k)
                        ).alias("g"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<pos:long,g:string>>"))
        ).alias("pg"),
    ).select("doc_id", F.col("pg.pos").alias("pos"), F.col("pg.g").alias("g"))
    stats = grams.groupBy("g").agg(
        F.count("*").alias("n"),
        F.min(F.struct("doc_id", "pos")).alias("keeper"),
    )
    dup_occ = (
        grams.join(stats.filter(F.col("n") >= 2), "g")
        .filter(
            (F.col("doc_id") != F.col("keeper.doc_id"))
            | (F.col("pos") != F.col("keeper.pos"))
        )
        .select("doc_id", "pos")
    )
    masked = dup_occ.select(
        "doc_id",
        F.explode(F.sequence(F.col("pos"), F.col("pos") + k - 1)).alias("mp"),
    ).distinct()
    stream = base.select(
        "doc_id", F.posexplode(F.col("_t")).alias("p", "w")
    )
    kept = stream.join(
        masked,
        (stream.doc_id == masked.doc_id) & (stream.p == masked.mp),
        "left_anti",
    )
    rebuilt = kept.groupBy("doc_id").agg(
        F.concat_ws(
            " ", F.transform(F.array_sort(F.collect_list(F.struct("p", "w"))), lambda s: s.w)
        ).alias("text"),
        F.count("*").alias("n_kept"),
    )
    sizes = base.select("doc_id", F.size("_t").alias("n_toks"))
    return (
        sizes.join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("text"), F.lit("")).alias("text"),
            (F.col("n_toks") - F.coalesce(F.col("n_kept"), F.lit(0)))
            .cast("long")
            .alias("removed"),
        )
    )
