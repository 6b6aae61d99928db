"""Training-corpus quality operators beyond per-doc heuristics:
repetition metrics, benchmark-contamination checks, and sequence
packing.

- ``repetition_metrics``: the Gopher repetition filters (Rae et al.
  2021, "Scaling Language Models", Table A1): documents dominated by a
  single repeated n-gram or by many duplicated n-grams are boilerplate
  / spam and get filtered before training.  Token-fraction variants
  (documented divergence: Gopher measures fractions of CHARACTERS with
  overlap-deduped spans; the token-count fraction is order-identical
  on the filter decision and exactly reproducible cross-engine):
  top_{n}gram_frac = n·(count of most frequent n-gram)/total_tokens,
  dup_{n}gram_frac = n·Σ_{grams seen ≥2×} count / total_tokens.

- ``contamination_check``: n-gram collision against a benchmark table
  (the GPT-3/PaLM decontamination step): a training doc is
  contaminated if it shares ≥ min_hits word n-grams with any benchmark
  doc.  Benchmark shingles are a broadcast-sized side (benchmarks are
  KBs, corpora are TBs) — the check is one broadcast semi-style join,
  never a corpus self-join.

- ``sequence_packing``: greedy sequential packing of docs into
  fixed-token training sequences (the streaming packer every training
  pipeline runs): within each group, walking docs in id order, a doc
  starts a new bin when the running token total would exceed capacity
  — expressed as ONE window cumulative sum, no Python.  Oversized
  single docs get their own bin (truncation is the trainer's job).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _ngram_counts(df: DataFrame, id_col: str, text_col: str, n: int):
    toks = F.split(F.lower(F.trim(F.col(text_col))), " +")
    d = df.select(F.col(id_col).alias("doc_id"), toks.alias("_toks"))
    idx = F.sequence(F.lit(1), F.size(F.col("_toks")) - n + 1)
    grams = F.when(
        F.size(F.col("_toks")) >= n,
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(F.col("_toks"), i, n))),
    ).otherwise(F.array().cast("array<string>"))
    return (
        d.select("doc_id", F.explode(grams).alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count("*").alias("c"))
    )


def repetition_metrics(
    df: DataFrame,
    ns: "tuple[int, ...]" = (2, 3),
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-doc repetition fractions for each n in ``ns``:
    ``top_{n}gram_frac`` and ``dup_{n}gram_frac`` (see module doc).
    One explode + two-level partial+final agg per n, then narrow
    joins on doc_id — each n-gram pass is linear in corpus size."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), " +")
    out = df.select(
        F.col(id_col).alias("doc_id"), F.size(toks).alias("total_tokens")
    )
    for n in ns:
        gc = _ngram_counts(df, id_col, text_col, n)
        agg = gc.groupBy("doc_id").agg(
            F.max("c").alias("_maxc"),
            F.sum(F.when(F.col("c") >= 2, F.col("c")).otherwise(0)).alias(
                "_dupc"
            ),
        )
        out = (
            out.join(agg, "doc_id", "left")
            .withColumn(
                f"top_{n}gram_frac",
                F.round(
                    F.coalesce(F.col("_maxc"), F.lit(0))
                    * n
                    / F.greatest(F.col("total_tokens"), F.lit(1)),
                    4,
                ),
            )
            .withColumn(
                f"dup_{n}gram_frac",
                F.round(
                    F.coalesce(F.col("_dupc"), F.lit(0))
                    * n
                    / F.greatest(F.col("total_tokens"), F.lit(1)),
                    4,
                ),
            )
            .drop("_maxc", "_dupc")
        )
    return out


def repetition_filter(
    df: DataFrame,
    max_top_2gram: float = 0.20,
    max_dup_3gram: float = 0.30,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Gopher-style keep/drop decision from the repetition metrics
    (thresholds are the Gopher Table A1 shape: top-2gram ≤ 0.20,
    dup-3gram chains ≤ 0.30)."""
    m = repetition_metrics(df, ns=(2, 3), id_col=id_col, text_col=text_col)
    return m.withColumn(
        "keep",
        (F.col("top_2gram_frac") <= max_top_2gram)
        & (F.col("dup_3gram_frac") <= max_dup_3gram),
    )


def contamination_check(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    min_hits: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination: (doc_id, hit_grams, contaminated).
    ``hit_grams`` counts DISTINCT corpus-doc n-grams that appear in any
    benchmark doc.  The benchmark shingle set is broadcast — the scan
    of the big corpus never shuffles on content."""
    cg = _ngram_counts(corpus, id_col, text_col, n).select("doc_id", "g")
    bg = _ngram_counts(benchmark, id_col, text_col, n).select("g").distinct()
    hits = (
        cg.join(F.broadcast(bg), "g")
        .groupBy("doc_id")
        .agg(F.countDistinct("g").alias("hit_grams"))
    )
    base = corpus.select(F.col(id_col).alias("doc_id"))
    return base.join(hits, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("hit_grams"), F.lit(0)).alias("hit_grams"),
        (F.coalesce(F.col("hit_grams"), F.lit(0)) >= min_hits).alias(
            "contaminated"
        ),
    )


def sequence_packing(
    df: DataFrame,
    capacity: int = 2048,
    group_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Concat-and-chunk packing (the GPT-style pretraining packer:
    concatenate the group's token stream in doc-id order, cut every
    ``capacity`` tokens): a doc's bin is the chunk holding its FIRST
    token — bin = floor(cumsum_before(tokens)/capacity) over CAPPED
    token counts (min(tokens, capacity), so an oversized doc cannot
    skip bins).  Deterministic, NO driver state — one window cumsum
    per group; docs may straddle a cut, which is exactly what the
    concatenating packer does.

    At cluster scale the window partitions by group (languages/shards
    = thousands of partitions); for a single giant group, pre-split by
    a coarse doc_id range first — the bin ids stay deterministic."""
    toks = F.size(F.split(F.lower(F.trim(F.col(text_col))), " +"))
    d = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(group_col).alias("grp"),
        toks.alias("tokens"),
    ).withColumn("capped", F.least(F.col("tokens"), F.lit(capacity)))
    w = (
        Window.partitionBy("grp")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        d.withColumn(
            "bin",
            F.floor(
                F.coalesce(F.sum("capped").over(w), F.lit(0)) / capacity
            ).cast("long"),
        )
        .select("doc_id", F.col("grp").alias(group_col), "tokens", "bin")
    )


def lm_perplexity(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.4,
) -> DataFrame:
    """CCNet-style language-model quality scoring (Wenzek et al. 2020,
    "CCNet: Extracting High Quality Monolingual Datasets"): score every
    document by the average per-token log-probability under an n-gram
    LM trained on the corpus itself, then keep the low-perplexity
    head.  The LM here is a bigram model with stupid backoff (Brants et
    al. 2007): logp(w|v) = ln(c(vw)/c(v)) when the bigram was seen,
    else ln(alpha · c(w)/N).

    Scale shape: the model IS two aggregation frames — unigram counts
    (vocabulary-sized) and bigram counts (bigram-vocabulary-sized) —
    broadcast-joined back onto the exploded token stream; one window
    (lag over doc positions) forms the bigrams, one groupBy averages.
    No Python, no driver-side model object; 100 TB just makes the two
    count frames taller, not the plan different.

    Returns (doc_id, n_scored, avg_logprob, ppl) — ppl = exp(−avg);
    the first token of each doc is scored by the backoff path (no
    left context), matching the oracle exactly.
    """
    toks = F.split(F.lower(F.trim(F.col(text_col))), " +")
    base = df.select(F.col(id_col).alias("doc_id"), toks.alias("_t"))
    stream = base.select(
        "doc_id", F.posexplode(F.col("_t")).alias("pos", "w")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    pairs = stream.withColumn("v", F.lag("w").over(w))
    uni = stream.groupBy("w").agg(F.count("*").alias("cw"))
    total = stream.count()
    big = (
        pairs.filter(F.col("v").isNotNull())
        .groupBy("v", "w")
        .agg(F.count("*").alias("cvw"))
    )
    ctx = uni.select(F.col("w").alias("v"), F.col("cw").alias("cv"))
    # unigram/context tables broadcast (vocabulary-bounded); the
    # BIGRAM table is NOT broadcast — at 100 TB it is billions of rows,
    # so it joins by shuffle on (v, w), co-partitioned with the token
    # stream it annotates
    scored = (
        pairs.join(F.broadcast(uni), "w")
        .join(big, ["v", "w"], "left")
        .join(F.broadcast(ctx), "v", "left")
        .withColumn(
            "logp",
            F.when(
                F.col("cvw").isNotNull(),
                F.log(F.col("cvw").cast("double") / F.col("cv")),
            ).otherwise(
                F.log(
                    F.lit(float(alpha))
                    * F.col("cw").cast("double")
                    / F.lit(float(total))
                )
            ),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_scored"),
            F.avg("logp").alias("avg_logprob"),
        )
        .withColumn("ppl", F.exp(-F.col("avg_logprob")))
    )
