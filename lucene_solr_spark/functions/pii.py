"""Training-data hygiene operators: PII redaction, C4-style page
cleaning, deterministic dataset splits.

Beyond the reference's surface (it predates LLM corpus prep) — the
semantics follow the published pipelines:

- PII masking: the regex families every public corpus pipeline scrubs
  (emails, phone numbers, IPv4 addresses, US-SSN shapes) replaced with
  stable mask tokens, as in Dolma (Soldaini et al. 2024, §2.3) and the
  BigScience ROOTS pipeline (Laurençon et al. 2022).  Pure
  ``regexp_replace`` / ``regexp_count`` column expressions — the whole
  scrub is one whole-stage-codegen projection over 100 TB, no Python.
- C4 cleaning (Raffel et al. 2020, §2.2): line-level — keep lines that
  end in terminal punctuation, have ≥ ``min_line_words`` words, and do
  not mention javascript; page-level — drop pages with fewer than
  ``min_lines`` retained lines, containing ``lorem ipsum``, or
  containing ``{``.  Expressed with split/filter/array_join
  higher-order functions (no UDF, no shuffle: a pure scan-side map).
- Deterministic split: md5-derived bucket (engine-reproducible, unlike
  engine-private hash functions) → train/val/test assignment that any
  system can recompute from the row alone — resumable and join-free at
  any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (name, pattern, mask) — RE2/Java-portable syntax only, so Spark,
# DuckDB and any downstream engine agree byte-for-byte
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "|||EMAIL|||"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "|||SSN|||"),
    ("phone", r"\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b", "|||PHONE|||"),
    (
        "ipv4",
        r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
        "|||IP|||",
    ),
]


def pii_redact(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Mask PII spans and count them per family.

    Order matters and is fixed: email → ssn → phone → ipv4 (an SSN
    shape inside an already-masked email can't double-count; the
    counts are measured on the text each pattern actually sees, same
    as a sequential scrubber applies them)."""
    out = df
    col = F.col(text_col)
    for name, pat, mask in PII_PATTERNS:
        out = out.withColumn(f"n_{name}", F.regexp_count(col, F.lit(pat)))
        out = out.withColumn(text_col, F.regexp_replace(col, pat, mask))
    return out


_TERMINAL = r'[.!?"]$'


def _kept_lines(col: Column, min_line_words: int) -> Column:
    lines = F.split(col, "\n")
    return F.filter(
        lines,
        lambda ln: ln.rlike(_TERMINAL)
        & (F.size(F.split(F.trim(ln), " +")) >= min_line_words)
        & ~F.lower(ln).contains("javascript"),
    )


def c4_clean(
    df: DataFrame,
    text_col: str = "text",
    min_line_words: int = 5,
    min_lines: int = 3,
) -> DataFrame:
    """C4 page cleaning (Raffel et al. 2020 §2.2).  Returns surviving
    pages with ``text`` rebuilt from the retained lines."""
    col = F.col(text_col)
    kept = _kept_lines(col, min_line_words)
    return (
        df.withColumn("_kept", kept)
        .filter(
            (F.size(F.col("_kept")) >= min_lines)
            & ~F.lower(col).contains("lorem ipsum")
            & ~col.contains("{")
        )
        .withColumn(text_col, F.array_join(F.col("_kept"), "\n"))
        .drop("_kept")
    )


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    val_pct: int = 10,
    test_pct: int = 10,
) -> DataFrame:
    """Deterministic train/val/test assignment from an md5-derived
    bucket in [0, 100): test gets the top ``test_pct`` buckets, val the
    next ``val_pct``, train the rest.  A pure function of the id — any
    engine (and any later rerun) reproduces the identical split with no
    stored assignment table."""
    bucket = (
        F.conv(
            F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
        ).cast("long")
        % 100
    )
    split = (
        F.when(bucket >= 100 - test_pct, F.lit("test"))
        .when(bucket >= 100 - test_pct - val_pct, F.lit("val"))
        .otherwise(F.lit("train"))
    )
    return df.withColumn("bucket", bucket.cast("int")).withColumn(
        "split", split
    )


def weighted_sample(
    df: DataFrame,
    rates: dict,
    group_col: str = "lang",
    id_col: str = "doc_id",
    default_rate: float = 1.0,
    salt: str = "mix",
) -> DataFrame:
    """Deterministic per-domain mixture sampling (the data-mixing step
    of every pretraining pipeline — e.g. The Pile / Dolma source
    weights): keep a row iff its md5-derived uniform in [0,1) is below
    its group's rate.  A pure function of (id, salt), so the sample is
    reproducible, composable with resume/retry, and needs no global
    coordination — rates are a broadcast-sized map applied scan-side.

    ``salt`` decouples independent sampling decisions (two samplers
    with different salts draw independent uniforms from the same id).
    """
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt))),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        / float(16**8)
    )
    rate = F.lit(float(default_rate))
    for k, v in sorted(rates.items()):
        rate = F.when(F.col(group_col) == k, F.lit(float(v))).otherwise(rate)
    return df.withColumn("_u", u).filter(F.col("_u") < rate).drop("_u")


def leakage_safe_split(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    val_pct: int = 10,
    test_pct: int = 10,
) -> DataFrame:
    """Near-dup-aware train/val/test split: bucket by the near-dup
    CLUSTER representative instead of the row id, so every member of a
    connected near-duplicate component lands in the SAME split — the
    published decontamination discipline (a paraphrase of a test doc
    must not sit in train).  ``pairs`` is any candidate near-dup pair
    list (ida, idb), e.g. ngram_jaccard_pairs / minhash_lsh_pairs;
    components come from the alternating large-star/small-star CC
    (O(log n) rounds at any chain length).  Docs in no pair hash on
    their own id — identical to ``hash_split`` for them.  The
    assignment stays a pure function of (data, rule): any engine or
    rerun reproduces it with no stored split table.

    When ``pairs`` comes from ``minhash_lsh_pairs`` with its hot-bucket
    guard engaged, identical-signature duplicates are still guaranteed
    to share a component (the guard's star edges are unconditional),
    but rep-to-rep edges dropped in over-cap buckets can split NEAR
    duplicates across components — see the guard's guarantee table in
    ``minhash_lsh_pairs``'s docstring for the exact bound.
    """
    from lucene_solr_spark.functions.dedup import connected_components

    cc = connected_components(pairs)
    keyed = (
        df.select(F.col(id_col))
        .join(cc.select(F.col("doc_id").alias(id_col), "rep"), id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("rep"), F.col(id_col)).alias("group_key"),
        )
    )
    bucket = (
        F.conv(
            F.substring(F.md5(F.col("group_key").cast("string")), 1, 8), 16, 10
        ).cast("long")
        % 100
    )
    split = (
        F.when(bucket >= 100 - test_pct, F.lit("test"))
        .when(bucket >= 100 - test_pct - val_pct, F.lit("val"))
        .otherwise(F.lit("train"))
    )
    return keyed.withColumn("bucket", bucket.cast("int")).withColumn(
        "split", split
    )


def temperature_mixture(
    df: DataFrame,
    group_col: str = "source",
    temperature: float = 2.0,
    id_col: str = "doc_id",
    salt: str = "tmix",
) -> DataFrame:
    """Temperature-based mixture rebalancing (the multilingual-XLM /
    pretraining recipe: sampling share q_g ∝ p_g^(1/T); T>1 flattens
    the distribution, upweighting tail domains): per-doc REPEAT COUNT
    = ⌊r_g⌋ plus one more iff the
    doc's md5-uniform falls below frac(r_g) — deterministic fractional
    upsampling, normalized so the smallest factor is exactly 1 (tail
    groups are never downsampled by this op; compose weighted_sample
    for that).

    Returns (id_col, group_col, rate, repeats).  Scale shape: one
    broadcast-sized group-stats frame joined scan-side; the fractional
    draw is integer md5 arithmetic (bucket < ⌊frac·2^32⌋ — no float
    comparison at the boundary, so any engine reproduces the identical
    expansion).

    NB: the default T=2 keeps q_g ∝ √p_g in +,*,/,sqrt arithmetic
    only — all IEEE-correctly-rounded, identical across engines.
    Arbitrary T goes through pow(), whose last-ulp behavior is
    library-specific; the correctness gate pins T=2.
    """
    # r'_g ∝ q_g/p_g with q ∝ p^(1/T); min-normalizing cancels every
    # cross-group float SUM (whose reduction order is engine-defined):
    # r_g = (n_max / n_g)^(1 − 1/T) — sqrt/div over exact long counts,
    # bit-identical in any engine
    stats = df.groupBy(group_col).agg(F.count("*").alias("_n"))
    nmax = stats.agg(F.max("_n").alias("_nmax"))
    ratio = F.col("_nmax").cast("double") / F.col("_n").cast("double")
    if temperature == 2.0:
        rate = F.sqrt(ratio)
    else:
        rate = F.pow(ratio, 1.0 - 1.0 / temperature)
    rates = (
        stats.crossJoin(F.broadcast(nmax))
        .withColumn("rate", rate)
        .select(group_col, "rate")
    )
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt))), 1, 8
            ),
            16,
            10,
        ).cast("long")
    )
    frac_scaled = (
        ((F.col("rate") - F.floor(F.col("rate"))) * F.lit(float(16**8)))
        .cast("long")
    )
    return (
        df.select(F.col(id_col), F.col(group_col))
        .join(F.broadcast(rates), group_col)
        .select(
            F.col(id_col),
            F.col(group_col),
            F.col("rate"),
            (
                F.floor(F.col("rate"))
                + F.when(bucket < frac_scaled, F.lit(1)).otherwise(F.lit(0))
            ).cast("int").alias("repeats"),
        )
    )
