"""FreeTextSuggester — "stupid backoff" n-gram language-model
suggestions (predict / complete the next word).

Reference: lucene/suggest/src/java/org/apache/lucene/search/suggest/
analyzing/FreeTextSuggester.java:
- build (:246-366): ShingleFilter emits every 1..grams-gram of the
  analyzed text; each gram's weight is its total occurrence count;
  ``totTokens`` = Σ unigram counts.
- lookup (:423-689): try the highest-order model first — the query's
  last (g) tokens are the context (a trailing space "upgrades" the
  key so "foo " asks for the word AFTER foo, :471-497) — and complete
  the final fragment within that model only.  Each attempted level
  multiplies the backoff by ALPHA=0.4 (:128-133), a lower-order model
  may not re-suggest a last token a higher-order model already
  produced (:646-660), scores are ``backoff · count(gram) /
  count(context)`` (totTokens for the unigram model, :557), and the
  final ranking is (score DESC, key ASC) truncated to num (:672-686).

Spark-first restatement: the "FST of all models" is one counts frame
(n, context, last, gram, cnt) built by one explode+groupBy — partial
aggregation does the heavy lifting and the frame is
vocabulary-bounded, not corpus-bounded.  A lookup is per level one
sargable filter (context equality + last-fragment prefix) feeding a
``TakeOrderedAndProject`` of num rows, chained with a left-anti join
for the cross-model dedup — fully lazy, nothing corpus-sized ever
reaches the driver.

Divergence (documented): the reference scales scores by
Long.MAX_VALUE into a long (:664); we keep the raw double — a
monotone rescale, rank-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ALPHA = 0.4  # FreeTextSuggester.ALPHA (:133)


class FreeTextSuggester:
    """N-gram suggester over a corpus DataFrame."""

    def __init__(self, grams: int = 2) -> None:
        if grams < 1:
            raise ValueError("grams must be >= 1")
        self.grams = grams
        self.counts: DataFrame | None = None
        self.tot_tokens: int = 0

    # --------------------------------------------------------------- build
    def build(self, docs: DataFrame, text_col: str = "text") -> "FreeTextSuggester":
        toks = F.split(F.col(text_col), " +")
        parts = []
        for n in range(1, self.grams + 1):
            seq = F.when(
                F.size(toks) >= n,
                F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1)),
            ).otherwise(F.array().cast("array<int>"))
            # NB: the lambda must take exactly ONE arg — PySpark reads
            # a second parameter (even a default) as the index variable
            def _gram_at(width):
                return lambda i: F.array_join(F.slice(toks, i, width), " ")

            grams_col = F.transform(seq, _gram_at(n))
            parts.append(
                docs.select(
                    F.explode(grams_col).alias("gram"), F.lit(n).alias("n")
                )
            )
        exploded = parts[0]
        for p in parts[1:]:
            exploded = exploded.unionByName(p)
        counts = exploded.groupBy("n", "gram").agg(F.count("*").alias("cnt"))
        self.counts = counts.select(
            "n",
            "gram",
            "cnt",
            F.array_join(
                F.slice(
                    F.split(F.col("gram"), " "),
                    F.lit(1),
                    (F.col("n") - F.lit(1)).cast("int"),
                ),
                " ",
            ).alias("context"),
            F.substring_index(F.col("gram"), " ", -1).alias("last"),
        ).persist()
        self.tot_tokens = (
            self.counts.filter(F.col("n") == 1).agg(F.sum("cnt")).collect()[0][0]
            or 0
        )
        return self

    # -------------------------------------------------------------- lookup
    def lookup(self, key: str, num: int = 10) -> DataFrame:
        """DataFrame(key string, score double), the reference's final
        (score DESC, key ASC) order, at most ``num`` rows."""
        if self.counts is None:
            raise RuntimeError("build() first")
        tokens = key.lower().split()
        if not tokens:
            raise ValueError("no tokens produced from key")
        ended = key.endswith(" ")

        # lastTokens[g] = (context tokens, fragment) for the (g+1)-gram
        # model; trailing space upgrades every level (:483-497)
        levels: list[tuple[list[str], str] | None] = [None] * self.grams
        for g in range(self.grams):
            if ended:
                if g == 0:
                    continue  # no unigram predictions from "" (:519-523)
                if len(tokens) >= g:
                    levels[g] = (tokens[-g:], "")
            else:
                if len(tokens) >= g + 1:
                    levels[g] = (tokens[-(g + 1):-1] if g else [], tokens[-1])

        spark = self.counts.sparkSession
        out: DataFrame | None = None
        prior: DataFrame | None = None  # accepted last tokens so far
        backoff = 1.0
        for g in range(self.grams - 1, -1, -1):
            if levels[g] is None:
                continue  # not enough input — backoff does NOT decay
            ctx_tokens, frag = levels[g]
            ctx = " ".join(ctx_tokens)
            cand = self.counts.filter(
                (F.col("n") == g + 1) & (F.col("context") == ctx)
            )
            if frag:
                cand = cand.filter(F.col("last").startswith(frag))
            if prior is not None:
                cand = cand.join(
                    F.broadcast(prior), ["last"], "left_anti"
                )
            if g == 0:
                denom = F.lit(float(self.tot_tokens))
            else:
                ctx_cnt = self.counts.filter(
                    (F.col("n") == g) & (F.col("gram") == ctx)
                ).select(F.col("cnt").alias("_ctx_cnt"))
                cand = cand.crossJoin(F.broadcast(ctx_cnt))
                denom = F.col("_ctx_cnt").cast("double")
            level = (
                cand.orderBy(F.col("cnt").desc(), F.col("gram").asc())
                .limit(int(num))
                .select(
                    F.col("gram").alias("key"),
                    "last",
                    (F.lit(backoff) * F.col("cnt") / denom).alias("score"),
                )
            )
            out = level if out is None else out.unionByName(level)
            prior = (
                level.select("last")
                if prior is None
                else prior.unionByName(level.select("last"))
            )
            backoff *= ALPHA  # every ATTEMPTED level decays (:548,:669)
        if out is None:
            return spark.createDataFrame([], "key string, score double")
        return (
            out.select("key", "score")
            .orderBy(F.col("score").desc(), F.col("key").asc())
            .limit(int(num))
        )
