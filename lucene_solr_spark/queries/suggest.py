"""Suggest / autocomplete over the term dictionary.

The reference's suggesters (lucene/suggest/ — e.g.
``AnalyzingInfixSuggester``, ``FreeTextSuggester``; wired up by Solr's
``SuggestComponent``, solr/core/src/java/org/apache/solr/handler/component/
SuggestComponent.java) rank dictionary entries for a prefix by a weight
(for ``DocumentDictionary`` the stored weight field; for
``HighFrequencyDictionary`` — solr spellcheck's default — the term's
docFreq).  Spark-first restatement: the term dictionary IS the
``term_stats`` DataFrame, so a suggestion lookup is a pushed-down
prefix filter + TakeOrderedAndProject — no FST needed; Parquet
dictionary/row-group pruning on the sorted term column plays the role
of the FST prefix seek at scale.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def suggest_prefix(term_stats: DataFrame, prefix: str, n: int = 10) -> DataFrame:
    """Top-n completions of ``prefix`` weighted by docFreq
    (HighFrequencyDictionary semantics), term-asc tie-break."""
    return (
        term_stats.filter(F.col("term").startswith(prefix))
        .select("term", F.col("df").alias("weight"))
        .orderBy(F.col("weight").desc(), F.col("term").asc())
        .limit(n)
    )


def suggest_popular_terms(term_stats: DataFrame, n: int = 10) -> DataFrame:
    """Global head of the dictionary by docFreq — the zero-prefix
    suggester / terms-component 'top terms' listing
    (solr TermsComponent.java)."""
    return (
        term_stats.select("term", F.col("df").alias("weight"))
        .orderBy(F.col("weight").desc(), F.col("term").asc())
        .limit(n)
    )


def suggest_analyzing(
    suggestions: DataFrame,
    query: str,
    n: int = 10,
    key_col: str = "key",
    weight_col: str = "weight",
) -> DataFrame:
    """AnalyzingSuggester (lucene/suggest/.../analyzing/
    AnalyzingSuggester.java): both the suggestion keys and the query run
    through the index analyzer, and matching is prefix-of-analyzed-form
    — 'The Ghost' suggests for query 'ghost' because the analyzed key
    drops the stopword.  The analyzed form is computed once per key in
    an Arrow batch kernel (the FST build analog); lookup is a
    pushed-down prefix filter + bounded top-n."""
    from lucene_solr_spark.analysis import analyze_text

    @F.pandas_udf("string")
    def analyzed(keys: pd.Series) -> pd.Series:
        return pd.Series(
            [" ".join(analyze_text(k or "")[0]) for k in keys],
            index=keys.index,
        )

    q_terms, _ = analyze_text(query)
    q_analyzed = " ".join(q_terms)
    with_key = suggestions.withColumn("_ak", analyzed(F.col(key_col)))
    return (
        with_key.filter(F.col("_ak").startswith(q_analyzed))
        .select(F.col(key_col).alias("key"), F.col(weight_col).alias("weight"))
        .orderBy(F.col("weight").desc(), F.col("key").asc())
        .limit(n)
    )


def suggest_infix(
    suggestions: DataFrame,
    query: str,
    n: int = 10,
    key_col: str = "key",
    weight_col: str = "weight",
) -> DataFrame:
    """AnalyzingInfixSuggester (lucene/suggest/.../analyzing/
    AnalyzingInfixSuggester.java): the query prefix may match ANY token
    of the analyzed key, not just the head — implemented as an
    any-token-startswith predicate over the analyzed token array (the
    reference indexes each key's tokens into a sidecar index; the
    Spark analog is the exploded-token semi-join, expressed here as an
    EXISTS over the token array so the key table is scanned once)."""
    import pandas as pd

    from lucene_solr_spark.analysis import analyze_text

    @F.pandas_udf("array<string>")
    def analyzed_tokens(keys: pd.Series) -> pd.Series:
        return pd.Series(
            [analyze_text(k or "")[0] for k in keys], index=keys.index
        )

    q_terms, _ = analyze_text(query)
    if not q_terms:
        return suggestions.sparkSession.createDataFrame(
            [], "key string, weight long"
        )
    last = q_terms[-1]
    full = q_terms[:-1]
    toks = analyzed_tokens(F.col(key_col))
    # every fully-typed query token must be present; the last (still
    # being typed) token prefix-matches any key token
    cond = F.exists(toks, lambda t: t.startswith(last))
    for ft in full:
        cond = cond & F.array_contains(toks, ft)
    return (
        suggestions.filter(cond)
        .select(F.col(key_col).alias("key"), F.col(weight_col).alias("weight"))
        .orderBy(F.col("weight").desc(), F.col("key").asc())
        .limit(n)
    )


def suggest_fuzzy(
    term_stats: DataFrame,
    query: str,
    n: int = 10,
    max_edits: int = 1,
    transpositions: bool = True,
) -> DataFrame:
    """FuzzySuggester (lucene/suggest/.../analyzing/FuzzySuggester.java):
    completions whose PREFIX is within ``max_edits`` of the typed query
    — 'serch' still suggests 'searching'.  Transpositions count as ONE
    edit by default (FuzzySuggester.DEFAULT_TRANSPOSITIONS=true, the
    OSA metric of its LevenshteinAutomata).  Dictionary cost is cut the
    same way as FuzzyQuery: the sargable classic-Levenshtein window
    prunes JVM-side (classic ≤ 2k bounds osa ≤ k), the exact OSA
    minimum over the prefix window runs as a vocabulary-bounded Arrow
    batch."""
    qlen = len(query)
    # a term is suggested iff SOME prefix of it is within max_edits of
    # the typed query; only prefix lengths within qlen±max_edits can
    # qualify (length difference lower-bounds edit distance — true for
    # classic AND OSA), so the true minimum is the least over that
    # window
    lens = [k for k in range(max(1, qlen - max_edits), qlen + max_edits + 1)]
    dists = [
        F.levenshtein(F.substring(F.col("term"), 1, k), F.lit(query))
        for k in lens
    ]
    dist = dists[0] if len(dists) == 1 else F.least(*dists)
    if transpositions:
        from lucene_solr_spark.queries.searcher import osa_distance

        def _osa_min(s):
            return s.map(
                lambda t: min(
                    osa_distance(t[:k], query) for k in lens
                )
            )

        osa_col = F.pandas_udf(_osa_min, "int")
        cand = term_stats.filter(dist <= 2 * max_edits).withColumn(
            "_dist", osa_col(F.col("term"))
        )
    else:
        cand = term_stats.withColumn("_dist", dist)
    return (
        cand.filter(F.col("_dist") <= max_edits)
        .select(
            "term",
            F.col("df").alias("weight"),
            F.col("_dist").alias("distance"),
        )
        .orderBy(
            F.col("distance").asc(), F.col("weight").desc(), F.col("term").asc()
        )
        .limit(n)
    )


def suggest_freetext(
    df: DataFrame,
    context: str,
    n: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """FreeTextSuggester (lucene/suggest/.../analyzing/FreeTextSuggester.java):
    an n-gram language model over the corpus — given the previous word,
    rank next-word completions by bigram frequency.  The reference
    builds the model into an FST; the Spark analog is a one-pass
    adjacent-pair aggregation (same separator discipline, lowercase, no
    stop removal — the suggester sees the raw stream)."""
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.lower(F.col(text_col)), " +")).alias(
            "pos", "term"
        ),
    )
    a = toks.select("doc_id", F.col("pos").alias("p"), F.col("term").alias("w1"))
    b = toks.select(
        "doc_id", (F.col("pos") - 1).alias("p"), F.col("term").alias("w2")
    )
    return (
        a.filter(F.col("w1") == context)
        .join(b, ["doc_id", "p"])
        .groupBy(F.col("w2").alias("term"))
        .agg(F.count("*").alias("weight"))
        .orderBy(F.col("weight").desc(), F.col("term").asc())
        .limit(n)
    )


def suggest_blended_infix(
    suggestions: DataFrame,
    query: str,
    n: int = 10,
    blender: str = "linear",
    exponent: float = 2.0,
    num_factor: int = 10,
    key_col: str = "key",
    weight_col: str = "weight",
) -> DataFrame:
    """BlendedInfixSuggester (lucene/suggest/.../analyzing/
    BlendedInfixSuggester.java): infix lookup re-weighted by WHERE the
    match sits in the key.  The position is the first (minimum)
    analyzed-stream position over all matched tokens — fully-typed
    query tokens plus prefix matches of the still-being-typed last
    token (createCoefficient:272-299; stop gaps preserved, so the
    position is the raw token index) — and the coefficient is
    POSITION_LINEAR ``1 − 0.10·position``, POSITION_RECIPROCAL
    ``1/(position+1)``, or POSITION_EXPONENTIAL_RECIPROCAL
    ``1/(position+1)^exponent`` (calculateCoefficient:307-327);
    ``score = (long)(weight · coefficient)`` (:228).  Blending happens
    over the top ``n·numFactor`` raw-weight candidates (:74,:113).
    """
    import pandas as pd

    from lucene_solr_spark.analysis import analyze_text

    @F.pandas_udf("array<struct<t: string, p: int>>")
    def analyzed_tp(keys: pd.Series) -> pd.Series:
        out = []
        for k in keys:
            terms, poss = analyze_text(k or "")
            out.append(
                [{"t": t, "p": int(p)} for t, p in zip(terms, poss)]
            )
        return pd.Series(out, index=keys.index)

    q_terms, _ = analyze_text(query)
    if not q_terms:
        return suggestions.sparkSession.createDataFrame(
            [], "key string, score long"
        )
    last = q_terms[-1]
    full = q_terms[:-1]
    tp = analyzed_tp(F.col(key_col))

    def is_match(e):
        m = e["t"].startswith(last)
        for ft in full:
            m = m | (e["t"] == ft)
        return m

    cond = F.exists(tp, lambda e: e["t"].startswith(last))
    for ft in full:
        cond = cond & F.exists(tp, lambda e, ft=ft: e["t"] == ft)
    pool = (
        suggestions.filter(cond)
        .orderBy(F.col(weight_col).desc(), F.col(key_col).asc())
        .limit(int(n) * int(num_factor))
        .withColumn("_tp", tp)
    )
    pos = F.array_min(
        F.transform(
            F.filter(F.col("_tp"), is_match), lambda e: e["p"]
        )
    ).cast("double")
    if blender == "linear":
        coef = F.lit(1.0) - F.lit(0.10) * pos
    elif blender == "reciprocal":
        coef = F.lit(1.0) / (pos + F.lit(1.0))
    elif blender == "exponential_reciprocal":
        coef = F.lit(1.0) / F.pow(pos + F.lit(1.0), F.lit(float(exponent)))
    else:
        raise ValueError(f"unknown blender {blender!r}")
    # Java (long)(weight * coefficient) truncates toward zero
    raw = F.col(weight_col).cast("double") * coef
    score = F.when(raw >= 0, F.floor(raw)).otherwise(-F.floor(-raw)).cast(
        "long"
    )
    return (
        pool.select(
            F.col(key_col).alias("key"), score.alias("score")
        )
        .orderBy(F.col("score").desc(), F.col("key").asc())
        .limit(int(n))
    )
