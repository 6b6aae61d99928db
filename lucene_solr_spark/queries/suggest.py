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
