"""The 33 hard-coded English stopwords of Lucene's StandardAnalyzer.

Ref: lucene/core/src/java/org/apache/lucene/analysis/standard/
StandardAnalyzer.java:44-50 (ENGLISH_STOP_WORDS_SET).
"""

ENGLISH_STOP_WORDS: frozenset[str] = frozenset(
    [
        "a", "an", "and", "are", "as", "at", "be", "but", "by",
        "for", "if", "in", "into", "is", "it",
        "no", "not", "of", "on", "or", "such",
        "that", "the", "their", "then", "there", "these",
        "they", "this", "to", "was", "will", "with",
    ]
)

assert len(ENGLISH_STOP_WORDS) == 33
