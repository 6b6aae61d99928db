"""Deterministic synthetic source-code corpus (the north-rule input shape).

Generates the input_hint table ``(repo, path, commit, lang, content)``
with a fixed seed, distributed via ``spark.range`` + ``mapInPandas`` so
the generator itself scales with executors (each partition derives its
rows purely from the row index — no driver-side data, no wall-clock).

Content design (FIXTURES.md §1): Zipf-skewed keywords (``import``,
``return``, … — exercises hot-term salting), camelCase / snake_case /
digit / dotted identifiers (UAX#29 word-break cases), string literals
with punctuation, 0.5%% of rows carrying a >255-char unbroken token
(max-token-length skip rule), and stopwords adjacent to phrase targets
(stop-gap position rule).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SEED = 42

_EXTS = {"py": "python", "java": "java", "go": "go", "js": "javascript", "rs": "rust"}
_EXT_LIST = list(_EXTS)

# Zipf-skewed keyword pool — first entries are the hot terms.
_KEYWORDS = [
    "import", "return", "def", "class", "if", "for", "while", "else",
    "try", "except", "raise", "break", "continue", "lambda", "yield",
    "static", "public", "private", "void", "interface", "struct",
    "func", "let", "const", "match", "impl", "trait", "async", "await",
]
_IDENTS = [
    "parse", "tokenize", "tokenizer", "index", "buffer", "load", "store",
    "merge", "flush", "segment", "query", "score", "rank", "search",
    "camelCaseValue", "snake_case_name", "foo.bar.baz", "readBuffer",
    "writeIndex", "deprecated", "legacy", "v2", "x86", "utf8",
    "MAX_VALUE", "config.yaml", "numpy", "head", "list", "tail",
]
_LITERALS = [
    '"hello, world!"', "'key=value; flag=true'", '"3.14 and 1,000 units"',
    '"// TODO: fix"', "'[a TO b]'",
]
_PHRASE_SNIPPETS = [
    "import numpy as np",
    "public static void main",
    "the head of a list",   # stopword gaps inside a phrase target
    "return the index of the buffer",
]


def _gen_partition(ids: np.ndarray) -> pd.DataFrame:
    rows = []
    for i in ids.tolist():
        rng = np.random.default_rng(SEED * 1_000_003 + i)
        repo = f"org{i % 7}/repo{i % 41}"
        ext = _EXT_LIST[i % len(_EXT_LIST)]
        path = f"src/dir{rng.integers(0, 13)}/file{i}.{ext}"
        commit = hashlib.sha1(f"{repo}|{path}|{SEED}".encode()).hexdigest()[:12]
        n_lines = int(rng.integers(3, 30))
        words: list[str] = []
        for _ in range(n_lines):
            # Zipf-ish keyword pick: earlier keywords exponentially likelier
            kw = _KEYWORDS[min(int(rng.exponential(3.0)), len(_KEYWORDS) - 1)]
            words.append(kw)
            for _ in range(int(rng.integers(1, 6))):
                words.append(str(rng.choice(_IDENTS)))
            if rng.random() < 0.15:
                words.append(str(rng.choice(_LITERALS)))
            if rng.random() < 0.2:
                words.append(str(rng.choice(_PHRASE_SNIPPETS)))
        if rng.random() < 0.005:
            words.append("Z" * 300)  # >255-char token: skipped with pos gap
        content = " ".join(words)
        rows.append((repo, path, commit, _EXTS[ext], content))
    return pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])


CORPUS_SCHEMA = "repo string, path string, commit string, lang string, content string"


def generate_corpus(spark: SparkSession, num_docs: int, partitions: int | None = None) -> DataFrame:
    """Distributed deterministic corpus of ``num_docs`` rows."""
    partitions = partitions or max(4, num_docs // 5000)
    base = spark.range(0, num_docs, 1, partitions)

    def gen(batches):
        for pdf in batches:
            yield _gen_partition(pdf["id"].to_numpy())

    return base.mapInPandas(gen, schema=CORPUS_SCHEMA)


def with_sha256(df: DataFrame) -> DataFrame:
    """Append the per-row content sha256 invariant column (JVM-side)."""
    return df.withColumn("content_sha256", F.sha2(F.col("content"), 256))
