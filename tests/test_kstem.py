"""KStem vs the reference's COMPLETE kstemTestData.zip example set
(12,130 pairs, en/TestKStemmer.java testVocabulary), reproduced at
fixtures/snowball_vocab/kstem_examples.tsv.gz."""

import gzip
from pathlib import Path

from lucene_solr_spark.analysis.kstem import kstem


def _pairs():
    out = []
    with gzip.open(
        Path("fixtures/snowball_vocab/kstem_examples.tsv.gz"),
        "rt",
        encoding="utf-8",
    ) as f:
        for line in f:
            if line.startswith("#") or not line.strip():
                continue
            w, s = line.rstrip("\n").split("\t")
            out.append((w, s))
    return out


def test_complete_examples():
    pairs = _pairs()
    assert len(pairs) == 12130
    bad = [(w, want, kstem(w)) for w, want in pairs if kstem(w) != want]
    assert bad == [], f"{len(bad)} mismatches, first: {bad[:5]}"


def test_filter_semantics():
    """KStemFilter keeps the original when the stemmer declines
    (short, long, non-alpha) and conflates via the tables."""
    assert kstem("ab") == "ab"
    assert kstem("a" * 50) == "a" * 50
    assert kstem("r2d2") == "r2d2"
    assert kstem("italian") == "italy"       # countryNationality
    assert kstem("aging") == "age"           # directConflations
    assert kstem("aide") == "aide"           # exception word
    assert kstem("flying") == "flying"  # in the head-word dictionary
    assert kstem("tying") == "tie"
    assert kstem("amplification") == "amplify"


def test_chain_runs():
    import pandas as pd

    from lucene_solr_spark.analysis.more_analyzers import NAMED_ANALYZERS

    _, terms, _ = NAMED_ANALYZERS["kstem"](
        pd.Series(["the Italians were flying kites"])
    )
    assert list(terms) == ["italy", "were", "flying", "kite"]
