"""BrazilianStemmer vs the reference's COMPLETE golden set
(br/TestBrazilianAnalyzer.java check()/checkOne() pairs, reproduced at
fixtures/stemmer_goldens/br.tsv)."""

from pathlib import Path

import pytest

from lucene_solr_spark.analysis.brazilian import brazilian_stem

PAIRS = [
    tuple(line.split("\t"))
    for line in Path("fixtures/stemmer_goldens/br.tsv")
    .read_text(encoding="utf-8")
    .splitlines()
    if line and not line.startswith("#")
]


def test_complete_goldens_present():
    assert len(PAIRS) == 86


@pytest.mark.parametrize("raw,want", PAIRS)
def test_reference_goldens(raw, want):
    got = brazilian_stem(raw)
    if got is None:  # BrazilianStemFilter keeps the original term
        got = raw
    assert got == want


def test_not_indexable_and_unstemmable():
    # length <= 2 or >= 30 -> None (filter keeps original)
    assert brazilian_stem("ab") is None
    assert brazilian_stem("a" * 30) is None
    # non-letters -> cleaned term returned unstemmed
    assert brazilian_stem("r2d2") == "r2d2"


def test_chain_runs():
    import pandas as pd

    from lucene_solr_spark.analysis.more_analyzers import NAMED_ANALYZERS

    _, terms, _ = NAMED_ANALYZERS["brazilian"](
        pd.Series(["as quilométricas aborrecimentos"])
    )
    assert list(terms) == ["quilometr", "aborrec"]

    _, terms, _ = NAMED_ANALYZERS["serbian"](
        pd.Series(["Ђаче Уштеде đače"])
    )
    assert list(terms) == ["djace", "ustede", "djace"]
