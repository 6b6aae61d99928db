"""Lithuanian stemmer vs the reference's COMPLETE golden set
(lt/TestLithuanianStemming.java — all 372 checkOneTerm assertions,
reproduced at fixtures/stemmer_goldens/lt.tsv)."""

from pathlib import Path

import pytest

from lucene_solr_spark.analysis.lithuanian import lithuanian_stem

PAIRS = [
    tuple(line.split("\t"))
    for line in Path("fixtures/stemmer_goldens/lt.tsv")
    .read_text(encoding="utf-8")
    .splitlines()
    if line
]


def test_complete_goldens_present():
    assert len(PAIRS) == 372


@pytest.mark.parametrize("raw,want", PAIRS)
def test_reference_goldens(raw, want):
    assert lithuanian_stem(raw) == want


def test_initial_a_region_quirk():
    """Words starting with 'a' longer than 6 chars mark R1 from
    position 1 (LithuanianStemmer.java stem():598-619)."""
    # 'augintinis' starts with 'a', len > 6 -> R1 shifts right one
    assert lithuanian_stem("augintinis") != "augintinis"


def test_chain_runs():
    import pandas as pd

    from lucene_solr_spark.analysis.more_analyzers import NAMED_ANALYZERS

    _, terms, _ = NAMED_ANALYZERS["lithuanian"](
        pd.Series(["ir vaikas knygų knygoms"])
    )
    assert list(terms) == ["vaik", "knyg", "knyg"]  # 'ir' stopped
