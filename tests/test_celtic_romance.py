"""Armenian / Basque / Catalan / Irish analyzer chains vs the
reference's complete analyzer-test goldens (TestArmenianAnalyzer,
TestBasqueAnalyzer, TestCatalanAnalyzer, TestIrishAnalyzer,
TestIrishLowerCaseFilter)."""

import pandas as pd

from lucene_solr_spark.analysis.armenian import armenian_stem
from lucene_solr_spark.analysis.basque import basque_stem
from lucene_solr_spark.analysis.catalan import catalan_stem
from lucene_solr_spark.analysis.irish import irish_lowercase, irish_stem
from lucene_solr_spark.analysis.more_analyzers import NAMED_ANALYZERS


def test_armenian_goldens():
    assert armenian_stem("արծիվ") == "արծ"
    assert armenian_stem("արծիվներ") == "արծ"


def test_basque_goldens():
    assert basque_stem("zaldi") == "zaldi"
    assert basque_stem("zaldiak") == "zaldi"
    assert basque_stem("mendiari") == "mendi"


def test_catalan_goldens():
    assert catalan_stem("llengües") == "llengu"
    assert catalan_stem("llengua") == "llengu"


def test_irish_goldens():
    assert irish_stem("siopadóireacht") == "siopadóir"
    assert irish_stem("síceapatacha") == "síceapaite"


def test_irish_lowercase_vectors():
    """TestIrishLowerCaseFilter: nAthair/tUISCE/hARD."""
    assert irish_lowercase("nAthair") == "n-athair"
    assert irish_lowercase("tUISCE") == "t-uisce"
    assert irish_lowercase("hARD") == "hard"


def test_irish_demutation():
    """initial_morph strips n-/t- and de-mutates bhf/gc/mb etc."""
    assert irish_stem("n-athair") == irish_stem("athair")
    assert irish_stem("bhfuinneog")[0] == "f"
    assert irish_stem("gcat") == "cat"


def test_chains_run_and_stop():
    # Armenian: 'է' is a stop word
    _, terms, _ = NAMED_ANALYZERS["armenian"](pd.Series(["է արծիվներ"]))
    assert list(terms) == ["արծ"]
    # Basque: 'izan' is a stop word
    _, terms, _ = NAMED_ANALYZERS["basque"](pd.Series(["izan zaldiak"]))
    assert list(terms) == ["zaldi"]
    # Catalan contractions golden (TestCatalanAnalyzer:47-49)
    _, terms, _ = NAMED_ANALYZERS["catalan"](
        pd.Series(["Diccionari de l'Institut d'Estudis Catalans"])
    )
    assert list(terms) == ["diccion", "inst", "estud", "catalan"]
    # Irish: 'le' stopped; b'fhearr elides to fhearr -> initial fh->f
    _, terms, _ = NAMED_ANALYZERS["irish"](
        pd.Series(["le b'fhearr m'athair nAthair"])
    )
    assert "athair" in list(terms)
    assert "le" not in list(terms)
