"""Hindi / Persian / Indonesian analysis vs the reference goldens
(TestHindiStemmer, TestHindiNormalizer, TestPersianNormalizationFilter,
TestIndonesianStemmer — complete inline golden sets).
"""

from __future__ import annotations

import pandas as pd
import pytest

from lucene_solr_spark.analysis.indic import (
    hindi_normalize,
    hindi_stem,
    indonesian_stem,
    persian_normalize,
)

HINDI_STEM_GOLDENS = [
    ("लडका", "लडक"), ("लडके", "लडक"), ("लडकों", "लडक"),
    ("गुरु", "गुर"), ("गुरुओं", "गुर"),
    ("दोस्त", "दोस्त"), ("दोस्तों", "दोस्त"),
    ("लडकी", "लडक"), ("लडकियों", "लडक"),
    ("किताब", "किताब"), ("किताबें", "किताब"), ("किताबों", "किताब"),
    ("आध्यापीका", "आध्यापीक"), ("आध्यापीकाएं", "आध्यापीक"),
    ("आध्यापीकाओं", "आध्यापीक"),
    ("खाना", "खा"), ("खाता", "खा"), ("खाती", "खा"), ("खा", "खा"),
    ("कठिनाइयां", "कठिन"), ("कठिन", "कठिन"),
]


@pytest.mark.parametrize("word,stem", HINDI_STEM_GOLDENS)
def test_hindi_stemmer_goldens(word, stem):
    assert hindi_stem(word) == stem


HINDI_NORM_GOLDENS = [
    ("अँगरेज़ी", "अंगरेजि"), ("अँगरेजी", "अंगरेजि"),
    ("अँग्रेज़ी", "अंगरेजि"), ("अँग्रेजी", "अंगरेजि"),
    ("अंगरेज़ी", "अंगरेजि"), ("अंगरेजी", "अंगरेजि"),
    ("अंग्रेज़ी", "अंगरेजि"), ("अंग्रेजी", "अंगरेजि"),
    ("क़िताब", "किताब"), ("फ़र्ज़", "फरज"), ("क़र्ज़", "करज"),
    ("ऱऴख़ग़ड़ढ़य़", "रळखगडढय"),
    ("शार्‍मा", "शारमा"), ("शार्‌मा", "शारमा"),
    ("ॅॆॉॊऍऎऑऒॲ", "ेेोोएएओओअ"),
]


@pytest.mark.parametrize("inp,out", HINDI_NORM_GOLDENS)
def test_hindi_normalizer_goldens(inp, out):
    assert hindi_normalize(inp) == out


PERSIAN_NORM_GOLDENS = [
    ("های", "هاي"),       # farsi yeh
    ("هاے", "هاي"),       # yeh barree
    ("کشاندن", "كشاندن"),  # keheh
    ("كتابۀ", "كتابه"),    # heh + yeh above
    ("كتابهٔ", "كتابه"),   # heh + hamza above
    ("زادہ", "زاده"),      # heh goal
]


@pytest.mark.parametrize("inp,out", PERSIAN_NORM_GOLDENS)
def test_persian_normalizer_goldens(inp, out):
    assert persian_normalize(inp) == out


INDONESIAN_GOLDENS = [
    ("bukukah", "buku"), ("adalah", "ada"), ("bukupun", "buku"),
    ("bukuku", "buku"), ("bukumu", "buku"), ("bukunya", "buku"),
    ("mengukur", "ukur"), ("menyapu", "sapu"), ("menduga", "duga"),
    ("menuduh", "uduh"), ("membaca", "baca"), ("merusak", "rusak"),
    ("pengukur", "ukur"), ("penyapu", "sapu"), ("penduga", "duga"),
    ("pembaca", "baca"), ("diukur", "ukur"), ("tersapu", "sapu"),
    ("kekasih", "kasih"), ("berlari", "lari"), ("belajar", "ajar"),
    ("bekerja", "kerja"), ("perjelas", "jelas"), ("pelajar", "ajar"),
    ("pekerja", "kerja"), ("tarikkan", "tarik"), ("ambilkan", "ambil"),
    ("mengambilkan", "ambil"), ("makanan", "makan"), ("janjian", "janji"),
    ("perjanjian", "janji"), ("tandai", "tanda"), ("dapati", "dapat"),
    ("mendapati", "dapat"), ("pantai", "panta"),
    # IR examples
    ("penyalahgunaan", "salahguna"), ("menyalahgunakan", "salahguna"),
    ("disalahgunakan", "salahguna"),
    ("pertanggungjawaban", "tanggungjawab"),
    ("mempertanggungjawabkan", "tanggungjawab"),
    ("dipertanggungjawabkan", "tanggungjawab"),
    ("pelaksanaan", "laksana"), ("pelaksana", "laksana"),
    ("melaksanakan", "laksana"), ("dilaksanakan", "laksana"),
    ("melibatkan", "libat"), ("terlibat", "libat"),
    ("penculikan", "culik"), ("menculik", "culik"), ("diculik", "culik"),
    ("penculik", "culik"),
    ("perubahan", "ubah"), ("peledakan", "ledak"),
    ("penanganan", "tangan"), ("kepolisian", "polisi"),
    ("kenaikan", "naik"), ("bersenjata", "senjata"),
    ("penyelewengan", "seleweng"), ("kecelakaan", "celaka"),
]


@pytest.mark.parametrize("word,stem", INDONESIAN_GOLDENS)
def test_indonesian_stemmer_goldens(word, stem):
    assert indonesian_stem(word) == stem


INDONESIAN_INFLECTIONAL_GOLDENS = [
    ("bukunya", "buku"), ("bukukah", "buku"), ("bukunyakah", "buku"),
    ("dibukukannya", "dibukukan"),
]


@pytest.mark.parametrize("word,stem", INDONESIAN_INFLECTIONAL_GOLDENS)
def test_indonesian_inflectional_only(word, stem):
    assert indonesian_stem(word, derivational=False) == stem


def test_named_analyzer_chains():
    from lucene_solr_spark.analysis.more_analyzers import NAMED_ANALYZERS

    _di, t, _p = NAMED_ANALYZERS["hindi"](pd.Series(["लडके किताबें खाता"]))
    assert list(t) == ["लडक", "किताब", "खा"]
    _di, t, _p = NAMED_ANALYZERS["indonesian"](
        pd.Series(["bukunya mengukur adalah yang"])
    )
    # 'yang' is an id stop word; 'adalah' is TOO (stopped before the
    # stemmer can reduce it to 'ada')
    assert list(t) == ["buku", "ukur"]
    _di, t, _p = NAMED_ANALYZERS["persian"](pd.Series(["کشاندن"]))
    assert list(t) == ["كشاندن"]
