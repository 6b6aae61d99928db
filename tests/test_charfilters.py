"""Char-filter stage goldens: HTML strip (incl. offset correction) and
ASCII folding — reference: charfilter/HTMLStripCharFilter.java (offset
contract via BaseCharFilter.correctOffset) and
miscellaneous/ASCIIFoldingFilter.java."""

from __future__ import annotations

from pyspark.sql import functions as F

from lucene_solr_spark.analysis.charfilters import (
    ascii_fold,
    ascii_fold_col,
    html_strip,
    html_strip_col,
    html_strip_with_offsets,
)


def test_html_strip_goldens():
    cases = [
        ("<b>bold</b> text", " bold  text"),
        ("a<br>b", "a b"),
        ("<!-- hidden words -->visible", " visible"),
        ("<script>var x = 1;</script>after", " after"),
        ("<style type='x'>p { color: red }</style>ok", " ok"),
        ("fish &amp; chips", "fish & chips"),
        ("&amp;lt; stays encoded once", "&lt; stays encoded once"),
        ("1 &lt; 2 &gt; 0", "1 < 2 > 0"),
        ("x&#169;y &#x41; z", "x y   z"),  # numeric refs → space
        ('<a href="u">link</a>', " link "),
        ("no markup at all", "no markup at all"),
    ]
    for raw, want in cases:
        assert html_strip(raw) == want, raw


def test_html_strip_offsets_point_into_original():
    raw = '<html><p class="c">hello</p> <b>world</b></html>'
    out, offs = html_strip_with_offsets(raw)
    assert len(out) == len(offs)
    h = out.index("hello")
    w = out.index("world")
    # each visible char maps to its ORIGINAL index in the markup
    assert raw[offs[h] : offs[h] + 5] == "hello"
    assert raw[offs[w] : offs[w] + 5] == "world"
    # replacement chars carry the replaced span's start
    assert raw[offs[0]] == "<"


def test_html_strip_offsets_entity():
    raw = "fish &amp; chips"
    out, offs = html_strip_with_offsets(raw)
    assert out == "fish & chips"
    amp = out.index("&")
    assert offs[amp] == raw.index("&amp;")
    c = out.index("chips")
    assert raw[offs[c] : offs[c] + 5] == "chips"


def test_ascii_fold_goldens():
    cases = [
        ("résumé", "resume"),
        ("naïve Ångström", "naive Angstrom"),
        ("straße", "strasse"),
        ("Æsir œuvre Ĳssel", "AEsir oeuvre IJssel"),
        ("þorn Þing ðe", "thorn THing de"),
        ("čeština łódź ñandú", "cestina lodz nandu"),
        ("plain ascii 123", "plain ascii 123"),
    ]
    for raw, want in cases:
        assert ascii_fold(raw) == want, raw


def test_column_filters_match_python_mirrors(spark):
    rows = [
        ('<p>Le résumé &amp; die straße</p><script>x=1</script>',),
        ("no markup, just naïve text &#65; here",),
        ("<b>Œuvre</b> <!-- c --> fin",),
    ]
    df = spark.createDataFrame(rows, ["t"])
    got = df.select(
        ascii_fold_col(html_strip_col(F.col("t"))).alias("o")
    ).collect()
    for (raw,), r in zip(rows, got):
        assert r["o"] == ascii_fold(html_strip(raw)), raw
