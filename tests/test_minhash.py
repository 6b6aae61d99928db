"""{!min_hash} QParser + export() stream tests.

Reference: solr/core/src/java/org/apache/solr/search/MinHashQParser.java,
lucene/analysis/common/.../minhash/MinHashFilter.java,
solr/handler/export/ExportWriter.java.
"""

from __future__ import annotations

import hashlib
import math
import re

import pytest

from lucene_solr_spark.queries.minhash import (
    MinHashQuery,
    minhash_match,
    minhash_sketch_table,
    query_sketch,
)


def _py_sketch(text: str, n: int = 3, buckets: int = 8) -> dict[int, int]:
    toks = re.split(" +", text.strip().lower()) if text.strip() else []
    out: dict[int, int] = {}
    for i in range(len(toks) - n + 1):
        s = " ".join(toks[i : i + n])
        h = int(hashlib.md5(s.encode()).hexdigest()[:14], 16)
        b = h % buckets
        if b not in out or h < out[b]:
            out[b] = h
    return out


def test_sketch_table_matches_pure_python(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "pack my box with five dozen liquor jugs"),
        (3, "ab"),  # < 3 tokens → empty sketch
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r.doc_id, r.bucket): r.mh
        for r in minhash_sketch_table(df).collect()
    }
    want = {}
    for doc_id, text in rows:
        for b, h in _py_sketch(text).items():
            want[(doc_id, b)] = h
    assert got == want


def test_query_sketch_matches_table(spark):
    text = "alpha beta gamma delta epsilon zeta eta"
    df = spark.createDataFrame([(7, text)], ["doc_id", "text"])
    table = {
        r.bucket: r.mh for r in minhash_sketch_table(df).collect()
    }
    assert query_sketch(text) == table


def test_self_match_scores_one(spark):
    rows = [
        (1, "spark window vector hash join agg sort scan"),
        (2, "completely different words in this unrelated document text"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = minhash_match(df, MinHashQuery(rows[0][1])).collect()
    by_id = {r.doc_id: r.score for r in out}
    assert by_id[1] == 1.0
    assert 2 not in by_id  # no shared trigrams → no sketch collision


def test_sim_floor_is_min_should_match(spark):
    base = "one two three four five six seven eight nine ten"
    # half-overlapping doc: shares the first 5 tokens only
    rows = [(1, base), (2, "one two three four five x y z w v")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    loose = {
        r.doc_id: r.score
        for r in minhash_match(df, MinHashQuery(base, sim=0.0)).collect()
    }
    assert loose[1] == 1.0
    if 2 in loose:  # partial match present at sim=0 ...
        qsize = len(query_sketch(base))
        need = loose[2] * qsize  # matched count
        # ... must be dropped once sim demands more than it matched
        strict_sim = (need + 0.5) / qsize
        strict = {
            r.doc_id: r.score
            for r in minhash_match(
                df, MinHashQuery(base, sim=strict_sim)
            ).collect()
        }
        assert 2 not in strict
        assert strict[1] == 1.0
    assert math.ceil(0.5 * 8) == 4  # sanity: sim→count uses ceil


def test_min_hash_qparser_dispatch(spark):
    from lucene_solr_spark.queries.local_params import SolrQueryDispatcher

    rows = [(1, "red green blue cyan magenta yellow")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    disp = SolrQueryDispatcher(None, df)
    out = disp.docs("{!min_hash field=text sim=0.5}" + rows[0][1]).collect()
    assert [(r.doc_id, r.score) for r in out] == [(1, 1.0)]


def test_empty_query_sketch_matches_nothing(spark):
    df = spark.createDataFrame([(1, "a b c d")], ["doc_id", "text"])
    assert minhash_match(df, MinHashQuery("xy")).count() == 0  # <3 tokens


def test_export_stream_full_sorted(spark):
    from lucene_solr_spark.streaming.expressions import StreamFactory

    df = spark.createDataFrame(
        [(3, "c", 1.0), (1, "a", 2.0), (2, "b", 3.0)], ["k", "s", "v"]
    )
    fac = StreamFactory({"t": df})
    out = fac.df('export(t, fl="k,v", sort="k asc")').collect()
    assert [r.k for r in out] == [1, 2, 3]
    assert out[0].asDict() == {"k": 1, "v": 2.0}


def test_export_stream_requires_fl_and_sort(spark):
    from lucene_solr_spark.streaming.expressions import StreamFactory

    df = spark.createDataFrame([(1,)], ["k"])
    fac = StreamFactory({"t": df})
    with pytest.raises(ValueError, match="fl= and sort="):
        fac.df('export(t, fl="k")')
    with pytest.raises(ValueError, match="fl= and sort="):
        fac.df('export(t, sort="k asc")')
