"""SegmentSearcher — the full query surface over the on-disk segmented
index (the SegmentReader/IndexSearcher split of the reference: a
searcher opens a committed index independent of the writer).

Key property: every term lookup filters the ENCODED block rows first —
the `term` predicate pushes down to the parquet scan (PushedFilters +
row-group stats + segment partition pruning) — and only surviving
blocks are FOR/VByte-decoded, inside one vectorized kernel.  A query
never decodes postings it does not touch, which is what makes the
on-disk index queryable at 10^12 docs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lucene_solr_spark.index.segments import SegmentedIndex
from lucene_solr_spark.queries.searcher import IndexSearcher

_DECODED_SCHEMA = (
    "doc_id long, term string, tf int, positions array<int>"
)


def _decode_batches(batches):
    from lucene_solr_spark.codecs.postings import (
        decode_block_positions,
        decode_posting_block,
    )

    for pdf in batches:
        out_doc, out_term, out_tf, out_pos = [], [], [], []
        for term, base, cnt, db, tb, pb in zip(
            pdf["term"], pdf["base_docid"], pdf["count"],
            pdf["docs_bin"], pdf["tfs_bin"], pdf["pos_bin"],
        ):
            d, t = decode_posting_block(base, cnt, db, tb)
            pos = decode_block_positions(t, pb)
            out_doc.append(d.astype(np.int64))
            out_term.extend([term] * d.size)
            out_tf.append(t.astype(np.int32))
            out_pos.extend(p.astype(np.int32) for p in pos)
        if not out_doc:
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype="int64"),
                    "term": pd.Series([], dtype="object"),
                    "tf": pd.Series([], dtype="int32"),
                    "positions": pd.Series([], dtype="object"),
                }
            )
            continue
        yield pd.DataFrame(
            {
                "doc_id": np.concatenate(out_doc),
                "term": np.asarray(out_term, dtype=object),
                "tf": np.concatenate(out_tf),
                "positions": out_pos,
            }
        )


class SegmentSearcher(IndexSearcher):
    """IndexSearcher over a SegmentedIndex directory."""

    def __init__(
        self,
        index: SegmentedIndex,
        k1: float = 1.2,
        b: float = 0.75,
        scoring: str = "lucene",
    ) -> None:
        self.index = index
        tables = index.to_tables()
        # norms are small (1 row/doc, 3 ints); cache them — every scored
        # query joins them (the .nvd file stays hot in the reference too)
        self._norms = tables.doc_norms.persist()
        super().__init__(tables, k1=k1, b=b, scoring=scoring, cache_postings=False)

    def _postings_for_terms(self, terms: list[str]) -> DataFrame:
        enc = self.index.postings().filter(F.col("term").isin(list(terms)))
        decoded = enc.mapInPandas(_decode_batches, schema=_DECODED_SCHEMA)
        return decoded.join(self._norms, "doc_id")
