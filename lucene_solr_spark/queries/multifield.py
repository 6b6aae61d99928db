"""Multi-field search: per-field indexes + one dispatching searcher.

The reference scopes every term to a field (index/Term.java: (field,
text)); Solr's schema declares tokenized text fields and atomic string
fields side by side (solr/core/.../schema/IndexSchema.java,
document/StringField.java).  Spark-first restatement: each field is its
own set of index tables (postings/term_stats/doc_norms with field-local
collection statistics — norms and avgdl ARE per-field in Lucene), and
``MultiFieldSearcher`` dispatches ``FieldQuery(field, sub)`` subtrees to
the right per-field searcher while boolean/dismax combination stays in
the shared DataFrame algebra (docIDs are global, so cross-field
conjunction is just a docID join).

Cross-field dismax (the Solr dismax/edismax ``qf`` idiom) falls out:
``DisjunctionMaxQuery((FieldQuery(f1, q), FieldQuery(f2, q)), tie)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from lucene_solr_spark.index.builder import IndexTables
from lucene_solr_spark.queries.query import FieldQuery, Query
from lucene_solr_spark.queries.searcher import IndexSearcher
from lucene_solr_spark.queries.rewriter import rewrite


class MultiFieldSearcher(IndexSearcher):
    """IndexSearcher over a default field plus named secondary fields."""

    def __init__(
        self,
        tables_by_field: dict[str, IndexTables],
        default_field: str,
        k1: float = 1.2,
        b: float = 0.75,
        scoring: str = "lucene",
    ) -> None:
        if default_field not in tables_by_field:
            raise ValueError(f"default field {default_field!r} not in tables")
        super().__init__(
            tables_by_field[default_field], k1=k1, b=b, scoring=scoring
        )
        self.default_field = default_field
        self._fields: dict[str, IndexSearcher] = {default_field: self}
        for name, t in tables_by_field.items():
            if name != default_field:
                self._fields[name] = IndexSearcher(
                    t, k1=k1, b=b, scoring=scoring
                )

    def field_searcher(self, field: str) -> IndexSearcher:
        try:
            return self._fields[field]
        except KeyError:
            raise KeyError(
                f"unknown field {field!r}; known: {sorted(self._fields)}"
            ) from None

    # dispatch FieldQuery subtrees; everything else inherits
    def _exec(self, q: Query, boost: float) -> DataFrame:
        if isinstance(q, FieldQuery):
            sub = self.field_searcher(q.field)
            return sub._exec(rewrite(q.query), boost)
        return super()._exec(q, boost)

    def _match(self, q: Query) -> DataFrame:
        if isinstance(q, FieldQuery):
            sub = self.field_searcher(q.field)
            return sub._match(rewrite(q.query))
        return super()._match(q)

    def _cost(self, q: Query) -> int:
        if isinstance(q, FieldQuery):
            return self.field_searcher(q.field)._cost(q.query)
        return super()._cost(q)
