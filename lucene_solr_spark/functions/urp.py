"""UpdateRequestProcessor chain — ingest-side field mutations.

Reference: solr/core/src/java/org/apache/solr/update/processor/ —
the FieldMutatingUpdateProcessor family every ingest pipeline
composes in solrconfig.xml: CloneFieldUpdateProcessorFactory,
TrimFieldUpdateProcessorFactory, RegexReplaceProcessorFactory
(REPLACE_ALL, literal-replacement semantics of Matcher.replaceAll),
TruncateFieldUpdateProcessorFactory (maxLength prefix),
FieldLengthUpdateProcessorFactory (value → its length),
ConcatFieldUpdateProcessorFactory (multivalue → delimiter join),
CountFieldValuesUpdateProcessorFactory (multivalue → count),
FirstFieldValue / LastFieldValue / Min / Max (multivalue collapse),
UniqFieldsUpdateProcessorFactory (dedup, FIRST occurrence order),
RemoveBlankFieldUpdateProcessorFactory (drop ""), and
HTMLStripFieldUpdateProcessorFactory (reuses the analyzer chain's
HTML strip).

Spark-first restatement: a document is a row, a processor is a Column
transformation, and the CHAIN is function composition over one
projection — the whole ingest pipeline stays a single narrow map with
no shuffle, which is exactly what you want in front of a 10^12-row
index build.  Each processor mirrors its factory's documented
semantics on scalar (string) and array columns.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class URPChain:
    """Ordered list of (output_col, Column) mutations applied in one
    select — processRequest order (UpdateRequestProcessorChain.java)."""

    steps: list[tuple[str, Column]] = field(default_factory=list)

    # ------------------------------------------------------------ scalar
    def clone_field(self, src: str, dest: str) -> "URPChain":
        """CloneFieldUpdateProcessorFactory: copy src into dest."""
        self.steps.append((dest, F.col(src)))
        return self

    def trim(self, col: str) -> "URPChain":
        """TrimFieldUpdateProcessorFactory: String.trim per value."""
        self.steps.append((col, F.trim(F.col(col))))
        return self

    def regex_replace(self, col: str, pattern: str, replacement: str) -> "URPChain":
        """RegexReplaceProcessorFactory: replaceAll over the value
        (literalReplacement=true default — the replacement is literal,
        no group refs)."""
        # regexp_replace treats $N in the replacement as group refs;
        # escape to match the factory's literalReplacement=true default
        lit = replacement.replace("\\", "\\\\").replace("$", r"\$")
        self.steps.append(
            (col, F.regexp_replace(F.col(col), pattern, lit))
        )
        return self

    def truncate(self, col: str, max_length: int) -> "URPChain":
        """TruncateFieldUpdateProcessorFactory: maxLength prefix."""
        self.steps.append(
            (col, F.substring(F.col(col), 1, int(max_length)))
        )
        return self

    def field_length(self, src: str, dest: str | None = None) -> "URPChain":
        """FieldLengthUpdateProcessorFactory: value → CharSequence
        length."""
        self.steps.append(
            (dest or src, F.length(F.col(src)).cast("int"))
        )
        return self

    def html_strip(self, col: str) -> "URPChain":
        """HTMLStripFieldUpdateProcessorFactory — the analyzer chain's
        HTML strip as an ingest mutation."""
        from lucene_solr_spark.analysis.charfilters import html_strip_col

        self.steps.append((col, html_strip_col(F.col(col))))
        return self

    # -------------------------------------------------------- multivalued
    def concat(self, col: str, delimiter: str = ", ") -> "URPChain":
        """ConcatFieldUpdateProcessorFactory: join values."""
        self.steps.append((col, F.array_join(F.col(col), delimiter)))
        return self

    def count_values(self, src: str, dest: str | None = None) -> "URPChain":
        """CountFieldValuesUpdateProcessorFactory: value count."""
        self.steps.append((dest or src, F.size(F.col(src))))
        return self

    def first_value(self, col: str) -> "URPChain":
        # try_element_at: an empty multivalue yields NULL (ANSI
        # element_at would throw), matching "no value kept"
        self.steps.append((col, F.try_element_at(F.col(col), F.lit(1))))
        return self

    def last_value(self, col: str) -> "URPChain":
        self.steps.append((col, F.try_element_at(F.col(col), F.lit(-1))))
        return self

    def min_value(self, col: str) -> "URPChain":
        """MinFieldValueUpdateProcessorFactory: keep only the minimum
        (natural order)."""
        self.steps.append((col, F.array_min(F.col(col))))
        return self

    def max_value(self, col: str) -> "URPChain":
        self.steps.append((col, F.array_max(F.col(col))))
        return self

    def uniq_values(self, col: str) -> "URPChain":
        """UniqFieldsUpdateProcessorFactory: dedup preserving FIRST
        occurrence order (LinkedHashSet semantics)."""
        c = F.col(col)
        self.steps.append(
            (
                col,
                F.filter(
                    c,
                    lambda x, i: ~F.exists(
                        F.slice(c, 1, i), lambda y: y == x
                    ),
                ),
            )
        )
        return self

    def remove_blank(self, col: str) -> "URPChain":
        """RemoveBlankFieldUpdateProcessorFactory: drop empty-string
        values (scalar → NULL; the doc keeps other fields)."""
        self.steps.append(
            (col, F.when(F.col(col) != "", F.col(col)))
        )
        return self

    # --------------------------------------------------------------- run
    def apply(self, df: DataFrame) -> DataFrame:
        """Apply the chain in order — sequential withColumn composition
        collapses to ONE projection under Catalyst (verify: a single
        Project node over the scan)."""
        out = df
        for dest, col in self.steps:
            out = out.withColumn(dest, col)
        return out
