"""Payload-carrying postings + PayloadScoreQuery.

Refs: lucene/analysis/common/.../payloads/DelimitedPayloadTokenFilter.java
(token text 'term|payload' splits into a term plus a per-position
payload), lucene/queries/.../payloads/PayloadScoreQuery.java and
PayloadFunction.java (min/max/sum/average over the matched positions'
payloads).

Spark-first: payloads are one more parallel array column on the
postings table — (doc_id, term, tf, positions, payloads) — built with
pure column expressions (posexplode → delimiter split → sorted
struct-collect), so the payload path shares the postings layout and
pushdown story of the core index.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .query import Query

PAYLOAD_FUNCS = ("sum", "avg", "max", "min")


def payload_postings(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    delimiter: str = "|",
) -> DataFrame:
    """corpus(id, 'term|payload term|payload ...') → payload postings.

    Tokens without a delimiter get payload 1.0 (the reference's
    default encoder behavior for absent payloads is query-defined; 1.0
    keeps score functions total).  Position numbering counts all
    tokens.  Deterministic: positions/payloads are sorted by position
    before assembly (collect_list alone is partition-order dependent).
    """
    d = F.lit(delimiter)
    tok = (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(F.split(F.col(text_col), " +")).alias("pos", "raw"),
        )
        .select(
            "doc_id",
            "pos",
            F.split(F.col("raw"), rf"\{delimiter}")[0].alias("term"),
            F.coalesce(
                # F.get, not [1]: ANSI mode raises on missing index for
                # tokens without a delimiter
                F.get(F.split(F.col("raw"), rf"\{delimiter}"), 1).cast(
                    "double"
                ),
                F.lit(1.0),
            ).alias("payload"),
        )
        .filter(F.col("term") != "")
    )
    return (
        tok.groupBy("doc_id", "term")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("pos", "payload"))
            ).alias("_pp")
        )
        .select(
            "doc_id",
            "term",
            F.size(F.col("_pp")).cast("int").alias("tf"),
            F.transform(F.col("_pp"), lambda s: s["pos"]).alias("positions"),
            F.transform(F.col("_pp"), lambda s: s["payload"]).alias("payloads"),
        )
    )


def payload_check(
    postings: DataFrame,
    terms: list[str],
    want_payloads: list[float],
) -> DataFrame:
    """SpanPayloadCheckQuery analog → (doc_id, spans).

    Ref: lucene/queries/.../payloads/SpanPayloadCheckQuery.java (keep a
    span match only when the payloads collected at its positions equal
    the required list) surfaced in Solr as {!payload_check}
    (PayloadCheckQParserPlugin.java: analyzed value terms + one payload
    per term).

    ``terms`` form a consecutive-position phrase; a span at start p
    matches when term i sits at p+i with payload == want_payloads[i].
    Plan shape: one term-filtered explode per clause (term pushdown on
    the postings scan) equi-joined on (doc_id, aligned start) — the
    standard distributed phrase join, never a per-doc loop."""
    if len(terms) != len(want_payloads):
        raise ValueError(
            "payload_check needs exactly one payload per term "
            f"({len(terms)} terms, {len(want_payloads)} payloads)"
        )
    if not terms:
        raise ValueError("payload_check needs at least one term")
    base: DataFrame | None = None
    for i, (t, w) in enumerate(zip(terms, want_payloads)):
        leg = (
            postings.filter(F.col("term") == t)
            .select(
                "doc_id",
                F.explode(
                    F.arrays_zip(
                        F.col("positions").alias("pos"),
                        F.col("payloads").alias("payload"),
                    )
                ).alias("_pp"),
            )
            .filter(F.col("_pp.payload") == F.lit(float(w)))
            .select("doc_id", (F.col("_pp.pos") - i).alias("_start"))
        )
        base = leg if base is None else base.join(leg, ["doc_id", "_start"])
    return base.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("int").alias("spans")
    )


def _phrase_span_payloads(
    postings: DataFrame, terms: "tuple[str, ...] | list[str]"
) -> DataFrame:
    """(doc_id, _start, payload) — one row per (matched consecutive-
    position span, clause): the payloads PayloadFunction folds over.
    Same per-clause pushdown-explode + aligned equi-join plan as
    payload_check, without the payload equality filter."""
    if not terms:
        raise ValueError("payload span query needs at least one term")
    base: DataFrame | None = None
    for i, t in enumerate(terms):
        leg = (
            postings.filter(F.col("term") == t)
            .select(
                "doc_id",
                F.explode(
                    F.arrays_zip(
                        F.col("positions").alias("pos"),
                        F.col("payloads").alias("payload"),
                    )
                ).alias("_pp"),
            )
            .select(
                "doc_id",
                (F.col("_pp.pos") - i).alias("_start"),
                F.col("_pp.payload").alias(f"_pay{i}"),
            )
        )
        base = leg if base is None else base.join(leg, ["doc_id", "_start"])
    pays = F.array(*[F.col(f"_pay{i}") for i in range(len(terms))])
    return base.select(
        "doc_id", "_start", F.explode(pays).alias("payload")
    )


class _PayloadQueryBase(Query):
    """Marker base: queries executed against the payload postings table
    (a parallel index surface to the text searcher's postings)."""


@dataclass(frozen=True)
class PayloadCheckQuery(_PayloadQueryBase):
    """{!payload_check f v payloads} (PayloadCheckQParserPlugin.java →
    SpanPayloadCheckQuery): filter semantics — constant score 1.0 for
    docs holding at least one span whose per-position payloads equal
    the required list."""

    terms: "tuple[str, ...]"
    payloads: "tuple[float, ...]"

    def docs(self, postings: DataFrame) -> DataFrame:
        return payload_check(postings, list(self.terms), list(self.payloads)).select(
            "doc_id", F.lit(1.0).alias("score")
        )


@dataclass(frozen=True)
class PayloadScoreQuery(_PayloadQueryBase):
    """{!payload_score f v func} (PayloadScoreQParserPlugin.java →
    PayloadScoreQuery): score = PayloadFunction folded over every
    payload at the matched spans' positions (includeSpanScore=false,
    the qparser default)."""

    terms: "tuple[str, ...]"
    func: str = "sum"

    def docs(self, postings: DataFrame) -> DataFrame:
        if self.func not in PAYLOAD_FUNCS:
            raise ValueError(f"unknown payload function {self.func!r}")
        if len(self.terms) == 1:
            return payload_score(postings, self.terms[0], self.func).select(
                "doc_id", F.col("score").cast("double").alias("score")
            )
        spans = _phrase_span_payloads(postings, self.terms)
        agg = {
            "sum": F.sum("payload"),
            "avg": F.avg("payload"),
            "max": F.max("payload"),
            "min": F.min("payload"),
        }[self.func]
        return spans.groupBy("doc_id").agg(
            agg.cast("double").alias("score")
        )


def payload_score(
    postings: DataFrame, term: str, func: str = "sum"
) -> DataFrame:
    """PayloadScoreQuery(term, PayloadFunction) → (doc_id, score).

    ``func``: sum | avg | max | min over the matched positions'
    payloads (PayloadFunction.java's currentScore/docScore pairs)."""
    if func not in PAYLOAD_FUNCS:
        raise ValueError(f"unknown payload function {func!r}")
    p = postings.filter(F.col("term") == term)
    pay = F.col("payloads")
    zero = F.lit(0.0)
    total = F.aggregate(pay, zero, lambda acc, v: acc + v)
    if func == "sum":
        score = total
    elif func == "avg":
        score = total / F.size(pay)
    elif func == "max":
        score = F.array_max(pay)
    else:
        score = F.array_min(pay)
    return p.select("doc_id", score.alias("score"))
