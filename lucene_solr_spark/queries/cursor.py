"""CursorMark deep paging — Solr's cursor protocol.

Reference: solr/solrj/src/java/org/apache/solr/common/params/
CursorMarkParams.java and solr/core/src/java/org/apache/solr/search/
CursorMark.java (parseSerializedTotem/getSerializedTotem): the client
passes ``cursorMark=*`` on the first request; every response carries a
``nextCursorMark`` token encoding the SORT VALUES of the last document
returned; re-sending it resumes strictly after that document.  The
sort must be a total ordering, which Solr enforces by requiring the
uniqueKey field as the final tiebreak (CursorMark.java:69-91).

Spark shape: a cursor page is ``ORDER BY sort LIMIT k`` over the
scored/doc-values frame with a lexicographic strictly-after predicate
pushed into the scan — each page is one TakeOrderedAndProject job and
deeper pages SHRINK the candidate set (unlike offset paging, which
re-sorts the whole prefix; that is exactly why the reference has
cursors at all).  The next token is derived from the k-row page the
driver already holds — no extra job, no unbounded collect.
"""

from __future__ import annotations

import base64
import json
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CURSOR_MARK_START = "*"


@dataclass(frozen=True)
class SortSpec:
    """One sort key: column name + direction (CursorMark sort fields)."""

    field: str
    ascending: bool = False


def _encode(values: list) -> str:
    # getSerializedTotem: base64 of the sort-value tuple (the reference
    # uses JavaBin; JSON is the engine-neutral analog — the token stays
    # opaque to clients either way)
    return base64.urlsafe_b64encode(
        json.dumps(values, separators=(",", ":")).encode()
    ).decode()


def _decode(token: str) -> list:
    try:
        return json.loads(base64.urlsafe_b64decode(token.encode()))
    except Exception as exc:  # parseSerializedTotem's bad-totem error
        raise ValueError(f"invalid cursorMark token {token!r}") from exc


def _after_predicate(sorts: list[SortSpec], last: list) -> Column:
    """Lexicographic strictly-after: (s1 after l1) OR (s1 = l1 AND
    (s2 after l2)) OR … — CursorMark's searchAfter FieldDoc filter."""
    pred = F.lit(False)
    for i in reversed(range(len(sorts))):
        s, lv = sorts[i], F.lit(last[i])
        col = F.col(s.field)
        strictly = (col > lv) if s.ascending else (col < lv)
        pred = strictly | ((col == lv) & pred)
    return pred


def validate_sorts(sorts: list[SortSpec], unique_key: str) -> None:
    """CursorMark.java:69-91: the sort MUST end with the uniqueKey so
    the ordering is total; anything else risks skipped/duplicated docs
    across pages."""
    if not sorts or sorts[-1].field != unique_key:
        raise ValueError(
            "cursorMark requires the uniqueKey field "
            f"({unique_key!r}) as the final sort tiebreak"
        )


def cursor_page(
    df: DataFrame,
    sorts: list[SortSpec],
    cursor_mark: str,
    rows: int,
    unique_key: str = "doc_id",
) -> tuple[DataFrame, str]:
    """One cursor page over ``df`` → (page DataFrame in sort order,
    nextCursorMark).

    Returns the SAME cursor token when the page is empty — Solr's
    end-of-results convention (client stops when nextCursorMark equals
    the mark it sent).  The page materializes driver-side (it is the
    k-row response either way); the DataFrame returned is a VALUES
    relation of exactly those rows so callers can keep composing."""
    validate_sorts(sorts, unique_key)
    base = df
    if cursor_mark != CURSOR_MARK_START:
        last = _decode(cursor_mark)
        if len(last) != len(sorts):
            raise ValueError(
                f"cursorMark arity {len(last)} != sort arity {len(sorts)}"
            )
        base = base.filter(_after_predicate(sorts, last))
    ordered = base.orderBy(
        *[
            F.col(s.field).asc() if s.ascending else F.col(s.field).desc()
            for s in sorts
        ]
    ).limit(rows)
    page_rows = ordered.collect()  # k rows — the response payload
    if not page_rows:
        return ordered, cursor_mark
    next_mark = _encode([page_rows[-1][s.field] for s in sorts])
    page = df.sparkSession.createDataFrame(page_rows, ordered.schema)
    return page, next_mark


def cursor_walk(
    df: DataFrame,
    sorts: list[SortSpec],
    rows: int,
    unique_key: str = "doc_id",
    max_pages: int | None = None,
):
    """Iterate cursor pages to exhaustion (the standard export-style
    client loop) — yields (page_index, page DataFrame)."""
    mark = CURSOR_MARK_START
    page_i = 0
    while max_pages is None or page_i < max_pages:
        page, nxt = cursor_page(df, sorts, mark, rows, unique_key)
        if nxt == mark:
            break
        yield page_i, page
        mark = nxt
        page_i += 1
