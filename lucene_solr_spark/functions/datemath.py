"""Solr date math + date range facets.

DateMathParser (solr/core/src/java/org/apache/solr/util/
DateMathParser.java:137-410): ``NOW/DAY+6MONTHS-3DAYS`` — '+'/'-' add
a signed count of a calendar unit, '/' rounds DOWN to the unit start;
commands apply left to right.  Unit vocabulary is the reference's
CALENDAR_UNITS map verbatim (YEAR/MONTH/DAY/DATE/HOUR/MINUTE/SECOND/
MILLI + plural/alias forms; WEEK deliberately unsupported, same as the
reference).  Calendar adds clamp the day-of-month exactly like
java.time (Jan 31 + 1 MONTH = Feb 29/28), which is what
LocalDateTime.plus(val, MONTHS) does.

Date range facets (RangeFacetRequest.DateRangeEndpointCalculator):
the gap is itself a date-math add applied to each successive lower
bound — so ``gap=+1MONTH`` produces calendar-varying bucket widths,
NOT a fixed number of seconds.  Bucket boundary lists are driver-side
metadata (bucket count = (end-start)/gap); the counts are ONE
partial+final aggregation, same plan as the numeric range facet.
"""

from __future__ import annotations

import calendar
import re
from datetime import datetime, timedelta

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# CALENDAR_UNITS (DateMathParser.java:141-175), normalized to a canon
# unit key.  WEEK intentionally absent (reference comment :143-150).
_UNITS = {
    "YEAR": "Y", "YEARS": "Y",
    "MONTH": "M", "MONTHS": "M",
    "DAY": "D", "DAYS": "D", "DATE": "D",
    "HOUR": "h", "HOURS": "h",
    "MINUTE": "m", "MINUTES": "m",
    "SECOND": "s", "SECONDS": "s",
    "MILLI": "ms", "MILLIS": "ms",
    "MILLISECOND": "ms", "MILLISECONDS": "ms",
}

# the reference's splitter: word boundaries plus digit->non-digit seams
_SPLIT = re.compile(r"\b|(?<=\d)(?=\D)")


def _add_months(t: datetime, months: int) -> datetime:
    # java.time plus(MONTHS): clamp day-of-month to the target month's
    # last day (Jan 31 + 1 = Feb 29/28)
    y, m = divmod(t.year * 12 + (t.month - 1) + months, 12)
    last = calendar.monthrange(y, m + 1)[1]
    return t.replace(year=y, month=m + 1, day=min(t.day, last))


def _add(t: datetime, val: int, unit: str) -> datetime:
    u = _UNITS.get(unit)
    if u is None:
        raise ValueError(f"Adding Unit not recognized: {unit}")
    if u == "Y":
        return _add_months(t, 12 * val)
    if u == "M":
        return _add_months(t, val)
    delta = {
        "D": timedelta(days=val),
        "h": timedelta(hours=val),
        "m": timedelta(minutes=val),
        "s": timedelta(seconds=val),
        "ms": timedelta(milliseconds=val),
    }[u]
    return t + delta


def _round(t: datetime, unit: str) -> datetime:
    u = _UNITS.get(unit)
    if u is None:
        raise ValueError(f"Rounding Unit not recognized: {unit}")
    if u == "Y":
        return t.replace(month=1, day=1, hour=0, minute=0, second=0, microsecond=0)
    if u == "M":
        return t.replace(day=1, hour=0, minute=0, second=0, microsecond=0)
    if u == "D":
        return t.replace(hour=0, minute=0, second=0, microsecond=0)
    if u == "h":
        return t.replace(minute=0, second=0, microsecond=0)
    if u == "m":
        return t.replace(second=0, microsecond=0)
    if u == "s":
        return t.replace(microsecond=0)
    return t.replace(microsecond=(t.microsecond // 1000) * 1000)


def apply_math(t: datetime, math: str) -> datetime:
    """parseMath's command loop (DateMathParser.java:341-408)."""
    if not math:
        return t
    ops = [o for o in _SPLIT.split(math) if o]
    pos = 0
    while pos < len(ops):
        if len(ops[pos]) != 1:
            raise ValueError(f'Multi character command found: "{ops[pos]}"')
        command = ops[pos]
        pos += 1
        if command == "/":
            if len(ops) < pos + 1:
                raise ValueError(f'Need a unit after command: "{command}"')
            t = _round(t, ops[pos])
            pos += 1
        elif command in "+-":
            if len(ops) < pos + 2:
                raise ValueError(
                    f'Need a value and unit for command: "{command}"'
                )
            val = int(ops[pos])
            if command == "-":
                val = -val
            t = _add(t, val, ops[pos + 1])
            pos += 2
        else:
            raise ValueError(f'Unrecognized command: "{command}"')
    return t


def parse_date_math(val: str, now: datetime | None = None) -> datetime:
    """Parse ``NOW<math>`` or ``<ISO-8601 date>Z<math>`` (parseMath's
    static entry, DateMathParser.java:214-240: a fixed date is split
    from its math at the 'Z')."""
    if val.startswith("NOW"):
        if now is None:
            raise ValueError("NOW requires an explicit now= anchor here "
                             "(engine determinism: no wall clock)")
        return apply_math(now, val[len("NOW"):])
    zi = val.find("Z")
    if zi < 0:
        raise ValueError(f"Invalid Date String: '{val}' (no Z)")
    base = datetime.fromisoformat(val[:zi])
    return apply_math(base, val[zi + 1:])


def iso_z(t: datetime) -> str:
    """Solr's response date format (ISO instant, seconds precision when
    millis are zero)."""
    if t.microsecond:
        return t.strftime("%Y-%m-%dT%H:%M:%S.") + f"{t.microsecond // 1000:03d}Z"
    return t.strftime("%Y-%m-%dT%H:%M:%SZ")


def compute_date_ranges(
    start: datetime,
    end: datetime,
    gap: str,
    hardend: bool = False,
    include: frozenset | set = frozenset({"lower"}),
    others: frozenset | set = frozenset(),
) -> "list[tuple[str, datetime | None, datetime | None, bool, bool]]":
    """RangeFacetRequest.computeRanges over DateRangeEndpointCalculator
    (parseAndAddGap = date-math add): identical walk/include/other
    semantics to the numeric version, but the gap is calendar math so
    bucket widths can vary (``+1MONTH``)."""
    if end < start:
        raise ValueError(f"range facet 'end' comes before 'start': {end} < {start}")
    inc = {s.lower() for s in include}
    if "all" in inc:
        inc |= {"lower", "upper", "edge", "outer"}
    oth = {s.lower() for s in others}
    if "all" in oth:
        oth |= {"before", "after", "between"}
    ranges: list = []
    low = start
    while low < end:
        high = apply_math(low, gap)
        if high <= low:
            raise ValueError("range facet infinite loop (gap is zero/negative)")
        if end < high:
            if hardend:
                high = end
            else:
                end = high
        include_lower = "lower" in inc or ("edge" in inc and low == start)
        include_upper = "upper" in inc or ("edge" in inc and high == end)
        ranges.append((iso_z(low), low, high, include_lower, include_upper))
        low = high
    if "none" not in oth:
        if "before" in oth:
            ranges.append((
                "before", None, start, False,
                "outer" in inc or not ("lower" in inc or "edge" in inc),
            ))
        if "after" in oth:
            ranges.append((
                "after", end, None,
                "outer" in inc or not ("upper" in inc or "edge" in inc), False,
            ))
        if "between" in oth:
            ranges.append((
                "between", start, end,
                "lower" in inc or "edge" in inc, "upper" in inc or "edge" in inc,
            ))
    return ranges


def date_range_facet(
    doc_values: DataFrame,
    field: str,
    start: str,
    end: str,
    gap: str,
    now: datetime | None = None,
    hardend: bool = False,
    include: frozenset | set = frozenset({"lower"}),
    others: frozenset | set = frozenset(),
) -> DataFrame:
    """facet.range over a date field: start/end are date-math strings,
    gap is a date-math add.  ONE wide agg row of conditional counts,
    stacked to (bucket, cnt) — a single exchange of one row at any
    corpus size (same plan as the numeric range facet)."""
    s = parse_date_math(start, now)
    e = parse_date_math(end, now)
    ranges = compute_date_ranges(s, e, gap, hardend, include, others)
    v = F.col(field)
    sums = []
    for i, (_n, lo, hi, inc_lo, inc_hi) in enumerate(ranges):
        cond = v.isNotNull()
        if lo is not None:
            lo_l = F.lit(lo)
            cond = cond & (v >= lo_l if inc_lo else v > lo_l)
        if hi is not None:
            hi_l = F.lit(hi)
            cond = cond & (v <= hi_l if inc_hi else v < hi_l)
        sums.append(F.sum(F.when(cond, 1).otherwise(0)).alias(f"_c{i}"))
    wide = doc_values.agg(*sums)
    stack_args = ", ".join(
        f"'{name}', _c{i}" for i, (name, *_r) in enumerate(ranges)
    )
    return wide.selectExpr(
        f"stack({len(ranges)}, {stack_args}) as (bucket, cnt)"
    )
