"""DateMathParser semantics vs the reference (util/DateMathParser.java).

Golden expectations derived from the reference's TestDateMathParser
(solr/core/src/test/org/apache/solr/util/DateMathParserTest.java)
command table: add/round composition, left-to-right application,
calendar-clamped month adds, and the error cases.
"""

from __future__ import annotations

from datetime import datetime

import pytest

from lucene_solr_spark.functions.datemath import (
    apply_math,
    compute_date_ranges,
    iso_z,
    parse_date_math,
)

NOW = datetime(2024, 7, 16, 10, 30, 45, 500000)


def test_round_day():
    assert apply_math(NOW, "/DAY") == datetime(2024, 7, 16)


def test_round_month_year():
    assert apply_math(NOW, "/MONTH") == datetime(2024, 7, 1)
    assert apply_math(NOW, "/YEAR") == datetime(2024, 1, 1)


def test_add_then_round_left_to_right():
    # NOW+6MONTHS+3DAYS/DAY — rounding applies LAST (after the adds)
    out = apply_math(NOW, "+6MONTHS+3DAYS/DAY")
    assert out == datetime(2025, 1, 19)
    # and the other order rounds FIRST
    out2 = apply_math(NOW, "/DAY+6MONTHS+3DAYS")
    assert out2 == datetime(2025, 1, 19)
    out3 = apply_math(NOW, "+6MONTHS/DAY+3DAYS")
    assert out3 == datetime(2025, 1, 19)


def test_month_add_clamps_day():
    # java.time plus(MONTHS) clamps: Jan 31 + 1 MONTH = Feb 29 (leap)
    assert apply_math(datetime(2024, 1, 31), "+1MONTH") == datetime(2024, 2, 29)
    assert apply_math(datetime(2023, 1, 31), "+1MONTH") == datetime(2023, 2, 28)


def test_subtract_and_millis():
    assert apply_math(NOW, "-45SECONDS") == NOW.replace(second=0)
    assert apply_math(NOW, "+500MILLIS") == NOW.replace(microsecond=0, second=46)


def test_unit_aliases():
    for u in ("DAY", "DAYS", "DATE"):
        assert apply_math(NOW, f"+1{u}") == apply_math(NOW, "+1DAY")


def test_error_cases():
    with pytest.raises(ValueError):
        apply_math(NOW, "+1WEEK")  # WEEK deliberately unsupported
    with pytest.raises(ValueError):
        apply_math(NOW, "/")
    with pytest.raises(ValueError):
        apply_math(NOW, "+DAY")  # missing value


def test_parse_fixed_date_with_math():
    out = parse_date_math("2024-01-03T12:00:00Z/DAY-2DAYS")
    assert out == datetime(2024, 1, 1)


def test_parse_now_requires_anchor():
    with pytest.raises(ValueError):
        parse_date_math("NOW/DAY")
    assert parse_date_math("NOW/DAY", now=NOW) == datetime(2024, 7, 16)


def test_iso_z_format():
    assert iso_z(datetime(2024, 1, 1)) == "2024-01-01T00:00:00Z"
    assert iso_z(datetime(2024, 1, 1, microsecond=500000)) == (
        "2024-01-01T00:00:00.500Z"
    )


def test_calendar_gap_varying_widths():
    # +1MONTH gap across Feb: bucket widths 31, 29, 31 days (2024 leap)
    r = compute_date_ranges(
        datetime(2024, 1, 1), datetime(2024, 4, 1), "+1MONTH"
    )
    assert [n for n, *_ in r] == [
        "2024-01-01T00:00:00Z", "2024-02-01T00:00:00Z", "2024-03-01T00:00:00Z"
    ]
    widths = [(hi - lo).days for _n, lo, hi, *_ in r]
    assert widths == [31, 29, 31]


def test_soft_end_extension_with_date_gap():
    # end Jan 20, gap +7DAYS: soft end extends to Jan 22
    r = compute_date_ranges(
        datetime(2024, 1, 1), datetime(2024, 1, 20), "+7DAYS"
    )
    assert r[-1][2] == datetime(2024, 1, 22)
    # hardend clips instead
    r2 = compute_date_ranges(
        datetime(2024, 1, 1), datetime(2024, 1, 20), "+7DAYS", hardend=True
    )
    assert r2[-1][2] == datetime(2024, 1, 20)
