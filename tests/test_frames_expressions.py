"""Pure-Python unit tests: frame validation and expression windowizing."""

from __future__ import annotations

import math

import pytest

from tidier_spark.expressions import windowize
from tidier_spark.frames import FrameSpec, days, hours, months, parse_frame, weeks


def test_parse_frame_numeric():
    fs = parse_frame((3, 1))
    assert fs.row_bounds() == (-3, 1)
    fs = parse_frame((math.inf, 0))
    lo, hi = fs.row_bounds()
    assert lo < -(2**31) and hi == 0


def test_parse_frame_periods():
    fs = parse_frame((days(7), days(-1)))
    assert fs.range_bounds("seconds") == (-7 * 86400, -86400)
    assert fs.range_bounds("days") == (-7, -1)
    fs = parse_frame((weeks(2), hours(0)))
    assert fs.range_bounds("seconds") == (-2 * 604800, 0)


def test_parse_frame_rejects():
    with pytest.raises(ValueError):
        parse_frame((1.5, 2))
    with pytest.raises(ValueError):
        parse_frame((1, 2, 3))
    with pytest.raises(ValueError):
        parse_frame("nope")
    with pytest.raises(ValueError):
        parse_frame((days(1), 5))  # mixed Period/numeric (nonzero)
    # 0 and inf may mix with Periods
    parse_frame((days(1), 0))
    parse_frame((math.inf, days(0)))


def test_calendar_frame_sql():
    fs = parse_frame((months(2), months(-1)))
    assert fs.is_calendar
    assert (
        fs.sql_frame_clause()
        == "RANGE BETWEEN INTERVAL '2' MONTH PRECEDING AND INTERVAL '1' MONTH PRECEDING"
    )
    fs = parse_frame((months(1), days(0)))
    assert fs.sql_frame_clause() == "RANGE BETWEEN INTERVAL '1' MONTH PRECEDING AND CURRENT ROW"
    with pytest.raises(ValueError):
        fs.range_bounds("seconds")  # calendar periods have no fixed seconds


def test_windowize_basics():
    outer, calls = windowize("round(avg(value), 4)")
    assert outer == "round(__w0__, 4)"
    assert calls == [("__w0__", "avg(value)")]

    outer, calls = windowize("max(value) - min(value)")
    assert outer == "__w0__ - __w1__"
    assert [c for _, c in calls] == ["max(value)", "min(value)"]


def test_windowize_distinct_count():
    outer, calls = windowize("count(DISTINCT event_type)")
    assert outer == "size(__w0__)"
    assert calls == [("__w0__", "collect_set(event_type)")]


def test_windowize_ignores_non_aggregates():
    for expr in (
        "array_min(xs)",
        "x + 1",
        "'avg(x)' || y",          # inside a string literal
        "s.min(x)",               # member access
        "`sum`(x)" ,              # backtick-quoted identifier
    ):
        _, calls = windowize(expr)
        assert calls == [], expr


def test_windowize_nested_scalars():
    outer, calls = windowize("sum(coalesce(value, 0)) / count(*)")
    assert [c for _, c in calls] == ["sum(coalesce(value, 0))", "count(*)"]
