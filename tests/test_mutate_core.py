"""Core dispatch-matrix tests, each oracle-checked against DuckDB.

Covers the reference's test matrix (`tests/testthat/tests_tidier.R`, 9
blocks — SURVEY.md §5) but with real value assertions instead of the
reference's smoke `inherits(...)` checks, using the differential pattern of
its one genuine correctness test (`tests_tidier.R:271-323`).
"""

from __future__ import annotations

import math

import pytest

from tidier_spark import days, months, mutate, mutate_
from helpers import assert_matches_oracle


def test_o1_plain_projection(tables, sf_dir):
    # tests_tidier.R:2-12 — basic mutate, arithmetic exprs.
    r = mutate(
        tables["lineitem"],
        revenue="round(l_extendedprice * (1 - l_discount), 4)",
        qty2="l_quantity * 2",
    ).select("l_orderkey", "l_linenumber", "revenue", "qty2")
    assert_matches_oracle(
        r,
        """SELECT l_orderkey, l_linenumber,
                  round(l_extendedprice * (1 - l_discount), 4) AS revenue,
                  l_quantity * 2 AS qty2
           FROM lineitem""",
        sf_dir,
    )


def test_o2_cumsum_ordered(tables, sf_dir):
    # tests_tidier.R:14-49 — order_by alone, cumulative sum.
    r = mutate(
        tables["lineitem"],
        cum_qty="cumsum(l_quantity)",
        order_by=["l_shipdate", "l_orderkey", "l_linenumber"],
    ).select("l_orderkey", "l_linenumber", "cum_qty")
    assert_matches_oracle(
        r,
        """SELECT l_orderkey, l_linenumber,
                  sum(l_quantity) OVER (
                    ORDER BY l_shipdate, l_orderkey, l_linenumber
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_qty
           FROM lineitem""",
        sf_dir,
    )


def test_o2_desc_multikey_rank(tables, sf_dir):
    # tests_tidier.R:27,41-48 — multi-key order with per-key desc.
    r = mutate(
        tables["orders"],
        rk="row_number()",
        by="o_custkey",
        order_by=["o_totalprice", "o_orderdate", "o_orderkey"],
        desc=[True, False, False],
    ).select("o_orderkey", "rk")
    assert_matches_oracle(
        r,
        """SELECT o_orderkey,
                  CAST(row_number() OVER (
                    PARTITION BY o_custkey
                    ORDER BY o_totalprice DESC, o_orderdate, o_orderkey) AS INT) AS rk
           FROM orders""",
        sf_dir,
    )


def test_o3_group_broadcast(tables, sf_dir):
    # tests_tidier.R:51-74 — aggregate without frame broadcasts group value.
    r = mutate(
        tables["orders"],
        avg_cust="avg(round(o_totalprice * 100)) / 100",
        n_orders="count(*)",
        by="o_custkey",
    ).select("o_orderkey", "avg_cust", "n_orders")
    assert_matches_oracle(
        r,
        """SELECT o_orderkey,
                  avg(round(o_totalprice * 100)) OVER w / 100 AS avg_cust,
                  count(*) OVER w AS n_orders
           FROM orders WINDOW w AS (PARTITION BY o_custkey)""",
        sf_dir,
    )


def test_o4_rows_frame(tables, sf_dir):
    # tests_tidier.R:76-97 — rows frame; FIXTURES.md §3 q4.
    r = mutate(
        tables["events"],
        avg7="avg(round(value * 100)) / 100",
        order_by=["ts", "event_id"],
        frame=(3, 3),
    ).select("event_id", "avg7")
    assert_matches_oracle(
        r,
        """SELECT event_id,
                  avg(round(value * 100)) OVER (
                    ORDER BY ts, event_id
                    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) / 100 AS avg7
           FROM events""",
        sf_dir,
    )


def test_o4_inf_frame_grouped(tables, sf_dir):
    # tests_tidier.R:76-97 — frame=(Inf, 0) running mean within groups.
    r = mutate(
        tables["lineitem"],
        run_avg="round(avg(l_quantity), 4)",
        by="l_suppkey",
        order_by=["l_shipdate", "l_orderkey", "l_linenumber"],
        frame=(math.inf, 0),
    ).select("l_orderkey", "l_linenumber", "run_avg")
    assert_matches_oracle(
        r,
        """SELECT l_orderkey, l_linenumber,
                  round(avg(l_quantity) OVER (
                    PARTITION BY l_suppkey
                    ORDER BY l_shipdate, l_orderkey, l_linenumber
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS run_avg
           FROM lineitem""",
        sf_dir,
    )


def test_o5_range_frame_flagship(tables, sf_dir):
    # README.md:25-54 flagship: last-7-days mean excluding current row,
    # per group, on an irregular time index.
    r = mutate(
        tables["events"],
        avg_7d="avg(round(value * 100)) / 100",
        by="user_id",
        index="ts",
        frame=(days(7), days(-1)),
    ).select("event_id", "avg_7d")
    assert_matches_oracle(
        r,
        """SELECT event_id,
                  avg(round(value * 100)) OVER (
                    PARTITION BY user_id ORDER BY ts
                    RANGE BETWEEN INTERVAL 7 DAYS PRECEDING
                              AND INTERVAL 1 DAY  PRECEDING) / 100 AS avg_7d
           FROM events""",
        sf_dir,
    )


def test_o7_calendar_interval_frame(tables, sf_dir):
    # SURVEY §7.3 #1 — calendar months lower to SQL RANGE BETWEEN INTERVAL.
    r = mutate(
        tables["events"],
        avg_m="avg(round(value * 100)) / 100",
        by="user_id",
        index="ts",
        frame=(months(1), days(0)),
    ).select("event_id", "avg_m")
    assert_matches_oracle(
        r,
        """SELECT event_id,
                  avg(round(value * 100)) OVER (
                    PARTITION BY user_id ORDER BY ts
                    RANGE BETWEEN INTERVAL 1 MONTH PRECEDING AND CURRENT ROW) / 100 AS avg_m
           FROM events""",
        sf_dir,
    )


def test_complete_calendar_frame(tables, sf_dir):
    # R/mutate.R:58-62 applied to calendar Periods (:98-100): complete=TRUE
    # nulls rows whose month-back window leaves the partition's index extent.
    r = mutate(
        tables["events"],
        avg_m="avg(round(value * 100)) / 100",
        by="user_id",
        index="ts",
        frame=(months(1), days(0)),
        complete=True,
    ).select("event_id", "avg_m")
    assert_matches_oracle(
        r,
        """SELECT event_id,
                  CASE WHEN ts - INTERVAL 1 MONTH
                         >= min(ts) OVER (PARTITION BY user_id)
                       THEN avg(round(value * 100)) OVER (
                              PARTITION BY user_id ORDER BY ts
                              RANGE BETWEEN INTERVAL 1 MONTH PRECEDING
                                        AND CURRENT ROW) / 100
                  END AS avg_m
           FROM events""",
        sf_dir,
    )
    # and the guard actually fires: each user's earliest rows are NULL
    assert r.where("avg_m IS NULL").count() > 0


def test_complete_rows_frame(tables, sf_dir):
    # R/mutate.R:58-62 — complete=TRUE nulls partial windows.
    r = mutate(
        tables["events"],
        avg7="avg(round(value * 100)) / 100",
        order_by=["ts", "event_id"],
        frame=(3, 3),
        complete=True,
    ).select("event_id", "avg7")
    assert_matches_oracle(
        r,
        """SELECT event_id,
                  CASE WHEN count(*) OVER w = 7
                       THEN avg(round(value * 100)) OVER w / 100 END AS avg7
           FROM events
           WINDOW w AS (ORDER BY ts, event_id ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)""",
        sf_dir,
    )


def test_same_name_overwrite(tables, sf_dir):
    # tests_tidier.R:162-269 / R/mutate.R:748-766 — windowed output replaces
    # the input column of the same name (O8).
    r = mutate(
        tables["events"],
        value="avg(round(value * 100)) / 100",
        by="user_id",
        order_by=["ts", "event_id"],
        frame=(3, 0),
    ).select("event_id", "value")
    assert_matches_oracle(
        r,
        """SELECT event_id,
                  avg(round(value * 100)) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) / 100 AS value
           FROM events""",
        sf_dir,
    )


def test_compound_frame_expression(tables, sf_dir):
    # summarise context accepts arbitrary frame-reducing expressions
    # (R/mutate.R:208): compound over two aggregates + distinct count.
    r = mutate(
        tables["events"],
        span="round(max(value) - min(value), 4)",
        nd="n_distinct(event_type)",
        by="user_id",
        order_by=["ts", "event_id"],
        frame=(10, 0),
    ).select("event_id", "span", "nd")
    assert_matches_oracle(
        r,
        """SELECT event_id,
                  round(max(value) OVER w - min(value) OVER w, 4) AS span,
                  CAST(count(DISTINCT event_type) OVER w AS INT) AS nd
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN 10 PRECEDING AND CURRENT ROW)""",
        sf_dir,
    )


def test_sequential_exprs_reference_earlier(tables, sf_dir):
    # dplyr sequential-mutate: later exprs see earlier outputs.
    r = mutate(
        tables["lineitem"],
        revenue="l_extendedprice * (1 - l_discount)",
        taxed="round(revenue * (1 + l_tax), 6)",
    ).select("l_orderkey", "l_linenumber", "taxed")
    assert_matches_oracle(
        r,
        """SELECT l_orderkey, l_linenumber,
                  round(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6) AS taxed
           FROM lineitem""",
        sf_dir,
    )


def test_mutate_errors():
    # Error parity (R/mutate.R:298-312, :162-172; SURVEY §7.3 #4).
    import pyspark.sql

    spark = pyspark.sql.SparkSession.getActiveSession()
    df = spark.range(3).withColumnRenamed("id", "x")
    with pytest.raises(ValueError, match="order_by"):
        mutate(df, c="cumsum(x)")
    with pytest.raises(ValueError, match="frame"):
        mutate(df, c="avg(x)", complete=True)
    with pytest.raises(ValueError, match="frame bounds"):
        mutate(df, c="avg(x)", order_by="x", frame=(1.5, 2))
    with pytest.raises(ValueError, match="not in DataFrame"):
        mutate_(df, c="avg(x)", by="nope")
    with pytest.raises(TypeError):
        mutate_(df, c="avg(x)", by=123)


def test_mutate_restore_order(tables):
    df = tables["events"]
    r = mutate(
        df,
        avg3="avg(value)",
        order_by=["ts", "event_id"],
        frame=(3, 0),
        restore_order=True,
    )
    # restore_order keeps the input's row identity ordering; schema unchanged+1
    assert r.columns == df.columns + ["avg3"]


def test_mutate_error_breadth(spark):
    # Remaining assertion classes from the reference (R/mutate.R:142-168,
    # :516-518): desc recycling, frame arity/type-mixing, order_by/index
    # membership and typing.
    from tidier_spark import days

    df = spark.range(3).selectExpr("id AS x", "id AS y")
    with pytest.raises(ValueError, match="length 1 or match"):
        mutate(df, c="avg(x)", order_by=["x", "y"], desc=[True, False, True],
               frame=(1, 0))
    with pytest.raises(ValueError, match="pair"):
        mutate(df, c="avg(x)", order_by="x", frame=(1, 0, 1))
    with pytest.raises(ValueError, match="mix|class|bounds"):
        mutate(df, c="avg(x)", order_by="x", index="x", frame=(days(7), 3))
    with pytest.raises(ValueError, match="not in DataFrame"):
        mutate(df, c="avg(x)", order_by="nope", frame=(1, 0))
    with pytest.raises(TypeError, match="column name string"):
        mutate(df, c="avg(x)", order_by="x", index=123, frame=(days(7), days(0)))
