"""R NA/NaN fidelity tests (SURVEY §7.2 M3, §7.3 #2) — oracle-checked.

Fixtures have no NULLs, so nulls are derived per FIXTURES.md §1.2:
``when(cond, null).otherwise(value)``.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from helpers import assert_matches_oracle
from tidier_spark import mutate
from tidier_spark.expressions import rewrite_r_functions


def _with_nulls(events):
    # deterministic ~20% nulls
    return events.withColumn(
        "v", F.when(F.col("event_id") % 5 == 0, None).otherwise(F.col("value"))
    )


NULLED = "(CASE WHEN event_id % 5 = 0 THEN NULL ELSE value END)"


def test_rewrite_templates():
    assert rewrite_r_functions("r_sum(x, na_rm=TRUE)") == "coalesce(sum(x), CAST(0 AS DOUBLE))"
    out = rewrite_r_functions("r_mean(x)")
    assert "count(x) = count(*)" in out and "avg(x)" in out and "'NaN'" in out
    # nested / multiple occurrences
    out = rewrite_r_functions("r_min(x) + r_max(y, na_rm=TRUE)")
    assert "min(x)" in out and "max(y)" in out and out.count("Infinity") == 2


def test_r_mean_poisons_null_frames(tables, sf_dir):
    ev = _with_nulls(tables["events"])
    r = mutate(
        ev,
        m="r_mean(round(v * 100)) / 100",
        by="user_id",
        order_by=["ts", "event_id"],
        frame=(3, 0),
    ).select("event_id", "m")
    assert_matches_oracle(
        r,
        f"""SELECT event_id,
                   (CASE WHEN count({NULLED}) OVER w = count(*) OVER w
                         THEN (CASE WHEN count({NULLED}) OVER w = 0
                                    THEN CAST('NaN' AS DOUBLE)
                                    ELSE avg(round({NULLED} * 100)) OVER w END)
                    END) / 100 AS m
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)""",
        sf_dir,
    )


def test_r_mean_na_rm_skips(tables, sf_dir):
    ev = _with_nulls(tables["events"])
    r = mutate(
        ev,
        m="r_mean(round(v * 100), na_rm=TRUE) / 100",
        by="user_id",
        order_by=["ts", "event_id"],
        frame=(3, 0),
    ).select("event_id", "m")
    assert_matches_oracle(
        r,
        f"""SELECT event_id,
                   (CASE WHEN count({NULLED}) OVER w = 0 THEN CAST('NaN' AS DOUBLE)
                         ELSE avg(round({NULLED} * 100)) OVER w END) / 100 AS m
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)""",
        sf_dir,
    )


def test_r_mean_empty_frame_nan(tables):
    # frame (3,-1) excludes the current row → first row per user has an
    # EMPTY frame → R semantics say NaN (README.md:44), not NULL.
    ev = tables["events"]
    r = mutate(
        ev,
        m="r_mean(value, na_rm=TRUE)",
        rn="row_number()",
        by="user_id",
        order_by=["ts", "event_id"],
        frame=(3, -1),
    )
    firsts = r.where("rn = 1").select("m").collect()
    assert firsts and all(
        row["m"] is not None and math.isnan(row["m"]) for row in firsts
    )


def test_r_sum_empty_frame_zero_and_min_inf(tables):
    ev = tables["events"]
    r = mutate(
        ev,
        s="r_sum(value, na_rm=TRUE)",
        mn="r_min(value, na_rm=TRUE)",
        rn="row_number()",
        by="user_id",
        order_by=["ts", "event_id"],
        frame=(3, -1),
    )
    firsts = r.where("rn = 1").select("s", "mn").collect()
    assert all(row["s"] == 0.0 for row in firsts)  # R: sum(numeric(0)) == 0
    assert all(row["mn"] == float("inf") for row in firsts)  # R: min() → Inf