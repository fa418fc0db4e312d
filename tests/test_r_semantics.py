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
    # the aggregate input is cast to DOUBLE (r10): R numerics ARE
    # doubles, so decimal-schema inputs must compute in double, not
    # Spark's scale-quantizing decimal avg (decvals axis find)
    assert rewrite_r_functions("r_sum(x, na_rm=TRUE)") == (
        "coalesce(sum(CAST((x) AS DOUBLE)), CAST(0 AS DOUBLE))"
    )
    out = rewrite_r_functions("r_mean(x)")
    assert (
        "count(x) = count(*)" in out
        and "avg(CAST((x) AS DOUBLE))" in out
        and "'NaN'" in out
    )
    # nested / multiple occurrences
    out = rewrite_r_functions("r_min(x) + r_max(y, na_rm=TRUE)")
    assert (
        "min(CAST((x) AS DOUBLE))" in out
        and "max(CAST((y) AS DOUBLE))" in out
        and out.count("Infinity") == 2
    )


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

def test_r_mean_decimal_input_computes_in_double(spark):
    # decvals axis r10: R numerics are doubles — r_mean over a DECIMAL
    # column must produce the double computation, bit-identical to the
    # same data as doubles, NOT Spark's decimal avg (which HALF_UP
    # quantizes at scale+4: 95.503333 where double avg says
    # 95.50333333333334)
    df = spark.range(300).select(
        (F.col("id") % 7).alias("g"),
        F.col("id").alias("i"),
        (F.col("id") % 97).cast("decimal(15,2)").alias("vd"),
        (F.col("id") % 97).cast("double").alias("vf"),
    )
    r = mutate(
        df,
        md="r_mean(vd)",
        mf="r_mean(vf)",
        by="g",
        order_by=["i"],
        frame=(5, 0),
    ).select("md", "mf").collect()
    for row in r:
        assert row["md"] == row["mf"], (row["md"], row["mf"])
        assert isinstance(row["md"], float)


def test_frame_apply_decimal_crossing_is_correctly_rounded(spark):
    # decvals axis r10: Arrow's decimal128->float64 cast multiplies by
    # the inexact 10^-scale (Decimal('105.82') -> 105.82000000000001);
    # frame_apply therefore casts DECIMAL sources to double JVM-side
    # (correctly rounded), so the reducer sees the same floats a double
    # schema would and the output needs no decimal cast
    import numpy as np

    from tidier_spark.pandas_tier import frame_apply

    df = spark.range(200).select(
        (F.col("id") % 5).alias("g"),
        F.col("id").alias("i"),
        ((F.col("id") % 997) + F.lit(10500) / 100)
        .cast("decimal(15,2)")
        .alias("vd"),
    )
    dd = df.withColumn("vf", F.col("vd").cast("double"))
    med_dec = mutate(
        df, m=frame_apply(np.median, "vd"), by="g", order_by=["i"],
        frame=(6, 0),
    ).select("i", "m")
    med_dbl = mutate(
        dd, m=frame_apply(np.median, "vf"), by="g", order_by=["i"],
        frame=(6, 0),
    ).select("i", "m")
    a = {r["i"]: r["m"] for r in med_dec.collect()}
    b = {r["i"]: r["m"] for r in med_dbl.collect()}
    assert a == b
    # multi-column (struct) path: a decimal field crosses as double too
    wav = mutate(
        df.withColumn("w", F.col("i") % 3 + 1),
        m=frame_apply(
            lambda f: float(np.sum(f.vd * f.w) / np.sum(f.w)),
            ("vd", "w"),
        ),
        by="g",
        order_by=["i"],
        frame=(4, 0),
    ).select("i", "m")
    wav_d = mutate(
        dd.withColumn("w", F.col("i") % 3 + 1),
        m=frame_apply(
            lambda f: float(np.sum(f.vf * f.w) / np.sum(f.w)),
            ("vf", "w"),
        ),
        by="g",
        order_by=["i"],
        frame=(4, 0),
    ).select("i", "m")
    assert {r["i"]: r["m"] for r in wav.collect()} == {
        r["i"]: r["m"] for r in wav_d.collect()
    }


def test_frame_apply_decimal_expression_col_precast(spark):
    # advice r11: the decimal pre-cast probe must also catch SQL
    # EXPRESSION columns whose RESULT type is DECIMAL (probed via
    # selectExpr, driver-side) — `frame_apply(fn, "vd * 2")` over a
    # DECIMAL column previously crossed Arrow through the inexact
    # decimal128->float64 cast the r10 fix addressed for plain names.
    # The multi-column struct path additionally needs the explicit
    # alias (struct(vd * 2) would name its field 'col1').
    import numpy as np

    from tidier_spark.pandas_tier import frame_apply

    df = spark.range(200).select(
        F.col("id").alias("i"),
        ((F.col("id") % 997) + F.lit(10582) / 100)
        .cast("decimal(15,2)")
        .alias("vd"),
    )
    dd = df.withColumn("vf", F.col("vd").cast("double"))
    last = lambda a: float(a[-1])  # noqa: E731
    got = mutate(
        df, m=frame_apply(last, "vd * 2"), order_by=["i"], frame=(0, 0)
    ).select("i", "m")
    want = mutate(
        dd, m=frame_apply(last, "vf * 2"), order_by=["i"], frame=(0, 0)
    ).select("i", "m")
    assert {r["i"]: r["m"] for r in got.collect()} == {
        r["i"]: r["m"] for r in want.collect()
    }
    # multi-column struct path with an expression field
    got2 = mutate(
        df,
        m=frame_apply(
            lambda f: float(np.nansum(f["vd * 2"])), ("i", "vd * 2")
        ),
        order_by=["i"],
        frame=(1, 0),
    ).select("i", "m")
    want2 = mutate(
        dd,
        m=frame_apply(
            lambda f: float(np.nansum(f["vf * 2"])), ("i", "vf * 2")
        ),
        order_by=["i"],
        frame=(1, 0),
    ).select("i", "m")
    assert {r["i"]: r["m"] for r in got2.collect()} == {
        r["i"]: r["m"] for r in want2.collect()
    }
