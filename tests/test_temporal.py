"""As-of join, sessionize, rollup/cube — oracle-checked.

The asof_join oracle uses DuckDB's NATIVE ``ASOF JOIN``, so the
differential crosses two independent implementations of the semantics.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from helpers import assert_matches_oracle
from tidier_spark import summarise
from tidier_spark.operators.temporal import asof_join, sessionize


def _sides(events):
    trades = events.where("event_type = 'click'").select("event_id", "user_id", "ts")
    quotes = events.where("event_type = 'purchase'").select("user_id", "ts", "value")
    return trades, quotes


def test_asof_join_backward_oracle(tables, sf_dir):
    trades, quotes = _sides(tables["events"])
    r = asof_join(
        trades, quotes, on="user_id", time_col="ts", value_cols=["value"]
    ).select("event_id", "value_right")
    assert_matches_oracle(
        r,
        """SELECT t.event_id, q.value AS value_right
           FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') t
           ASOF LEFT JOIN (SELECT user_id, ts, value FROM events
                           WHERE event_type = 'purchase') q
             ON t.user_id = q.user_id AND t.ts >= q.ts""",
        sf_dir,
    )


def test_asof_join_forward_oracle(tables, sf_dir):
    trades, quotes = _sides(tables["events"])
    r = asof_join(
        trades,
        quotes,
        on="user_id",
        time_col="ts",
        value_cols=["value"],
        direction="forward",
    ).select("event_id", "value_right")
    assert_matches_oracle(
        r,
        """SELECT t.event_id, q.value AS value_right
           FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') t
           ASOF LEFT JOIN (SELECT user_id, ts, value FROM events
                           WHERE event_type = 'purchase') q
             ON t.user_id = q.user_id AND t.ts <= q.ts""",
        sf_dir,
    )


def test_sessionize_oracle(tables, sf_dir):
    r = sessionize(tables["events"], "user_id", "ts", gap_seconds=4 * 3600).select(
        "event_id", "session_id"
    )
    assert_matches_oracle(
        r,
        """SELECT event_id,
                  sum(CASE WHEN gap_us > 14400000000::BIGINT THEN 1 ELSE 0 END)
                    OVER (PARTITION BY user_id ORDER BY ts
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) + 1
                    AS session_id
           FROM (SELECT event_id, user_id, ts,
                        epoch_us(ts) - lag(epoch_us(ts))
                          OVER (PARTITION BY user_id ORDER BY ts) AS gap_us
                 FROM events)""",
        sf_dir,
    )


def test_rollup_oracle(tables, sf_dir):
    r = summarise(
        tables["lineitem"],
        sum_qty="sum(l_quantity)",
        by=["l_returnflag", "l_linestatus"],
        rollup=True,
    )
    assert_matches_oracle(
        r,
        """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty
           FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""",
        sf_dir,
    )


def test_cube_oracle(tables, sf_dir):
    r = summarise(
        tables["orders"],
        n="n()",
        by=["o_orderstatus", "o_orderpriority"],
        cube=True,
    )
    assert_matches_oracle(
        r,
        """SELECT o_orderstatus, o_orderpriority, count(*) AS n
           FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""",
        sf_dir,
    )

def test_funnel_known_sequence(spark):
    from tidier_spark.operators.temporal import funnel

    rows = [
        # user 1 completes view -> click -> purchase in order
        (1, "2024-01-01 00:00:00", "view"),
        (1, "2024-01-01 01:00:00", "click"),
        (1, "2024-01-01 02:00:00", "purchase"),
        # user 2: purchase BEFORE click -> stage stops at click
        (2, "2024-01-01 00:00:00", "view"),
        (2, "2024-01-01 00:30:00", "purchase"),
        (2, "2024-01-01 01:00:00", "click"),
        # user 3: never viewed -> excluded entirely
        (3, "2024-01-01 00:00:00", "click"),
        # user 4: view only
        (4, "2024-01-01 05:00:00", "view"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts string, event_type string").withColumn(
        "ts", F.to_timestamp("ts")
    )
    got = {r["user_id"]: r for r in funnel(
        df, "user_id", "ts", "event_type", ["view", "click", "purchase"]
    ).collect()}
    assert set(got) == {1, 2, 4}
    assert got[1]["stage"] == 3 and got[1]["t3"] is not None
    assert got[2]["stage"] == 2 and got[2]["t3"] is None
    assert got[4]["stage"] == 1 and got[4]["t2"] is None


def test_cohort_retention_known_triangle(spark):
    from tidier_spark.operators.temporal import cohort_retention

    # u1 first active day 1, returns day 2 and day 4 (twice — distinct);
    # u2 first active day 2 only; u3 first active day 1, returns day 2
    rows = [
        (1, "2024-01-01 10:00:00"), (1, "2024-01-02 09:00:00"),
        (1, "2024-01-04 01:00:00"), (1, "2024-01-04 23:00:00"),
        (2, "2024-01-02 12:00:00"),
        (3, "2024-01-01 00:00:00"), (3, "2024-01-02 23:59:59"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts string").selectExpr(
        "user_id", "CAST(ts AS TIMESTAMP) AS ts"
    )
    out = {
        (r.cohort_us, r.period_offset): r.n_users
        for r in cohort_retention(df, "user_id", "ts", period="day").collect()
    }
    import datetime

    d1 = int(datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc).timestamp() * 1_000_000)
    d2 = d1 + 86_400_000_000
    assert out[(d1, 0)] == 2  # u1, u3 on their cohort day
    assert out[(d1, 1)] == 2  # both return next day
    assert out[(d1, 3)] == 1  # only u1 on day 4 (distinct within the day)
    assert out[(d2, 0)] == 1  # u2's own cohort
    assert set(out) == {(d1, 0), (d1, 1), (d1, 3), (d2, 0)}


def _ij_frames(spark):
    pts = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", "k1"), (2, "2024-01-01 01:30:00", "k1"),
         (3, "2024-01-01 02:00:00", "k2"), (4, "2024-03-01 00:00:00", "k1")],
        "pid long, ts string, k string",
    ).selectExpr("pid", "CAST(ts AS TIMESTAMP) AS ts", "k")
    iv = spark.createDataFrame(
        [(10, "2024-01-01 00:00:00", "2024-01-01 02:00:00", "k1"),
         (11, "2024-01-01 01:00:00", "2024-01-01 01:00:00", "k1"),  # empty
         (12, "2023-12-31 23:00:00", "2024-01-01 02:30:00", "k2")],
        "iid long, s string, e string, k string",
    ).selectExpr(
        "iid", "CAST(s AS TIMESTAMP) AS s", "CAST(e AS TIMESTAMP) AS e", "k"
    )
    return pts, iv


def test_interval_join_matches_naive_range_join(spark):
    from tidier_spark.operators.temporal import interval_join

    pts, iv = _ij_frames(spark)
    got = {
        (r.pid, r.iid)
        for r in interval_join(
            pts.select("pid", "ts"),
            iv.select("iid", "s", "e"),
            time_col="ts", start_col="s", end_col="e", bucket_seconds=1800,
        ).collect()
    }
    naive = {
        (r.pid, r.iid)
        for r in pts.crossJoin(iv.select("iid", "s", "e"))
        .where((F.col("ts") >= F.col("s")) & (F.col("ts") < F.col("e")))
        .collect()
    }
    assert got == naive
    # boundary semantics: t==start included (pid 1 in iid 10),
    # t==end excluded (pid 3 NOT in iid 10), empty interval matches nothing
    assert (1, 10) in got and (3, 10) not in got
    assert not any(i == 11 for _, i in got)


def test_interval_join_keyed_and_left(spark):
    from tidier_spark.operators.temporal import interval_join

    pts, iv = _ij_frames(spark)
    out = interval_join(
        pts, iv, on="k", time_col="ts", start_col="s", end_col="e",
        bucket_seconds=3600, how="left",
    )
    rows = {r.pid: r.iid for r in out.collect()}
    # keyed: pid 3 (k2) matches only the k2 interval; pid 2 matches 10 via k1
    assert rows[3] == 12 and rows[2] == 10
    # left semantics: pid 4 (no covering interval) survives with NULL
    assert rows[4] is None
    assert out.count() == 4


def test_interval_join_plan_is_equi_join(tables):
    from tidier_spark.operators.temporal import interval_join
    from tidier_spark.plans import explain_str

    ev = tables["events"]
    win = ev.where("event_type = 'purchase'").select(
        F.col("event_id").alias("w_id"),
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("e"),
    )
    pts = ev.where("event_type = 'click'").select("event_id", "ts")
    r = interval_join(
        pts, win, time_col="ts", start_col="s", end_col="e", bucket_seconds=3600
    )
    plan = explain_str(r, "simple")
    assert "BroadcastNestedLoop" not in plan and "Cartesian" not in plan, plan


def test_time_bucket_gapfill_grid_and_fills(tables):
    from pyspark.sql import functions as F

    from tidier_spark.operators.temporal import time_bucket_gapfill

    ev = tables["events"]
    out = time_bucket_gapfill(ev, "user_id", "ts", "value",
                              bucket_seconds=86400, fill="locf")
    # event conservation
    assert out.agg(F.sum("n")).collect()[0][0] == ev.count()
    # grid completeness: per key, row count == span/bucket + 1, no dup buckets
    g = out.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("rows"),
        F.count_distinct("bucket_us").alias("dist"),
        ((F.max("bucket_us") - F.min("bucket_us")) / 86400000000 + 1).alias("want"),
    )
    bad = g.where((F.col("rows") != F.col("dist")) | (F.col("rows") != F.col("want"))).count()
    assert bad == 0
    # filled rows have n == 0 and carry the previous v100 (locf)
    assert out.where(F.col("filled") & (F.col("n") != 0)).count() == 0
    assert out.where(F.col("filled")).count() > 0
    # zero fill: filled rows are exactly v100 == 0 with filled flag
    zer = time_bucket_gapfill(ev, "user_id", "ts", "value",
                              bucket_seconds=86400, fill="zero")
    assert zer.where(F.col("filled") & (F.col("v100") != 0)).count() == 0
    # null fill: filled rows are NULL
    nul = time_bucket_gapfill(ev, "user_id", "ts", "value",
                              bucket_seconds=86400, fill="null")
    assert nul.where(F.col("filled") & F.col("v100").isNotNull()).count() == 0


def test_asof_nearest_picks_closer_side(spark):
    from tidier_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, "k", 100.0), (2, "k", 205.0), (3, "k", 400.0), (4, "z", 10.0)],
        "event_id long, k string, t double",
    )
    right = spark.createDataFrame(
        [("k", 90.0, 9.0), ("k", 210.0, 21.0), ("k", 300.0, 30.0)],
        "k string, t double, v double",
    )
    got = {
        r.event_id: r.v_right
        for r in asof_join(
            left, right, "k", "t", ["v"], direction="nearest", suffix="_right"
        ).collect()
    }
    assert got[1] == 9.0    # 100: back 90 (d=10) vs fwd 210 (d=110)
    assert got[2] == 21.0   # 205: back 90 (d=115) vs fwd 210 (d=5)
    assert got[3] == 30.0   # 400: only backward exists (300)
    assert got[4] is None   # key with no right rows

    # equidistant -> backward wins
    l2 = spark.createDataFrame([(9, "k", 150.0)], "event_id long, k string, t double")
    r2 = spark.createDataFrame(
        [("k", 100.0, 1.0), ("k", 200.0, 2.0)], "k string, t double, v double"
    )
    tie = asof_join(l2, r2, "k", "t", ["v"], direction="nearest").collect()[0]
    assert tie.v_right == 1.0


def test_ewma_matches_python_reference(spark):
    import random

    from tidier_spark.operators.temporal import ewma

    rng = random.Random(7)
    rows = []
    for uid in range(5):
        for i in range(rng.randint(1, 25)):
            rows.append(
                (uid, f"2024-01-01 00:{i:02d}:00", uid * 100 + i,
                 round(rng.uniform(0, 500), 2))
            )
    df = spark.createDataFrame(
        rows, "user_id long, ts string, event_id long, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {
        (r["user_id"], r["event_id"]): (r["ewma_num"], r["ewma_den"], r["ewma100"])
        for r in ewma(df, "user_id", "ts", "value", "event_id", lookback=8).collect()
    }
    # independent reference: per-user ordered loop over the last 9 values
    by_user = {}
    for uid, ts, eid, v in sorted(rows):
        hist = by_user.setdefault(uid, [])
        hist.append((eid, round(v * 100)))
        num = den = 0
        for j, (_, x) in enumerate(hist[-9:][::-1]):
            num += x * (1 << (8 - j))
            den += 1 << (8 - j)
        assert got[(uid, eid)] == (num, den, num / den)
    assert len(got) == len(rows)


def test_ewma_single_window_exchange(tables):
    from tidier_spark.operators.temporal import ewma

    plan = ewma(
        tables["events"], "user_id", "ts", "value", "event_id"
    )._jdf.queryExecution().executedPlan().toString()
    # all 9 lags collapse into ONE Window exec after ONE shuffle
    assert plan.count("Window") == 1
    assert plan.count("Exchange") == 1


def test_scd2_known_history(spark):
    from tidier_spark.operators.merge import scd2

    rows = [
        # u1: A,A,B,A -> three runs (A 2-obs, B, A again — NOT merged)
        (1, "2024-01-01 00:00:00", 1, "A"),
        (1, "2024-01-01 01:00:00", 2, "A"),
        (1, "2024-01-01 02:00:00", 3, "B"),
        (1, "2024-01-01 03:00:00", 4, "A"),
        # u2: single observation -> one current run
        (2, "2024-01-01 00:00:00", 5, "C"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts string, event_id long, attr string"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = scd2(df, "user_id", "ts", "attr", "event_id")
    runs = sorted(
        [(r["user_id"], r["attr"], r["valid_from_us"], r["valid_to_us"],
          r["is_current"], r["n_obs"]) for r in out.collect()],
        key=lambda r: (r[0], r[2]),
    )
    h = 3_600_000_000  # one hour in µs
    t0 = runs[0][2]  # first run start for u1
    assert [r[:2] + (r[4], r[5]) for r in runs] == [
        (1, "A", False, 2), (1, "B", False, 1), (1, "A", True, 1),
        (2, "C", True, 1),
    ]
    # intervals chain half-open: each run's valid_to == next run's valid_from
    assert runs[0][3] == runs[0][2] + 2 * h  # A run [t0, t0+2h)
    assert runs[1][2] == runs[0][3] and runs[1][3] == runs[1][2] + h
    assert runs[2][2] == runs[1][3] and runs[2][3] is None
    assert runs[3][3] is None


def test_asof_tolerance_discards_stale_matches(spark):
    from tidier_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, "2024-01-01 02:00:00"), (2, "2024-01-01 10:00:00")],
        "id long, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 01:30:00", 10.0), (2, "2024-01-01 01:00:00", 20.0)],
        "id long, ts string, v double",
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {
        r["id"]: r["v_right"]
        for r in asof_join(
            left, right, on="id", time_col="ts", value_cols=["v"],
            tolerance_us=3_600_000_000,
        ).collect()
    }
    # id 1: match 30min old -> kept; id 2: match 9h old -> discarded
    assert got == {1: 10.0, 2: None}


def test_time_weighted_avg_known_values(spark):
    from tidier_spark.operators.temporal import time_weighted_avg

    # one user, one day bucket: v=10 holds 6h, v=20 holds 6h, v=40 holds
    # to the bucket edge (12h) -> TWA = (10*6 + 20*6 + 40*12)/24 = 27.5
    rows = [
        (1, "2024-01-05 00:00:00", 1, 10.0),
        (1, "2024-01-05 06:00:00", 2, 20.0),
        (1, "2024-01-05 12:00:00", 3, 40.0),
        # second user: single sample at 23:00 holds 1h -> TWA = its value
        (2, "2024-01-05 23:00:00", 4, 7.25),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts string, event_id long, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {
        r["user_id"]: (r["twa_num"], r["twa_den"], r["twa100"])
        for r in time_weighted_avg(
            df, "user_id", "ts", "value", "event_id", bucket_seconds=86400
        ).collect()
    }
    h = 3_600_000_000
    assert got[1] == (
        1000 * 6 * h + 2000 * 6 * h + 4000 * 12 * h,
        24 * h,
        (1000 * 6 + 2000 * 6 + 4000 * 12) / 24,
    )
    assert got[2] == (725 * h, h, 725.0)


def test_overlap_join_matches_naive_and_dedups(spark):
    from tidier_spark.operators.temporal import overlap_join

    # spans crafted to cross multiple buckets (bucket=1h, spans up to 5h)
    left = spark.createDataFrame(
        [(1, "2024-01-01 00:30:00", "2024-01-01 05:30:00", "k"),
         (2, "2024-01-01 06:00:00", "2024-01-01 06:10:00", "k"),
         (3, "2024-01-01 00:00:00", "2024-01-01 00:00:00", "k")],  # empty
        "lid long, l_s string, l_e string, g string",
    ).selectExpr("lid", "CAST(l_s AS TIMESTAMP) l_s", "CAST(l_e AS TIMESTAMP) l_e", "g")
    right = spark.createDataFrame(
        [(10, "2024-01-01 04:00:00", "2024-01-01 09:00:00", "k"),
         (11, "2024-01-01 05:30:00", "2024-01-01 06:05:00", "k"),
         (12, "2024-01-01 00:00:00", "2024-01-01 01:00:00", "x")],  # other key
        "rid long, r_s string, r_e string, g string",
    ).selectExpr("rid", "CAST(r_s AS TIMESTAMP) r_s", "CAST(r_e AS TIMESTAMP) r_e", "g")
    got = sorted(
        (r["lid"], r["rid"])
        for r in overlap_join(
            left, right,
            left_start="l_s", left_end="l_e",
            right_start="r_s", right_end="r_e",
            on="g", bucket_seconds=3600,
        ).collect()
    )
    # pair (1,10) shares buckets 4 and 5 — must appear exactly ONCE;
    # (1,11) touch at 05:30 (half-open: l_e=05:30 excluded -> no match);
    # (2,10) and (2,11) overlap; empty interval 3 matches nothing;
    # rid 12 is another key
    assert got == [(1, 10), (2, 10), (2, 11)]


def test_funnel_windowed_enforces_time_bound(spark):
    from tidier_spark.operators.temporal import funnel_windowed

    rows = [
        # u1: click 30min after view -> within 1h window
        (1, "2024-01-01 00:00:00", "view"),
        (1, "2024-01-01 00:30:00", "click"),
        # u2: click 2h after view -> OUTSIDE the 1h window
        (2, "2024-01-01 00:00:00", "view"),
        (2, "2024-01-01 02:00:00", "click"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts string, event_type string"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {
        r["user_id"]: r["stage"]
        for r in funnel_windowed(
            df, "user_id", "ts", "event_type", ["view", "click"],
            within_us=3_600_000_000,
        ).collect()
    }
    assert got == {1: 2, 2: 1}


def test_linear_attribution_splits_evenly(spark):
    from tidier_spark.operators.temporal import linear_attribution

    touches = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 100),
         (1, "2024-01-01 00:30:00", 101),
         (1, "2024-01-03 00:00:00", 102)],  # outside lookback of the conv
        "user_id long, ts string, tid long",
    ).withColumn("ts", F.to_timestamp("ts"))
    convs = spark.createDataFrame(
        [(1, "2024-01-01 01:00:00", 900, 10.0)],
        "user_id long, ts string, cid long, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {
        r["tid"]: (r["touched_cents"], r["n_convs"], r["credit_fp"])
        for r in linear_attribution(
            touches, convs, "user_id", "ts", "ts", "tid", "cid", "value",
            lookback_us=2 * 3_600_000_000,
        ).collect()
    }
    # 1000 cents split over 2 in-window touches -> 500 cents = 5e8 fp each
    assert got == {100: (1000, 1, 500_000_000), 101: (1000, 1, 500_000_000)}
    # half-open boundary: with exactly 1h lookback the 00:00 touch sits AT
    # ct - L and is excluded -> the 00:30 touch takes full credit
    got1h = {
        r["tid"]: r["credit_fp"]
        for r in linear_attribution(
            touches, convs, "user_id", "ts", "ts", "tid", "cid", "value",
            lookback_us=3_600_000_000,
        ).collect()
    }
    assert got1h == {101: 1_000_000_000}


def test_gapfill_linear_interpolates_known_values(spark):
    from tidier_spark.operators.temporal import time_bucket_gapfill

    # u1: v=10.00 on day 1, v=40.00 on day 4 -> gaps on days 2,3 get
    # 10 + (30*1/3)=20 and 10 + (30*2/3)=30 (exact integer pennies)
    rows = [
        (1, "2024-01-01 05:00:00", 10.0),
        (1, "2024-01-04 07:00:00", 40.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = sorted(
        (r["bucket_us"], r["n"], r["v100"], r["filled"])
        for r in time_bucket_gapfill(
            df, "user_id", "ts", "value", bucket_seconds=86400, fill="linear"
        ).collect()
    )
    day = 86_400_000_000
    d1 = out[0][0]
    assert out == [
        (d1, 1, 1000, False),
        (d1 + day, 0, 2000, True),
        (d1 + 2 * day, 0, 3000, True),
        (d1 + 3 * day, 1, 4000, False),
    ]


def test_gapfill_linear_descending_truncates_toward_zero(spark):
    from tidier_spark.operators.temporal import time_bucket_gapfill

    # descending 10.00 -> 0.01 over 3 days: day-2 gap interpolates
    # 1000 + trunc(-999/2) = 1000 - 499 = 501 (truncation toward zero,
    # mirrored on both engines)
    rows = [
        (1, "2024-01-01 00:00:00", 10.0),
        (1, "2024-01-03 00:00:00", 0.01),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {
        r["bucket_us"]: r["v100"]
        for r in time_bucket_gapfill(
            df, "user_id", "ts", "value", bucket_seconds=86400, fill="linear"
        ).collect()
    }
    day = 86_400_000_000
    d1 = min(out)
    assert out[d1 + day] == 1000 - 499


def test_asof_tolerance_measures_distance_to_supplying_row(spark):
    from tidier_spark.operators.temporal import asof_join

    # the nearest right row carries a NULL value; the value is supplied
    # by a much older row — tolerance must judge THAT row's distance
    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00")], "id long, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 5.0),     # 10h old, carries the value
         (1, "2024-01-01 09:59:00", None)],   # 1min old, NULL value
        "id long, ts string, v double",
    ).withColumn("ts", F.to_timestamp("ts"))
    got = asof_join(
        left, right, on="id", time_col="ts", value_cols=["v"],
        tolerance_us=3_600_000_000,  # 1h
    ).collect()[0]
    # the 10h-old supplying row is far outside tolerance -> NULL
    assert got["v_right"] is None
    # without tolerance the stale value flows (documented ignorenulls)
    got2 = asof_join(
        left, right, on="id", time_col="ts", value_cols=["v"]
    ).collect()[0]
    assert got2["v_right"] == 5.0


def test_gapfill_linear_skips_null_value_anchor(spark):
    from tidier_spark.operators.temporal import time_bucket_gapfill

    # day1 v=10, day2 observed but NULL value, day4 v=40: day2 AND day3
    # both interpolate on the day1->day4 slope (1000 + k*1000)
    rows = [
        (1, "2024-01-01 00:00:00", 10.0),
        (1, "2024-01-02 00:00:00", None),
        (1, "2024-01-04 00:00:00", 40.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = sorted(
        (r["bucket_us"], r["v100"])
        for r in time_bucket_gapfill(
            df, "user_id", "ts", "value", bucket_seconds=86400, fill="linear"
        ).collect()
    )
    day = 86_400_000_000
    d1 = out[0][0]
    assert out == [
        (d1, 1000), (d1 + day, 2000), (d1 + 2 * day, 3000), (d1 + 3 * day, 4000)
    ]


def test_overlap_join_pre_epoch_intervals(spark):
    from tidier_spark.operators.temporal import overlap_join

    # spans straddling 1970: floor bucketing must keep the overlap
    left = spark.createDataFrame(
        [(1, "1969-12-31 23:30:00", "1970-01-01 00:30:00")],
        "lid long, l_s string, l_e string",
    ).selectExpr("lid", "CAST(l_s AS TIMESTAMP) l_s", "CAST(l_e AS TIMESTAMP) l_e")
    right = spark.createDataFrame(
        [(10, "1969-12-31 23:45:00", "1970-01-01 00:15:00"),
         (11, "1969-12-30 00:00:00", "1969-12-30 01:00:00")],  # no overlap
        "rid long, r_s string, r_e string",
    ).selectExpr("rid", "CAST(r_s AS TIMESTAMP) r_s", "CAST(r_e AS TIMESTAMP) r_e")
    got = sorted(
        (r["lid"], r["rid"])
        for r in overlap_join(
            left, right, left_start="l_s", left_end="l_e",
            right_start="r_s", right_end="r_e", bucket_seconds=3600,
        ).collect()
    )
    assert got == [(1, 10)]


def test_interval_join_pre_epoch_points(spark):
    from pyspark.sql import functions as F

    from tidier_spark.operators.temporal import interval_join

    pts = spark.createDataFrame(
        [(1, "1969-12-31 23:45:00"), (2, "1969-12-30 00:00:00")],
        "pid long, ts string",
    ).selectExpr("pid", "CAST(ts AS TIMESTAMP) AS ts")
    iv = spark.createDataFrame(
        [(10, "1969-12-31 23:30:00", "1970-01-01 00:30:00")],
        "iid long, s string, e string",
    ).selectExpr("iid", "CAST(s AS TIMESTAMP) s", "CAST(e AS TIMESTAMP) e")
    got = {
        (r["pid"], r["iid"])
        for r in interval_join(
            pts, iv, time_col="ts", start_col="s", end_col="e",
            bucket_seconds=3600,
        ).collect()
    }
    assert got == {(1, 10)}


def test_asof_nearest_prefers_nearest_supplying_row(spark):
    from tidier_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, "2024-01-01 00:01:40")], "id long, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 00:01:30", 5.0),    # backward supplier, 10s away
         (1, "2024-01-01 00:01:39", None),   # nearest backward ROW, NULL
         (1, "2024-01-01 00:01:41", 7.0)],   # forward supplier, 1s away
        "id long, ts string, v double",
    ).withColumn("ts", F.to_timestamp("ts"))
    got = asof_join(
        left, right, on="id", time_col="ts", value_cols=["v"],
        direction="nearest",
    ).collect()[0]
    # the genuinely nearest NON-NULL supplier is the forward row (1s)
    assert got["v_right"] == 7.0


def test_gapfill_and_twa_pre_epoch_match_duckdb(spark):
    """Pre-1970 timestamps: Spark floor-buckets (`_floordiv`), and the
    DuckDB mirrors must apply the same sign correction — DuckDB's `//`
    truncates toward zero (-7h // 1day = 0, not -1), so a bare
    `epoch_us // b * b` mirror silently lands pre-epoch rows in the
    wrong bucket.  Differential over every fill mode pins it down."""
    import duckdb

    from tidier_spark.operators.temporal import (
        time_bucket_gapfill,
        time_bucket_gapfill_sql,
        time_weighted_avg,
        time_weighted_avg_sql,
    )

    rows = [
        (1, 1, "1969-12-29 06:00:00", 10.0),
        (1, 2, "1969-12-31 23:00:00", 20.0),  # floor: day -1; trunc: day 0
        (1, 3, "1970-01-02 01:00:00", 40.0),
        (2, 4, "1969-12-31 00:00:00", 5.0),
        (2, 5, "1969-12-31 12:00:00", 7.25),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    day = 86_400_000_000

    # the regression itself: the 23:00 pre-epoch row belongs to day -1
    got_buckets = {
        (r["user_id"], r["bucket_us"])
        for r in time_bucket_gapfill(
            df, "user_id", "ts", "value", bucket_seconds=86400, fill="null"
        ).collect()
        if r["n"] > 0
    }
    assert (1, -day) in got_buckets and (1, 0) not in got_buckets

    con = duckdb.connect()
    try:
        con.register("pe_events", df.toPandas())
        for fill in ("locf", "zero", "null", "linear"):
            got = sorted(
                tuple(r)
                for r in time_bucket_gapfill(
                    df, "user_id", "ts", "value",
                    bucket_seconds=86400, fill=fill,
                ).collect()
            )
            want = sorted(
                tuple(r)
                for r in con.execute(
                    time_bucket_gapfill_sql(
                        "pe_events", "user_id", "ts", "value", 86400, fill
                    )
                ).fetchall()
            )
            assert got == want, f"gapfill fill={fill} pre-epoch mismatch"

        got = sorted(
            (r["user_id"], r["bucket_us"], r["twa_num"], r["twa_den"])
            for r in time_weighted_avg(
                df, "user_id", "ts", "value", "event_id",
                bucket_seconds=86400,
            ).collect()
        )
        want = sorted(
            (r[0], r[1], r[2], r[3])
            for r in con.execute(
                time_weighted_avg_sql(
                    "pe_events", "user_id", "ts", "value", "event_id", 86400
                )
            ).fetchall()
        )
        assert got == want, "time_weighted_avg pre-epoch mismatch"
        assert any(b == -day for (_, b, _, _) in got)
    finally:
        con.close()


def test_asof_tolerance_null_quotes_match_oracle(spark):
    """tolerance_us measures staleness to the row that SUPPLIED the
    value (ignorenulls skips NULL-valued right rows) — the DuckDB
    oracle replicates that by filtering NULL-valued quotes BEFORE its
    native ASOF.  A NULL-valued quote nearer than the supplier is the
    case where a naive nearest-ROW oracle diverges; pin it down."""
    import duckdb

    from tidier_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, 10, "2024-01-01 02:00:00"),   # supplier 1h55m away -> kept
         (1, 11, "2024-01-01 03:30:00"),   # supplier 3h25m away -> dropped
         (2, 12, "2024-01-01 01:00:00")],  # only NULL-valued quotes before
        "user_id long, event_id long, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 00:05:00", 5.0),
         (1, "2024-01-01 01:59:00", None),  # nearest ROW for both trades
         (2, "2024-01-01 00:59:00", None)],
        "user_id long, ts string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    got = sorted(
        (r["event_id"], r["value_right"])
        for r in asof_join(
            left, right, on="user_id", time_col="ts", value_cols=["value"],
            tolerance_us=2 * 3_600_000_000,
        ).collect()
    )
    # a naive oracle measuring to the nearest ROW would keep event 11
    # (1h31m to the NULL row) and emit 5.0 — the honest distance is to
    # the supplying 00:05 row (3h25m), so it nulls out
    assert got == [(10, 5.0), (11, None), (12, None)]

    con = duckdb.connect()
    try:
        con.register("t_l", left.toPandas())
        con.register("t_r", right.toPandas())
        want = sorted(
            tuple(r)
            for r in con.execute("""
                SELECT t.event_id,
                       CASE WHEN epoch_us(t.ts) - epoch_us(q.ts)
                                 <= 7200000000
                            THEN q.value END AS value_right
                FROM t_l t
                ASOF LEFT JOIN (SELECT * FROM t_r
                                WHERE value IS NOT NULL) q
                  ON t.user_id = q.user_id AND t.ts >= q.ts
            """).fetchall()
        )
        assert got == want
    finally:
        con.close()


def test_interval_merge_hand_case(spark):
    import datetime as dt

    from tidier_spark.operators.temporal import interval_merge

    t0 = dt.datetime(2024, 1, 1)

    def ts(s):
        return t0 + dt.timedelta(seconds=s)

    rows = [
        ("a", ts(0), ts(10)),
        ("a", ts(5), ts(15)),   # overlaps -> merges
        ("a", ts(15), ts(18)),  # touches end exactly (gap 0) -> merges
        ("a", ts(30), ts(40)),  # separate
        ("a", ts(32), ts(33)),  # nested -> merges into [30,40]
        ("b", ts(0), ts(1)),    # other key untouched
    ]
    df = spark.createDataFrame(rows, "k string, s timestamp, e timestamp")
    got = {
        (r["k"], r["merge_start_us"], r["merge_end_us"], r["n_intervals"])
        for r in interval_merge(df, "s", "e", by="k").collect()
    }
    us = 1_000_000
    t0us = int(t0.replace(tzinfo=dt.timezone.utc).timestamp()) * us
    assert got == {
        ("a", t0us + 0, t0us + 18 * us, 3),
        ("a", t0us + 30 * us, t0us + 40 * us, 2),
        ("b", t0us + 0, t0us + 1 * us, 1),
    }


def test_interval_merge_gap_bridges(spark):
    import datetime as dt

    from tidier_spark.operators.temporal import interval_merge

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        ("a", t0, t0 + dt.timedelta(seconds=10)),
        ("a", t0 + dt.timedelta(seconds=14), t0 + dt.timedelta(seconds=20)),
    ]
    df = spark.createDataFrame(rows, "k string, s timestamp, e timestamp")
    assert interval_merge(df, "s", "e", by="k").count() == 2
    merged = interval_merge(df, "s", "e", by="k", gap_seconds=5).collect()
    assert len(merged) == 1 and merged[0]["n_intervals"] == 2


def test_interval_merge_oracle(tables, sf_dir):
    from tidier_spark.operators.temporal import interval_merge, interval_merge_sql

    ev = tables["events"]
    dur_us = (
        F.pmod(F.round(F.col("value") * 100).cast("long"), F.lit(3600)) + 60
    ) * 1_000_000
    iv = ev.select(
        "user_id",
        F.col("ts").alias("s_ts"),
        F.timestamp_micros(F.unix_micros(F.col("ts")) + dur_us).alias("e_ts"),
    )
    dur = "(60 + ((CAST(round(value * 100) AS BIGINT) % 3600) + 3600) % 3600)"
    assert_matches_oracle(
        interval_merge(iv, "s_ts", "e_ts", by="user_id"),
        interval_merge_sql(
            "events", "epoch_us(ts)", f"epoch_us(ts) + {dur} * 1000000",
            by="user_id",
        ),
        sf_dir,
    )


def test_rolling_distinct_nulls_dropped(spark):
    from tidier_spark.operators.temporal import rolling_distinct

    rows = [
        ("a", 1, "x"),
        ("a", 2, None),   # counts in neither column
        ("a", 3, "y"),
        ("a", 4, "x"),    # already seen -> dcum stays 2
    ]
    df = spark.createDataFrame(rows, "k string, i long, v string")
    got = {
        r["i"]: (r["droll"], r["dcum"])
        for r in rolling_distinct(
            df, "v", by="k", order_by=["i"], frame_rows=2
        ).collect()
    }
    assert got == {1: (1, 1), 2: (1, 1), 3: (1, 2), 4: (2, 2)}


def test_rolling_distinct_oracle(tables, sf_dir):
    from tidier_spark.operators.temporal import (
        rolling_distinct,
        rolling_distinct_sql,
    )

    r = rolling_distinct(
        tables["events"],
        "event_type",
        by="user_id",
        order_by=["ts", "event_id"],
        frame_rows=20,
    ).select("event_id", "droll", "dcum")
    assert_matches_oracle(
        r,
        rolling_distinct_sql(
            "events", "event_type",
            by="user_id", order_by=["ts", "event_id"],
            frame_rows=20, select="event_id",
        ),
        sf_dir,
    )
