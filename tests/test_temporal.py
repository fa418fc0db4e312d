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
