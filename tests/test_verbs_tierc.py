"""Verbs, Tier C (pandas escape hatch), and streaming tests."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from helpers import assert_matches_oracle
from tidier_spark import (
    arrange,
    count,
    desc,
    frame_apply,
    grouped_apply,
    mutate,
    slice_max,
    slice_sample,
    summarise,
)


def test_summarise_oracle(tables, sf_dir):
    r = summarise(
        tables["lineitem"],
        sum_qty="sum(l_quantity)",
        n="n()",
        avg_price="avg(round(l_extendedprice * 100)) / 100",
        by=["l_returnflag", "l_linestatus"],
    )
    assert_matches_oracle(
        r,
        """SELECT l_returnflag, l_linestatus,
                  sum(l_quantity) AS sum_qty,
                  count(*) AS n,
                  avg(round(l_extendedprice * 100)) / 100 AS avg_price
           FROM lineitem GROUP BY 1, 2""",
        sf_dir,
    )


def test_count_and_arrange(tables, sf_dir):
    r = arrange(count(tables["orders"], "o_orderpriority"), desc("n"), "o_orderpriority")
    assert_matches_oracle(
        r,
        "SELECT o_orderpriority, count(*) AS n FROM orders GROUP BY 1",
        sf_dir,
    )


def test_slice_max_oracle(tables, sf_dir):
    r = slice_max(
        tables["orders"], "o_totalprice", n=2, by="o_custkey", with_ties=False
    ).select("o_orderkey")
    assert_matches_oracle(
        r,
        """SELECT o_orderkey FROM (
             SELECT o_orderkey,
                    row_number() OVER (PARTITION BY o_custkey
                                       ORDER BY o_totalprice DESC) AS rk
             FROM orders) WHERE rk <= 2""",
        sf_dir,
    )


def test_slice_sample_deterministic(tables):
    a = slice_sample(tables["orders"], 0.5, seed=7).count()
    b = slice_sample(tables["orders"], 0.5, seed=7).count()
    assert a == b and 0 < a < tables["orders"].count()


def test_frame_apply_matches_builtin(tables, sf_dir):
    # Tier C numpy reducer vs Tier A built-in for the same frame: identical.
    ev = tables["events"]
    r = mutate(
        ev,
        {"med": frame_apply(lambda a: float(np.mean(a)), "value")},
        by="user_id",
        order_by=["ts", "event_id"],
        frame=(3, 0),
    ).select("event_id", F.round("med", 6).alias("med"))
    builtin = mutate(
        ev,
        med="round(avg(value), 6)",
        by="user_id",
        order_by=["ts", "event_id"],
        frame=(3, 0),
    ).select("event_id", "med")
    got = {r["event_id"]: r["med"] for r in r.collect()}
    want = {r["event_id"]: r["med"] for r in builtin.collect()}
    assert got == want


def test_frame_apply_true_python_logic(tables):
    # A reducer with no SQL spelling: second-largest value in the frame.
    ev = tables["events"]
    r = mutate(
        ev,
        {"second_max": frame_apply(
            lambda a: float(np.sort(a)[-2]) if len(a) >= 2 else float("nan"), "value"
        )},
        by="user_id",
        order_by=["ts", "event_id"],
        frame=(5, 0),
    )
    rows = r.select("second_max").limit(50).collect()
    assert any(x["second_max"] == x["second_max"] for x in rows)  # non-NaN exists


def test_frame_apply_multicolumn(tables, sf_dir):
    # Multi-column frame reducer (reference summarise context accepts any
    # expression over any frame columns, R/mutate.R:208): value-weighted
    # mean of user_id over the frame, vs the Tier A SQL spelling.
    ev = tables["events"].withColumn("w", F.abs(F.round("value")) + F.lit(1))
    r = mutate(
        ev,
        {"wavg": frame_apply(
            lambda f: float((f.user_id * f.w).sum() / f.w.sum()), ["user_id", "w"]
        )},
        by="user_id",
        order_by=["ts", "event_id"],
        frame=(3, 0),
    ).select("event_id", F.round("wavg", 6).alias("wavg"))
    builtin = mutate(
        ev,
        wavg="round(sum(user_id * w) / sum(w), 6)",
        by="user_id",
        order_by=["ts", "event_id"],
        frame=(3, 0),
    ).select("event_id", "wavg")
    got = {r["event_id"]: r["wavg"] for r in r.collect()}
    want = {r["event_id"]: r["wavg"] for r in builtin.collect()}
    assert got == want


def test_grouped_apply_zscore(tables):
    # nest+future_map analog: per-group normalization.
    def zscore(pdf):
        std = pdf["value"].std(ddof=1)
        pdf = pdf.assign(z=(pdf["value"] - pdf["value"].mean()) / (std or 1.0))
        return pdf[["user_id", "event_id", "z"]]

    r = grouped_apply(
        tables["events"], "user_id", zscore, "user_id long, event_id long, z double"
    )
    stats = r.groupBy("user_id").agg(F.round(F.avg("z"), 6).alias("mz")).collect()
    assert all(abs(s["mz"]) < 1e-6 for s in stats)


def test_stream_windowed_agg_batch_parity(tables, sf_dir):
    # The window bucketing runs identically on batch frames — oracle-check
    # the bucket math there (streaming execution covered below).
    from tidier_spark.streaming import stream_windowed_agg

    r = stream_windowed_agg(
        tables["events"],
        {"n": "count(*)", "sum_v": "sum(round(value * 100)) / 100"},
        time_col="ts",
        window="1 day",
        by="event_type",
    ).select("window_start", "event_type", "n", "sum_v")
    assert_matches_oracle(
        r.withColumn("window_start", F.col("window_start").cast("string")),
        """SELECT CAST(time_bucket(INTERVAL 1 DAY, ts) AS VARCHAR) AS window_start,
                  event_type, count(*) AS n,
                  sum(round(value * 100)) / 100 AS sum_v
           FROM events GROUP BY 1, 2""",
        sf_dir,
    )


def test_stream_trailing_agg_streaming(spark, sf_dir, tmp_path):
    # Real streaming execution: parquet source → availableNow → memory sink,
    # then compare against the batch window-frame result (same semantics).
    import math

    from tidier_spark.sources import read_table
    from tidier_spark.streaming import stream_trailing_agg

    ev = read_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    src_dir = str(tmp_path / "events_src")
    ev.write.mode("overwrite").parquet(src_dir)

    stream = spark.readStream.schema(ev.schema).parquet(src_dir)
    out = stream_trailing_agg(
        stream,
        key_col="user_id",
        time_col="ts",
        value_col="value",
        trailing_seconds=3600,
        # bounded replay: processing-time expiry would keep the engine
        # spinning empty micro-batches until the awaitTermination deadline
        timeout_minutes=None,
    )
    q = (
        out.writeStream.format("memory")
        .queryName("trail_test")
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    assert q.awaitTermination(120), "trailing replay did not finish"
    got = {
        (r["key"], r["ts"]): round(r["trail_avg"], 6)
        for r in spark.sql("SELECT * FROM trail_test").collect()
    }
    assert got, "streaming query produced no rows"

    from tidier_spark import mutate, seconds

    batch = mutate(
        ev,
        trail_avg="avg(value)",
        by="user_id",
        index="ts",
        frame=(seconds(3600), seconds(0)),
    )
    want = {
        (r["user_id"], r["ts"]): round(r["trail_avg"], 6) for r in batch.collect()
    }
    # closed-bound trailing span == batch range frame: exact agreement
    matched = sum(1 for k, v in got.items() if want.get(k) == v)
    assert matched == len(got), f"only {matched}/{len(got)} matched"

def test_salted_agg_matches_plain(tables, sf_dir):
    from tidier_spark.skew import salted_agg

    r = salted_agg(
        tables["lineitem"],
        "l_returnflag",
        {
            "n": "count(*)",
            "sq": "sum(l_quantity)",
            "mn": "min(l_quantity)",
            "mx": "max(l_quantity)",
            "av": "avg(l_quantity)",
        },
        n_salts=8,
    )
    assert_matches_oracle(
        r,
        """SELECT l_returnflag, count(*) AS n, sum(l_quantity) AS sq,
                  min(l_quantity) AS mn, max(l_quantity) AS mx,
                  avg(l_quantity) AS av
           FROM lineitem GROUP BY 1""",
        sf_dir,
    )


def test_salted_agg_rejects_nonalgebraic(tables):
    import pytest as _pytest

    from tidier_spark.skew import salted_agg

    with _pytest.raises(ValueError, match="salted_agg supports"):
        salted_agg(tables["lineitem"], "l_returnflag", {"m": "median(l_quantity)"})


def test_skew_join_matches_plain(tables):
    from collections import Counter

    from tidier_spark.skew import skew_join

    li = tables["lineitem"].select("l_partkey", "l_quantity")
    p = tables["part"].select(
        F.col("p_partkey").alias("l_partkey"), "p_brand"
    )
    for how in ("inner", "left"):
        plain = Counter(
            (r["l_partkey"], r["l_quantity"], r["p_brand"])
            for r in li.join(p, "l_partkey", how).collect()
        )
        split = Counter(
            (r["l_partkey"], r["l_quantity"], r["p_brand"])
            for r in skew_join(li, p, on="l_partkey", how=how, n_hot=8).collect()
        )
        assert split == plain, how


def test_skew_join_left_keeps_unmatched(spark):
    from tidier_spark.skew import skew_join

    left = spark.createDataFrame(
        [(1, "a")] * 5 + [(2, "b"), (3, "c")], ["k", "v"]
    )
    right = spark.createDataFrame([(1, "x"), (2, "y")], ["k", "w"])
    rows = {
        (r["k"], r["v"], r["w"])
        for r in skew_join(left, right, on="k", how="left", n_hot=1).collect()
    }
    assert (3, "c", None) in rows
    assert sum(1 for t in rows if t[0] == 1) == 1 and (1, "a", "x") in rows


def test_set_ops_oracle(tables, sf_dir):
    from tidier_spark.verbs import intersect_, setdiff, union_

    hi = tables["orders"].where("o_totalprice > 300000").select("o_custkey")
    urgent = tables["orders"].where("o_orderpriority = '1-URGENT'").select("o_custkey")
    for spark_df, sql in [
        (union_(hi, urgent),
         """SELECT o_custkey FROM orders WHERE o_totalprice > 300000
            UNION SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'"""),
        (intersect_(hi.distinct(), urgent.distinct()),
         """SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 300000
            INTERSECT SELECT DISTINCT o_custkey FROM orders
            WHERE o_orderpriority = '1-URGENT'"""),
        (setdiff(hi.distinct(), urgent.distinct()),
         """SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 300000
            EXCEPT SELECT DISTINCT o_custkey FROM orders
            WHERE o_orderpriority = '1-URGENT'"""),
    ]:
        assert_matches_oracle(spark_df, sql, sf_dir)


def test_fill_down_oracle(tables, sf_dir):
    from tidier_spark.verbs import fill_down

    ev = tables["events"].withColumn(
        "v", F.when(F.col("event_id") % 3 == 0, None).otherwise(F.col("value"))
    )
    r = fill_down(ev, "v", by="user_id", order_by=["ts", "event_id"]).select(
        "event_id", "v"
    )
    assert_matches_oracle(
        r,
        """SELECT event_id,
                  last_value(v IGNORE NULLS) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v
           FROM (SELECT event_id, user_id, ts,
                        CASE WHEN event_id % 3 = 0 THEN NULL ELSE value END AS v
                 FROM events)""",
        sf_dir,
    )


def test_pct_change_and_diff_oracle(tables, sf_dir):
    from tidier_spark.verbs import diff, pct_change

    r = pct_change(
        diff(tables["events"], "value", by="user_id", order_by=["ts", "event_id"]),
        "value",
        by="user_id",
        order_by=["ts", "event_id"],
    ).select("event_id", "value_diff", F.round("value_pct_change", 6).alias("pc"))
    assert_matches_oracle(
        r,
        """SELECT event_id,
                  value - lag(value) OVER w AS value_diff,
                  round((value - lag(value) OVER w)
                        / nullif(lag(value) OVER w, 0), 6) AS pc
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""",
        sf_dir,
    )


def test_setdiff_is_set_difference(spark):
    # dplyr::setdiff: a row of `a` present anywhere in `b` is removed even
    # if duplicated in `a` (bag-difference+distinct would leave a survivor)
    from tidier_spark.verbs import setdiff

    a = spark.createDataFrame([(1,), (1,), (2,)], ["x"])
    b = spark.createDataFrame([(1,)], ["x"])
    assert {r["x"] for r in setdiff(a, b).collect()} == {2}


def test_pct_change_zero_baseline_yields_null(spark):
    # ANSI mode raises on /0 — the guard must turn a 0 baseline into NULL
    from tidier_spark.verbs import pct_change

    df = spark.createDataFrame([(1, 1, 0.0), (1, 2, 5.0)], ["k", "t", "x"])
    rows = pct_change(df, "x", by="k", order_by="t").orderBy("t").collect()
    assert rows[0]["x_pct_change"] is None  # no previous row
    assert rows[1]["x_pct_change"] is None  # previous value is 0


def test_approx_distinct_tolerance(tables):
    # HLL sketch: no oracle (engines differ by design); assert relative
    # error vs exact within the documented rsd bound.
    exact = tables["orders"].selectExpr("count(DISTINCT o_custkey) AS n").first()["n"]
    approx = tables["orders"].selectExpr(
        "approx_count_distinct(o_custkey, 0.02) AS n"
    ).first()["n"]
    assert abs(approx - exact) / exact < 0.1


def test_pivot_wider_oracle(tables, sf_dir):
    from tidier_spark.verbs import pivot_wider

    r = pivot_wider(
        tables["events"],
        id_cols="user_id",
        names_from="event_type",
        values_from="value",
        values_fn="count",
        names=["click", "view", "purchase", "signup", "error"],
    )
    assert_matches_oracle(
        r,
        """SELECT user_id,
                  count(*) FILTER (event_type = 'click') AS click,
                  count(*) FILTER (event_type = 'view') AS view,
                  count(*) FILTER (event_type = 'purchase') AS purchase,
                  count(*) FILTER (event_type = 'signup') AS signup,
                  count(*) FILTER (event_type = 'error') AS error
           FROM events GROUP BY 1""",
        sf_dir,
    )


def test_pivot_longer_roundtrip(tables):
    from tidier_spark.verbs import pivot_longer

    li = tables["lineitem"].select("l_orderkey", "l_linenumber", "l_quantity", "l_tax")
    long = pivot_longer(li, ["l_quantity", "l_tax"])
    assert long.count() == li.count() * 2
    assert set(long.columns) == {"l_orderkey", "l_linenumber", "name", "value"}
    back = (
        long.groupBy("l_orderkey", "l_linenumber")
        .pivot("name", ["l_quantity", "l_tax"])
        .agg(F.first("value"))
    )
    # (l_orderkey, l_linenumber) is not unique in the synthetic fixture —
    # widening collapses to one row per distinct key pair
    assert back.count() == li.select("l_orderkey", "l_linenumber").distinct().count()


def test_nest_unnest_roundtrip_oracle(tables, sf_dir):
    from tidier_spark.verbs import nest, unnest

    ev = tables["events"].select("user_id", "event_id", "ts", "value")
    nested = nest(ev, by="user_id", sort_by="event_id")
    assert nested.count() == ev.select("user_id").distinct().count()
    flat = unnest(nested)
    # roundtrip equals the original relation (order-insensitive)
    assert_matches_oracle(
        flat.select("user_id", "event_id", "value"),
        "SELECT user_id, event_id, value FROM events",
        sf_dir,
    )


def test_dplyr_expression_helpers(tables, sf_dir):
    from tidier_spark.functions.dplyr import between, case_when, if_else, na_if, replace_na

    ev = tables["events"]
    r = ev.select(
        "event_id",
        case_when(
            ("value > 400", "'high'"),
            ("value > 200", "'mid'"),
            default="'low'",
        ).alias("band"),
        if_else("event_type = 'error'", 1, 0).alias("is_err"),
        replace_na(na_if("event_type", "'error'"), "'ok'").alias("et"),
        between("value", 100, 200).alias("mid_range"),
    )
    assert_matches_oracle(
        r,
        """SELECT event_id,
                  CASE WHEN value > 400 THEN 'high'
                       WHEN value > 200 THEN 'mid' ELSE 'low' END AS band,
                  CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS is_err,
                  coalesce(nullif(event_type, 'error'), 'ok') AS et,
                  value BETWEEN 100 AND 200 AS mid_range
           FROM events""",
        sf_dir,
    )


def test_grouping_sets_oracle(tables, sf_dir):
    r = summarise(
        tables["lineitem"],
        sum_qty="sum(l_quantity)",
        n="n()",
        grouping_sets=[["l_returnflag", "l_linestatus"], ["l_linestatus"], []],
    )
    assert_matches_oracle(
        r,
        """SELECT l_returnflag, l_linestatus,
                  sum(l_quantity) AS sum_qty, count(*) AS n
           FROM lineitem
           GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                   (l_linestatus), ())""",
        sf_dir,
    )


def test_hll_partials_merge_within_tolerance(tables):
    # Mergeability: sketches built per order-month, unioned per priority,
    # must estimate within ~3σ (lg_k=12 → rsd ≈ 1.6%) of the exact count.
    from tidier_spark.operators.sketches import hll_merge, hll_partials

    o = tables["orders"].withColumn("m", F.trunc("o_orderdate", "month"))
    parts = hll_partials(o, "o_custkey", by="o_orderpriority", part="m")
    merged = {
        r["o_orderpriority"]: r["approx_n_merged"]
        for r in hll_merge(parts, by="o_orderpriority").collect()
    }
    exact = {
        r["o_orderpriority"]: r["n"]
        for r in o.groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    assert merged.keys() == exact.keys()
    for k, n in exact.items():
        assert abs(merged[k] - n) <= 0.05 * n, (k, merged[k], n)


def test_across_builds_expr_dict(tables, sf_dir):
    from tidier_spark.verbs import across, summarise

    d = across(["x", "y"], ["mean", "max"])
    assert d == {
        "x_mean": "mean(x)", "x_max": "max(x)",
        "y_mean": "mean(y)", "y_max": "max(y)",
    }
    d2 = across(["x"], {"p90": "percentile({col}, 0.9)"}, names="{fn}_of_{col}")
    assert d2 == {"p90_of_x": "percentile(x, 0.9)"}
    r = summarise(
        tables["lineitem"],
        across(["l_quantity"], {"s": "cast(sum(round({col}*100)) as long)"}),
        by="l_returnflag",
    )
    assert_matches_oracle(
        r,
        """SELECT l_returnflag,
                  sum(round(l_quantity*100))::BIGINT AS l_quantity_s
           FROM lineitem GROUP BY 1""",
        sf_dir,
    )


def test_scale_features_methods(spark):
    from tidier_spark.operators.quality import scale_features

    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("a", 3), ("b", 7), ("b", 7)], ["g", "x"]
    )
    z = {
        (r["g"], r["x"]): r["x_scaled"]
        for r in scale_features(df, ["x"], "zscore", by="g").collect()
    }
    assert abs(z[("a", 2)]) < 1e-12 and abs(z[("a", 3)] - 1.0) < 1e-12
    assert z[("b", 7)] is None  # constant column → NULL, not a crash
    mm = {
        (r["g"], r["x"]): r["x_scaled"]
        for r in scale_features(df, ["x"], "minmax", by="g").collect()
    }
    assert mm[("a", 1)] == 0.0 and mm[("a", 3)] == 1.0
    assert mm[("b", 7)] is None  # constant column → NULL, not a crash
    rb = {
        (r["g"], r["x"]): r["x_scaled"]
        for r in scale_features(df, ["x"], "robust", by="g").collect()
    }
    assert rb[("a", 2)] == 0.0 and rb[("a", 3)] == 1.0


def test_topk_sketch_merge_exact_when_tracked(tables):
    # Heavy-hitters mergeability: partial sketches sliced per month fold
    # into the same top-k as exact counting whenever maxItemsTracked
    # covers the distinct cardinality (no eviction → exact counts), with
    # the deterministic (freq desc, item asc) re-rank.
    from tidier_spark.operators.sketches import topk_merged, topk_partials

    o = tables["orders"].withColumn("m", F.trunc("o_orderdate", "month"))
    parts = topk_partials(o, "o_custkey", part="m", max_items_tracked=50_000)
    got = [
        (r["item"], r["est_freq"], r["topk_rank"])
        for r in topk_merged(parts, 5, max_items_tracked=50_000)
        .orderBy("topk_rank")
        .collect()
    ]
    exact = o.groupBy("o_custkey").count().collect()
    ranked = sorted(exact, key=lambda r: (-r["count"], r["o_custkey"]))[:5]
    want = [(r["o_custkey"], r["count"], i + 1) for i, r in enumerate(ranked)]
    assert got == want


def test_approx_quantiles_rank_contract(tables):
    from tidier_spark.operators.sketches import approx_quantiles

    li = tables["lineitem"].withColumn("p100", F.round(F.col("l_extendedprice") * 100))
    got = {
        r["l_returnflag"]: r["approx_q"]
        for r in approx_quantiles(
            li, "p100", [0.5, 0.9], by="l_returnflag"
        ).collect()
    }
    exact = {
        r["l_returnflag"]: (r["p50"], r["p90"])
        for r in li.groupBy("l_returnflag")
        .agg(
            F.expr("percentile(p100, 0.5)").alias("p50"),
            F.expr("percentile(p100, 0.9)").alias("p90"),
        )
        .collect()
    }
    for k, (p50, p90) in exact.items():
        assert abs(got[k][0] - p50) <= 0.02 * p50
        assert abs(got[k][1] - p90) <= 0.02 * p90


def test_run_stream_equals_batch(spark, sf_dir):
    # The REAL streaming engine (availableNow, state store, memory sink)
    # must produce byte-identical results to the batch plan.
    from tidier_spark.sources import read_stream_table, read_table
    from tidier_spark.streaming import run_stream, stream_windowed_agg

    exprs = {"n": "count(*)", "sum_v": "sum(round(value * 100)) / 100"}
    kw = dict(time_col="ts", window="1 day", by="event_type")
    streamed = run_stream(
        stream_windowed_agg(read_stream_table(spark, sf_dir, "events"), exprs, **kw),
        name="t_run_stream_parity",
        output_mode="complete",
    )
    batch = stream_windowed_agg(read_table(spark, sf_dir, "events"), exprs, **kw)
    key = lambda r: (r["window_start"], r["event_type"])  # noqa: E731
    got = {key(r): (r["n"], r["sum_v"]) for r in streamed.collect()}
    want = {key(r): (r["n"], r["sum_v"]) for r in batch.collect()}
    assert got == want


def test_complete_fills_missing_combos(spark):
    from tidier_spark import complete

    df = spark.createDataFrame(
        [(1, "a", 10.0), (1, "b", 20.0), (2, "a", 30.0)], "k int, g string, v double"
    )
    got = {
        (r["k"], r["g"]): r["v"]
        for r in complete(df, "k", "g", fill={"v": 0.0}).collect()
    }
    assert got == {(1, "a"): 10.0, (1, "b"): 20.0, (2, "a"): 30.0, (2, "b"): 0.0}


def test_complete_nesting_uses_observed_combos(spark):
    # a tuple factor is tidyr::nesting(): only OBSERVED (k, g) pairs are
    # expanded (one composite distinct — no per-column cross), still
    # crossed against the other factors
    from tidier_spark import complete

    df = spark.createDataFrame(
        [(1, "a", "x", 10.0), (1, "b", "x", 20.0), (2, "a", "y", 30.0)],
        "k int, g string, s string, v double",
    )
    rows = {
        (r["k"], r["g"], r["s"]): r["v"]
        for r in complete(df, ("k", "g"), "s", fill={"v": 0.0}).collect()
    }
    # observed (k,g) pairs: (1,a),(1,b),(2,a) — never (2,b) — crossed by s
    assert rows == {
        (1, "a", "x"): 10.0,
        (1, "a", "y"): 0.0,
        (1, "b", "x"): 20.0,
        (1, "b", "y"): 0.0,
        (2, "a", "x"): 0.0,
        (2, "a", "y"): 30.0,
    }


def test_stream_dedup_drops_replayed_rows(spark, sf_dir):
    # at-least-once simulation: the same source unioned with itself (every
    # event delivered twice); dropDuplicatesWithinWatermark must restore
    # exactly-once row counts through the real streaming engine
    from tidier_spark.sources import read_stream_table, read_table
    from tidier_spark.streaming import run_stream, stream_dedup

    doubled = read_stream_table(spark, sf_dir, "events").unionByName(
        read_stream_table(spark, sf_dir, "events")
    )
    deduped = stream_dedup(doubled, ["event_id"], "ts", watermark="1 hour")
    got = run_stream(
        deduped.select("event_id"),
        name="t_stream_dedup",
        output_mode="append",
    )
    n_batch = read_table(spark, sf_dir, "events").count()
    assert got.count() == n_batch
    assert got.distinct().count() == n_batch


def test_kll_partials_merge_rank_contract(tables):
    # merged per-month KLL sketches must land within +-2% rank of exact
    from pyspark.sql import functions as F

    from tidier_spark.operators.sketches import kll_merged_quantiles, kll_partials

    li = tables["lineitem"].withColumn(
        "p100", F.round(F.col("l_extendedprice") * 100).cast("long")
    )
    parts = kll_partials(
        li.withColumn("m", F.trunc("l_shipdate", "month")), "p100", part="m"
    )
    est = kll_merged_quantiles(parts, [0.5]).collect()[0]["approx_q"][0]
    lo, hi = (
        li.agg(F.expr("percentile(p100, array(0.48, 0.52))")).collect()[0][0]
    )
    assert lo <= est <= hi, (lo, est, hi)


def test_theta_overlap_known_sets(spark):
    # A = {0..599}, B = {400..999}: |A|=600 |B|=600 |A∪B|=1000 |A∩B|=200
    from pyspark.sql import functions as F

    from tidier_spark.operators.sketches import theta_overlap

    df = spark.range(1200).selectExpr(
        "CASE WHEN id < 600 THEN 'a' ELSE 'b' END AS seg",
        "CASE WHEN id < 600 THEN id ELSE id - 200 END AS u",
    )
    r = theta_overlap(df, "u", "seg", "a", "b").collect()[0]
    # lg_k=12 >> set size: estimates are exact in this regime
    assert (r.n_a, r.n_b, r.n_union, r.n_intersection) == (600, 600, 1000, 200)


def test_theta_merge_partials(tables):
    from pyspark.sql import functions as F

    from tidier_spark.operators.sketches import theta_merge, theta_partials

    o = tables["orders"].withColumn("m", F.trunc("o_orderdate", "month"))
    parts = theta_partials(o, "o_custkey", by="o_orderpriority", part="m")
    merged = {
        r.o_orderpriority: r.approx_n_merged
        for r in theta_merge(parts, by="o_orderpriority").collect()
    }
    exact = {
        r.o_orderpriority: r.n
        for r in o.groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    for k, n in exact.items():
        assert abs(merged[k] - n) <= 0.05 * n, (k, merged[k], n)


def test_grouped_apply_arrow_equals_pandas(tables):
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from tidier_spark.pandas_tier import grouped_apply, grouped_apply_arrow

    ev = tables["events"].select("user_id", "event_id", "value")

    def demean_pd(pdf: pd.DataFrame) -> pd.DataFrame:
        v100 = (pdf["value"] * 100).round()
        return pd.DataFrame(
            {"event_id": pdf["event_id"], "demeaned": (v100 - v100.mean()) / 100.0}
        )

    def demean_pa(tbl: pa.Table) -> pa.Table:
        v100 = pc.round(pc.multiply(tbl.column("value"), 100.0))
        mean = pc.mean(v100).as_py()
        return pa.table(
            {"event_id": tbl.column("event_id"),
             "demeaned": pc.divide(pc.subtract(v100, mean), 100.0)}
        )

    ddl = "event_id long, demeaned double"
    a = {tuple(r) for r in grouped_apply(ev, "user_id", demean_pd, ddl).collect()}
    b = {tuple(r) for r in grouped_apply_arrow(ev, "user_id", demean_pa, ddl).collect()}
    assert a == b and len(a) > 0


def test_mode_by_tie_breaks_to_smallest(spark):
    from tidier_spark.verbs import mode_by

    rows = [
        ("a", "z"), ("a", "z"), ("a", "b"), ("a", "b"),  # tie z/b -> b
        ("b", None), ("b", None), ("b", "q"),            # NULLs dropped -> q
    ]
    df = spark.createDataFrame(rows, "k string, v string")
    got = {(r["k"], r["mode_val"], r["mode_n"]) for r in
           mode_by(df, "v", by="k").collect()}
    assert got == {("a", "b", 2), ("b", "q", 1)}


def test_mode_by_all_null_group_emits_nothing(spark):
    from tidier_spark.verbs import mode_by

    df = spark.createDataFrame([("a", None)], "k string, v string")
    assert mode_by(df, "v", by="k").count() == 0


def test_mode_by_oracle(tables, sf_dir):
    from helpers import assert_matches_oracle
    from tidier_spark.verbs import mode_by, mode_by_sql

    assert_matches_oracle(
        mode_by(tables["events"], "event_type", by="user_id"),
        mode_by_sql("events", "event_type", by="user_id"),
        sf_dir,
    )
