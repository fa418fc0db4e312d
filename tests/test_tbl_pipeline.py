"""Fluent pipeline (tbl), separate/unite, and a streaming windowed-agg run."""

from __future__ import annotations

from pyspark.sql import functions as F

from helpers import assert_matches_oracle
from tidier_spark import days, desc, tbl
from tidier_spark.verbs import separate, unite


def test_tbl_pipeline_oracle(tables, sf_dir):
    # A realistic chained pipeline, end-to-end through the fluent API.
    r = (
        tbl(tables["events"])
        .filter("event_type != 'error'")
        .mutate(
            avg_7d="avg(round(value * 100)) / 100",
            by="user_id",
            index="ts",
            frame=(days(7), days(-1)),
        )
        .select("event_id", "avg_7d")
    )
    assert_matches_oracle(
        r.df,
        """SELECT event_id,
                  avg(round(value * 100)) OVER (
                    PARTITION BY user_id ORDER BY ts
                    RANGE BETWEEN INTERVAL 7 DAYS PRECEDING
                              AND INTERVAL 1 DAY  PRECEDING) / 100 AS avg_7d
           FROM events WHERE event_type <> 'error'""",
        sf_dir,
    )


def test_tbl_join_summarise_chain(tables, sf_dir):
    r = (
        tbl(tables["orders"])
        .inner_join(tbl(tables["customer"]), by={"o_custkey": "c_custkey"}, broadcast=True)
        .summarise(
            revenue="sum(round(o_totalprice * 100)) / 100",
            by="c_mktsegment",
        )
        .arrange(desc("revenue"))
    )
    assert_matches_oracle(
        r.df,
        """SELECT c_mktsegment, sum(round(o_totalprice * 100)) / 100 AS revenue
           FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1""",
        sf_dir,
    )


def test_separate_unite_roundtrip(tables):
    docs = tables["documents"].select("doc_id", "source")
    sep = separate(docs, "source", ["src_word", "src_num"], sep="(?<=src)(?=[0-9])", keep=True)
    row = sep.where("doc_id = 0").first()
    assert row["src_word"] == "src" and row["src_num"] is not None
    re_united = unite(sep, "re_src", ["src_word", "src_num"], sep="")
    assert re_united.where("re_src != source").count() == 0


def test_streaming_windowed_agg_runs_as_stream(spark, sf_dir, tmp_path):
    from tidier_spark.sources import read_table
    from tidier_spark.streaming import stream_windowed_agg

    ev = read_table(spark, sf_dir, "events").select("ts", "event_type", "value")
    src = str(tmp_path / "ev_stream")
    ev.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(ev.schema).parquet(src)
    out = stream_windowed_agg(
        stream,
        {"n": "count(*)"},
        time_col="ts",
        window="1 day",
        by="event_type",
        watermark="1 hour",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("roll_stream")
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination(120)
    emitted = {
        (r["window_start"], r["event_type"]): r["n"]
        for r in spark.sql("SELECT * FROM roll_stream").collect()
    }
    # append mode emits only windows the watermark has CLOSED — the final
    # day's window stays open at stream end and is correctly withheld.
    assert emitted, "no closed windows emitted"
    batch = {
        (r["window_start"], r["event_type"]): r["n"]
        for r in stream_windowed_agg(
            ev, {"n": "count(*)"}, time_col="ts", window="1 day", by="event_type"
        ).collect()
    }
    # every emitted window must agree exactly with the batch computation
    assert all(batch.get(k) == v for k, v in emitted.items())
    # and only the tail (non-closed) windows may be missing
    missing = {k for k in batch if k not in emitted}
    max_start = max(k[0] for k in batch)
    assert all(k[0] == max_start for k in missing), missing

def test_migration_flagship_example_runs(spark):
    # docs/MIGRATION.md flagship chain, executed verbatim on an
    # airquality-analog (reference README.md:25-54): must produce NaN for
    # the first row of each month (empty frame), R-style.
    import math

    from tidier_spark import days, tbl

    rows = [
        (m, d, float(60 + (m * 7 + d * 3) % 30))
        for m in range(5, 10)
        for d in range(1, 31)
    ]
    airquality = spark.createDataFrame(rows, ["Month", "Day", "Temp"])
    r = (
        tbl(airquality)
        .mutate(date_col="make_date(1973, Month, Day)")
        .slice_sample(prop=0.8)
        .mutate(
            avg_temp_over_last_week="r_mean(Temp, na_rm=TRUE)",
            order_by="Day",
            by="Month",
            frame=(days(7), days(-1)),
            index="date_col",
        )
        .df
    )
    pdf = r.toPandas().sort_values(["Month", "Day"])
    # NB: groupby().first() skips NaN — nth(0) keeps the actual first row
    first_per_month = pdf.groupby("Month").nth(0)
    # reference README row 1: empty trailing frame → NaN (not NULL/None)
    assert all(
        math.isnan(v) for v in first_per_month["avg_temp_over_last_week"]
    )
    # later rows have real averages
    assert pdf["avg_temp_over_last_week"].notna().sum() > 0
