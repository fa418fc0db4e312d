"""Cross-micro-batch LATE-DATA contract tests (late edge axis, r10).

Spark leaves late-row filtering to the operator for arbitrary stateful
processing (``applyInPandasWithState``) and ``foreachBatch`` — without a
guard, a row arriving a micro-batch after its key already folded a NEWER
event is applied OUT OF event-time order and per-row outputs silently
diverge from the batch twin (measured: wrong EWMA values, SCD2 intervals
with valid_to BEFORE valid_from).  The operators now enforce the
in-order arrival contract per key (``_frontier_guard`` / scd2_merge's
last_seen guard): LOUD error by default, deterministic drop on request.
"""
import os
import time

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from tidier_spark.streaming.sliding import (
    run_stream,
    stream_ewma,
    stream_funnel_advances,
    stream_running_distinct,
    stream_trailing_agg,
)


def _two_batches(tmp_path, rows1, rows2, schema_cols):
    """Two parquet files with forced mtimes: file order == batch order."""
    src = tmp_path / "src"
    src.mkdir()
    pq.write_table(pa.table({c: [r[i] for r in rows1] for i, c in enumerate(schema_cols)}), src / "b1.parquet")
    pq.write_table(pa.table({c: [r[i] for r in rows2] for i, c in enumerate(schema_cols)}), src / "b2.parquet")
    now = time.time()
    os.utime(src / "b1.parquet", (now - 60, now - 60))
    os.utime(src / "b2.parquet", (now, now))
    return str(src)


def _events_stream(spark, src):
    return (
        spark.readStream.schema("user_id long, event_id long, ts_us long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .select(
            "user_id", "event_id",
            F.timestamp_micros("ts_us").alias("ts"), "value",
        )
    )


def test_stream_ewma_late_event_is_loud(spark, tmp_path):
    src = _two_batches(
        tmp_path,
        [(1, 11, 1_000_000, 1.0), (1, 12, 2_000_000, 2.0)],
        [(1, 10, 500_000, 9.0)],  # LATE: behind key 1's frontier
        ["user_id", "event_id", "ts_us", "value"],
    )
    r = stream_ewma(
        _events_stream(spark, src), key_col="user_id", time_col="ts",
        value_col="value", tiebreak_col="event_id",
    )
    with pytest.raises(Exception, match="BEHIND its key's frontier"):
        run_stream(r, name="t_late_ewma_err", output_mode="append")


def test_stream_ewma_late_drop_equals_ontime_replay(spark, tmp_path):
    rows1 = [(1, 11, 1_000_000, 1.0), (1, 12, 2_000_000, 2.0)]
    late = [(1, 10, 500_000, 9.0), (2, 20, 3_000_000, 4.0)]
    src = _two_batches(tmp_path, rows1, late, ["user_id", "event_id", "ts_us", "value"])
    r = stream_ewma(
        _events_stream(spark, src), key_col="user_id", time_col="ts",
        value_col="value", tiebreak_col="event_id", late_policy="drop",
    )
    got = sorted(
        (r2["key"], r2["ts_us"], r2["ewma100"])
        for r2 in run_stream(r, name="t_late_ewma_drop", output_mode="append").collect()
    )
    # the late key-1 row is dropped; key 2's first row (new key) folds
    keys = [(k, t) for k, t, _ in got]
    assert keys == [(1, 1_000_000), (1, 2_000_000), (2, 3_000_000)], got
    # and the kept rows' values equal an in-order single-batch replay
    (tmp_path / "b").mkdir()
    src2 = _two_batches(
        tmp_path / "b", rows1, [(2, 20, 3_000_000, 4.0)],
        ["user_id", "event_id", "ts_us", "value"],
    )
    r2 = stream_ewma(
        _events_stream(spark, src2), key_col="user_id", time_col="ts",
        value_col="value", tiebreak_col="event_id",
    )
    want = sorted(
        (x["key"], x["ts_us"], x["ewma100"])
        for x in run_stream(r2, name="t_late_ewma_ref", output_mode="append").collect()
    )
    assert got == want


def test_stream_trailing_and_distinct_late_policies(spark, tmp_path):
    rows1 = [(1, 11, 1_000_000, 1.0), (1, 12, 2_000_000, 2.0)]
    late = [(1, 10, 500_000, 9.0)]
    src = _two_batches(tmp_path, rows1, late, ["user_id", "event_id", "ts_us", "value"])
    tr = stream_trailing_agg(
        _events_stream(spark, src), key_col="user_id", time_col="ts",
        value_col="value", trailing_seconds=10, timeout_minutes=None,
    )
    with pytest.raises(Exception, match="stream_trailing_agg.*BEHIND"):
        run_stream(tr, name="t_late_trail_err", output_mode="append")
    dr = stream_running_distinct(
        _events_stream(spark, src).withColumn("value", F.col("value").cast("string")),
        key_col="user_id", time_col="ts", value_col="value",
        tiebreak_col="event_id", late_policy="drop",
    )
    got = sorted(
        (r2["key"], r2["ts_us"], r2["dcum"])
        for r2 in run_stream(dr, name="t_late_dist_drop", output_mode="append").collect()
    )
    assert got == [(1, 1_000_000, 1), (1, 2_000_000, 2)], got


def test_stream_funnel_late_event_is_loud(spark, tmp_path):
    src = _two_batches(
        tmp_path,
        [(1, 11, 1_000_000, 0.0), (1, 12, 2_000_000, 0.0)],
        [(1, 10, 500_000, 0.0)],
        ["user_id", "event_id", "ts_us", "value"],
    )
    stream = _events_stream(spark, src).withColumn(
        "step", F.when(F.col("event_id") == 11, "a").otherwise("b")
    )
    r = stream_funnel_advances(
        stream, key_col="user_id", time_col="ts", step_col="step",
        steps=["a", "b"],
    )
    with pytest.raises(Exception, match="stream_funnel_advances.*BEHIND"):
        run_stream(r, name="t_late_funnel_err", output_mode="append")


def test_scd2_merge_late_batch_is_loud_and_legacy_snapshot_guarded(spark):
    from tidier_spark.operators.merge import scd2, scd2_merge

    def mk(rows):
        return spark.createDataFrame(rows, ["k", "t_us", "attr", "tb"]).select(
            "k", F.timestamp_micros("t_us").alias("t"), "attr", "tb"
        )

    snap = scd2_merge(None, mk([(1, 100, "a", 1), (1, 200, "a", 2)]), "k", "t", "attr", "tb")
    assert "last_seen_us" in snap.columns
    with pytest.raises(Exception, match="append-only CDC contract"):
        scd2_merge(snap, mk([(1, 50, "b", 3)]), "k", "t", "attr", "tb").collect()
    # a LEGACY snapshot (public scd2 output, no last_seen_us) gets the
    # sound lower-bound frontier: behind-run-start batches still raise
    legacy = scd2(mk([(1, 100, "a", 1), (1, 200, "a", 2)]), "k", "t", "attr", "tb")
    with pytest.raises(Exception, match="append-only CDC contract"):
        scd2_merge(legacy, mk([(1, 50, "b", 3)]), "k", "t", "attr", "tb").collect()
    # in-order folding still works and is loud-free
    out = scd2_merge(snap, mk([(1, 300, "b", 3)]), "k", "t", "attr", "tb")
    rows = {(r["attr"], r["is_current"]): r for r in out.collect()}
    assert rows[("a", False)]["valid_to_us"] == 300
    assert rows[("b", True)]["last_seen_us"] == 300


def test_late_policy_validated(spark, tmp_path):
    src = _two_batches(
        tmp_path,
        [(1, 11, 1_000_000, 1.0)],
        [(1, 12, 2_000_000, 2.0)],
        ["user_id", "event_id", "ts_us", "value"],
    )
    r = stream_ewma(
        _events_stream(spark, src), key_col="user_id", time_col="ts",
        value_col="value", tiebreak_col="event_id", late_policy="dorp",
    )
    with pytest.raises(Exception, match="late_policy must be"):
        run_stream(r, name="t_late_policy_bad", output_mode="append")
