"""Source/sink round-trips and the desc() NSE marker."""

from __future__ import annotations

from pyspark.sql import functions as F

from tidier_spark import desc, mutate
from tidier_spark.plans import pushed_filters
from tidier_spark.sources import read_csv, read_json, write_parquet


def test_desc_marker_in_mutate(tables):
    r1 = mutate(
        tables["orders"],
        rk="row_number()",
        by="o_custkey",
        order_by=[desc("o_totalprice"), "o_orderkey"],
    )
    r2 = mutate(
        tables["orders"],
        rk="row_number()",
        by="o_custkey",
        order_by=["o_totalprice", "o_orderkey"],
        desc=[True, False],
    )
    a = {r["o_orderkey"]: r["rk"] for r in r1.select("o_orderkey", "rk").collect()}
    b = {r["o_orderkey"]: r["rk"] for r in r2.select("o_orderkey", "rk").collect()}
    assert a == b


def test_parquet_roundtrip_partitioned(tables, tmp_path, spark):
    path = str(tmp_path / "orders_part")
    write_parquet(tables["orders"], path, partition_by=["o_orderpriority"])
    back = spark.read.parquet(path)
    assert back.count() == tables["orders"].count()
    # partition pruning: filter on the partition column must hit the layout
    pruned = back.where("o_orderpriority = '1-URGENT'")
    assert pruned.count() == tables["orders"].where("o_orderpriority = '1-URGENT'").count()


def test_csv_roundtrip(tables, tmp_path, spark):
    path = str(tmp_path / "nation_csv")
    tables["nation"].write.mode("overwrite").option("header", "true").csv(path)
    back = read_csv(
        spark, path, schema="n_nationkey int, n_name string, n_regionkey int"
    )
    assert sorted(r["n_name"] for r in back.collect()) == sorted(
        r["n_name"] for r in tables["nation"].collect()
    )


def test_json_roundtrip(tables, tmp_path, spark):
    path = str(tmp_path / "region_json")
    tables["region"].write.mode("overwrite").json(path)
    back = read_json(spark, path, schema="r_regionkey int, r_name string")
    assert back.count() == 5


def test_parquet_pushdown_after_write(tables, tmp_path, spark):
    path = str(tmp_path / "li")
    write_parquet(tables["lineitem"].select("l_orderkey", "l_quantity"), path)
    r = spark.read.parquet(path).where("l_quantity > 30")
    assert any("l_quantity" in p for p in pushed_filters(r))

def _file_spans(path: str, cols: list[str]) -> dict[str, float]:
    """Mean per-file normalized min/max span of each column — 1.0 means
    every file covers the whole value range (no clustering), small means
    parquet file stats can prune reads."""
    import glob

    import pyarrow.parquet as pq

    files = sorted(glob.glob(f"{path}/*.parquet"))
    lo = {c: float("inf") for c in cols}
    hi = {c: float("-inf") for c in cols}
    spans = {c: [] for c in cols}
    per_file = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        fmins = {c: float("inf") for c in cols}
        fmaxs = {c: float("-inf") for c in cols}
        for rg in range(md.num_row_groups):
            row = md.row_group(rg)
            for ci in range(row.num_columns):
                col = row.column(ci)
                name = col.path_in_schema
                if name in cols and col.statistics is not None:
                    fmins[name] = min(fmins[name], float(col.statistics.min))
                    fmaxs[name] = max(fmaxs[name], float(col.statistics.max))
        per_file.append((fmins, fmaxs))
        for c in cols:
            lo[c] = min(lo[c], fmins[c])
            hi[c] = max(hi[c], fmaxs[c])
    for fmins, fmaxs in per_file:
        for c in cols:
            spans[c].append((fmaxs[c] - fmins[c]) / max(hi[c] - lo[c], 1e-12))
    return {c: sum(v) / len(v) for c, v in spans.items()}


def test_zorder_write_clusters_both_columns(tables, tmp_path):
    # Morton layout: every file covers a small RECTANGLE of the 2-D key
    # space, so the per-file stat span shrinks on BOTH columns — a plain
    # sort clusters only its leading column (asserted as the contrast)
    ev = tables["events"].select("event_id", "user_id", "value")
    zpath = str(tmp_path / "ev_z")
    write_parquet(ev, zpath, zorder_by=["user_id", "value"], n_files=8)
    spath = str(tmp_path / "ev_s")
    write_parquet(ev, spath, sort_by=["user_id"], n_files=8)

    z = _file_spans(zpath, ["user_id", "value"])
    s = _file_spans(spath, ["user_id", "value"])
    # z-order clusters BOTH dimensions
    assert z["user_id"] < 0.6 and z["value"] < 0.6, z
    # plain sort: leading column tightly clustered, the other far less
    # clustered than under z-order
    assert s["user_id"] < 0.2, s
    assert s["value"] > z["value"] + 0.2, (s, z)
    # layout must not change the data
    back = ev.sparkSession.read.parquet(zpath)
    assert back.count() == ev.count()


def test_sink_roundtrip_scan_is_partition_pruned(tables, tmp_path):
    from pyspark.sql import functions as F

    from tidier_spark.sources import write_parquet

    ev = tables["events"]
    path = str(tmp_path / "pruned")
    write_parquet(ev, path, partition_by=["event_type"], sort_by=["ts"], n_files=2)
    spark = ev.sparkSession
    back = spark.read.parquet(path).where(
        F.col("event_type").isin("click", "purchase")
    )
    plan = back._jdf.queryExecution().executedPlan().toString()
    # the event_type predicate must land in PartitionFilters (directory
    # pruning), NOT survive as a post-scan Filter over all partitions
    assert "PartitionFilters: [" in plan
    assert "event_type" in plan.split("PartitionFilters:")[1].split("]")[0]
    assert back.count() == ev.where(
        F.col("event_type").isin("click", "purchase")
    ).count()


def test_orc_roundtrip_preserves_rows_and_pushes_filter(tables, tmp_path):
    from pyspark.sql import functions as F

    from tidier_spark.sources import read_orc, write_orc

    ev = tables["events"].select("event_id", "user_id", "value")
    path = str(tmp_path / "orc")
    write_orc(ev, path)
    back = read_orc(tables["events"].sparkSession, path)
    assert back.count() == ev.count()
    plan = (
        back.where(F.col("user_id") == 7)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # ORC scans must carry the predicate down (stripe-stat skipping)
    assert "PushedFilters: [" in plan and "user_id" in plan.split(
        "PushedFilters:"
    )[1].split("]")[0]


def test_bucketed_write_elides_join_shuffle(tables, tmp_path):
    """The bucket_by sink claim at 100 TB: two tables bucketed the same
    way on the join key sort-merge-join with NO Exchange on either side
    (bucketing pre-co-locates equal keys at write time)."""
    from pyspark.sql import functions as F

    from tidier_spark.sources import write_parquet

    spark = tables["events"].sparkSession
    ev = tables["events"].select("event_id", "user_id", "value")
    cu = tables["customer"].select(
        F.col("c_custkey").alias("user_id"), "c_name"
    )
    for tbl in ("t_bktest_ev", "t_bktest_cu"):
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    write_parquet(
        ev,
        str(tmp_path / "bk_ev"),
        bucket_by=(4, ["user_id"]),
        table="t_bktest_ev",
    )
    write_parquet(
        cu,
        str(tmp_path / "bk_cu"),
        bucket_by=(4, ["user_id"]),
        table="t_bktest_cu",
    )
    try:
        # disable broadcast so the join would need a shuffle WITHOUT
        # bucketing; the bucketed layout must satisfy the distribution
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = spark.table("t_bktest_ev").join(
                spark.table("t_bktest_cu"), "user_id"
            )
            plan = j._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, plan
            assert j.count() > 0
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    finally:
        for tbl in ("t_bktest_ev", "t_bktest_cu"):
            spark.sql(f"DROP TABLE IF EXISTS {tbl}")
