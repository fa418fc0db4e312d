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