"""dplyr join verbs — oracle-checked against DuckDB joins."""

from __future__ import annotations

from helpers import assert_matches_oracle
from tidier_spark.joins import (
    anti_join,
    full_join,
    inner_join,
    left_join,
    semi_join,
)
from tidier_spark.plans import has_broadcast_join


def test_inner_join_mapping_oracle(tables, sf_dir):
    r = inner_join(
        tables["orders"], tables["customer"], by={"o_custkey": "c_custkey"},
        broadcast=True,
    ).select("o_orderkey", "c_name", "c_mktsegment")
    assert has_broadcast_join(r)
    assert_matches_oracle(
        r,
        """SELECT o_orderkey, c_name, c_mktsegment
           FROM orders JOIN customer ON o_custkey = c_custkey""",
        sf_dir,
    )


def test_left_join_oracle(tables, sf_dir):
    hi = tables["orders"].where("o_totalprice > 400000")
    r = left_join(
        tables["customer"], hi, by={"c_custkey": "o_custkey"}
    ).select("c_custkey", "o_orderkey")
    assert_matches_oracle(
        r,
        """SELECT c_custkey, o_orderkey
           FROM customer LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 400000) o
             ON c_custkey = o_custkey""",
        sf_dir,
    )


def test_full_join_suffixes(tables, sf_dir):
    a = tables["nation"].selectExpr("n_nationkey", "n_name AS name")
    b = tables["region"].selectExpr("r_regionkey", "r_name AS name")
    r = full_join(a, b, by={"n_nationkey": "r_regionkey"})
    assert set(r.columns) == {"n_nationkey", "name_x", "r_regionkey", "name_y"}


def test_full_join_coalesces_same_name_key(spark):
    # dplyr::full_join: the collapsed key carries whichever side matched —
    # an unmatched right row must surface its key, not NULL
    a = spark.createDataFrame([(1, "a1"), (2, "a2")], ["k", "va"])
    b = spark.createDataFrame([(2, "b2"), (3, "b3")], ["k", "vb"])
    rows = {tuple(r) for r in full_join(a, b, by="k").collect()}
    assert rows == {(1, "a1", None), (2, "a2", "b2"), (3, None, "b3")}


def test_right_join_keeps_right_key(spark):
    from tidier_spark.joins import right_join

    a = spark.createDataFrame([(1, "a1")], ["k", "va"])
    b = spark.createDataFrame([(1, "b1"), (3, "b3")], ["k", "vb"])
    rows = {tuple(r) for r in right_join(a, b, by="k").collect()}
    assert rows == {(1, "a1", "b1"), (3, None, "b3")}


def test_semi_and_anti_join_oracle(tables, sf_dir):
    urgent = tables["orders"].where("o_orderpriority = '1-URGENT'")
    s = semi_join(tables["customer"], urgent, by={"c_custkey": "o_custkey"}).select(
        "c_custkey"
    )
    assert_matches_oracle(
        s,
        """SELECT c_custkey FROM customer
           WHERE c_custkey IN (SELECT o_custkey FROM orders
                               WHERE o_orderpriority = '1-URGENT')""",
        sf_dir,
    )
    a = anti_join(tables["customer"], urgent, by={"c_custkey": "o_custkey"}).select(
        "c_custkey"
    )
    assert_matches_oracle(
        a,
        """SELECT c_custkey FROM customer
           WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                                   WHERE o_orderpriority = '1-URGENT')""",
        sf_dir,
    )


def test_natural_join_by_none(tables):
    # nation and region share no columns → error demands explicit by
    import pytest

    with pytest.raises(ValueError, match="no common columns"):
        inner_join(tables["nation"], tables["region"])