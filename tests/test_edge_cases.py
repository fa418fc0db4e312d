"""Edge cases: empty inputs, empty text, single-row groups, NULL keys."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from tidier_spark import days, mutate
from tidier_spark.operators import text


def test_mutate_on_empty_dataframe(tables):
    empty = tables["events"].limit(0)
    for kwargs in (
        dict(x="value * 2"),
        dict(x="avg(value)", by="user_id"),
        dict(x="row_number()", by="user_id", order_by=["ts"]),
        dict(x="avg(value)", by="user_id", order_by=["ts"], frame=(3, 0)),
        dict(x="avg(value)", by="user_id", index="ts", frame=(days(7), days(0))),
        dict(x="cumsum(value)", order_by=["ts"]),
    ):
        r = mutate(empty, **kwargs)
        assert r.count() == 0
        assert "x" in r.columns


def test_text_metrics_on_empty_and_punct_only_text(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "!!! ..."), (3, "one two three")], ["doc_id", "text"]
    )
    r = text.analyze_documents(df).collect()
    by_id = {row["doc_id"]: row for row in r}
    # token-free docs: counts 0, ratios NULL (0/0), never an exception
    assert by_id[1]["n_tokens"] == 0 and by_id[2]["n_tokens"] == 0
    assert by_id[1]["avg_token_len"] is None
    assert by_id[3]["n_tokens"] == 3
    # fingerprint of token-free docs is the empty-string md5 — stable
    assert by_id[1]["fingerprint"] == by_id[2]["fingerprint"]


def test_bpe_and_rolling_on_empty_text(spark):
    df = spark.createDataFrame([(1, ""), (2, "ab7!")], ["doc_id", "text"])
    rows = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            text.token_count_bpe("text").alias("bpe"),
            text.rolling_fingerprint("text").alias("rfp"),
        ).collect()
    }
    assert rows[1]["bpe"] == 0
    assert rows[1]["rfp"] == 7  # seed survives the empty fold
    assert rows[2]["bpe"] == 3  # 'ab' → 1, '7' → 1, '!' → 1


def test_window_with_null_group_keys(spark, sf_dir):
    from helpers import assert_matches_oracle

    from tidier_spark.sources import read_table

    ev = read_table(spark, sf_dir, "events").withColumn(
        "grp", F.when(F.col("user_id") % 4 == 0, None).otherwise(F.col("user_id"))
    )
    # NULL keys form one partition in both engines (SQL window semantics)
    r = mutate(
        ev,
        s="sum(round(value * 100)) / 100",
        by="grp",
        order_by=["ts", "event_id"],
        frame=(math.inf, 0),
    ).select("event_id", "s")
    assert_matches_oracle(
        r,
        """SELECT event_id,
                  sum(round(value * 100)) OVER (
                    PARTITION BY CASE WHEN user_id % 4 = 0 THEN NULL
                                      ELSE user_id END
                    ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 100 AS s
           FROM events""",
        sf_dir,
    )


def test_single_row_groups(spark):
    df = spark.createDataFrame(
        [(1, 1, 10.0), (2, 2, 20.0), (3, 3, 30.0)], ["id", "grp", "v"]
    )
    r = mutate(
        df, m="avg(v)", sd="stddev_samp(v)", by="grp", order_by=["id"], frame=(5, 0)
    ).collect()
    assert all(row["m"] == row["v"] for row in r)
    assert all(row["sd"] is None for row in r)  # n=1 → sample stddev NULL