"""Scale regression for the heavy-hitters merge (r9 sf-jump probe find).

Spark's ``approx_top_k_combine`` silently loses even the heaviest items
when the total merged entry count is far above maxItemsTracked —
measured on Spark 4.1: 84 partials of ~65k tracked items combined at
maxItemsTracked=100k → approx_top_k_estimate returns an EMPTY list (the
sfjump board run: sketch_topk produced 0 rows vs the oracle's 10); a
cap of 250k over a 200k-distinct union returned 7 items.
``topk_merged`` therefore merges by exploding each partial's own
(item, count) list and summing — this file pins that the merge
survives the evicting regime and stays exact for items that never
evicted.
"""

from pyspark.sql import functions as F

from tidier_spark.operators.sketches import topk_merged, topk_partials


def test_topk_merge_survives_eviction_scale(spark):
    # ~400k distinct near-unique ids per group force accumulate
    # eviction at max_items_tracked=50k — the regime where
    # approx_top_k_combine went empty.  One known heavy item is
    # planted per group with 10k occurrences; a frequent-items sketch
    # must keep it through eviction (its count may be an estimate,
    # but the item can never vanish).
    # one planted heavy item per group (-1 in g=0, -2 in g=1); the
    # rest is ~500k count-1 noise per group, far past the 50k cap, so
    # the sketch evicts hard — noise legitimately drops out of the
    # estimate, but a 10k-count heavy hitter must survive
    n, heavy_freq = 1_000_000, 10_000
    df = spark.range(n).select(
        (F.col("id") % 2).alias("g"),
        F.when(F.col("id") % (n // heavy_freq) < 2, -(F.col("id") % 2) - 1)
        .otherwise(F.xxhash64("id"))
        .alias("item"),
    )
    parts = topk_partials(df, "item", by="g", part=None, max_items_tracked=50_000)
    top = topk_merged(parts, 3, by="g", max_items_tracked=50_000).collect()
    assert top, "merge returned EMPTY (the approx_top_k_combine failure mode)"
    for g, planted in ((0, -1), (1, -2)):
        rows = sorted(
            (r for r in top if r["g"] == g), key=lambda r: r["topk_rank"]
        )
        assert rows, f"group {g} lost its heavy hitter entirely"
        assert rows[0]["item"] == planted, "planted heavy hitter lost in merge"
        assert rows[0]["est_freq"] >= heavy_freq // 2


def test_topk_merge_exact_under_cap_and_slicing_invariant(spark):
    # exact contract: distinct cardinality under the cap per cell →
    # merged counts are exact and INDEPENDENT of the partial slicing
    df = spark.range(10_000).select(
        (F.col("id") % 7).alias("g"),
        (F.col("id") % 100).alias("item"),
        (F.col("id") % 13).alias("slice_a"),
        (F.col("id") % 4).alias("slice_b"),
    )
    exact = {
        (r["g"], r["item"]): r["n"]
        for r in df.groupBy("g", "item").agg(F.count("*").alias("n")).collect()
    }
    outs = []
    for part in ("slice_a", "slice_b"):
        parts = topk_partials(df, "item", by="g", part=part)
        out = topk_merged(parts, 5, by="g").collect()
        for r in out:
            assert r["est_freq"] == exact[(r["g"], r["item"])]
        outs.append(
            sorted((r["g"], r["item"], r["est_freq"], r["topk_rank"]) for r in out)
        )
    assert outs[0] == outs[1], "merge result must not depend on the slicing"


def test_topk_merge_cap_precondition_is_loud(spark):
    # ADVICE r9: approx_top_k_estimate(sketch, k) raises the cryptic
    # executor-side APPROX_TOP_K_MAX_ITEMS_TRACKED_LESS_THAN_K when k
    # exceeds the sketch's BUILD-time cap (the old combine path
    # re-capped at merge time, so this call pattern used to work).
    # topk_merged must fail LOUDLY with its own named error instead.
    import pytest

    df = spark.range(1_000).select((F.col("id") % 37).alias("item"))
    parts = topk_partials(df, "item", max_items_tracked=100)
    # the message must render the build cap via the SQL || splice AND
    # stay apostrophe-free (Spark's lexer escapes with backslash, so a
    # doubled quote would lex as two concatenated literals — advice r10)
    with pytest.raises(
        Exception, match=r"topk_merged: max_items_tracked.*sketch \(100\)"
    ):
        topk_merged(parts, 5, max_items_tracked=50_000).collect()
    # at or under the build cap the merge works
    ok = topk_merged(parts, 5, max_items_tracked=100).collect()
    assert len(ok) == 5 and ok[0]["est_freq"] >= ok[-1]["est_freq"]


def test_topk_merge_empty_input(spark):
    empty = spark.range(0).select(
        F.col("id").alias("item"), (F.col("id") % 2).alias("p")
    )
    parts = topk_partials(empty, "item", part="p")
    assert topk_merged(parts, 5).count() == 0
