"""Skew mitigation: salted two-phase aggregation + hot/cold split joins.

At 100 TB a single hot key (one user, one boilerplate document, one null
bucket) turns a groupBy into one straggler task.  AQE's skew-join handling
covers sort-merge joins it can observe at runtime; for *aggregations* the
standard fix is salting: shard each key into ``n_salts`` sub-keys,
aggregate partials per (key, salt), then merge partials per key.  Two
small shuffles replace one skewed shuffle.

Only algebraic aggregates decompose this way; the supported set and their
merge rules are explicit below (count→sum, sum→sum, min→min, max→max,
avg→sum/sum).  Non-algebraic aggregates (median, collect_list) can't be
salted — use windowed alternatives or sketches.

:func:`skew_join` is the join-side counterpart for when AQE can't help
(its skew handling needs both sides shuffled and splittable): the hottest
left keys are detected with one bounded aggregation, their right-side
rows join via broadcast (no shuffle of the hot mass at all), everything
else takes the normal shuffle path, and a union restores the exact join
result.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_agg", "skew_join"]

_AGG_RE = re.compile(r"^\s*(count|sum|min|max|avg)\s*\((.*)\)\s*$", re.DOTALL)


def salted_agg(
    df: DataFrame,
    by: str | list[str],
    exprs: dict[str, str],
    n_salts: int = 16,
) -> DataFrame:
    """``groupBy(by).agg(exprs)`` with salt-sharded partial aggregation.

    ``exprs``: ``{out_name: "agg(input_expr)"}`` with agg in
    count/sum/min/max/avg (``count(*)`` allowed).  Results are identical to
    the unsalted aggregation — avg merges as sum-of-sums over
    count-of-counts, not an average of averages.
    """
    keys = [by] if isinstance(by, str) else list(by)
    parsed: dict[str, tuple[str, str]] = {}
    for name, e in exprs.items():
        m = _AGG_RE.match(e)
        if not m:
            raise ValueError(
                f"{name}: salted_agg supports count/sum/min/max/avg calls, got {e!r}"
            )
        parsed[name] = (m.group(1).lower(), m.group(2))

    salted = df.withColumn(
        "__salt", (F.rand(seed=42) * n_salts).cast("int")
    )

    partial_aggs = []
    for name, (fn, arg) in parsed.items():
        if fn == "count":
            partial_aggs.append(
                F.count(F.lit(1) if arg.strip() == "*" else F.expr(arg)).alias(f"__p_{name}")
            )
        elif fn == "avg":
            partial_aggs.append(F.sum(F.expr(arg)).alias(f"__ps_{name}"))
            partial_aggs.append(F.count(F.expr(arg)).alias(f"__pc_{name}"))
        else:
            partial_aggs.append(getattr(F, fn)(F.expr(arg)).alias(f"__p_{name}"))
    partials = salted.groupBy(*keys, "__salt").agg(*partial_aggs)

    final_aggs = []
    for name, (fn, _) in parsed.items():
        if fn == "count":
            final_aggs.append(F.sum(f"__p_{name}").alias(name))
        elif fn == "avg":
            final_aggs.append(
                (F.sum(f"__ps_{name}") / F.sum(f"__pc_{name}")).alias(name)
            )
        elif fn == "sum":
            final_aggs.append(F.sum(f"__p_{name}").alias(name))
        else:  # min / max
            final_aggs.append(getattr(F, fn)(f"__p_{name}").alias(name))
    return partials.groupBy(*keys).agg(*final_aggs)


def skew_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    how: str = "inner",
    n_hot: int = 16,
) -> DataFrame:
    """Equi-join with the hottest left keys routed around the shuffle.

    One bounded aggregation finds the ``n_hot`` most frequent left key
    tuples (deterministic: count desc, then key asc); that tiny hot-key
    frame broadcasts twice — once to SPLIT each side with a broadcast
    semi/anti join (no shuffle to classify rows), once more implicitly
    when the hot slice of ``right`` (at most n_hot keys' worth of rows)
    broadcasts into a map-side join against the hot left mass.  The cold
    remainder — now with a bounded per-key row count — takes the normal
    shuffle join.  ``unionByName`` of the two legs is EXACTLY the plain
    join's bag of rows.

    The hot mass never shuffles: at 100 TB a key holding 10% of the left
    table stays where it was scanned and meets its (small, broadcast)
    right rows in place — the straggler partition the plain plan would
    create simply never exists.

    ``how``: "inner" or "left" (for left joins the hot/cold split is
    loss-free because every left row lands in exactly one leg).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"skew_join supports inner/left, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)

    hot = (
        left.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("__freq"))
        .orderBy(F.col("__freq").desc(), *[F.col(k) for k in keys])
        .limit(n_hot)
        .select(*keys)
        # the n_hot-row frame feeds THREE broadcast builds (left semi,
        # left anti, right semi); un-materialized each build re-runs the
        # full left scan + aggregation.  Persist the bounded frame so the
        # heavy-hitter pass runs once (r12, guide §3.3).
        .persist()
    )

    left_hot = left.join(F.broadcast(hot), keys, "left_semi")
    left_cold = left.join(F.broadcast(hot), keys, "left_anti")
    right_hot = right.join(F.broadcast(hot), keys, "left_semi")

    hot_leg = left_hot.join(F.broadcast(right_hot), keys, how)
    cold_leg = left_cold.join(right, keys, how)
    return hot_leg.unionByName(cold_leg)
