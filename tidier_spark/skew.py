"""Skew mitigation: salted two-phase aggregation.

At 100 TB a single hot key (one user, one boilerplate document, one null
bucket) turns a groupBy into one straggler task.  AQE's skew-join handling
covers joins; for *aggregations* the standard fix is salting: shard each
key into ``n_salts`` sub-keys, aggregate partials per (key, salt), then
merge partials per key.  Two small shuffles replace one skewed shuffle.

Only algebraic aggregates decompose this way; the supported set and their
merge rules are explicit below (count→sum, sum→sum, min→min, max→max,
avg→sum/sum).  Non-algebraic aggregates (median, collect_list) can't be
salted — use windowed alternatives or sketches.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_agg"]

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
