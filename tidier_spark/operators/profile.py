"""One-pass dataset profiling: per-column null and distinct counts.

The first thing run against any new 100 TB drop: which columns are
usable?  ``profile_table`` computes null counts and exact distinct counts
for every requested column in ONE scan — Spark plans multiple
count(distinct) via a single Expand (one pass over the data, one
shuffle), not one job per column.  For very wide tables swap the exact
distincts for ``approx_count_distinct`` (HLL, no Expand blow-up) — the
``exact=False`` path.

Output is long-form ``(column, n_rows, n_nulls, n_distinct)`` — integers
only, so the differential oracle hashes identically.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, FloatType

__all__ = [
    "profile_table",
    "profile_sql",
    "histogram",
    "histogram_sql",
    "event_transitions",
    "event_transitions_sql",
    "skew_report",
    "skew_report_sql",
]


def profile_table(
    df: DataFrame, cols: list[str] | None = None, exact: bool = True
) -> DataFrame:
    cols = cols or df.columns
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(F.count(F.when(F.col(c).isNull(), 1)).alias(f"__nn_{c}"))
        if exact:
            aggs.append(F.countDistinct(F.col(c)).alias(f"__nd_{c}"))
        else:
            aggs.append(F.approx_count_distinct(F.col(c)).alias(f"__nd_{c}"))
    wide = df.agg(*aggs)
    # unpivot the single wide row to long form: stack() is one projection
    parts = ", ".join(f"'{c}', `__nn_{c}`, `__nd_{c}`" for c in cols)
    return wide.selectExpr(
        f"stack({len(cols)}, {parts}) AS (column, n_nulls, n_distinct)",
        "n_rows",
    ).select("column", "n_rows", "n_nulls", "n_distinct")


def profile_sql(table: str, cols: list[str]) -> str:
    """DuckDB mirror of :func:`profile_table` (exact mode)."""
    selects = [
        f"""
        SELECT '{c}' AS "column",
               count(*)::BIGINT AS n_rows,
               count(*) FILTER ({c} IS NULL)::BIGINT AS n_nulls,
               count(DISTINCT {c})::BIGINT AS n_distinct
        FROM {table}"""
        for c in cols
    ]
    return " UNION ALL ".join(selects)


def histogram(
    df: DataFrame,
    col: str,
    lo: float,
    hi: float,
    n_bins: int,
    keep_empty: bool = True,
) -> DataFrame:
    """Fixed-width histogram: ``(bin, lo_edge, hi_edge, n)`` with
    out-of-range values clamped into the edge bins.

    One groupBy on the bin id (map-side combine; at most ``n_bins``
    groups survive the shuffle — bytes).  The bin expression is plain
    floor arithmetic, identical under Spark and DuckDB (both IEEE 754 —
    no engine-specific bucketing function), so the differential oracle
    hashes bit-for-bit.  ``keep_empty`` joins against a generated bin
    spine so empty bins appear with n=0 (plot-ready).

    NULL and NaN rows are EXCLUDED (NaN has no bin: Spark's non-ANSI
    NaN→long cast lands it in bin 0 while DuckDB's clamp lands it in
    the top bin — filtering on both engines is the only portable
    contract).  ±Inf clamp into the edge bins consistently.
    """
    step = (hi - lo) / n_bins
    c = F.col(col)
    bin_id = F.least(
        F.greatest(F.floor((c - F.lit(lo)) / F.lit(step)), F.lit(0)),
        F.lit(n_bins - 1),
    ).cast("long")
    is_float = isinstance(df.schema[col].dataType, (DoubleType, FloatType))
    keep = c.isNotNull() & ~F.isnan(c) if is_float else c.isNotNull()
    counts = (
        df.where(keep)
        .groupBy(bin_id.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    if keep_empty:
        spine = df.sparkSession.range(n_bins).withColumnRenamed("id", "bin")
        counts = spine.join(counts, "bin", "left").select(
            "bin", F.coalesce("n", F.lit(0).cast("long")).alias("n")
        )
    return counts.select(
        "bin",
        (F.lit(lo) + F.col("bin") * F.lit(step)).alias("lo_edge"),
        (F.lit(lo) + (F.col("bin") + 1) * F.lit(step)).alias("hi_edge"),
        "n",
    )


def histogram_sql(
    table: str, col: str, lo: float, hi: float, n_bins: int
) -> str:
    """DuckDB mirror of :func:`histogram` (keep_empty=True)."""
    step = (hi - lo) / n_bins
    b = (
        f"least(greatest(floor(({col} - {lo!r}) / {step!r}), 0),"
        f" {n_bins - 1})::BIGINT"
    )
    return f"""
        WITH counts AS (
          SELECT {b} AS bin, count(*)::BIGINT AS n
          FROM {table} WHERE {col} IS NOT NULL AND NOT isnan({col})
          GROUP BY 1
        ),
        spine AS (SELECT unnest(range({n_bins})) AS bin)
        SELECT spine.bin,
               {lo!r} + spine.bin * {step!r} AS lo_edge,
               {lo!r} + (spine.bin + 1) * {step!r} AS hi_edge,
               coalesce(counts.n, 0) AS n
        FROM spine LEFT JOIN counts USING (bin)"""


def event_transitions(
    df: DataFrame,
    key_col: str,
    time_col: str,
    state_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """First-order transition counts between consecutive states per key —
    the Markov path-analysis table behind "what do users do after X"
    (and the input to next-event prediction baselines).  Output:
    ``(from_state, to_state, n)`` over every consecutive pair in each
    key's (time, tiebreak)-ordered history.

    Plan: one lag() window partitioned by key (single shuffle) + one
    groupBy on the |states|² pair space (map-side combine collapses to a
    tiny result regardless of input size).
    """
    w = Window.partitionBy(key_col).orderBy(time_col, tiebreak_col)
    return (
        df.withColumn("__prev", F.lag(state_col).over(w))
        .where(F.col("__prev").isNotNull())
        .groupBy(
            F.col("__prev").alias("from_state"),
            F.col(state_col).alias("to_state"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


def event_transitions_sql(
    table: str,
    key_col: str,
    time_col: str,
    state_col: str,
    tiebreak_col: str,
) -> str:
    """DuckDB mirror of :func:`event_transitions`."""
    return f"""
        SELECT prev AS from_state, {state_col} AS to_state,
               count(*)::BIGINT AS n
        FROM (
          SELECT {state_col},
                 lag({state_col}) OVER (PARTITION BY {key_col}
                   ORDER BY {time_col}, {tiebreak_col}) AS prev
          FROM {table}
        )
        WHERE prev IS NOT NULL
        GROUP BY 1, 2"""


def skew_report(
    df: DataFrame,
    key_col: str,
    top_k: int = 5,
) -> DataFrame:
    """Join/aggregation-key skew diagnostic: per-key frequencies reduced
    to the numbers that drive the salting/broadcast decision — the
    heaviest keys (with their counts) plus max/mean skew factors.  Run
    this before keying a 100 TB shuffle; feed the hot keys into
    ``skew.skew_join``'s hot-list or pick a salt width from
    ``skew_factor_x100``.

    Output: ``top_k`` rows ``(key_rank, key, n, n_total, n_keys,
    skew_factor_x100)`` — skew factor = max_count·n_keys/total, the
    multiple of a perfectly uniform key's share, in exact integer
    centi-units (``(max·keys·100) div total``).

    Plan: one hash aggregate on the key (map-side combine), one 1-row
    stats aggregate broadcast back, top-k via TakeOrdered.  Cost is one
    shuffle of (key, partial-count) cells — the cheapest possible full
    look at the key distribution.
    """
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("n")
    )
    stats = counts.agg(
        F.sum("n").alias("n_total"), F.count(F.lit(1)).alias("n_keys")
    )
    return (
        counts.crossJoin(F.broadcast(stats))
        .orderBy(F.col("n").desc(), F.col("key").asc())
        .limit(top_k)
        .select(
            F.row_number()
            .over(Window.orderBy(F.col("n").desc(), F.col("key").asc()))
            .cast("long")
            .alias("key_rank"),
            F.col("key"),
            F.col("n"),
            F.col("n_total"),
            F.col("n_keys"),
            # double-space formula: (n·n_keys·100) overflows BIGINT at
            # ~1e9×1e9 keys·rows — exactly the scale this diagnostic
            # targets.  Each IEEE op below is exactly rounded and the
            # mirror replays the identical order, so the floor is
            # engine-deterministic.
            F.floor((F.col("n") * 100.0 / F.col("n_total")) * F.col("n_keys"))
            .cast("long")
            .alias("skew_factor_x100"),
        )
    )


def skew_report_sql(table: str, key_col: str, top_k: int = 5) -> str:
    """DuckDB mirror of :func:`skew_report`."""
    return f"""
        WITH counts AS (
          SELECT {key_col} AS key, count(*)::BIGINT AS n
          FROM {table} GROUP BY 1
        ),
        stats AS (
          SELECT CAST(sum(n) AS BIGINT) AS n_total,
                 count(*)::BIGINT AS n_keys
          FROM counts
        )
        SELECT row_number() OVER (ORDER BY n DESC, key ASC)::BIGINT
                 AS key_rank,
               key, n, n_total, n_keys,
               CAST(floor((n * 100.0 / n_total) * n_keys) AS BIGINT)
                 AS skew_factor_x100
        FROM counts CROSS JOIN stats
        ORDER BY n DESC, key ASC LIMIT {top_k}"""
