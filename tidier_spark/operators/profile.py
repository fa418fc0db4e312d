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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["profile_table", "profile_sql"]


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
