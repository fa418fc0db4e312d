"""Physical-plan introspection: the evidence layer for scale claims.

"Would this survive a 100× scale-up?" is answerable from the plan, not the
wall clock: filters must reach the parquet scan (``PushedFilters``), scans
must read only referenced columns (``ReadSchema``), row-wise pipelines must
sit inside WholeStageCodegen, and the shuffle count must match what the
semantics require.  These helpers make those properties assertable in
tests (see tests/test_plans.py) instead of eyeballed.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

__all__ = [
    "explain_str",
    "pushed_filters",
    "read_schema",
    "count_exchanges",
    "codegen_stage_count",
    "has_broadcast_join",
]


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """Filter predicates that reached the data source scan."""
    text = explain_str(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", text):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def read_schema(df: DataFrame) -> list[str]:
    """Column names actually read from the (first) scan."""
    text = explain_str(df)
    m = re.search(r"ReadSchema: struct<([^>]*)>", text)
    if not m:
        return []
    return [f.split(":")[0].strip() for f in m.group(1).split(",") if f.strip()]


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle boundaries (Exchange operators) in the plan."""
    return explain_str(df, "simple").count("Exchange")


def codegen_stage_count(df: DataFrame) -> int:
    """Distinct WholeStageCodegen stages ("*(N)" markers in simple mode,
    "WholeStageCodegen (N)" in formatted mode)."""
    text = explain_str(df, "simple")
    ids = set(re.findall(r"\*\((\d+)\)", text))
    ids |= set(re.findall(r"WholeStageCodegen \((\d+)\)", text))
    return len(ids)


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df, "simple")
