"""Tier C — the pandas escape hatch for arbitrary Python logic.

The reference accepts *any* R closure as a frame aggregator (`...` exprs go
to ``dplyr::summarise`` per window, `R/mutate.R:208`) and parallelizes
arbitrary grouped computation via nest + ``furrr::future_map``
(`R/mutate.R:278-282`).  The faithful Spark analogs (SURVEY.md §7.1 Tier C):

* :class:`frame_apply` — an arbitrary Python reducer evaluated once per
  window frame.  Lowered as ``collect_list(col) OVER frame`` + an
  Arrow-batched ``pandas_udf`` over the collected arrays.  Memory is
  O(frame width) per row — fine for bounded frames, documented-dangerous
  for unbounded ones; prefer Tier A built-ins wherever the reducer has a
  SQL spelling.
* :func:`grouped_apply` — ``groupBy(keys).applyInPandas(fn)``: the direct
  analog of nest+future_map.  One shuffle on the keys; each group must fit
  in executor memory (same contract the reference's nest() has on RAM).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["frame_apply", "grouped_apply"]


@dataclass
class frame_apply:  # noqa: N801 — reads like a verb at call sites
    """Marker for a per-frame Python reducer inside :func:`tidier_spark.mutate`.

    Example::

        mutate(df, med=frame_apply(np.median, "value"),
               by="user_id", order_by="ts", frame=(6, 0))

    ``fn`` receives a 1-D numpy array (the frame's values, window order) and
    returns a scalar of ``return_type``.
    """

    fn: Callable
    col: str
    return_type: str = "double"

    def lower(self, plan) -> object:
        """Build the Column: collect_list over the window → pandas_udf."""
        collected = plan.over(f"collect_list({self.col})")
        fn = self.fn

        @F.pandas_udf(self.return_type)
        def reduce_frames(s: pd.Series) -> pd.Series:
            import numpy as np

            return s.apply(lambda arr: fn(np.asarray(arr)))

        return reduce_frames(collected)


def grouped_apply(
    df: DataFrame,
    by: str | list[str],
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    schema: str,
) -> DataFrame:
    """Arbitrary per-group pandas transform — nest+future_map, Spark-native.

    ``fn(pdf) -> pdf`` runs once per group; ``schema`` is the output DDL
    string (e.g. ``"user_id long, value double, zscore double"``).
    """
    keys = [by] if isinstance(by, str) else list(by)
    return df.groupBy(*keys).applyInPandas(fn, schema)
