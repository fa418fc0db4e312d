"""Structured Streaming extensions.

The reference has no streaming at all (SURVEY.md §2.3 "Streaming" row); its
sliding windows are batch frames.  This module provides the streaming
counterparts a pipeline needs, on native Structured Streaming primitives:

* :func:`stream_windowed_agg` — tumbling/sliding event-time window
  aggregation with watermark-bounded state (the streaming analog of
  tidier's O5 range frames: a per-window aggregate instead of a per-row
  trailing frame, which is the shape streaming state can bound).
* :func:`stream_trailing_agg` — a *per-key trailing window* over event
  time via ``applyInPandasWithState``: custom stateful logic for the exact
  per-row trailing-frame semantics, state bounded by the frame width.

Scale notes: state size = keys × (frame span / slide) buckets; watermark
drops late data deterministically; both operators shuffle once on the
grouping keys (same as any streaming agg).
"""

from .sink import (  # noqa: F401
    read_merged,
    stream_dedup_against,
    stream_merge_parquet,
    stream_scd2_parquet,
)
from .sliding import (  # noqa: F401
    run_stream,
    stream_dedup,
    stream_interval_join,
    stream_ewma,
    stream_funnel_advances,
    stream_running_distinct,
    stream_session_agg,
    stream_trailing_agg,
    stream_windowed_agg,
)

__all__ = [
    "stream_windowed_agg",
    "stream_trailing_agg",
    "stream_session_agg",
    "stream_funnel_advances",
    "stream_ewma",
    "stream_dedup",
    "stream_running_distinct",
    "stream_interval_join",
    "stream_merge_parquet",
    "stream_scd2_parquet",
    "stream_dedup_against",
    "read_merged",
    "run_stream",
]
