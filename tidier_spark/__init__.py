"""tidier_spark — PySpark-native engine with talegari/tidier's capabilities.

The reference is an R package providing "Apache Spark style window
aggregation ... via mutate in dplyr flavour" (`/root/reference/DESCRIPTION:9`)
— this package re-expresses those semantics on the API tidier imitated
(`pyspark.sql.Window`), plus the large-scale data-pipeline operators
(dedup, similarity search, text analysis, multimodal columns) a 100 TB
training-data deployment needs.  See SURVEY.md for the full blueprint.
"""

from .frames import Period, days, hours, minutes, months, seconds, weeks, years
from .mutate import mutate, mutate_
from .pandas_tier import frame_apply, grouped_apply
from .joins import (
    anti_join,
    cross_join,
    full_join,
    inner_join,
    left_join,
    right_join,
    semi_join,
)
from .skew import salted_agg
from .tbl import tbl
from .verbs import (
    arrange,
    complete,
    count,
    desc,
    diff,
    distinct,
    fill_down,
    fill_up,
    filter_,
    intersect_,
    pct_change,
    pivot_longer,
    pivot_wider,
    rename,
    select,
    separate,
    setdiff,
    slice_head,
    slice_max,
    slice_min,
    slice_sample,
    summarise,
    union_,
    union_all,
    unite,
    where,
)

__version__ = "0.1.0"

__all__ = [
    "mutate",
    "mutate_",
    "Period",
    "seconds",
    "minutes",
    "hours",
    "days",
    "weeks",
    "months",
    "years",
    "frame_apply",
    "grouped_apply",
    "arrange",
    "count",
    "desc",
    "distinct",
    "filter_",
    "rename",
    "select",
    "slice_head",
    "slice_max",
    "slice_min",
    "slice_sample",
    "summarise",
    "where",
    "union_all",
    "union_",
    "intersect_",
    "setdiff",
    "salted_agg",
    "fill_down",
    "fill_up",
    "complete",
    "pct_change",
    "diff",
    "pivot_wider",
    "pivot_longer",
    "separate",
    "unite",
    "tbl",
    "inner_join",
    "left_join",
    "right_join",
    "full_join",
    "semi_join",
    "anti_join",
    "cross_join",
]
