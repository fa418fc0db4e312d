"""Fluent pipeline wrapper: dplyr's pipe, as method chaining.

R users write ``df |> mutate(...) |> filter(...) |> arrange(...)``; the
Python spelling is ``tbl(df).mutate(...).filter(...).arrange(...).df``.
Every method returns a new ``tbl`` over a new (still lazy) DataFrame —
nothing executes until an action, exactly like the reference's lazy
backend (`R/mutate.R:293-351`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from . import joins as _joins
from . import verbs as _verbs
from .mutate import mutate as _mutate_fn
from .mutate import mutate_ as _mutate_underscore_fn
from .skew import salted_agg as _salted_agg

__all__ = ["tbl"]


class tbl:  # noqa: N801 — dplyr-flavoured spelling
    """Chainable wrapper over a DataFrame; ``.df`` unwraps."""

    def __init__(self, df: DataFrame):
        self.df = df

    def _wrap(self, df: DataFrame) -> "tbl":
        return tbl(df)

    # --- core verb ---------------------------------------------------------
    def mutate(self, _exprs=None, **kw) -> "tbl":
        return self._wrap(_mutate_fn(self.df, _exprs, **kw))

    def mutate_(self, _exprs=None, **kw) -> "tbl":
        return self._wrap(_mutate_underscore_fn(self.df, _exprs, **kw))

    # --- row/column verbs --------------------------------------------------
    def filter(self, *conds) -> "tbl":
        return self._wrap(_verbs.filter_(self.df, *conds))

    where = filter

    def select(self, *cols) -> "tbl":
        return self._wrap(_verbs.select(self.df, *cols))

    def rename(self, **new_to_old) -> "tbl":
        return self._wrap(_verbs.rename(self.df, **new_to_old))

    def arrange(self, *keys) -> "tbl":
        return self._wrap(_verbs.arrange(self.df, *keys))

    def distinct(self, *cols) -> "tbl":
        return self._wrap(_verbs.distinct(self.df, *cols))

    def summarise(self, _exprs=None, **kw) -> "tbl":
        return self._wrap(_verbs.summarise(self.df, _exprs, **kw))

    summarize = summarise

    def count(self, *by, name: str = "n") -> "tbl":
        return self._wrap(_verbs.count(self.df, *by, name=name))

    def slice_min(self, order_col, n=1, by=None, with_ties=True) -> "tbl":
        return self._wrap(_verbs.slice_min(self.df, order_col, n, by, with_ties))

    def slice_max(self, order_col, n=1, by=None, with_ties=True) -> "tbl":
        return self._wrap(_verbs.slice_max(self.df, order_col, n, by, with_ties))

    def slice_sample(self, prop, seed=42) -> "tbl":
        return self._wrap(_verbs.slice_sample(self.df, prop, seed))

    def fill_down(self, cols, *, by=None, order_by=None) -> "tbl":
        return self._wrap(_verbs.fill_down(self.df, cols, by=by, order_by=order_by))

    def pivot_wider(self, **kw) -> "tbl":
        return self._wrap(_verbs.pivot_wider(self.df, **kw))

    def pivot_longer(self, cols, **kw) -> "tbl":
        return self._wrap(_verbs.pivot_longer(self.df, cols, **kw))

    def salted_agg(self, by, exprs, n_salts=16) -> "tbl":
        return self._wrap(_salted_agg(self.df, by, exprs, n_salts))

    # --- joins -------------------------------------------------------------
    def inner_join(self, other, by=None, **kw) -> "tbl":
        return self._wrap(_joins.inner_join(self.df, _unwrap(other), by, **kw))

    def left_join(self, other, by=None, **kw) -> "tbl":
        return self._wrap(_joins.left_join(self.df, _unwrap(other), by, **kw))

    def semi_join(self, other, by=None, **kw) -> "tbl":
        return self._wrap(_joins.semi_join(self.df, _unwrap(other), by, **kw))

    def anti_join(self, other, by=None, **kw) -> "tbl":
        return self._wrap(_joins.anti_join(self.df, _unwrap(other), by, **kw))

    # --- actions (the only eager methods) ----------------------------------
    def collect(self):
        return self.df.collect()

    def show(self, n: int = 20, truncate: bool = True) -> None:
        self.df.show(n, truncate)

    def to_pandas(self):
        return self.df.toPandas()

    def explain(self, mode: str = "formatted") -> None:
        self.df.explain(mode)

    @property
    def columns(self):
        return self.df.columns


def _unwrap(other: object) -> DataFrame:
    return other.df if isinstance(other, tbl) else other  # type: ignore[return-value]
