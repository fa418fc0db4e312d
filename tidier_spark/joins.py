"""dplyr-flavoured join verbs over native Spark joins.

The reference has no joins (SURVEY.md §2.1 "Joins" row: "engine exposes
Spark's join untouched") — but its users join daily through dplyr, so the
engine provides the dplyr spellings: ``by=`` as a name, list, or
``{left: right}`` mapping; duplicate non-key columns suffixed ``.x``-style;
``broadcast=True`` to pin the build side (small dims —
`sources.BROADCAST_TABLES`).  Everything lowers to one Catalyst join node:
strategy (broadcast-hash / sort-merge / shuffled-hash) and AQE skew
splitting stay with the optimizer unless explicitly hinted.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "inner_join",
    "left_join",
    "right_join",
    "full_join",
    "semi_join",
    "anti_join",
    "cross_join",
]


def _normalize_by(
    left: DataFrame, right: DataFrame, by: object
) -> list[tuple[str, str]]:
    if by is None:
        common = [c for c in left.columns if c in set(right.columns)]
        if not common:
            raise ValueError("no common columns to join by; pass `by=`")
        return [(c, c) for c in common]
    if isinstance(by, str):
        return [(by, by)]
    if isinstance(by, dict):
        return list(by.items())
    return [(c, c) if isinstance(c, str) else tuple(c) for c in by]


def _join(
    left: DataFrame,
    right: DataFrame,
    by: object,
    how: str,
    broadcast: bool,
    suffix: tuple[str, str],
) -> DataFrame:
    pairs = _normalize_by(left, right, by)
    r = F.broadcast(right) if broadcast else right
    cond = None
    for lc, rc in pairs:
        c = left[lc] == right[rc]
        cond = c if cond is None else cond & c
    joined = left.join(r, cond, how)

    if how in ("semi", "anti", "left_semi", "left_anti"):
        return joined

    # dplyr column resolution: equal-named key pairs collapse to one column;
    # other duplicated names get suffixes.  The collapsed key must carry the
    # side that is guaranteed non-null for the join type: left for
    # left/inner, right for right (unmatched right rows have a NULL left
    # key), coalesce(left, right) for full — dplyr::full_join coalesces.
    out_cols: list[Column] = []
    left_names = set(left.columns)
    right_names = set(right.columns)
    key_right = {rc for lc, rc in pairs if lc == rc}
    key_out: dict[str, Column] = {}
    for lc, rc in pairs:
        if lc != rc:
            continue
        if how in ("full", "outer", "full_outer"):
            key_out[lc] = F.coalesce(left[lc], right[rc]).alias(lc)
        elif how in ("right", "right_outer"):
            key_out[lc] = right[rc].alias(lc)
        else:
            key_out[lc] = left[lc]
    for c in left.columns:
        if c in key_out:
            out_cols.append(key_out[c])
        elif c in right_names:
            out_cols.append(left[c].alias(f"{c}{suffix[0]}"))
        else:
            out_cols.append(left[c])
    for c in right.columns:
        if c in key_right:
            continue  # collapsed into the left key column
        if c in left_names:
            out_cols.append(right[c].alias(f"{c}{suffix[1]}"))
        else:
            out_cols.append(right[c])
    return joined.select(*out_cols)


def inner_join(left, right, by=None, *, broadcast=False, suffix=("_x", "_y")):
    return _join(left, right, by, "inner", broadcast, suffix)


def left_join(left, right, by=None, *, broadcast=False, suffix=("_x", "_y")):
    return _join(left, right, by, "left", broadcast, suffix)


def right_join(left, right, by=None, *, broadcast=False, suffix=("_x", "_y")):
    return _join(left, right, by, "right", broadcast, suffix)


def full_join(left, right, by=None, *, broadcast=False, suffix=("_x", "_y")):
    return _join(left, right, by, "full", broadcast, suffix)


def semi_join(left, right, by=None, *, broadcast=False):
    """Rows of ``left`` with a match in ``right`` — never duplicates rows
    (unlike an inner join + distinct), and never reads right's payload."""
    return _join(left, right, by, "left_semi", broadcast, ("", ""))


def anti_join(left, right, by=None, *, broadcast=False):
    return _join(left, right, by, "left_anti", broadcast, ("", ""))


def cross_join(left, right):
    return left.crossJoin(right)
