"""dplyr/tidyr scalar helpers — the expression vocabulary around mutate.

All thin Column builders over built-in functions (JVM-side, codegen);
provided so dplyr users keep their spellings: ``case_when``, ``if_else``,
``na_if``, ``replace_na``, ``between``, ``coalesce``, ``lag``/``lead``
markers are already window functions in mutate's string language.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["case_when", "if_else", "na_if", "replace_na", "between", "coalesce"]


def _c(x: object) -> Column:
    if isinstance(x, Column):
        return x
    if isinstance(x, str):
        return F.expr(x)  # conditions/values are SQL fragments
    return F.lit(x)


def case_when(*cases: tuple[object, object], default: object = None) -> Column:
    """``case_when((cond, value), ..., default=)`` — first match wins,
    exactly dplyr's (and SQL CASE's) order semantics."""
    if not cases:
        raise ValueError("case_when needs at least one (condition, value) pair")
    out = None
    for cond, value in cases:
        c = _c(cond)
        v = _c(value)
        out = F.when(c, v) if out is None else out.when(c, v)
    return out.otherwise(_c(default)) if default is not None else out


def if_else(cond: object, true: object, false: object) -> Column:
    """Strict two-arm conditional (dplyr ``if_else``)."""
    return F.when(_c(cond), _c(true)).otherwise(_c(false))


def na_if(col: object, value: object) -> Column:
    return F.nullif(_c(col), _c(value))


def replace_na(col: object, value: object) -> Column:
    return F.coalesce(_c(col), _c(value))


def between(col: object, lo: object, hi: object) -> Column:
    c = _c(col)
    return (c >= _c(lo)) & (c <= _c(hi))


def coalesce(*cols: object) -> Column:
    return F.coalesce(*[_c(c) for c in cols])
