"""R-semantics scalar/aggregate fidelity layer (SURVEY.md §7.2 M3).

The reference's expressions are evaluated by R, whose NA/NaN rules differ
from SQL's in ways that silently change results (SURVEY §7.3 #2):

* R ``mean(x)`` is NA if any element is NA; SQL ``avg`` *skips* nulls.
  ``mean(x, na.rm=TRUE)`` is the SQL behavior.
* R ``mean(numeric(0))`` is NaN; SQL ``avg`` over an empty frame is NULL.
* R ``min/max`` warn and return ±Inf on empty input; SQL returns NULL.

These helpers make the R behavior *available and explicit* rather than
accidental: each takes ``na_rm`` (default False, like R) and lowers to a
null-guarded built-in aggregate — still Tier A, still incremental.  Used
inside mutate frames they compose with any WindowSpec.

Inputs are cast to DOUBLE before aggregating: R numeric vectors ARE
doubles (R has no decimal type), so under a DECIMAL schema the
R-faithful result is the double computation, not Spark's
scale-quantizing decimal ``avg`` (decvals axis, r10).  A no-op on
double/integral inputs — those were already double-coerced by the
±Inf/0.0 coalesce literals.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["r_mean", "r_sum", "r_min", "r_max", "r_var", "r_sd", "na_if_any_null"]


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def na_if_any_null(col: Column | str, value: Column) -> Column:
    """NULL if any element of ``col`` in the aggregation scope is NULL —
    the guard that makes a null-skipping SQL aggregate behave like R's
    na.rm=FALSE.  ``count(*) != count(col)`` detects a null in scope."""
    c = _c(col)
    return F.when(F.count(F.lit(1)) == F.count(c), value)


def r_mean(col: Column | str, na_rm: bool = False) -> Column:
    """R ``mean``: NA-poisoning by default; NaN (not NULL) on empty input
    (`README.md:44` shows the reference emitting NaN for an empty frame)."""
    c = _c(col)
    base = F.avg(c.cast("double"))
    if not na_rm:
        base = na_if_any_null(c, base)
    # empty frame → R NaN, not SQL NULL (count==0 distinguishes empty from
    # all-null, which stays NULL under na_rm)
    return F.when(F.count(F.lit(1)) == 0, F.lit(float("nan"))).otherwise(base)


def r_sum(col: Column | str, na_rm: bool = False) -> Column:
    """R ``sum``: NA-poisoning; sum of an empty frame is 0 (R), not NULL.

    Accumulates in DOUBLE even for integral inputs (R has no int64 —
    a BIGINT column is already double-per-value in R, so R's sum()
    fp-accumulates and never overflows).  Above 2^53 this drifts like
    R does instead of raising Spark's exact-long ANSI overflow; use
    plain SQL sum() on DECIMAL(38) when exact wide sums matter."""
    c = _c(col)
    base = F.coalesce(F.sum(c.cast("double")), F.lit(0.0))
    return base if na_rm else na_if_any_null(c, base)


def r_min(col: Column | str, na_rm: bool = False) -> Column:
    """R ``min``: NA-poisoning; +Inf on empty input."""
    c = _c(col)
    base = F.coalesce(F.min(c.cast("double")), F.lit(float("inf")))
    return base if na_rm else na_if_any_null(c, base)


def r_max(col: Column | str, na_rm: bool = False) -> Column:
    c = _c(col)
    base = F.coalesce(F.max(c.cast("double")), F.lit(float("-inf")))
    return base if na_rm else na_if_any_null(c, base)


def r_var(col: Column | str, na_rm: bool = False) -> Column:
    """R ``var`` (sample variance, n−1 denominator — same as SQL var_samp)."""
    c = _c(col)
    base = F.var_samp(c.cast("double"))
    return base if na_rm else na_if_any_null(c, base)


def r_sd(col: Column | str, na_rm: bool = False) -> Column:
    c = _c(col)
    base = F.stddev_samp(c.cast("double"))
    return base if na_rm else na_if_any_null(c, base)
