"""Opt-in DECIMAL(38) lowering for money aggregates.

The house fixed-point convention (``sum(round(col * 100))`` penny BIGINTs,
see ``__spark_entry__`` docstring) is exact only while |value·100| < 2^53:
above that a double's ulp exceeds 1, so the penny int is no longer exact,
sums become association-order-dependent, and the integer cast splits on
binary-exact vs shortest-decimal representation (docs/EDGE_SWEEP.md,
magnitude axis, round 6).  The reference's R doubles have the same cliff
(R/mutate.R aggregates are plain doubles) — this hatch is an extension.

These helpers build the ESCAPE HATCH: cast the measure to
``DECIMAL(38, scale)`` before aggregating.  Spark's decimal aggregation is
exact (Tungsten 128-bit), so sums are associativity-independent and exact
up to 10^(38-scale) — at 100 TB, a shuffle-order-independence guarantee no
double sum can give.  Overflow is LOUD on both ends: the decimal sum past
38 digits and the penny-BIGINT output past 2^63 both raise under ANSI
(verified — never a silent wrap).

Representation caveat (measured, pinned in tests/test_money.py): the one
remaining engine-convention step is double→decimal CONVERSION.  Spark
rounds the double's SHORTEST-DECIMAL representation HALF_UP at the scale
digit (BigDecimal(Double.toString)); DuckDB rounds the EXACT BINARY value
— at 3e14 the double nearest x.37 is x.375 and the engines land one cent
apart per row.  The ``*_sql`` mirrors therefore route DuckDB through
``CAST(v AS VARCHAR)`` (shortest repr), after which the two engines are
bit-equal at any magnitude (differential at 3e14, where the default penny
path is already out of its exact domain).  With decimal INPUTS (the real
100 TB money schema) no conversion happens and the caveat vanishes.

Opt-in by design: the default penny path stays byte-stable for every
existing entry (hashes unchanged); callers who know their magnitudes
exceed the 2^53-penny domain switch per-aggregate:

    summarise(li, revenue=money_sum("l_extendedprice"), by=[...])
"""

from __future__ import annotations

__all__ = [
    "money_cast",
    "money_sum",
    "money_avg",
    "money_sum_pennies",
    "money_cast_sql",
    "money_sum_pennies_sql",
]


def _check(scale: int) -> None:
    if not 0 <= scale <= 18:
        raise ValueError(f"money scale must be in [0, 18], got {scale}")


def money_cast(col: str, *, scale: int = 2) -> str:
    """``col`` as DECIMAL(38, scale) — Spark rounds the shortest-decimal
    representation HALF_UP at the scale digit; exact beyond (no double
    re-rounding downstream)."""
    _check(scale)
    return f"CAST({col} AS DECIMAL(38,{scale}))"


def money_sum(col: str, *, scale: int = 2) -> str:
    """Exact decimal sum: associativity-independent, overflow LOUD (Spark
    ANSI raises, never wraps) — the 100 TB-safe money total."""
    return f"sum({money_cast(col, scale=scale)})"


def money_avg(col: str, *, scale: int = 2) -> str:
    """Exact-numerator decimal mean (Σ/n in decimal, divisions at full
    decimal precision — never mean-of-doubles)."""
    return f"avg({money_cast(col, scale=scale)})"


def money_sum_pennies(col: str, *, scale: int = 2) -> str:
    """:func:`money_sum` scaled to an integer minor unit (BIGINT pennies
    for scale=2) — the hash-stable output spelling both engines render
    identically (decimal→pandas dtypes differ between engines; a BIGINT
    does not).  Raises loudly on overflow past BIGINT, like every house
    fixed-point output."""
    _check(scale)
    return (
        f"CAST({money_sum(col, scale=scale)} * {10 ** scale} AS BIGINT)"
    )


def money_cast_sql(col: str, *, scale: int = 2) -> str:
    """DuckDB-oracle twin of :func:`money_cast`: the VARCHAR hop pins
    DuckDB to the SHORTEST-DECIMAL representation Spark converts through
    — without it DuckDB rounds the exact binary value and the engines
    drift one cent per row above the double's 2-dp-exact range.

    Magnitudes below half a minor unit are flushed to zero FIRST: they
    round to 0 at this scale on any correct HALF_UP path anyway (a
    semantics no-op), but DuckDB's scientific-notation VARCHAR→DECIMAL
    parse rounds mantissa-first — ``'5e-300'`` (and every ``5e-<big>``)
    lands on 0.01 where Spark's BigDecimal correctly gives 0.00.  Found
    by the hypothesis differential at the denormal 5e-324."""
    _check(scale)
    half_unit = f"0.5e-{scale}" if scale else "0.5"
    guarded = f"(CASE WHEN abs({col}) < {half_unit} THEN 0 ELSE {col} END)"
    return f"CAST(CAST({guarded} AS VARCHAR) AS DECIMAL(38,{scale}))"


def money_sum_pennies_sql(col: str, *, scale: int = 2) -> str:
    """DuckDB-oracle twin of :func:`money_sum_pennies`."""
    _check(scale)
    return (
        f"CAST(sum({money_cast_sql(col, scale=scale)}) * {10 ** scale} "
        f"AS BIGINT)"
    )
