"""Expression-context handling: windowize aggregate calls inside expressions.

The reference evaluates `...` exprs in two contexts (SURVEY.md §2.2): a
vectorized mutate context and a per-frame *summarise* context where any
expression that reduces the frame to a scalar is legal — e.g.
``round(mean(x), 2)`` or ``max(x) - min(x)``.  SQL attaches ``OVER`` to the
aggregate *call*, not the outer expression, so ``round(avg(x), 4) OVER w``
is invalid; this module rewrites such expressions the way tidier's summarise
conceptually does:

    round(avg(value), 4)
      → placeholder step:  __w0__ = avg(value) OVER w
      → outer step:        round(__w0__, 4)

`windowize` lexically scans a Spark-SQL expression string for known
aggregate function calls (word-boundary identifier + balanced parens,
quote-aware) and returns the rewritten outer expression plus the extracted
calls.  Lexical detection is deliberate: the aggregate catalog is closed
(Spark built-ins), and it avoids a per-expression Catalyst analysis
round-trip.
"""

from __future__ import annotations

import re

__all__ = ["windowize", "AGG_FNS"]

# Spark built-in aggregate functions legal inside a window frame.
AGG_FNS = frozenset(
    """
    avg mean sum count min max first last first_value last_value
    stddev stddev_samp stddev_pop std variance var_samp var_pop
    skewness kurtosis corr covar_samp covar_pop
    collect_list collect_set array_agg listagg string_agg
    approx_count_distinct approx_percentile percentile percentile_approx
    median mode any every some bool_and bool_or any_value
    bit_and bit_or bit_xor count_if max_by min_by product
    sum_distinct try_sum try_avg regr_avgx regr_avgy regr_count regr_r2
    regr_intercept regr_slope regr_sxx regr_sxy regr_syy
    hll_sketch_agg hll_union_agg grouping grouping_id histogram_numeric
    """.split()
)

_IDENT_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")

_DISTINCT_COUNT_RE = re.compile(r"^count\s*\(\s*distinct\s+(.+)\)$", re.IGNORECASE | re.DOTALL)


def _scan_call(s: str, open_paren: int) -> int | None:
    """Index just past the matching ')' for the '(' at ``open_paren``."""
    depth = 0
    i = open_paren
    n = len(s)
    while i < n:
        ch = s[i]
        if ch in "'\"":
            quote = ch
            i += 1
            while i < n:
                if s[i] == "\\":
                    i += 2
                    continue
                if s[i] == quote:
                    break
                i += 1
            if i >= n:
                return None
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                return i + 1
        i += 1
    return None


def windowize(expr: str, placeholder: str = "__w{i}__") -> tuple[str, list[tuple[str, str]]]:
    """Extract top-level aggregate calls from a SQL expression string.

    Returns ``(outer_expr, [(placeholder_name, agg_call_sql), ...])`` where
    each aggregate call in ``expr`` is replaced by its placeholder
    identifier.  ``count(DISTINCT x)`` is rewritten to
    ``size(collect_set(x))`` because Spark windows reject DISTINCT
    aggregates.

    If no aggregate call is found the original string comes back with an
    empty list — the caller treats it as a row-wise expression.
    """
    out: list[str] = []
    calls: list[tuple[str, str]] = []
    i = 0
    n = len(expr)
    while i < n:
        ch = expr[i]
        if ch in "'\"":
            # copy string literal verbatim
            j = i + 1
            while j < n:
                if expr[j] == "\\":
                    j += 2
                    continue
                if expr[j] == ch:
                    j += 1
                    break
                j += 1
            out.append(expr[i:j])
            i = j
            continue
        if ch == "`":
            j = expr.find("`", i + 1)
            j = n if j < 0 else j + 1
            out.append(expr[i:j])
            i = j
            continue
        m = _IDENT_RE.match(expr, i)
        if m:
            ident = m.group(0)
            j = m.end()
            # word before '(' (allow whitespace)
            k = j
            while k < n and expr[k].isspace():
                k += 1
            is_member = i > 0 and expr[i - 1] in "._"  # struct field / qualified name
            if (
                not is_member
                and k < n
                and expr[k] == "("
                and ident.lower() in AGG_FNS
            ):
                end = _scan_call(expr, k)
                if end is not None:
                    call = expr[i:end]
                    ph = placeholder.format(i=len(calls))
                    # Spark windows reject DISTINCT aggregates: window
                    # collect_set instead and take its size outside.
                    m_d = _DISTINCT_COUNT_RE.match(call.strip())
                    if m_d:
                        calls.append((ph, f"collect_set({m_d.group(1)})"))
                        out.append(f"size({ph})")
                    else:
                        calls.append((ph, call))
                        out.append(ph)
                    i = end
                    continue
            out.append(ident)
            i = j
            continue
        out.append(ch)
        i += 1
    return "".join(out), calls


# --- R-semantics function rewriting (SURVEY §7.2 M3) ----------------------

_R_FN_RE = re.compile(r"\br_(mean|sum|min|max|var|sd)\s*\(")
_NA_RM_RE = re.compile(r"(?:,\s*)?na_rm\s*=\s*(TRUE|True|true|FALSE|False|false)\s*$")

_NAN = "CAST('NaN' AS DOUBLE)"
_PINF = "CAST('Infinity' AS DOUBLE)"
_NINF = "CAST('-Infinity' AS DOUBLE)"


def _r_template(fn: str, x: str, na_rm: bool) -> str:
    """SQL template with the R NA/empty rules (all-aggregate calls at top
    level so :func:`windowize` can lower it onto any window).

    The aggregate's input is cast to DOUBLE: R numeric vectors ARE
    doubles (the reference evaluates these expressions in R, which has
    no decimal and no int64 type — a BIGINT column read into R is
    already a double per value), so under a DECIMAL schema the
    R-faithful result is the double computation — not Spark's decimal
    ``avg``, which HALF_UP-quantizes at scale+4 (decvals axis, r10:
    r_semantics diverged from its double-computing oracle by exactly
    that quantization).  On double/integer fixtures the cast is a
    no-op for avg/var/sd (Spark computes those in double regardless)
    and for the monotone min/max, but NOT for sum: ``sum(BIGINT)``
    previously accumulated exactly in long (raising ANSI
    ARITHMETIC_OVERFLOW past 2^63), whereas ``sum(CAST(x AS DOUBLE))``
    rounds each value to double and fp-accumulates, drifting above
    2^53 and never overflowing.  That trade is deliberate and
    R-faithful — R's ``sum()`` over the same values drifts identically
    and never errors (pinned by
    tests/test_money.py::test_r_sum_bigint_is_double_accumulated);
    callers needing exact wide sums should use SQL ``sum()`` on a
    DECIMAL(38) column instead.  NULL structure is unchanged, so the
    poison guard still counts the raw expression.
    """
    xd = f"CAST(({x}) AS DOUBLE)"
    if fn == "mean":
        core = f"(CASE WHEN count({x}) = 0 THEN {_NAN} ELSE avg({xd}) END)"
    elif fn == "sum":
        core = f"coalesce(sum({xd}), CAST(0 AS DOUBLE))"
    elif fn == "min":
        core = f"coalesce(min({xd}), {_PINF})"
    elif fn == "max":
        core = f"coalesce(max({xd}), {_NINF})"
    elif fn == "var":
        core = f"var_samp({xd})"
    elif fn == "sd":
        core = f"stddev_samp({xd})"
    else:  # pragma: no cover
        raise ValueError(fn)
    if na_rm:
        return core
    # na.rm=FALSE (R default): any NULL in scope poisons the result
    return f"(CASE WHEN count({x}) = count(*) THEN {core} END)"


def rewrite_r_functions(expr: str) -> str:
    """Rewrite ``r_mean(x)`` / ``r_sum(x, na_rm=TRUE)`` ... spellings into
    null-guarded SQL with R's NA-poisoning and empty-input rules."""
    while True:
        m = _R_FN_RE.search(expr)
        if m is None:
            return expr
        open_paren = expr.index("(", m.end() - 1)
        end = _scan_call(expr, open_paren)
        if end is None:
            return expr
        args = expr[open_paren + 1 : end - 1].strip()
        na = _NA_RM_RE.search(args)
        na_rm = bool(na and na.group(1).lower() == "true")
        if na:
            args = args[: na.start()].strip()
        repl = _r_template(m.group(1), args, na_rm)
        expr = expr[: m.start()] + repl + expr[end:]
