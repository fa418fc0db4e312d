"""dplyr-flavoured convenience verbs around plain DataFrames.

The reference itself exports only ``mutate``/``mutate_`` (`NAMESPACE:3-4`),
but its docs and tests lean on host dplyr verbs — ``arrange``, ``select``,
``slice_min``, ``slice_sample``, ``group_by``+``summarise``, ``collect``
(`R/mutate.R:81,93,118,435,446,471`; SURVEY.md §2.2 last row).  A user
switching engines needs those spellings; each is a thin declarative wrapper
over the Spark construct Catalyst already optimizes, so none of them adds a
shuffle beyond what the semantics require.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "desc",
    "arrange",
    "select",
    "rename",
    "filter_",
    "where",
    "distinct",
    "summarise",
    "across",
    "count",
    "slice_min",
    "slice_max",
    "slice_head",
    "slice_sample",
    "fill_down",
    "fill_up",
    "complete",
    "pct_change",
    "diff",
    "pivot_wider",
    "pivot_longer",
    "separate",
    "unite",
    "nest",
    "unnest",
    "union_all",
    "union_",
    "intersect_",
    "setdiff",
    "mode_by",
    "mode_by_sql",
]


class desc:  # noqa: N801 — dplyr spelling
    """Marker for descending sort keys: ``arrange(df, desc("x"), "y")``."""

    def __init__(self, col: str | Column):
        self.col = col

    def to_spark(self) -> Column:
        c = F.col(self.col) if isinstance(self.col, str) else self.col
        return c.desc()


def _sort_cols(keys: tuple) -> list[Column]:
    out = []
    for k in keys:
        if isinstance(k, desc):
            out.append(k.to_spark())
        elif isinstance(k, str):
            out.append(F.col(k).asc())
        else:
            out.append(k)
    return out


def arrange(df: DataFrame, *keys: str | Column | desc) -> DataFrame:
    """Global sort (`dplyr::arrange`).  NOTE: a total order is a full
    range-shuffle — at 100 TB prefer windowed ranks over global sorts."""
    return df.orderBy(*_sort_cols(keys))


def select(df: DataFrame, *cols: str | Column) -> DataFrame:
    return df.select(*cols)


def rename(df: DataFrame, **new_to_old: str) -> DataFrame:
    """``rename(df, new=old)`` (dplyr argument order)."""
    out = df
    for new, old in new_to_old.items():
        out = out.withColumnRenamed(old, new)
    return out


def filter_(df: DataFrame, *conds: str | Column) -> DataFrame:
    out = df
    for c in conds:
        out = out.where(F.expr(c) if isinstance(c, str) else c)
    return out


where = filter_


def distinct(df: DataFrame, *cols: str) -> DataFrame:
    return df.select(*cols).distinct() if cols else df.distinct()


def summarise(
    df: DataFrame,
    _exprs: dict[str, str] | None = None,
    *,
    by: object = None,
    rollup: bool = False,
    cube: bool = False,
    grouping_sets: list[list[str]] | None = None,
    **kw: str,
) -> DataFrame:
    """Row-reducing aggregation (`dplyr::summarise`) — the aggregation shape
    the reference lacks (SURVEY.md §2.3 "Aggregations" row): hash aggregate,
    partial (map-side) combine for free, one shuffle on the group keys.

    ``rollup=True`` / ``cube=True`` emit hierarchical / all-subset grouping
    sets (Spark computes them in one pass with partial aggregation — no
    per-level rescan).  ``grouping_sets=[[...], ...]`` names the exact sets
    (``GROUP BY GROUPING SETS``) when neither shape fits — e.g. totals by
    (flag, status) and by (status) alone without the (flag) level a rollup
    would force.  ``by`` defaults to the union of the sets' columns.

    KNOWN ENGINE DIVERGENCE on EMPTY input: the SQL standard (and DuckDB)
    emit one global row (count 0, keys NULL) for the ``()`` grouping set
    even over zero rows; Spark's Expand-based grouping-sets lowering emits
    ZERO rows (the expand of nothing aggregates to no groups — verified on
    Spark 4.1, pinned in tests).  This surfaces only when the whole input
    is empty; making it standard-compliant would cost a second full
    aggregation pass just to materialize the degenerate row, so the Spark
    behavior is kept and documented.
    """
    exprs = {**(_exprs or {}), **kw}
    from .mutate import _translate  # dplyr spellings (mean→avg, n()→count)

    aggs = [F.expr(_translate(e)).alias(name) for name, e in exprs.items()]
    keys = [by] if isinstance(by, (str, Column)) else list(by or [])
    if sum((rollup, cube, grouping_sets is not None)) > 1:
        raise ValueError("choose one of rollup/cube/grouping_sets")
    if grouping_sets is not None:
        if not keys:
            seen: dict[str, None] = {}
            for s in grouping_sets:
                for c in s:
                    seen.setdefault(c, None)
            keys = list(seen)
        sets = [[F.col(c) for c in s] for s in grouping_sets]
        out_keys = [F.col(k) if isinstance(k, str) else k for k in keys]
        return df.groupingSets(sets, *out_keys).agg(*aggs)
    if rollup:
        return df.rollup(*keys).agg(*aggs)
    if cube:
        return df.cube(*keys).agg(*aggs)
    return df.groupBy(*keys).agg(*aggs) if keys else df.agg(*aggs)


def across(
    cols: list[str],
    fns: str | list[str] | dict[str, str],
    names: str = "{col}_{fn}",
) -> dict[str, str]:
    """dplyr ``across()``: build the expression dict for applying ``fns``
    to every column in ``cols`` — splat into :func:`summarise` /
    ``mutate_``.

    ``fns`` may be a single function name (``"mean"``), a list
    (``["mean", "max"]``), or ``{label: template}`` where the template
    uses ``{col}`` (e.g. ``{"p90": "percentile({col}, 0.9)"}``).
    ``names`` controls output naming with ``{col}`` / ``{fn}``
    placeholders, exactly dplyr's ``.names``.

    >>> summarise(df, across(["x", "y"], ["mean", "max"]), by="g")
    emits x_mean, x_max, y_mean, y_max in one aggregation pass.
    """
    if isinstance(fns, str):
        fns = [fns]
    items = (
        list(fns.items())
        if isinstance(fns, dict)
        else [(f, f + "({col})") for f in fns]
    )
    out: dict[str, str] = {}
    for c in cols:
        for label, template in items:
            out[names.format(col=c, fn=label)] = template.format(col=c)
    return out


def count(df: DataFrame, *by: str, name: str = "n") -> DataFrame:
    if not by:
        return df.agg(F.count(F.lit(1)).alias(name))
    return df.groupBy(*by).agg(F.count(F.lit(1)).alias(name))


def _slice_ranked(
    df: DataFrame,
    order_col: str | Column,
    n: int | None,
    by: object,
    asc: bool,
    with_ties: bool,
    prop: float | None = None,
    approx_prefilter: str | Column | None = None,
) -> DataFrame:
    keys = [by] if isinstance(by, (str, Column)) else list(by or [])
    c = F.col(order_col) if isinstance(order_col, str) else order_col
    if prop is not None and approx_prefilter is not None:
        return _slice_prop_refined(df, c, by, asc, with_ties, prop, approx_prefilter)
    w = Window.partitionBy(*[F.col(k) if isinstance(k, str) else k for k in keys]).orderBy(
        c.asc() if asc else c.desc()
    )
    rk = (F.rank() if with_ties else F.row_number()).over(w)
    if prop is not None:
        # dplyr slice_min/max(prop=): floor(prop * group size) rows.  The
        # group count rides the SAME window partition — no extra shuffle.
        # Both window exprs materialize as columns first (window fns are
        # illegal directly inside WHERE).
        cnt = F.count(F.lit(1)).over(
            Window.partitionBy(*[F.col(k) if isinstance(k, str) else k for k in keys])
        )
        return (
            df.withColumn("__rk", rk)
            .withColumn("__lim", F.floor(F.lit(prop) * cnt))
            .where(F.col("__rk") <= F.col("__lim"))
            .drop("__rk", "__lim")
        )
    return df.withColumn("__rk", rk).where(F.col("__rk") <= F.lit(n)).drop("__rk")


_PREFILTER_MARGIN = 0.02  # quantile-space slack ≫ percentile_approx rank error
_PREFILTER_ACC = 10_000


def _slice_prop_refined(
    df: DataFrame,
    order: Column,
    by: object,
    asc: bool,
    with_ties: bool,
    prop: float,
    prefilter: str | Column,
) -> DataFrame:
    """EXACT ``slice_min/max(prop=)`` with an approximate pre-cut — the
    100 TB shape for ranked fraction-slicing.

    The plain path ranks EVERY row inside one window partition per group
    (a full per-group sort; with few groups, a handful of giant tasks).
    Here a bounded-state sketch pass finds, per group, a loosened
    quantile cut on ``prefilter`` (a non-null numeric column that equals
    or leads the ranking order); only survivors — ~(prop + margin) of
    each group — enter the exact ranking window.  Results are identical:
    the cut sits at quantile prop + ``_PREFILTER_MARGIN`` while
    ``percentile_approx``'s rank error at accuracy 10⁴ is 10⁻⁴·n, so any
    row of the true slice would need > margin·n rows ordered above it to
    be cut — contradicting membership in the floor(prop·n) slice (the
    limit uses the TRUE group count from the sketch pass, not the
    survivor count).

    Requires string group keys (the cut joins back on them; per-group
    stats rows are broadcast — bytes per group).
    """
    keys = [by] if isinstance(by, str) else list(by or [])
    if not all(isinstance(k, str) for k in keys):
        raise ValueError("approx_prefilter requires string group keys")
    pf = F.col(prefilter) if isinstance(prefilter, str) else prefilter
    q = (
        min(1.0, prop + _PREFILTER_MARGIN)
        if asc
        else max(0.0, 1.0 - prop - _PREFILTER_MARGIN)
    )
    stats = df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("__n_g"),
        F.percentile_approx(pf, F.lit(q), F.lit(_PREFILTER_ACC)).alias("__thr"),
    )
    if keys:
        # null-SAFE join-back: the plain window path keeps NULL group keys
        # as their own partition, so the prefilter path must too.
        st = stats
        for k in keys:
            st = st.withColumnRenamed(k, f"__k_{k}")
        cond = None
        for k in keys:
            c = F.col(k).eqNullSafe(F.col(f"__k_{k}"))
            cond = c if cond is None else (cond & c)
        joined = df.join(F.broadcast(st), cond).drop(*[f"__k_{k}" for k in keys])
    else:
        joined = df.crossJoin(F.broadcast(stats))
    cand = joined.where(pf <= F.col("__thr") if asc else pf >= F.col("__thr"))
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(
        order.asc() if asc else order.desc()
    )
    rk = (F.rank() if with_ties else F.row_number()).over(w)
    return (
        cand.withColumn("__rk", rk)
        .where(F.col("__rk") <= F.floor(F.lit(prop) * F.col("__n_g")))
        .drop("__rk", "__n_g", "__thr")
    )


def slice_min(
    df: DataFrame,
    order_col: str | Column,
    n: int = 1,
    by: object = None,
    with_ties: bool = True,
    prop: float | None = None,
    approx_prefilter: str | Column | None = None,
) -> DataFrame:
    """Smallest-n rows (optionally per group) — `dplyr::slice_min`
    (used in the reference example, `R/mutate.R:81`).  Windowed rank, not a
    global sort: one shuffle on the keys, early filter.  ``prop=`` keeps
    floor(prop·group_size) rows instead of a fixed n (dplyr parity).
    ``approx_prefilter=`` (with ``prop=``): a non-null numeric column
    equal to / leading the order — enables the sketch-cut-then-rank plan
    (see :func:`_slice_prop_refined`); identical results, and the exact
    per-group sort shrinks to ~prop of the data."""
    return _slice_ranked(
        df, order_col, n, by, asc=True, with_ties=with_ties, prop=prop,
        approx_prefilter=approx_prefilter,
    )


def slice_max(
    df: DataFrame,
    order_col: str | Column,
    n: int = 1,
    by: object = None,
    with_ties: bool = True,
    prop: float | None = None,
    approx_prefilter: str | Column | None = None,
) -> DataFrame:
    return _slice_ranked(
        df, order_col, n, by, asc=False, with_ties=with_ties, prop=prop,
        approx_prefilter=approx_prefilter,
    )


def slice_head(df: DataFrame, n: int, by: object = None, order_by: object = None) -> DataFrame:
    """First-n rows per group in a *stated* order (Spark has no implicit
    row order; order_by is required when by is given)."""
    if by is None and order_by is None:
        return df.limit(n)
    if order_by is None:
        raise ValueError("slice_head with `by` requires order_by")
    keys = [by] if isinstance(by, (str, Column)) else list(by or [])
    order = [order_by] if isinstance(order_by, (str, Column)) else list(order_by)
    w = Window.partitionBy(*keys).orderBy(*[F.col(c) if isinstance(c, str) else c for c in order])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= n)
        .drop("__rn")
    )


def slice_sample(df: DataFrame, prop: float, seed: int = 42) -> DataFrame:
    """Seeded Bernoulli sample (`dplyr::slice_sample(prop=)`) — the
    reference's fixture-gap generator (`R/mutate.R:87-92`)."""
    return df.sample(withReplacement=False, fraction=prop, seed=seed)


def nest(
    df: DataFrame, *, by: str | list[str], into: str = "data", sort_by: str | list[str] | None = None
) -> DataFrame:
    """`tidyr::nest`: one row per group with the remaining columns packed
    into an array<struct> column.  The group must fit in executor memory —
    the same contract the reference's nest() has on RAM
    (`R/mutate.R:278-280`).  ``sort_by`` makes the array order
    deterministic (collect_list order is otherwise partition-dependent).
    """
    keys = [by] if isinstance(by, str) else list(by)
    rest = [c for c in df.columns if c not in keys]
    payload = F.struct(*[F.col(c) for c in rest])
    agg = F.collect_list(payload)
    out = df.groupBy(*keys).agg(agg.alias(into))
    if sort_by:
        sk = [sort_by] if isinstance(sort_by, str) else list(sort_by)
        if sk != rest[: len(sk)]:
            # array_sort on structs orders by field sequence — reorder the
            # struct so the sort keys lead
            ordered = sk + [c for c in rest if c not in sk]
            payload = F.struct(*[F.col(c) for c in ordered])
            out = df.groupBy(*keys).agg(F.array_sort(F.collect_list(payload)).alias(into))
        else:
            out = df.groupBy(*keys).agg(F.array_sort(agg).alias(into))
    return out


def unnest(df: DataFrame, col: str = "data") -> DataFrame:
    """`tidyr::unnest`: explode an array<struct> back into flat rows."""
    keys = [c for c in df.columns if c != col]
    exploded = df.select(*keys, F.explode(F.col(col)).alias("__row"))
    inner = exploded.select("__row.*").columns
    return exploded.select(*keys, *[F.col(f"__row.{c}").alias(c) for c in inner])


def separate(
    df: DataFrame,
    col: str,
    into: list[str],
    sep: str = "[^A-Za-z0-9]+",
    *,
    keep: bool = False,
) -> DataFrame:
    """`tidyr::separate`: split a string column into ``into`` columns by a
    regex separator; missing pieces become NULL."""
    parts = F.split(F.col(col), sep)
    out = df
    for i, name in enumerate(into):
        out = out.withColumn(name, F.element_at(parts, i + 1))
    return out if keep else out.drop(col)


def unite(
    df: DataFrame, col: str, cols: list[str], sep: str = "_", *, keep: bool = False
) -> DataFrame:
    """`tidyr::unite`: paste ``cols`` into one string column."""
    out = df.withColumn(col, F.concat_ws(sep, *[F.col(c) for c in cols]))
    return out if keep else out.drop(*[c for c in cols if c != col])


def pivot_wider(
    df: DataFrame,
    *,
    id_cols: str | list[str],
    names_from: str,
    values_from: str,
    values_fn: str = "first",
    names: list[str] | None = None,
    values_fill: object = None,
) -> DataFrame:
    """`tidyr::pivot_wider`: one column per distinct ``names_from`` value.

    Pass ``names`` (the expected pivot values) in production — without it
    Spark must run an extra distinct-collection job over the data, and the
    output schema becomes data-dependent (a 100 TB anti-pattern).

    ``values_fill`` (tidyr's knob of the same name) replaces ONLY the
    NULLs of structurally-absent (id, name) cells — combinations with no
    input row at all (e.g. ``0`` when ``values_fn="count"``).  A cell
    whose rows exist but whose aggregate is genuinely NULL (say
    ``values_fn="first"`` over a stored NULL) stays NULL, exactly
    tidyr's contract: each cell carries ``count(1)`` alongside the
    aggregate, so absent (NULL struct) and present-but-NULL are
    distinguishable at fill time (ADVICE r05 #3 — a bare ``na.fill``
    over the value columns conflated the two).
    """
    ids = [id_cols] if isinstance(id_cols, str) else list(id_cols)
    g = df.groupBy(*ids)
    p = g.pivot(names_from, names) if names else g.pivot(names_from)
    if values_fill is None:
        return p.agg(F.expr(f"{values_fn}({values_from})"))
    out = p.agg(
        F.expr(f"struct(count(1) AS __n, {values_fn}({values_from}) AS __v)")
    )
    return out.select(
        *ids,
        *[
            F.when(F.coalesce(F.col(quote(c))["__n"], F.lit(0)) > 0, F.col(quote(c))["__v"])
            .otherwise(F.lit(values_fill))
            .alias(c)
            for c in out.columns
            if c not in ids
        ],
    )


def pivot_longer(
    df: DataFrame,
    cols: list[str],
    *,
    names_to: str = "name",
    values_to: str = "value",
) -> DataFrame:
    """`tidyr::pivot_longer`: melt ``cols`` into (name, value) rows via
    ``stack`` — a generator expression, no shuffle at all."""
    keep = [c for c in df.columns if c not in cols]
    pairs = ", ".join(f"'{c}', {quote(c)}" for c in cols)
    stack = f"stack({len(cols)}, {pairs}) AS ({quote(names_to)}, {quote(values_to)})"
    return df.selectExpr(*[quote(k) for k in keep], stack)


def quote(name: str) -> str:
    return "`" + name.replace("`", "``") + "`"


def fill_down(
    df: DataFrame,
    cols: str | list[str],
    *,
    by: object = None,
    order_by: object = None,
) -> DataFrame:
    """Last-observation-carried-forward (`tidyr::fill(.direction="down")`):
    NULLs take the most recent non-NULL value in order, per group.

    ``last(col, ignorenulls=True)`` over an unbounded-preceding frame —
    one shuffle on the keys, incremental evaluation.
    """
    return _fill(df, cols, by, order_by, direction="down")


def fill_up(
    df: DataFrame,
    cols: str | list[str],
    *,
    by: object = None,
    order_by: object = None,
) -> DataFrame:
    """Next-observation-carried-backward (`tidyr::fill(.direction="up")`)."""
    return _fill(df, cols, by, order_by, direction="up")


def _fill(df, cols, by, order_by, direction):
    if order_by is None:
        raise ValueError("fill requires order_by (Spark has no physical row order)")
    cols_l = [cols] if isinstance(cols, str) else list(cols)
    keys = [by] if isinstance(by, (str, Column)) else list(by or [])
    order = [order_by] if isinstance(order_by, (str, Column)) else list(order_by)
    ocols = [F.col(c) if isinstance(c, str) else c for c in order]
    if direction == "down":
        w = Window.partitionBy(*keys).orderBy(*ocols).rowsBetween(
            Window.unboundedPreceding, 0
        )
        pick = F.last
    else:
        w = Window.partitionBy(*keys).orderBy(*ocols).rowsBetween(
            0, Window.unboundedFollowing
        )
        pick = F.first
    out = df
    for c in cols_l:
        out = out.withColumn(c, pick(F.col(c), ignorenulls=True).over(w))
    return out


def complete(
    df: DataFrame,
    *cols: str | tuple[str, ...],
    fill: dict[str, object] | None = None,
) -> DataFrame:
    """Materialize every combination of the ``cols`` values
    (`tidyr::complete`): the full cross of each column's distinct values,
    left-joined back onto the data; absent rows appear with NULLs (or the
    ``fill`` defaults per column).

    A TUPLE factor is `tidyr::nesting()`: its columns contribute only the
    OBSERVED combinations — one composite-key ``distinct()`` — instead of
    crossing each column separately.  ``complete(df, ("a", "b"), "c")``
    expands observed (a, b) pairs × distinct c.

    Scale shape: each factor frame is an aggregated (tiny) side — the
    crosses are broadcast nested-loop joins over dimension-sized inputs,
    and the final left join hashes on the full key.  The frame EXPANDS to
    ∏|factor| rows — that product, not the input size, is the scale
    bound, same as in R; nesting() factors both shrink the product and
    replace a BNLJ chain with one distinct.
    """
    if len(cols) < 1:
        raise ValueError("complete() needs at least one column")
    groups = [(c,) if isinstance(c, str) else tuple(c) for c in cols]
    flat = [c for g in groups for c in g]
    grid = df.select(*groups[0]).distinct()
    for g in groups[1:]:
        grid = grid.crossJoin(df.select(*g).distinct())
    out = grid.join(df, on=flat, how="left")
    if fill:
        # NULL-only fill, NOT df.fillna: Spark's na.fill also rewrites
        # NaN, silently clobbering a genuine NaN aggregate in PRESENT
        # rows to the absent-cell default (nanvals edge axis).  Every
        # NULL in the column is a fill target — the left-join NULLs of
        # absent combinations AND pre-existing explicit NULLs in present
        # rows (same targets fillna had); only NaN is preserved.
        # fillna's type guard is kept: a fill value whose Python type
        # doesn't match the column is SKIPPED, exactly as na.fill did —
        # without it, when/otherwise would coerce through the common
        # type (fill={'s': 0} on a string column rewriting NULL -> '0').
        from pyspark.sql import types as T

        _numeric = (
            T.ByteType, T.ShortType, T.IntegerType, T.LongType,
            T.FloatType, T.DoubleType,
        )
        for c, v in fill.items():
            dtype = out.schema[c].dataType
            if isinstance(v, bool):
                ok = isinstance(dtype, T.BooleanType)
            elif isinstance(v, (int, float)):
                ok = isinstance(dtype, _numeric)
            elif isinstance(v, str):
                ok = isinstance(dtype, T.StringType)
            else:
                ok = False
            if not ok:
                continue
            out = out.withColumn(
                c, F.when(F.col(c).isNull(), F.lit(v)).otherwise(F.col(c))
            )
    return out.select(*df.columns)


def pct_change(
    df: DataFrame,
    col: str,
    *,
    by: object = None,
    order_by: object = None,
    out: str | None = None,
) -> DataFrame:
    """Relative change vs the previous row (`(x - lag(x)) / lag(x)`)."""
    return _lag_delta(df, col, by, order_by, out or f"{col}_pct_change", relative=True)


def diff(
    df: DataFrame,
    col: str,
    *,
    by: object = None,
    order_by: object = None,
    out: str | None = None,
) -> DataFrame:
    """First difference vs the previous row (R ``diff`` / pandas ``diff``)."""
    return _lag_delta(df, col, by, order_by, out or f"{col}_diff", relative=False)


def _lag_delta(df, col, by, order_by, out, relative):
    if order_by is None:
        raise ValueError("diff/pct_change require order_by")
    keys = [by] if isinstance(by, (str, Column)) else list(by or [])
    order = [order_by] if isinstance(order_by, (str, Column)) else list(order_by)
    w = Window.partitionBy(*keys).orderBy(
        *[F.col(c) if isinstance(c, str) else c for c in order]
    )
    prev = F.lag(F.col(col)).over(w)
    delta = F.col(col) - prev
    # nullif guard: under ANSI mode (session default) a 0 baseline would
    # raise DIVIDE_BY_ZERO; NULL matches SQL semantics for an undefined
    # relative change
    return df.withColumn(
        out, (delta / F.nullif(prev, F.lit(0))) if relative else delta
    )


# --- set operations (dplyr names; SURVEY §2.3 "Set ops" row) ---------------


def union_all(a: DataFrame, b: DataFrame) -> DataFrame:
    """Bag union by column NAME (dplyr ``bind_rows``) — positional union
    silently mismatches reordered schemas."""
    return a.unionByName(b)


def union_(a: DataFrame, b: DataFrame) -> DataFrame:
    """Set union (distinct)."""
    return a.unionByName(b).distinct()


def intersect_(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.intersect(b)


def setdiff(a: DataFrame, b: DataFrame) -> DataFrame:
    """Set difference (EXCEPT DISTINCT) — dplyr::setdiff semantics: a row of
    ``a`` that appears ANYWHERE in ``b`` is removed entirely.  (exceptAll +
    distinct would be bag-difference: a row duplicated in ``a`` more times
    than in ``b`` would wrongly survive.)"""
    return a.subtract(b)


def mode_by(
    df: DataFrame,
    value_col: str,
    *,
    by: str | list[str],
    out: str = "mode_val",
    n_col: str = "mode_n",
) -> DataFrame:
    """Deterministic per-group mode: the most frequent ``value_col`` per
    key, ties broken toward the SMALLEST value — unlike Spark's / DuckDB's
    ``mode()`` aggregates, whose tie winner is partition-order dependent
    (Spark picks an arbitrary max-count value; determinism rule forbids
    that on the board).

    Lowering: hash-aggregate counts per ``(keys, value)`` (partial
    map-side combine — the shuffle carries one row per distinct pair,
    not per input row), then ``row_number`` over ``(count DESC, value
    ASC)`` per key on that already-aggregated frame.  The window's
    partition size is the per-key VALUE CARDINALITY, never the raw row
    count, so a billion-row key with a thousand distinct values sorts a
    thousand rows — scale-safe where a naive sort-all-rows would not be.
    NULL values are dropped (they are not a mode candidate, matching
    SQL aggregate NULL semantics).
    """
    keys = [by] if isinstance(by, str) else list(by)
    counts = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*keys, value_col)
        .agg(F.count(F.lit(1)).alias(n_col))
    )
    w = Window.partitionBy(*keys).orderBy(
        F.col(n_col).desc(), F.col(value_col).asc()
    )
    return (
        counts.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
        .withColumnRenamed(value_col, out)
        .select(*keys, out, n_col)
    )


def mode_by_sql(
    table: str,
    value_col: str,
    *,
    by: str | list[str],
    out: str = "mode_val",
    n_col: str = "mode_n",
    where: str = "TRUE",
) -> str:
    """DuckDB mirror of :func:`mode_by` — same count + row_number
    lowering (DuckDB's native ``mode()`` has the same arbitrary-tie
    problem the operator exists to fix, so the mirror can't use it)."""
    keys = [by] if isinstance(by, str) else list(by)
    ks = ", ".join(keys)
    return f"""
        WITH counts AS (
          SELECT {ks}, {value_col}, count(*)::BIGINT AS {n_col}
          FROM {table}
          WHERE {value_col} IS NOT NULL AND ({where})
          GROUP BY {ks}, {value_col}
        )
        SELECT {ks}, {value_col} AS {out}, {n_col}
        FROM (
          SELECT *, row_number() OVER (
                   PARTITION BY {ks}
                   ORDER BY {n_col} DESC, {value_col} ASC
                 ) AS rn
          FROM counts
        ) WHERE rn = 1"""
