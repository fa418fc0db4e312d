"""Temporal operators Spark lacks as primitives: as-of join, sessionize.

SURVEY.md §2.3 notes the as-of/range-join need is only partially covered by
the reference's O5 range frames; these close it, Spark-first:

* :func:`asof_join` — point-in-time join ("most recent right row at or
  before each left row") via the union+window technique: no cross/range
  join, one shuffle on (keys), one per-partition sort — the same cost as a
  grouped window.  The DuckDB oracle uses its *native* ``ASOF JOIN``, so
  the differential test crosses two genuinely different implementations.
* :func:`sessionize` — gap-based session ids per key: lag + flag + running
  sum, all inside one WindowSpec.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "asof_join",
    "interval_join",
    "sessionize",
    "session_agg",
    "session_agg_sql",
    "funnel",
    "funnel_sql",
    "cohort_retention",
    "cohort_retention_sql",
    "time_bucket_gapfill",
    "time_bucket_gapfill_sql",
    "ewma",
    "ewma_sql",
    "time_weighted_avg",
    "time_weighted_avg_sql",
    "overlap_join",
    "funnel_windowed",
    "funnel_windowed_sql",
    "linear_attribution",
    "linear_attribution_sql",
    "interval_merge",
    "interval_merge_sql",
    "rolling_distinct",
    "rolling_distinct_sql",
]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    time_col: str,
    value_cols: list[str],
    direction: str = "backward",
    suffix: str = "_right",
    tolerance_us: int | None = None,
) -> DataFrame:
    """For each left row, attach ``value_cols`` from the most recent right
    row with right.time ≤ left.time (direction="backward"; "forward" takes
    the nearest right.time ≥ left.time; "nearest" takes whichever side is
    closer in time, ties to backward) sharing the ``on`` keys.

    Technique: tag both sides, union, and take
    ``last(value, ignorenulls=True)`` over
    ``partitionBy(on).orderBy(time, side)`` — right rows sort before left
    rows at equal times, so "at or before" includes exact matches.  Left
    rows with no prior right row get NULLs (left-join semantics).

    ``tolerance_us`` (pandas ``merge_asof`` semantics): a match farther
    than this many microseconds from the left row is DISCARDED — the
    values null out, exactly as if no right row existed.  The distance
    is measured PER VALUE COLUMN to the right row that actually supplied
    that value (the ignorenulls pick can skip NULL-valued right rows, so
    the supplying row's time — not the nearest right row's — is the
    honest staleness).  Same plan; one extra windowed column per value.
    """
    if tolerance_us is not None and tolerance_us < 0:
        raise ValueError(
            f"asof_join: tolerance_us must be >= 0, got {tolerance_us}"
        )
    keys = [on] if isinstance(on, str) else list(on)
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError("direction must be 'backward', 'forward' or 'nearest'")
    if tolerance_us is not None and direction == "nearest":
        raise ValueError("tolerance_us supports backward/forward directions")

    out_vals = [f"{c}{suffix}" for c in value_cols]
    l_tag = left
    for c, oc in zip(value_cols, out_vals):
        l_tag = l_tag.withColumn(oc, F.lit(None).cast(right.schema[c].dataType))
    l_tag = l_tag.withColumn("__side", F.lit(1))

    r_tag = right.select(
        *keys,
        F.col(time_col),
        *[F.col(c).alias(oc) for c, oc in zip(value_cols, out_vals)],
    ).withColumn("__side", F.lit(0))
    for c in l_tag.columns:
        if c not in r_tag.columns:
            r_tag = r_tag.withColumn(c, F.lit(None).cast(l_tag.schema[c].dataType))

    u = l_tag.unionByName(r_tag)
    if direction == "nearest":
        # BOTH directional picks in one partitioning (two sorts share one
        # exchange), then choose per row by time distance — ties and
        # one-sided misses fall back to the backward match.
        wb = (
            Window.partitionBy(*keys)
            .orderBy(F.col(time_col).asc(), F.col("__side").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        wf = (
            Window.partitionBy(*keys)
            .orderBy(F.col(time_col).asc(), F.col("__side").desc())
            .rowsBetween(0, Window.unboundedFollowing)
        )
        dt = u.schema[time_col].dataType.simpleString()

        def num(c: F.Column) -> F.Column:
            return F.unix_micros(c) if dt.startswith("timestamp") else c.cast("double")

        # side choice PER VALUE COLUMN against the rows that actually
        # supply the value (ignorenulls can skip NULL-valued right rows,
        # so the nearest right ROW's time is not the honest distance —
        # same principle as the tolerance path below)
        picked = u
        tmp = []
        for oc in out_vals:
            supplied = F.when(
                (F.col("__side") == 0) & F.col(oc).isNotNull(),
                F.col(time_col),
            )
            picked = (
                picked.withColumn(
                    f"__tb_{oc}", F.last(supplied, ignorenulls=True).over(wb)
                )
                .withColumn(
                    f"__tf_{oc}", F.first(supplied, ignorenulls=True).over(wf)
                )
                .withColumn(
                    f"__b_{oc}", F.last(oc, ignorenulls=True).over(wb)
                )
                .withColumn(
                    f"__f_{oc}", F.first(oc, ignorenulls=True).over(wf)
                )
            )
            tmp += [f"__tb_{oc}", f"__tf_{oc}", f"__b_{oc}", f"__f_{oc}"]
        for oc in out_vals:
            use_b = F.col(f"__tf_{oc}").isNull() | (
                F.col(f"__tb_{oc}").isNotNull()
                & (
                    (num(F.col(time_col)) - num(F.col(f"__tb_{oc}")))
                    <= (num(F.col(f"__tf_{oc}")) - num(F.col(time_col)))
                )
            )
            picked = picked.withColumn(
                oc, F.when(use_b, F.col(f"__b_{oc}")).otherwise(F.col(f"__f_{oc}"))
            )
        return picked.where(F.col("__side") == 1).drop("__side", *tmp)
    if direction == "backward":
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col(time_col).asc(), F.col("__side").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        pick = F.last
    else:
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col(time_col).asc(), F.col("__side").desc())
            .rowsBetween(0, Window.unboundedFollowing)
        )
        pick = F.first
    filled = u
    tmp_cols: list[str] = []
    if tolerance_us is not None:
        # the matched time per value column = the time of the right row
        # that SUPPLIES the value through the ignorenulls pick — derive
        # it from the raw (pre-pick) values under the same window
        for oc in out_vals:
            mt = f"__mt_{oc}"
            tmp_cols.append(mt)
            supplied = F.when(
                (F.col("__side") == 0) & F.col(oc).isNotNull(),
                F.col(time_col),
            )
            filled = filled.withColumn(
                mt, pick(supplied, ignorenulls=True).over(w)
            )
    for oc in out_vals:
        filled = filled.withColumn(oc, pick(F.col(oc), ignorenulls=True).over(w))
    if tolerance_us is not None:
        dt = u.schema[time_col].dataType.simpleString()

        def num(c: F.Column) -> F.Column:
            return F.unix_micros(c) if dt.startswith("timestamp") else c.cast("double")

        for oc in out_vals:
            dist = F.abs(num(F.col(time_col)) - num(F.col(f"__mt_{oc}")))
            filled = filled.withColumn(
                oc, F.when(dist <= F.lit(tolerance_us), F.col(oc))
            )
        filled = filled.drop(*tmp_cols)
    return filled.where(F.col("__side") == 1).drop("__side")


def interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    time_col: str,
    start_col: str,
    end_col: str,
    on: str | list[str] | None = None,
    bucket_seconds: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Point-in-interval join: each left row (at ``time_col``) matched to
    every right interval with ``start <= t < end`` (half-open), optionally
    also requiring equality on ``on`` keys.

    Spark has no native range join — a raw ``l.t >= r.start AND l.t <
    r.end`` predicate plans as BroadcastNestedLoopJoin (all-pairs compare;
    at 100 TB, never).  The scale-safe lowering is TIME BUCKETING:

    * each interval explodes to the fixed-width buckets it covers;
    * each point computes its single bucket;
    * the join is an EQUI-join on (bucket [, keys]) + the exact range
      refinement — shuffle-partitionable, AQE-skew-splittable.

    A point matches an interval only via the point's own bucket, so the
    explode introduces NO duplicate matches and no distinct is needed.
    Pick ``bucket_seconds`` near the typical interval length: cost is
    ~(interval_len / bucket) replicated interval rows per interval vs
    finer join selectivity — the classic block-size trade-off.  Column
    names must be disjoint across the two frames except the ``on`` keys.
    """
    if how not in ("inner", "left"):
        raise ValueError("how must be 'inner' or 'left'")
    if bucket_seconds <= 0:
        raise ValueError("bucket_seconds must be positive")
    keys = [on] if isinstance(on, str) else list(on or [])
    b_us = bucket_seconds * 1_000_000

    t_us = F.unix_micros(F.col(time_col))
    # integer div, not float-divide-and-floor: epoch-µs magnitudes make
    # float quotients boundary-hazardous (repo-wide determinism rule)
    lb = left.withColumn(
        "__lb", F.expr(_floordiv(f"unix_micros({time_col})", b_us))
    )

    s_us = F.unix_micros(F.col(start_col))
    e_us = F.unix_micros(F.col(end_col))
    covered = F.when(
        e_us > s_us,
        F.sequence(
            F.expr(_floordiv(f"unix_micros({start_col})", b_us)),
            F.expr(_floordiv(f"unix_micros({end_col}) - 1", b_us)),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    rb = right.withColumn("__rb", F.explode(covered))
    ren = {k: f"__r_{k}" for k in keys}
    for k, rk in ren.items():
        rb = rb.withColumnRenamed(k, rk)

    cond = F.col("__lb") == F.col("__rb")
    for k, rk in ren.items():
        cond = cond & (F.col(k) == F.col(rk))
    cond = cond & (t_us >= s_us) & (t_us < e_us)
    return lb.join(rb, cond, how).drop("__lb", "__rb", *ren.values())


def sessionize(
    df: DataFrame,
    key_col: str,
    time_col: str,
    gap_seconds: int,
    session_col: str = "session_id",
    tiebreak_cols: list[str] | tuple[str, ...] = (),
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the time since
    the key's previous event exceeds ``gap_seconds``.

    ``session_id`` is 1-based and consecutive per key.  One shuffle on the
    key, one sort — the batch analog of a streaming session window.

    ``tiebreak_cols``: extra ordering columns appended after the timestamp.
    When a key can have two events at the same instant, lag() and the
    running sum are otherwise tie-ambiguous and the ids assigned at a
    session boundary become partition/engine-dependent — pass a unique id
    column to make the assignment deterministic.
    """
    if gap_seconds < 0:
        raise ValueError(f"sessionize: gap_seconds must be >= 0, got {gap_seconds}")
    t = F.unix_micros(F.col(time_col))
    order = [t, *(F.col(c) for c in tiebreak_cols)]
    w = Window.partitionBy(key_col).orderBy(*order)
    gap_us = gap_seconds * 1_000_000
    new_flag = F.when(
        (t - F.lag(t).over(w)) > gap_us, 1
    ).otherwise(0)
    # first event per key has lag NULL → comparison NULL → otherwise(0);
    # cumulative sum starts sessions at 0 → +1 for 1-based ids
    run = Window.partitionBy(key_col).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return df.withColumn(session_col, (F.sum(new_flag).over(run) + 1).cast("long"))


def session_agg(
    df: DataFrame,
    key_col: str,
    time_col: str,
    gap_seconds: int,
    aggs: dict[str, "F.Column"] | None = None,
) -> DataFrame:
    """Gap-based session AGGREGATION via Spark's native ``session_window``
    — one row per session instead of :func:`sessionize`'s one row per
    event.  Returns ``(key, session_start_us, session_end_us, n_events,
    *aggs)`` with the bounds as epoch microseconds (engine-portable
    integers; ``session_end`` is last event time + gap, per Spark's
    definition).

    This is the operator that carries over to Structured Streaming
    unchanged: the same ``groupBy(key, session_window(ts, gap))`` works
    under ``readStream`` with a watermark, where the lag/cumsum lowering
    of :func:`sessionize` cannot (no unbounded window over a stream).
    Batch plan: one shuffle on the key, per-partition merge of
    overlapping windows — same cost shape as the window lowering.
    """
    gap = f"{gap_seconds} seconds"
    agg_exprs = [F.count(F.lit(1)).alias("n_events")]
    for name, col in (aggs or {}).items():
        agg_exprs.append(col.alias(name))
    g = df.groupBy(
        F.col(key_col), F.session_window(F.col(time_col), gap).alias("__w")
    ).agg(*agg_exprs)
    return g.select(
        key_col,
        F.unix_micros(F.col("__w.start")).alias("session_start_us"),
        F.unix_micros(F.col("__w.end")).alias("session_end_us"),
        "n_events",
        *[name for name in (aggs or {})],
    )


def session_agg_sql(
    table: str = "events",
    key_col: str = "user_id",
    time_col: str = "ts",
    gap_seconds: int = 4 * 3600,
    extra_aggs: dict[str, str] | None = None,
) -> str:
    """DuckDB mirror of :func:`session_agg`: the lag/cumsum sessionization
    CTE grouped per session.  ``session_end = max(ts) + gap`` reproduces
    Spark's half-open session window bound."""
    gap_us = gap_seconds * 1_000_000
    extras = "".join(
        f", {expr} AS {name}" for name, expr in (extra_aggs or {}).items()
    )
    return f"""
        WITH marked AS (
          SELECT {key_col}, {time_col},
                 CASE WHEN epoch_us({time_col})
                        - lag(epoch_us({time_col})) OVER w > {gap_us}::BIGINT
                      THEN 1 ELSE 0 END AS new_s,
                 *
          FROM {table}
          WINDOW w AS (PARTITION BY {key_col} ORDER BY {time_col})
        ),
        sess AS (
          SELECT *, sum(new_s) OVER (PARTITION BY {key_col} ORDER BY {time_col}
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS sid
          FROM marked
        )
        SELECT {key_col},
               min(epoch_us({time_col}))::BIGINT AS session_start_us,
               (max(epoch_us({time_col})) + {gap_us})::BIGINT AS session_end_us,
               count(*)::BIGINT AS n_events{extras}
        FROM sess GROUP BY {key_col}, sid"""


def funnel(
    df: DataFrame,
    key_col: str,
    time_col: str,
    step_col: str,
    steps: list[str],
) -> DataFrame:
    """Ordered funnel analysis: for each key, the earliest time it
    completed each step IN SEQUENCE (step i+1 must strictly follow the
    key's step-i time).  Returns ``(key, t1..tk as epoch-µs, stage)``
    where ``stage`` is the furthest step reached; keys that never did
    step 1 are excluded (join the key dimension for full coverage).

    The classic conversion query (view → click → purchase).  Plan: one
    filtered min-aggregation per step, chained by per-key joins — k−1
    equi-joins all keyed on ``key_col``, so every stage shuffles on the
    same key (co-partitioned under AQE); no window over full event
    history, no per-key event collection.  The min-of-later-events
    definition ("earliest qualifying completion") matches the standard
    product-analytics semantics.
    """
    if not steps:
        raise ValueError("funnel: steps must be non-empty")
    t = F.unix_micros(F.col(time_col))
    stage = (
        df.where(F.col(step_col) == steps[0])
        .groupBy(key_col)
        .agg(F.min(t).alias("t1"))
    )
    out = stage
    for i, step in enumerate(steps[1:], start=2):
        if len(steps) > 2:
            # `out` feeds BOTH the next step's join and the final output,
            # and Spark does not de-duplicate the common subtree (no
            # ReusedExchange fires: the copies canonicalize differently
            # under the chained projections).  Left un-truncated the step-1
            # scan appears 2^(k-1) times in the physical plan — measured 7
            # events scans for the 3-step funnel.  Materialize the tiny
            # per-key cumulative frame once per step instead (r12, guide
            # §3.3 "materialising an intermediate truncates the plan");
            # after: one filtered scan + one keyed exchange per step.
            # Lazy persist, not localCheckpoint: the eager variant's
            # synchronous barrier measured slower than the shared cache
            # (funnel 0.69 -> 0.54 s min-of-6 at sf0.1).
            out = out.persist()
        nxt = (
            df.where(F.col(step_col) == step)
            .select(F.col(key_col), t.alias("__t"))
            .join(out.select(key_col, F.col(f"t{i-1}").alias("__prev")), key_col)
            .where(F.col("__t") > F.col("__prev"))
            .groupBy(key_col)
            .agg(F.min("__t").alias(f"t{i}"))
        )
        out = out.join(nxt, key_col, "left")
    # stage = the highest non-null step: wrap ascending so the HIGHEST
    # step's when() ends up outermost and wins
    stage_expr = F.lit(1)
    for i in range(2, len(steps) + 1):
        stage_expr = F.when(F.col(f"t{i}").isNotNull(), F.lit(i)).otherwise(
            stage_expr
        )
    return out.withColumn("stage", stage_expr.cast("long"))


def funnel_sql(
    table: str,
    key_col: str,
    time_col: str,
    step_col: str,
    steps: list[str],
) -> str:
    """DuckDB mirror of :func:`funnel` (same sequential-min chain)."""
    t = f"epoch_us({time_col})"
    ctes = [
        f"s1 AS (SELECT {key_col}, min({t}) AS t1 FROM {table}"
        f" WHERE {step_col} = '{_sq(steps[0])}' GROUP BY 1)"
    ]
    for i, step in enumerate(steps[1:], start=2):
        ctes.append(
            f"s{i} AS (SELECT e.{key_col}, min({t.replace(time_col, 'e.' + time_col)}) AS t{i}"
            f" FROM {table} e JOIN s{i-1} p ON e.{key_col} = p.{key_col}"
            f" WHERE e.{step_col} = '{_sq(step)}' AND epoch_us(e.{time_col}) > p.t{i-1}"
            f" GROUP BY 1)"
        )
    tcols = ", ".join(
        f"s{i}.t{i}" for i in range(1, len(steps) + 1)
    )
    joins = " ".join(
        f"LEFT JOIN s{i} ON s1.{key_col} = s{i}.{key_col}"
        for i in range(2, len(steps) + 1)
    )
    stage = "CASE "
    for i in range(len(steps), 1, -1):
        stage += f"WHEN s{i}.t{i} IS NOT NULL THEN {i} "
    stage += "ELSE 1 END"
    return f"""
        WITH {', '.join(ctes)}
        SELECT s1.{key_col}, {tcols}, ({stage})::BIGINT AS stage
        FROM s1 {joins}"""


def _floordiv(expr: str, d: int) -> str:
    """Exact FLOOR division of an integer Spark SQL expression by a
    positive constant — `div` truncates toward zero, which disagrees
    with floor for negative epochs (pre-1970 timestamps).  NOTE:
    DuckDB's `//` ALSO truncates toward zero (1.0.0: ``-7 // 2 = -3``),
    so DuckDB oracle mirrors need the same sign correction — use
    :func:`_floordiv_duck`, never bare ``//``, when the dividend can be
    negative."""
    return (
        f"(({expr}) div {d} - (CASE WHEN ({expr}) % {d} <> 0"
        f" AND ({expr}) < 0 THEN 1 ELSE 0 END))"
    )


def _floordiv_duck(expr: str, d: int) -> str:
    """Exact FLOOR division of an integer DuckDB expression by a
    positive constant.  DuckDB's ``//`` truncates toward zero
    (``-7 // 2 = -3``; ``epoch_us('1969-12-31 23:00') // 86400000000 =
    0``), so pre-epoch timestamps need the same sign correction the
    Spark side applies in :func:`_floordiv` — otherwise the two engines
    bucket pre-1970 rows differently and bit-parity breaks."""
    return (
        f"((({expr}) // {d}) - (CASE WHEN ({expr}) % {d} <> 0"
        f" AND ({expr}) < 0 THEN 1 ELSE 0 END))"
    )


def _sq(s: str) -> str:
    """Escape a string for a single-quoted SQL literal."""
    return s.replace("'", "''")


_PERIOD_US = {
    "day": 24 * 3600 * 1_000_000,
    "week": 7 * 24 * 3600 * 1_000_000,
}


def cohort_retention(
    df: DataFrame,
    key_col: str,
    time_col: str,
    period: str = "week",
) -> DataFrame:
    """Cohort retention: users grouped by the period (day / ISO week) of
    their FIRST event; for each (cohort, periods-since-cohort) cell, how
    many of the cohort's users were active.  The classic retention
    triangle.

    Output: ``(cohort_us, period_offset, n_users)`` — cohort period start
    as epoch-µs (engine-portable integer), offset in whole periods (exact
    integer division of truncated timestamps; the session runs UTC so
    periods are fixed-width — no DST).

    Plan: first-event period via one min-aggregation on the key; one join
    back keyed on the same column (co-partitioned under AQE — no second
    shuffle of the events); COUNT(DISTINCT user) per cell over ≤
    |cohorts|·|offsets| groups.  The distinct is per (cohort, offset)
    cell — Spark plans it as a two-phase partial-distinct aggregate, no
    row explosion.
    """
    if period not in _PERIOD_US:
        raise ValueError(f"period must be one of {sorted(_PERIOD_US)}")
    p = F.unix_micros(F.date_trunc(period, F.col(time_col)))
    first = df.groupBy(key_col).agg(F.min(p).alias("__cohort_us"))
    j = df.select(F.col(key_col), p.alias("__p_us")).join(first, key_col)
    return (
        j.groupBy(
            F.col("__cohort_us").alias("cohort_us"),
            ((F.col("__p_us") - F.col("__cohort_us")) / F.lit(_PERIOD_US[period]))
            .cast("long")
            .alias("period_offset"),
        )
        .agg(F.count_distinct(F.col(key_col)).alias("n_users"))
    )


def cohort_retention_sql(
    table: str = "events",
    key_col: str = "user_id",
    time_col: str = "ts",
    period: str = "week",
) -> str:
    """DuckDB mirror of :func:`cohort_retention` (same truncation — both
    engines truncate 'week' to the ISO Monday, 'day' to midnight)."""
    p = f"epoch_us(date_trunc('{period}', {time_col}))"
    period_us = _PERIOD_US[period]
    return f"""
        WITH first AS (
          SELECT {key_col}, min({p}) AS cohort_us
          FROM {table} GROUP BY 1
        )
        SELECT cohort_us,
               (({p} - cohort_us) // {period_us})::BIGINT AS period_offset,
               count(DISTINCT e.{key_col})::BIGINT AS n_users
        FROM {table} e JOIN first f ON e.{key_col} = f.{key_col}
        GROUP BY 1, 2"""


def time_bucket_gapfill(
    df: DataFrame,
    key_col: str,
    time_col: str,
    value_col: str,
    bucket_seconds: int = 86400,
    fill: str = "locf",
) -> DataFrame:
    """Hypertable-style regular-grid rollup with gap filling (the
    TimescaleDB ``time_bucket_gapfill`` shape): bucket each key's events
    onto a fixed time grid, aggregate, MATERIALIZE the key's missing
    buckets between its first and last event, and fill them.

    Returns ``(key, bucket_us, n, v100, filled)``: bucket start in
    epoch-µs, event count, penny-exact value sum (``Σ round(value·100)``
    — the repo-wide float-determinism rule), and whether the row was
    gap-filled.  ``fill='locf'`` carries the last observed ``v100``
    forward (n stays 0); ``fill='zero'`` fills zeros; ``fill='null'``
    leaves NULL; ``fill='linear'`` interpolates between the surrounding
    observed buckets (TimescaleDB ``interpolate``) in EXACT integer
    arithmetic — ``pv + ((nv−pv)·(t−pt)) div (nt−pt)`` with
    truncate-toward-zero division mirrored on both engines (every gap
    row has both neighbors because the grid spans observed min..max).

    Plan (100 TB reading): ONE shuffle aggregates (key, bucket) with
    map-side combine; the per-key grid is generated from a per-key 1-row
    (min, max) aggregate via ``sequence`` + ``explode`` — fan-out bounded
    by the key's time span over the bucket width, never a global
    calendar cross join; the fill is one window per key ordered by
    bucket.  Grid join and window share the key partitioning, so AQE
    plans them without a second exchange of the data rows.
    """
    if bucket_seconds < 1:
        raise ValueError(
            f"time_bucket_gapfill: bucket_seconds must be >= 1, got {bucket_seconds}"
        )
    if fill not in ("locf", "zero", "null", "linear"):
        raise ValueError("fill must be locf|zero|null|linear")
    b_us = int(bucket_seconds) * 1_000_000
    # exact integer FLOOR division (see interval_join / _floordiv)
    bucket = F.expr(
        f"({_floordiv(f'unix_micros({time_col})', b_us)}) * {b_us}"
    )
    agg = (
        df.select(
            F.col(key_col),
            bucket.alias("bucket_us"),
            F.round(F.col(value_col) * 100).cast("long").alias("__v"),
        )
        .groupBy(key_col, "bucket_us")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("__v").alias("v100"))
    )
    span = agg.groupBy(key_col).agg(
        F.min("bucket_us").alias("__lo"), F.max("bucket_us").alias("__hi")
    )
    grid = span.select(
        F.col(key_col),
        F.explode(
            F.sequence(F.col("__lo"), F.col("__hi"), F.lit(b_us))
        ).alias("bucket_us"),
    )
    joined = grid.join(agg, [key_col, "bucket_us"], "left")
    filled_flag = F.col("n").isNull()
    v = F.col("v100")
    if fill == "locf":
        w = (
            Window.partitionBy(key_col)
            .orderBy("bucket_us")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        v = F.last("v100", ignorenulls=True).over(w)
    elif fill == "zero":
        v = F.coalesce(F.col("v100"), F.lit(0))
    elif fill == "linear":
        wb = (
            Window.partitionBy(key_col)
            .orderBy("bucket_us")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        wf = (
            Window.partitionBy(key_col)
            .orderBy("bucket_us")
            .rowsBetween(0, Window.unboundedFollowing)
        )
        # anchor time must track the anchor VALUE: an observed bucket
        # whose v100 is NULL (all-NULL values) is not a valid anchor —
        # pairing its time with an earlier bucket's value would slope
        # the interpolation over the wrong time base
        obs_t = F.when(F.col("v100").isNotNull(), F.col("bucket_us"))
        joined = (
            joined.withColumn("__pv", F.last("v100", ignorenulls=True).over(wb))
            .withColumn("__pt", F.last(obs_t, ignorenulls=True).over(wb))
            .withColumn("__nv", F.first("v100", ignorenulls=True).over(wf))
            .withColumn("__nt", F.first(obs_t, ignorenulls=True).over(wf))
        )
        # truncate-toward-zero division on the signed numerator, mirrored
        # exactly by the oracle (DuckDB // floors, so sign-decompose)
        interp = F.col("__pv") + F.expr(
            "(abs((__nv - __pv) * (bucket_us - __pt)) div (__nt - __pt))"
            " * (CASE WHEN __nv >= __pv THEN 1 ELSE -1 END)"
        )
        # observed buckets whose v100 is NULL (all-NULL values) also
        # interpolate — value presence, not bucket presence, is the rule
        v = F.when(F.col("v100").isNotNull(), F.col("v100")).otherwise(interp)
    return joined.select(
        F.col(key_col),
        F.col("bucket_us").cast("long"),
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n"),
        v.cast("long").alias("v100"),
        filled_flag.alias("filled"),
    )


def time_bucket_gapfill_sql(
    table: str = "events",
    key_col: str = "user_id",
    time_col: str = "ts",
    value_col: str = "value",
    bucket_seconds: int = 86400,
    fill: str = "locf",
) -> str:
    """DuckDB mirror of :func:`time_bucket_gapfill` (same epoch-µs grid,
    penny sums, and fill rules)."""
    b_us = int(bucket_seconds) * 1_000_000
    fills = {
        "locf": """last_value(v100 IGNORE NULLS) OVER (
                     PARTITION BY key ORDER BY bucket_us
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""",
        "zero": "coalesce(v100, 0)",
        "null": "v100",
        "linear": """CASE WHEN v100 IS NOT NULL THEN v100 ELSE
            pv + (abs((nv - pv) * (bucket_us - pt)) // (nt - pt))
                 * (CASE WHEN nv >= pv THEN 1 ELSE -1 END) END""",
    }
    interp_cols = ""
    if fill == "linear":
        interp_cols = """,
                 last_value(a.v100 IGNORE NULLS) OVER (
                   PARTITION BY g.key ORDER BY g.bucket_us
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
                 last_value(CASE WHEN a.v100 IS NOT NULL THEN g.bucket_us END
                            IGNORE NULLS) OVER (
                   PARTITION BY g.key ORDER BY g.bucket_us
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
                 first_value(a.v100 IGNORE NULLS) OVER (
                   PARTITION BY g.key ORDER BY g.bucket_us
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
                 first_value(CASE WHEN a.v100 IS NOT NULL THEN g.bucket_us END
                             IGNORE NULLS) OVER (
                   PARTITION BY g.key ORDER BY g.bucket_us
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt"""
    return f"""
        WITH agg AS (
          SELECT {key_col} AS key,
                 ({_floordiv_duck(f'epoch_us({time_col})', b_us)}) * {b_us} AS bucket_us,
                 count(*)::BIGINT AS n,
                 CAST(sum(round({value_col} * 100)) AS BIGINT) AS v100
          FROM {table} GROUP BY 1, 2
        ),
        span AS (
          SELECT key, min(bucket_us) AS lo, max(bucket_us) AS hi FROM agg
          GROUP BY 1
        ),
        grid AS (
          SELECT key, unnest(range(lo, hi + 1, {b_us})) AS bucket_us FROM span
        ),
        j AS (
          SELECT g.key, g.bucket_us, a.n, a.v100{interp_cols}
          FROM grid g LEFT JOIN agg a USING (key, bucket_us)
        )
        SELECT key AS {key_col}, bucket_us::BIGINT AS bucket_us,
               coalesce(n, 0)::BIGINT AS n,
               CAST({fills[fill]} AS BIGINT) AS v100,
               n IS NULL AS filled
        FROM j"""


def ewma(
    df: DataFrame,
    key_col: str,
    time_col: str,
    value_col: str,
    tiebreak_col: str,
    lookback: int = 8,
) -> DataFrame:
    """Windowed exponential moving average (α = 1/2) per key, in EXACT
    integer arithmetic so it hash-matches any engine bit-for-bit.

    The textbook recursive EWMA (y_i = αx_i + (1−α)y_{i−1}) is a scan no
    SQL window expresses, and float prefix-sum tricks ((1−α)^{-j} weights)
    overflow for long series.  This is the production-safe variant: a
    *finite-lookback* EWMA over the last ``lookback``+1 rows with weights
    2^(lookback−j) — i.e. α=1/2 truncated — computed as two BIGINT dot
    products (numerator, denominator) over lag columns, then one exact
    IEEE division.  Values are fixed-pointed via round(value*100) so both
    sides of the dot product are integers; the final ``ewma`` double is
    num/den — a single exactly-rounded op, deterministic on every engine.

    Plan: all ``lookback``+1 lags share one WindowSpec (partitionBy key,
    orderBy ts,tiebreak) → Catalyst emits a single Window exec after one
    shuffle on the key; the frame is bounded, so state per row is O(K) —
    scale-safe at any key cardinality (no single-partition window).

    Reference analog: tidier's rows-frame mean over ``[-K, 0]``
    (``R/mutate.R:164-176``) with geometric instead of uniform weights.
    """
    if lookback < 1:
        raise ValueError(f"ewma: lookback must be >= 1, got {lookback}")
    w = Window.partitionBy(key_col).orderBy(time_col, tiebreak_col)
    x = F.round(F.col(value_col) * 100).cast("bigint")
    num = F.lit(0).cast("bigint")
    den = F.lit(0).cast("bigint")
    for j in range(lookback + 1):
        lx = F.lag(x, j).over(w)
        wt = F.lit(1 << (lookback - j)).cast("bigint")
        num = num + F.coalesce(lx * wt, F.lit(0).cast("bigint"))
        den = den + F.when(lx.isNotNull(), wt).otherwise(F.lit(0).cast("bigint"))
    # guard den == 0 (every lag in the window NULL-valued): engines
    # disagree on 0/0 (Spark NULL, DuckDB NaN) — return NULL explicitly
    return df.select(
        F.col(key_col),
        F.unix_micros(F.col(time_col)).alias("ts_us"),
        F.col(tiebreak_col),
        num.alias("ewma_num"),
        den.alias("ewma_den"),
        F.when(den > 0, num / den).alias("ewma100"),
    )


def ewma_sql(
    table: str,
    key_col: str,
    time_col: str,
    value_col: str,
    tiebreak_col: str,
    lookback: int = 8,
) -> str:
    """DuckDB mirror of :func:`ewma` — identical lag dot product; the
    num/den division is exactly rounded IEEE on both engines."""
    x = f"CAST(round({value_col} * 100) AS BIGINT)"
    over = (
        f"OVER (PARTITION BY {key_col} ORDER BY {time_col}, {tiebreak_col})"
    )
    nums, dens = [], []
    for j in range(lookback + 1):
        wt = 1 << (lookback - j)
        nums.append(f"coalesce(lag({x}, {j}) {over} * {wt}, 0)")
        dens.append(
            f"CASE WHEN lag({x}, {j}) {over} IS NOT NULL THEN {wt} ELSE 0 END"
        )
    num = " + ".join(nums)
    den = " + ".join(dens)
    return f"""
        SELECT {key_col},
               epoch_us({time_col})::BIGINT AS ts_us,
               {tiebreak_col},
               CAST({num} AS BIGINT) AS ewma_num,
               CAST({den} AS BIGINT) AS ewma_den,
               CASE WHEN CAST({den} AS BIGINT) > 0
                    THEN CAST({num} AS BIGINT) / CAST({den} AS BIGINT)
               END AS ewma100
        FROM {table}"""


def time_weighted_avg(
    df: DataFrame,
    key_col: str,
    time_col: str,
    value_col: str,
    tiebreak_col: str,
    bucket_seconds: int = 86400,
) -> DataFrame:
    """Time-weighted average per (key, bucket) — the hypertable
    ``time_weighted_average`` shape: each sample holds (LOCF) until the
    next sample, the last sample in a bucket extends to the bucket edge,
    and the average weights values by how long they held, not by how
    often they were sampled.  Irregular telemetry averaged per day with
    ``avg()`` over-counts chatty periods; this is the correct estimator.

    Coverage is within-bucket only: the span before a bucket's first
    sample carries no value (cross-bucket LOCF belongs to
    :func:`time_bucket_gapfill`).  Output: ``(key, bucket_us, twa_num,
    twa_den, twa100)`` — exact BIGINT penny·µs dot products and one
    exactly-rounded division, bit-stable on any engine.

    Plan: one lead() window partitioned by key (single shuffle), duration
    clamp is a scalar projection, then one groupBy on (key, bucket) —
    co-partitioned with the window exchange under AQE.  No self-join, no
    per-key collection: scale-safe at any key cardinality.
    """
    if bucket_seconds < 1:
        raise ValueError(
            f"time_weighted_avg: bucket_seconds must be >= 1, got {bucket_seconds}"
        )
    b_us = bucket_seconds * 1_000_000
    w = Window.partitionBy(key_col).orderBy(time_col, tiebreak_col)
    t = F.unix_micros(F.col(time_col))
    # exact integer FLOOR division (see interval_join / _floordiv)
    bucket = F.expr(
        f"({_floordiv(f'unix_micros({time_col})', b_us)}) * {b_us}"
    )
    nxt = F.lead(t).over(w)
    end = bucket + F.lit(b_us)
    dur = (F.least(F.coalesce(nxt, end), end) - t).cast("bigint")
    vc = F.round(F.col(value_col) * 100).cast("bigint")
    return (
        df.select(
            F.col(key_col),
            bucket.alias("bucket_us"),
            (vc * dur).alias("__wv"),
            dur.alias("__d"),
        )
        .groupBy(key_col, "bucket_us")
        .agg(
            F.sum("__wv").alias("twa_num"),
            F.sum("__d").alias("twa_den"),
        )
        .select(
            key_col,
            "bucket_us",
            "twa_num",
            "twa_den",
            (F.col("twa_num") / F.col("twa_den")).alias("twa100"),
        )
    )


def time_weighted_avg_sql(
    table: str,
    key_col: str,
    time_col: str,
    value_col: str,
    tiebreak_col: str,
    bucket_seconds: int = 86400,
) -> str:
    """DuckDB mirror of :func:`time_weighted_avg` (same LOCF-duration
    weighting; sums cast to BIGINT pre-division to dodge HUGEINT drift)."""
    b_us = bucket_seconds * 1_000_000
    return f"""
        WITH base AS (
          SELECT {key_col},
                 ({_floordiv_duck(f'epoch_us({time_col})', b_us)}) * {b_us} AS bucket_us,
                 epoch_us({time_col}) AS t,
                 lead(epoch_us({time_col})) OVER (
                   PARTITION BY {key_col}
                   ORDER BY {time_col}, {tiebreak_col}) AS nxt,
                 CAST(round({value_col} * 100) AS BIGINT) AS vc
          FROM {table}
        ),
        spans AS (
          SELECT {key_col}, bucket_us,
                 vc * (least(coalesce(nxt, bucket_us + {b_us}),
                             bucket_us + {b_us}) - t) AS wv,
                 least(coalesce(nxt, bucket_us + {b_us}),
                       bucket_us + {b_us}) - t AS d
          FROM base
        )
        SELECT {key_col}, bucket_us::BIGINT AS bucket_us,
               CAST(sum(wv) AS BIGINT) AS twa_num,
               CAST(sum(d) AS BIGINT) AS twa_den,
               CAST(sum(wv) AS BIGINT) / CAST(sum(d) AS BIGINT) AS twa100
        FROM spans GROUP BY 1, 2"""


def overlap_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    on: str | list[str] | None = None,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Interval-OVERLAP join: every (left, right) pair whose half-open
    spans intersect (``ls < re AND rs < le``), optionally also matching
    ``on`` keys — the interval×interval sibling of :func:`interval_join`
    (point-in-interval).  Classic uses: concurrent-session detection,
    downtime × deployment windows, ad-flight × campaign overlap.

    Spark plans a raw inequality pair as a nested-loop join; the
    scale-safe lowering buckets BOTH sides onto a fixed grid and
    equi-joins on the bucket.  Overlapping pairs share every bucket that
    both spans cover; to avoid post-join dedup (an extra shuffle of the
    pair set), each pair is kept only in the bucket containing
    ``max(ls, rs)`` — the overlap's first instant, which both spans
    cover by definition.  One equi-join, no distinct, exact semantics.
    Pick ``bucket_seconds`` near typical span length: replication is
    span/bucket rows per side.

    Column names must be disjoint across the frames except the ``on``
    keys.  Timestamps compare in epoch-µs (integer ``div`` bucketing —
    repo determinism rule).
    """
    if bucket_seconds <= 0:
        raise ValueError("bucket_seconds must be positive")
    keys = [on] if isinstance(on, str) else list(on or [])
    b_us = bucket_seconds * 1_000_000

    def covered(s: str, e: str) -> F.Column:
        return F.when(
            F.unix_micros(F.col(e)) > F.unix_micros(F.col(s)),
            F.sequence(
                F.expr(_floordiv(f"unix_micros({s})", b_us)),
                F.expr(_floordiv(f"unix_micros({e}) - 1", b_us)),
            ),
        ).otherwise(F.array().cast("array<bigint>"))

    lbk = left.withColumn("__lb", F.explode(covered(left_start, left_end)))
    rbk = right.withColumn("__rb", F.explode(covered(right_start, right_end)))
    ren = {k: f"__r_{k}" for k in keys}
    for k, rk in ren.items():
        rbk = rbk.withColumnRenamed(k, rk)

    ls, le = F.unix_micros(F.col(left_start)), F.unix_micros(F.col(left_end))
    rs, re_ = F.unix_micros(F.col(right_start)), F.unix_micros(F.col(right_end))
    cond = F.col("__lb") == F.col("__rb")
    for k, rk in ren.items():
        cond = cond & (F.col(k) == F.col(rk))
    cond = cond & (ls < re_) & (rs < le)
    # keep each pair only in the overlap-start bucket (no dedup shuffle);
    # pure integer comparison — float divide-and-floor is boundary-
    # hazardous at epoch-µs magnitudes (repo determinism rule)
    ov = F.greatest(ls, rs)
    cond = (
        cond
        & (ov >= F.col("__lb") * F.lit(b_us))
        & (ov < (F.col("__lb") + 1) * F.lit(b_us))
    )
    return lbk.join(rbk, cond, "inner").drop("__lb", "__rb", *ren.values())


def funnel_windowed(
    df: DataFrame,
    key_col: str,
    time_col: str,
    step_col: str,
    steps: list[str],
    within_us: int,
) -> DataFrame:
    """Conversion funnel with a TIME CONSTRAINT: step i+1 must follow the
    key's step-i time by at most ``within_us`` microseconds ("converted
    within an hour") — the variant product analytics actually reports.
    Same sequential-min chain as :func:`funnel` (one filtered min-agg
    per step, k−1 equi-joins all on the key, co-partitioned), with the
    window upper bound added to each step's qualification predicate.
    Earliest-qualifying semantics: each step time is the MIN event time
    that both follows and is within window of the previous step time.
    """
    if not steps:
        raise ValueError("funnel_windowed: steps must be non-empty")
    if within_us < 0:
        raise ValueError(f"funnel_windowed: within_us must be >= 0, got {within_us}")
    t = F.unix_micros(F.col(time_col))
    stage = (
        df.where(F.col(step_col) == steps[0])
        .groupBy(key_col)
        .agg(F.min(t).alias("t1"))
    )
    out = stage
    for i, step in enumerate(steps[1:], start=2):
        if len(steps) > 2:
            # Same 2^(k-1) subtree blowup as `funnel`: `out` feeds both the
            # next step's join and the final output and the copies do not
            # canonicalize to a ReusedExchange.  Share the small per-key
            # cumulative frame via a lazy persist (guide §3.3; measured
            # 0.69 lazy / 0.85 eager-checkpoint / 0.42 s persist at sf0.1).
            out = out.persist()
        nxt = (
            df.where(F.col(step_col) == step)
            .select(F.col(key_col), t.alias("__t"))
            .join(out.select(key_col, F.col(f"t{i-1}").alias("__prev")), key_col)
            .where(
                (F.col("__t") > F.col("__prev"))
                & (F.col("__t") <= F.col("__prev") + F.lit(within_us))
            )
            .groupBy(key_col)
            .agg(F.min("__t").alias(f"t{i}"))
        )
        out = out.join(nxt, key_col, "left")
    stage_expr = F.lit(1)
    for i in range(2, len(steps) + 1):
        stage_expr = F.when(F.col(f"t{i}").isNotNull(), F.lit(i)).otherwise(
            stage_expr
        )
    return out.withColumn("stage", stage_expr.cast("long"))


def funnel_windowed_sql(
    table: str,
    key_col: str,
    time_col: str,
    step_col: str,
    steps: list[str],
    within_us: int,
) -> str:
    """DuckDB mirror of :func:`funnel_windowed`."""
    t = f"epoch_us({time_col})"
    ctes = [
        f"s1 AS (SELECT {key_col}, min({t}) AS t1 FROM {table}"
        f" WHERE {step_col} = '{_sq(steps[0])}' GROUP BY 1)"
    ]
    for i, step in enumerate(steps[1:], start=2):
        ctes.append(
            f"s{i} AS (SELECT e.{key_col}, min(epoch_us(e.{time_col})) AS t{i}"
            f" FROM {table} e JOIN s{i-1} p ON e.{key_col} = p.{key_col}"
            f" WHERE e.{step_col} = '{_sq(step)}'"
            f" AND epoch_us(e.{time_col}) > p.t{i-1}"
            f" AND epoch_us(e.{time_col}) <= p.t{i-1} + {within_us}"
            f" GROUP BY 1)"
        )
    tcols = ", ".join(f"s{i}.t{i}" for i in range(1, len(steps) + 1))
    joins = " ".join(
        f"LEFT JOIN s{i} ON s1.{key_col} = s{i}.{key_col}"
        for i in range(2, len(steps) + 1)
    )
    stage = "CASE "
    for i in range(len(steps), 1, -1):
        stage += f"WHEN s{i}.t{i} IS NOT NULL THEN {i} "
    stage += "ELSE 1 END"
    return f"""
        WITH {', '.join(ctes)}
        SELECT s1.{key_col}, {tcols}, ({stage})::BIGINT AS stage
        FROM s1 {joins}"""


def linear_attribution(
    touches: DataFrame,
    conversions: DataFrame,
    key_col: str,
    touch_time: str,
    conv_time: str,
    touch_id: str,
    conv_id: str,
    value_col: str,
    lookback_us: int,
) -> DataFrame:
    """Linear multi-touch attribution: each conversion's penny value
    splits EQUALLY across that key's touches in the lookback window
    ``(conv_t − lookback, conv_t]``; per touch, credit sums over the
    conversions it influenced.  The marketing-analytics workhorse
    between last-touch (an as-of join — :func:`asof_join`) and
    data-driven models.

    Exactness without fractional drift: a float ``Σ cents_i/n_i`` would
    depend on distributed aggregation order (re-association), so each
    pair's credit is snapped to BIGINT fixed point FIRST —
    ``credit_fp = (cents · 10⁶) div n_touches`` (exact
    truncate-toward-zero integer division — Spark ``div`` and DuckDB
    ``//`` both truncate, so negative conversion values (refunds)
    round toward zero identically on both engines; see
    :func:`_floordiv` for the floor-vs-truncate distinction) — and
    per-touch credit is a sum of BIGINTs,
    order-independent by construction.  Divide by 10⁶ downstream for a
    display value.

    Plan: touch↔conversion matching is an EQUI-join on the key with the
    lookback predicate applied post-join — shuffle-partitionable, pair
    fan-out bounded by per-key touch×conversion counts (the key is the
    partitioner; for keyless or hot-key attribution, route through the
    :func:`interval_join` bucketing idiom instead).  The per-conversion
    touch count is one window over the pair frame partitioned by the
    conversion id; credit aggregation is one groupBy on the touch id.
    """
    from pyspark.sql import Window

    # internal aliases: touch and conversion id columns may share a name
    # (e.g. both event_id when filtered from one event table)
    iv = conversions.select(
        F.col(key_col),
        F.col(conv_id).alias("__conv"),
        F.unix_micros(F.col(conv_time)).alias("__ct"),
        F.round(F.col(value_col) * 100).cast("bigint").alias("__cents"),
    )
    tc = touches.select(
        F.col(key_col),
        F.col(touch_id).alias("__touch"),
        F.unix_micros(F.col(touch_time)).alias("__tt"),
    )
    pairs = tc.join(iv, key_col).where(
        (F.col("__tt") > F.col("__ct") - F.lit(lookback_us))
        & (F.col("__tt") <= F.col("__ct"))
    )
    w = Window.partitionBy("__conv")
    pairs = pairs.withColumn("__n", F.count(F.lit(1)).over(w))
    credit_fp = F.expr("(__cents * 1000000) div __n")
    return pairs.groupBy(F.col("__touch").alias(touch_id)).agg(
        F.sum("__cents").alias("touched_cents"),
        F.count(F.lit(1)).alias("n_convs"),
        F.sum(credit_fp).alias("credit_fp"),
    )


def linear_attribution_sql(
    table: str,
    key_col: str,
    touch_filter: str,
    conv_filter: str,
    time_col: str,
    id_col: str,
    value_col: str,
    lookback_us: int,
) -> str:
    """DuckDB mirror of the events-table :func:`linear_attribution`
    entry shape (touches and conversions filtered from one table)."""
    return f"""
        WITH tc AS (
          SELECT {key_col}, {id_col} AS touch_id, epoch_us({time_col}) AS tt
          FROM {table} WHERE {touch_filter}
        ),
        iv AS (
          SELECT {key_col}, {id_col} AS conv_id, epoch_us({time_col}) AS ct,
                 CAST(round({value_col} * 100) AS BIGINT) AS cents
          FROM {table} WHERE {conv_filter}
        ),
        pairs AS (
          SELECT tc.touch_id, iv.conv_id, iv.cents,
                 count(*) OVER (PARTITION BY iv.conv_id) AS n
          FROM tc JOIN iv ON tc.{key_col} = iv.{key_col}
                         AND tc.tt > iv.ct - {lookback_us}
                         AND tc.tt <= iv.ct
        )
        SELECT touch_id,
               CAST(sum(cents) AS BIGINT) AS touched_cents,
               count(*)::BIGINT AS n_convs,
               CAST(sum((cents * 1000000) // n) AS BIGINT) AS credit_fp
        FROM pairs GROUP BY 1"""


def interval_merge(
    df: DataFrame,
    start_col: str,
    end_col: str,
    *,
    by: str | list[str] | None = None,
    gap_seconds: int = 0,
) -> DataFrame:
    """Merge overlapping (or within ``gap_seconds``) intervals per key —
    the classic "union of time ranges" operator (uptime stitching,
    on-call coverage, contiguous-booking collapse) that plain SQL GROUP
    BY cannot express.

    Lowering (one shuffle on the keys, one per-key sort — the sessionize
    cost shape, SURVEY §2.3 temporal row): order intervals by
    ``(start, end)`` in epoch-µs; an interval starts a NEW merged group
    iff its start exceeds the running ``max(end)`` of all earlier
    intervals plus the gap (a rows-frame cumulative max — incremental,
    never re-scans the frame); group ids are the running sum of those
    flags; a final hash aggregate emits one row per merged interval:
    ``(*keys, merge_start_us, merge_end_us, n_intervals)``.

    Determinism: ties on ``(start, end)`` are order-insensitive — a row
    sharing a start with an earlier row can never open a new group
    (the earlier row's end ≥ its own start, intervals being valid), so
    no tiebreak column is needed.  Zero-length intervals merge into
    whatever covers their instant.  At 100 TB the shuffle is on the key
    columns; a single key with billions of intervals serializes that
    key's sort — same documented bound as :func:`sessionize`.
    """
    if gap_seconds < 0:
        raise ValueError("gap_seconds must be >= 0")
    keys = [by] if isinstance(by, str) else list(by or [])
    s = F.unix_micros(F.col(start_col))
    e = F.unix_micros(F.col(end_col))
    w = Window.partitionBy(*keys).orderBy(s.asc(), e.asc())
    prev_max_end = F.max(e).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    gap_us = int(gap_seconds) * 1_000_000
    # first row per key: lag-max NULL → comparison NULL → otherwise 0
    new_flag = F.when(s > prev_max_end + F.lit(gap_us), 1).otherwise(0)
    grp = F.sum(new_flag).over(w.rowsBetween(Window.unboundedPreceding, 0))
    return (
        df.withColumn("__s_us", s)
        .withColumn("__e_us", e)
        .withColumn("__grp", grp)
        .groupBy(*keys, F.col("__grp"))
        .agg(
            F.min("__s_us").alias("merge_start_us"),
            F.max("__e_us").alias("merge_end_us"),
            F.count(F.lit(1)).alias("n_intervals"),
        )
        .drop("__grp")
    )


def interval_merge_sql(
    table: str,
    start_expr: str,
    end_expr: str,
    *,
    by: str | list[str] | None = None,
    gap_seconds: int = 0,
) -> str:
    """DuckDB mirror of :func:`interval_merge` — the same cumulative-max
    flag/running-sum lowering in portable window SQL (``start_expr`` /
    ``end_expr`` are epoch-µs SQL expressions)."""
    keys = [by] if isinstance(by, str) else list(by or [])
    part = f"PARTITION BY {', '.join(keys)} " if keys else ""
    ksel = "".join(f"{k}, " for k in keys)
    gap_us = int(gap_seconds) * 1_000_000
    return f"""
        WITH iv AS (
          SELECT {ksel}{start_expr} AS s_us, {end_expr} AS e_us
          FROM {table}
        ),
        flagged AS (
          SELECT *,
                 CASE WHEN s_us > max(e_us) OVER (
                        {part}ORDER BY s_us, e_us
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                      ) + {gap_us} THEN 1 ELSE 0 END AS new_flag
          FROM iv
        ),
        grouped AS (
          SELECT *, sum(new_flag) OVER (
                   {part}ORDER BY s_us, e_us
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS grp
          FROM flagged
        )
        SELECT {ksel}
               CAST(min(s_us) AS BIGINT) AS merge_start_us,
               CAST(max(e_us) AS BIGINT) AS merge_end_us,
               count(*)::BIGINT AS n_intervals
        FROM grouped GROUP BY {ksel}grp"""


def rolling_distinct(
    df: DataFrame,
    value_col: str,
    *,
    by: str,
    order_by: list[str],
    frame_rows: int,
    cum_col: str = "dcum",
    rolling_col: str = "droll",
) -> DataFrame:
    """Per-row DISTINCT counts over windows — the aggregate Spark's
    window functions refuse (``count(DISTINCT ...) OVER`` raises), with
    a different lowering per frame shape:

    * ``rolling_col`` — distinct values in the trailing ``frame_rows``
      rows (inclusive): ``size(collect_set(v) OVER rows-frame)``.  The
      set materializes per row, so memory is O(frame distinct) —
      bounded frames only by design.
    * ``cum_col`` — distinct values seen so far (running distinct):
      lowered WITHOUT any per-row set as a first-occurrence flag
      (``row_number() = 1`` over ``(key, value)``) plus a running sum —
      two incremental window passes sharing one shuffle, O(1) state per
      row, safe for unbounded history at 100 TB where the collect_set
      lowering would hold every historical value per row.

    NULL values count in neither (collect_set and SQL COUNT(DISTINCT)
    both drop NULLs; the first-occurrence flag mirrors that).
    ``order_by`` must be a total order (pass a unique id last) — a
    rows frame over ties is partition-order-dependent on BOTH engines.
    """
    order = [F.col(c) for c in order_by]
    w = Window.partitionBy(by).orderBy(*order)
    roll = F.size(
        F.collect_set(F.col(value_col)).over(
            w.rowsBetween(-(frame_rows - 1), 0)
        )
    ).cast("long")
    first_seen = Window.partitionBy(by, value_col).orderBy(*order)
    flag = F.when(
        F.col(value_col).isNotNull()
        & (F.row_number().over(first_seen) == 1),
        1,
    ).otherwise(0)
    cum = F.sum(flag).over(w.rowsBetween(Window.unboundedPreceding, 0))
    return df.withColumn(rolling_col, roll).withColumn(
        cum_col, cum.cast("long")
    )


def rolling_distinct_sql(
    table: str,
    value_col: str,
    *,
    by: str,
    order_by: list[str],
    frame_rows: int,
    select: str = "*",
) -> str:
    """DuckDB mirror of :func:`rolling_distinct` using the engine's
    native ``count(DISTINCT ...) OVER`` (Spark lacks it) — a genuine
    cross-implementation differential, not a lowering echo."""
    ob = ", ".join(order_by)
    return f"""
        SELECT {select},
               count(DISTINCT {value_col}) OVER (
                 PARTITION BY {by} ORDER BY {ob}
                 ROWS BETWEEN {frame_rows - 1} PRECEDING AND CURRENT ROW
               )::BIGINT AS droll,
               count(DISTINCT {value_col}) OVER (
                 PARTITION BY {by} ORDER BY {ob}
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               )::BIGINT AS dcum
        FROM {table}"""
