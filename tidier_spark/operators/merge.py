"""Upsert / merge-into and snapshot-diff operators.

The batch analogs of a warehouse MERGE: the reference engine has none
(SURVEY.md §2.3 — no joins at all), but every pipeline that maintains a
curated corpus needs "apply this batch of updates to the snapshot" and
"what changed between snapshots".  Both are expressed as pure DataFrame
ops so Catalyst owns the physical strategy.

Scale notes (100 TB): :func:`upsert` is union + one per-key window — a
single shuffle on the key, the same cost as the dedup-survivor pattern,
and strictly cheaper than the full-outer-join formulation (no join, no
null-branch explosion).  On real lakehouse tables you'd push this into a
storage-level MERGE (Delta/Iceberg) to get file skipping; the logical
semantics are identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "upsert",
    "snapshot_diff",
    "update_rollup",
    "scd2",
    "scd2_sql",
    "scd2_merge",
]


def upsert(
    target: DataFrame,
    updates: DataFrame,
    keys: str | list[str],
    delete_col: str | None = None,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Latest-wins merge: rows from ``updates`` replace same-key rows in
    ``target``; new keys are inserted.  If ``delete_col`` names a boolean
    column in ``updates``, true-rows delete the key instead (the full
    MERGE INTO triad: update / insert / delete).

    ``order_cols`` makes the merge ORDER-aware: the per-key winner is the
    row with the greatest ``order_cols`` tuple across BOTH sides, with
    the update side winning exact ties.  Without it, the update side
    always wins — correct only when every update is known newer than the
    snapshot (single-writer batch flow); a multi-batch/CDC caller MUST
    pass order_cols, else a late batch carrying an older row would
    overwrite a newer snapshot row.

    Plan: tag sides, unionByName, keep rank-1 per key — one shuffle,
    no join.
    """
    ks = [keys] if isinstance(keys, str) else list(keys)
    t = target.withColumn("__prio", F.lit(1))
    u = updates.withColumn("__prio", F.lit(0))
    if delete_col is None:
        u = u.withColumn("__del", F.lit(False))
        t = t.withColumn("__del", F.lit(False))
    else:
        u = u.withColumn("__del", F.coalesce(F.col(delete_col), F.lit(False))).drop(
            delete_col
        )
        t = t.withColumn("__del", F.lit(False))
    allr = t.unionByName(u)
    order = [F.col(c).desc() for c in (order_cols or [])] + [F.col("__prio").asc()]
    w = Window.partitionBy(*ks).orderBy(*order)
    return (
        allr.withColumn("__rn", F.row_number().over(w))
        .where((F.col("__rn") == 1) & (~F.col("__del")))
        .drop("__prio", "__rn", "__del")
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: str | list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Row-level diff between two snapshots of the same table: one row per
    changed key with ``change ∈ {'insert', 'delete', 'update'}``.

    Plan: full outer join on the key (sort-merge; both sides shuffle once
    on the same key — co-partitioned), change class from a presence flag
    per side plus an OR of per-column null-safe inequalities over
    ``compare_cols``.  Column-wise (not one struct inequality) so
    Spark's implicit binary-comparison coercion applies per column:
    real snapshot pairs arrive with drifted-but-compatible types — e.g.
    a DECIMAL(15,2) column whose new snapshot went through a ``+ 1.0``
    double promotion — and a struct comparison rejects that with
    BINARY_OP_DIFF_TYPES where the column comparison coerces both sides
    to the common type (decvals axis, r9).  Null-safe (``<=>``) keeps
    the NULL-transition semantics: value↔NULL is an update, NULL↔NULL
    is unchanged (pinned against a DuckDB IS DISTINCT FROM
    differential).  Genuinely incompatible column types still raise at
    analysis, loudly and named.
    """
    ks = [keys] if isinstance(keys, str) else list(keys)
    cols = compare_cols or [c for c in new.columns if c not in ks]
    o = old.select(
        *ks,
        F.lit(True).alias("__in_o"),
        *[F.col(c).alias(f"__o_{i}") for i, c in enumerate(cols)],
    )
    n = new.select(
        *ks,
        F.lit(True).alias("__in_n"),
        *[F.col(c).alias(f"__n_{i}") for i, c in enumerate(cols)],
    )
    j = o.join(n, ks, "full_outer")
    changed = F.lit(False)
    for i in range(len(cols)):
        changed = changed | ~(
            F.col(f"__o_{i}").eqNullSafe(F.col(f"__n_{i}"))
        )
    change = (
        F.when(F.col("__in_o").isNull(), F.lit("insert"))
        .when(F.col("__in_n").isNull(), F.lit("delete"))
        .when(changed, F.lit("update"))
    )
    return (
        j.withColumn("change", change)
        .where(F.col("change").isNotNull())
        .select(*ks, "change")
    )


def update_rollup(
    snapshot: DataFrame | None,
    batch: DataFrame,
    keys: str | list[str],
    measures: dict[str, tuple[str, str]],
) -> DataFrame:
    """Incremental aggregate maintenance: fold a new batch of rows into an
    existing per-key aggregate SNAPSHOT without re-reading history — the
    materialized-view-delta pattern every long-lived rollup table needs
    (at 100 TB you never recompute a lifetime aggregate because a day of
    data arrived).

    ``measures`` maps output column → ``(fn, src_col)`` with fn ∈
    {'sum', 'count', 'min', 'max'} — the self-mergeable aggregates: the
    batch reduces to one partial row per key (map-side combine + one
    shuffle on the key), then partials union with the snapshot and
    combine with the SAME fold (sum for sum/count, min for min, max for
    max).  Non-mergeable aggregates (avg, stddev) must be DERIVED from
    mergeable ones (avg = sum/count) — store the parts, not the ratio.
    ``snapshot=None`` bootstraps the table.  Incremental result ==
    full recompute, bit for bit (integer/decimal measures; double sums
    re-associate like any distributed sum).
    """
    _COMBINE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    _FIRST = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    bad = {fn for fn, _ in measures.values()} - set(_COMBINE)
    if bad:
        raise ValueError(f"non-mergeable aggregate(s) {sorted(bad)!r}")
    ks = [keys] if isinstance(keys, str) else list(keys)
    partial = batch.groupBy(*ks).agg(
        *[_FIRST[fn](src).alias(out) for out, (fn, src) in measures.items()]
    )
    if snapshot is None:
        return partial
    merged = snapshot.select(*ks, *measures).unionByName(
        partial.select(*ks, *measures)
    )
    return merged.groupBy(*ks).agg(
        *[_COMBINE[fn](out).alias(out) for out, (fn, _) in measures.items()]
    )


def scd2(
    df: DataFrame,
    key_col: str,
    time_col: str,
    attr_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Build a Type-2 slowly-changing-dimension history from a change log.

    Classic warehouse op: given per-key attribute observations over time,
    collapse consecutive runs of the same value and emit one validity
    interval per run — ``(key, attr, valid_from_us, valid_to_us,
    is_current, n_obs)``.  ``valid_to_us`` is the next run's start (NULL
    while current) — half-open intervals, the Kimball convention.

    Gaps-and-islands: lag() flags value changes, a running sum over the
    flags numbers the runs, one groupBy collapses each run, and a second
    lead() over the (key, run) frame chains the intervals.  Every stage
    partitions on the key — the window shuffle and the groupBy reuse one
    exchange under AQE, and the post-agg lead() window runs over ≤ runs
    rows per key.  No self-join, no driver state: scale-safe at any key
    cardinality.  (The storage-level analog is a MERGE with
    ``is_current`` flipping; this is the logical semantics.)
    """
    return _scd2_runs(df, key_col, time_col, attr_col, tiebreak_col).drop(
        "__run", "last_seen_us"
    )


def _scd2_runs(
    df: DataFrame,
    key_col: str,
    time_col: str,
    attr_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """:func:`scd2` plus the per-key run index ``__run`` (1-based) —
    :func:`scd2_merge` needs it to identify the batch's FIRST run
    unambiguously (valid_from alone ties when two runs start on the
    same timestamp separated only by the tiebreak)."""
    w = Window.partitionBy(key_col).orderBy(time_col, tiebreak_col)
    # the FIRST row must always open run 1: detect it via the lag of the
    # (non-null) tiebreak — a NULL lag of attr alone is ambiguous when
    # NULL is itself a legal attr value (eqNullSafe(NULL, NULL) is true,
    # which would start a NULL-leading key at run 0)
    changed = (
        F.lag(tiebreak_col).over(w).isNull()
        | ~F.col(attr_col).eqNullSafe(F.lag(attr_col).over(w))
    ).cast("bigint")
    runs = (
        df.withColumn("__chg", changed)
        .withColumn(
            "__run",
            F.sum("__chg").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .groupBy(key_col, "__run")
        .agg(
            F.first(attr_col).alias(attr_col),
            F.min(F.unix_micros(F.col(time_col))).alias("valid_from_us"),
            # the run's true frontier: scd2_merge's in-order guard needs
            # the last OBSERVED time of the open run, which valid_to_us
            # (NULL while current) cannot provide (late edge axis, r10)
            F.max(F.unix_micros(F.col(time_col))).alias("last_seen_us"),
            F.count(F.lit(1)).alias("n_obs"),
        )
    )
    w2 = Window.partitionBy(key_col).orderBy("__run")
    return runs.select(
        F.col(key_col),
        F.col(attr_col),
        F.col("valid_from_us"),
        F.lead("valid_from_us").over(w2).alias("valid_to_us"),
        F.lead("valid_from_us").over(w2).isNull().alias("is_current"),
        F.col("n_obs"),
        F.col("last_seen_us"),
        F.col("__run"),
    )


def scd2_sql(
    table: str,
    key_col: str,
    time_col: str,
    attr_col: str,
    tiebreak_col: str,
) -> str:
    """DuckDB mirror of :func:`scd2` (same gaps-and-islands chain; the
    run-sum is cast to BIGINT pre-join to dodge HUGEINT→float64 drift)."""
    return f"""
        WITH marked AS (
          SELECT *,
                 CASE WHEN {attr_col} IS DISTINCT FROM
                      lag({attr_col}) OVER (PARTITION BY {key_col}
                                            ORDER BY {time_col}, {tiebreak_col})
                      THEN 1 ELSE 0 END AS chg
          FROM {table}
        ),
        runs AS (
          SELECT *,
                 CAST(sum(chg) OVER (PARTITION BY {key_col}
                       ORDER BY {time_col}, {tiebreak_col}
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS BIGINT) AS run
          FROM marked
        ),
        collapsed AS (
          SELECT {key_col}, run,
                 min({attr_col}) AS {attr_col},
                 min(epoch_us({time_col}))::BIGINT AS valid_from_us,
                 count(*)::BIGINT AS n_obs
          FROM runs GROUP BY 1, 2
        )
        SELECT {key_col}, {attr_col}, valid_from_us,
               lead(valid_from_us) OVER (PARTITION BY {key_col} ORDER BY run)
                 AS valid_to_us,
               lead(valid_from_us) OVER (PARTITION BY {key_col} ORDER BY run)
                 IS NULL AS is_current,
               n_obs
        FROM collapsed"""


def scd2_merge(
    snapshot: DataFrame | None,
    batch: DataFrame,
    key_col: str,
    time_col: str,
    attr_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Incrementally fold a NEW batch of ordered observations into an
    existing :func:`scd2` history — the streaming/warehouse maintenance
    form: never re-reads history, touches only the open (is_current) run
    of keys present in the batch, and provably equals the full
    :func:`scd2` recompute (property-tested over random splits).

    In-order contract: batch observations follow the snapshot's last
    time per key (append-only CDC).  Per touched key: the batch's runs
    are collapsed batch-locally by :func:`scd2`; if the first batch run
    continues the snapshot's open run (same attr), the open run absorbs
    it (n_obs adds, valid_from keeps, valid_to/is_current advance);
    otherwise the open run closes at the first batch run's start.
    Untouched keys and already-closed runs pass through unchanged.

    Plan: one scd2 over the BATCH (small), one broadcast-sized first-run
    frame, equi-joins on the key — the snapshot is never window-scanned,
    only its is_current slice joins.  Cost per batch is O(batch) plus
    one pass over the snapshot for the pass-through union (at 100 TB the
    storage MERGE pushes that into file-level upserts; the logical
    semantics are these).

    Schema compatibility (advice r10): the output gained
    ``last_seen_us`` in r10 (the run frontier backing the append-only
    contract check).  Fixed-schema sinks written before r10 need a
    one-time widening; only the snapshot INPUT side is
    backward-compatible (the legacy fallback below derives a sound
    lower-bound frontier).  Streaming consumers restarting from a
    pre-r10 checkpoint must start a fresh checkpoint — see
    ``streaming/sliding.py:_frontier_guard`` for the same contract on
    the guarded stateful operators.
    """
    cols = [
        key_col, attr_col, "valid_from_us", "valid_to_us", "is_current",
        "n_obs", "last_seen_us",
    ]
    bruns_r = _scd2_runs(batch, key_col, time_col, attr_col, tiebreak_col)
    if snapshot is None:
        return bruns_r.select(*cols)
    if "last_seen_us" not in snapshot.columns:
        # legacy / public-scd2 snapshot without the run frontier: a sound
        # LOWER BOUND is the run start (open runs; the in-order guard
        # then catches batches behind the run start, not mid-run) or the
        # interval end (closed runs, unchecked anyway)
        snapshot = snapshot.withColumn(
            "last_seen_us",
            F.coalesce(F.col("valid_to_us"), F.col("valid_from_us")),
        )
    snapshot = snapshot.select(*cols)
    # the batch's first run per key is __run == 1 — unambiguous even when
    # two runs start on the same timestamp (tiebreak-separated)
    r1 = bruns_r.where(F.col("__run") == 1).select(
        F.col(key_col),
        F.col(attr_col).alias("__f_attr"),
        F.col("valid_from_us").alias("__f_from"),
        F.col("valid_to_us").alias("__f_to"),
        F.col("is_current").alias("__f_cur"),
        F.col("n_obs").alias("__f_n"),
        F.col("last_seen_us").alias("__f_last"),
        F.lit(True).alias("__touched"),
    )
    snap_cur = snapshot.where(F.col("is_current")).join(r1, key_col, "left")
    # LOUD in-order guard (late edge axis, r10): a batch whose first
    # observation for a key is BEHIND the key's open run's LAST SEEN
    # time (last_seen_us — the run frontier added for exactly this;
    # valid_to_us is NULL while current) violates the append-only CDC
    # contract — silently folding it produced history rows with
    # valid_to BEFORE valid_from.  The CASE gate keeps assert_true
    # un-prunable (it feeds the filter) and the guard costs nothing on
    # in-order batches.
    snap_cur = snap_cur.where(
        F.expr(
            "CASE WHEN __touched IS NOT NULL AND __f_from < last_seen_us "
            "THEN assert_true(false, 'scd2_merge: batch observation at ' "
            "|| CAST(__f_from AS STRING) || ' us is BEHIND the key "
            "open-run last seen time (' || CAST(last_seen_us AS STRING) "
            "|| ' us) - late data violates the append-only CDC contract; "
            "filter late rows upstream or recompute history with the "
            "batch scd2') IS NULL ELSE true END"
        )
    )
    # untouched current rows pass through (explicit marker — a NULL
    # batch attr is a legal value, never an absence signal); touched
    # ones absorb (null-safe same attr) or close (null-safe different)
    kept_cur = snap_cur.where(F.col("__touched").isNull()).select(*cols)
    absorb = snap_cur.where(
        F.col("__touched").isNotNull()
        & F.col(attr_col).eqNullSafe(F.col("__f_attr"))
    ).select(
        F.col(key_col),
        F.col(attr_col),
        F.col("valid_from_us"),
        F.col("__f_to").alias("valid_to_us"),
        F.col("__f_cur").alias("is_current"),
        (F.col("n_obs") + F.col("__f_n")).alias("n_obs"),
        F.greatest(F.col("last_seen_us"), F.col("__f_last")).alias(
            "last_seen_us"
        ),
    )
    closed = snap_cur.where(
        F.col("__touched").isNotNull()
        & ~F.col(attr_col).eqNullSafe(F.col("__f_attr"))
    ).select(
        F.col(key_col),
        F.col(attr_col),
        F.col("valid_from_us"),
        F.col("__f_from").alias("valid_to_us"),
        F.lit(False).alias("is_current"),
        F.col("n_obs"),
        F.col("last_seen_us"),
    )
    # batch runs to append: drop the first run for absorbed keys
    absorbed_keys = absorb.select(key_col)
    b_first_kept = (
        bruns_r.where(F.col("__run") == 1)
        .join(absorbed_keys, key_col, "left_anti")
        .select(*cols)
    )
    b_rest = bruns_r.where(F.col("__run") != 1).select(*cols)
    closed_hist = snapshot.where(~F.col("is_current")).select(*cols)
    return (
        closed_hist.unionByName(kept_cur)
        .unionByName(absorb.select(*cols))
        .unionByName(closed.select(*cols))
        .unionByName(b_first_kept)
        .unionByName(b_rest)
    )
