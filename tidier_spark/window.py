"""Compile (by, order_by, frame, index, desc) into Spark window machinery.

This is the engine core (SURVEY.md §7.1): the reference's lazy backend
(`/root/reference/R/mutate.R:293-351`) proves tidier's semantics are exactly
SQL window semantics — `OVER (PARTITION BY .by ORDER BY .order_by ROWS/RANGE
BETWEEN ...)` — so the compiler's job is to build the right
:class:`pyspark.sql.WindowSpec` (Tier A) or SQL OVER-clause string (Tier B,
calendar-interval frames) and let Catalyst pick the physical plan.

Scale notes (100 TB): a window with ``partitionBy`` hash-shuffles once on the
group keys and sorts within partitions — the same cost profile as the
reference's nest+`future_map` (`R/mutate.R:278-282`) but distributed by the
engine. A window *without* ``partitionBy`` funnels all rows through a single
partition (Spark warns `WindowExec: No Partition Defined`); the API allows it
for parity with ungrouped tidier calls but callers at scale should always
pass ``by``.
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .frames import FrameSpec

__all__ = [
    "WindowPlan",
    "compile_window",
    "quote_ident",
    "scale_safe_cumulative",
    "scale_safe_frame",
    "subtractive_calls",
    "subtractive_over",
]


def quote_ident(name: str) -> str:
    """Backtick-quote an identifier for SQL fragments."""
    return "`" + name.replace("`", "``") + "`"


def _as_col(c: object) -> Column:
    return F.col(c) if isinstance(c, str) else c  # type: ignore[arg-type]


@dataclass
class WindowPlan:
    """A compiled window: either a native WindowSpec or a SQL OVER clause.

    ``spec``      — Tier A: pass to ``Column.over``.
    ``sql_over``  — Tier B: f-string OVER clause body; the caller builds
                    ``F.expr(f"{agg_sql} OVER ({sql_over})")``.
    ``order_cols``— the effective ordering (for count-guards etc.).
    """

    spec: WindowSpec | None = None
    sql_over: str | None = None
    partition_cols: list[Column] = field(default_factory=list)
    order_cols: list[Column] = field(default_factory=list)
    frame: FrameSpec | None = None
    row_frame: bool = False  # True when frame is ROWS (not RANGE)
    # Tier B bookkeeping (calendar frames): SQL fragments for rebuilding
    # auxiliary windows (e.g. the partition-extent guard of complete=True)
    sql_part: str = ""  # "PARTITION BY ..." or ""
    index_name: str | None = None

    @property
    def is_sql(self) -> bool:
        return self.sql_over is not None

    def over(self, agg: Column | str) -> Column:
        """Apply an aggregate to this window. ``agg`` must be a SQL string
        for Tier B windows."""
        if self.is_sql:
            if not isinstance(agg, str):
                raise TypeError(
                    "calendar-interval frames need string expressions "
                    "(they lower to SQL, SURVEY.md §7.1 Tier B)"
                )
            return F.expr(f"{agg} OVER ({self.sql_over})")
        col = F.expr(agg) if isinstance(agg, str) else agg
        assert self.spec is not None
        return col.over(self.spec)

    def count_guard(self) -> Column:
        """``count(*)`` over the same window — used for ``complete=True``."""
        return self.over("count(*)") if self.is_sql else F.count(F.lit(1)).over(self.spec)


def _index_order_key(df: DataFrame, index: str) -> tuple[Column, str, str]:
    """Return (order key column, unit, sql_order_expr) for a range index.

    TimestampType → epoch seconds; DateType → epoch days; numeric → native.
    Epoch math is timezone-independent (same underlying instant both in
    Spark and in the DuckDB oracle), unlike date_trunc-style bucketing.
    """
    dtype = df.schema[index].dataType
    q = quote_ident(index)
    if isinstance(dtype, T.TimestampType | T.TimestampNTZType):
        # Epoch MICROseconds, not seconds — truncating to seconds would move
        # rows across frame boundaries relative to the full-precision
        # timestamps a SQL engine compares (4/1000 rows at sf0.001).
        return (
            F.unix_micros(F.col(index)),
            "micros",
            f"unix_micros({q})",
        )
    if isinstance(dtype, T.DateType):
        return (
            F.datediff(F.col(index), F.lit("1970-01-01").cast("date")),
            "days",
            f"DATEDIFF({q}, DATE '1970-01-01')",
        )
    if isinstance(dtype, T.NumericType):
        return F.col(index), "native", q
    raise ValueError(
        f"index column {index!r} must be date, timestamp, or numeric; "
        f"got {dtype.simpleString()}"
    )


def compile_window(
    df: DataFrame,
    *,
    by: list[object] | None = None,
    order_by: list[object] | None = None,
    frame: FrameSpec | None = None,
    index: str | None = None,
    desc: bool | list[bool] = False,
) -> WindowPlan:
    """Build the WindowPlan for one (by, order_by, frame, index, desc) combo.

    Dispatch mirrors the reference's operator matrix (SURVEY.md §2.1):
    O3 (by, no frame) → partition-only window; O4 (rows frame) →
    ``rowsBetween``; O5/O7 (index frame) → ``rangeBetween`` on the
    epoch-cast index; calendar Periods → Tier B SQL ``RANGE BETWEEN
    INTERVAL``.
    """
    by = list(by or [])
    order_by = list(order_by or [])

    # --- ordering with per-key desc (R/mutate.R:148-150, recycled :177-179) ---
    if isinstance(desc, bool):
        descs = [desc] * len(order_by)
    else:
        descs = list(desc)
        if len(descs) == 1:
            descs = descs * len(order_by)
        if len(descs) != len(order_by):
            raise ValueError(".desc must be length 1 or match .order_by")

    part_cols = [_as_col(c) for c in by]

    if frame is not None and index is not None:
        # Range/interval frame over the index values (O5/O7,
        # R/mutate.R:217-229).  The index defines the frame; order_by keys
        # are not part of a RANGE window's ordering (SQL allows exactly one
        # ORDER BY key with a value-based frame).
        if not isinstance(index, str):
            raise TypeError(".index must be a column name string")
        if frame.is_calendar:
            # Tier B: calendar intervals need SQL RANGE BETWEEN INTERVAL.
            parts = []
            sql_part = ""
            if by:
                names = [c if isinstance(c, str) else None for c in by]
                if any(n is None for n in names):
                    raise TypeError("calendar frames need string `by` names")
                sql_part = "PARTITION BY " + ", ".join(
                    quote_ident(n) for n in names  # type: ignore[arg-type]
                )
                parts.append(sql_part)
            parts.append(f"ORDER BY {quote_ident(index)}")
            parts.append(frame.sql_frame_clause())
            return WindowPlan(
                sql_over=" ".join(parts),
                partition_cols=part_cols,
                order_cols=[F.col(index)],
                frame=frame,
                sql_part=sql_part,
                index_name=index,
            )
        key, unit, _ = _index_order_key(df, index)
        lo, hi = frame.range_bounds(unit)
        spec = Window.partitionBy(*part_cols).orderBy(key).rangeBetween(lo, hi)
        return WindowPlan(
            spec=spec, partition_cols=part_cols, order_cols=[key], frame=frame
        )

    order_cols = []
    for c, d in zip(order_by, descs):
        if hasattr(c, "to_spark"):  # verbs.desc marker (NSE desc(col) parity,
            order_cols.append(c.to_spark())  # R/mutate.R:549-552)
        else:
            order_cols.append(_as_col(c).desc() if d else _as_col(c).asc())

    if frame is not None:
        # Rows frame (O4/O6, R/mutate.R:204-215).
        if not order_by:
            raise ValueError(
                ".frame without .index requires .order_by — Spark DataFrames "
                "have no physical row order to slide over"
            )
        lo, hi = frame.row_bounds()
        spec = Window.partitionBy(*part_cols).orderBy(*order_cols).rowsBetween(lo, hi)
        return WindowPlan(
            spec=spec,
            partition_cols=part_cols,
            order_cols=order_cols,
            frame=frame,
            row_frame=True,
        )

    if order_cols:
        # Ordered, no frame: ranking/analytic context (row_number, lag, ...)
        # and cumulative aggregates (which add their own rowsBetween).
        spec = Window.partitionBy(*part_cols).orderBy(*order_cols)
        return WindowPlan(spec=spec, partition_cols=part_cols, order_cols=order_cols)

    # Partition-only: group-broadcast aggregate (O3, R/mutate.R:236-239).
    spec = Window.partitionBy(*part_cols)
    return WindowPlan(spec=spec, partition_cols=part_cols)


# --- scale-safe ungrouped cumulatives --------------------------------------

# fn → (partial aggregator, partial-total MERGE aggregator, row combiner);
# count merges by SUMMING partial counts — counting them would be wrong.
_PREFIX_COMBINE = {
    "sum": (F.sum, F.sum, lambda local, off: local + off),
    "count": (F.count, F.sum, lambda local, off: local + off),
    "max": (F.max, F.max, F.greatest),
    "min": (F.min, F.min, F.least),
}


def scale_safe_cumulative(
    df: DataFrame,
    expr: str,
    *,
    order_by: list[object],
    out: str,
    fn: str = "sum",
    n_partitions: int | None = None,
    split_points: list | None = None,
) -> DataFrame:
    """Ungrouped ordered cumulative WITHOUT the single-partition window.

    A global ``sum(x) OVER (ORDER BY k)`` funnels every row through one
    task — the classic scale cliff.  This lowering is the textbook two-pass
    distributed prefix aggregate:

    1. a DETERMINISTIC range-bucket id ``__pid`` (percentile split points
       embedded as literals — equal keys share a bucket; see
       :func:`_det_bucket_id` for why ``repartitionByRange`` +
       ``spark_partition_id()`` is unsound when plan branches re-execute);
    2. per-bucket prefix via a window on ``__pid`` — n parallel tasks;
    3. per-bucket totals (n tiny rows) get an EXCLUSIVE prefix combine
       and broadcast-join back as offsets.

    Exact for integer/decimal aggregates; for doubles the additions
    re-associate (same caveat any distributed sum has).  ``cummean`` callers
    combine a sum pass and a count pass (Σ/Σ, never mean-of-means).  The
    leading order key must be numeric/date/timestamp/string — strings are
    bucketed by their first-8-UTF-8-bytes projection (see
    :func:`_bucket_order_key`; long-common-prefix populations collapse to
    one bucket — correct but single-task; static ``split_points`` for a
    string key must be derived via :func:`string_key_literal`).
    """
    if fn not in _PREFIX_COMBINE:
        raise ValueError(
            f"scale_safe cumulative supports {sorted(_PREFIX_COMBINE)}, got {fn!r}"
        )
    agg, merge, combine = _PREFIX_COMBINE[fn]
    n = n_partitions or df.sparkSession.sparkContext.defaultParallelism
    ocols = [_as_col(c) for c in order_by]
    lead = order_by[0]
    if not isinstance(lead, str):
        raise ValueError(
            "scale_safe_cumulative needs a NAMED leading order column"
        )
    lead_key = _bucket_order_key(df, lead)
    pid = _det_bucket_id(
        df, lead_key, n, desc=False, null_last=False, splits=split_points
    )
    ranged = df.withColumn("__pid", pid.cast("int"))
    w_local = (
        Window.partitionBy("__pid")
        .orderBy(*ocols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    value = F.expr(expr)
    local = ranged.withColumn("__local", agg(value).over(w_local))
    totals = ranged.groupBy("__pid").agg(agg(value).alias("__tot"))
    w_prev = Window.orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, -1
    )  # n rows total — a single task here is free
    offsets = totals.select(
        "__pid", merge(F.col("__tot")).over(w_prev).alias("__off")
    )
    joined = local.join(F.broadcast(offsets), "__pid", "left")
    result = F.when(F.col("__off").isNull(), F.col("__local")).otherwise(
        combine(F.col("__local"), F.col("__off"))
    )
    return joined.withColumn(out, result).drop("__pid", "__local", "__off")


def _ordered_cols(order_by: list[object], desc: bool | list[bool]) -> list[Column]:
    """Order columns with per-key desc applied (compile_window's rule)."""
    if isinstance(desc, bool):
        descs = [desc] * len(order_by)
    else:
        descs = list(desc)
        if len(descs) == 1:
            descs = descs * len(order_by)
        if len(descs) != len(order_by):
            raise ValueError(".desc must be length 1 or match .order_by")
    cols = []
    for c, d in zip(order_by, descs):
        if hasattr(c, "to_spark"):  # verbs.desc marker
            cols.append(c.to_spark())
        else:
            cols.append(_as_col(c).desc() if d else _as_col(c).asc())
    return cols


def _bucket_order_key(df: DataFrame, col: str) -> Column:
    """Numeric ORDER-PRESERVING projection of a column for range
    bucketing: numeric/date/timestamp via the epoch cast
    (:func:`_index_order_key`); strings via their first-8-UTF-8-bytes
    value (byte-lexicographic UTF-8 order == code-point order, and
    right-zero-padding keeps prefix order), so equal-prefix ties simply
    share a bucket — coarseness is fine for bucketing, which only needs
    contiguity in the sort order, not injectivity.

    HAZARD — prefix collapse: a string population sharing one long
    common prefix (URLs, ``user_...`` ids) projects to ONE value, i.e.
    one bucket — silently restoring the single-partition window the
    scale_safe lowerings exist to avoid (results stay correct).  If the
    leading order key can look like that, prepend a dispersing key
    (a hash) or pass explicit ``split_points``.

    Callers supplying static ``split_points`` for a string key MUST
    derive them in THIS projected domain via
    :func:`string_key_literal` — raw-domain literals land every row in
    a handful of buckets (ADVICE r7: ASCII hex bytes occupy only
    0x30-0x39/0x61-0x66, so uniform cuts of [0, 16^15) miss the data).
    """
    dtype = df.schema[col].dataType
    if isinstance(dtype, T.StringType):
        hx = F.rpad(
            F.substring(F.upper(F.hex(F.encode(F.col(col), "UTF-8"))), 1, 15),
            15,
            "0",
        )
        return F.conv(hx, 16, 10).cast("long")
    key, _, _ = _index_order_key(df, col)
    return key


def string_key_literal(value: str) -> int:
    """Python-side twin of :func:`_bucket_order_key`'s string branch:
    the first 15 hex chars of the UTF-8 bytes, zero-right-padded, as an
    integer.  Callers deriving STATIC ``split_points`` for a string
    order key (e.g. :func:`~tidier_spark.operators.corpus.shuffle_rows`
    over uniform md5 hex keys) must map their raw-domain boundaries
    through this so the literals live in the same projected domain the
    runtime compares against — kept adjacent to the Column version so
    the two transforms can only change in lockstep."""
    hx = value.encode("utf-8").hex().upper()[:15].ljust(15, "0")
    return int(hx, 16)


def _det_bucket_id(
    df: DataFrame,
    key: Column,
    n: int,
    *,
    desc: bool,
    null_last: bool,
    splits: list | None = None,
) -> Column:
    """Deterministic range-bucket id in [0, n): percentile split points
    collected ONCE (one aggregate pass, a model-sized driver artifact)
    and embedded as literals, so the id is a PURE FUNCTION of the row.

    ``spark_partition_id()`` after ``repartitionByRange`` is NOT that:
    the range exchange samples per execution, and a plan whose branches
    (window, counts, broadcast builds) re-execute it can assign the same
    row different partition ids across jobs — measured at sf0.01 as
    silently dropped rows.  A pure-function id is consistent across any
    re-execution, retry, or exchange-reuse decision by construction.

    Ties equal to a split value land in the lower bucket together, so
    buckets are contiguous ranges of the key with ties unsplit.

    ``splits`` short-circuits the percentile pass with caller-supplied
    boundary values (ascending) — ANY monotone literals are CORRECT
    (only balance quality varies), so callers whose key distribution is
    known a priori (a uniform hash key, a dense id) can skip the data
    pass entirely.  That matters when ``df`` is an expensive derived
    frame: the percentile collect re-executes its whole upstream plan.
    """
    if n < 2:
        return F.lit(0)
    if splits is None:
        probs = [(i + 1) / n for i in range(n - 1)]
        row = df.select(
            F.percentile_approx(
                key, F.array(*[F.lit(p) for p in probs]), F.lit(10_000)
            ).alias("s")
        ).collect()
        arr = row[0]["s"] if row else None
        splits = [v for v in (arr or []) if v is not None]
    if not splits:
        return F.lit(0)
    if desc:
        splits = list(reversed(splits))
        cmps = [F.when(key < F.lit(s), 1).otherwise(0) for s in splits]
    else:
        cmps = [F.when(key > F.lit(s), 1).otherwise(0) for s in splits]
    bucket = cmps[0]
    for c in cmps[1:]:
        bucket = bucket + c
    null_pid = len(splits) if null_last else 0
    return F.when(key.isNull(), F.lit(null_pid)).otherwise(bucket)


def scale_safe_frame(
    df: DataFrame,
    *,
    order_by: list[object] | None = None,
    frame: FrameSpec,
    index: str | None = None,
    desc: bool | list[bool] = False,
    n_partitions: int | None = None,
    by: list[str] | None = None,
) -> tuple[DataFrame, WindowSpec, Column, list[str]]:
    """Ungrouped BOUNDED frame WITHOUT the single-partition window.

    The reference's ungrouped sliding frames (`R/mutate.R:204-229`) force a
    total order; Spark's direct lowering is ``OVER (ORDER BY ...)`` with no
    PARTITION BY — every row through one task, the last driver-side-of-the-
    cluster bottleneck in the engine.  Because the frame is FINITE, each
    row's frame touches only a bounded neighborhood, so the classic
    distributed shape applies — range-bucket + halo exchange:

    1. a DETERMINISTIC range-bucket id ``__pid`` (percentile split points
       embedded as literals — see :func:`_det_bucket_id` for why
       ``repartitionByRange`` + ``spark_partition_id()`` is unsound here);
    2. a tiny per-bucket bounds table (n rows: global-index extent for
       ROWS frames, min/max index value for RANGE frames);
    3. every row is broadcast-joined against the bounds and lands in each
       bucket whose HOME rows' frames can reach it (its own bucket plus a
       halo ``|lo|``/``|hi|`` deep — rows duplicate only across
       boundaries they straddle, ~(n·width)/N overhead);
    4. the original window runs per target bucket — n parallel tasks —
       and only home rows (``__tpid == __pid``) keep their value.

    Same row sets, same in-frame order as the single-partition plan, so
    results are bit-identical (hash-pinned in tests/test_plans.py).

    Returns ``(augmented_df, window_spec, home_predicate, helper_cols)`` —
    the caller computes aggregates ``.over(spec)``, filters on the
    predicate, and drops the helpers.  ROWS frames use a synthetic global
    row index (per-bucket ``row_number`` + broadcast prefix offsets), so
    the window's ORDER BY is tie-free by construction; the leading order
    key must be numeric/date/timestamp/string (strings via the 8-byte
    UTF-8 prefix projection of :func:`_bucket_order_key`, with its
    prefix-collapse hazard; unsupported types raise, and mutate falls
    back to the reference-faithful lowering).  RANGE frames require a non-NULL index
    (checked JVM-side per row, loud error).

    ``by`` (r11 RANGE, r12 ROWS): GROUPED hot-key-safe lowering.  The
    default grouped plan partitions by the group key alone, so one key
    owning half the rows is one straggler task at scale (the skewkeys
    regime).  With ``by``, the window partitions by ``(key, __tpid)``
    instead — a hot key's rows split across the order-axis buckets.

    RANGE (r11): the bucket split points and halo-copy bounds stay
    GLOBAL over the order key: every same-key row within frame reach of
    a bucket's home extent is a fortiori within reach of the GLOBAL
    home extent, so the copy set is a superset of what each key needs
    and per-key frames stay exact (extra copies are non-home or out of
    the key's frame; the window's PARTITION BY key keeps other keys'
    rows out).

    ROWS (r12): per-key ROW offsets don't map onto global buckets, so
    the global-superset trick fails (a same-key row 3 positions back
    can be arbitrarily far on the order axis).  Instead the lowering
    builds a PER-KEY dense row index scale-safely — a deterministic
    global order-bucket ``__opid`` (split points on the leading order
    key — hot keys split across buckets), per-(key, bucket) local
    ``row_number``, and per-key exclusive prefix offsets over the
    per-cell counts (a window with at most n rows per key — counts,
    not data; one equi-join on the anti-skew (key, bucket) composite
    attaches the offsets) — then re-chunks each key's index into
    UNIFORM supercells of ``chunk = max(2*reach, ceil(nk/n))`` rows.
    A hot key splits into <= n supercells; a key smaller than two
    frame-widths stays whole with zero halo copies; duplication is
    bounded by reach/chunk <= 50% regardless of the key-size
    distribution.  Because supercells are uniform index ranges, each
    row's target list is the closed-form ``sequence(floor((g-hi')/c),
    floor((g-lo')/c))`` — no array join.  The copied per-key index set
    per target supercell is a CONTIGUOUS superset of its home rows'
    frames, so physical ROWS offsets inside ``(key, __tpid)`` equal
    per-key index offsets and results match the default grouped plan
    bit-for-bit (hash-pinned in tests/test_plans.py).  Grouped ROWS
    requires string ``by`` names (they feed groupBy/join); non-string
    keys raise and mutate falls back to the default grouped lowering.
    """
    n = n_partitions or df.sparkSession.sparkContext.defaultParallelism

    if index is not None:
        # --- RANGE frame: halo by index value -----------------------------
        key, unit, _ = _index_order_key(df, index)
        lo, hi = frame.range_bounds(unit)
        if lo <= -(2**62) or hi >= 2**62:
            raise ValueError(
                "scale_safe_frame requires finite frame bounds; use "
                "scale_safe_cumulative for (inf, 0) prefixes"
            )
        pid = _det_bucket_id(df, key, n, desc=False, null_last=False)
        guarded = F.when(
            F.assert_true(
                F.col(index).isNotNull(),
                F.lit(
                    f"scale_safe range frame: index column {index!r} has NULL "
                    "values — NULL index rows have no position on the range "
                    "axis; filter them or use the default lowering"
                ),
            ).isNull(),
            key,
        )
        ranged = df.withColumn("__k", guarded).withColumn(
            "__pid", pid.cast("int")
        )
        bounds = ranged.groupBy("__pid").agg(
            F.min("__k").alias("__minv"), F.max("__k").alias("__maxv")
        )
        bounds = bounds.select(
            F.col("__pid").alias("__tpid"), "__minv", "__maxv"
        )
        lo2, hi2 = min(lo, 0), max(hi, 0)
        copied = ranged.join(
            F.broadcast(bounds),
            (F.col("__k") >= F.col("__minv") + F.lit(lo2))
            & (F.col("__k") <= F.col("__maxv") + F.lit(hi2)),
        ).drop("__minv", "__maxv")
        spec = (
            Window.partitionBy(*(by or []), "__tpid")
            .orderBy(F.col("__k"))
            .rangeBetween(lo, hi)
        )
        home = F.col("__tpid") == F.col("__pid")
        return copied, spec, home, ["__pid", "__tpid", "__k"]

    # --- ROWS frame: halo by global row index -----------------------------
    if not order_by:
        raise ValueError("scale_safe_frame rows mode requires order_by")
    lo, hi = frame.row_bounds()
    if lo < -(2**31) or hi > 2**31:
        raise ValueError(
            "scale_safe_frame requires finite frame bounds; use "
            "scale_safe_cumulative for (inf, 0) prefixes"
        )
    ocols = _ordered_cols(list(order_by), desc)
    # bucket on the LEADING order key (ties unsplit, so buckets stay
    # contiguous in the total order); _index_order_key raises for
    # non-numeric leading keys — mutate falls back to the default plan
    lead = order_by[0]
    if hasattr(lead, "to_spark"):
        raise ValueError(
            "scale_safe_frame: desc() markers are carried via `desc`, not "
            "order_by entries"
        )
    if not isinstance(lead, str):
        raise ValueError(
            "scale_safe_frame rows mode needs a NAMED leading order column"
        )
    lead_key = _bucket_order_key(df, lead)
    descs = desc if isinstance(desc, list) else [desc]
    lead_desc = bool(descs[0]) if descs else False
    pid = _det_bucket_id(
        df, lead_key, n, desc=lead_desc, null_last=lead_desc
    )

    if by:
        # --- grouped ROWS: per-key dense index + uniform supercells -------
        if not all(isinstance(b, str) for b in by):
            raise ValueError(
                "scale_safe_frame grouped rows mode needs string `by` "
                "names (they feed groupBy/join)"
            )
        ranged = df.withColumn("__opid", pid.cast("int"))
        w_cell = Window.partitionBy(*by, "__opid").orderBy(*ocols)
        loc = ranged.withColumn("__lrn", F.row_number().over(w_cell))
        cells = ranged.groupBy(*by, "__opid").agg(
            F.count(F.lit(1)).alias("__cnt")
        )
        # per-key windows over the CELL table: at most n rows per key
        # (counts, not data) — no hot-key straggler here
        w_prev = (
            Window.partitionBy(*by)
            .orderBy("__opid")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        w_key = (
            Window.partitionBy(*by)
            .orderBy("__opid")
            .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        )
        offs = cells.withColumn(
            "__off", F.coalesce(F.sum("__cnt").over(w_prev), F.lit(0))
        )
        offs = offs.withColumn("__nk", F.sum("__cnt").over(w_key)).select(
            *by, "__opid", "__off", "__nk"
        )
        # one equi-join on (key, order-bucket) — the anti-skew composite
        # key — attaches the prefix offset and the per-key row count.
        # NULL-SAFE on the key columns: SQL window partitioning groups
        # NULL keys into ONE partition, and a null-unsafe equi-join
        # would silently DROP those rows (caught by the nullkeys axis,
        # r12).
        rhs = offs.select(
            *[F.col(b).alias(f"__byk{i}") for i, b in enumerate(by)],
            F.col("__opid").alias("__opid_r"),
            "__off",
            "__nk",
        )
        cond = F.col("__opid") == F.col("__opid_r")
        for i, b in enumerate(by):
            cond = cond & F.col(b).eqNullSafe(F.col(f"__byk{i}"))
        gdf = (
            loc.join(rhs, cond)
            .drop("__opid_r", *[f"__byk{i}" for i in range(len(by))])
            .withColumn("__gidx", F.col("__lrn") - 1 + F.col("__off"))
            .drop("__lrn", "__off")
        )
        # Re-chunk each key's dense index into UNIFORM supercells of
        # chunk = max(2*reach, ceil(nk/n)) rows: a hot key splits into
        # <= n supercells while a key smaller than two frame-widths
        # stays whole with ZERO halo copies, and duplication is bounded
        # by reach/chunk <= 50% regardless of the key-size distribution
        # (per-key CELLS as targets would copy ~width/cell_size per
        # small key — measured 10x blowup when width >> nk/n).  Because
        # supercells are uniform index ranges, a row's target list is a
        # closed-form sequence — no array join needed.
        lo2, hi2 = min(lo, 0), max(hi, 0)
        reach = hi2 - lo2
        chunk = F.greatest(
            F.lit(max(2 * reach, 1)),
            F.ceil(F.col("__nk") / F.lit(n)).cast("long"),
        )
        g = F.col("__gidx")
        last = F.floor((F.col("__nk") - 1) / chunk)
        t_min = F.greatest(F.lit(0), F.floor((g - F.lit(hi2)) / chunk))
        t_max = F.least(last, F.floor((g - F.lit(lo2)) / chunk))
        copied = (
            gdf.withColumn("__pid", F.floor(g / chunk).cast("int"))
            .withColumn(
                "__tpid",
                F.explode(F.sequence(t_min.cast("int"), t_max.cast("int"))),
            )
            .drop("__nk")
        )
        spec = (
            Window.partitionBy(*by, "__tpid")
            .orderBy("__gidx")
            .rowsBetween(lo, hi)
        )
        home = F.col("__tpid") == F.col("__pid")
        return copied, spec, home, ["__opid", "__pid", "__tpid", "__gidx"]

    ranged = df.withColumn("__pid", pid.cast("int"))
    w_local = Window.partitionBy("__pid").orderBy(*ocols)
    loc = ranged.withColumn("__lrn", F.row_number().over(w_local))
    counts = ranged.groupBy("__pid").agg(F.count(F.lit(1)).alias("__cnt"))
    w_prev = Window.orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, -1
    )  # n rows total — single-task here is free
    offs = counts.select(
        "__pid",
        F.coalesce(F.sum("__cnt").over(w_prev), F.lit(0)).alias("__off"),
        "__cnt",
    )
    bounds = offs.select(
        F.col("__pid").alias("__tpid"),
        F.col("__off").alias("__start"),
        (F.col("__off") + F.col("__cnt") - 1).alias("__end"),
    )
    gdf = (
        loc.join(F.broadcast(offs.select("__pid", "__off")), "__pid")
        .withColumn("__gidx", F.col("__lrn") - 1 + F.col("__off"))
        .drop("__lrn", "__off")
    )
    # copy row h into every target whose home frames reach it; widening to
    # [start+min(lo,0), end+max(hi,0)] keeps each bucket's global-index
    # set CONTIGUOUS (physical ROWS offsets stay exact even for shifted
    # frames like (2,5) over buckets narrower than the shift)
    lo2, hi2 = min(lo, 0), max(hi, 0)
    copied = gdf.join(
        F.broadcast(bounds),
        (F.col("__gidx") >= F.col("__start") + F.lit(lo2))
        & (F.col("__gidx") <= F.col("__end") + F.lit(hi2)),
    ).drop("__start", "__end")
    spec = (
        Window.partitionBy("__tpid").orderBy("__gidx").rowsBetween(lo, hi)
    )
    home = F.col("__tpid") == F.col("__pid")
    return copied, spec, home, ["__pid", "__tpid", "__gidx"]


# --- subtractive lowering for very wide bounded frames ----------------------

_SUBTRACTIVE_RE = re.compile(r"^\s*(sum|count|avg)\s*\((.*)\)\s*$", re.I | re.S)

_EXACT_TYPES = (
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.DecimalType,
)


def subtractive_calls(df: DataFrame, calls: list[tuple[str, str]]) -> bool:
    """True when EVERY windowized call can be lowered as a difference of
    two unbounded-preceding prefix windows — the O(n) escape from the
    frame-WIDTH cliff (SCALE.md r11: Spark's bounded sliding frame
    re-aggregates the in-frame buffer per row, O(n·w); bucketing divides
    the n, never the w).

    ``sum(x) OVER (lo, hi)  ==  P(hi) - P(lo-1)`` where ``P(b)`` is the
    running aggregate ``OVER (unbounded preceding, b)`` — a frame Spark
    evaluates INCREMENTALLY (rows are only ever added), so two prefix
    windows cost O(n) total regardless of frame width.  The identity is
    exact only when the sum never rounds: operands must be integral or
    decimal (double/float subtraction re-associates and can
    catastrophically cancel — those fall back to the direct frame).
    ``count(*)``/``count(1)`` are always exact; DISTINCT operands are
    not subtractable (``selectExpr`` probe rejects them).  ``avg``
    decomposes to exact-sum / exact-count — note Spark's direct
    ``avg(long)`` accumulates its sum as DOUBLE, so the subtractive form
    is at least as accurate; both agree bit-for-bit while frame sums
    stay within 2^53 (pinned in tests/test_plans.py).
    """
    if not calls:
        return False
    for _ph, call in calls:
        m = _SUBTRACTIVE_RE.match(call)
        if not m:
            return False
        operand = m.group(2).strip()
        if m.group(1).lower() == "count" and operand in ("*", "1"):
            continue
        try:
            dt = df.selectExpr(operand).schema[0].dataType
        except Exception:
            return False  # DISTINCT / multi-arg / unresolvable operand
        if not isinstance(dt, _EXACT_TYPES):
            return False
    return True


def subtractive_over(
    call: str,
    spec: WindowSpec,
    lo: int,
    hi: int,
    *,
    row_frame: bool,
) -> Column:
    """Lower one sum/count/avg call over a bounded frame as a prefix
    difference on ``spec``'s partitioning and ordering (see
    :func:`subtractive_calls` for the identity and its exactness
    contract).  ``spec``'s own frame is REPLACED (``rowsBetween`` /
    ``rangeBetween`` on a WindowSpec substitutes the frame, keeping
    partition + order), so this composes with the scale-safe halo
    lowerings: inside a ``(key, __tpid)`` partition the prefix starts at
    the partition's halo head and the difference touches exactly the
    home rows' frame — the same contiguity argument as the direct plan.

    Frame-empty semantics match the direct plan: ``sum``/``avg`` over a
    frame with no (non-null) operand rows yield NULL via the count
    guard; ``count`` yields 0 (its difference is already 0).
    """
    m = _SUBTRACTIVE_RE.match(call)
    if m is None:
        raise ValueError(f"not a subtractable call: {call!r}")
    fn, operand = m.group(1).lower(), m.group(2).strip()
    if row_frame:
        w_hi = spec.rowsBetween(Window.unboundedPreceding, hi)
        w_lo = spec.rowsBetween(Window.unboundedPreceding, lo - 1)
    else:
        w_hi = spec.rangeBetween(Window.unboundedPreceding, hi)
        w_lo = spec.rangeBetween(Window.unboundedPreceding, lo - 1)
    cnt = F.expr(f"count({operand})")
    cd = cnt.over(w_hi) - cnt.over(w_lo)
    if fn == "count":
        return cd
    s = F.expr(f"sum({operand})")
    p_hi, p_lo = s.over(w_hi), s.over(w_lo)
    sd = F.when(p_lo.isNull(), p_hi).otherwise(p_hi - p_lo)
    if fn == "sum":
        return F.when(cd > 0, sd)
    return F.when(cd > 0, sd / cd)  # avg: exact-sum / exact-count


def scale_safe_calendar_frame(
    df: DataFrame,
    *,
    frame: FrameSpec,
    index: str,
    by: list[str] | None = None,
    n_partitions: int | None = None,
) -> tuple[DataFrame, str, Column, list[str]]:
    """CALENDAR interval frame (Tier B) without the hot-key / single-task
    window — the r12 extension of the r11 RANGE halo to variable-width
    calendar bounds.

    Calendar months/years have no fixed epoch width, so the exact frame
    must stay a SQL ``RANGE BETWEEN INTERVAL`` window — but the HALO
    copy step only needs a SUPERSET: :meth:`FrameSpec.micros_envelope`
    bounds every possible frame inside ``[k + lo_us, k + hi_us]``
    (month <= 31 days, year <= 366), and the r11 superset argument then
    applies verbatim — every same-key row within TRUE frame reach of a
    bucket's home extent is a fortiori within envelope reach of the
    GLOBAL home extent, so per-row frames stay exact and extra copies
    are non-home or outside the frame.  The SQL window runs
    ``PARTITION BY (key..., __tpid) ORDER BY index`` with the exact
    INTERVAL frame clause.

    Requires a timestamp index (epoch-µs bucketing) and string ``by``
    names (they feed the SQL PARTITION BY); ``by=None`` distributes the
    otherwise single-partition UNGROUPED calendar window.  Returns
    ``(copied_df, sql_over, home_predicate, helper_cols)``.
    """
    n = n_partitions or df.sparkSession.sparkContext.defaultParallelism
    dtype = df.schema[index].dataType
    if not isinstance(dtype, T.TimestampType | T.TimestampNTZType):
        raise ValueError(
            "scale_safe calendar frames need a timestamp index "
            f"(epoch-µs bucketing); got {dtype.simpleString()}"
        )
    if by and not all(isinstance(b, str) for b in by):
        raise ValueError(
            "scale_safe calendar frames need string `by` names "
            "(they feed the SQL PARTITION BY)"
        )
    lo_us, hi_us = frame.micros_envelope()  # raises on unbounded ends
    key = F.unix_micros(F.col(index))
    pid = _det_bucket_id(df, key, n, desc=False, null_last=False)
    guarded = F.when(
        F.assert_true(
            F.col(index).isNotNull(),
            F.lit(
                f"scale_safe calendar frame: index column {index!r} has "
                "NULL values — NULL index rows have no position on the "
                "range axis; filter them or use the default lowering"
            ),
        ).isNull(),
        key,
    )
    ranged = df.withColumn("__k", guarded).withColumn("__pid", pid.cast("int"))
    bounds = ranged.groupBy("__pid").agg(
        F.min("__k").alias("__minv"), F.max("__k").alias("__maxv")
    )
    bounds = bounds.select(F.col("__pid").alias("__tpid"), "__minv", "__maxv")
    lo2, hi2 = min(lo_us, 0), max(hi_us, 0)
    copied = ranged.join(
        F.broadcast(bounds),
        (F.col("__k") >= F.col("__minv") + F.lit(lo2))
        & (F.col("__k") <= F.col("__maxv") + F.lit(hi2)),
    ).drop("__minv", "__maxv")
    parts = [quote_ident(b) for b in (by or [])] + [quote_ident("__tpid")]
    sql_over = (
        f"PARTITION BY {', '.join(parts)} "
        f"ORDER BY {quote_ident(index)} {frame.sql_frame_clause()}"
    )
    home = F.col("__tpid") == F.col("__pid")
    return copied, sql_over, home, ["__pid", "__tpid", "__k"]


_RMQ_RE = re.compile(r"^\s*(min|max)\s*\((.*)\)\s*$", re.I | re.S)


def rmq_call(df: DataFrame, call: str) -> bool:
    """True when ``call`` is a single-operand min/max — liftable to the
    O(1)-per-row fixed-width sliding RMQ (:func:`rmq_frame_value`).
    min/max are exact SELECTIONS, so the lowering is bit-identical for
    ANY orderable operand type (doubles included — unlike the
    subtractive sum path, nothing is re-associated)."""
    m = _RMQ_RE.match(call)
    if m is None:
        return False
    operand = m.group(2).strip()
    if re.match(r"(?i)^\s*distinct\b", operand):
        return False  # min(DISTINCT x) == min(x), but keep the probe honest
    try:
        df.selectExpr(operand)
    except Exception:
        return False
    return True


def rmq_frame_value(
    aug: DataFrame,
    call: str,
    part: list[str],
    lo: int,
    hi: int,
    ph: str,
) -> tuple[DataFrame, Column, list[str]]:
    """Fixed-width sliding min/max in O(n) — the min/max leg of the r12
    frame-WIDTH floor (sum/count/avg take :func:`subtractive_over`).

    Classic block RMQ specialized to the constant ROWS width
    ``w = hi - lo + 1``: chunk the per-partition dense index into blocks
    of exactly w rows, materialize the running min/max from each block's
    START (``__pfx``) and from its END (``__sfx``) — both incremental
    window frames — then every width-w frame spans AT MOST two adjacent
    blocks, so its aggregate is ``least/greatest(sfx[frame_start],
    pfx[frame_end])`` fetched by constant-offset lag/lead.  Edge rules
    (derived in-line) handle partition-clipped frames: a frame clipped
    at the start lands fully in block 0 with its start ON the block
    boundary (→ pfx term alone); a frame clipped at the end makes the
    suffix cover exactly the remaining rows (→ sfx term alone, with the
    pfx term coalesced to the partition-last prefix when the span still
    crosses a block edge).

    Runs INSIDE the scale-safe halo partitions (``part`` =
    [by..., __tpid], ordered by the dense ``__gidx``): copies are a
    contiguous superset of every home frame, so positional lag/lead
    offsets equal index offsets and a NULL shift result means a TRUE
    partition edge, never a missing copy.  ``least``/``greatest`` skip
    NULLs (all-NULL or empty frames yield NULL, matching the direct
    plan).  Returns ``(aug_with_helpers, value, helper_cols)``; helper
    columns are namespaced by ``ph`` and dropped by the caller with the
    placeholders.
    """
    m = _RMQ_RE.match(call)
    if m is None:
        raise ValueError(f"not an rmq call: {call!r}")
    fn = m.group(1).lower()
    agg = F.min if fn == "min" else F.max
    pick = F.least if fn == "min" else F.greatest
    w = hi - lo + 1
    if w < 1:
        raise ValueError(f"rmq needs a non-empty frame, got ({lo}, {hi})")
    g = F.col("__gidx")
    bcol = F.floor(g / F.lit(w))
    x = F.expr(m.group(2).strip())
    pfx_w = (
        Window.partitionBy(*part, f"__rqb_{ph}")
        .orderBy("__gidx")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sfx_w = (
        Window.partitionBy(*part, f"__rqb_{ph}")
        .orderBy(F.col("__gidx").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    base = Window.partitionBy(*part).orderBy("__gidx")
    whole = Window.partitionBy(*part).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    # last() needs the ORDERED whole-partition frame — an unordered
    # window would return an arbitrary row's prefix
    whole_ord = (
        Window.partitionBy(*part)
        .orderBy("__gidx")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    aug = (
        aug.withColumn(f"__rqb_{ph}", bcol)
        .withColumn(f"__rqp_{ph}", agg(x).over(pfx_w))
        .withColumn(f"__rqs_{ph}", agg(x).over(sfx_w))
    )

    def shift(col: Column, off: int) -> Column:
        if off == 0:
            return col
        return (
            F.lead(col, off).over(base)
            if off > 0
            else F.lag(col, -off).over(base)
        )

    sfx_l = shift(F.col(f"__rqs_{ph}"), lo)   # suffix at frame start
    pfx_r = shift(F.col(f"__rqp_{ph}"), hi)   # prefix at frame end
    pfx_last = F.last(f"__rqp_{ph}").over(whole_ord)
    mxg = F.max("__gidx").over(whole)
    lg, rg = g + F.lit(lo), g + F.lit(hi)
    lc = F.greatest(lg, F.lit(0))
    rc = F.least(rg, mxg)
    bl, br = F.floor(lc / F.lit(w)), F.floor(rc / F.lit(w))
    # end-clip detection must be POSITIONAL (rg beyond the partition),
    # never a NULL-coalesce — a genuine all-NULL prefix value would be
    # wrongly replaced by the partition-last prefix
    pfx_rc = F.when(rg > mxg, pfx_last).otherwise(pfx_r)
    value = F.when((rg < 0) | (lg > mxg), F.lit(None)).otherwise(
        F.when(bl < br, pick(sfx_l, pfx_rc))
        .when(lc == bl * F.lit(w), pfx_rc)
        .otherwise(sfx_l)
    )
    helpers = [f"__rqb_{ph}", f"__rqp_{ph}", f"__rqs_{ph}"]
    return aug, value, helpers
