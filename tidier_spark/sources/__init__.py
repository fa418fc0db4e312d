"""Sources & sinks.

The reference has none (data arrives as in-memory data.frames or
pre-registered DB tables, `/root/reference/R/mutate.R:465`; SURVEY.md §2.3
row 1) — so this module is the Spark-native replacement: parquet-backed star
schema loading with the scan hygiene a 100 TB deployment needs (column
pruning and predicate pushdown happen automatically because we hand Catalyst
the parquet scan directly; callers `.select()`/`.filter()` and the
`PushedFilters`/`ReadSchema` show up in `.explain`).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any scale factor — join
# planners should wrap these in F.broadcast().
BROADCAST_TABLES = frozenset({"region", "nation", "supplier", "part", "customer"})

__all__ = [
    "TABLES",
    "BROADCAST_TABLES",
    "read_table",
    "read_stream_table",
    "load_star",
    "morton_key",
    "register_views",
    "read_parquet",
    "read_csv",
    "read_json",
    "read_orc",
    "write_orc",
    "write_parquet",
]


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one star-schema table from driver-generated parquet (TESTDATA.md).

    `events.parquet` stores TIMESTAMP(NANOS) which Spark rejects by default
    (PARQUET_TYPE_ILLEGAL); we read nanos as long and truncate to
    microsecond timestamps — the same truncation DuckDB applies, so oracle
    comparisons agree.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    # Oracle comparisons treat naive parquet timestamps as UTC instants;
    # pin the session so calendar arithmetic (Tier-B INTERVAL frames,
    # window bucketing) agrees even if the host JVM defaults elsewhere.
    # Pinned at EVERY scan (a ~1 ms conf RPC): the tz edge axis depends on
    # read_table winning over a host-zone session even mid-process.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # Set BEFORE the first scan: probing with try/except would abort a live
    # job and dump an ERROR TaskSetManager stack into every bench log.  The
    # conf only affects TIMESTAMP(NANOS) columns, which Spark otherwise
    # rejects outright (PARQUET_TYPE_ILLEGAL), so it is safe to pin always.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.schema(_table_schema(spark, path)).parquet(path)
    return _normalize_timestamps(df)


def _table_schema(spark: SparkSession, path: str):
    """Parquet footer schema for ``path``, memoized per live session.

    Schema inference (``spark.read.parquet(p).schema``) launches a small
    footer-reading job — measured 70-110 ms of driver+task time PER CALL at
    bench scale, paid inside the timed region of every query that touches
    the table.  The schema of a given file cannot change mid-session, so
    infer once per (session, path) and hand Catalyst a pinned schema
    thereafter (11 ms).  This is metadata only — no rows, no results are
    held; a fresh session (every bench/oracle invocation) re-infers from
    the parquet footers.  At 100 TB the same role is played by the table
    catalog, which is exactly a persisted schema.

    The memo lives ON the Python session object so it dies with the
    session and cannot alias across concurrently live sessions.
    """
    memo = getattr(spark, "_tidier_schema_memo", None)
    if memo is None:
        memo = {}
        spark._tidier_schema_memo = memo
    schema = memo.get(path)
    if schema is None:
        schema = spark.read.parquet(path).schema
        memo[path] = schema
    return schema


def _normalize_timestamps(df: DataFrame) -> DataFrame:
    """Pin every event-time column to TIMESTAMP (with local tz).

    The driver's parquet has shipped `events.ts` as both TIMESTAMP(NANOS)
    (read as bigint under `nanosAsLong`) and TIMESTAMP(MICROS, naive)
    (read as TIMESTAMP_NTZ); normalize both to a UTC-instant TIMESTAMP so
    window index math (`unix_micros`, INTERVAL range frames) resolves
    regardless of which encoding the fixture used.  Session tz is pinned
    UTC, so the NTZ→LTZ cast preserves the wall value DuckDB reads.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import TimestampNTZType

    for field in df.schema.fields:
        if field.name == "ts" and field.dataType.simpleString() == "bigint":
            # integer division — float division would lose precision on
            # epoch-nano magnitudes (~1.7e18 > 2^53)
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(field.dataType, TimestampNTZType):
            df = df.withColumn(field.name, F.col(field.name).cast("timestamp"))
    return df


def read_stream_table(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    *,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming scan of a star table (`spark.readStream`), with the same
    nanos→µs timestamp normalization as :func:`read_table` so a streamed
    pipeline and its batch backfill produce byte-identical event times.

    Streaming file sources require an explicit schema; we take it from a
    footer-only batch scan of the same path (metadata read, no data job).
    ``max_files_per_trigger`` bounds micro-batch size in replay scenarios —
    at 100 TB a backfill replays the archive as many bounded micro-batches
    instead of one giant one.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = _table_schema(spark, path)
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is None:
        # replay knob: SPARK_GRAFT_STREAM_MAX_FILES bounds micro-batch
        # size for every streaming scan in the process — the harness
        # lever that turns a single-batch AvailableNow replay into a
        # true multi-batch one (file order = (modTime, path)), so
        # watermark advancement and cross-batch state folding are
        # actually exercised (the `late` edge axis rides this)
        env = os.environ.get("SPARK_GRAFT_STREAM_MAX_FILES")
        if env:
            max_files_per_trigger = int(env)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    # The streaming file source wants a directory to watch; the star tables
    # are single files, so watch the dataset dir filtered to this table.
    # (A production deployment points this at the table's own directory.)
    if os.path.isfile(path):
        reader = reader.option("pathGlobFilter", f"{name}.parquet")
        df = reader.parquet(sf_dir)
    else:
        df = reader.parquet(path)
    return _normalize_timestamps(df)


def load_star(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """All tables as a dict; lazy scans, nothing materialized."""
    return {t: read_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so `spark.sql` works (O9 path)."""
    for t, df in load_star(spark, sf_dir).items():
        df.createOrReplaceTempView(t)


# --- generic readers/writers ------------------------------------------------
# The reference has no IO layer at all; these are the engine's sources and
# sinks.  All lazy scans — pushdown/pruning reach every format that
# supports it (parquet: filters+columns; csv/json: columns at parse time).


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_csv(
    spark: SparkSession, path: str, schema: str | None = None, **options
) -> DataFrame:
    """CSV scan.  Pass an explicit DDL ``schema`` in production — schema
    inference reads the data twice and types drift between runs."""
    reader = spark.read.options(header="true", **options)
    if schema:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_json(
    spark: SparkSession, path: str, schema: str | None = None, **options
) -> DataFrame:
    reader = spark.read.options(**options)
    if schema:
        reader = reader.schema(schema)
    return reader.json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — same predicate-pushdown/column-pruning contract as
    parquet (ORC carries file/stripe min-max stats Spark pushes into)."""
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink (columnar alternative when the downstream stack is
    Hive/Trino-leaning; parquet stays the default)."""
    df.write.mode(mode).orc(path)


def morton_key(
    df: DataFrame, cols: list[str], bits: int = 16, out: str = "__zkey"
) -> DataFrame:
    """Attach a Z-order (Morton) key over two numeric columns: each column
    min-max quantized to ``bits`` bits from ONE broadcast stats pass, then
    bit-interleaved with the magic-number spread (5 shift-mask ops per
    column — a tiny whole-stage-codegen expression, no UDF).

    Callers range-partition and sort by ``out`` so every output file
    covers a small rectangle of the (col1, col2) space — parquet min/max
    stats then prune files for predicates on EITHER column, where a plain
    sort clusters only its leading column.  Two columns (the practical
    sweet spot: each added dimension halves per-column resolution); NULLs
    quantize to 0.
    """
    from pyspark.sql import functions as F

    if len(cols) != 2:
        raise ValueError("morton_key interleaves exactly two columns")
    if not 1 <= bits <= 16:
        raise ValueError("bits must be in [1, 16]")
    stats = df.agg(
        *[
            a
            for c in cols
            for a in (
                F.min(F.col(c).cast("double")).alias(f"__mn_{c}"),
                F.max(F.col(c).cast("double")).alias(f"__mx_{c}"),
            )
        ]
    )
    with_stats = df.crossJoin(F.broadcast(stats))
    top = (1 << bits) - 1

    def quantized(c: str):
        x = F.col(c).cast("double")
        mn, mx = F.col(f"__mn_{c}"), F.col(f"__mx_{c}")
        q = F.floor((x - mn) / F.nullif(mx - mn, F.lit(0.0)) * top)
        return F.coalesce(F.least(q, F.lit(top)), F.lit(0)).cast("long")

    def spread(x):
        # interleave-ready: insert a zero bit between every bit of x
        x = (x.bitwiseOR(F.shiftleft(x, 8))).bitwiseAND(F.lit(0x00FF00FF))
        x = (x.bitwiseOR(F.shiftleft(x, 4))).bitwiseAND(F.lit(0x0F0F0F0F))
        x = (x.bitwiseOR(F.shiftleft(x, 2))).bitwiseAND(F.lit(0x33333333))
        x = (x.bitwiseOR(F.shiftleft(x, 1))).bitwiseAND(F.lit(0x55555555))
        return x

    key = spread(quantized(cols[0])).bitwiseOR(
        F.shiftleft(spread(quantized(cols[1])), 1)
    )
    return with_stats.withColumn(out, key).drop(
        *[f"__mn_{c}" for c in cols], *[f"__mx_{c}" for c in cols]
    )


def write_parquet(
    df: DataFrame,
    path: str,
    *,
    partition_by: list[str] | None = None,
    bucket_by: tuple[int, list[str]] | None = None,
    sort_by: list[str] | None = None,
    zorder_by: list[str] | None = None,
    n_files: int | None = None,
    table: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Parquet sink with the layout levers that matter at 100 TB:

    * ``partition_by`` — directory partitioning: readers prune whole
      partitions for predicates on those columns (keep cardinality
      moderate: aim for >~128 MB files per partition).
    * ``bucket_by=(n, cols)`` — hash bucketing (requires ``table``, a
      metastore name): co-locates equal keys so later joins/aggregations
      on the bucket columns skip their shuffle entirely.
    * ``sort_by`` — range-partition + sort: every file covers a narrow
      key range, so parquet min/max stats prune files/row-groups for
      predicates on the leading sort column.
    * ``zorder_by=[c1, c2]`` — Morton-interleaved layout
      (:func:`morton_key`): files cover small RECTANGLES of the 2-D
      space, pruning predicates on either column — the multi-column
      clustering a plain sort can't give.

    ``n_files`` bounds the range partitioning width for sort/zorder
    (default: ``spark.sql.shuffle.partitions``).
    """
    if sort_by and zorder_by:
        raise ValueError("choose one of sort_by / zorder_by")
    if zorder_by:
        keyed = morton_key(df, list(zorder_by), out="__zkey")
        n = n_files or int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
        df = (
            keyed.repartitionByRange(n, "__zkey")
            .sortWithinPartitions("__zkey")
            .drop("__zkey")
        )
    elif sort_by:
        n = n_files or int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
        df = df.repartitionByRange(n, *sort_by).sortWithinPartitions(*sort_by)
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if bucket_by:
        n, cols = bucket_by
        if not table:
            raise ValueError("bucket_by requires a metastore table name")
        w.bucketBy(n, *cols).sortBy(*cols).saveAsTable(table, path=path, format="parquet")
        return
    w.parquet(path)
