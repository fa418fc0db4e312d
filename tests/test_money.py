"""DECIMAL(38) money-aggregate escape hatch (verdict r07 task #7).

The crafted differential lives at 3e14 + cents — past the 2^53 penny
cliff (|v·100| ≈ 3e16, double ulp > 1) where the default fixed-point
path is documented-inexact (docs/EDGE_SWEEP.md magnitude axis), but
well inside DECIMAL(38,2) and BIGINT-penny range.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from tidier_spark.money import (
    money_avg,
    money_cast,
    money_sum,
    money_sum_pennies,
    money_sum_pennies_sql,
)


@pytest.fixture(scope="module")
def big_money(spark):
    # 200 doubles around 3e14 with cent parts; 3 groups
    vals = [3.0e14 + i * 1.37e10 + 0.37 + 0.01 * (i % 7) for i in range(200)]
    pdf = pd.DataFrame({"g": [i % 3 for i in range(200)], "v": vals})
    return spark.createDataFrame(pdf), pdf


def test_decimal_sum_matches_duckdb_at_1e14(big_money):
    """Spark decimal pennies == DuckDB decimal pennies (via the
    shortest-repr VARCHAR hop), bit-exact, at a magnitude where the
    engines' DEFAULT penny paths are out of the exact domain."""
    df, pdf = big_money
    got = {
        r.g: r.s
        for r in df.groupBy("g")
        .agg(F.expr(money_sum_pennies("v")).alias("s"))
        .collect()
    }
    con = duckdb.connect()
    con.register("t", pdf)
    want = dict(
        con.execute(
            f"SELECT g, {money_sum_pennies_sql('v')} AS s FROM t GROUP BY g"
        ).fetchall()
    )
    con.close()
    assert got == want, (got, want)


def test_decimal_sum_is_partition_independent(big_money):
    """The point of the hatch: the decimal total is identical under any
    partitioning / aggregation order (128-bit exact accumulation) —
    where the double path's sum re-associates."""
    df, _ = big_money
    total = lambda frame: frame.agg(  # noqa: E731
        F.expr(money_sum_pennies("v")).alias("s")
    ).collect()[0].s
    assert total(df) == total(df.repartition(13)) == total(df.repartition(1))


def test_default_penny_path_documented_inexact_here(big_money):
    """Prove the hatch matters: at this magnitude round(v*100) pennies
    drift from the decimal-exact cents (double ulp > 1 ⇒ the binary
    value cannot hold the cent).  If this ever starts matching, the
    escape hatch documentation is stale."""
    df, _ = big_money
    dec = df.agg(F.expr(money_sum_pennies("v")).alias("s")).collect()[0].s
    pen = df.agg(
        F.expr("CAST(sum(round(v * 100)) AS BIGINT)").alias("s")
    ).collect()[0].s
    assert dec != pen


def test_decimal_overflow_is_loud(spark):
    """Past BIGINT pennies the hatch RAISES (ANSI) — never wraps."""
    pdf = pd.DataFrame({"v": [1.5e15 + i * 1.0e11 for i in range(200)]})
    df = spark.createDataFrame(pdf)
    with pytest.raises(Exception, match="CAST_OVERFLOW|overflow"):
        df.agg(F.expr(money_sum_pennies("v")).alias("s")).collect()


def test_money_avg_and_cast_shapes(spark):
    df = spark.createDataFrame(pd.DataFrame({"v": [1.005, 2.015, 3.025]}))
    row = df.agg(
        F.expr(money_avg("v")).alias("a"),
        F.expr(money_sum("v")).alias("s"),
    ).collect()[0]
    # HALF_UP at the cent on the shortest repr: 1.005 -> 1.01,
    # 2.015 -> 2.02, 3.025 -> 3.03 (the written text IS the shortest
    # repr of each parsed double, so the decimal sees the written
    # half-cents and rounds them all up)
    assert str(row.s) == "6.06" and str(row.a) == "2.020000"
    sel = df.select(F.expr(money_cast("v")).alias("c"))
    assert sel.schema["c"].dataType.simpleString() == "decimal(38,2)"


def test_money_scale_validated():
    with pytest.raises(ValueError, match=r"scale must be in \[0, 18\]"):
        money_cast("v", scale=-1)
    with pytest.raises(ValueError, match=r"scale must be in \[0, 18\]"):
        money_sum_pennies("v", scale=19)


def test_subnormal_and_tiny_values_flush_to_zero(spark):
    """Hypothesis-found (r8): DuckDB's scientific-notation VARCHAR ->
    DECIMAL parse rounds mantissa-first ('5e-300' -> 0.01, wrong), so
    the mirror flushes |v| < half a minor unit to 0 — a HALF_UP no-op.
    Pin the falsifying denormal plus the quirk band."""
    import duckdb
    import pandas as pd
    from pyspark.sql import functions as F

    from tidier_spark.money import money_sum_pennies, money_sum_pennies_sql

    vals = [5e-324, 5e-300, 5e-10, 4.9e-324, 9.9e-05, 0.004999, 0.005, 1.0]
    pdf = pd.DataFrame({"v": vals})
    got = (
        spark.createDataFrame(pdf)
        .agg(F.expr(money_sum_pennies("v")).alias("s"))
        .collect()[0]
        .s
    )
    con = duckdb.connect()
    con.register("t", pdf)
    want = con.execute(
        f"SELECT {money_sum_pennies_sql('v')} AS s FROM t"
    ).fetchone()[0]
    con.close()
    # 0.005 -> 0.01 on both (shortest repr '0.005', HALF_UP); 1.0 -> 1.00
    assert got == want == 101, (got, want)


def test_decimal_input_parquet_no_conversion_caveat(spark, tmp_path):
    """Verdict r08 task #5: money.py claims the double->decimal
    conversion caveat VANISHES with decimal-typed inputs (the real
    100 TB money schema).  Crafted DECIMAL(20,2) parquet at 1e15+
    magnitudes (far past the 2^53 penny cliff): Spark's decimal scan,
    DuckDB through money_sum_pennies_sql (VARCHAR hop), and DuckDB
    WITHOUT the hop must all agree bit-exactly — with decimal storage
    there is no binary representation to disagree about."""
    import duckdb
    from pyspark.sql import functions as F

    from tidier_spark.money import money_sum_pennies, money_sum_pennies_sql

    path = str(tmp_path / "dec_money.parquet")
    # 1e15-scale values with live cent digits; exact in DECIMAL(20,2),
    # NOT representable as doubles (v*100 > 2^53)
    spark.range(0, 200).select(
        (F.col("id") % 3).alias("g"),
        F.expr(
            "CAST(1000000000000000.37 AS DECIMAL(20,2))"
            " + CAST(id AS DECIMAL(20,2)) * CAST(137.41 AS DECIMAL(20,2))"
        ).alias("v"),
    ).coalesce(1).write.mode("overwrite").parquet(path)

    got = {
        r.g: r.s
        for r in spark.read.parquet(path)
        .groupBy("g")
        .agg(F.expr(money_sum_pennies("v")).alias("s"))
        .collect()
    }
    # exact integer ground truth (pennies), pure Python
    base_c, step_c = 100000000000000037, 13741
    want = {}
    for i in range(200):
        want[i % 3] = want.get(i % 3, 0) + base_c + i * step_c
    assert got == want, (got, want)

    con = duckdb.connect()
    try:
        hop = dict(
            con.execute(
                f"SELECT g, {money_sum_pennies_sql('v')} AS s"
                f" FROM '{path}/*.parquet' GROUP BY g"
            ).fetchall()
        )
        nohop = dict(
            con.execute(
                "SELECT g, CAST(sum(CAST(v AS DECIMAL(38,2))) * 100"
                f" AS BIGINT) AS s FROM '{path}/*.parquet' GROUP BY g"
            ).fetchall()
        )
    finally:
        con.close()
    assert hop == nohop == want, (hop, nohop)


def test_r_sum_bigint_is_double_accumulated(spark):
    """r_sum's R-fidelity contract on integral inputs (advice r10):
    BIGINT values are cast to double PER VALUE and fp-accumulated —
    exactly what R does (R has no int64; the column is doubles before
    sum() ever runs).  Two observable consequences, both pinned here:

    1. No ANSI overflow: two 9e18 rows sum to 1.8e19 as a double where
       exact-long accumulation would raise ARITHMETIC_OVERFLOW.
    2. Drift above 2^53: cumulative r_sum over [2^53, 1, 1] stays at
       2^53 (each +1 is lost to ties-to-even), matching Python/R float
       accumulation in frame order — NOT the exact 2^53 + 2.
    """
    from tidier_spark import mutate

    # 1. loud-overflow regime: exact long sum would exceed 2^63
    big = spark.createDataFrame(
        [(1, 9_000_000_000_000_000_000), (2, 9_000_000_000_000_000_000)],
        "k long, v long",
    )
    out = mutate(big, s="r_sum(v, na_rm=TRUE)", order_by="k", frame=(float("inf"), 0))
    rows = {r.k: r.s for r in out.collect()}
    assert rows[1] == 9.0e18 and rows[2] == 1.8e19, rows

    # 2. drift regime: fold order 2^53, +1, +1 in doubles
    vals = [(1, 2**53), (2, 1), (3, 1)]
    df = spark.createDataFrame(vals, "k long, v long")
    out2 = mutate(df, s="r_sum(v, na_rm=TRUE)", order_by="k", frame=(float("inf"), 0))
    got = [r.s for r in out2.orderBy("k").collect()]
    expect = []
    acc = 0.0
    for _, v in vals:
        acc += float(v)
        expect.append(acc)
    assert got == expect, (got, expect)
    assert got[-1] == float(2**53)  # not 2**53 + 2: the R/double semantic


def test_declared_decimal_read_schema_csv_jsonl_vs_duckdb(spark, tmp_path):
    """The last decimal path never exercised (survey 7.15.4b): a
    USER-DECLARED DECIMAL read schema on text sources.  Spark parses
    text->DECIMAL mantissa-first on the FULL literal (java BigDecimal +
    HALF_UP), for both csv and json.  Differential vs DuckDB:

    * CSV: DuckDB's sniffer-free typed read also parses the full text
      mantissa-first — bit-identical on every crafted literal,
      including half-even bait (0.125), double-rounding bait (2.675,
      whose nearest double is 2.67499...), and a 17-digit mantissa just
      below the .005 boundary.
    * JSONL: DuckDB routes JSON NUMBERS through double + shortest-repr
      before the decimal cast, so the 17-digit literal
      1.0049999999999999 reads 1.00 in Spark (exact text) but 1.01 in
      DuckDB (shortest repr of the nearest double is "1.005" — the r8
      money lesson resurfacing on the read path).  That divergence is
      the ORACLE's representation hop, not an engine defect; the pin
      below asserts both sides exactly so any drift in either engine's
      rule still fails.
    """
    import duckdb

    from tidier_spark.sources import read_csv, read_json

    vals = [
        "1.005", "2.675", "0.125", "9999999999999.99",
        "1.0049999999999999", "-2.675", "3.14159", "1e2", "0.1",
        "123456789.555",
    ]
    csv = tmp_path / "d.csv"
    csv.write_text("k,v\n" + "".join(f"{i},{v}\n" for i, v in enumerate(vals)))
    jsonl = tmp_path / "d.jsonl"
    jsonl.write_text(
        "".join(f'{{"k": {i}, "v": {v}}}\n' for i, v in enumerate(vals))
    )

    ddl = "k long, v decimal(15,2)"
    sp_csv = {
        r.k: str(r.v)
        for r in read_csv(spark, str(csv), schema=ddl).collect()
    }
    sp_json = {
        r.k: str(r.v) for r in read_json(spark, str(jsonl), schema=ddl).collect()
    }

    con = duckdb.connect()
    try:
        cols = "columns={'k':'BIGINT','v':'DECIMAL(15,2)'}"
        dk_csv = dict(
            con.execute(
                f"SELECT k, CAST(v AS VARCHAR) FROM read_csv('{csv}', {cols})"
            ).fetchall()
        )
        dk_json = dict(
            con.execute(
                f"SELECT k, CAST(v AS VARCHAR) FROM read_json('{jsonl}', {cols})"
            ).fetchall()
        )
    finally:
        con.close()

    # CSV: full agreement, mantissa-first on both engines
    assert sp_csv == dk_csv, (sp_csv, dk_csv)

    # JSONL: agreement everywhere EXCEPT the double-hop literal (k=4)
    hop = 4
    assert vals[hop] == "1.0049999999999999"
    assert sp_json[hop] == "1.00", sp_json  # exact full-text parse
    assert dk_json[hop] == "1.01", dk_json  # double + shortest-repr hop
    sp_rest = {k: v for k, v in sp_json.items() if k != hop}
    dk_rest = {k: v for k, v in dk_json.items() if k != hop}
    assert sp_rest == dk_rest, (sp_rest, dk_rest)

    # and the Spark csv/json parses agree with EACH OTHER everywhere
    assert sp_csv == sp_json, (sp_csv, sp_json)
