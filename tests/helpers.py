"""Differential-oracle test rig: Spark result vs DuckDB SQL on the same parquet.

This mirrors both the reference's one real correctness test (eager engine vs
SQLite, `/root/reference/tests/testthat/tests_tidier.R:271-323`) and the
driver's t2 harness (CORRECTNESS_r{N}.json): run the Spark DataFrame and the
ANSI-SQL oracle side-by-side, sort columns by name, sort rows, compare
values (approx for floats).
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

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


def duckdb_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    """Run oracle SQL with the star tables registered as views (driver setup)."""
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
        return con.execute(sql).df()
    finally:
        con.close()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes that differ only in physical representation
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, tuple)) or hasattr(v, "tolist") and not isinstance(v, str) else v,
                na_action="ignore",
            )
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def assert_matches_oracle(spark_df, oracle_sql: str, sf_dir: str, *, rtol=1e-6, atol=1e-9):
    got = _canon(spark_df.toPandas())
    want = _canon(duckdb_oracle(oracle_sql, sf_dir))
    assert list(got.columns) == list(want.columns), (
        f"column mismatch: spark={list(got.columns)} oracle={list(want.columns)}"
    )
    assert len(got) == len(want), f"row count: spark={len(got)} oracle={len(want)}"
    for c in got.columns:
        g, w = got[c], want[c]
        if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(w):
            g = pd.to_numeric(g, errors="coerce")
            w = pd.to_numeric(w, errors="coerce")
            both_nan = g.isna() & w.isna()
            close = pd.Series(
                [
                    (bn or _isclose(a, b, rtol, atol))
                    for a, b, bn in zip(g, w, both_nan)
                ]
            )
            bad = (~close).to_numpy().nonzero()[0]
            assert len(bad) == 0, (
                f"column {c!r}: {len(bad)} mismatches, first at row {bad[0]}: "
                f"spark={g.iloc[bad[0]]!r} oracle={w.iloc[bad[0]]!r}"
            )
        else:
            eq = (g.fillna("\0<NA>") == w.fillna("\0<NA>")) if g.dtype == object else (
                g.isna() & w.isna()
            ) | (g == w)
            bad = (~eq).to_numpy().nonzero()[0]
            assert len(bad) == 0, (
                f"column {c!r}: {len(bad)} mismatches, first at row {bad[0]}: "
                f"spark={g.iloc[bad[0]]!r} oracle={w.iloc[bad[0]]!r}"
            )


def _isclose(a, b, rtol, atol) -> bool:
    if a is None or b is None:
        return a is b
    try:
        if math.isnan(a) and math.isnan(b):
            return True
    except TypeError:
        return a == b
    return math.isclose(a, b, rel_tol=rtol, abs_tol=atol)
