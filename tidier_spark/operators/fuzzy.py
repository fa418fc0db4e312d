"""Fuzzy string matching: edit-distance self-join without the n² pair space.

The entity-matching/data-cleaning primitive: find record pairs whose
strings are within a small edit distance.  Candidate generation is the
FastSS deletion-neighborhood scheme (Bocek et al., 2007): every string
emits itself plus each single-character-deletion variant; two strings
within Levenshtein distance ≤ 1 ALWAYS share a variant (substitution at
position i → both i-deletions equal; insertion/deletion → the longer
string's deletion equals the shorter string itself), so an equi-join on
the variant is a COMPLETE candidate filter.  Exact ``levenshtein``
verification (built-in, identical integer metric on Spark and DuckDB)
then removes false candidates — same bucket-then-verify discipline as
the MinHash/SimHash family.

Scale shape: the variant explode multiplies rows by (len+1) — bounded by
string length — and the join is an equi-join on the variant string (one
shuffle); verification touches candidates only.  For distance k > 1 the
scheme generalizes to k-deletion neighborhoods (variant count ~ len^k —
practical for short keys like names/codes, not documents; for long text
use the shingle-Jaccard family instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["deletion_variants", "fuzzy_self_join", "fuzzy_self_join_sql"]


def deletion_variants(df: DataFrame, id_col: str, str_col: str) -> DataFrame:
    """(id, original, variant) rows: the string itself plus each
    single-deletion variant — the distance-1 FastSS neighborhood."""
    s = F.col(str_col)
    # positions 0..len: 0 keeps the original, i>0 deletes character i
    # (prefix+suffix concat; substr is 1-based)
    variants = F.transform(
        F.sequence(F.lit(0), F.length(s)),
        lambda i: F.when(i == 0, s).otherwise(
            F.concat(s.substr(F.lit(1), i - 1), s.substr(i + 1, F.length(s)))
        ),
    )
    # DISTINCT per string: deleting any of a run of equal characters
    # yields the same variant (e.g. the zero-run in 'Customer#000000042'
    # collapses 6 deletions to one string) — without array_distinct each
    # shared variant joins with run-length² multiplicity
    from .dedup import _fan_out

    # single-file scans arrive as one split: fan out so the variant
    # explode and join probe use every core, not one
    return _fan_out(df.select(id_col, str_col)).select(
        F.col(id_col),
        s.alias("__orig"),
        F.explode(F.array_distinct(variants)).alias("__variant"),
    )


def fuzzy_self_join(
    df: DataFrame,
    id_col: str,
    str_col: str,
    max_dist: int = 1,
) -> DataFrame:
    """Pairs ``(id_a, id_b, dist)`` with ``id_a < id_b`` and
    ``levenshtein(str_a, str_b) ≤ max_dist`` (currently ``max_dist=1`` —
    the deletion-neighborhood candidate filter is complete for d ≤ 1).

    Plan: variant explode (map) → self equi-join on the variant (one
    shuffle) → dropDuplicates on the pair → exact levenshtein verify.
    Never a cross join; candidate volume is bounded by bucket collisions
    on near-identical substrings.
    """
    if max_dist != 1:
        raise ValueError(
            "fuzzy_self_join implements the distance-1 deletion "
            "neighborhood; for larger distances use shingle-Jaccard "
            "(near_dup_pairs) or extend to k-deletion variants"
        )
    v = deletion_variants(df, id_col, str_col)
    a = v.select(
        F.col(id_col).alias("id_a"),
        F.col("__orig").alias("__sa"),
        "__variant",
    )
    b = v.select(
        F.col(id_col).alias("id_b"),
        F.col("__orig").alias("__sb"),
        "__variant",
    )
    return (
        a.join(b, "__variant")
        .where(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("dist", F.levenshtein(F.col("__sa"), F.col("__sb")))
        .where(F.col("dist") <= max_dist)
        .select("id_a", "id_b", F.col("dist").cast("long").alias("dist"))
    )


def fuzzy_self_join_sql(
    table: str,
    id_col: str,
    str_col: str,
    max_dist: int = 1,
) -> str:
    """DuckDB mirror: brute-force pairs + levenshtein — the oracle shape
    (quadratic; fine at verification scale, never the Spark plan)."""
    return f"""
SELECT a.{id_col} AS id_a, b.{id_col} AS id_b,
       CAST(levenshtein(a.{str_col}, b.{str_col}) AS BIGINT) AS dist
FROM {table} a JOIN {table} b ON a.{id_col} < b.{id_col}
WHERE levenshtein(a.{str_col}, b.{str_col}) <= {max_dist}"""
