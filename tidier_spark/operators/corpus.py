"""Corpus curation pipeline: the operators composed end-to-end.

`clean_corpus` is the canonical training-data shape: language gate →
quality gate → exact near-dup collapse (fingerprint survivor) — one
declarative plan, so Catalyst pushes the cheap gates below the dedup
shuffle.  `stratified_sample` and `mix_datasets` cover the
sampling/mixing stages around it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import detect_language, fingerprint, quality_score

__all__ = ["clean_corpus", "stratified_sample", "mix_datasets"]


def clean_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    languages: tuple[str, ...] = ("en",),
    min_quality: float = 0.5,
) -> DataFrame:
    """Language + quality gates, then fingerprint dedup keeping min(id).

    Returns (id, fingerprint, quality) of surviving documents.  The gates
    run before the dedup groupBy, so the only shuffle sees already-filtered
    rows; survivor choice is the deterministic min-id rule.
    """
    gated = (
        df.withColumn("__lang", detect_language(text_col))
        .withColumn("__q", quality_score(text_col))
        .where(F.col("__lang").isin(*languages) & (F.col("__q") >= min_quality))
        .withColumn("__fp", fingerprint(text_col))
    )
    survivors = gated.groupBy("__fp").agg(F.min(id_col).alias(id_col))
    return (
        survivors.join(
            gated.select(id_col, "__fp", "__q"), on=[id_col, "__fp"]
        )
        .select(
            F.col(id_col),
            F.col("__fp").alias("fingerprint"),
            F.col("__q").alias("quality"),
        )
    )


def stratified_sample(
    df: DataFrame, strata_col: str, fractions: dict[str, float], seed: int = 42
) -> DataFrame:
    """Per-stratum Bernoulli sampling (``sampleBy``) — seeded, no shuffle;
    strata missing from ``fractions`` are dropped (explicit contract)."""
    return df.sampleBy(strata_col, fractions, seed)


def mix_datasets(
    dfs: list[DataFrame], weights: list[float], seed: int = 42
) -> DataFrame:
    """Mix corpora by rate: weight w keeps ~w of each source (w ≤ 1) —
    the standard training-mixture stage.  Sampling is per-partition
    Bernoulli (no shuffle); the union is a plan-level concatenation.
    """
    if len(dfs) != len(weights):
        raise ValueError("one weight per dataset")
    sampled = []
    for i, (d, w) in enumerate(zip(dfs, weights)):
        if not (0 < w <= 1):
            raise ValueError(f"weight {w} must be in (0, 1]")
        sampled.append(d if w == 1 else d.sample(False, w, seed + i))
    out = sampled[0]
    for d in sampled[1:]:
        out = out.unionByName(d)
    return out
