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

from .text import analyze_documents

__all__ = ["clean_corpus", "stratified_sample", "mix_datasets"]


def clean_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    languages: tuple[str, ...] = ("en",),
    min_quality: float = 0.5,
) -> DataFrame:
    """Language + quality gates, then fingerprint dedup keeping min(id).

    Returns (id, fingerprint, quality) of surviving documents.  Plan shape:
    metrics come from :func:`analyze_documents` (tokenization materialized
    ONCE — composing the per-metric column builders would re-run the regex
    tokenizer ~7× per row), the gates are plain filters above the scan, and
    the min-id survivor is ``row_number() over (partition by fingerprint
    order by id) = 1`` — ONE shuffle on already-gated rows, single pass, no
    self-join, nothing computed twice.
    """
    from pyspark.sql import Window

    # Token analysis is CPU-bound; a small/single-file source scans as one
    # partition and would serialize it.  Round-robin repartition to the
    # session's parallelism first — at real scale the scan already has
    # enough partitions and this becomes a cheap even-out; locally it is
    # the difference between 1 and 32 cores doing the regex work.
    n_part = df.sparkSession.sparkContext.defaultParallelism
    a = analyze_documents(df.repartition(n_part), text_col)

    # The gate is folded into the window ORDER instead of a pre-shuffle
    # filter: a filter on computed metrics would be pushed below the
    # metrics projection by Catalyst, INLINING the full quality/lang
    # expression tree into the predicate and re-running the tokenizer ~20×
    # per row (measured 2.7× slower).  Ordering by (failed, id) keeps the
    # survivor rule identical — the rank-1 row of a fingerprint group is
    # its min-id GATED row whenever one exists — while metrics are computed
    # exactly once below the shuffle.  The shuffle carries ungated rows
    # too, but they are 4 tiny columns/row vs a 20× CPU recompute.
    passed = F.col("lang_pred").isin(*languages) & (F.col("quality") >= min_quality)
    base = a.select(id_col, "fingerprint", "quality", "lang_pred").withColumn(
        "__fail", F.when(passed, F.lit(0)).otherwise(F.lit(1))
    )
    w = Window.partitionBy("fingerprint").orderBy("__fail", id_col)
    return (
        base.withColumn("__rn", F.row_number().over(w))
        .where((F.col("__rn") == 1) & (F.col("__fail") == 0))
        .select(F.col(id_col), F.col("fingerprint"), F.col("quality"))
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
