"""PII detection and redaction over text columns.

The standard pre-release scrub for a training corpus: find and mask
emails / phone numbers / IP addresses (the C4/Dolma-style regex pass —
deterministic, auditable, engine-portable; NER-grade PII is a model call
and out of scope for a regex layer, which is why the pattern set is
pluggable).

Everything is built-in `regexp_replace` / `regexp_count` — JVM-side,
inside whole-stage codegen, no UDFs: the scrub runs at scan speed and
the plan is a pure projection (zero shuffles).

Pattern portability: the defaults avoid lookarounds and backreferences,
so the same pattern text runs identically under Java regex (Spark) and
RE2 (DuckDB) — the property the differential oracle depends on.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["PII_PATTERNS", "pii_counts", "scrub_pii", "scrub_pii_sql"]

# name → (regex, replacement token); order is the application order
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}", "<EMAIL>"),
    "phone": (r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
    "ipv4": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
}


def pii_counts(col: Column | str, patterns: dict | None = None) -> dict[str, Column]:
    """Per-type match counts (pre-redaction) as integer columns."""
    c = F.col(col) if isinstance(col, str) else col
    pats = patterns or PII_PATTERNS
    return {
        f"n_{name}": F.regexp_count(c, F.lit(rx)).cast("long")
        for name, (rx, _) in pats.items()
    }


def scrub_pii(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "text_scrubbed",
    patterns: dict | None = None,
    with_counts: bool = True,
) -> DataFrame:
    """Append a redacted copy of ``text_col`` (and per-type match counts).

    Patterns apply in dict order — counts are measured on the ORIGINAL
    text so overlapping patterns (an email containing digits) report
    what each pattern saw, independent of application order.
    """
    pats = patterns or PII_PATTERNS
    scrubbed = F.col(text_col)
    for rx, token in pats.values():
        scrubbed = F.regexp_replace(scrubbed, rx, token)
    out = df
    if with_counts:
        for name, expr in pii_counts(text_col, pats).items():
            out = out.withColumn(name, expr)
    return out.withColumn(out_col, scrubbed)


def scrub_pii_sql(
    text_expr: str = "text", patterns: dict | None = None
) -> dict[str, str]:
    """DuckDB mirrors: per-type count exprs plus the scrubbed-text expr.

    DuckDB regexp_replace needs the explicit ``'g'`` flag for
    global replacement (Spark is global by default)."""
    pats = patterns or PII_PATTERNS
    out = {
        f"n_{name}": f"len(regexp_extract_all({text_expr}, '{rx}'))::BIGINT"
        for name, (rx, _) in pats.items()
    }
    scrubbed = text_expr
    for rx, token in pats.values():
        scrubbed = f"regexp_replace({scrubbed}, '{rx}', '{token}', 'g')"
    out["scrubbed"] = scrubbed
    return out
