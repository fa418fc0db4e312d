"""Data-quality expectations: declarative constraint checks over a table.

The validation gate every production pipeline runs before data ships
(the Deequ/Great-Expectations shape, re-expressed as ONE Spark
aggregation): each rule compiles to a conditional-count aggregate, the
whole rule set folds into a single ``agg()`` pass — one scan, map-side
partial combine, no shuffle beyond the final 1-row reduce — and the
result unpivots to one row per rule ``(column, rule, n_violations, ok)``.

Rules (constraint grammar):

* ``("not_null",)`` — NULL values violate
* ``("unique",)`` — rows sharing a value violate (counted as
  n_rows − n_distinct; NULLs ignored, matching SQL UNIQUE)
* ``("between", lo, hi)`` — values outside [lo, hi] violate (NULL passes;
  combine with not_null to forbid).  NaN VIOLATES: the predicate is
  spelled ``NOT (lo <= v AND v <= hi)`` on Spark (NaN-largest total
  order makes that count NaN) and with an explicit ``isnan`` disjunct
  in the DuckDB mirror — measured on the nanvals edge axis: DuckDB
  1.0's vectorized column comparators return ``NaN >= lo`` AND
  ``NaN <= hi`` both TRUE (no consistent order, unlike its scalar
  comparisons), so no plain-comparison spelling counts NaN there
* ``("in_set", v1, v2, ...)`` — values outside the set violate
* ``("matches", regex)`` — non-matching strings violate

Uniqueness is the one rule a single conditional count can't express; it
rides ``count_distinct`` in the same aggregate pass (exact — the
mergeable-sketch variant for 100 TB is ``approx_count_distinct``, noted
in the docstring knob).

Scale: everything is one ``groupBy().agg()`` over conditional sums —
the cheapest possible full-table pass; at 100 TB swap ``count_distinct``
for ``approx_count_distinct(rsd)`` if exact uniqueness is not required.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["validate", "validate_sql", "fk_orphans", "fk_orphans_sql"]


def _rule_name(rule: tuple) -> str:
    kind = rule[0]
    if kind == "between":
        return f"between_{rule[1]}_{rule[2]}"
    if kind == "in_set":
        return "in_set"
    if kind == "matches":
        return "matches"
    return kind


def _named_rules(rules: dict[str, list[tuple]]):
    """(col, rule_tuple, unique_name) triples — duplicate same-kind rules
    on one column get #2, #3, ... suffixes so agg slots and output rows
    never collide (identical naming in validate and validate_sql)."""
    out = []
    for col, col_rules in sorted(rules.items()):
        seen: dict[str, int] = {}
        for rule in col_rules:
            if not isinstance(rule, tuple):
                rule = (rule,)
            base = _rule_name(rule)
            n = seen.get(base, 0)
            seen[base] = n + 1
            out.append((col, rule, base if n == 0 else f"{base}#{n + 1}"))
    return out


def _sq(s) -> str:
    return str(s).replace("'", "''")


def _violation_expr(col: str, rule: tuple):
    kind = rule[0]
    c = F.col(col)
    if kind == "not_null":
        return F.sum(F.when(c.isNull(), 1).otherwise(0))
    if kind == "between":
        lo, hi = rule[1], rule[2]
        # NOT(>= AND <=): NaN-robust under either comparison semantics
        # (see module docstring; nanvals edge axis)
        return F.sum(
            F.when(
                c.isNotNull() & ~((c >= F.lit(lo)) & (c <= F.lit(hi))), 1
            ).otherwise(0)
        )
    if kind == "in_set":
        vals = list(rule[1:])
        return F.sum(F.when(c.isNotNull() & ~c.isin(*vals), 1).otherwise(0))
    if kind == "matches":
        return F.sum(
            F.when(c.isNotNull() & ~c.rlike(rule[1]), 1).otherwise(0)
        )
    if kind == "unique":
        # resolved after the agg: n_nonnull − n_distinct
        return None
    raise ValueError(f"unknown rule {kind!r}")


def validate(df: DataFrame, rules: dict[str, list[tuple]]) -> DataFrame:
    """Run ``rules`` (column → list of rule tuples) in ONE aggregate pass.

    Returns one row per (column, rule): ``(column, rule, n_violations,
    ok)``, ordered deterministically by (column, rule).
    """
    aggs = []
    post = []  # (column, rule_name, builder over the agg row)
    for idx, (col, rule, name) in enumerate(_named_rules(rules)):
        slot = f"__v_{idx}_{col}"
        if rule[0] == "unique":
            aggs.append(
                F.sum(F.when(F.col(col).isNotNull(), 1).otherwise(0)).alias(
                    f"__n_{idx}_{col}"
                )
            )
            aggs.append(
                F.count_distinct(F.col(col)).alias(f"__d_{idx}_{col}")
            )
            post.append(
                (col, name, F.col(f"__n_{idx}_{col}") - F.col(f"__d_{idx}_{col}"))
            )
        else:
            aggs.append(_violation_expr(col, rule).alias(slot))
            post.append((col, name, F.col(slot)))
    stats = df.agg(*aggs)
    rows = [
        F.struct(
            F.lit(col).alias("column"),
            F.lit(name).alias("rule"),
            F.coalesce(expr, F.lit(0)).cast("long").alias("n_violations"),
        )
        for col, name, expr in post
    ]
    return (
        stats.select(F.explode(F.array(*rows)).alias("r"))
        .select("r.column", "r.rule", "r.n_violations")
        .withColumn("ok", F.col("n_violations") == 0)
        .orderBy("column", "rule")
    )


def fk_orphans(
    child: DataFrame,
    parent: DataFrame,
    keys: str | list[str],
    parent_keys: str | list[str] | None = None,
) -> DataFrame:
    """Referential-integrity audit: child FK values with no parent row —
    the cross-table check :func:`validate`'s single-table rules can't
    express.  The canonical pipeline shape: after curating a dimension
    (dropping bad customers, pruned documents), find the fact rows that
    lost their parent.

    Returns one row per orphan key value: ``(*keys, n_rows)``, ordered
    by the keys.  NULL FKs are never orphans (SQL FK semantics: a NULL
    reference points at nothing, so it cannot dangle) — forbid them
    separately with a ``("not_null",)`` rule.

    Scale: child aggregates to key cardinality FIRST (one shuffle with
    map-side combine), then left-anti joins the distinct parent keys —
    the join runs on two key-sized frames, never fact-sized rows, and
    AQE broadcasts the parent side when it is dim-sized.
    """
    ck = [keys] if isinstance(keys, str) else list(keys)
    pk = ck if parent_keys is None else (
        [parent_keys] if isinstance(parent_keys, str) else list(parent_keys)
    )
    parents = (
        parent.select(*[F.col(p).alias(c) for p, c in zip(pk, ck)])
        .na.drop()
        .distinct()
    )
    nn = child
    for c in ck:
        nn = nn.where(F.col(c).isNotNull())
    agg = nn.groupBy(*ck).agg(F.count(F.lit(1)).alias("n_rows"))
    return agg.join(parents, ck, "left_anti").orderBy(*ck)


def fk_orphans_sql(
    child: str,
    parent: str,
    keys: str | list[str],
    parent_keys: str | list[str] | None = None,
    parent_where: str | None = None,
) -> str:
    """DuckDB mirror of :func:`fk_orphans` (``parent_where`` lets the
    caller express a curated/filtered parent inline)."""
    ck = [keys] if isinstance(keys, str) else list(keys)
    pk = ck if parent_keys is None else (
        [parent_keys] if isinstance(parent_keys, str) else list(parent_keys)
    )
    sel = ", ".join(f"{p} AS {c}" for p, c in zip(pk, ck))
    notnull_p = " AND ".join(f"{p} IS NOT NULL" for p in pk)
    pwhere = f"({parent_where}) AND {notnull_p}" if parent_where else notnull_p
    notnull_c = " AND ".join(f"{c} IS NOT NULL" for c in ck)
    on = " AND ".join(f"a.{c} = p.{c}" for c in ck)
    cols = ", ".join(f"a.{c}" for c in ck)
    order = ", ".join(ck)
    return (
        f"WITH pks AS (SELECT DISTINCT {sel} FROM {parent} WHERE {pwhere}),\n"
        f"agg AS (SELECT {', '.join(ck)}, count(*) AS n_rows FROM {child}\n"
        f"        WHERE {notnull_c} GROUP BY {', '.join(ck)})\n"
        f"SELECT {cols}, CAST(a.n_rows AS BIGINT) AS n_rows\n"
        f"FROM agg a ANTI JOIN pks p ON {on}\n"
        f"ORDER BY {order}"
    )


def validate_sql(table: str, rules: dict[str, list[tuple]]) -> str:
    """DuckDB mirror of :func:`validate` — same rule grammar, same output
    contract, CASTs pinned (DuckDB integer aggregates are HUGEINT →
    pandas float64 without them)."""
    selects = []
    for col, rule, name in _named_rules(rules):
            kind = rule[0]
            if kind == "not_null":
                v = f"sum(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END)"
            elif kind == "between":
                # explicit isnan: DuckDB 1.0's vectorized column
                # comparators return NaN >= lo AND NaN <= hi BOTH TRUE
                # (no consistent order — measured on the nanvals axis),
                # so no plain-comparison spelling can count NaN there;
                # TRY_CAST keeps non-numeric between-rules valid
                v = (
                    f"sum(CASE WHEN {col} IS NOT NULL AND"
                    f" (coalesce(isnan(TRY_CAST({col} AS DOUBLE)), FALSE)"
                    f"  OR {col} < {rule[1]} OR {col} > {rule[2]})"
                    f" THEN 1 ELSE 0 END)"
                )
            elif kind == "in_set":
                vals = ", ".join(
                    f"'{_sq(x)}'" if isinstance(x, str) else str(x)
                    for x in rule[1:]
                )
                v = (
                    f"sum(CASE WHEN {col} IS NOT NULL AND"
                    f" {col} NOT IN ({vals}) THEN 1 ELSE 0 END)"
                )
            elif kind == "matches":
                v = (
                    f"sum(CASE WHEN {col} IS NOT NULL AND"
                    f" NOT regexp_matches({col}, '{_sq(rule[1])}') THEN 1 ELSE 0 END)"
                )
            elif kind == "unique":
                v = (
                    f"sum(CASE WHEN {col} IS NOT NULL THEN 1 ELSE 0 END)"
                    f" - count(DISTINCT {col})"
                )
            else:
                raise ValueError(f"unknown rule {kind!r}")
            selects.append(
                f'SELECT \'{col}\' AS "column", \'{name}\' AS rule,\n'
                f"       CAST(coalesce({v}, 0) AS BIGINT) AS n_violations\n"
                f"FROM {table}"
            )
    union = "\nUNION ALL\n".join(selects)
    return (
        f'SELECT "column", rule, n_violations, n_violations = 0 AS ok\n'
        f'FROM ({union})\nORDER BY "column", rule'
    )
