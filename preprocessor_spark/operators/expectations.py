"""Declarative data-quality expectations — the deequ/Great-Expectations
shape, Spark-first.

Production training pipelines gate every ingest on a constraint suite
(non-null keys, uniqueness, value domains, ranges, referential integrity).
The reference library has no data-quality surface (its closest analog is the
fit-time discard statistics, `clearbox_preprocessor/preprocessor.py:302-325`)
— north-star addition.

Design for 100 TB:

- **All column-level checks compile into ONE aggregation pass** over the
  table (`df.agg(*exprs)`) — a single job, map-side partial aggregation,
  one 1-row result. Adding a check adds an expression, never a scan.
- **Uniqueness** rides the same pass as `count - count_distinct` (exact
  here; swap in `approx_count_distinct` at extreme scale).
- **Referential integrity** is the only check that can't live in the single
  pass: it is a broadcast/keyed LEFT ANTI join counting orphans — one keyed
  shuffle against the (usually dimension-sized) parent.
- The report is a tiny (checks × 5) table: check name, column, expectation,
  observed violation count, pass flag — SQL-expressible, so the whole suite
  is oracle-checkable.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    """One expectation: ``name``, target ``column`` and a violation-count
    expression (0 violations = pass) plus a human-readable rule string."""

    name: str
    column: str
    rule: str
    violations: Column


def not_null(col: str) -> Check:
    return Check(
        f"not_null({col})", col, "value IS NOT NULL",
        F.sum(F.when(F.col(col).isNull(), 1).otherwise(0)),
    )


def unique(col: str) -> Check:
    """count − distinct-count = number of surplus duplicate rows."""
    return Check(
        f"unique({col})", col, "no duplicate values",
        F.count(col) - F.count_distinct(F.col(col)),
    )


def in_range(col: str, lo: float, hi: float) -> Check:
    return Check(
        f"in_range({col})", col, f"{lo} <= value <= {hi}",
        F.sum(
            F.when(F.col(col).isNotNull() & ~F.col(col).between(lo, hi), 1).otherwise(0)
        ),
    )


def accepted_values(col: str, values: list) -> Check:
    return Check(
        f"accepted_values({col})", col, f"value in {sorted(map(str, values))}",
        F.sum(
            F.when(F.col(col).isNotNull() & ~F.col(col).isin(values), 1).otherwise(0)
        ),
    )


def matches_regex(col: str, pattern: str) -> Check:
    return Check(
        f"matches_regex({col})", col, f"value ~ /{pattern}/",
        F.sum(
            F.when(
                F.col(col).isNotNull() & ~F.col(col).rlike(pattern), 1
            ).otherwise(0)
        ),
    )


def non_negative(col: str) -> Check:
    return Check(
        f"non_negative({col})", col, "value >= 0",
        F.sum(F.when(F.col(col) < 0, 1).otherwise(0)),
    )


def run_checks(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Evaluate every column-level check in ONE aggregation pass; returns
    (check, column, rule, n_violations, passed) — one row per check."""
    agg = df.agg(
        *[c.violations.cast("bigint").alias(f"__c{i}") for i, c in enumerate(checks)]
    )
    pairs = F.array(
        *[
            F.struct(
                F.lit(c.name).alias("check"),
                F.lit(c.column).alias("column"),
                F.lit(c.rule).alias("rule"),
                F.coalesce(F.col(f"__c{i}"), F.lit(0)).alias("n_violations"),
            )
            for i, c in enumerate(checks)
        ]
    )
    return (
        agg.select(F.explode(pairs).alias("r"))
        .select("r.check", "r.column", "r.rule", "r.n_violations")
        .withColumn("passed", (F.col("n_violations") == 0).cast("int"))
    )


def referential_check(
    child: DataFrame, fk_col: str, parent: DataFrame, pk_col: str, name: str | None = None
) -> DataFrame:
    """Orphan count: child rows whose non-null FK has no parent PK.
    One LEFT ANTI join (broadcast when the parent is a dim) — the single
    check that needs its own (keyed) pass."""
    orphans = (
        child.filter(F.col(fk_col).isNotNull())
        .join(parent.select(F.col(pk_col).alias(fk_col)).distinct(), fk_col, "left_anti")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_violations"))
    )
    nm = name or f"referential({fk_col}->{pk_col})"
    return orphans.select(
        F.lit(nm).alias("check"),
        F.lit(fk_col).alias("column"),
        F.lit(f"every {fk_col} exists in parent.{pk_col}").alias("rule"),
        "n_violations",
        (F.col("n_violations") == 0).cast("int").alias("passed"),
    )
