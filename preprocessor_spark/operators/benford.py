"""Benford first-digit conformity audit — the classic data-forensics
screen for fabricated or truncated numeric columns (accounting fraud,
unit-mixing, capped sensors), run as one groupBy.

Benford's law: naturally-occurring multi-scale positive quantities have
first significant digit d with probability log10(1 + 1/d). The audit
compares the observed digit distribution per group against those
probabilities, reporting per-digit deviations and chi-square
contributions; totals (chi2, MAD) are cross-digit float sums and are
computed by the caller on the collected ≤9-row-per-group report — the
:func:`preprocessor_spark.operators.drift.psi_report` design, so every
emitted number stays a single deterministic IEEE expression.

Engine portability: the first significant digit comes from the
DECIMAL(18,4) string rendering (``regexp_extract('[1-9]')`` — identical
in Spark and DuckDB; no float log10 anywhere near the digit), and the
expected probabilities are INLINED shared literals (`BENFORD_P`), not
engine log10 calls — the exact constants are the cross-engine contract,
the same pattern as the Poisson CDF ladder (bootstrap.py:44).

Scale shape: one map-side-combined groupBy(group, digit) — the exchange
carries ≤ 9·|groups| rows — then a broadcast of the |groups|-row totals
frame. The 9-digit template is a literal 9-row frame joined broadcast so
absent digits still report a row.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# the inlined cross-engine contract: log10(1 + 1/d) evaluated ONCE here;
# both the Spark expression and the SQL twin carry these repr literals
BENFORD_P = {d: math.log10(1.0 + 1.0 / d) for d in range(1, 10)}


def first_digit_expr(col):
    """First significant digit (1-9) of a numeric column via its
    DECIMAL(18,4) string rendering; NULL for zero/null inputs."""
    s = F.regexp_extract(col.cast("decimal(18,4)").cast("string"), "[1-9]", 0)
    return F.when(s != "", s.cast("int"))


def benford_report(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Per-(group, digit) Benford conformity rows.

    Returns group, digit (1-9, every digit present), n_obs, n_total,
    frac_obs, expected (the Benford probability), dev (frac − expected,
    one IEEE subtraction), chi2_part ((n_obs − n_total·p)² / (n_total·p)).
    Zero and null values are excluded from the audit (they carry no first
    significant digit); sign is ignored (magnitude digits).
    """
    g = F.col(group_col)
    d = first_digit_expr(F.col(value_col))
    base = df.where(g.isNotNull() & F.col(value_col).isNotNull()).select(
        g.alias("group"), d.alias("digit")
    ).where(F.col("digit").isNotNull())
    counts = base.groupBy("group", "digit").agg(F.count(F.lit(1)).alias("n_obs"))
    totals = counts.groupBy("group").agg(F.sum("n_obs").alias("n_total"))
    spark = df.sparkSession
    template = spark.createDataFrame(
        [(dd, BENFORD_P[dd]) for dd in range(1, 10)], "digit int, expected double"
    )
    full = (
        totals.join(F.broadcast(template))
        .join(counts, ["group", "digit"], "left")
        .withColumn("n_obs", F.coalesce(F.col("n_obs"), F.lit(0)))
    )
    nt = F.col("n_total").cast("double")
    en = nt * F.col("expected")
    frac = F.col("n_obs").cast("double") / nt
    dev = frac - F.col("expected")
    chi2 = (F.col("n_obs").cast("double") - en) * (
        F.col("n_obs").cast("double") - en
    ) / en
    return full.select(
        "group",
        "digit",
        "n_obs",
        "n_total",
        F.round(frac, 6).alias("frac_obs"),
        F.round(F.col("expected"), 6).alias("expected"),
        F.round(dev, 6).alias("dev"),
        F.round(chi2, 6).alias("chi2_part"),
    ).orderBy("group", "digit")


def benford_mad(report_rows) -> float:
    """Mean absolute deviation over a collected per-group report (9 rows).
    Nigrini conformity bands: < 0.006 close, < 0.012 acceptable,
    < 0.015 marginal, else nonconforming."""
    devs = sorted(abs(r["frac_obs"] - r["expected"]) for r in report_rows)
    acc = 0.0
    for v in devs:
        acc += v
    return acc / len(devs)
