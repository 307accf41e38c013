"""Distributed descriptive statistics: correlation / covariance matrices
in ONE aggregation pass.

``df.stat.corr`` computes one pair per job; a p-column matrix that way is
p·(p−1)/2 scans. Here every pairwise Pearson r and sample covariance comes
from a single groupBy-free aggregate of exact power sums — count, Σx, Σx²
per column and Σxy per pair — so the 100 TB table is read ONCE regardless
of p, and partial aggregation (map-side combine) keeps the shuffle at one
row of p·(p+3)/2 numbers.

Determinism: all sums are exact DECIMAL accumulations (order-independent
under Spark's partial aggregation), and the final r / cov arithmetic is a
fixed sequence of IEEE double ops — so results are bit-identical to any
engine that aggregates the same decimals, which is what the DuckDB oracle
asserts. (A double-sum formulation would be partial-order dependent and
flap the correctness hash.)

The p² output is driver-small for any sane p (p ≤ a few hundred); the
operator guards against p where the sums row itself would be a problem.
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MAX_COLS = 512


def _dec(c, scale=4):
    # 18,4 keeps the x·y product at DECIMAL(37,8) — inside the 38-digit cap
    # in BOTH Spark and DuckDB, so every sum stays exact (a wider input type
    # would force Spark's precision-loss truncation and break bit parity)
    return F.col(c).cast(f"decimal(18,{scale})")


def corr_matrix(df: DataFrame, cols: list[str]) -> DataFrame:
    """Long-form (col_a, col_b, n, corr, cov_samp) for every unordered
    column pair, col_a < col_b lexicographically. Rows where ANY of the two
    columns is null are excluded per-pair (pairwise deletion), matching
    SQL's CORR/COVAR_SAMP null semantics."""
    if len(cols) < 2:
        raise ValueError("corr_matrix needs at least two columns")
    if len(cols) > _MAX_COLS:
        raise ValueError(f"corr_matrix supports up to {_MAX_COLS} columns")

    aggs = []
    for a, b in combinations(sorted(cols), 2):
        both = F.col(a).isNotNull() & F.col(b).isNotNull()
        xa = F.when(both, _dec(a)).otherwise(F.lit(None))
        xb = F.when(both, _dec(b)).otherwise(F.lit(None))
        tag = f"{a}__{b}"
        aggs += [
            F.count(F.when(both, F.lit(1))).alias(f"n_{tag}"),
            F.sum(xa).alias(f"sx_{tag}"),
            F.sum(xb).alias(f"sy_{tag}"),
            F.sum(xa * xa).alias(f"sxx_{tag}"),
            F.sum(xb * xb).alias(f"syy_{tag}"),
            F.sum(xa * xb).alias(f"sxy_{tag}"),
        ]
    sums = df.agg(*aggs)

    pair_rows = []
    for a, b in combinations(sorted(cols), 2):
        tag = f"{a}__{b}"
        n = F.col(f"n_{tag}").cast("double")
        sx = F.col(f"sx_{tag}").cast("double")
        sy = F.col(f"sy_{tag}").cast("double")
        sxx = F.col(f"sxx_{tag}").cast("double")
        syy = F.col(f"syy_{tag}").cast("double")
        sxy = F.col(f"sxy_{tag}").cast("double")
        cov_n = sxy - sx * sy / n  # n·cov_pop
        var_x = sxx - sx * sx / n
        var_y = syy - sy * sy / n
        pair_rows.append(
            F.struct(
                F.lit(a).alias("col_a"),
                F.lit(b).alias("col_b"),
                F.col(f"n_{tag}").alias("n"),
                F.when(
                    (var_x > 0) & (var_y > 0),
                    cov_n / F.sqrt(var_x) / F.sqrt(var_y),
                )
                .otherwise(F.lit(None))
                .alias("corr"),
                F.when(n > 1, cov_n / (n - 1)).otherwise(F.lit(None)).alias("cov_samp"),
            )
        )
    return sums.select(F.explode(F.array(*pair_rows)).alias("p")).select("p.*")
