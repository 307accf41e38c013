"""Empirical-Bayes (James-Stein) shrinkage of per-group means.

The "thousands of small segments" estimation problem: per-clerk / per-SKU /
per-domain means computed from a handful of observations are dominated by
noise, and ranking by the raw mean surfaces small-n flukes. The
normal-normal empirical-Bayes estimator (James & Stein 1961; Efron &
Morris 1975; Morris 1983 for the unequal-n method-of-moments form) shrinks
each group mean toward the grand mean in proportion to its noise share:

    tau² = max(0, (Σ_g n_g (m_g − m̄)² − (k−1) s²) / (N − Σ_g n_g²/N))
    B_g  = (s²/n_g) / (s²/n_g + tau²)          (shrinkage factor in [0,1])
    m̂_g = m_g + B_g (m̄ − m_g)

with s² the pooled within-group variance. Groups with few rows shrink
hard; well-measured groups barely move; tau² = 0 (no real between-group
signal) collapses everything to the grand mean.

Engine-portability contract (the cuped/DiD recipe): ONE groupBy computes
exact DECIMAL per-group moments (n, Σy, Σy²); the k-row cell frame is
re-aggregated with unpartitioned windows into the pooled quantities; every
output is then a fixed IEEE expression over exact sums — VALUE-oracle-able.
Scale shape: one map-side-combinable groupBy + |groups|-row window math;
group count is unbounded, nothing collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_DEC = "decimal(38,8)"


def james_stein_means(
    df: DataFrame,
    group_col: str,
    y_col: str,
    min_n: int = 1,
    post_scale: float = 1.0,
) -> DataFrame:
    """Per-group raw vs shrunk means. Returns one row per group:
    (group, n, mean_raw, mean_shrunk, shrink_factor, tau2, s2_within,
    grand_mean) — all in ``post_scale``·y units. Groups with n <
    ``min_n`` are dropped before pooling.

    ``post_scale`` rescales AFTER the exact decimal moments (sy·s,
    syy·s²) so the quantized pooled sums stay inside int64 without the
    decimal cast re-rounding scaled values; pass an exact power of two
    (binary scaling is exact in doubles) to keep the whole pipeline
    bit-replayable."""
    y = F.col(y_col).cast("decimal(18,4)")
    base = df.where(F.col(group_col).isNotNull() & F.col(y_col).isNotNull())
    cells = (
        base.groupBy(F.col(group_col).alias("group"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(y.cast(_DEC)).alias("sy"),
            F.sum((y * y).cast(_DEC)).alias("syy"),
        )
        .where(F.col("n") >= int(min_n))
    )
    w = Window.partitionBy()
    s = float(post_scale)
    n = F.col("n").cast("double")
    sy = F.col("sy").cast("double") * F.lit(s)
    syy = F.col("syy").cast("double") * F.lit(s * s)
    m = sy / n
    # pooled quantities over the |groups|-row frame: integer/DECIMAL sums
    # are order-free; the two per-group DOUBLE terms (within-group SS and
    # between-group SS) quantize to the 1e-9 int64 grid before summing —
    # float window accumulation order would otherwise depend on the cell
    # frame's partitioning (the logreg engine's trick, applied to a
    # window). Pre-scale y so |term|·1e9 stays inside int64 (the huber
    # contract); each term is an identical IEEE double in any engine, so
    # the quantized sums replay exactly.
    big_n = F.sum("n").over(w).cast("double")
    k = F.count(F.lit(1)).over(w).cast("double")
    gsy = F.sum("sy").over(w).cast("double") * F.lit(s)
    grand = gsy / big_n

    def qsum(term):
        return (
            F.sum(F.floor(term * F.lit(1e9) + F.lit(0.5)).cast("long"))
            .over(w)
            .cast("double")
            / F.lit(1e9)
        )

    # pooled within-group variance: Σ_g (Σy² − (Σy)²/n_g) / (N − k)
    ss_within = qsum(syy - sy * sy / n)
    s2 = ss_within / (big_n - k)
    ss_between = qsum(n * (m - grand) * (m - grand))
    sum_n2 = F.sum(F.col("n") * F.col("n")).over(w).cast("double")
    tau2 = F.greatest(
        F.lit(0.0),
        (ss_between - (k - F.lit(1.0)) * s2) / (big_n - sum_n2 / big_n),
    )
    b = (s2 / n) / (s2 / n + tau2)
    shrunk = m + b * (grand - m)
    return cells.select(
        "group",
        "n",
        m.alias("mean_raw"),
        shrunk.alias("mean_shrunk"),
        b.alias("shrink_factor"),
        tau2.alias("tau2"),
        s2.alias("s2_within"),
        grand.alias("grand_mean"),
    )
