"""Weighted quantiles — the frequency-weighted order statistics the plain
``percentile`` family cannot express (revenue-weighted medians, token-count
-weighted document length percentiles, importance-weighted latencies).

Definition (weighted lower quantile, the Hyndman-Fan type-1 analogue): for
probability p, the smallest value x whose cumulative weight reaches
p·W (W = total weight). Every comparison runs on EXACT DECIMAL cumulative
weights — the p·W threshold is a DECIMAL product of the exact total with
the probability on the 1e-6 grid — so the selected value is exact and the
whole report VALUE-oracle-able (ties: equal values merge into one
cumulative step first, so duplicated data cannot straddle a threshold).

Scale shape: one groupBy(group, value) collapse (map-side combined — the
quantile frame is bounded by distinct values per group), one keyed window
for the cumulative weight, one conditional-min aggregate per probability.
No SinglePartition, no sort of raw data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_DEC = "decimal(38,6)"
_OVERFLOW_MSG = (
    "weighted_quantiles: weight magnitude >= 1e12 overflows the "
    "DECIMAL(18,6) quantization cast to NULL under non-ANSI Spark; "
    "pre-scale the weight column"
)


def weighted_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    weight_col: str,
    probs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9),
) -> DataFrame:
    """Per-group weighted quantiles of ``value_col`` under ``weight_col``.

    Returns one row per group: group, n (rows), w_total (exact weight
    sum, double), and one ``p<percent>`` column per probability — the
    smallest value whose cumulative weight ≥ p·W. Rows with null group/
    value/weight or weight ≤ 0 are dropped. Probabilities must sit on the
    1e-6 grid (exactness contract).
    """
    for p in probs:
        if not (0.0 < p <= 1.0):
            raise ValueError(f"probs must be in (0, 1], got {p}")
        if round(p * 1_000_000) != p * 1_000_000:
            raise ValueError(f"prob {p} not on the 1e-6 grid")
    g = F.col(group_col)
    w = F.col(weight_col).cast("decimal(18,6)")
    base = df.where(
        g.isNotNull()
        & F.col(value_col).isNotNull()
        & F.col(weight_col).isNotNull()
        & (F.col(weight_col) > 0)
    ).select(g.alias("group"), F.col(value_col).alias("v"), w.alias("wd"))
    # collapse ties first: one cumulative step per distinct value
    cells = base.groupBy("group", "v").agg(
        F.count(F.lit(1)).alias("n"),
        F.count("wd").alias("n_w"),
        F.sum(F.col("wd").cast(_DEC)).alias("sw"),
    )
    wo = Window.partitionBy("group").orderBy("v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wa = Window.partitionBy("group")
    staged = cells.select(
        "group",
        "v",
        "n",
        "n_w",
        F.sum("sw").over(wo).alias("cw"),
        F.sum("sw").over(wa).alias("tw"),
    )
    aggs = [
        F.sum("n").alias("n"),
        F.sum("n_w").alias("n_w_chk"),
        F.max("tw").alias("tw"),
    ]
    for p in probs:
        # exact DECIMAL threshold: tw * p on the 1e-6 grid
        thr = F.col("tw") * F.lit(f"{p:.6f}").cast("decimal(10,6)")
        aggs.append(
            F.min(F.when(F.col("cw") >= thr, F.col("v"))).alias(
                f"p{round(p * 1000) / 10:g}".replace(".", "_")
            )
        )
    out = staged.groupBy("group").agg(*aggs)
    from preprocessor_spark.operators.hypotests import _dec_double

    n_ok = F.coalesce(
        F.assert_true(F.col("n") == F.col("n_w_chk"), F.lit(_OVERFLOW_MSG)).cast(
            "long"
        ),
        F.col("n"),
    )
    pcols = [c for c in out.columns if c.startswith("p") and c != "group"]
    return out.select(
        "group",
        n_ok.alias("n"),
        F.round(_dec_double(F.col("tw")), 6).alias("w_total"),
        *pcols,
    ).orderBy("group")
