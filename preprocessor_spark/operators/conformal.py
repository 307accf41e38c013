"""Split-conformal prediction intervals — distribution-free coverage from
one calibration pass (Vovk et al.; Lei et al., JASA 2018).

Split conformal is the scale-friendly member of the conformal family: fit
any point predictor on a TRAIN split, take the ⌈(n+1)(1−α)⌉-th smallest
absolute residual on a disjoint CALIBRATION split, and ŷ ± q̂ covers new
points with probability ≥ 1−α — no distributional assumptions, no
refitting per point.

Engine shape: the splits come from the repo's md5 hash buckets
(:func:`preprocessor_spark.operators.splits.split_bucket_expr` — the same
engine-portable bucket the CUPED and split operators use); the per-group
predictor is one exact-DECIMAL mean groupBy; the bounded group frame
broadcasts back onto the calibration rows; q̂ is an exact order statistic
read at ``row_number == k`` under one keyed window exchange (ties on the
residual are value-identical at rank k, so the statistic is deterministic
without any tie-break column). No SinglePartition anywhere; the scan is
one pass per split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from preprocessor_spark.operators.hypotests import _dec_double


def conformal_group_intervals(
    df: DataFrame,
    group_col: str,
    y_col: str,
    id_col: str,
    alpha: float = 0.1,
    train_buckets: int = 5000,
) -> DataFrame:
    """Per-group split-conformal intervals for the group-mean predictor.

    Rows hash-split by ``id_col``: bucket < ``train_buckets`` (of 10000)
    trains the per-group mean; the rest calibrate. Per group: prediction
    (exact-DECIMAL train mean), q̂ = the ⌈(n_cal+1)(1−α)⌉-th smallest
    |y − prediction| on the calibration split, and the interval
    [prediction − q̂, prediction + q̂]. Groups whose calibration split is
    too small for the rank (k > n_cal) report NULL q̂/interval — the
    honest "not enough calibration data" answer. Groups absent from the
    train split are dropped (no predictor to calibrate).

    Returns one row per group: group, n_train, n_cal, prediction, qhat,
    lo, hi — every value a deterministic double over exact sums, counts
    and one exact order statistic.
    """
    from preprocessor_spark.operators.splits import split_bucket_expr

    g, y = F.col(group_col), F.col(y_col)
    base = df.where(g.isNotNull() & y.isNotNull()).select(
        g.alias("group"),
        y.cast("decimal(18,4)").alias("yd"),
        y.cast("double").alias("y"),
        (split_bucket_expr(F.col(id_col)) < train_buckets).alias("is_train"),
    )
    means = (
        base.where(F.col("is_train"))
        .groupBy("group")
        .agg(
            F.count("yd").alias("n_train"),
            F.sum(F.col("yd").cast("decimal(38,8)")).alias("s"),
        )
        .select(
            "group",
            "n_train",
            (_dec_double(F.col("s")) / F.col("n_train")).alias("prediction"),
        )
    )
    cal = base.where(~F.col("is_train")).join(F.broadcast(means), "group")
    resid = F.abs(F.col("y") - F.col("prediction"))
    wg = Window.partitionBy("group")
    wr = Window.partitionBy("group").orderBy(resid)
    scored = cal.select(
        "group",
        "n_train",
        "prediction",
        resid.alias("r"),
        F.count(F.lit(1)).over(wg).alias("n_cal"),
        F.row_number().over(wr).alias("rn"),
    )
    k = F.ceil((F.col("n_cal") + 1) * F.lit(1.0 - float(alpha))).cast("long")
    out = scored.groupBy("group", "n_train", "prediction", "n_cal").agg(
        F.max(F.when(F.col("rn") == k, F.col("r"))).alias("qhat_raw")
    )
    q = F.col("qhat_raw")
    return out.select(
        "group",
        "n_train",
        "n_cal",
        F.round(F.col("prediction"), 6).alias("prediction"),
        F.round(q, 6).alias("qhat"),
        F.round(F.col("prediction") - q, 6).alias("lo"),
        F.round(F.col("prediction") + q, 6).alias("hi"),
    )
