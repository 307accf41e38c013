"""Holt linear-trend exponential smoothing — per-series distributed fit.

The forecasting completion of the ts tier (`ts_features.py` describes
series, `matrix_profile.py` mines them, this extrapolates them): additive
Holt (level + trend) with fixed smoothing parameters,

    l_t = α·y_t + (1−α)·(l_{t−1} + b_{t−1})
    b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}
    ŷ_{t+h} = l_t + h·b_t

initialized the textbook way (l_1 = y_1, b_1 = y_2 − y_1). α=β=1 degrades
to the naive drift forecast; β=0 to simple exponential smoothing with
trend frozen at its init — both asserted in tests.

Scale shape — the `ts_spectral` gather contract: ONE keyed repartition +
groupBy collapses each series to a sorted (order, value) array (bounded by
series length, the caller's contract), then ONE Arrow-batched applyInPandas
stage runs the O(n) recursion per series in numpy. Series count is the
parallelism axis; nothing is collected. Rows-only grading (a sequential
recursion is not SQL) with an independent straight-line reference test.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def holt_forecast(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    alpha: float = 0.5,
    beta: float = 0.3,
    horizon: int = 3,
    num_partitions: int | None = None,
) -> DataFrame:
    """Per-key Holt fit + h-step-ahead forecasts.

    Returns one row per key: n, final level, final trend, in-sample
    one-step-ahead RMSE, and ``forecast`` as an array of ``horizon``
    values (l_n + h·b_n). Keys with < 2 observations are dropped (no
    trend is identifiable) — count them upstream if the gap matters.
    """
    if not (0.0 < alpha <= 1.0) or not (0.0 <= beta <= 1.0):
        raise ValueError(f"alpha in (0,1], beta in [0,1]; got {alpha}, {beta}")
    if horizon < 1:
        raise ValueError(f"horizon must be >= 1, got {horizon}")

    spark = df.sparkSession
    n_part = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    pair = F.struct(
        F.col(order_col).alias("o"), F.col(value_col).cast("double").alias("v")
    )
    gathered = (
        df.where(F.col(value_col).isNotNull() & F.col(order_col).isNotNull())
        # explicit keyed repartition: the Arrow stage is Python-compute
        # bound and the gathered frame is tiny — AQE's byte-based
        # coalescing would serialize it onto one task (the ts_spectral
        # lesson, measured 20.9 s -> ~2 s at sf0.1)
        .repartition(n_part, key_col)
        .groupBy(key_col)
        .agg(F.sort_array(F.collect_list(pair)).alias("series"))
    )
    key_field = gathered.schema[key_col]
    schema = T.StructType(
        [
            T.StructField(key_col, key_field.dataType, True),
            T.StructField("n", T.LongType(), False),
            T.StructField("level", T.DoubleType(), True),
            T.StructField("trend", T.DoubleType(), True),
            T.StructField("rmse", T.DoubleType(), True),
            T.StructField("forecast", T.ArrayType(T.DoubleType()), True),
        ]
    )
    a, b_, h = float(alpha), float(beta), int(horizon)

    def fit(batches):
        import pandas as pd

        cols = [f.name for f in schema.fields]
        for pdf in batches:  # gathered is one row per key already
            out = []
            for key, series in zip(pdf[key_col], pdf["series"]):
                vals = np.array([p["v"] for p in series], dtype=np.float64)
                n = len(vals)
                if n < 2:
                    continue
                lvl, tr = vals[0], vals[1] - vals[0]
                sse = 0.0
                for t in range(1, n):
                    err = vals[t] - (lvl + tr)
                    sse += err * err
                    new_lvl = a * vals[t] + (1.0 - a) * (lvl + tr)
                    tr = b_ * (new_lvl - lvl) + (1.0 - b_) * tr
                    lvl = new_lvl
                out.append(
                    {
                        key_col: key,
                        "n": n,
                        "level": round(lvl, 6),
                        "trend": round(tr, 6),
                        "rmse": round(float(np.sqrt(sse / (n - 1))), 6),
                        "forecast": [round(lvl + (i + 1) * tr, 6) for i in range(h)],
                    }
                )
            yield pd.DataFrame(out, columns=cols)

    return gathered.mapInPandas(fit, schema=schema)
