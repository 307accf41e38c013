"""Marketing-style conversion attribution — last/first/linear multi-touch
credit assignment over an event stream.

Attribution answers "which touchpoint channels caused the conversions?":
every conversion event looks back over the user's preceding touch events
within a window and distributes one unit of credit (and the conversion's
value) across them under a position model:

- ``last``  — 100% to the most recent touch (the ad-tech default);
- ``first`` — 100% to the earliest touch in the window;
- ``linear`` — 1/n to each of the n touches.

Engine shape: ONE user-keyed equi-join pairs each conversion with its
candidate touches (the time window is a residual range predicate on top of
the hash join — per-user fan-out is bounded by events-per-user·window; for
power users bucket time like
:func:`preprocessor_spark.operators.interval.interval_join`); position
ranks come from one window over the (conversion, ts) frame.

Engine-portability contract (what makes even the fractional model
VALUE-oracle-able): per-channel sums of 1/n credits are NOT accumulated as
a float sum over data-sized rows (order-nondeterministic). Instead the
pairs collapse to exact integer counts and exact DECIMAL value sums per
(channel, n_touches) cell — the only data-sized reduction — and the
fractional credit Σ_k cnt_k/k folds over the bounded distinct-k frame in
k-sorted order (the ``lm_kn`` fold idiom; DuckDB replays with
``list_reduce(list_sort(...))``). The ``last``/``first`` models are purely
exact integers + DECIMAL sums. Conversions with no in-window touch are
unattributed and reported on a separate ``(unattributed)`` row, so total
credit always equals total conversions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from preprocessor_spark.operators.hypotests import _dec_double

_DEC = "decimal(38,8)"


def attribute_conversions(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    id_col: str,
    value_col: str,
    conversion_type: str,
    touch_types: list[str],
    lookback_hours: int = 24,
    model: str = "linear",
) -> DataFrame:
    """Per-channel attributed conversions and value under ``model``.

    Returns one row per touch channel (plus ``(unattributed)`` for
    conversions with no in-window touch): channel, conversions (exact for
    last/first, fractional for linear, rounded 6), attributed_value
    (value-weighted credit, rounded 4), touches (contributing touch
    events). Total credit across rows equals the total conversion count.
    """
    if model not in ("last", "first", "linear"):
        raise ValueError(f"unknown attribution model: {model}")
    u, t = F.col(user_col), F.col(ts_col)
    convs = df.filter(F.col(type_col) == conversion_type).select(
        u.alias("user"),
        t.alias("conv_ts"),
        F.col(id_col).alias("conv_id"),
        F.col(value_col).cast("decimal(18,4)").alias("conv_value"),
    )
    touches = df.filter(F.col(type_col).isin(touch_types)).select(
        u.alias("user"),
        t.alias("touch_ts"),
        F.col(id_col).alias("touch_id"),
        F.col(type_col).alias("channel"),
    )
    window_pred = (F.col("touch_ts") <= F.col("conv_ts")) & (
        F.col("touch_ts")
        >= F.col("conv_ts") - F.expr(f"INTERVAL {int(lookback_hours)} HOURS")
    )
    pairs = touches.join(convs, "user").filter(window_pred)
    w_asc = Window.partitionBy("conv_id").orderBy("touch_ts", "touch_id")
    w_desc = Window.partitionBy("conv_id").orderBy(
        F.col("touch_ts").desc(), F.col("touch_id").desc()
    )
    ranked = pairs.select(
        "conv_id",
        "conv_value",
        "channel",
        F.row_number().over(w_asc).alias("rn_first"),
        F.row_number().over(w_desc).alias("rn_last"),
        F.count(F.lit(1)).over(Window.partitionBy("conv_id")).alias("n_touch"),
    )
    if model in ("last", "first"):
        pick = F.col("rn_last" if model == "last" else "rn_first") == 1
        per_channel = (
            ranked.filter(pick)
            .groupBy("channel")
            .agg(
                F.count(F.lit(1)).alias("conversions_raw"),
                F.sum(F.col("conv_value").cast(_DEC)).alias("value_raw"),
                F.count(F.lit(1)).alias("touches"),
            )
            .select(
                "channel",
                F.col("conversions_raw").cast("double").alias("conversions"),
                _dec_double(F.col("value_raw")).alias("value_d"),
                "touches",
            )
        )
    else:
        # exact cells per (channel, n): the only data-sized reduction
        cells = ranked.groupBy("channel", "n_touch").agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("conv_value").cast(_DEC)).alias("vsum"),
        )
        arr = F.sort_array(
            F.collect_list(
                F.struct(
                    F.col("n_touch").alias("k"),
                    F.col("cnt").alias("cnt"),
                    _dec_double(F.col("vsum")).alias("v"),
                )
            )
        )
        per_channel = cells.groupBy("channel").agg(
            F.aggregate(
                arr,
                F.lit(0.0),
                lambda acc, e: acc + e["cnt"].cast("double") / e["k"],
            ).alias("conversions"),
            F.aggregate(
                arr, F.lit(0.0), lambda acc, e: acc + e["v"] / e["k"]
            ).alias("value_d"),
            F.sum("cnt").alias("touches"),
        )
    # the unattributed remainder: conversions with zero in-window touches
    attributed_ids = pairs.select("conv_id").distinct()
    unattributed = (
        convs.join(
            attributed_ids.withColumnRenamed("conv_id", "conv_id"),
            "conv_id",
            "left_anti",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("conv_value").cast(_DEC)).alias("v"),
        )
        .select(
            F.lit("(unattributed)").alias("channel"),
            F.col("n").cast("double").alias("conversions"),
            F.coalesce(_dec_double(F.col("v")), F.lit(0.0)).alias("value_d"),
            F.lit(0).cast("long").alias("touches"),
        )
        .filter(F.col("conversions") > 0)
    )
    out = per_channel.unionByName(unattributed)
    return out.select(
        "channel",
        F.round(F.col("conversions"), 6).alias("conversions"),
        F.round(F.col("value_d"), 4).alias("attributed_value"),
        F.col("touches").cast("long").alias("touches"),
    ).orderBy("channel")
