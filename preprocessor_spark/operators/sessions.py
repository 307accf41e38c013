"""Gap-based sessionization of event streams (batch formulation).

Splits each key's event sequence into sessions wherever the gap between
consecutive events exceeds ``gap``. The classic two-window formulation:

1. ``lag(ts)`` over (key, ts-ordered) marks session starts
   (gap > threshold, or first event);
2. a running sum of the start flags numbers the sessions per key.

Both are O(n) running frames over ONE shuffle keyed by the session key —
the partition count scales with key cardinality, never a global window.
The streaming twin is ``session_window`` in
:mod:`preprocessor_spark.streaming` (SURVEY §2 row 74); this batch operator
gives the same grouping for historical backfills, where event-time order is
already settled and no watermark is needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _epoch_sec(col: Column) -> Column:
    """Timestamp of any flavor → float epoch seconds.

    TIMESTAMP_NTZ (what Spark 4 infers for parquet micros with
    isAdjustedToUTC=false) cannot cast straight to DOUBLE; routing through
    TIMESTAMP first is legal for NTZ, LTZ, and DATE alike."""
    return col.cast("timestamp").cast("double")


def sessionize(
    df: DataFrame,
    ts_col: str,
    key_cols: list[str],
    gap_seconds: float,
    session_col: str = "session_seq",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Append ``session_col``: 1-based session sequence number per key.

    ``tiebreak_col`` stabilizes ordering when ``ts_col`` has duplicates
    within a key (equal timestamps always share a session either way — the
    gap between them is 0 — but a unique order keeps lag deterministic)."""
    order: list[Column] = [F.col(ts_col).asc()]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(*key_cols).orderBy(*order)
    prev_ts = F.lag(F.col(ts_col)).over(w)
    gap = _epoch_sec(F.col(ts_col)) - _epoch_sec(prev_ts)
    is_start = F.when(prev_ts.isNull() | (gap > F.lit(float(gap_seconds))), 1).otherwise(0)
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    return df.withColumn(session_col, F.sum(is_start).over(run))


def session_stats(
    df: DataFrame,
    ts_col: str,
    key_cols: list[str],
    gap_seconds: float,
    agg_cols: dict[str, Column] | None = None,
) -> DataFrame:
    """One row per (key, session): event count, start/end timestamps,
    duration in seconds, plus any caller aggregates. One window shuffle +
    one partial-agg groupBy on the same key prefix."""
    s = sessionize(df, ts_col, key_cols, gap_seconds)
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        (F.max(_epoch_sec(F.col(ts_col))) - F.min(_epoch_sec(F.col(ts_col)))).alias(
            "duration_sec"
        ),
    ]
    for name, expr in (agg_cols or {}).items():
        aggs.append(expr.alias(name))
    return s.groupBy(*key_cols, "session_seq").agg(*aggs)
