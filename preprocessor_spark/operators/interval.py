"""Bin-bucketed interval join: point-in-range joins as keyed equi-joins.

A naive ``p.ts BETWEEN i.start AND i.end`` join is a theta join — Spark
plans it as BroadcastNestedLoopJoin (small side) or a cartesian product,
both of which die at scale. The standard fix (used by every
range-join-optimizing engine; Databricks' range-join hints and Flink's
interval join do the same internally) is BINNING:

1. every point lands in exactly ONE fixed-width time bin;
2. every interval explodes to the bins it overlaps (``sequence`` — its
   length is interval_length/bin + 1, bounded by a fail-fast guard);
3. join on (join keys ..., bin) — a plain hash-partitioned equi-join —
   and re-check the exact range predicate.

Because a point's single bin is always among its matching interval's
covering bins, and an interval emits each covered bin once, the equi-join
produces every qualifying (point, interval) pair EXACTLY once — no
post-join dedup needed, which keeps the operator a pure
shuffle-join-filter pipeline.

Bin width is the tuning knob: ~the median interval length keeps the
explode factor ~2 while maximizing bin selectivity. The ``max_bins``
guard refuses (assert_true, loud) intervals that would fan out
pathologically instead of silently flooding the shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bin_of(us: Column, width_us: int) -> Column:
    # exact floor-division for non-negative epochs: strip the remainder,
    # then the division is integral and small enough to be double-exact
    return ((us - F.pmod(us, F.lit(width_us))) / F.lit(width_us)).cast(
        "bigint"
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    on: list[str] | None = None,
    bin_seconds: float = 600.0,
    max_bins: int = 1_000,
) -> DataFrame:
    """Join each point row to every interval row whose
    ``[start_col, end_col]`` (inclusive both ends) contains ``point_ts``,
    matching additionally on the equi-columns ``on``.

    Returns all columns of ``points`` plus all columns of ``intervals``
    (the ``on`` columns once). Column names must not collide otherwise.
    """
    on = list(on or [])
    width_us = int(bin_seconds * 1_000_000)
    if width_us <= 0:
        raise ValueError("bin_seconds must be positive")

    p_us = F.unix_micros(F.col(point_ts).cast("timestamp"))
    p = points.withColumn("__bin", _bin_of(p_us, width_us))

    s_us = F.unix_micros(F.col(start_col).cast("timestamp"))
    e_us = F.unix_micros(F.col(end_col).cast("timestamp"))
    lo = _bin_of(s_us, width_us)
    hi = _bin_of(e_us, width_us)
    guard = F.assert_true(
        hi - lo < F.lit(max_bins),
        F.concat(
            F.lit(
                f"interval_join: an interval spans >= {max_bins} bins of "
                f"{bin_seconds}s — raise bin_seconds or max_bins"
            )
        ),
    )
    i = intervals.withColumn(
        "__bin",
        F.explode(F.when(guard.isNull(), F.sequence(lo, hi))),
    )

    joined = p.join(i, on + ["__bin"]).filter(
        (F.col(point_ts) >= F.col(start_col))
        & (F.col(point_ts) <= F.col(end_col))
    )
    return joined.drop("__bin")
