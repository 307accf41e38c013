"""Mergeable distinct-count sketches (HyperLogLog) — the 100 TB
pre-aggregation pattern.

At scale you never re-scan raw data to answer "distinct users last month":
you keep small per-(dimension, day) HLL sketches and UNION them — sketch
merge is associative/commutative, so coarse rollups (month, all-time, any
dimension subset) come from the sketch table, not the events table. Spark
3.5+ ships Apache DataSketches HLL natively (`hll_sketch_agg` /
`hll_union_agg` / `hll_sketch_estimate`), all JVM-side aggregates.

Shapes:
- ``hll_sketches``  — fine-grained sketch table (one keyed shuffle over
  raw data; output is tiny: one ≤2^lg_k-byte sketch per group).
- ``hll_rollup``    — coarse estimates by sketch union (shuffles only the
  sketch table).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hll_sketches(
    df: DataFrame, keys: list[str | Column], value_col: str, lg_k: int = 12
) -> DataFrame:
    """Per-group HLL sketch of ``value_col`` (relative error ≈ 1.04/√2^lg_k,
    ~1.6% at the default lg_k=12; each sketch ≤ 2^lg_k bytes)."""
    return df.groupBy(*keys).agg(F.hll_sketch_agg(value_col, F.lit(lg_k)).alias("hll"))


def hll_rollup(
    sketches: DataFrame, keys: list[str], sketch_col: str = "hll"
) -> DataFrame:
    """Union fine sketches up to ``keys`` granularity and estimate. The
    raw data is never touched — this is the query that makes per-day
    sketch tables worth storing."""
    return (
        sketches.groupBy(*keys)
        .agg(F.hll_union_agg(sketch_col).alias("hll"))
        .withColumn("approx_distinct", F.hll_sketch_estimate("hll"))
        .drop("hll")
    )


def distinct_rollup(
    df: DataFrame,
    fine_keys: list[str | Column],
    coarse_keys: list[str],
    value_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """Fine sketches → coarse estimates in one call (see module doc)."""
    return hll_rollup(hll_sketches(df, fine_keys, value_col, lg_k), coarse_keys)
