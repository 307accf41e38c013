"""Skew mitigation: salted joins and two-stage (salted) aggregation.

AQE's skew-join split (`spark.sql.adaptive.skewJoin`, on in session.py)
repairs sort-merge joins at runtime, but two hot-key cases remain on the
engine to solve:

- a HASH aggregation whose per-key state is large (collect_set /
  collect_list / percentile buffers): one hot key pins one task with an
  unbounded buffer — partial aggregation bounds rows shuffled but not the
  final task's state;
- a shuffle JOIN that AQE can't re-plan (e.g. the skewed side feeds other
  operators that pin the partitioning, or adaptive execution is off).

Salting dilutes a hot key across S sub-buckets: the big/skewed side gets a
deterministic row-local salt in [0, S), the small side is exploded S× (a
bounded replication), and the key becomes (key, salt). For aggregation the
same trick runs the heavy partial state per (key, salt) and a cheap final
merge per key — the classic two-stage formulation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def _row_salt(buckets: int) -> Column:
    # row-local, partition-deterministic (stable under task retry for a
    # fixed partition layout); any assignment is CORRECT — the salt only
    # spreads rows of one key across sub-buckets
    return F.pmod(F.abs(F.hash(F.monotonically_increasing_id())), F.lit(buckets))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``big`` has skewed join keys and ``small`` is too
    large to broadcast but cheap to replicate ``salt_buckets``×.

    Output equals ``big.join(small, on, how)`` for row-preserving join
    types (inner / left / left_semi / left_anti from ``big``'s side)."""
    salted_big = big.withColumn(_SALT, _row_salt(salt_buckets))
    salted_small = small.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    out = salted_big.join(salted_small, on + [_SALT], how)
    return out.drop(_SALT)


def two_stage_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple],
    salt_buckets: int = 16,
) -> DataFrame:
    """groupBy(keys) with hot-key-safe two-stage execution.

    ``aggs`` maps output column → (fn, col) with fn in
    {count, sum, min, max, collect_set}; ``count`` takes no column. Stage 1
    aggregates per (keys, salt) — the expensive state is bounded per
    sub-bucket; stage 2 merges per key with the algebraic combiner
    (sum→sum, count→sum, min→min, max→max,
    collect_set→array_distinct(flatten)).
    """
    partial = []
    final = []
    for name, spec in aggs.items():
        fn = spec[0]
        col = F.col(spec[1]) if len(spec) > 1 else None
        p = f"__p_{name}"
        if fn == "count":
            partial.append(F.count(F.lit(1)).alias(p))
            final.append(F.sum(p).alias(name))
        elif fn == "sum":
            partial.append(F.sum(col).alias(p))
            final.append(F.sum(p).alias(name))
        elif fn == "min":
            partial.append(F.min(col).alias(p))
            final.append(F.min(p).alias(name))
        elif fn == "max":
            partial.append(F.max(col).alias(p))
            final.append(F.max(p).alias(name))
        elif fn == "collect_set":
            partial.append(F.collect_set(col).alias(p))
            final.append(
                F.array_distinct(F.flatten(F.collect_list(p))).alias(name)
            )
        else:
            raise ValueError(f"Unsupported aggregate: {fn}")
    stage1 = df.withColumn(_SALT, _row_salt(salt_buckets)).groupBy(
        *keys, _SALT
    ).agg(*partial)
    return stage1.groupBy(*keys).agg(*final)


def skew_report(
    df: DataFrame,
    key_cols: list[str],
    top: int = 10,
) -> DataFrame:
    """Join/aggregation-key skew diagnosis — the measurement step that
    decides whether :func:`salted_join` / :func:`two_stage_agg` (or AQE's
    skew-join) is needed, and how many salt buckets to use.

    Returns one row per top-``top`` heaviest key: the composite key
    rendered as a string, its row count, share of all rows, the ratio to
    the MEAN per-key count (the skew factor — a key at ratio r serializes
    ~r partitions' worth of work through one task), the exact p50/p99
    per-key counts for context, and ``suggested_salt`` = ceil(count /
    mean) capped at 256 (enough buckets to bring the key down to average
    load). All counts exact BIGINT; shares/ratios single IEEE divisions —
    VALUE-oracle-able.

    Scale shape: one map-side-combined groupBy(keys); everything after
    runs on the |distinct keys| frame (percentiles via the exact
    ``percentile`` aggregate, top-k via TakeOrderedAndProject).
    """
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    if top < 1:
        raise ValueError(f"top must be >= 1, got {top}")
    counts = (
        df.where(F.struct(*key_cols).isNotNull())
        .groupBy(*[F.col(k).cast("string").alias(k) for k in key_cols])
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    stats = counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("cnt").alias("n_rows"),
        F.expr("percentile(cnt, 0.5)").alias("p50"),
        F.expr("percentile(cnt, 0.99)").alias("p99"),
    )
    key_str = F.concat_ws("|", *key_cols)
    joined = counts.crossJoin(F.broadcast(stats))
    mean = F.col("n_rows").cast("double") / F.col("n_keys").cast("double")
    ratio = F.col("cnt").cast("double") / mean
    return (
        joined.select(
            key_str.alias("key"),
            F.col("cnt").alias("n"),
            F.col("n_keys"),
            F.col("n_rows"),
            F.round(F.col("cnt").cast("double") / F.col("n_rows").cast("double"), 6).alias(
                "share"
            ),
            F.round(ratio, 6).alias("skew_factor"),
            F.round(F.col("p50"), 6).alias("p50_key_rows"),
            F.round(F.col("p99"), 6).alias("p99_key_rows"),
            F.least(F.ceil(ratio).cast("int"), F.lit(256)).alias("suggested_salt"),
        )
        .orderBy(F.desc("n"), F.asc("key"))
        .limit(top)
    )
