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


# ---------------------------------------------------------------------------
# mergeable quantile sketches (equi-depth landmark histograms)
# ---------------------------------------------------------------------------
#
# Same storage pattern as the HLL tables, for quantiles: keep one small
# (count, k equi-spaced quantile landmarks) row per fine group; answer any
# coarse-granularity percentile from the sketch table by a weighted merge of
# landmark sets — the raw data is never re-scanned. Landmark merge treats
# each landmark as count/k points (the equi-depth interpretation used by
# t-digest-style mergeable summaries); merge error stays bounded by the
# landmark spacing, verified against direct percentiles in tests.


def quantile_sketches(
    df: DataFrame, keys: list[str | Column], value_col: str, k: int = 64
) -> DataFrame:
    """Per-group quantile sketch: row count + ``k`` equi-spaced landmarks
    from ``percentile_approx`` (Greenwald-Khanna under the hood, one keyed
    shuffle, JVM-side)."""
    probs = F.array(*[F.lit(i / (k - 1)) for i in range(k)])
    return df.groupBy(*keys).agg(
        F.count(value_col).alias("q_n"),
        F.percentile_approx(value_col, probs, F.lit(10_000)).alias("q_landmarks"),
    )


def quantile_rollup(
    sketches: DataFrame,
    keys: list[str],
    probs: tuple[float, ...] = (0.5, 0.9, 0.99),
    n_col: str = "q_n",
    landmarks_col: str = "q_landmarks",
) -> DataFrame:
    """Merge fine sketches to ``keys`` granularity and evaluate ``probs``.

    Pure JVM expressions: explode each landmark with weight n/k, shuffle
    only the (tiny) sketch rows, sort the pooled landmarks per group, and
    read off weighted-rank quantiles with an array scan. No Python, no
    re-scan of raw data."""
    w = (F.col(n_col).cast("double") / F.size(F.col(landmarks_col))).alias("__w")
    pooled = (
        sketches.select(*keys, w, F.explode(F.col(landmarks_col)).alias("__v"))
        .groupBy(*keys)
        .agg(
            F.sum("__w").alias("__total"),
            F.sort_array(
                F.collect_list(F.struct(F.col("__v"), F.col("__w")))
            ).alias("__lm"),
        )
    )
    # cumulative weights via a running aggregate over the sorted struct array
    cum = F.aggregate(
        F.col("__lm"),
        F.struct(
            F.lit(0.0).alias("acc"),
            F.array().cast("array<struct<v:double,c:double>>").alias("out"),
        ),
        lambda s, x: F.struct(
            (s["acc"] + x["__w"]).alias("acc"),
            F.concat(
                s["out"],
                F.array(
                    F.struct(
                        x["__v"].cast("double").alias("v"),
                        (s["acc"] + x["__w"]).alias("c"),
                    )
                ),
            ).alias("out"),
        ),
        lambda s: s["out"],
    )
    out = pooled.withColumn("__cum", cum)
    for p in probs:
        target = F.col("__total") * F.lit(p)
        # first landmark whose cumulative weight reaches the target rank
        hit = F.filter(F.col("__cum"), lambda e: e["c"] >= target)
        first = F.when(F.size(hit) > 0, hit[0]["v"]).otherwise(
            F.element_at(F.col("__cum"), -1)["v"]
        )
        out = out.withColumn(f"p{int(p * 100)}", first)
    return out.select(
        *keys,
        F.col("__total").cast("bigint").alias("n"),
        *[f"p{int(p * 100)}" for p in probs],
    )


def quantile_distinct_rollup(
    df: DataFrame,
    fine_keys: list[str | Column],
    coarse_keys: list[str],
    value_col: str,
    k: int = 64,
    probs: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Fine quantile sketches → coarse percentile estimates in one call."""
    return quantile_rollup(
        quantile_sketches(df, fine_keys, value_col, k), coarse_keys, probs
    )


def heavy_hitters(
    df: DataFrame,
    value_col: str,
    k: int = 20,
    capacity: int | None = None,
) -> DataFrame:
    """Approximate top-k frequent items via per-partition Misra–Gries
    summaries (SpaceSaving family) merged on the driver.

    Each partition keeps at most ``capacity`` (default 10·k) counters in an
    Arrow-batched pass — the classic streaming guarantee transfers to the
    merged summary: for every item, ``est ≤ true ≤ est + err`` where the
    per-item ``err`` column bounds the undercount (sum of decrement rounds
    it was exposed to). Any item with true frequency > N/capacity is
    GUARANTEED present. One `mapInPandas` scan, |partitions|·capacity rows
    collected — the raw table never shuffles at all.

    Exact top-k is a groupBy away; this exists for the 100 TB regime where
    the groupBy's shuffle (|distinct values| rows) is the cost being
    avoided and a bounded-error answer suffices (trending queries,
    skew-key discovery before a salted join).
    """
    import pandas as pd

    cap = capacity or 10 * k
    if cap < k:
        raise ValueError("capacity must be >= k")

    def _partials(batches):
        counters: dict = {}
        decrements = 0
        pid = -1
        for pdf in batches:
            if len(pdf):
                pid = int(pdf["__pid"].iloc[0])
            for v in pdf[value_col]:
                if v is None:
                    continue
                if v in counters:
                    counters[v] += 1
                elif len(counters) < cap:
                    counters[v] = 1
                else:
                    # decrement-all round: every tracked count drops by 1
                    decrements += 1
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        yield pd.DataFrame(
            {
                "pid": [pid] * len(counters),
                "item": list(counters),
                "est": list(counters.values()),
                "err": [decrements] * len(counters),
            }
        )

    item_type = dict(df.dtypes)[value_col]
    partials = df.select(
        F.col(value_col), F.spark_partition_id().alias("__pid")
    ).mapInPandas(_partials, f"pid int, item {item_type}, est long, err long")
    from preprocessor_spark.caching import register_persisted

    # persisted: the summary feeds both the merge and the error total;
    # lifetime is caller-managed via persist_scope (LRU fallback otherwise)
    partials = register_persisted(partials.persist())
    # merge: estimates add. Error bound per item: in a partition where the
    # item IS tracked, true − est ≤ that partition's decrement count; where
    # it is ABSENT its true count there is ≤ that partition's decrement
    # count too — so est ≤ true ≤ est + Σ_all partition errs. One scalar
    # bound, broadcast onto every row.
    merged = partials.groupBy("item").agg(F.sum("est").alias("est"))
    total_err = (
        partials.select("pid", "err")
        .distinct()
        .agg(F.sum("err").alias("err"))
    )
    out = (
        merged.join(F.broadcast(total_err))
        .orderBy(F.desc("est"), F.asc("item"))
        .limit(k)
        .select("item", "est", "err")
    )
    return out


def cms_build(
    df: DataFrame,
    value_col: str,
    width: int = 2048,
    depth: int = 4,
    count_col: str | None = None,
) -> DataFrame:
    """Count-min sketch as a ``(row, col, cnt)`` table — the mergeable
    frequency twin of the HLL distinct sketch above.

    Each value lands in ``depth`` cells, one per hash row, at
    ``xxhash64(value, seed=row) % width``. The groupBy combines map-side,
    so no matter the input size at most ``width * depth`` rows shuffle
    (8k cells at the defaults). Merging two sketches = union + re-sum on
    (row, col); estimates NEVER undercount (est >= true always), and
    overcount by <= e*N/width with probability 1 - e^-depth — store tiny
    per-(shard, day) sketch tables and answer "how often did this term
    appear all-time" without re-scanning raw text.

    ``count_col`` weights rows (pre-aggregated (value, count) input).
    """
    weight = (
        F.lit(1).cast("long") if count_col is None else F.col(count_col).cast("long")
    )
    stacked = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("row"),
                        F.pmod(F.xxhash64(F.col(value_col), F.lit(j)), F.lit(width)).alias("col"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("rc"),
        weight.alias("__w"),
    )
    return (
        stacked.select("rc.row", "rc.col", "__w")
        .groupBy("row", "col")
        .agg(F.sum("__w").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    queries: DataFrame,
    value_col: str,
    width: int = 2048,
    depth: int = 4,
) -> DataFrame:
    """Point-estimate frequencies for every row of ``queries``: join each
    of the ``depth`` cell positions against the broadcast sketch (at most
    width*depth rows) and take the min. An absent cell means nothing ever
    hashed there -> that row's count is 0. Map-side only."""
    out = queries.select(
        value_col,
        *[
            F.pmod(F.xxhash64(F.col(value_col), F.lit(j)), F.lit(width)).alias(f"__c{j}")
            for j in range(depth)
        ],
    )
    for j in range(depth):
        out = out.join(
            F.broadcast(
                sketch.where(F.col("row") == j).select(
                    F.col("col").alias(f"__c{j}"), F.col("cnt").alias(f"__n{j}")
                )
            ),
            on=f"__c{j}",
            how="left",
        )
    est = F.least(*[F.coalesce(F.col(f"__n{j}"), F.lit(0)) for j in range(depth)])
    return out.select(value_col, est.alias("est"))
