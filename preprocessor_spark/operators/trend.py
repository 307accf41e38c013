"""Per-key robust trend detection: Mann-Kendall test + Theil-Sen slope.

The monitoring question a 100 TB metrics pipeline asks constantly — "is
this series drifting, robustly?" — answered by the two classical
distribution-free estimators (Mann 1945 / Kendall 1975; Theil 1950 / Sen
1968): the Mann-Kendall S statistic is the count of concordant minus
discordant time-ordered pairs (monotone-trend evidence immune to
outliers), and the Theil-Sen slope is the median of all pairwise slopes
(50 % breakdown point, vs OLS's zero).

Scale shape: the series is bounded to the last ``last_k`` observations
per key (the `ewma_last` discipline — a trend monitor wants the recent
window anyway), so the pairwise expansion is ≤ k(k−1)/2 rows per key from
ONE keyed self-join; everything after is exact integer arithmetic
(S, tie counts, the variance formula's integer numerator) plus a handful
of deterministic IEEE ops (one sqrt, two divisions, the median midpoint
average) — so the whole operator is VALUE-oracle-able: DuckDB replays the
identical pair set and expression tree bit-for-bit.

Outputs per key: n_used, s_stat (exact int), var_s (the tie-corrected
variance [n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)]/18), z (the continuity-
corrected normal score), theil_sen_slope (median of pairwise
Δvalue/Δorder slopes), and kendall_tau_b (S over the tie-corrected pair
count — the rank-correlation twin of operators/rankstats.py's Spearman).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def mann_kendall(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    last_k: int = 50,
    materialize: bool = True,
) -> DataFrame:
    """Per-key Mann-Kendall trend report over the last ``last_k``
    observations in ``order_col`` order. See module docstring.

    ``materialize=False`` returns the fully lazy plan (no persist, no
    checkpoint) — for plan inspection/tests; production callers keep the
    default so the twice-referenced pair frame computes once.

    The materialized path scope-disables cached-plan AQE re-planning for
    the WHOLE build (``persist()`` compiles the cached fragment's physical
    plan at registration time, so the scope must start before the first
    persist): the cached tail/pair frames are small in BYTES but the pair
    self-join and its consumers are k²-row-expanding, so the session-wide
    byte-based cache coalescing would run them nearly serially (paired
    A/B at sf0.1: 2.6–3.8 s with re-planning on vs 1.3 s off)."""
    if materialize:
        from preprocessor_spark.caching import cached_plan_replanning_disabled

        with cached_plan_replanning_disabled(df.sparkSession):
            return _mann_kendall_build(
                df, key_col, order_col, value_col, last_k, materialize=True
            )
    return _mann_kendall_build(
        df, key_col, order_col, value_col, last_k, materialize=False
    )


def _mann_kendall_build(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    last_k: int,
    materialize: bool,
) -> DataFrame:
    tail = (
        df.select(
            F.col(key_col).alias("key"),
            F.col(order_col).alias("pos"),
            F.col(value_col).cast("double").alias("x"),
        )
        .where(F.col(value_col).isNotNull() & F.col(order_col).isNotNull())
        .withColumn(
            # Secondary sort on the value makes the retained last_k window
            # deterministic when order_col has duplicates per key (rows with
            # identical (pos, x) are interchangeable for S and the slopes,
            # so this fully pins the outputs).
            "rd",
            F.row_number().over(
                Window.partitionBy("key").orderBy(
                    F.col("pos").desc(), F.col("x").desc()
                )
            ),
        )
        .where(F.col("rd") <= last_k)
        .drop("rd")
    )
    if materialize:
        tail = tail.persist()
    try:
        a = tail.alias("a")
        b = tail.alias("b")
        pairs = a.join(
            b,
            (F.col("a.key") == F.col("b.key"))
            & (F.col("a.pos") < F.col("b.pos")),
        ).select(
            F.col("a.key").alias("key"),
            F.col("a.pos").alias("pa"),
            F.col("b.pos").alias("pb"),
            F.col("a.x").alias("xa"),
            F.col("b.x").alias("xb"),
        )
        sgn = F.when(F.col("xb") > F.col("xa"), F.lit(1)).when(
            F.col("xb") < F.col("xa"), F.lit(-1)
        ).otherwise(F.lit(0))
        slope = (F.col("xb") - F.col("xa")) / (
            F.col("pb").cast("double") - F.col("pa").cast("double")
        )
        pairs = pairs.select("key", sgn.alias("sgn"), slope.alias("slope"))
        if materialize:
            pairs = pairs.persist()

        s_by_key = pairs.groupBy("key").agg(
            F.sum("sgn").cast("long").alias("s_stat"),
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum(F.when(F.col("sgn") == 0, 1).otherwise(0))
            .cast("long")
            .alias("tied_pairs"),
        )

        # tie groups of x per key (for the variance correction):
        # sum over groups of t(t-1)(2t+5), exact integers
        ties = (
            tail.groupBy("key", "x")
            .agg(F.count(F.lit(1)).cast("long").alias("t"))
            .groupBy("key")
            .agg(
                F.sum(
                    F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
                )
                .cast("long")
                .alias("tie_term"),
                F.count(F.lit(1)).cast("long").alias("n_distinct"),
            )
        )
        counts = tail.groupBy("key").agg(
            F.count(F.lit(1)).cast("long").alias("n_used")
        )

        # Theil-Sen: exact median of sorted slopes — lower+upper middle
        # averaged with the SAME (lo + hi)/2.0 expression the oracle uses
        w = Window.partitionBy("key").orderBy("slope")
        ranked = pairs.withColumn("rn", F.row_number().over(w)).withColumn(
            "cnt", F.count(F.lit(1)).over(Window.partitionBy("key"))
        )
        med = (
            ranked.where(
                (F.col("rn") == F.floor((F.col("cnt") + 1) / 2))
                | (F.col("rn") == F.floor(F.col("cnt") / 2) + 1)
            )
            .groupBy("key")
            .agg(
                ((F.min("slope") + F.max("slope")) / F.lit(2.0)).alias(
                    "theil_sen_slope"
                )
            )
        )

        n = F.col("n_used").cast("double")
        var_s = (
            n * (n - F.lit(1.0)) * (F.lit(2.0) * n + F.lit(5.0))
            - F.col("tie_term").cast("double")
        ) / F.lit(18.0)
        s = F.col("s_stat").cast("double")
        z = (
            F.when(F.col("s_stat") > 0, (s - F.lit(1.0)) / F.sqrt(var_s))
            .when(F.col("s_stat") < 0, (s + F.lit(1.0)) / F.sqrt(var_s))
            .otherwise(F.lit(0.0))
        )
        # tau-b: S / sqrt((P - T_x)(P - T_t)); order values are distinct
        # by construction (row positions), so the time-side tie term is 0
        p_pairs = F.col("n_pairs").cast("double")
        tau_b = s / F.sqrt(
            (p_pairs - F.col("tied_pairs").cast("double")) * p_pairs
        )
        out = (
            counts.join(s_by_key, "key")
            .join(ties, "key")
            .join(med, "key", "left")
            .where(F.col("n_used") >= 2)
            .select(
                "key",
                "n_used",
                "s_stat",
                var_s.alias("var_s"),
                F.when(var_s > 0, z).otherwise(F.lit(0.0)).alias("z"),
                F.when(
                    (p_pairs > F.col("tied_pairs").cast("double")), tau_b
                ).alias("kendall_tau_b"),
                "theil_sen_slope",
            )
        )
        # materialize before unpersisting the inputs the plan references
        # (still under the caller's replanning-disabled scope)
        if materialize:
            out = out.localCheckpoint(eager=True)
    finally:
        if materialize:
            tail.unpersist()
            try:
                pairs.unpersist()
            except Exception:
                pass
    return out
