"""RFM customer segmentation — recency / frequency / monetary quintile
scoring, the classic marketing-analytics primitive.

Per customer: recency = days since last order (relative to the dataset's
own horizon), frequency = order count, monetary = exact DECIMAL spend.
Each measure scores 1..n_bins against its exact interpolated percentile
thresholds; segments aggregate the (r, f, m) cube.

Scale shape: ONE customer groupBy (map-side combined) is the only
data-sized reduction; the as-of horizon is a 1-row broadcast (never a
global window over the customer frame); thresholds come from ONE exact
percentile aggregation over the customer frame and broadcast back as a
1-row cross join; the final segment cube is ≤ n_bins³ rows. Exact
percentile is kept for oracle-grade determinism (Spark ``percentile`` ≡
DuckDB ``quantile_cont``, the `seasonal_esd` equivalence); at extreme
customer cardinalities swap in the landmark sketch of
:mod:`preprocessor_spark.operators.sketches` — same trade documented
there.

Engine portability: counts and spend sums are exact; monetary converts
through the floor/frac split-cast; scores are integer comparisons against
the shared threshold arrays ('>' on ties, so a value equal to a threshold
takes the lower bin — deterministic); recency scores invert (most recent
= n_bins). VALUE-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from preprocessor_spark.operators.hypotests import _dec_double

_DEC = "decimal(38,8)"


def rfm_segments(
    df: DataFrame,
    customer_col: str,
    ts_col: str,
    value_col: str,
    n_bins: int = 5,
) -> DataFrame:
    """Segment counts and spend over the (r_score, f_score, m_score) cube.

    Returns one row per populated segment: r_score, f_score, m_score,
    customers, total_monetary (rounded 4), avg_monetary (rounded 6),
    ordered by the scores. Customers with null key/ts/value rows excluded
    from those rows' contributions.
    """
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    c, t = F.col(customer_col), F.col(ts_col)
    v = F.col(value_col).cast("decimal(18,4)")
    per_cust = (
        df.where(c.isNotNull() & t.isNotNull() & F.col(value_col).isNotNull())
        .groupBy(c.alias("cust"))
        .agg(
            F.max(t).alias("last_ts"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(v.cast(_DEC)).alias("monetary_dec"),
        )
    )
    horizon = per_cust.agg(F.max("last_ts").alias("as_of"))
    feats = per_cust.crossJoin(F.broadcast(horizon)).select(
        "cust",
        F.datediff(F.col("as_of"), F.col("last_ts")).cast("double").alias("recency"),
        F.col("frequency").cast("double").alias("frequency"),
        _dec_double(F.col("monetary_dec")).alias("monetary"),
        F.col("monetary_dec"),
    )
    qs = [i / n_bins for i in range(1, n_bins)]
    thresholds = feats.agg(
        F.percentile(F.col("recency"), F.array(*[F.lit(q) for q in qs])).alias("thr_r"),
        F.percentile(F.col("frequency"), F.array(*[F.lit(q) for q in qs])).alias(
            "thr_f"
        ),
        F.percentile(F.col("monetary"), F.array(*[F.lit(q) for q in qs])).alias(
            "thr_m"
        ),
    )

    def bin_of(col, arr):
        expr = F.lit(1)
        for i in range(1, n_bins):
            expr = expr + F.when(col > F.element_at(F.col(arr), i), 1).otherwise(0)
        return expr

    scored = feats.crossJoin(F.broadcast(thresholds)).select(
        "cust",
        "monetary_dec",
        # low recency is GOOD: invert the raw bin
        (F.lit(n_bins + 1) - bin_of(F.col("recency"), "thr_r")).alias("r_score"),
        bin_of(F.col("frequency"), "thr_f").alias("f_score"),
        bin_of(F.col("monetary"), "thr_m").alias("m_score"),
    )
    seg = scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count(F.lit(1)).alias("customers"),
        F.sum(F.col("monetary_dec")).alias("tot_dec"),
    )
    tot = _dec_double(F.col("tot_dec"))
    return seg.select(
        "r_score",
        "f_score",
        "m_score",
        "customers",
        F.round(tot, 4).alias("total_monetary"),
        F.round(tot / F.col("customers"), 6).alias("avg_monetary"),
    ).orderBy("r_score", "f_score", "m_score")
