"""One-pass Poisson-bootstrap confidence intervals — resampling at scale
without resampling.

The classic bootstrap draws B resamples WITH replacement — impossible to
do literally on distributed data (a resample is a global multinomial).
The Poisson bootstrap (Hanley & MacGibbon 2006; Chamandy et al., Google
2012, "Estimating uncertainty for massive data streams") replaces the
multinomial with independent Poisson(1) row weights: replicate b counts
row i ``w_ib ~ Poisson(1)`` times, and Σ_i w_ib·x_i / Σ_i w_ib converges
to the same bootstrap distribution. Each replicate is then just an exact
WEIGHTED SUM — embarrassingly map-side combinable.

Engine-portable derandomization: w_ib is a pure function of md5(id ∥
block) — each 128-bit digest yields eight 16-bit buckets (one per
replicate in the block), inverted through the Poisson(1) CDF ladder with
INLINED integer thresholds (identical constants in the SQL twin), weights
capped at 5 (P ≈ 6e-4 truncated — identical in both engines, so the
estimate is deterministic AND value-oracle-able). Weights build as one
JVM-codegen array per row (8 md5s for 64 replicates), posexplode into
(replicate, weight), and ONE groupBy(group, replicate) reduces exact
DECIMAL weighted sums — partial aggregation collapses the ×B explosion
before any shuffle, so the exchange carries |groups|·B rows regardless of
data size. CI bounds are exact order statistics over the B-row bounded
replicate frame.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from preprocessor_spark.operators.hypotests import _dec_double

_DEC = "decimal(38,8)"

# Poisson(1) CDF ladder over 16-bit buckets: weight k for bucket in
# [T_{k-1}, T_k); T_k = round(F(k)·65536), capped at 5. These exact
# integers are the cross-engine contract — the SQL twin inlines the same.
POISSON_T = []
_cdf = 0.0
for _k in range(5):
    _cdf += math.exp(-1.0) / math.factorial(_k)
    POISSON_T.append(round(_cdf * 65536))


def poisson_weight_expr(bucket):
    """Weight expression for a 16-bit bucket column via the inlined ladder."""
    w = F.lit(5)
    for k in range(4, -1, -1):
        w = F.when(bucket < POISSON_T[k], k).otherwise(w)
    return w


def bootstrap_mean_ci(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    replicates: int = 64,
    alpha: float = 0.05,
) -> DataFrame:
    """Per-group percentile-bootstrap CI for the mean of ``value_col``.

    Returns one row per group: group, n, mean (exact-moment point
    estimate), se_boot (std of replicate means, sorted-fold), ci_lo,
    ci_hi (exact order statistics at ranks ⌊α/2·B⌋+1 and B−⌊α/2·B⌋ of
    the B replicate means). ``replicates`` must be a multiple of 8 (one
    md5 digest feeds 8 replicates).
    """
    if replicates % 8 != 0 or replicates <= 0:
        raise ValueError(f"replicates must be a positive multiple of 8, got {replicates}")
    n_blocks = replicates // 8
    g = F.col(group_col)
    x = F.col(value_col).cast("decimal(18,4)")
    base = df.where(
        g.isNotNull() & F.col(value_col).isNotNull() & F.col(id_col).isNotNull()
    ).select(
        g.alias("group"),
        x.alias("xd"),
        F.col(id_col).cast("string").alias("id"),
    )
    # one digest ARRAY + one higher-order transform: unrolling all B
    # bucket/ladder expressions inline blows the 64 KB JVM method limit
    # (janino refuses, whole-stage codegen falls back to interpreted);
    # the lambda body compiles ONCE and evaluates per element instead.
    digests = F.array(
        *[F.md5(F.concat(F.col("id"), F.lit(f"|{blk}"))) for blk in range(n_blocks)]
    )
    weights = F.transform(
        F.sequence(F.lit(0), F.lit(replicates - 1)),
        lambda b: poisson_weight_expr(
            F.conv(
                F.substr(
                    F.element_at(digests, ((b - b % 8) / 8).cast("int") + 1),
                    (b % 8) * 4 + 1,
                    F.lit(4),
                ),
                16,
                10,
            ).cast("int")
        ),
    )
    exploded = base.select(
        "group", "xd", F.posexplode(weights).alias("b", "w")
    )
    cells = exploded.groupBy("group", "b").agg(
        F.sum("w").alias("nw"),
        F.sum((F.col("w") * F.col("xd")).cast(_DEC)).alias("sw"),
    )
    rep_mean = F.when(
        F.col("nw") > 0, _dec_double(F.col("sw")) / F.col("nw").cast("double")
    )
    reps = cells.select("group", rep_mean.alias("m"))
    w_rank = Window.partitionBy("group").orderBy("m")
    b_f = float(replicates)
    k_lo = int(math.floor(alpha / 2.0 * replicates)) + 1
    k_hi = replicates - int(math.floor(alpha / 2.0 * replicates))
    ranked = reps.where(F.col("m").isNotNull()).select(
        "group", "m", F.row_number().over(w_rank).alias("rn")
    )
    ci = ranked.groupBy("group").agg(
        F.max(F.when(F.col("rn") == k_lo, F.col("m"))).alias("lo"),
        F.max(F.when(F.col("rn") == k_hi, F.col("m"))).alias("hi"),
        F.aggregate(
            F.sort_array(F.collect_list("m")), F.lit(0.0), lambda a, v: a + v
        ).alias("msum"),
        F.aggregate(
            F.sort_array(F.collect_list(F.col("m") * F.col("m"))),
            F.lit(0.0),
            lambda a, v: a + v,
        ).alias("m2sum"),
        F.count(F.lit(1)).alias("b_eff"),
    )
    point = base.groupBy("group").agg(
        F.count("xd").alias("n"), F.sum(F.col("xd").cast(_DEC)).alias("s")
    )
    joined = point.join(ci, "group")
    bm = F.col("msum") / F.col("b_eff")
    var_b = (F.col("m2sum") - F.col("msum") * bm) / (F.col("b_eff") - 1)
    return joined.select(
        "group",
        "n",
        F.round(_dec_double(F.col("s")) / F.col("n").cast("double"), 6).alias("mean"),
        F.round(F.sqrt(var_b), 6).alias("se_boot"),
        F.round(F.col("lo"), 6).alias("ci_lo"),
        F.round(F.col("hi"), 6).alias("ci_hi"),
    ).orderBy("group")
