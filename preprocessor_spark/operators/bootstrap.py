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

Engine-portable derandomization: w_ib is a pure function of sha256(id ∥
block) — each 256-bit digest yields sixteen 16-bit buckets (one per
replicate in the block; Spark ``sha2(·, 256)`` ≡ DuckDB ``sha256``),
inverted through the Poisson(1) CDF ladder with INLINED integer
thresholds (identical constants in the SQL twin), weights capped at 5
(P ≈ 6e-4 truncated — identical in both engines, so the estimate is
deterministic AND value-oracle-able). The digest array projects once per
row (codegen), the replicate INDEX explodes, the bucket materializes as
its own column (the 5-branch ladder would otherwise re-evaluate the
slice per branch — measured 4× the extraction cost), and ONE
groupBy(group, replicate) reduces exact DECIMAL weighted sums — partial
aggregation collapses the ×B explosion before any shuffle, so the
exchange carries |groups|·B rows regardless of data size. CI bounds are
exact order statistics over the B-row bounded replicate frame.
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
    the B replicate means). ``replicates`` must be a multiple of 8; one
    sha256 digest feeds up to 16 replicates.
    """
    if replicates % 8 != 0 or replicates <= 0:
        raise ValueError(f"replicates must be a positive multiple of 8, got {replicates}")
    n_blocks = -(-replicates // 16)
    g = F.col(group_col)
    x = F.col(value_col).cast("decimal(18,4)")
    base = df.where(
        g.isNotNull() & F.col(value_col).isNotNull() & F.col(id_col).isNotNull()
    ).select(
        g.alias("group"),
        x.alias("xd"),
        F.col(id_col).cast("string").alias("id"),
    )
    # Five shapes were measured at sf0.1 before landing on this one:
    # (a) B unrolled weight expressions blow the 64 KB JVM method limit —
    # janino refuses, whole-stage codegen falls back to interpreted (58 s);
    # (b) a higher-order transform evaluates its lambda INTERPRETED per
    # element (15 s — and inlining the digest array into the lambda
    # re-runs every digest per element, 131 s); (c) exploding the index
    # but ladder-ing the inline slice re-evaluates it per CASE branch
    # (12 s); (d) explode the replicate index, bucket as a column, ladder
    # the column — all codegen (10.0 s committed through round 9).
    # (e — round 10, this one): explode only the BLOCK index (B/16 rows
    # per input row): each exploded row carries one digest and 16 ladder
    # weights as COLUMNS (w0..w15 — few enough expressions to stay under
    # the janino limit that killed (a)), and the groupBy(group, blk)
    # reduces 32 partial sums, so the ×B row expansion of (d) never
    # exists — the pre-shuffle frame is rows×B/16 and the replicate-level
    # B rows materialize only AFTER aggregation, on the |groups|·B/16
    # frame. Same arithmetic, 16× less row machinery: 10.0 → ~4 s.
    blk = F.col("blk")
    digest = F.sha2(F.concat(F.col("id"), F.lit("|"), blk.cast("string")), 256)
    # pre-repartition the slim (group, xd, id) frame: a single-file input
    # scans as one partition and would serialize the digest+ladder stage
    # onto one core (the round-8 AQE/scan-coalescing trap); the exchange
    # carries 3 narrow columns, the stage it feeds does 16 sha2+ladders
    # per row
    n_shuffle = int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    base = base.repartition(n_shuffle)
    per_block = base.select(
        "group",
        "xd",
        F.explode(F.sequence(F.lit(0), F.lit(n_blocks - 1))).alias("blk"),
        F.col("id"),
    ).select("group", "xd", "blk", digest.alias("__dg"))

    def _bucket(i):
        return F.conv(F.substr(F.col("__dg"), F.lit(i * 4 + 1), F.lit(4)), 16, 10).cast(
            "int"
        )

    # buckets materialize as their own projection so the 5-branch ladder
    # references a cheap column — inlining the conv(substr(...)) would
    # re-evaluate it per CASE branch (measured shape (c), 5x the
    # extraction cost; CollapseProject keeps multi-referenced non-cheap
    # aliases in their own stage)
    buckets = per_block.select(
        "group",
        "xd",
        "blk",
        *[_bucket(i).alias(f"bk{i}") for i in range(16)],
    )
    weighted = buckets.select(
        "group",
        "xd",
        "blk",
        *[poisson_weight_expr(F.col(f"bk{i}")).alias(f"w{i}") for i in range(16)],
    )
    block_cells = weighted.groupBy("group", "blk").agg(
        *[F.sum(f"w{i}").alias(f"nw{i}") for i in range(16)],
        *[
            F.sum((F.col(f"w{i}") * F.col("xd")).cast(_DEC)).alias(f"sw{i}")
            for i in range(16)
        ],
    )
    # replicate rows exist only now, on the |groups|·n_blocks frame;
    # b = blk*16 + i, truncated to the requested replicate count
    rep_structs = F.array(
        *[
            F.struct(
                (blk * 16 + F.lit(i)).alias("b"),
                F.col(f"nw{i}").alias("nw"),
                F.col(f"sw{i}").alias("sw"),
            )
            for i in range(16)
        ]
    )
    cells = (
        block_cells.select("group", F.explode(rep_structs).alias("r"))
        .select("group", "r.b", "r.nw", "r.sw")
        .where(F.col("b") < replicates)
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
