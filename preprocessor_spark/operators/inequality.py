"""Distributional-inequality measures — per-group Gini coefficient and
Lorenz concentration shares in ONE keyed exchange.

The Gini coefficient over a sorted sample x_(1) ≤ … ≤ x_(n) is

    G = Σ_i (2i − n − 1) · x_(i)  /  (n · Σ_i x_i)

(the relative-mean-absolute-difference identity). Everything before the
final division is exact integer/DECIMAL arithmetic: the rank weight
(2i − n − 1) is an int64, x quantizes to DECIMAL(18,4) with the repo's
overflow certificate, and the weighted sum accumulates in DECIMAL(38,8) —
so the coefficient is ONE deterministic IEEE division at the end and the
whole report is value-oracle-able (ties are permutation-invariant in the
formula: equal x contribute the same regardless of rank order).

Scale shape: one keyed Exchange on the group column feeds both windows
(row_number and the unbounded n/total — same partitioning, Spark plans a
single shuffle), then a groupBy(group) reduces the weighted and
conditional Lorenz sums map-side. No SinglePartition anywhere; the output
is |groups| rows.

The reference library has no inequality statistics (its numeric coverage
stops at fit-time moments, clearbox_preprocessor/preprocessor.py:266) —
this extends the analytics tier the way rfm/gains_table did.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from preprocessor_spark.operators.hypotests import _dec_double

_DEC = "decimal(38,8)"
_OVERFLOW_MSG = (
    "gini_by_group: input magnitude >= 1e14 overflows the DECIMAL(18,4) "
    "quantization cast to NULL under non-ANSI Spark; pre-scale the column"
)


def gini_by_group(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Per-group Gini coefficient + Lorenz shares.

    Returns one row per group: group, n, total (exact sum, double),
    gini, bottom50_share (share of the total held by the n DIV 2
    smallest values), top10_share (share held by the n DIV 10 largest).
    Null values drop; groups with n == 1 report gini 0. Negative values
    are accepted (the identity still evaluates) but the coefficient is
    only a concentration measure for non-negative data — filter first if
    that is the contract.
    """
    g = F.col(group_col)
    xd = F.col(value_col).cast("decimal(18,4)")
    base = df.where(g.isNotNull() & F.col(value_col).isNotNull()).select(
        g.alias("group"), xd.alias("xd")
    )
    wo = Window.partitionBy("group").orderBy("xd")
    wa = Window.partitionBy("group")
    staged = base.select(
        "group",
        "xd",
        F.row_number().over(wo).alias("rn"),
        F.count(F.lit(1)).over(wa).alias("n_all"),
    )
    # rank weight (2i - n - 1) is int64-exact; the product quantizes back
    # into DECIMAL(38,8) so the group sum is order-independent
    wgt = (
        (F.lit(2) * F.col("rn") - F.col("n_all") - F.lit(1)).cast("decimal(20,0)")
        * F.col("xd")
    ).cast(_DEC)
    half = ((F.col("n_all") - F.col("n_all") % 2) / 2).cast("long")
    tenth = ((F.col("n_all") - F.col("n_all") % 10) / 10).cast("long")
    cells = staged.select(
        "group",
        "xd",
        wgt.alias("w"),
        (F.col("rn") <= half).alias("in_b50"),
        (F.col("rn") > F.col("n_all") - tenth).alias("in_t10"),
    )
    agg = cells.groupBy("group").agg(
        F.count("xd").alias("n"),
        F.count(F.lit(1)).alias("n_raw"),
        F.sum(F.col("xd").cast(_DEC)).alias("sx"),
        F.sum("w").alias("num"),
        F.sum(F.when(F.col("in_b50"), F.col("xd").cast(_DEC))).alias("sb50"),
        F.sum(F.when(F.col("in_t10"), F.col("xd").cast(_DEC))).alias("st10"),
    )
    n_ok = F.coalesce(
        F.assert_true(F.col("n") == F.col("n_raw"), F.lit(_OVERFLOW_MSG)).cast(
            "long"
        ),
        F.col("n"),
    )
    nd = n_ok.cast("double")
    sx = _dec_double(F.col("sx"))
    gini = _dec_double(F.col("num")) / (nd * sx)
    return agg.select(
        "group",
        F.col("n"),
        F.round(sx, 6).alias("total"),
        F.round(F.when(F.col("n") > 1, gini).otherwise(F.lit(0.0)), 6).alias("gini"),
        F.round(
            F.coalesce(_dec_double(F.col("sb50")), F.lit(0.0)) / sx, 6
        ).alias("bottom50_share"),
        F.round(
            F.coalesce(_dec_double(F.col("st10")), F.lit(0.0)) / sx, 6
        ).alias("top10_share"),
    ).orderBy("group")


def theil_atkinson_by_group(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Per-group Theil T, mean-log-deviation (Theil L) and Atkinson(ε=1)
    inequality indices — the decomposable complements of :func:`gini_by_group`
    (Theil indices are additively decomposable between/within subgroups;
    Gini is not — Shorrocks 1980).

        T    = (1/n) Σ (x/μ)·ln(x/μ)
        L    = ln μ − (1/n) Σ ln x          (mean log deviation)
        A(1) = 1 − exp((1/n) Σ ln x) / μ    (geometric/arithmetic mean gap)

    Exact-replay shape: μ comes from the exact DECIMAL(18,4) group sum
    (one deterministic division), every per-row term is then a
    fixed-order IEEE expression on identical doubles, and the two
    order-dependent row sums (Σ t_i and Σ ln x_i) quantize to the int64
    1e12 grid BEFORE summing (DECIMAL(38,0) against overflow) — the
    DuckDB oracle replays term-for-term. Rows with value ≤ 0 are dropped
    (logs undefined); n counts the kept rows.

    Scale shape: one keyed exchange for the mean, one broadcast join
    back, one map-side-combinable groupBy. |groups| output rows.
    """
    g = F.col(group_col)
    base = df.where(
        g.isNotNull() & F.col(value_col).isNotNull() & (F.col(value_col) > 0)
    ).select(g.alias("group"), F.col(value_col).cast("double").alias("x"))
    means = base.groupBy("group").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast("decimal(18,4)").cast(_DEC)).alias("sx"),
    )
    mu = (_dec_double(F.col("sx")) / F.col("n").cast("double")).alias("mu")
    joined = base.join(F.broadcast(means.select("group", mu)), "group")
    ratio = F.col("x") / F.col("mu")
    t_term = ratio * F.log(ratio)
    q = lambda c: F.floor(c * F.lit(1.0e12) + F.lit(0.5)).cast("decimal(38,0)")
    cells = joined.select(
        "group",
        q(t_term).alias("qt"),
        q(F.log(F.col("x"))).alias("ql"),
    )
    agg = (
        cells.groupBy("group")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("qt").alias("sqt"),
            F.sum("ql").alias("sql_"),
        )
        .join(F.broadcast(means.select("group", mu)), "group")
    )
    nd = F.col("n").cast("double")
    theil_t = F.col("sqt").cast("double") / F.lit(1.0e12) / nd
    mean_ln = F.col("sql_").cast("double") / F.lit(1.0e12) / nd
    theil_l = F.log(F.col("mu")) - mean_ln
    atkinson = F.lit(1.0) - F.exp(mean_ln) / F.col("mu")
    return agg.select(
        "group",
        "n",
        F.round(F.col("mu"), 6).alias("mean"),
        F.round(theil_t, 6).alias("theil_t"),
        F.round(theil_l, 6).alias("theil_l"),
        F.round(atkinson, 6).alias("atkinson_1"),
    ).orderBy("group")
