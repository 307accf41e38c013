"""Distributed two-sample hypothesis tests — exact-moment passes, no SciPy.

The A/B-measurement surface of an analytics engine (reference counterpart:
the preprocessor's fit-statistics pass, `/root/reference/clearbox_preprocessor/
preprocessor.py` computes per-column moments the same single-pass way):

- :func:`welch_ttest` — Welch's unequal-variance t with the
  Welch–Satterthwaite degrees of freedom, from ONE map-side-combinable
  aggregation of exact DECIMAL moments (n, Σx, Σx²) per group.
- :func:`chi2_independence` — Pearson chi-square test of independence of
  two categorical columns (+ Cramér's V), from ONE keyed (a, b) count
  aggregation; margins derive from the tiny cell frame.
- :func:`mann_whitney_u` — the rank-sum test with exact integer rank
  arithmetic (2·R kept integral so ties need no float averaging) and the
  standard tie-corrected normal approximation.

Engine-portability contract (what makes these value-oracle-able): every
data-sized reduction is an EXACT sum — DECIMAL for moments, int64/DECIMAL(38)
for counts, rank sums and tie terms — so any SQL engine reproduces the same
numbers bit-for-bit; the final statistic is then one deterministic IEEE
double expression over those exact scalars. Where a float SUM over many
terms is unavoidable (chi-square's per-cell terms), the terms are folded in
sorted order over a bounded cell list (the `lm_kn` sorted-left-fold idiom),
which DuckDB replays with ``list_reduce(list_sort(...))``.

Scale shape: Welch and chi-square are single groupBy passes (map-side
combine, output = |groups| / |A|·|B| cells). Mann-Whitney collapses both
samples to per-distinct-value counts with one groupBy, then computes the
rank cumsum with the two-pass range-partitioned carry of
:func:`preprocessor_spark.operators.drift.ks_report` — no
``Exchange SinglePartition`` on data-sized frames anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_DEC = "decimal(38,8)"


_WELCH_OVERFLOW_MSG = (
    "welch_ttest: input magnitude >= 1e14 overflows the DECIMAL(18,4) moment "
    "cast to NULL under non-ANSI Spark; pre-scale the value column"
)


def _moments(df: DataFrame, value_col: str, flag: Column) -> list[Column]:
    """n, n_raw, Σx, Σx² for rows where ``flag`` — exact DECIMAL accumulators.

    ``n_raw`` counts non-null values BEFORE the DECIMAL(18,4) cast; under
    non-ANSI Spark a |x| >= 1e14 value overflows that cast to NULL and
    silently vanishes from n/Σx/Σx², so n < n_raw is the overflow
    certificate (same guard as :func:`linreg.ridge_fit`)."""
    x = F.when(flag, F.col(value_col).cast("decimal(18,4)"))
    return [
        F.count(x),
        F.count(F.when(flag, F.col(value_col))),
        F.sum(x.cast(_DEC)),
        F.sum((x * x).cast(_DEC)),
    ]


def welch_ttest(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a,
    group_b,
) -> DataFrame:
    """Welch's t-test of mean(``value_col`` | group_a) vs group_b.

    ONE aggregation computes both groups' exact moments (map-side combined;
    rows outside the two groups are filtered at the scan). Returns a 1-row
    frame: n/mean/var per group, ``t_stat`` and Welch–Satterthwaite ``df``
    — every column a deterministic double over exact DECIMAL sums. The
    normal-approximation p-value is left to the caller (erf is not part of
    the portable-SQL contract). Values with |x| >= 1e14 would overflow the
    DECIMAL(18,4) moment cast; a runtime certificate (pre-cast vs post-cast
    counts, same as ``linreg.ridge_fit``) raises instead of silently
    dropping them.
    """
    g = F.col(group_col)
    row = (
        df.filter(g.isin([group_a, group_b]) & F.col(value_col).isNotNull())
        .agg(
            *[
                m.alias(n)
                for m, n in zip(
                    _moments(df, value_col, g == F.lit(group_a))
                    + _moments(df, value_col, g == F.lit(group_b)),
                    ["na", "na_raw", "sa", "qa", "nb", "nb_raw", "sb", "qb"],
                )
            ]
        )
    )
    # overflow certificate: raises at runtime if any DECIMAL(18,4) cast
    # overflowed to NULL (n < n_raw); passes → NULL → coalesce yields n
    na = F.coalesce(
        F.assert_true(
            (F.col("na") == F.col("na_raw")) & (F.col("nb") == F.col("nb_raw")),
            F.lit(_WELCH_OVERFLOW_MSG),
        ).cast("long"),
        F.col("na"),
    )
    sa, qa = F.col("sa").cast("double"), F.col("qa").cast("double")
    nb, sb, qb = F.col("nb"), F.col("sb").cast("double"), F.col("qb").cast("double")
    ma, mb = sa / na, sb / nb
    va = (qa - sa * sa / na) / (na - 1)
    vb = (qb - sb * sb / nb) / (nb - 1)
    sea, seb = va / na, vb / nb
    t = (ma - mb) / F.sqrt(sea + seb)
    dof = (sea + seb) * (sea + seb) / (
        sea * sea / (na - 1) + seb * seb / (nb - 1)
    )
    return row.select(
        na.alias("n_a"),
        nb.alias("n_b"),
        F.round(ma, 6).alias("mean_a"),
        F.round(mb, 6).alias("mean_b"),
        F.round(va, 6).alias("var_a"),
        F.round(vb, 6).alias("var_b"),
        F.round(t, 6).alias("t_stat"),
        F.round(dof, 6).alias("welch_df"),
    )


def chi2_independence(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Pearson chi-square independence test of two categorical columns.

    ONE keyed groupBy(a, b) collapses the table to the observed cells (the
    only data-sized pass); margins and the statistic derive from that tiny
    cell frame. Uses the algebraic identity Σ_allcells (o−e)²/e =
    Σ_observed o²/e − N (zero cells contribute 0 to the left term), so
    (a, b) combinations absent from the data are correctly accounted
    without materializing the full cross product. Per-cell terms are
    doubles over exact int64 counts, summed in sorted order (bounded fold
    — callers own the low-cardinality contract, e.g. shipmode×returnflag
    = 21 cells). Returns 1 row: n, cells (observed), dof, chi2, Cramér's V.
    """
    cells = (
        df.filter(F.col(col_a).isNotNull() & F.col(col_b).isNotNull())
        .groupBy(col_a, col_b)
        .agg(F.count(F.lit(1)).alias("o"))
    )
    # margin windows run over the post-agg cell frame (|A|·|B| rows — the
    # unpartitioned total is a bounded single task by the cardinality
    # contract in the docstring, not a data-sized SinglePartition)
    wa = F.sum("o").over(Window.partitionBy(col_a))
    wb = F.sum("o").over(Window.partitionBy(col_b))
    wn = F.sum("o").over(Window.partitionBy())
    per = cells.select(
        F.col(col_a),
        F.col(col_b),
        F.col("o"),
        wa.alias("ra"),
        wb.alias("cb"),
        wn.alias("n"),
    )
    e = F.col("ra").cast("double") * F.col("cb") / F.col("n")
    term = F.col("o") * F.col("o") / e
    agg = per.agg(
        F.max("n").alias("n"),
        F.count(F.lit(1)).alias("cells"),
        F.countDistinct(col_a).alias("ka"),
        F.countDistinct(col_b).alias("kb"),
        F.aggregate(
            F.sort_array(F.collect_list(term)), F.lit(0.0), lambda acc, x: acc + x
        ).alias("sum_o2e"),
    )
    chi2 = F.col("sum_o2e") - F.col("n")
    v = F.sqrt(chi2 / (F.col("n") * F.least(F.col("ka") - 1, F.col("kb") - 1)))
    return agg.select(
        "n",
        "cells",
        ((F.col("ka") - 1) * (F.col("kb") - 1)).alias("dof"),
        F.round(chi2, 6).alias("chi2"),
        F.round(v, 6).alias("cramers_v"),
    )


def mann_whitney_u(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a,
    group_b,
    num_partitions: int | None = None,
) -> DataFrame:
    """Mann-Whitney U (rank-sum) test, exact integer rank arithmetic.

    Both samples collapse to per-distinct-value (cnt_a, cnt_b) counts with
    ONE groupBy; the sum of group-a ranks is then

        2·R_a = Σ_v cnt_a(v) · (2·cum_below(v) + cnt(v) + 1)

    kept integral (midranks need no float averaging at ×2 scale), with the
    cumulative count computed by the same two-pass range-partitioned carry
    as :func:`~preprocessor_spark.operators.drift.ks_report` — no
    single-partition window over the distinct-value frame. The tie term
    Σ(t³−t) accumulates in DECIMAL(38) (t³ overflows int64 on mega-tie
    columns). Returns 1 row: n_a, n_b, u_a, u_b, z (tie-corrected normal
    approximation, NULL when every value ties).
    """
    from preprocessor_spark.caching import register_persisted

    spark = df.sparkSession
    n_part = num_partitions or spark.sparkContext.defaultParallelism
    g, v = F.col(group_col), F.col(value_col)
    counts = (
        df.filter(g.isin([group_a, group_b]) & v.isNotNull())
        .groupBy(v.alias("value"))
        .agg(
            F.sum(F.when(g == group_a, 1).otherwise(0)).alias("cnt_a"),
            F.sum(F.when(g == group_b, 1).otherwise(0)).alias("cnt_b"),
        )
    )
    ranged = register_persisted(
        counts.repartitionByRange(n_part, F.col("value"))
        .withColumn("__pid", F.spark_partition_id())
        .persist()
    )
    psums = (
        ranged.groupBy("__pid").agg((F.sum("cnt_a") + F.sum("cnt_b")).alias("t")).collect()
    )
    by_pid = {r["__pid"]: r["t"] for r in psums}
    carry, off = {}, 0
    for pid in sorted(by_pid):
        carry[pid] = off
        off += by_pid[pid]
    carry_expr = F.element_at(
        F.create_map(*[F.lit(x) for kv in sorted(carry.items()) for x in kv]),
        F.col("__pid"),
    )
    w = (
        Window.partitionBy("__pid")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    t = (F.col("cnt_a") + F.col("cnt_b")).cast("long")
    cum_below = F.coalesce(F.sum(t).over(w), F.lit(0)) + carry_expr
    per = ranged.select(
        F.col("cnt_a").cast("long").alias("ca"),
        t.alias("t"),
        cum_below.alias("below"),
    )
    agg = per.agg(
        F.sum("ca").alias("n_a"),
        (F.sum("t") - F.sum("ca")).alias("n_b"),
        F.sum(F.col("ca") * (2 * F.col("below") + F.col("t") + 1)).alias("two_ra"),
        F.sum(
            (
                F.col("t").cast("decimal(38,0)") * F.col("t") * F.col("t")
                - F.col("t")
            ).cast("decimal(38,0)")
        ).alias("tie_term"),
    )
    na, nb = F.col("n_a"), F.col("n_b")
    n = na + nb
    two_u_a = F.col("two_ra") - na * (na + 1)
    mu2 = na * nb  # 2·mean of U
    tie = F.col("tie_term").cast("double")
    var_u = (
        na.cast("double") * nb / 12.0
        * ((n + 1).cast("double") - tie / (n.cast("double") * (n - 1)))
    )
    z = (two_u_a.cast("double") - mu2.cast("double")) / (2.0 * F.sqrt(var_u))
    return agg.select(
        na.alias("n_a"),
        nb.alias("n_b"),
        (two_u_a.cast("double") / 2.0).alias("u_a"),
        ((mu2 * 2 - two_u_a).cast("double") / 2.0).alias("u_b"),
        F.round(F.when(var_u > 0, z), 6).alias("z"),
    )


def mutual_information(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Mutual information I(A;B) of two categorical columns, in nats, plus
    the sqrt-normalized NMI = I/sqrt(H(A)·H(B)) (scikit-learn's
    ``normalized_mutual_info_score`` with the geometric average).

    Same engine shape and portability contract as
    :func:`chi2_independence`: ONE keyed groupBy collapses the table to
    observed cells; margins and entropies derive from the bounded cell
    frame. Absent (a, b) combinations contribute 0 to every sum (0·ln 0 =
    0), so no cross product materializes. Per-cell/per-margin terms are
    deterministic doubles over exact int64 counts, folded in sorted order
    (callers own the low-cardinality contract). Returns 1 row: n, cells,
    mi, h_a, h_b, nmi.
    """
    cells = (
        df.filter(F.col(col_a).isNotNull() & F.col(col_b).isNotNull())
        .groupBy(col_a, col_b)
        .agg(F.count(F.lit(1)).alias("o"))
    )
    wa = F.sum("o").over(Window.partitionBy(col_a))
    wb = F.sum("o").over(Window.partitionBy(col_b))
    wn = F.sum("o").over(Window.partitionBy())
    per = cells.select(
        F.col(col_a).alias("a"),
        F.col(col_b).alias("b"),
        F.col("o"),
        wa.alias("ra"),
        wb.alias("cb"),
        wn.alias("n"),
    )
    o = F.col("o").cast("double")
    n = F.col("n").cast("double")
    # I = Σ (o/n) ln(o n / (ra cb)); margin entropies from per-cell terms
    # weighted 1/margin-count occurrences would double-count, so H(A) =
    # -Σ_cells (o/n) ln(ra/n) works because Σ_{cells in row a} o = ra.
    mi_term = (o / n) * F.log(o * n / (F.col("ra").cast("double") * F.col("cb")))
    ha_term = -(o / n) * F.log(F.col("ra") / n)
    hb_term = -(o / n) * F.log(F.col("cb") / n)

    def _fold(c):
        return F.aggregate(
            F.sort_array(F.collect_list(c)), F.lit(0.0), lambda acc, x: acc + x
        )

    agg = per.agg(
        F.max("n").alias("n"),
        F.count(F.lit(1)).alias("cells"),
        _fold(mi_term).alias("mi_raw"),
        _fold(ha_term).alias("h_a_raw"),
        _fold(hb_term).alias("h_b_raw"),
    )
    mi, ha, hb = F.col("mi_raw"), F.col("h_a_raw"), F.col("h_b_raw")
    return agg.select(
        "n",
        "cells",
        F.round(mi, 6).alias("mi"),
        F.round(ha, 6).alias("h_a"),
        F.round(hb, 6).alias("h_b"),
        F.round(
            F.when((ha > 0) & (hb > 0), mi / F.sqrt(ha * hb)), 6
        ).alias("nmi"),
    )
