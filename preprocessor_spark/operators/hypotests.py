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


def _dec_double(c: Column) -> Column:
    """DECIMAL → DOUBLE with the floor/frac split, engine-portable at any
    magnitude. A direct cast of a decimal whose unscaled representation
    exceeds 2^53 is rounded differently by different engines (DuckDB
    scales the integer in float; Java BigDecimal rounds the exact value).
    Integer→double and (<1)-fraction→double conversions are correctly
    rounded everywhere, and the final IEEE add is deterministic, so
    ``floor(c) + (c − floor(c))`` yields bit-identical doubles in any
    engine (DuckDB twin: same expression)."""
    f = F.floor(c)
    return f.cast("double") + (c - f).cast("double")


def _normal_sf(z_abs: Column) -> Column:
    """Upper-tail P(Z > z), z >= 0 — Zelen & Severo (Abramowitz & Stegun
    26.2.17) polynomial, |error| < 7.5e-8. A closed-form double expression
    (exp/sqrt/Horner multiplies only), so any SQL engine replays it; callers
    round the resulting p-values, absorbing last-ulp libm differences the
    same way the mutual-information fold absorbs ``log``."""
    t = 1.0 / (1.0 + 0.2316419 * z_abs)
    poly = t * (
        0.319381530
        + t
        * (
            -0.356563782
            + t * (1.781477937 + t * (-1.821255978 + t * 1.330274429))
        )
    )
    pdf = F.exp(-(z_abs * z_abs) / 2.0) / 2.5066282746310002
    return pdf * poly


def anova_oneway(df: DataFrame, value_col: str, group_col: str) -> DataFrame:
    """One-way ANOVA (fixed-effects F) of ``value_col`` across the levels
    of ``group_col``.

    ONE map-side-combinable groupBy computes each level's exact DECIMAL
    moments (n, Σx, Σx²) with the same DECIMAL(18,4)-cast overflow
    certificate as :func:`welch_ttest`; the sums of squares derive from
    the bounded per-group frame via the identities

        SSB = Σ_g s_g²/n_g − S²/N      SSW = Q − Σ_g s_g²/n_g

    where S, Q, N are exact grand totals (windows over the |groups| frame
    — callers own the low-cardinality contract). The only float SUM over
    multiple terms (Σ s_g²/n_g) folds in sorted order (the ``lm_kn``
    idiom), so the F statistic is engine-portable. Returns 1 row: n, k,
    df_between, df_within, f_stat, eta_sq. The
    F-distribution p-value needs the incomplete beta and is left to the
    caller (same contract as welch_ttest's missing erf).
    """
    g = F.col(group_col)
    cells = (
        df.filter(g.isNotNull() & F.col(value_col).isNotNull())
        .groupBy(g.alias("grp"))
        .agg(
            *[
                m.alias(n)
                for m, n in zip(
                    _moments(df, value_col, F.lit(True)),
                    ["n", "n_raw", "s", "q"],
                )
            ]
        )
    )
    wt = Window.partitionBy()
    sd = _dec_double(F.col("s"))
    term = sd * sd / F.col("n")
    agg = cells.select(
        F.col("n"),
        F.col("n_raw"),
        term.alias("term"),
        F.sum("n").over(wt).alias("nn"),
        F.sum("n_raw").over(wt).alias("nn_raw"),
        F.sum("s").over(wt).alias("ss"),
        F.sum("q").over(wt).alias("qq"),
    ).agg(
        F.max("nn").alias("n_total"),
        F.max("nn_raw").alias("n_raw"),
        F.count(F.lit(1)).alias("k"),
        F.max(_dec_double(F.col("ss"))).alias("s_tot"),
        F.max(_dec_double(F.col("qq"))).alias("q_tot"),
        F.aggregate(
            F.sort_array(F.collect_list("term")), F.lit(0.0), lambda a, x: a + x
        ).alias("sum_term"),
    )
    n = F.coalesce(
        F.assert_true(
            F.col("n_total") == F.col("n_raw"), F.lit(_WELCH_OVERFLOW_MSG)
        ).cast("long"),
        F.col("n_total"),
    ).cast("double")
    k = F.col("k").cast("double")
    ssb = F.col("sum_term") - F.col("s_tot") * F.col("s_tot") / n
    ssw = F.col("q_tot") - F.col("sum_term")
    f_stat = (ssb / (k - 1)) / (ssw / (n - k))
    # the raw sums of squares are NOT reported: their magnitude exceeds
    # the double ulp at which a 4-decimal ROUND is meaningful, and
    # sub-ulp rounding is the one operation engines disagree on. The
    # scale-free F and eta² carry the full inference content.
    return agg.select(
        F.col("n_total").alias("n"),
        F.col("k"),
        (k - 1).cast("long").alias("df_between"),
        (n - k).cast("long").alias("df_within"),
        F.round(f_stat, 6).alias("f_stat"),
        F.round(ssb / (ssb + ssw), 6).alias("eta_sq"),
    )


def group_ztests_fdr(
    df: DataFrame, value_col: str, group_col: str, alpha: float = 0.05
) -> DataFrame:
    """Per-level two-sided z-tests of mean(level) vs mean(complement) with
    Benjamini–Hochberg FDR control across the family.

    ONE groupBy computes exact per-level moments (welch-style overflow
    certificate); each level's complement moments are grand totals minus
    the level's own (windows over the bounded |groups| frame). The
    large-sample z uses the Welch standard error; the two-sided p-value is
    the Zelen–Severo normal polynomial (:func:`_normal_sf` — closed-form,
    engine-portable). BH runs entirely on the |groups| frame: rank p
    ascending (ties broken by group for determinism), adjusted
    p_(i) = min_{j ≥ i} p_(j)·k/j via a reverse running min, clamped to 1.
    Returns one row per level: group, n, mean, z, p_value, p_adj, reject.
    """
    g = F.col(group_col)
    cells = (
        df.filter(g.isNotNull() & F.col(value_col).isNotNull())
        .groupBy(g.alias("grp"))
        .agg(
            *[
                m.alias(n)
                for m, n in zip(
                    _moments(df, value_col, F.lit(True)),
                    ["n", "n_raw", "s", "q"],
                )
            ]
        )
    )
    wt = Window.partitionBy()
    per = cells.select(
        "grp",
        "n",
        "n_raw",
        _dec_double(F.col("s")).alias("s"),
        _dec_double(F.col("q")).alias("q"),
        F.sum("n").over(wt).alias("nn"),
        F.sum("n_raw").over(wt).alias("nn_raw"),
        _dec_double(F.sum("s").over(wt)).alias("ss"),
        _dec_double(F.sum("q").over(wt)).alias("qq"),
        F.count(F.lit(1)).over(wt).alias("k"),
    )
    n_g = F.coalesce(
        F.assert_true(
            F.col("nn") == F.col("nn_raw"), F.lit(_WELCH_OVERFLOW_MSG)
        ).cast("long"),
        F.col("n"),
    ).cast("double")
    n_c = (F.col("nn") - F.col("n")).cast("double")
    m_g = F.col("s") / n_g
    m_c = (F.col("ss") - F.col("s")) / n_c
    v_g = (F.col("q") - F.col("s") * F.col("s") / n_g) / (n_g - 1)
    v_c = (F.col("qq") - F.col("q") - (F.col("ss") - F.col("s")) * (F.col("ss") - F.col("s")) / n_c) / (n_c - 1)
    z = (m_g - m_c) / F.sqrt(v_g / n_g + v_c / n_c)
    p = F.least(F.lit(1.0), 2.0 * _normal_sf(F.abs(z)))
    scored = per.select(
        "grp",
        "n",
        F.col("k"),
        F.round(m_g, 6).alias("mean"),
        F.round(z, 6).alias("z"),
        F.round(p, 10).alias("p_value"),
    )
    # BH on the bounded |groups| frame: ascending-p rank, reverse running
    # min of p*k/rank (deterministic tie-break by group)
    w_rank = Window.orderBy("p_value", "grp")
    w_rev = Window.orderBy(F.col("p_value").desc(), F.col("grp").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ranked = scored.withColumn("rank", F.row_number().over(w_rank))
    raw_adj = F.col("p_value") * F.col("k") / F.col("rank")
    adj = F.least(F.lit(1.0), F.min(raw_adj).over(w_rev))
    return ranked.select(
        F.col("grp").alias("group"),
        "n",
        "mean",
        "z",
        "p_value",
        F.round(adj, 10).alias("p_adj"),
        (adj <= F.lit(alpha)).alias("reject"),
    ).orderBy("group")


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


def cmh_test(
    df: DataFrame,
    stratum_col: str,
    exposure_col: str,
    outcome_col: str,
) -> DataFrame:
    """Cochran-Mantel-Haenszel test of exposure→outcome association
    ACROSS strata (Mantel & Haenszel 1959) — the confounder-adjusted 2×2
    test: "is the association real once we compare like with like?", plus
    the MH common odds-ratio estimate. ``exposure_col``/``outcome_col``
    must be boolean or 0/1; rows with any null are dropped, strata with
    n<2 are excluded (their hypergeometric variance is undefined).

        χ²_CMH = (Σ_k a_k − Σ_k E_k)² / Σ_k V_k      (uncorrected)
        E_k = r1_k·c1_k/n_k
        V_k = r1_k·r2_k·c1_k·c2_k / (n_k²·(n_k−1))
        OR_MH = Σ_k (a_k d_k/n_k) / Σ_k (b_k c_k/n_k)

    Exact-replay algebra: the only data-sized pass is ONE map-side-
    combinable groupBy(stratum) producing exact int64 cells (a,b,c,d);
    every per-stratum term is then a fixed-association IEEE expression on
    those integers, and the four order-dependent stratum sums (ΣE, ΣV,
    Σad/n, Σbc/n) quantize to the int64 1e12 grid BEFORE summing
    (DECIMAL(38,0) against overflow — the Theil/mutual-info idiom), so
    the DuckDB oracle replays term-for-term. The χ²(1) p-value is
    2·Φ̄(√χ²) via the replayable :func:`_normal_sf` polynomial.

    Scale shape: |strata| output cells; everything after the first
    groupBy lives on the bounded stratum frame. One row out.
    """
    s = F.col(stratum_col)
    e = F.col(exposure_col).cast("boolean")
    o = F.col(outcome_col).cast("boolean")
    flag = lambda c: F.when(c, 1).otherwise(0)
    cells = (
        df.where(s.isNotNull() & e.isNotNull() & o.isNotNull())
        .groupBy(s.alias("stratum"))
        .agg(
            F.sum(flag(e & o)).cast("long").alias("a"),
            F.sum(flag(e & ~o)).cast("long").alias("b"),
            F.sum(flag(~e & o)).cast("long").alias("c"),
            F.sum(flag(~e & ~o)).cast("long").alias("d"),
        )
        .where((F.col("a") + F.col("b") + F.col("c") + F.col("d")) >= 2)
    )
    ad, bd, cd, dd_ = (F.col(x).cast("double") for x in "abcd")
    nd = ad + bd + cd + dd_
    e_k = (ad + bd) * (ad + cd) / nd
    v_k = (
        (ad + bd) * (cd + dd_) * (ad + cd) * (bd + dd_)
        / (nd * nd * (nd - 1.0))
    )
    r_k = ad * dd_ / nd
    s_k = bd * cd / nd
    q = lambda c: F.floor(c * F.lit(1.0e12) + F.lit(0.5)).cast("decimal(38,0)")
    agg = cells.agg(
        F.count(F.lit(1)).alias("strata"),
        F.sum(
            (F.col("a") + F.col("b") + F.col("c") + F.col("d")).cast(
                "decimal(38,0)"
            )
        ).alias("n_total"),
        F.sum(F.col("a").cast("decimal(38,0)")).alias("sa"),
        F.sum(q(e_k)).alias("se"),
        F.sum(q(v_k)).alias("sv"),
        F.sum(q(r_k)).alias("sr"),
        F.sum(q(s_k)).alias("ss"),
    )
    sa = _dec_double(F.col("sa"))
    se = _dec_double(F.col("se")) / F.lit(1.0e12)
    sv = _dec_double(F.col("sv")) / F.lit(1.0e12)
    sr = _dec_double(F.col("sr")) / F.lit(1.0e12)
    ss = _dec_double(F.col("ss")) / F.lit(1.0e12)
    chi2 = (sa - se) * (sa - se) / sv
    return agg.select(
        F.col("strata").cast("int").alias("strata"),
        F.col("n_total").cast("long").alias("n"),
        F.col("sa").cast("long").alias("sum_a"),
        F.round(se, 6).alias("expected"),
        F.round(sv, 6).alias("variance"),
        F.round(F.when(sv > 0, chi2), 6).alias("cmh_chi2"),
        F.round(
            F.when(sv > 0, F.lit(2.0) * _normal_sf(F.sqrt(chi2))), 6
        ).alias("p_value"),
        F.round(F.when(ss > 0, sr / ss), 6).alias("or_mh"),
    )


def mcnemar_test(
    df: DataFrame,
    before_col: str,
    after_col: str,
) -> DataFrame:
    """McNemar's test for PAIRED binary outcomes (McNemar 1947) — one row
    per subject with a before/after (or condition-A/condition-B) flag
    pair; only the discordant counts b = #(1,0) and c = #(0,1) carry
    information about a marginal shift:

        χ²           = (b − c)² / (b + c)           (uncorrected)
        χ²_corrected = (|b − c| − 1)² / (b + c)     (Edwards continuity)
        OR           = b / c                         (matched-pairs odds)

    The A/B twin of :func:`cmh_test` for repeated measures on the SAME
    subjects (feature-launch before/after, model-A/model-B on identical
    prompts) where the two-sample z-test would ignore the pairing.

    Exact-replay algebra: ONE map-side-combinable aggregation to four
    exact int64 concordance cells; every statistic is a fixed IEEE
    expression on those integers; the χ²(1) p-value is 2·Φ̄(√χ²) via the
    replayable :func:`_normal_sf` polynomial. Rows with a null flag are
    dropped. Returns 1 row: (n, both, neither, b, c, chi2,
    chi2_corrected, p_value, odds_ratio).
    """
    pre = F.col(before_col).cast("boolean")
    post = F.col(after_col).cast("boolean")
    flag = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("long")
    agg = df.where(pre.isNotNull() & post.isNotNull()).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        flag(pre & post).alias("both"),
        flag(~pre & ~post).alias("neither"),
        flag(pre & ~post).alias("b"),
        flag(~pre & post).alias("c"),
    )
    bd, cd = F.col("b").cast("double"), F.col("c").cast("double")
    disc = bd + cd
    chi2 = (bd - cd) * (bd - cd) / disc
    chi2c = (
        (F.abs(bd - cd) - 1.0) * (F.abs(bd - cd) - 1.0) / disc
    )
    return agg.select(
        "n",
        "both",
        "neither",
        "b",
        "c",
        F.round(F.when(disc > 0, chi2), 6).alias("chi2"),
        F.round(
            F.when(disc > 0, F.when(F.abs(bd - cd) > 1.0, chi2c).otherwise(
                F.lit(0.0)
            )),
            6,
        ).alias("chi2_corrected"),
        F.round(
            F.when(disc > 0, F.lit(2.0) * _normal_sf(F.sqrt(chi2))), 6
        ).alias("p_value"),
        F.round(F.when(cd > 0, bd / cd), 6).alias("odds_ratio"),
    )


def effect_sizes(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a,
    group_b,
) -> DataFrame:
    """Standardized effect sizes for a two-group comparison — the "how
    big, in units a human can compare across metrics?" companion to
    :func:`welch_ttest`'s "is it real?":

        cohen_d     = (x̄_a − x̄_b) / s_pooled
        hedges_g    = d · (1 − 3/(4(n_a+n_b) − 9))     (small-sample bias)
        glass_delta = (x̄_a − x̄_b) / s_b               (b = control scale)
        cles        = Φ((x̄_a − x̄_b) / √(s_a² + s_b²)) (P(random a > random b))

    Exact-replay algebra: the SAME one-pass exact DECIMAL moments as
    welch_ttest (overflow certificate included); every effect size is a
    fixed IEEE expression, CLES via the replayable :func:`_normal_sf`
    polynomial. Returns 1 row: (n_a, n_b, mean_diff, cohen_d, hedges_g,
    glass_delta, cles).
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
    nad, nbd = na.cast("double"), nb.cast("double")
    sp = F.sqrt(((nad - 1.0) * va + (nbd - 1.0) * vb) / (nad + nbd - 2.0))
    d = (ma - mb) / sp
    gcorr = 1.0 - 3.0 / (4.0 * (nad + nbd) - 9.0)
    zc = (ma - mb) / F.sqrt(va + vb)
    cles = F.when(zc >= 0, 1.0 - _normal_sf(zc)).otherwise(_normal_sf(-zc))
    return row.select(
        na.alias("n_a"),
        nb.alias("n_b"),
        F.round(ma - mb, 6).alias("mean_diff"),
        F.round(F.when(sp > 0, d), 6).alias("cohen_d"),
        F.round(F.when(sp > 0, d * gcorr), 6).alias("hedges_g"),
        F.round(F.when(vb > 0, (ma - mb) / F.sqrt(vb)), 6).alias(
            "glass_delta"
        ),
        F.round(F.when(va + vb > 0, cles), 6).alias("cles"),
    )


def brown_forsythe(
    df: DataFrame, value_col: str, group_col: str
) -> DataFrame:
    """Brown-Forsythe test of VARIANCE homogeneity across groups (Levene
    with the median center — robust to non-normality): a one-way ANOVA on
    the absolute deviations w = |x − median_g|. The screen to run BEFORE
    trusting a pooled-variance test, and a drift detector for spread
    changes that mean-based monitors miss.

    Exact-replay algebra: group medians come from the exact interpolated
    percentile (identical in Spark and DuckDB — the skew-report
    precedent); w is then quantized to the int64 1e9 grid BEFORE the
    moment sums (w in grid units — the F statistic is scale-invariant so
    the grid cancels; a DECIMAL cast of the irrational-looking doubles
    would hit engine rounding-mode edges, the Theil lesson), SSB/SSW use
    the anova_oneway identities with the sorted-fold Σ S_g²/n_g. Returns
    1 row: (n, k, df_between, df_within, f_stat). F-distribution p needs
    the incomplete beta and is left to the caller (the ANOVA contract).

    Shape: one keyed percentile groupBy, one broadcast join back, one
    map-side-combinable moment groupBy; |groups|-row frames after.
    """
    g, v = F.col(group_col), F.col(value_col)
    base = df.where(g.isNotNull() & v.isNotNull()).select(
        g.alias("grp"), v.cast("double").alias("x")
    )
    meds = base.groupBy("grp").agg(
        F.percentile(F.col("x"), F.lit(0.5)).alias("med")
    )
    wq = F.floor(
        F.abs(F.col("x") - F.col("med")) * F.lit(1.0e9) + F.lit(0.5)
    ).cast("decimal(38,0)")
    cells = (
        base.join(F.broadcast(meds), "grp")
        .select("grp", wq.alias("w"))
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("w")).alias("s"),
            F.sum((F.col("w") * F.col("w")).cast("decimal(38,0)")).alias("q"),
        )
    )
    wt = Window.partitionBy()
    sd = _dec_double(F.col("s"))
    term = sd * sd / F.col("n")
    agg = cells.select(
        F.col("n"),
        term.alias("term"),
        F.sum("n").over(wt).alias("nn"),
        F.sum("s").over(wt).alias("ss"),
        F.sum("q").over(wt).alias("qq"),
    ).agg(
        F.max("nn").alias("n_total"),
        F.count(F.lit(1)).alias("k"),
        F.max(_dec_double(F.col("ss"))).alias("s_tot"),
        F.max(_dec_double(F.col("qq"))).alias("q_tot"),
        F.aggregate(
            F.sort_array(F.collect_list("term")), F.lit(0.0), lambda a, x: a + x
        ).alias("sum_term"),
    )
    n = F.col("n_total").cast("double")
    k = F.col("k").cast("double")
    ssb = F.col("sum_term") - F.col("s_tot") * F.col("s_tot") / n
    ssw = F.col("q_tot") - F.col("sum_term")
    f_stat = (ssb / (k - 1)) / (ssw / (n - k))
    return agg.select(
        F.col("n_total").alias("n"),
        F.col("k"),
        (k - 1).cast("long").alias("df_between"),
        (n - k).cast("long").alias("df_within"),
        F.round(F.when(ssw > 0, f_stat), 6).alias("f_stat"),
    )


def cochrans_q(
    df: DataFrame,
    subject_col: str,
    treatment_col: str,
    outcome_col: str,
) -> DataFrame:
    """Cochran's Q test (Cochran 1950) — the k-treatment extension of
    :func:`mcnemar_test`: did the SAME subjects succeed at different
    rates across k conditions (k model variants on identical prompts,
    k funnel steps per user)? Long input: one row per (subject,
    treatment) with a boolean outcome; only subjects observed under ALL
    k treatments enter (the complete-block requirement — incomplete
    subjects are dropped and counted).

        Q = (k−1)·[k·ΣG_j² − (ΣG_j)²] / [k·ΣL_i − ΣL_i²]

    with G_j = per-treatment success totals and L_i = per-subject success
    totals — every term an exact int64/DECIMAL sum, Q one fixed IEEE
    division — VALUE-oracle-able. Q ~ χ²(k−1) under H0; the p-value needs
    the incomplete gamma and is left to the caller (the ANOVA contract).
    Returns 1 row: (n_subjects, n_dropped, k, q_stat, dof).

    Shape: one groupBy(subject) pass (map-side combinable) carrying the
    per-treatment flags; treatment totals on the |k| frame. No data-sized
    shuffle beyond the subject collapse.
    """
    s, t = F.col(subject_col), F.col(treatment_col)
    o = F.col(outcome_col).cast("boolean")
    base = df.where(s.isNotNull() & t.isNotNull() & o.isNotNull()).select(
        s.alias("subj"), t.alias("trt"), o.cast("int").alias("y")
    )
    k_frame = base.agg(F.count_distinct(F.col("trt")).alias("k"))
    per_subj = base.groupBy("subj").agg(
        F.count_distinct(F.col("trt")).alias("k_i"),
        F.sum("y").cast("long").alias("l_i"),
    )
    per_subj = per_subj.crossJoin(F.broadcast(k_frame))
    complete = per_subj.where(F.col("k_i") == F.col("k"))
    subj_tot = complete.agg(
        F.count(F.lit(1)).alias("n_subjects"),
        F.sum("l_i").cast("decimal(38,0)").alias("sl"),
        F.sum((F.col("l_i") * F.col("l_i")).cast("decimal(38,0)")).alias(
            "sl2"
        ),
    )
    dropped = per_subj.where(F.col("k_i") != F.col("k")).agg(
        F.count(F.lit(1)).alias("n_dropped")
    )
    trt_tot = (
        base.join(
            complete.select(F.col("subj")), "subj"
        )  # complete blocks only
        .groupBy("trt")
        .agg(F.sum("y").cast("long").alias("g_j"))
        .agg(
            F.sum(F.col("g_j").cast("decimal(38,0)")).alias("sg"),
            F.sum(
                (
                    F.col("g_j").cast("decimal(38,0)")
                    * F.col("g_j").cast("decimal(38,0)")
                ).cast("decimal(38,0)")
            ).alias("sg2"),
        )
    )
    j = (
        subj_tot.crossJoin(F.broadcast(trt_tot))
        .crossJoin(F.broadcast(k_frame))
        .crossJoin(F.broadcast(dropped))
    )
    kd = F.col("k").cast("double")
    sl, sl2 = _dec_double(F.col("sl")), _dec_double(F.col("sl2"))
    sg, sg2 = _dec_double(F.col("sg")), _dec_double(F.col("sg2"))
    den = kd * sl - sl2
    q = (kd - 1.0) * (kd * sg2 - sg * sg) / den
    return j.select(
        F.col("n_subjects"),
        F.col("n_dropped"),
        F.col("k").cast("int").alias("k"),
        (F.col("k") - 1).cast("int").alias("dof"),
        F.round(F.when(den > 0, q), 6).alias("q_stat"),
    )
