"""Rank-based statistics — Spearman correlation and the Kruskal-Wallis H
test, exactly, at scale.

Rank statistics dodge outliers and monotone transformations, which is why
they are the robust defaults for drift/association screens — but naive
implementations globally sort the data. Both operators here need only
per-DISTINCT-VALUE frames:

- average ranks under ties live on the half-integer grid, so DOUBLED
  ranks (2·rank) are exact int64s: 2·avg_rank(v) = 2·below(v) + t(v) + 1
  where below = rows strictly smaller, t = ties at v. Every moment of
  doubled ranks is then an exact DECIMAL sum, and the final statistic is
  a deterministic IEEE expression over exact integers — VALUE-oracle-able
  (Spearman's rho is scale-invariant, so doubling changes nothing; the
  Kruskal-Wallis rank sums divide the 2 back out analytically).
- the only data-sized passes are groupBy(value[, key]) collapses; the
  cumulative "below" counts ride keyed (or bounded distinct-value)
  windows, exactly the :func:`mannwhitney <operators.hypotests>` shape.

Spearman's rho (tie-corrected) is Pearson on average ranks; the
Kruskal-Wallis H uses the pooled ranking with the standard tie correction
C = 1 − Σ(t³−t)/(N³−N); H_corrected = H/C.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from preprocessor_spark.operators.hypotests import _dec_double, _normal_sf

_DEC = "decimal(38,0)"


def spearman_by_group(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-group tie-corrected Spearman rank correlation of two columns.

    Returns (group, n, rho): rho = Pearson over average ranks, computed
    on DOUBLED ranks (exact int64 on the half-integer grid) with exact
    DECIMAL moments — one deterministic IEEE expression at the end.

    Shape: two distinct-value collapses (per column) + keyed windows on
    those bounded frames + one join back per column + one moment groupBy.
    All exchanges keyed by the group column.
    """
    g = F.col(group_col)
    base = df.where(
        g.isNotNull() & F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    ).select(g.alias("group"), F.col(x_col).alias("x"), F.col(y_col).alias("y"))

    def ranked(col: str) -> DataFrame:
        cells = base.groupBy("group", col).agg(F.count(F.lit(1)).alias("t"))
        w = Window.partitionBy("group").orderBy(col)
        below = F.coalesce(
            F.sum("t").over(w.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        )
        return cells.select(
            "group",
            col,
            (F.lit(2) * below + F.col("t") + F.lit(1)).alias(f"r2_{col}"),
        )

    withx = base.join(ranked("x"), ["group", "x"])
    withxy = withx.join(ranked("y"), ["group", "y"])
    rx, ry = F.col("r2_x"), F.col("r2_y")
    mom = withxy.groupBy("group").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(rx.cast(_DEC)).alias("sx"),
        F.sum(ry.cast(_DEC)).alias("sy"),
        F.sum((rx * rx).cast(_DEC)).alias("sxx"),
        F.sum((ry * ry).cast(_DEC)).alias("syy"),
        F.sum((rx * ry).cast(_DEC)).alias("sxy"),
    )
    n = F.col("n").cast("double")
    sx, sy = _dec_double(F.col("sx")), _dec_double(F.col("sy"))
    sxx, syy = _dec_double(F.col("sxx")), _dec_double(F.col("syy"))
    sxy = _dec_double(F.col("sxy"))
    num = n * sxy - sx * sy
    den = F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    return mom.select(
        "group",
        F.col("n"),
        F.round(F.when(den > 0, num / den), 6).alias("rho"),
    ).orderBy("group")


def jonckheere_terpstra(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Jonckheere-Terpstra test for an ORDERED alternative across the
    levels of ``group_col`` (Jonckheere 1954; Terpstra 1952): where
    Kruskal-Wallis asks "do the k groups differ at all?", JT asks "do the
    values trend UP with the group order?" and is far more powerful when
    the ordering is real (dose levels, priority tiers, quality bands).

        JT = Σ_{i<j} U_ij,   U_ij = #{x∈i, y∈j : x<y} + ½·#{x=y}

    Exact-replay algebra: with per-(group, value) cell counts c, the
    DOUBLED statistic 2·JT = Σ_{a.grp<b.grp} c_a·c_b·(2·[v_a<v_b] +
    [v_a=v_b]) is an exact DECIMAL(38,0) sum, the null mean
    (N² − Σn_i²)/4 and the tie-corrected variance (Hollander & Wolfe §6.2)

        72·σ² ≈ A + 2B/(N(N−1)(N−2)) + 9C/(N(N−1))   — computed exactly as
        σ² = A/72 + B/(36·N(N−1)(N−2)) + C/(8·N(N−1)),
        A = N(N−1)(2N+5) − Σ_i n_i(n_i−1)(2n_i+5) − Σ_v t_v(t_v−1)(2t_v+5)
        B = [Σ_i n_i(n_i−1)(n_i−2)]·[Σ_v t_v(t_v−1)(t_v−2)]
        C = [Σ_i n_i(n_i−1)]·[Σ_v t_v(t_v−1)]

    are all integer functionals (exact DECIMAL sums), and z enters one
    fixed-association IEEE expression — VALUE-oracle-able. The two-sided
    normal p-value uses the replayable Zelen-Severo polynomial
    (:func:`~preprocessor_spark.operators.hypotests._normal_sf`). Returns
    1 row: (n, k, jt, mean_jt, var_jt, z, p_value).

    Shape: one groupBy(group, value) collapse is the only data-sized
    pass; the pairwise Σ runs a theta self-join of the BOUNDED cell frame
    (|cells|² work independent of row count — the kruskal_wallis
    bounded-distinct-value contract), group/tie functionals live on
    |k|- and |values|-row frames.
    """
    g, v = F.col(group_col), F.col(value_col)
    cells = (
        df.where(g.isNotNull() & v.isNotNull())
        .groupBy(g.alias("grp"), v.alias("v"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    a, b = cells.alias("a"), cells.alias("b")
    av, bv = F.col("a.v"), F.col("b.v")
    w = F.when(av < bv, F.lit(2)).when(av == bv, F.lit(1)).otherwise(F.lit(0))
    jt2 = (
        a.join(b, F.col("a.grp") < F.col("b.grp"))
        .select(
            (F.col("a.c").cast(_DEC) * F.col("b.c").cast(_DEC) * w).alias("t")
        )
        .agg(F.coalesce(F.sum("t"), F.lit(0).cast(_DEC)).alias("jt2"))
    )

    def functionals(frame: DataFrame, cnt: str, prefix: str) -> DataFrame:
        m = F.col(cnt).cast(_DEC)
        return frame.agg(
            F.sum(m).alias(f"{prefix}_n"),
            F.count(F.lit(1)).alias(f"{prefix}_k"),
            F.sum((m * m).cast(_DEC)).alias(f"{prefix}_s2"),
            F.sum((m * (m - 1) * (2 * m + 5)).cast(_DEC)).alias(f"{prefix}_a"),
            F.sum((m * (m - 1) * (m - 2)).cast(_DEC)).alias(f"{prefix}_b"),
            F.sum((m * (m - 1)).cast(_DEC)).alias(f"{prefix}_c"),
        )
    groups = functionals(
        cells.groupBy("grp").agg(F.sum("c").alias("n_g")), "n_g", "g"
    )
    ties = functionals(
        cells.groupBy("v").agg(F.sum("c").alias("t_v")), "t_v", "t"
    )
    j = jt2.crossJoin(F.broadcast(groups)).crossJoin(F.broadcast(ties))
    n = _dec_double(F.col("g_n"))
    jt = _dec_double(F.col("jt2")) / F.lit(2.0)
    mean = (n * n - _dec_double(F.col("g_s2"))) / F.lit(4.0)
    big_a = (
        n * (n - 1.0) * (2.0 * n + 5.0)
        - _dec_double(F.col("g_a"))
        - _dec_double(F.col("t_a"))
    )
    big_b = _dec_double(F.col("g_b")) * _dec_double(F.col("t_b"))
    big_c = _dec_double(F.col("g_c")) * _dec_double(F.col("t_c"))
    var = (
        big_a / F.lit(72.0)
        + big_b / (F.lit(36.0) * (n * (n - 1.0) * (n - 2.0)))
        + big_c / (F.lit(8.0) * (n * (n - 1.0)))
    )
    z = (jt - mean) / F.sqrt(var)
    return j.select(
        F.col("g_n").cast("long").alias("n"),
        F.col("g_k").cast("int").alias("k"),
        F.round(jt, 6).alias("jt"),
        F.round(mean, 6).alias("mean_jt"),
        F.round(var, 6).alias("var_jt"),
        F.round(F.when(var > 0, z), 6).alias("z"),
        F.round(
            F.when(var > 0, F.lit(2.0) * _normal_sf(F.abs(z))), 6
        ).alias("p_value"),
    )


def kruskal_wallis(
    df: DataFrame,
    value_col: str,
    group_col: str,
) -> DataFrame:
    """Kruskal-Wallis H (rank one-way ANOVA) across the levels of
    ``group_col`` — the k-sample extension of the Mann-Whitney screen.

        H = 12/(N(N+1)) · Σ_g R_g²/n_g − 3(N+1)
        C = 1 − Σ_v (t_v³ − t_v) / (N³ − N)        (tie correction)

    computed from exact integers: per distinct value, per-group counts
    and the pooled doubled rank (2·below + t + 1); R2_g = Σ cnt_g·rank2
    is an exact DECIMAL sum and R_g = R2_g/2 enters H analytically.
    Returns 1 row: n, k, h, h_corrected, dof. The chi-square p-value
    needs the incomplete gamma and is left to the caller (the ANOVA
    contract).

    Shape: one groupBy(value, group) collapse (the only data-sized pass),
    cumulative windows on the bounded distinct-value frame (documented
    single-partition on the CURVE frame, the kaplan_meier contract), one
    bounded groupBy(group), one 1-row reduce.
    """
    g, v = F.col(group_col), F.col(value_col)
    cells = (
        df.where(g.isNotNull() & v.isNotNull())
        .groupBy(v.alias("v"), g.alias("grp"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # pooled per-value totals + cumulative below on the bounded value frame
    per_v = cells.groupBy("v").agg(F.sum("c").alias("t"))
    w = Window.orderBy("v")
    below = F.coalesce(
        F.sum("t").over(w.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0)
    )
    ranked = per_v.select(
        "v",
        "t",
        (F.lit(2) * below + F.col("t") + F.lit(1)).alias("r2"),
    )
    joined = cells.join(ranked, "v")
    per_g = joined.groupBy("grp").agg(
        F.sum("c").alias("n_g"),
        F.sum((F.col("c").cast(_DEC) * F.col("r2").cast(_DEC)).cast(_DEC)).alias(
            "r2_g"
        ),
    )
    # Σ R_g²/n_g with R_g = R2_g/2: sorted fold over the |groups| frame
    term = (
        _dec_double(F.col("r2_g")) * _dec_double(F.col("r2_g"))
        / (F.lit(4.0) * F.col("n_g").cast("double"))
    )
    ties = ranked.agg(
        F.sum(
            (F.col("t").cast(_DEC) * F.col("t").cast(_DEC) * F.col("t").cast(_DEC)
             - F.col("t").cast(_DEC)).cast(_DEC)
        ).alias("tsum")
    )
    agg = per_g.agg(
        F.sum("n_g").alias("n"),
        F.count(F.lit(1)).alias("k"),
        F.aggregate(
            F.sort_array(F.collect_list(term)), F.lit(0.0), lambda a, x: a + x
        ).alias("sr"),
    ).crossJoin(F.broadcast(ties))
    n = F.col("n").cast("double")
    h = F.lit(12.0) / (n * (n + 1.0)) * F.col("sr") - 3.0 * (n + 1.0)
    c_corr = 1.0 - _dec_double(F.col("tsum")) / (n * n * n - n)
    return agg.select(
        F.col("n"),
        F.col("k"),
        (F.col("k") - 1).cast("int").alias("dof"),
        F.round(h, 6).alias("h"),
        F.round(F.when(c_corr > 0, h / c_corr), 6).alias("h_corrected"),
    )


def ordinal_association(
    df: DataFrame,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Pairwise ordinal-association measures between two ordered columns:
    Goodman-Kruskal gamma, Somers' D (both conditioning directions),
    Kendall's tau-b and tau-c — the full concordant/discordant family
    (Agresti, *Analysis of Ordinal Categorical Data* §2.4). They differ
    only in how ties enter the denominator, which is why one operator
    returns all five:

        C / D = concordant / discordant pair counts
        T_x   = pairs tied on x only,  T_y = tied on y only
        gamma      = (C−D)/(C+D)
        somers_dyx = (C−D)/(C+D+T_y)     (predicting y from x)
        somers_dxy = (C−D)/(C+D+T_x)
        tau_b      = (C−D)/√((C+D+T_x)(C+D+T_y))
        tau_c      = 2m(C−D)/(n²(m−1)),  m = min(k_x, k_y)

    Exact-replay algebra: all five pair counts are exact DECIMAL(38,0)
    sums over the (x, y) cell frame — one self-join classified by sign,
    the :func:`jonckheere_terpstra` idiom — and each statistic is one
    fixed-association IEEE expression over those exact integers —
    VALUE-oracle-able. Returns 1 row:
    (n, kx, ky, conc, disc, ties_x, ties_y, gamma, somers_dyx,
    somers_dxy, tau_b, tau_c).

    Shape: one groupBy(x, y) collapse is the only data-sized pass; the
    classified self-join runs on the BOUNDED cell frame (the
    kruskal_wallis bounded-distinct-value contract).
    """
    x, y = F.col(x_col), F.col(y_col)
    cells = (
        df.where(x.isNotNull() & y.isNotNull())
        .groupBy(x.alias("x"), y.alias("y"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    a, b = cells.alias("a"), cells.alias("b")
    ax, bx = F.col("a.x"), F.col("b.x")
    ay, by = F.col("a.y"), F.col("b.y")
    prod = F.col("a.c").cast(_DEC) * F.col("b.c").cast(_DEC)
    cls = (
        F.when((ax < bx) & (ay < by), F.lit("c"))
        .when((ax < bx) & (ay > by), F.lit("d"))
        .when((ax < bx) & (ay == by), F.lit("ty"))
        .otherwise(F.lit("tx"))  # ax == bx, ay < by by the join condition
    )
    z = F.lit(0).cast(_DEC)
    pairs = (
        a.join(b, (ax < bx) | ((ax == bx) & (ay < by)))
        .select(cls.alias("cls"), prod.alias("p"))
        .agg(
            F.coalesce(F.sum(F.when(F.col("cls") == "c", F.col("p"))), z)
            .alias("conc"),
            F.coalesce(F.sum(F.when(F.col("cls") == "d", F.col("p"))), z)
            .alias("disc"),
            F.coalesce(F.sum(F.when(F.col("cls") == "tx", F.col("p"))), z)
            .alias("ties_x"),
            F.coalesce(F.sum(F.when(F.col("cls") == "ty", F.col("p"))), z)
            .alias("ties_y"),
        )
    )
    dims = cells.agg(
        F.sum("c").cast(_DEC).alias("n"),
        F.count_distinct(F.col("x")).alias("kx"),
        F.count_distinct(F.col("y")).alias("ky"),
    )
    j = pairs.crossJoin(F.broadcast(dims))
    cd_, dd_ = _dec_double(F.col("conc")), _dec_double(F.col("disc"))
    tx, ty = _dec_double(F.col("ties_x")), _dec_double(F.col("ties_y"))
    nd = _dec_double(F.col("n"))
    m = F.least(F.col("kx"), F.col("ky")).cast("double")
    num = cd_ - dd_
    denb = F.sqrt((cd_ + dd_ + tx) * (cd_ + dd_ + ty))
    return j.select(
        F.col("n").cast("long").alias("n"),
        F.col("kx").cast("int").alias("kx"),
        F.col("ky").cast("int").alias("ky"),
        F.col("conc").cast("long").alias("conc"),
        F.col("disc").cast("long").alias("disc"),
        F.col("ties_x").cast("long").alias("ties_x"),
        F.col("ties_y").cast("long").alias("ties_y"),
        F.round(F.when(cd_ + dd_ > 0, num / (cd_ + dd_)), 6).alias("gamma"),
        F.round(
            F.when(cd_ + dd_ + ty > 0, num / (cd_ + dd_ + ty)), 6
        ).alias("somers_dyx"),
        F.round(
            F.when(cd_ + dd_ + tx > 0, num / (cd_ + dd_ + tx)), 6
        ).alias("somers_dxy"),
        F.round(F.when(denb > 0, num / denb), 6).alias("tau_b"),
        F.round(
            F.when(m > 1, 2.0 * m * num / (nd * nd * (m - 1.0))), 6
        ).alias("tau_c"),
    )


def kendalls_w(
    df: DataFrame,
    subject_col: str,
    rater_col: str,
    value_col: str,
) -> DataFrame:
    """Kendall's coefficient of concordance W (Kendall & Babington Smith
    1939) — do m raters agree on the ORDERING of n subjects? The
    multi-rater generalization of rank correlation (m judges scoring
    submissions, m ranking models ordering the same candidates), with the
    standard tie correction:

        W = (12·ΣR_i² − 3·m²·n·(n+1)²) / (m²·n·(n²−1) − m·ΣT_j)
        T_j = Σ_groups (t³ − t) within rater j

    Only subjects scored by ALL m raters enter (complete-block
    requirement; incomplete subjects are dropped and counted). Exact
    replay: per-rater average ranks live on the half-integer grid, so
    DOUBLED rank sums R2_i = 2·R_i are exact integers; ΣR2_i² = 4·ΣR_i²
    and every other functional is an exact DECIMAL sum — W is one fixed
    IEEE expression — VALUE-oracle-able. Returns 1 row:
    (n_subjects, n_dropped, m, w, chi2, dof) where χ² = m(n−1)W is the
    large-n test statistic (p left to the caller, the ANOVA contract).

    Shape: one groupBy(rater, subject) collapse; ranking windows
    partitioned BY RATER over the distinct per-rater value frames (the
    kruskal_wallis bounded-curve contract — parallelism is |raters|);
    |subjects|-row frames after.
    """
    s, r, v = F.col(subject_col), F.col(rater_col), F.col(value_col)
    base = df.where(s.isNotNull() & r.isNotNull() & v.isNotNull()).select(
        s.alias("subj"), r.alias("rater"), v.alias("x")
    )
    m_frame = base.agg(F.count_distinct(F.col("rater")).alias("m"))
    counts = base.groupBy("subj").agg(
        F.count_distinct(F.col("rater")).alias("m_i")
    ).crossJoin(F.broadcast(m_frame))
    complete = counts.where(F.col("m_i") == F.col("m")).select("subj")
    dropped = counts.where(F.col("m_i") != F.col("m")).agg(
        F.count(F.lit(1)).alias("n_dropped")
    )
    kept = base.join(complete, "subj")
    # per (rater, value) cells -> doubled average rank within rater
    cells = kept.groupBy("rater", "x").agg(F.count(F.lit(1)).alias("t"))
    w_rk = Window.partitionBy("rater").orderBy("x")
    below = F.coalesce(
        F.sum("t").over(w_rk.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    ranked = cells.select(
        "rater",
        "x",
        "t",
        (F.lit(2) * below + F.col("t") + F.lit(1)).alias("r2"),
    )
    # tie correction per rater, then summed over raters
    ties = ranked.groupBy("rater").agg(
        F.sum(
            (
                F.col("t").cast(_DEC) * F.col("t").cast(_DEC)
                * F.col("t").cast(_DEC)
                - F.col("t").cast(_DEC)
            ).cast(_DEC)
        ).alias("t_j")
    ).agg(F.sum("t_j").alias("st"))
    # per-subject doubled rank sums over raters
    per_subj = (
        kept.join(ranked, ["rater", "x"])
        .groupBy("subj")
        .agg(F.sum(F.col("r2").cast(_DEC)).alias("r2_i"))
    )
    subj_tot = per_subj.agg(
        F.count(F.lit(1)).alias("n_subjects"),
        F.sum((F.col("r2_i") * F.col("r2_i")).cast(_DEC)).alias("sr2"),
    )
    j = (
        subj_tot.crossJoin(F.broadcast(m_frame))
        .crossJoin(F.broadcast(ties))
        .crossJoin(F.broadcast(dropped))
    )
    nd = F.col("n_subjects").cast("double")
    md = F.col("m").cast("double")
    sr2 = _dec_double(F.col("sr2")) / F.lit(4.0)  # ΣR_i² from doubled sums
    st = _dec_double(F.col("st"))
    num = 12.0 * sr2 - 3.0 * md * md * nd * (nd + 1.0) * (nd + 1.0)
    den = md * md * nd * (nd * nd - 1.0) - md * st
    w = num / den
    return j.select(
        F.col("n_subjects"),
        F.col("n_dropped"),
        F.col("m").cast("int").alias("m"),
        (F.col("n_subjects") - 1).cast("long").alias("dof"),
        F.round(F.when(den > 0, w), 6).alias("w"),
        F.round(F.when(den > 0, md * (nd - 1.0) * w), 6).alias("chi2"),
    )
