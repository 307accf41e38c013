"""Binary-classifier evaluation metrics — exact rank/count arithmetic.

The evaluation half of the engine's supervised surface (pairs with
`operators/logreg.py` / `operators/classifier.py`, which fit scores but
could not previously be graded inside the engine):

- :func:`roc_auc` — the exact area under the ROC curve via the
  Mann-Whitney identity AUC = U⁺/(n⁺·n⁻): scores collapse to
  per-distinct-value (pos, neg) counts in ONE groupBy, rank sums use the
  same exact integer 2·R arithmetic as
  :func:`preprocessor_spark.operators.hypotests.mann_whitney_u` (midranks
  at ×2 scale need no float averaging), so the AUC is ONE double division
  of exact int64s — ties-correct (trapezoidal), VALUE-oracle-able, and
  never materializes a sorted score list.
- :func:`confusion_metrics` — tp/fp/tn/fn at a threshold in one
  conditional-count aggregation, with precision/recall/F1/accuracy as
  deterministic doubles over the exact counts.

Scale shape: one map-side-combined groupBy each; the per-distinct-score
frame is bounded by score cardinality and the cumsum uses the
range-partitioned two-pass carry (no SinglePartition on data-sized
frames).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def roc_auc(
    df: DataFrame,
    score_col: str,
    label_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """1-row frame (n_pos, n_neg, auc): P(score⁺ > score⁻) + ½P(tie).

    The label column is boolean-ish (1/true = positive). Exact for any
    tie structure — ties contribute the standard half credit, which is the
    midrank construction, kept integral at ×2 scale.
    """
    from preprocessor_spark.caching import register_persisted

    spark = df.sparkSession
    n_part = num_partitions or spark.sparkContext.defaultParallelism
    s, y = F.col(score_col), F.col(label_col).cast("int")
    counts = (
        df.where(s.isNotNull() & F.col(label_col).isNotNull())
        .groupBy(s.alias("value"))
        .agg(
            F.sum(y).alias("cp"),
            F.sum(1 - y).alias("cn"),
        )
    )
    ranged = register_persisted(
        counts.repartitionByRange(n_part, F.col("value"))
        .withColumn("__pid", F.spark_partition_id())
        .persist()
    )
    psums = (
        ranged.groupBy("__pid").agg((F.sum("cp") + F.sum("cn")).alias("t")).collect()
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
    t = (F.col("cp") + F.col("cn")).cast("long")
    below = F.coalesce(F.sum(t).over(w), F.lit(0)) + carry_expr
    per = ranged.select(
        F.col("cp").cast("long").alias("cp"),
        t.alias("t"),
        below.alias("below"),
    )
    agg = per.agg(
        F.sum("cp").alias("n_pos"),
        (F.sum("t") - F.sum("cp")).alias("n_neg"),
        F.sum(F.col("cp") * (2 * F.col("below") + F.col("t") + 1)).alias("two_r_pos"),
    )
    np_, nn = F.col("n_pos"), F.col("n_neg")
    two_u = F.col("two_r_pos") - np_ * (np_ + 1)
    return agg.select(
        np_.alias("n_pos"),
        nn.alias("n_neg"),
        F.round(
            F.when(
                (np_ > 0) & (nn > 0),
                two_u.cast("double") / (2.0 * (np_ * nn).cast("double")),
            ),
            6,
        ).alias("auc"),
    )


def confusion_metrics(
    df: DataFrame, score_col: str, label_col: str, threshold: float
) -> DataFrame:
    """1-row tp/fp/tn/fn at ``score >= threshold`` plus
    precision/recall/f1/accuracy — exact conditional counts in ONE
    aggregation, derived ratios as deterministic doubles (NULL where the
    denominator is zero)."""
    s, y = F.col(score_col), F.col(label_col).cast("int")
    pred = (s >= F.lit(threshold)).cast("int")
    base = df.where(s.isNotNull() & F.col(label_col).isNotNull())
    agg = base.agg(
        F.sum(pred * y).alias("tp"),
        F.sum(pred * (1 - y)).alias("fp"),
        F.sum((1 - pred) * (1 - y)).alias("tn"),
        F.sum((1 - pred) * y).alias("fn"),
    )
    tp, fp, tn, fn = F.col("tp"), F.col("fp"), F.col("tn"), F.col("fn")
    prec = F.when(tp + fp > 0, tp.cast("double") / (tp + fp))
    rec = F.when(tp + fn > 0, tp.cast("double") / (tp + fn))
    f1 = F.when(
        (2 * tp + fp + fn) > 0, (2 * tp).cast("double") / (2 * tp + fp + fn)
    )
    acc = (tp + tn).cast("double") / (tp + fp + tn + fn)
    return agg.select(
        tp,
        fp,
        tn,
        fn,
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
        F.round(acc, 6).alias("accuracy"),
    )


def gains_table(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_buckets: int = 10,
    num_partitions: int | None = None,
) -> DataFrame:
    """Decile gains/lift table — the classic campaign-targeting report.

    Rows are ranked by score DESCENDING and cut into ``n_buckets`` equal-
    population buckets; ties (one distinct score value) always land in one
    bucket — the bucket of the group's LAST row — so the cut is a pure
    function of the score distribution (engine-portable, no arbitrary
    within-tie splits). Per bucket: row count, positives, response rate,
    cumulative gain (share of all positives captured so far) and lift
    (rate over the base rate) — every number a deterministic double over
    exact int64 counts.

    Scale shape: scores collapse to per-distinct-value counts in ONE
    groupBy; the descending cumulative count uses the same range-
    partitioned two-pass carry as :func:`roc_auc` (no SinglePartition on
    the distinct-score frame); the final report is ``n_buckets`` rows.
    """
    from preprocessor_spark.caching import register_persisted

    spark = df.sparkSession
    n_part = num_partitions or spark.sparkContext.defaultParallelism
    s, y = F.col(score_col), F.col(label_col).cast("int")
    counts = (
        df.where(s.isNotNull() & F.col(label_col).isNotNull())
        .groupBy(s.alias("value"))
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum(y).alias("pos"))
    )
    # descending score order: range-partition on the NEGATED rank key so
    # partition ids follow rank order, then carry cumulative counts across
    ranged = register_persisted(
        counts.repartitionByRange(n_part, F.col("value").desc())
        .withColumn("__pid", F.spark_partition_id())
        .persist()
    )
    psums = ranged.groupBy("__pid").agg(F.sum("cnt").alias("t")).collect()
    by_pid = {r["__pid"]: r["t"] for r in psums}
    carry, off = {}, 0
    for pid in sorted(by_pid):
        carry[pid] = off
        off += by_pid[pid]
    total_rows = off
    carry_expr = F.element_at(
        F.create_map(*[F.lit(x) for kv in sorted(carry.items()) for x in kv]),
        F.col("__pid"),
    )
    w = (
        Window.partitionBy("__pid")
        .orderBy(F.col("value").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("cnt").over(w) + carry_expr
    # bucket of the tie-group's last row: ceil(B * cum / N), clamped to B
    bucket = F.least(
        F.ceil(F.lit(n_buckets) * cum / F.lit(total_rows)).cast("int"),
        F.lit(n_buckets),
    )
    per_bucket = (
        ranged.select(bucket.alias("bucket"), "cnt", "pos")
        .groupBy("bucket")
        .agg(F.sum("cnt").alias("n"), F.sum("pos").alias("positives"))
    )
    # the report frame is n_buckets rows — bounded window is fine here
    wb = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wt = Window.partitionBy()
    tot_pos = F.sum("positives").over(wt)
    tot_n = F.sum("n").over(wt)
    cum_pos = F.sum("positives").over(wb)
    rate = F.col("positives").cast("double") / F.col("n").cast("double")
    base = tot_pos.cast("double") / tot_n.cast("double")
    return per_bucket.select(
        "bucket",
        "n",
        "positives",
        F.round(rate, 6).alias("response_rate"),
        F.round(cum_pos.cast("double") / tot_pos.cast("double"), 6).alias("cum_gain"),
        F.round(rate / base, 6).alias("lift"),
    ).orderBy("bucket")


def calibration_report(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Probability-calibration report + Brier decomposition — the "are the
    scores probabilities?" check that completes the classifier-eval
    family (ROC-AUC ranks; this grades the VALUES).

    Bins scores into ``n_bins`` fixed-width bins over [0, 1] (scores are
    clamped; bin = min(floor(s·B), B−1) so s = 1.0 lands in the top bin)
    and reports per bin: n, mean predicted probability, observed positive
    rate, and the gap. Every row also carries the global Brier score and
    its Murphy (1973) decomposition over these bins —

        BRIER = REL − RES + UNC
        REL = Σ_b n_b (p̄_b − r_b)² / N      (reliability: what to fix)
        RES = Σ_b n_b (r_b − base)² / N     (resolution: what's learned)
        UNC = base (1 − base)               (irreducible)

    (the decomposition is exact when computed from the same binning).

    Engine contract: per-bin score sums quantize to the 1e-9 int64 grid
    (labels/counts are exact ints), the bin frame is bounded (≤ n_bins
    rows), and the decomposition's cross-bin sums quantize the same way —
    VALUE-oracle-able, one map-side-combinable groupBy.
    """
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    s = F.least(F.greatest(F.col(score_col).cast("double"), F.lit(0.0)), F.lit(1.0))
    y = F.col(label_col).cast("int")
    b = F.least(
        F.floor(s * F.lit(float(n_bins))).cast("int"), F.lit(n_bins - 1)
    )

    def q(expr):
        return F.sum(F.floor(expr * F.lit(1e9) + F.lit(0.5)).cast("long"))

    base = df.where(F.col(score_col).isNotNull() & F.col(label_col).isNotNull())
    cells = base.groupBy(b.alias("bin")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        q(s).alias("qs"),
        F.sum(y).cast("long").alias("pos"),
        q((s - y.cast("double")) * (s - y.cast("double"))).alias("qsq"),
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy()
    nd = F.col("n").cast("double")
    mean_p = (F.col("qs").cast("double") / F.lit(1e9)) / nd
    rate = F.col("pos").cast("double") / nd
    big_n = F.sum("n").over(w).cast("double")
    total_pos = F.sum("pos").over(w).cast("double")
    base_rate = total_pos / big_n
    brier = (
        F.sum("qsq").over(w).cast("double") / F.lit(1e9)
    ) / big_n
    # cross-bin sums over the bounded bin frame: quantize the per-bin
    # double terms so window accumulation order cannot flip a bit
    def qw(expr):
        return (
            F.sum(F.floor(expr * F.lit(1e9) + F.lit(0.5)).cast("long"))
            .over(w)
            .cast("double")
            / F.lit(1e9)
        )

    rel = qw(nd * (mean_p - rate) * (mean_p - rate)) / big_n
    res = qw(nd * (rate - base_rate) * (rate - base_rate)) / big_n
    unc = base_rate * (F.lit(1.0) - base_rate)
    return cells.select(
        "bin",
        "n",
        mean_p.alias("mean_predicted"),
        rate.alias("observed_rate"),
        (mean_p - rate).alias("gap"),
        brier.alias("brier"),
        rel.alias("reliability"),
        res.alias("resolution"),
        unc.alias("uncertainty"),
    )


def cohens_kappa(
    df: DataFrame,
    rater_a: str,
    rater_b: str,
) -> DataFrame:
    """Cohen's kappa — chance-corrected agreement between two categorical
    raters (Cohen 1960) — plus the linear- and quadratic-weighted variants
    for ORDINAL categories (Cohen 1968): ``rater_a``/``rater_b`` must hold
    integer category indices on the same scale.

    Exact-replay algebra: with integer confusion cells n_ij, row/column
    totals r_i, c_j and N, every statistic reduces to ONE division of two
    exactly-computed integers —

        kappa           = (N·Σ n_ii − Σ r_i c_i) / (N² − Σ r_i c_i)
        kappa_linear    = 1 − N·Σ|i−j| n_ij / Σ|i−j| r_i c_j
        kappa_quadratic = 1 − N·Σ(i−j)² n_ij / Σ(i−j)² r_i c_j

    so the DuckDB oracle replays bit-for-bit (the integer products stay
    DECIMAL(38,0) until the final cast; above 2^53 both engines round the
    same exact integer to the same double).

    Scale shape: one map-side-combinable groupBy to the ≤k² cell frame;
    the r×c cross products live on |k|-row frames. One output row:
    (n, k, po, pe, kappa, kappa_linear, kappa_quadratic).
    """
    a = F.col(rater_a).cast("long")
    b = F.col(rater_b).cast("long")
    cells = (
        df.where(a.isNotNull() & b.isNotNull())
        .groupBy(a.alias("i"), b.alias("j"))
        .agg(F.count(F.lit(1)).cast("long").alias("nij"))
    )
    dec = lambda c: c.cast("decimal(38,0)")
    obs = cells.agg(
        F.sum("nij").alias("n"),
        F.coalesce(
            F.sum(F.when(F.col("i") == F.col("j"), F.col("nij"))), F.lit(0).cast("long")
        ).alias("diag"),
        F.sum(dec(F.abs(F.col("i") - F.col("j")) * F.col("nij"))).alias("dlin"),
        F.sum(
            dec((F.col("i") - F.col("j")) * (F.col("i") - F.col("j")) * F.col("nij"))
        ).alias("dquad"),
        (F.greatest(F.max("i"), F.max("j")) + 1).alias("k"),
    )
    rows = cells.groupBy("i").agg(F.sum("nij").alias("ri"))
    colsf = cells.groupBy("j").agg(F.sum("nij").alias("cj"))
    exp_ = (
        rows.crossJoin(colsf)  # |k| x |k| marginal frame — never data-sized
        .agg(
            F.coalesce(
                F.sum(
                    F.when(F.col("i") == F.col("j"), dec(F.col("ri") * F.col("cj")))
                ),
                F.lit(0).cast("decimal(38,0)"),
            ).alias("ediag"),
            F.sum(dec(F.abs(F.col("i") - F.col("j")) * F.col("ri") * F.col("cj")))
            .alias("elin"),
            F.sum(
                dec(
                    (F.col("i") - F.col("j"))
                    * (F.col("i") - F.col("j"))
                    * F.col("ri")
                    * F.col("cj")
                )
            ).alias("equad"),
        )
    )
    j = obs.crossJoin(exp_)  # two 1-row frames
    nd = F.col("n").cast("double")
    n2 = dec(F.col("n") * F.col("n"))
    po = F.col("diag").cast("double") / nd
    pe = F.col("ediag").cast("double") / (nd * nd)
    kappa = (
        dec(F.col("n") * F.col("diag")) - F.col("ediag")
    ).cast("double") / (n2 - F.col("ediag")).cast("double")
    klin = F.lit(1.0) - dec(F.col("n")).cast("double") * F.col("dlin").cast(
        "double"
    ) / F.col("elin").cast("double")
    kquad = F.lit(1.0) - dec(F.col("n")).cast("double") * F.col("dquad").cast(
        "double"
    ) / F.col("equad").cast("double")
    return j.select(
        F.col("n"),
        F.col("k").cast("int").alias("k"),
        F.round(po, 6).alias("po"),
        F.round(pe, 6).alias("pe"),
        F.round(kappa, 6).alias("kappa"),
        F.round(klin, 6).alias("kappa_linear"),
        F.round(kquad, 6).alias("kappa_quadratic"),
    )
