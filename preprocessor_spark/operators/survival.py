"""Kaplan-Meier survival estimation — distributed collapse, bounded curve.

The product-limit estimator (Kaplan & Meier, JASA 1958): at each distinct
event time t_i with d_i events among n_i subjects still at risk,

    S(t) = Π_{t_i <= t} (1 - d_i / n_i)

right-censored subjects leave the risk set without an event. The retention
/ churn / time-to-failure primitive of an event-analytics engine (the
funnel/cohort family's statistical completion — `operators/funnel.py`).

Scale shape: the ONLY data-sized pass is one groupBy(duration) collapsing
subjects to per-duration (events, censored) counts — map-side combined,
output bounded by |distinct durations| (the curve's own cardinality, the
same bounded-frame contract as `hypotests.chi2_independence`'s cell list:
day-grained durations are thousands of rows, never data-sized). The
running risk-set and survival product then run on that bounded frame in
one ordered window.

Engine portability: n_at_risk is EXACT integer arithmetic (total minus a
cumulative integer sum); the survival product is the only float chain —
computed as a left-to-right running PRODUCT() over the duration-ordered
frame, which DuckDB replays with the same window; both sides round to 6
decimals (the repo's float-presentation contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_COX_OVERFLOW_MSG = (
    "cox_ph: exp(beta*x) moment overflows its DECIMAL quantization cast "
    "to NULL under non-ANSI Spark; standardize/scale the covariate"
)


def kaplan_meier(df: DataFrame, duration_col: str, event_col) -> DataFrame:
    """Kaplan-Meier curve from per-subject (duration, event) rows.

    ``event_col``: boolean-ish — 1/true = the event was observed at
    ``duration``, 0/false = right-censored at ``duration``. Returns one
    row per distinct duration with an observed event or censoring:
    (duration, n_at_risk, events, censored, survival), survival stepping
    only at event times (the product-limit definition).
    """
    d, e = F.col(duration_col), F.col(event_col).cast("int")
    per = (
        df.where(d.isNotNull() & F.col(event_col).isNotNull())
        .groupBy(d.alias("duration"))
        .agg(
            F.sum(e).alias("events"),
            F.sum(1 - e).alias("censored"),
        )
    )
    # bounded curve frame: unpartitioned windows over |distinct durations|
    w_order = Window.orderBy("duration")
    w_prev = w_order.rowsBetween(Window.unboundedPreceding, -1)
    w_run = w_order.rowsBetween(Window.unboundedPreceding, 0)
    total = F.sum(F.col("events") + F.col("censored")).over(
        Window.partitionBy()
    )
    left_before = F.coalesce(
        F.sum(F.col("events") + F.col("censored")).over(w_prev), F.lit(0)
    )
    n_at_risk = (total - left_before).alias("n_at_risk")
    factor = F.lit(1.0) - F.col("events").cast("double") / F.col("n_at_risk")
    return (
        per.select("duration", "events", "censored", n_at_risk)
        .withColumn("survival", F.round(F.product(factor).over(w_run), 6))
    )


def nelson_aalen(df: DataFrame, duration_col: str, event_col) -> DataFrame:
    """Nelson–Aalen cumulative-hazard estimator — Kaplan-Meier's additive
    sibling (Nelson 1972, Aalen 1978):

        H(t) = Σ_{t_i <= t} d_i / n_i        S̃(t) = exp(−H(t))

    (the Fleming–Harrington survival estimate, reported alongside). Same
    distributed shape as :func:`kaplan_meier`: ONE data-sized
    groupBy(duration) collapse, then exact-integer risk sets and the
    running hazard sum on the bounded duration-ordered curve frame. The
    hazard sum is a left-to-right running SUM of per-duration doubles over
    exact integers — deterministic under the ordered-window contract, so
    fully VALUE-oracled (DuckDB replays the same window).
    """
    d, e = F.col(duration_col), F.col(event_col).cast("int")
    per = (
        df.where(d.isNotNull() & F.col(event_col).isNotNull())
        .groupBy(d.alias("duration"))
        .agg(
            F.sum(e).alias("events"),
            F.sum(1 - e).alias("censored"),
        )
    )
    w_order = Window.orderBy("duration")
    w_prev = w_order.rowsBetween(Window.unboundedPreceding, -1)
    w_run = w_order.rowsBetween(Window.unboundedPreceding, 0)
    total = F.sum(F.col("events") + F.col("censored")).over(Window.partitionBy())
    left_before = F.coalesce(
        F.sum(F.col("events") + F.col("censored")).over(w_prev), F.lit(0)
    )
    n_at_risk = (total - left_before).alias("n_at_risk")
    hazard_inc = F.col("events").cast("double") / F.col("n_at_risk")
    out = per.select("duration", "events", "censored", n_at_risk).withColumn(
        "cum_hazard", F.round(F.sum(hazard_inc).over(w_run), 6)
    )
    return out.withColumn(
        "survival_fh",
        F.round(F.exp(-F.sum(hazard_inc).over(w_run)), 6),
    )


def cox_ph(
    df: DataFrame,
    duration_col: str,
    event_col,
    covariate_col: str,
    max_iter: int = 12,
    tol: float = 1e-9,
) -> dict:
    """Cox proportional-hazards regression (one covariate, Breslow ties) —
    Newton-Raphson on the partial likelihood, fully distributed.

    At each iteration with current β the score and information are

        U(β) = Σ_t [ sx_t − d_t · R1(t)/R0(t) ]
        I(β) = Σ_t d_t · [ R2(t)/R0(t) − (R1(t)/R0(t))² ]

    where, per distinct duration t: d_t = events, sx_t = Σ x over events,
    and Rk(t) = Σ_{duration ≥ t} x^k·exp(βx) are the risk-set sums.

    Scale shape per iteration: ONE data-sized groupBy(duration) computes
    the per-duration moments (map-side combined), the risk-set cumulative
    runs duration-DESC on the bounded curve frame (the kaplan_meier
    bounded-frame contract), and U/I reduce to one collected row. The
    (duration, event, x) base persists once; iterations are linear scans
    (the logreg Newton shape).

    Bit-determinism: exp(βx) and its x/x² products quantize to DECIMAL
    before summing (the GMM quantized-moment pattern), so every moment is
    an exact sum of quantized values — the fit is identical under any
    partitioning. The covariate should be scaled to O(1); a magnitude
    that overflows the quantization raises (count certificate under
    non-ANSI, the cast itself under ANSI). Rows-only by design (iterative
    float fit); graded by numpy-reference equivalence, planted-effect
    recovery, and repartition determinism.

    Returns {n, n_events, beta, se, hr, loglik, iterations, converged}.
    """
    from preprocessor_spark.caching import register_persisted

    d, e = F.col(duration_col), F.col(event_col).cast("int")
    x = F.col(covariate_col).cast("double")
    base = register_persisted(
        df.where(
            d.isNotNull()
            & F.col(event_col).isNotNull()
            & F.col(covariate_col).isNotNull()
        )
        .select(d.alias("t"), e.alias("e"), x.alias("x"))
        .persist()
    )
    counts = base.agg(
        F.count(F.lit(1)).alias("n"), F.sum("e").alias("ne")
    ).collect()[0]
    n, n_events = counts["n"], counts["ne"]
    if not n_events:
        base.unpersist()
        return {
            "n": n, "n_events": 0, "beta": None, "se": None, "hr": None,
            "loglik": None, "iterations": 0, "converged": False,
        }

    w_desc = Window.orderBy(F.desc("t")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    beta, loglik, converged, it = 0.0, None, False, 0
    from preprocessor_spark.caching import fixpoint_shuffle_scope

    # size the per-iteration groupBy(duration) shuffles to the measured
    # base count instead of the session default (the graph-fixpoint
    # policy): at toy scale this folds 64 near-empty reduce tasks per
    # Newton step into 8; at 100 TB the clamp is a no-op. Reduce-side
    # partitioning cannot change the exact quantized-DECIMAL sums.
    with fixpoint_shuffle_scope(df.sparkSession, n):
        for it in range(1, max_iter + 1):
            bx = F.lit(float(beta)) * F.col("x")
            r0q = F.exp(bx).cast("decimal(28,12)")
            r1q = (F.col("x") * F.exp(bx)).cast("decimal(28,10)")
            r2q = (F.col("x") * F.col("x") * F.exp(bx)).cast("decimal(28,8)")
            per = base.groupBy("t").agg(
                F.count(F.lit(1)).alias("m"),
                F.count(r0q).alias("m_q"),
                F.sum("e").alias("dk"),
                F.sum(F.when(F.col("e") == 1, F.col("x").cast("decimal(28,10)"))).alias(
                    "sxe"
                ),
                F.sum(r0q.cast("decimal(38,12)")).alias("s0"),
                F.sum(r1q.cast("decimal(38,10)")).alias("s1"),
                F.sum(r2q.cast("decimal(38,8)")).alias("s2"),
            )
            # overflow certificate: a quantization NULL silently shrinks the
            # risk set under non-ANSI Spark — fail loudly instead
            m_ok = F.coalesce(
                F.assert_true(F.col("m") == F.col("m_q"), F.lit(_COX_OVERFLOW_MSG)).cast(
                    "long"
                ),
                F.col("m"),
            )
            from preprocessor_spark.operators.hypotests import _dec_double

            cum = per.select(
                "t", "dk", "sxe", m_ok.alias("m"),
                F.sum("s0").over(w_desc).alias("r0"),
                F.sum("s1").over(w_desc).alias("r1"),
                F.sum("s2").over(w_desc).alias("r2"),
            ).where(F.col("dk") > 0)
            r0 = _dec_double(F.col("r0"))
            r1 = _dec_double(F.col("r1"))
            r2 = _dec_double(F.col("r2"))
            dkd = F.col("dk").cast("double")
            u_t = _dec_double(F.col("sxe")) - dkd * (r1 / r0)
            i_t = dkd * (r2 / r0 - (r1 / r0) * (r1 / r0))
            ll_t = F.lit(float(beta)) * _dec_double(F.col("sxe")) - dkd * F.log(r0)
            # bounded curve frame: sorted folds keep the cross-time sums
            # order-independent
            row = cum.agg(
                F.aggregate(
                    F.sort_array(F.collect_list(u_t)), F.lit(0.0), lambda a, v: a + v
                ).alias("u"),
                F.aggregate(
                    F.sort_array(F.collect_list(i_t)), F.lit(0.0), lambda a, v: a + v
                ).alias("i"),
                F.aggregate(
                    F.sort_array(F.collect_list(ll_t)), F.lit(0.0), lambda a, v: a + v
                ).alias("ll"),
            ).collect()[0]
            u, info, loglik = row["u"], row["i"], row["ll"]
            if info <= 0:
                break
            step = u / info
            beta += step
            if abs(step) < tol:
                converged = True
                break
    # final information at the converged beta for the SE
    se = (1.0 / info) ** 0.5 if info and info > 0 else None
    base.unpersist()
    import math as _math

    return {
        "n": n,
        "n_events": int(n_events),
        "beta": beta,
        "se": se,
        "hr": _math.exp(beta),
        "loglik": loglik,
        "iterations": it,
        "converged": converged,
    }
