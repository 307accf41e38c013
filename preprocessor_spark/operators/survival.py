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
