"""Ordered-funnel conversion and cohort-retention analytics over event logs.

Two classic product-analytics operators the relational surface alone does
not give you directly (reference scope: event/session analysis in
`clearbox_preprocessor` stops at datetime features — these extend the
events-table family alongside :mod:`preprocessor_spark.operators.sessions`):

``funnel_report``
    Strictly-ordered funnel: for each user, step *i* counts only if an
    event of step *i*'s type occurs STRICTLY AFTER the user's step *i-1*
    completion time (first-touch semantics — the earliest qualifying event
    per step). This is the standard "signup → activate → purchase"
    conversion funnel. Implemented as chained ``MIN(CASE ...) OVER
    (PARTITION BY user)`` windows: every step reuses the SAME partitioning,
    so Catalyst plans ONE ``Exchange hashpartitioning(user)`` with stacked
    Window operators — one shuffle regardless of the number of steps, no
    global window anywhere. Step-gap averages are computed on exact
    ``unix_micros`` BIGINT sums with a single final division, so the
    DuckDB oracle (``epoch_us`` sums) reproduces the doubles bit-exactly.

``cohort_retention``
    Weekly cohort retention matrix: cohort = ``date_trunc('week', first
    event)`` per user; a (cohort, offset) cell counts the distinct users of
    that cohort active ``offset`` weeks later. Three keyed shuffles total
    (first-touch agg, the event join back, the distinct+count agg), all on
    user/cohort keys — partition counts scale with cardinality.

At 100 TB both operators stay keyed-shuffle-only: no driver collect, no
single-partition window, no cross product. Skewed "whale" users hash to one
partition per user only for the funnel's window — bounded by the largest
single user's history, the same bound sessionization already carries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel_report(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
) -> DataFrame:
    """Strictly-ordered first-touch funnel over ``steps``.

    Returns one row per step: ``step_idx``, ``step`` (the event type),
    ``n_users`` reached, ``conv_from_prev`` (fraction of the previous
    step's users, 1.0 for step 0 relative to all users with any event),
    ``avg_gap_secs`` (mean seconds from the previous step's completion,
    NULL for step 0). Deterministic: BIGINT microsecond sums, one final
    division.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    w = Window.partitionBy(user_col)
    df = events.select(
        user_col, F.col(ts_col).cast("timestamp").alias("__ts"), type_col
    )
    prev = None
    tcols = []
    for i, step in enumerate(steps):
        cond = F.col(type_col) == F.lit(step)
        if prev is not None:
            cond = cond & (F.col("__ts") > F.col(prev))
        tname = f"__t{i}"
        df = df.withColumn(tname, F.min(F.when(cond, F.col("__ts"))).over(w))
        prev = tname
        tcols.append(tname)

    per_user = df.groupBy(user_col).agg(
        *[F.min(t).alias(t) for t in tcols]
    )
    return _report_from_per_user(per_user, tcols, steps)


def _report_from_per_user(
    per_user: DataFrame, tcols: list[str], steps: list[str]
) -> DataFrame:
    """Shared report builder over per-user step-completion timestamps —
    also the drain-side aggregator of the streaming twin
    (:func:`preprocessor_spark.streaming.funnel_report_from_states`), so
    both venues share the exact BIGINT-microsecond arithmetic."""
    # exact BIGINT microsecond gaps; one double division at the end
    gaps = per_user.select(
        *[
            F.when(
                F.col(tcols[i]).isNotNull(),
                F.unix_micros(F.col(tcols[i]))
                - F.unix_micros(F.col(tcols[i - 1])),
            ).alias(f"__g{i}")
            for i in range(1, len(tcols))
        ],
        *[F.col(t) for t in tcols],
    )
    agg = gaps.agg(
        F.count(F.lit(1)).alias("__total"),
        *[F.count(F.col(t)).alias(f"__n{i}") for i, t in enumerate(tcols)],
        *[
            F.sum(F.col(f"__g{i}")).alias(f"__s{i}")
            for i in range(1, len(tcols))
        ],
    )
    rows = []
    for i, step in enumerate(steps):
        n = F.col(f"__n{i}")
        denom = F.col("__total") if i == 0 else F.col(f"__n{i-1}")
        conv = F.when(
            denom > 0, n.cast("double") / denom.cast("double")
        ).otherwise(F.lit(None).cast("double"))
        if i == 0:
            gap = F.lit(None).cast("double")
        else:
            gap = F.when(
                n > 0,
                (F.col(f"__s{i}").cast("double") / n.cast("double"))
                / F.lit(1000000.0),
            ).otherwise(F.lit(None).cast("double"))
        rows.append(
            F.struct(
                F.lit(i).cast("int").alias("step_idx"),
                F.lit(step).alias("step"),
                n.cast("bigint").alias("n_users"),
                conv.alias("conv_from_prev"),
                gap.alias("avg_gap_secs"),
            )
        )
    return (
        agg.select(F.explode(F.array(*rows)).alias("r"))
        .select("r.*")
        .orderBy("step_idx")
    )


def cohort_retention(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    max_offset: int | None = None,
) -> DataFrame:
    """Weekly cohort retention counts.

    Returns ``cohort_week`` (date), ``week_offset`` (int >= 0),
    ``n_users`` (distinct users of that cohort active that week). Offsets
    are exact CALENDAR-DAY arithmetic between the Monday-truncated weeks
    (``datediff / 7`` — Monday-to-Monday is always a multiple of 7 days),
    not epoch-second division: in a DST-observing session timezone two
    week boundaries can sit 604800±3600 s apart and a truncating
    epoch-second divide would mis-bucket those cohorts (round-6 advice).
    """
    ev = events.select(
        user_col, F.col(ts_col).cast("timestamp").alias("__ts")
    )
    first = ev.groupBy(user_col).agg(F.min("__ts").alias("__first_ts"))
    cohort = F.date_trunc("week", F.col("__first_ts"))
    active = F.date_trunc("week", F.col("__ts"))
    offset = F.floor(
        F.datediff(F.to_date(active), F.to_date(cohort)) / F.lit(7)
    ).cast("int")
    cells = (
        ev.join(first, user_col)
        .select(
            F.col(user_col),
            cohort.alias("cohort_week"),
            offset.alias("week_offset"),
        )
        .distinct()
    )
    if max_offset is not None:
        cells = cells.filter(F.col("week_offset") <= max_offset)
    return (
        cells.groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )
