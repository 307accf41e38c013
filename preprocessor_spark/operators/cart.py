"""Exact decision-stump induction — the CART split search as one
distributed pass, no sklearn.

A depth-1 CART tree (the unit step of gradient boosting and random
forests) needs, for every candidate threshold v of a numeric feature, the
class counts of the two induced partitions {x ≤ v} / {x > v}. Those are
cumulative sums over the per-distinct-value class histogram — exactly the
shape of :func:`preprocessor_spark.operators.metrics.roc_auc` /
``gains_table``, so the same scale plan applies:

1. ONE groupBy collapses the data to per-distinct-value (count, positives)
   — the only data-sized pass;
2. the ascending cumulative counts use the two-pass range-partitioned
   carry (repartitionByRange + per-partition window + driver carry map) —
   no ``Exchange SinglePartition`` on the distinct-value frame;
3. the best split is one ``min(struct(impurity, value, …))`` aggregate —
   argmin with a deterministic value tie-break, no sort.

Engine-portability: every cumulative is an exact int64; the weighted Gini
of a split is a deterministic double expression over those ints, so the
argmin (and all reported counts) are bit-identical in any engine — DuckDB
replays the carry with a plain window cumsum and the argmin with
``ORDER BY impurity, value LIMIT 1``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def decision_stump(
    df: DataFrame,
    feature_col: str,
    label_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Find the exact best binary split ``feature ≤ v`` for a 0/1 label by
    weighted Gini impurity.

    Splits after the largest distinct value (empty right side) are
    excluded. Ties in impurity break toward the smallest threshold.
    Returns 1 row: threshold, n_left, pos_left, n_right, pos_right,
    gini_root, gini_split (post-split weighted impurity), gain — counts
    exact, impurities deterministic doubles over them.
    """
    from preprocessor_spark.caching import register_persisted

    spark = df.sparkSession
    n_part = num_partitions or spark.sparkContext.defaultParallelism
    x, y = F.col(feature_col), F.col(label_col).cast("long")
    counts = (
        df.where(x.isNotNull() & F.col(label_col).isNotNull())
        .groupBy(x.alias("value"))
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum(y).alias("pos"))
    )
    ranged = register_persisted(
        counts.repartitionByRange(n_part, F.col("value"))
        .withColumn("__pid", F.spark_partition_id())
        .persist()
    )
    psums = ranged.groupBy("__pid").agg(
        F.sum("cnt").alias("c"), F.sum("pos").alias("p")
    ).collect()
    by_pid = {r["__pid"]: (r["c"], r["p"]) for r in psums}
    carry_c, carry_p, off_c, off_p = {}, {}, 0, 0
    for pid in sorted(by_pid):
        carry_c[pid], carry_p[pid] = off_c, off_p
        off_c += by_pid[pid][0]
        off_p += by_pid[pid][1]
    n_total, p_total = off_c, off_p
    if n_total == 0:
        # empty (or all-null) input: no split exists — return an empty
        # frame with the output schema (threshold keeps the feature's
        # type) instead of dividing by zero below
        return ranged.limit(0).select(
            F.col("value").alias("threshold"),
            F.lit(None).cast("long").alias("n_left"),
            F.lit(None).cast("long").alias("pos_left"),
            F.lit(None).cast("long").alias("n_right"),
            F.lit(None).cast("long").alias("pos_right"),
            F.lit(None).cast("double").alias("gini_root"),
            F.lit(None).cast("double").alias("gini_split"),
            F.lit(None).cast("double").alias("gain"),
        )
    cmap = F.create_map(*[F.lit(v) for kv in sorted(carry_c.items()) for v in kv])
    pmap = F.create_map(*[F.lit(v) for kv in sorted(carry_p.items()) for v in kv])
    w = (
        Window.partitionBy("__pid")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    nl = (F.sum("cnt").over(w) + F.element_at(cmap, F.col("__pid"))).cast("long")
    pl = (F.sum("pos").over(w) + F.element_at(pmap, F.col("__pid"))).cast("long")
    per = ranged.select(
        F.col("value"), nl.alias("nl"), pl.alias("pl")
    ).where(F.col("nl") < F.lit(n_total))  # the max value splits nothing off
    nr = F.lit(n_total) - F.col("nl")
    pr = F.lit(p_total) - F.col("pl")
    nld, nrd = F.col("nl").cast("double"), nr.cast("double")
    pld, prd = F.col("pl").cast("double"), pr.cast("double")
    # nl·gini(left) = nl − (pl² + (nl−pl)²)/nl, exact-count-backed
    wl = nld - (pld * pld + (nld - pld) * (nld - pld)) / nld
    wr = nrd - (prd * prd + (nrd - prd) * (nrd - prd)) / nrd
    impurity = (wl + wr) / F.lit(float(n_total))
    best = per.agg(
        F.min(
            F.struct(
                impurity.alias("imp"),
                F.col("value").alias("v"),
                F.col("nl").alias("nl"),
                F.col("pl").alias("pl"),
            )
        ).alias("b")
    )
    nt, pt = float(n_total), float(p_total)
    # explicit multiplies (not pow) so the SQL twin's x*x matches bit-for-bit
    gini_root = 1.0 - (pt / nt) * (pt / nt) - ((nt - pt) / nt) * ((nt - pt) / nt)
    b = F.col("b")
    return best.select(
        b["v"].alias("threshold"),
        b["nl"].alias("n_left"),
        b["pl"].alias("pos_left"),
        (F.lit(n_total) - b["nl"]).alias("n_right"),
        (F.lit(p_total) - b["pl"]).alias("pos_right"),
        F.round(F.lit(gini_root), 6).alias("gini_root"),
        F.round(b["imp"], 6).alias("gini_split"),
        F.round(F.lit(gini_root) - b["imp"], 6).alias("gain"),
    )
