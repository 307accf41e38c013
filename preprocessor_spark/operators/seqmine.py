"""Sequential-pattern mining over per-key ordered event streams —
frequent consecutive k-grams ("view>click>purchase"), the cheap
PrefixSpan tier that answers most "what do users do next" questions.

A consecutive k-gram census needs no candidate generation at all: the
k-gram starting at each event is ``concat_ws('>', token, lead(token, 1),
…, lead(token, k−1))`` over the per-key order — ONE keyed window exchange
— and support is one map-side-combined groupBy over the gram strings.
Counts are exact ints, so the report is fully value-oracle-able (the SQL
twin is the same LEAD windows).

Scale shape: one Exchange on the key column (all k−1 leads share it), one
groupBy(gram) aggregation, TakeOrderedAndProject for the top-k. State
never exceeds the gram cardinality; no pair joins, no explosion beyond
one row per event.

The reference library has no sequence analytics; this extends the event
tier (sessionize/funnel/markov transitions) one level up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def frequent_sequences(
    df: DataFrame,
    key_col: str,
    order_col: str,
    token_col: str,
    k: int = 3,
    min_count: int = 1,
    top: int | None = None,
) -> DataFrame:
    """Top consecutive k-grams of ``token_col`` per ``key_col`` ordered by
    ``order_col``.

    Returns (seq, n_occurrences, n_keys): total occurrence count and the
    number of distinct keys the gram appears under. ``order_col`` must be
    unique per key (the EWMA/holt ordering contract) for deterministic
    grams. Grams that would cross a key boundary are excluded (the lead
    window is per-key). ``min_count`` is an absolute occurrence threshold.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    w = Window.partitionBy(key_col).orderBy(order_col)
    base = df.where(
        F.col(key_col).isNotNull()
        & F.col(order_col).isNotNull()
        & F.col(token_col).isNotNull()
    )
    parts = [F.col(token_col)] + [
        F.lead(token_col, i).over(w) for i in range(1, k)
    ]
    staged = base.select(
        F.col(key_col).alias("__k"),
        *[p.alias(f"__t{i}") for i, p in enumerate(parts)],
    ).where(F.col(f"__t{k - 1}").isNotNull())
    gram = F.concat_ws(">", *[F.col(f"__t{i}") for i in range(k)])
    out = (
        staged.select("__k", gram.alias("seq"))
        .groupBy("seq")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("__k").alias("n_keys"),
        )
        .where(F.col("n_occurrences") >= min_count)
        .orderBy(F.desc("n_occurrences"), F.asc("seq"))
    )
    return out.limit(top) if top else out
