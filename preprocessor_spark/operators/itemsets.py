"""Market-basket co-occurrence mining — frequent pairs, support and lift.

The 2-itemset core of Apriori/FP-growth (Agrawal & Srikant, VLDB 1994),
the shape that actually matters at 100 TB: pairs are where candidate
explosion starts, and downward closure says a pair can only be frequent if
both items are — so items are support-pruned BEFORE any pair forms. The
pipeline is all keyed DataFrame ops:

1. distinct (basket, item) — one exchange, map-side combined;
2. item supports via groupBy(item) (output = |items|, broadcast back);
3. the only quadratic step — the within-basket self-join — runs AFTER the
   frequency prune, keyed on basket, emitting ordered pairs (a < b) only;
4. groupBy(a, b) counts, then support / confidence / lift as deterministic
   double divisions of EXACT int64 counts (lift = pair·N / (cnt_a·cnt_b) —
   integer numerator and denominator, so any SQL engine reproduces the
   value bit-for-bit: VALUE-oracle-able).

Skew guard: a mega-basket with k items emits C(k,2) pairs; ``max_basket``
drops baskets above the cap (loudly countable by the caller via the
returned frame's provenance — the default None keeps everything, the TPC-H
order baskets are ≤7 rows). Reference counterpart: the preprocessor's
value_counts surface (`/root/reference/clearbox_preprocessor/preprocessor.py`)
stops at single-column frequencies; this is the cross-column extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def frequent_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_item_count: int = 1,
    min_pair_count: int = 1,
    max_basket: int | None = None,
) -> DataFrame:
    """Ordered item pairs (item_a < item_b) co-occurring in baskets, with
    exact counts and support/confidence/lift. All thresholds are absolute
    counts (fractions don't survive engine-portable rounding)."""
    if min_item_count < 1 or min_pair_count < 1:
        raise ValueError("count thresholds must be >= 1")
    pairs_src = (
        df.select(F.col(basket_col).alias("b"), F.col(item_col).alias("i"))
        .where(F.col("b").isNotNull() & F.col("i").isNotNull())
        .distinct()
    )
    if max_basket is not None:
        from pyspark.sql import Window

        sz = F.count(F.lit(1)).over(Window.partitionBy("b"))
        pairs_src = pairs_src.withColumn("__sz", sz).where(
            F.col("__sz") <= max_basket
        ).drop("__sz")

    n_baskets = pairs_src.select(F.countDistinct("b").alias("n"))  # 1 row
    item_counts = pairs_src.groupBy("i").agg(F.count(F.lit(1)).alias("cnt"))
    frequent = item_counts.where(F.col("cnt") >= min_item_count)

    # downward-closure prune BEFORE the quadratic step (broadcast: |items|)
    pruned = pairs_src.join(F.broadcast(frequent), "i").select("b", "i", "cnt")
    left = pruned.select("b", F.col("i").alias("item_a"), F.col("cnt").alias("cnt_a"))
    right = pruned.select("b", F.col("i").alias("item_b"), F.col("cnt").alias("cnt_b"))
    pair_counts = (
        left.join(right, "b")
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b", "cnt_a", "cnt_b")
        .agg(F.count(F.lit(1)).alias("pair_cnt"))
        .where(F.col("pair_cnt") >= min_pair_count)
    )
    out = pair_counts.crossJoin(F.broadcast(n_baskets))
    n = F.col("n").cast("double")
    return out.select(
        "item_a",
        "item_b",
        "pair_cnt",
        "cnt_a",
        "cnt_b",
        F.round(F.col("pair_cnt") / n, 6).alias("support"),
        F.round(F.col("pair_cnt").cast("double") / F.col("cnt_a"), 6).alias(
            "confidence_a"
        ),
        F.round(
            (F.col("pair_cnt") * F.col("n")).cast("double")
            / (F.col("cnt_a") * F.col("cnt_b")),
            6,
        ).alias("lift"),
    )


def association_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_item_count: int = 1,
    min_pair_count: int = 1,
    max_basket: int | None = None,
    min_confidence: float = 0.0,
) -> DataFrame:
    """Directed association rules A → B from the frequent-pair lattice —
    the rule-induction step of Apriori (Agrawal & Srikant, VLDB 1994 §1.1)
    on 2-itemsets, with the standard interestingness measures:

    - ``confidence`` = P(B|A) = pair/cnt_A;
    - ``lift`` = P(A,B)/(P(A)P(B)) (symmetric, shared by both directions);
    - ``leverage`` = P(A,B) − P(A)P(B) (Piatetsky-Shapiro);
    - ``conviction`` = (1 − P(B)) / (1 − confidence) (Brin et al. 1997),
      NULL for confidence = 1 like mlxtend's inf.

    Scale shape: :func:`frequent_pairs` does all data-sized work (one
    distinct + one pruned basket self-join); the rule expansion doubles a
    |frequent pairs|-sized frame — model-sized, never the corpus. Every
    measure is a deterministic double over exact int64 counts, so the
    whole output is VALUE-oracle-able (DuckDB twin in __spark_entry__).
    """
    pairs = frequent_pairs(
        df,
        basket_col,
        item_col,
        min_item_count=min_item_count,
        min_pair_count=min_pair_count,
        max_basket=max_basket,
    ).select("item_a", "item_b", "pair_cnt", "cnt_a", "cnt_b", "lift")
    n_baskets = (
        df.select(F.col(basket_col).alias("b"), F.col(item_col).alias("i"))
        .where(F.col("b").isNotNull() & F.col("i").isNotNull())
        .select(F.countDistinct("b").alias("n"))
    )
    # both rule directions from one pair row: model-sized explode
    directed = pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("item_a").alias("antecedent"),
                    F.col("item_b").alias("consequent"),
                    F.col("cnt_a").alias("cnt_ante"),
                    F.col("cnt_b").alias("cnt_cons"),
                ),
                F.struct(
                    F.col("item_b").alias("antecedent"),
                    F.col("item_a").alias("consequent"),
                    F.col("cnt_b").alias("cnt_ante"),
                    F.col("cnt_a").alias("cnt_cons"),
                ),
            )
        ).alias("r"),
        F.col("pair_cnt"),
        F.col("lift"),
    ).select("r.*", "pair_cnt", "lift")
    n = F.col("n").cast("double")
    conf = F.col("pair_cnt").cast("double") / F.col("cnt_ante")
    p_cons = F.col("cnt_cons") / n
    out = (
        directed.crossJoin(F.broadcast(n_baskets))
        .select(
            "antecedent",
            "consequent",
            "pair_cnt",
            F.col("cnt_ante"),
            F.col("cnt_cons"),
            F.round(conf, 6).alias("confidence"),
            "lift",
            F.round(
                F.col("pair_cnt") / n - (F.col("cnt_ante") / n) * p_cons, 6
            ).alias("leverage"),
            F.round(
                F.when(conf < 1.0, (F.lit(1.0) - p_cons) / (F.lit(1.0) - conf)),
                6,
            ).alias("conviction"),
        )
        .where(F.col("confidence") >= F.lit(float(min_confidence)))
    )
    return out
