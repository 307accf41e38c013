"""Offline retrieval-quality metrics: NDCG@k, MRR@k, recall@k, hit@k.

The evaluation half of the search family (BM25/TF-IDF in
:mod:`preprocessor_spark.operators.search`, the ANN stack in
``similarity``/``pq``): given per-query ranked results and a relevance
table (qrels), score the ranking the way IR evaluation does (Järvelin &
Kekäläinen 2002 for DCG; TREC conventions for MRR/recall).

Definitions per query, over the top ``k`` by ``rank``:

    DCG@k  = Σ_{i≤k} (2^rel_i − 1) / log2(i + 1)
    NDCG@k = DCG@k / IDCG@k   (IDCG from the qrels sorted by rel desc)
    MRR@k  = 1 / (first rank with rel > 0), 0 when none
    recall@k = |relevant retrieved in top k| / |relevant|
    hit@k  = 1 if any relevant in top k

Engine-portability: joins and counts are exact; the DCG sum is a
per-(query,rank) double term — ranks are distinct within a query, so the
sum is over ≤ k terms and both engines fold it through the SAME exact
integer-keyed groupBy (addition order over ≤ k doubles is fixed by
summing ordered-rank terms quantized to the 1e-9 int64 grid, the repo's
window-sum contract). log2/pow are evaluated per (rel, rank) cell —
deterministic libm calls on identical doubles (the mutual-information
precedent). VALUE-oracle-able.

Scale shape: one broadcast-or-keyed join of results×qrels + two keyed
groupBys; queries are unbounded, per-query work is O(k).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ranking_metrics(
    results: DataFrame,
    qrels: DataFrame,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
    k: int = 10,
) -> DataFrame:
    """Per-query metrics frame: (query, n_retrieved, n_relevant, ndcg,
    mrr, recall, hit). ``rank`` must be 1-based and unique per query;
    ``rel`` is a non-negative integer gain (0 = not relevant)."""
    r = results.select(
        F.col(query_col).alias("q"),
        F.col(doc_col).alias("d"),
        F.col(rank_col).cast("int").alias("rank"),
    ).where(F.col(rank_col) <= k)
    g = qrels.select(
        F.col(query_col).alias("q"),
        F.col(doc_col).alias("d"),
        F.col(rel_col).cast("int").alias("rel"),
    ).where(F.col(rel_col) > 0)

    j = r.join(g, ["q", "d"], "left").select(
        "q", "rank", F.coalesce("rel", F.lit(0)).alias("rel")
    )
    # quantized-int64 sum of the ordered DCG terms: each term is an
    # identical double in any engine (2^rel and log2(rank+1) of small
    # ints), and int sums are order-free
    term = (
        F.pow(F.lit(2.0), F.col("rel").cast("double")) - F.lit(1.0)
    ) / F.log2(F.col("rank").cast("double") + F.lit(1.0))
    qterm = F.floor(term * F.lit(1e9) + F.lit(0.5)).cast("long")
    per_q = j.groupBy("q").agg(
        (F.sum(qterm).cast("double") / F.lit(1e9)).alias("dcg"),
        F.min(F.when(F.col("rel") > 0, F.col("rank"))).alias("first_rel"),
        F.sum(F.when(F.col("rel") > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_rel_retrieved"),
        F.count(F.lit(1)).cast("long").alias("n_retrieved"),
    )
    # ideal DCG from the qrels alone: rank rels desc within query
    from pyspark.sql.window import Window

    wq = Window.partitionBy("q").orderBy(
        F.col("rel").desc(), F.col("d").asc()
    )
    ideal = (
        g.withColumn("irank", F.row_number().over(wq))
        .where(F.col("irank") <= k)
        .select(
            "q",
            (
                F.floor(
                    (
                        (
                            F.pow(F.lit(2.0), F.col("rel").cast("double"))
                            - F.lit(1.0)
                        )
                        / F.log2(F.col("irank").cast("double") + F.lit(1.0))
                    )
                    * F.lit(1e9)
                    + F.lit(0.5)
                ).cast("long")
            ).alias("qt"),
        )
        .groupBy("q")
        .agg((F.sum("qt").cast("double") / F.lit(1e9)).alias("idcg"))
    )
    n_rel = g.groupBy("q").agg(F.count(F.lit(1)).cast("long").alias("n_relevant"))

    out = (
        per_q.join(ideal, "q", "left")
        .join(n_rel, "q", "left")
        .select(
            F.col("q").alias(query_col),
            "n_retrieved",
            F.coalesce("n_relevant", F.lit(0)).alias("n_relevant"),
            F.when(
                F.coalesce(F.col("idcg"), F.lit(0.0)) > 0,
                F.col("dcg") / F.col("idcg"),
            )
            .otherwise(F.lit(0.0))
            .alias("ndcg"),
            F.when(
                F.col("first_rel").isNotNull(),
                F.lit(1.0) / F.col("first_rel").cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("mrr"),
            F.when(
                F.coalesce(F.col("n_relevant"), F.lit(0)) > 0,
                F.col("n_rel_retrieved").cast("double")
                / F.col("n_relevant").cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("recall"),
            (F.col("n_rel_retrieved") > 0).alias("hit"),
        )
    )
    return out
