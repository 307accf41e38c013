"""Maximal Marginal Relevance (MMR) re-ranking of ANN candidates.

RAG retrieval returns near-duplicate passages; MMR (Carbonell & Goldstein,
SIGIR 1998 — public method) greedily picks the next document maximizing
``λ·relevance − (1−λ)·max_similarity_to_already_picked``, trading
relevance against diversity.

Spark shape: MMR is sequential PER QUERY but embarrassingly parallel
ACROSS queries — exactly the ``applyInPandas`` contract. Candidates come
from an upstream ANN stage (top-N per query, N bounded by construction),
their vectors join in via TWO keyed equi-joins (neighbor id, query id),
and each query group runs one numpy greedy loop over an N×N block — the
same bounded-per-group pattern as the cogrouped as-of join. No cross
product, no driver-side loop; 100 TB of queries just means more groups.

Determinism: relevance is rounded to 1e-6 before comparison and ties
break on the neighbor id ascending, so the greedy trajectory is unique —
asserted equal to a pure-Python reference in tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from preprocessor_spark.operators.similarity import _normalized


def mmr_py(
    rel: np.ndarray, vecs: np.ndarray, ids: np.ndarray, k: int, lam: float
) -> list[int]:
    """Reference greedy MMR over one candidate set (unit-norm vectors).
    Returns the positions picked, in pick order. Shared by the distributed
    kernel and the tests (the test reimplements it independently)."""
    n = len(ids)
    k = min(k, n)
    sims = vecs @ vecs.T  # N×N, bounded by the candidate count
    rel6 = np.round(rel, 6)
    picked: list[int] = []
    rest = list(range(n))
    while len(picked) < k:
        if picked:
            max_sim = np.round(sims[np.ix_(rest, picked)].max(axis=1), 6)
            score = lam * rel6[rest] - (1.0 - lam) * max_sim
        else:
            score = lam * rel6[rest]
        # unique argmax: score desc, neighbor id asc
        order = np.lexsort((ids[rest], -score))
        best = rest[order[0]]
        picked.append(best)
        rest.remove(best)
    return picked


def mmr_rerank(
    candidates: DataFrame,
    vectors: DataFrame,
    k: int = 5,
    lam: float = 0.5,
    query_col: str = "query_id",
    cand_col: str = "neighbor_id",
    rel_col: str = "relevance",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Re-rank each query's candidate list with greedy MMR.

    ``candidates``: (query_col, cand_col, rel_col) — the upstream ANN
    top-N. ``vectors``: (vec_id_col, vec_col) — the embedding table.
    Returns (query_col, cand_col, rel_col, mmr_rank) with mmr_rank 1..k in
    pick order.
    """
    v = _normalized(vectors, vec_col, vec_id_col, "__vid", "__vec")
    enriched = candidates.select(
        F.col(query_col).alias("__q"),
        F.col(cand_col).alias("__c"),
        F.col(rel_col).cast("double").alias("__rel"),
    ).join(v, F.col("__c") == F.col("__vid")).drop("__vid")

    out_schema = (
        f"{query_col} long, {cand_col} long, {rel_col} double, mmr_rank int"
    )

    def _one_query(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("__c").reset_index(drop=True)
        ids = pdf["__c"].to_numpy()
        rel = pdf["__rel"].to_numpy(dtype="float64")
        vecs = np.array(pdf["__vec"].tolist(), dtype="float64")
        picked = mmr_py(rel, vecs, ids, k, lam)
        return pd.DataFrame(
            {
                query_col: pdf["__q"].iloc[0],
                cand_col: ids[picked],
                rel_col: rel[picked],
                "mmr_rank": np.arange(1, len(picked) + 1, dtype="int32"),
            }
        )

    return enriched.groupBy("__q").applyInPandas(_one_query, out_schema)
