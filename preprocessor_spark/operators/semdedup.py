"""SemDeDup-style semantic deduplication over embedding columns.

The published recipe (Abbas et al., "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication", 2023) prunes a corpus by
(1) k-means clustering the embeddings, (2) computing pairwise cosine
similarity ONLY within each cluster, and (3) dropping all but one member of
every within-cluster near-duplicate set. Clustering is what makes the
quadratic pair step tractable: at 100 TB the all-pairs product is
impossible, but per-cluster products are (N/k)² and embarrassingly
parallel across clusters.

Spark mapping:

- centroids: spherical k-means on a bounded driver-side sample (the
  centroid matrix is k×d floats — broadcast-sized by construction; same
  trainer as the IVF index in :mod:`.similarity`);
- assignment: ONE Arrow-batched pandas UDF argmax (B×d @ d×k per batch) —
  a narrow projection, no shuffle;
- pairs: ``applyInPandas`` over ``groupBy(cluster)`` — one keyed shuffle;
  each task runs a single in-memory GEMM for its cluster and emits only
  the above-threshold pairs. A ``max_cluster_rows`` guard fails fast if a
  cluster would not fit the quadratic step (the fix is more clusters, the
  same dial the paper uses);
- keep policy: connected components over the pair graph, keep the min-id
  representative (deterministic; the paper keeps a random/centroid-far
  member — min-id is the reproducible choice).

Unlike the LSH near-dup path (:func:`.dedup.embedding_neardup_pairs`),
recall here is scoped BY DESIGN to within-cluster pairs — cross-cluster
near-dups are invisible. That is the SemDeDup trade: k controls both cost
and the blind spot, so both operators stay available.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from preprocessor_spark.operators.graph import dedup_keep_canonical


def train_spherical_centroids(
    df: DataFrame,
    vec_col: str,
    n_clusters: int,
    sample_rows: int = 2048,
    iters: int = 5,
    seed: int = 7,
) -> np.ndarray:
    """k×d unit-norm centroid matrix from a bounded driver-side sample.

    The sample is ``limit(sample_rows)`` — bounded collect, never the full
    column. Lloyd iterations run on the driver (k×d and s×d numpy arrays);
    the result is broadcast-sized regardless of corpus size."""
    sample = np.array(
        [r[0] for r in df.select(vec_col).limit(sample_rows).collect()],
        dtype="float64",
    )
    if len(sample) == 0:
        raise ValueError("cannot train centroids on an empty input")
    norms = np.linalg.norm(sample, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    sample = sample / norms
    k = min(n_clusters, len(sample))
    rng = np.random.RandomState(seed)
    cents = sample[rng.choice(len(sample), k, replace=False)]
    for _ in range(iters):
        assign = (sample @ cents.T).argmax(axis=1)
        for c in range(k):
            members = sample[assign == c]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cents[c] = v / n
    return cents


def assign_clusters(
    df: DataFrame,
    vec_col: str,
    centroids: np.ndarray,
    cluster_col: str = "cluster",
    norm_col: str | None = None,
) -> DataFrame:
    """Nearest-centroid id per row via one vectorized pandas UDF (narrow —
    no shuffle). If ``norm_col`` is set, the L2-normalized vector is kept
    under that name for downstream cosine math."""
    cmat = centroids.T  # d×k

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("struct<cluster: int, vnorm: array<double>>")
    def _assign(vecs: pd.Series) -> pd.DataFrame:
        m = np.array(vecs.tolist(), dtype="float64")
        n = np.linalg.norm(m, axis=1, keepdims=True)
        n[n == 0] = 1.0
        m = m / n
        cl = (m @ cmat).argmax(axis=1).astype("int32")
        return pd.DataFrame({"cluster": cl, "vnorm": list(m)})

    out = df.withColumn("__a", _assign(F.col(vec_col)))
    out = out.withColumn(cluster_col, F.col("__a.cluster"))
    if norm_col is not None:
        out = out.withColumn(norm_col, F.col("__a.vnorm"))
    return out.drop("__a")


def semantic_dedup_pairs(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float = 0.95,
    n_clusters: int = 16,
    sample_rows: int = 2048,
    iters: int = 5,
    seed: int = 7,
    max_cluster_rows: int = 100_000,
    collapse_exact: bool = True,
) -> DataFrame:
    """(id_a, id_b, cosine, cluster) for within-cluster pairs with cosine ≥
    threshold; id_a < id_b. One narrow assignment pass + one shuffle keyed
    by cluster; each cluster's GEMM runs in a single task.

    ``collapse_exact`` (default): byte-identical vectors group on a content
    hash first; clustering + the quadratic GEMM run on one representative
    per distinct vector and pairs expand back through keyed joins
    (within-group pairs are cosine-1.0 by identity). Replicated corpora
    otherwise square the per-cluster GEMM cost — measured 16 s → ~2 s on a
    10-way-duplicated derived-sf1 embedding table, output identical."""
    if collapse_exact:
        # to_json is null-preserving — concat_ws would silently DROP null
        # array elements, hashing [1.0, NULL, 2.0] and [1.0, 2.0] to the
        # same group and mislabeling them cosine-1.0 exact duplicates
        m = df.filter(F.col(vec_col).isNotNull()).select(
            F.col(id_col).alias("__mid"),
            F.md5(F.to_json(F.struct(F.col(vec_col).alias("v")))).alias("__g"),
        )
        reps = m.groupBy("__g").agg(F.min("__mid").alias("__rid"))
        rep_rows = df.join(
            reps.select(F.col("__rid").alias(id_col)), id_col, "left_semi"
        ).select(id_col, vec_col)
        rep_pairs = semantic_dedup_pairs(
            rep_rows, vec_col, id_col, threshold, n_clusters, sample_rows,
            iters, seed, max_cluster_rows, collapse_exact=False,
        )
        ga = reps.select(F.col("__rid").alias("id_a"), F.col("__g").alias("__ga"))
        gb = reps.select(F.col("__rid").alias("id_b"), F.col("__g").alias("__gb"))
        ma = m.select(F.col("__mid").alias("__a"), F.col("__g").alias("__ga"))
        mb = m.select(F.col("__mid").alias("__b"), F.col("__g").alias("__gb"))
        cross = (
            rep_pairs.join(ga, "id_a")
            .join(gb, "id_b")
            .select("__ga", "__gb", "cosine", "cluster")
            .join(ma, "__ga")
            .join(mb, "__gb")
            .select(
                F.least("__a", "__b").alias("id_a"),
                F.greatest("__a", "__b").alias("id_b"),
                "cosine",
                "cluster",
            )
        )
        # identical vectors pair at cosine exactly 1.0 whatever the
        # clustering; they carry the sentinel cluster -1 (their group may
        # be a singleton in rep space, so no cluster was assigned to name)
        x, y = m.alias("x"), m.alias("y")
        within = x.join(
            y, (F.col("x.__g") == F.col("y.__g")) & (F.col("x.__mid") < F.col("y.__mid"))
        ).select(
            F.col("x.__mid").alias("id_a"),
            F.col("y.__mid").alias("id_b"),
            F.lit(1.0).alias("cosine"),
            F.lit(-1).cast("int").alias("cluster"),
        )
        return within.unionByName(cross)

    cents = train_spherical_centroids(df, vec_col, n_clusters, sample_rows, iters, seed)
    assigned = assign_clusters(df, vec_col, cents, "__cluster", "__vn").select(
        F.col(id_col).alias("__id"), "__cluster", "__vn"
    )

    def _cluster_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) > max_cluster_rows:
            raise RuntimeError(
                f"cluster {int(pdf['__cluster'].iloc[0])} has {len(pdf)} rows "
                f"(> max_cluster_rows={max_cluster_rows}); raise n_clusters"
            )
        if len(pdf) < 2:
            return pd.DataFrame(
                {"id_a": [], "id_b": [], "cosine": [], "cluster": []}
            ).astype({"id_a": "int64", "id_b": "int64", "cosine": "float64", "cluster": "int32"})
        ids = pdf["__id"].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        m = np.array(pdf["__vn"].tolist(), dtype="float64")[order]
        sims = m @ m.T
        ia, ib = np.triu_indices(len(ids), k=1)
        keep = sims[ia, ib] >= threshold
        return pd.DataFrame(
            {
                "id_a": ids[ia[keep]],
                "id_b": ids[ib[keep]],
                "cosine": sims[ia[keep], ib[keep]],
                "cluster": np.full(int(keep.sum()), int(pdf["__cluster"].iloc[0]), dtype="int32"),
            }
        )

    return assigned.groupBy("__cluster").applyInPandas(
        _cluster_pairs, "id_a bigint, id_b bigint, cosine double, cluster int"
    )


def semantic_dedup(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float = 0.95,
    n_clusters: int = 16,
    sample_rows: int = 2048,
    iters: int = 5,
    seed: int = 7,
    max_cluster_rows: int = 100_000,
    collapse_exact: bool = True,
) -> DataFrame:
    """Corpus minus semantic near-duplicates: every within-cluster
    duplicate set keeps only its min-id member (singletons always
    survive). Pair graph → connected components → anti join."""
    pairs = semantic_dedup_pairs(
        df, vec_col, id_col, threshold, n_clusters, sample_rows, iters, seed,
        max_cluster_rows, collapse_exact,
    )
    return dedup_keep_canonical(df, pairs, id_col)
