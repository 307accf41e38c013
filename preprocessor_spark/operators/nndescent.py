"""NN-Descent: distributed approximate k-NN graph construction.

`operators/graph.py`'s triangle/PageRank analytics consume a kNN graph, and
the exact builder (`similarity.cosine_topk` all-pairs GEMM) is O(N²·d) by
definition — fine at 20k vectors, impossible at 100 TB. NN-Descent (Dong,
Moses & Li, WWW 2011: "Efficient K-Nearest Neighbor Graph Construction for
Generic Similarity Measures") converges to a high-recall kNN graph in a few
rounds of purely LOCAL work: my neighbors' neighbors are probably my
neighbors. Per round each node's (forward ∪ reverse) neighborhood — capped
at ``rho * k`` — proposes all intra-neighborhood pairs, new pairs are
scored, and each node keeps its top-k. Work per round is
O(N · (ρk)² · d): linear in N, no all-pairs anywhere.

Spark shape (everything keyed, deterministic, fixed-seed planes only):
- init: sign-LSH bucket seeding (the Spark analogue of pynndescent's
  RP-tree init) — two independent random-hyperplane bands put similar
  vectors in shared buckets, a coarse md5 ring guarantees coverage, and
  within each bucket nodes pair along a 2k-wide ring in md5 order, so seed
  work is O(k) per node regardless of bucket skew and the starting graph
  is reproducible across repartitionings. (Purely random md5 buckets
  measured ~0.1-recall fixpoints on clustered corpora: with k junk seed
  edges the local join has nothing good to propagate.)
- round: reverse edges union forward edges → per-node neighborhood bounded
  to the ``cap`` BEST neighbors by (sim desc, id) — a hub proposes at most
  cap² pairs, and the candidate pool stays the high-quality fwd∪rev set the
  NN-descent local join needs → intra-neighborhood pairs via explode×
  explode (JVM) → NEW pairs only (left-anti vs scored) → one Arrow-batched
  pandas UDF scores cosines with a row-block GEMM → union + per-node
  bounded top-k window.
- ties break on (sim desc, neighbor id asc) with 1e-6-rounded sims, the
  repo-wide determinism idiom, so results are stable under repartition.

The graded query (`knn_graph_nndescent`) is rows-only (approximate by
contract); `tests/test_nndescent.py` plants recall floors vs the exact
brute-force graph, asserts the plan carries no CartesianProduct, and checks
repartition determinism.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _cosine_pairs_udf():
    """Row-wise cosine of two array columns, one numpy block per Arrow
    batch (no per-row Python). Built lazily: the pandas_udf decorator needs
    an active session."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _cosine_pairs(a: pd.Series, b: pd.Series) -> pd.Series:
        ma = np.array(a.tolist(), dtype="float64")
        mb = np.array(b.tolist(), dtype="float64")
        na = np.linalg.norm(ma, axis=1)
        nb = np.linalg.norm(mb, axis=1)
        denom = na * nb
        denom[denom == 0] = 1.0
        return pd.Series((ma * mb).sum(axis=1) / denom)

    return _cosine_pairs


def _score(
    pairs: DataFrame,
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    broadcast_vectors: bool = False,
) -> DataFrame:
    """(src, dst) -> (src, dst, sim): two keyed equi-joins attach the
    vectors, one vectorized UDF scores. Sims round to 1e-6 for stable ties.
    ``broadcast_vectors`` (decided once by the caller from N) turns both
    attach joins map-side — the pair stream then never shuffles."""
    va = vectors.select(F.col(id_col).alias("src"), F.col(vec_col).alias("__va"))
    vb = vectors.select(F.col(id_col).alias("dst"), F.col(vec_col).alias("__vb"))
    if broadcast_vectors:
        va, vb = F.broadcast(va), F.broadcast(vb)
    return (
        pairs.join(va, "src")
        .join(vb, "dst")
        .select(
            "src",
            "dst",
            F.round(_cosine_pairs_udf()(F.col("__va"), F.col("__vb")), 6).alias(
                "sim"
            ),
        )
    )


def _topk(edges: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("src").orderBy(F.desc("sim"), F.asc("dst"))
    return (
        edges.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def nndescent_knn_graph(
    vectors: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 10,
    rounds: int = 3,
    rho: float = 2.0,
    exact_below: int = 4096,
    broadcast_vector_limit: int = 2_000_000,
) -> DataFrame:
    """Approximate directed kNN graph: (src, dst, sim, rank), k rows per
    node. ``rounds`` fixed (not convergence-polled) for plan determinism;
    3 rounds reach >0.9 recall on clustered corpora (Dong et al. report
    ~5 rounds to 0.99 on uniform data).

    ``exact_below``: below this N the iterative machinery costs more than
    the answer — the blocked exact GEMM (`similarity.cosine_topk`) is both
    faster AND recall-1.0 there, so route to it (pynndescent does the
    same below its tree threshold). Pass 0 to force the iterative path
    (the recall/determinism tests do). ``broadcast_vector_limit``: while N
    fits, the per-round scoring joins broadcast the vector table instead
    of shuffling the pair stream — past it the keyed joins engage."""
    import math

    from preprocessor_spark.operators.similarity import _bucket_expr

    n = vectors.count()
    if n <= exact_below:
        from preprocessor_spark.operators.similarity import cosine_topk

        # self-exclusion, 1e-6-rounded (cosine desc, id asc) ranking, and
        # the rank column all match the iterative path's output contract
        return cosine_topk(
            vectors, vectors, vec_col, id_col, k=k, engine="arrow"
        ).select(
            F.col("query_id").alias("src"),
            F.col("neighbor_id").alias("dst"),
            F.round("cosine", 6).alias("sim"),
            "rank",
        )

    cap = max(int(rho * k), k + 1)
    bcast = n <= broadcast_vector_limit
    dim = len(vectors.select(vec_col).first()[0])

    # --- seeding: sign-LSH buckets put SIMILAR vectors together (the
    # Spark-shaped analogue of pynndescent's RP-tree init — random md5
    # buckets measured ~0.1 recall fixpoints on clustered corpora), plus a
    # global md5 ring so every node is guaranteed >=1 seed edge. Within a
    # bucket nodes pair along a ring of width 2k in md5 order: per-node
    # seed work is O(k) NO MATTER how skewed a bucket is (a 10^6-member
    # identical-vector bucket stays linear, not quadratic).
    nbits = max(1, int(math.ceil(math.log2(max(n / max(4 * k, 1), 2)))))
    rng = np.random.RandomState(13)
    ids = vectors.select(F.col(id_col).alias("src"), F.col(vec_col))
    ring_w = 2 * k
    seed_parts = []
    # global ring: coverage for nodes isolated by the LSH bands. Coarse md5
    # buckets (expected ~64k members; 1 bucket at small n) rather than
    # lit(0): a constant join key folds to a CartesianProduct plan, a
    # non-foldable md5 expression keeps every seed join a hash join.
    ring_buckets = max(n // (64 * k), 1)
    ring_expr = (
        F.conv(F.substring(F.md5(F.col("src").cast("string")), 1, 8), 16, 10)
        .cast("bigint") % F.lit(ring_buckets)
    )
    buckets = [
        _bucket_expr(F.col(vec_col), rng.randn(nbits, dim)),
        _bucket_expr(F.col(vec_col), rng.randn(nbits, dim)),
        ring_expr,
    ]
    for bexpr in buckets:
        b = ids.select("src", bexpr.alias("__b"))
        w_b = Window.partitionBy("__b").orderBy(F.md5(F.col("src").cast("string")))
        bb = b.withColumn("__rn", F.row_number().over(w_b)).withColumn(
            # bucket size from the SAME window partitioning — no separate
            # groupBy + join per bucket family
            "__sz",
            F.count(F.lit(1)).over(Window.partitionBy("__b")),
        )
        right = bb.select(
            "__b", F.col("__rn").alias("__prn"), F.col("src").alias("dst")
        )
        expanded = (
            bb
            .select(
                "__b",
                "src",
                "__rn",
                "__sz",
                F.explode(
                    # sequence(1,0) would count DOWN; singleton buckets get
                    # an empty partner list instead (explode drops the row)
                    F.when(
                        F.col("__sz") > 1,
                        F.sequence(
                            F.lit(1), F.least(F.lit(ring_w), F.col("__sz") - 1)
                        ),
                    ).otherwise(F.array().cast("array<int>"))
                ).alias("__j"),
            )
            .withColumn("__prn", (F.col("__rn") - 1 + F.col("__j")) % F.col("__sz") + 1)
        )
        seed_parts.append(expanded.join(right, ["__b", "__prn"]).select("src", "dst"))
    seeds = seed_parts[0]
    for p in seed_parts[1:]:
        seeds = seeds.union(p)
    seeds = seeds.filter(F.col("src") != F.col("dst")).distinct()
    # eager localCheckpoint, NOT persist: persist truncates recompute but
    # the logical plan still nests round over round and analyzer/optimizer
    # time grows superlinearly (profiled 10s -> 53s by round 3); the
    # checkpoint truncates the plan itself, same idiom as
    # connected_components / label_propagation
    edges = _topk(_score(seeds, vectors, id_col, vec_col, bcast), k)
    edges = edges.localCheckpoint(eager=True)

    for _ in range(rounds):
        undirected = edges.select("src", "dst", "sim").union(
            edges.select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), "sim"
            )
        )
        # bounded neighborhood per node: the cap best neighbors by sim
        # (id tie-break) — keeps hub fan-out from going quadratic while the
        # candidate pool stays the HIGH-QUALITY fwd∪rev neighborhood the
        # NN-descent local join needs (top-by-id slicing converges to
        # noise). ONE groupBy shuffle: collect_set dedups the (sim, dst)
        # mirror rows (sims are symmetric + 1e-6-rounded so both directions
        # carry identical structs), sort_array on (-sim, dst) orders by
        # quality, slice bounds to cap — no dropDuplicates or sort window.
        nbrs = (
            undirected.groupBy("src")
            .agg(
                F.slice(
                    F.sort_array(
                        F.collect_set(
                            F.struct(
                                (-F.col("sim")).alias("__ns"), F.col("dst")
                            )
                        )
                    ),
                    1,
                    cap,
                ).alias("__top")
            )
            .select(
                "src",
                F.transform(F.col("__top"), lambda s: s["dst"]).alias("__nbrs"),
            )
        )
        pairs = (
            nbrs.select(F.explode("__nbrs").alias("a"), F.col("__nbrs"))
            .select("a", F.explode("__nbrs").alias("b"))
            .filter(F.col("a") < F.col("b"))
            .distinct()
        )
        # score each UNORDERED pair once and mirror the scored rows:
        # cosine is bitwise direction-symmetric (elementwise multiply and
        # the norm product are IEEE-commutative, the sum runs in vector-
        # element order either way), so (b,a,sim) is exactly the row the
        # old both-directions scoring produced — half the Arrow transfer
        # and half the GEMM rows per round. NOTE the anti-join input now
        # includes candidate pairs already present (in one or both
        # directions) in the kept edge set — those rows re-score through
        # the Arrow/GEMM path and are only then dropped; pre-filtering
        # fully-known pairs with a canonical (least,greatest) anti join
        # was A/B'd at derived sf1 and REGRESSED 10.1 → 17.4 s (the
        # per-round known-pair groupBy + anti join over the candidate
        # stream costs more than the skipped scoring saves), so the
        # re-scoring stays deliberate. The existing-edge anti join runs
        # AFTER the mirror: already-kept directions must be dropped so a
        # known neighbor does not occupy two rank slots in the merge.
        scored_c = _score(
            pairs.select(F.col("a").alias("src"), F.col("b").alias("dst")),
            vectors,
            id_col,
            vec_col,
            bcast,
        )
        scored = scored_c.union(
            scored_c.select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), "sim"
            )
        )
        new = scored.join(edges.select("src", "dst"), ["src", "dst"], "left_anti")
        merged = _topk(edges.union(new), k)
        edges = merged.localCheckpoint(eager=True)

    w = Window.partitionBy("src").orderBy(F.desc("sim"), F.asc("dst"))
    return edges.select("src", "dst", "sim", F.row_number().over(w).alias("rank"))
