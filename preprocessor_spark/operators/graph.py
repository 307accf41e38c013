"""Connected components over candidate-pair graphs — the clustering step of
a complete dedup pipeline.

Near-dup detection (MinHash LSH / SimHash / n-gram Jaccard / embedding LSH,
see :mod:`preprocessor_spark.operators.dedup`) emits PAIRS; turning pairs
into keep/drop decisions needs the transitive closure: if A~B and B~C, then
{A,B,C} is one duplicate cluster and exactly one representative survives.

Algorithm: min-label propagation with POINTER JUMPING. Per round:

1. propagate — l(u) ← min(l(u), min over neighbors v of l(v)): one keyed
   join + one groupBy(min), both ordinary hash shuffles;
2. jump — l(u) ← l(l(u)): one self-join on the label table. Labels are
   always node ids, so the lookup is total.

Propagation alone needs O(diameter) rounds (a planted chain of 10k docs =
10k rounds); jumping compresses label chains geometrically, giving
O(log diameter) rounds — the same reason GraphFrames/Pregel CC and the
star-contraction family (Kiveris et al., "Connected Components in MapReduce
and Beyond", SoCC'14) beat naive propagation. Dedup graphs are near-cliques
that converge in 2-3 rounds; the log bound is insurance against adversarial
chains.

Each round's label table is checkpointed (``caching.checkpoint_frame``):
iterative lineage otherwise grows the logical plan every round and analysis
time explodes (the classic Spark iterative-algorithm trap). The default is
``localCheckpoint`` (executor-local, no FS round trip); set the
``caching.RELIABLE_CHECKPOINT_CONF`` session conf + a checkpoint dir to
make every fixpoint in this module survive executor loss on a real
cluster — localCheckpoint blocks die with their executor and a lost block
kills the job. Convergence is detected from the label-sum: labels only
ever decrease, so an unchanged sum IS the fixpoint — one tiny aggregate
per round instead of a join-and-count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from preprocessor_spark.caching import checkpoint_frame, register_persisted

# Per-round vertex-table broadcast budget for the fixpoint loops below —
# the same dial label_propagation ships with. ~8M nodes × tens of bytes is
# a few hundred MB broadcast: fine on real executors, and far under the
# 8 GB / 512M-row broadcast hard cap. Past it every loop degrades to its
# classic keyed-join (one-shuffle-per-round Pregel) shape.
_BROADCAST_VERTEX_LIMIT = 8_000_000
# ...and the floor under which broadcasting is NOT worth it: below ~half a
# million edges the loop's keyed join (already clamped to a few shuffle
# partitions by fixpoint_shuffle_scope) costs less than the per-round
# driver collect + rebroadcast of the vertex table (A/B-measured at sf0.1:
# the 72k-edge strong-tie graph and the dedup pair graphs got SLOWER under
# per-round broadcast; the 1.17M-edge trade graph got 1.6× faster).
_BROADCAST_MIN_EDGES = 500_000


def _maybe_broadcast(
    df: DataFrame,
    n_rows: int | None,
    edge_rows: int | None = None,
    limit: int = _BROADCAST_VERTEX_LIMIT,
) -> DataFrame:
    """Broadcast a vertex-sized frame into a per-round fixpoint join while
    its MEASURED row count stays under ``limit`` AND the edge table it
    joins is big enough (``edge_rows`` ≥ _BROADCAST_MIN_EDGES) for the
    avoided per-round edge exchange to beat the broadcast's driver
    round-trip (the label_propagation / pagerank discipline): the
    persisted edge table then never re-shuffles inside the loop — the join
    is a map-side BroadcastHashJoin and the only per-round exchange left
    is the vertex-bounded aggregate. Both counts come from the loop's own
    setup/convergence probes, so the decision is runtime-adaptive: at
    100 TB frontiers the vertex count exceeds the limit and the keyed join
    stands. Join RESULTS are identical either way; the downstream
    min/count aggregates are order-independent exact arithmetic, so the
    fixpoint output is bit-equal under both shapes."""
    if edge_rows is not None and edge_rows < _BROADCAST_MIN_EDGES:
        return df
    if n_rows is not None and n_rows <= limit:
        return F.broadcast(df)
    return df


def _driver_union_find(spark, edges: DataFrame) -> DataFrame:
    """Exact (id, component) table for a SMALL materialized symmetric edge
    list: min-representative union-find with path compression. component =
    min id reachable from id — the same identity the distributed min-label
    fixpoint converges to, so the returned table is equal row-for-row.
    Bounded by ``connected_components(driver_below=...)``; the collect is
    the only data movement (≤ driver_below rows of two ids)."""
    from pyspark.sql.types import StructField, StructType

    id_type = edges.schema["src"].dataType
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    nodes = set()
    for r in edges.collect():
        a, b = r["src"], r["dst"]
        nodes.add(a)
        nodes.add(b)
        ra, rb = find(a), find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra  # union by MIN root: the root IS the min id
    rows = [(x, find(x)) for x in sorted(nodes)]
    schema = StructType(
        [StructField("id", id_type, True), StructField("component", id_type, True)]
    )
    if rows:
        import pandas as pd

        # Arrow-path createDataFrame: ships as Arrow batches, not pickled Rows
        return spark.createDataFrame(
            pd.DataFrame(rows, columns=["id", "component"]), schema
        )
    return spark.createDataFrame(rows, schema)


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 25,
    symmetric_distinct: bool = False,
    driver_below: int = 200_000,
) -> DataFrame:
    """(id, component) for every id appearing in ``pairs``; ``component`` is
    the smallest id reachable from ``id`` (canonical representative).

    ``symmetric_distinct``: the caller asserts ``pairs`` is ALREADY a
    symmetric ((a,b) implies (b,a)), self-loop-free, duplicate-free edge
    list — skip the explode + |E|-sized ``distinct`` shuffle that
    symmetrization otherwise costs (dbscan's core-core subgraph is the
    in-repo case: derived from an already-symmetrized distinct edge list
    by a per-node filter, which preserves all three properties). The
    symmetrized edge SET is identical either way, so every min-label
    round — and therefore the output — is unchanged.

    ``driver_below``: when the MEASURED symmetric edge count is at or
    under this bound, solve on the driver with a min-representative
    union-find instead of running the distributed fixpoint — the same
    runtime-size-gated routing as ``nndescent_knn_graph(exact_below=...)``
    and the kmeans/PQ driver-side Lloyd's. A dedup pair graph small
    enough to collect (≤200k rows ≈ a few MB, far under the repo's 1M-row
    broadcast guards) costs 2-3 synchronous fixpoint rounds × several
    scheduler barriers each when solved distributively; union-find is
    microseconds and returns EXACTLY the same table (component = min
    reachable id — union by min root + path compression computes that
    identity directly; asserted against the fixpoint in
    tests/test_operators.py). At scale the gate never fires (edge lists
    are data-sized) and the fixpoint below is unchanged. Pass 0 to force
    the distributed path.

    Raises if not converged after ``max_iterations`` rounds (log-scale:
    25 rounds cover diameters ~2^25 with pointer jumping)."""
    if symmetric_distinct:
        edges = pairs.select(
            F.col(id_a).alias("src"), F.col(id_b).alias("dst")
        )
    else:
        # symmetric edge list via ONE explode — a union of two selects
        # would scan (and recompute) the possibly-expensive pairs input
        # twice before the persist below materializes. Self-loops drop out
        # (never change a min).
        edges = (
            pairs.select(
                F.explode(
                    F.array(
                        F.struct(F.col(id_a).alias("src"), F.col(id_b).alias("dst")),
                        F.struct(F.col(id_b).alias("src"), F.col(id_a).alias("dst")),
                    )
                ).alias("e")
            )
            .select("e.src", "e.dst")
            .filter(F.col("src") != F.col("dst"))
            .distinct()
        )
    edges = register_persisted(edges.persist())
    n_edges = edges.count()  # materializes the persist; sizes the fixpoint

    spark = pairs.sparkSession
    if n_edges <= driver_below:
        out = _driver_union_find(spark, edges)
        edges.unpersist()
        return out

    from preprocessor_spark.caching import fixpoint_shuffle_scope

    with fixpoint_shuffle_scope(spark, n_edges):
        # round-1 propagate fused into init: with identity labels, the
        # first round's message min is just min(neighbor id), so start
        # every node at min(id, min neighbor) directly — one groupBy
        # instead of a full join+groupBy+jump+checkpoint round
        # lazy checkpoint + probe: the convergence probe is the action that
        # materializes each round's checkpoint, so a round costs ONE job
        # (eager checkpoint + separate probe was two)
        labels = edges.groupBy(F.col("src").alias("id")).agg(
            F.least(F.first("src"), F.min("dst")).alias("component")
        ).transform(lambda df: checkpoint_frame(df, eager=False))
        n_nodes = labels.count()  # materializes; |V| is constant across rounds

        prev_sum = None
        for _ in range(max_iterations):
            # 1. propagate: my label vs my neighbors' labels. The label
            # table is vertex-sized — broadcast it (runtime-gated on the
            # measured |V|) so the persisted edge table never re-shuffles;
            # the vote groupBy partial-aggregates map-side, so its exchange
            # is vertex-bounded, not |E|-sized.
            msgs = edges.join(
                _maybe_broadcast(labels.withColumnRenamed("id", "src"), n_nodes, n_edges),
                "src",
            ).select(F.col("dst").alias("id"), "component")
            stage1 = (
                labels.unionByName(msgs).groupBy("id").agg(F.min("component").alias("component"))
            )
            # 2. pointer jump: follow my label's label (labels are node ids)
            lut = stage1.select(
                F.col("id").alias("cid"), F.col("component").alias("comp2")
            )
            jumped = stage1.join(
                _maybe_broadcast(lut, n_nodes, n_edges),
                stage1["component"] == lut["cid"],
                "left",
            ).select("id", F.coalesce("comp2", "component").alias("component"))
            labels = jumped.transform(lambda df: checkpoint_frame(df, eager=False))
            s = labels.agg(
                F.sum(F.col("component").cast("decimal(38,0)")).alias("s")
            ).collect()[0]["s"]
            if s == prev_sum:
                edges.unpersist()
                return labels
            prev_sum = s
    raise RuntimeError(
        f"connected_components did not converge in {max_iterations} iterations"
    )


def dedup_keep_canonical(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Drop every near-duplicate except the cluster representative (min id).

    Rows absent from ``pairs`` are singletons and always kept. One CC run +
    one left join + one filter — all keyed shuffles."""
    comps = connected_components(pairs, id_a=id_a, id_b=id_b)
    non_canonical = comps.filter(F.col("id") != F.col("component")).select("id")
    return df.join(
        non_canonical, df[id_col] == non_canonical["id"], "left_anti"
    )


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 10,
    damping: float = 0.85,
    skew_salt: int | None = None,
) -> DataFrame:
    """PageRank over a directed edge list — the link-graph quality signal
    web-corpus pipelines weight documents by (domain/page authority).

    Fixed-iteration synchronous power method with full dangling-mass
    redistribution:

        r'(v) = (1-d)/N + d * (Σ_{u→v} r(u)/deg(u) + dangling_mass/N)

    The iteration loop costs ZERO edge shuffles: the (deduped) edge table
    is hash-partitioned on ``dst`` ONCE up front and persisted, the |V|-row
    rank/share table is broadcast into the per-iteration join (rank tables
    are vertex-sized — tiny next to edges), and the contributions
    ``groupBy(dst)`` reuses the stored partitioning, so Catalyst plans it
    without an Exchange. Per round the only materialization is the
    ``localCheckpoint`` of the new |V|-row rank table (the same
    iterative-lineage trap as connected_components above).

    Returns (node, rank); ranks sum to 1 (tested). Deterministic up to
    float summation order — rows-only territory, graded by invariant +
    reference-implementation tests rather than a value oracle.

    100 TB: when |V| outgrows the broadcast budget, flip the per-iteration
    join to a shuffle join — the edge side is already partitioned and the
    plan degrades to the classic one-shuffle-per-iteration Pregel shape.
    Iterations are a constant (~10 is the conventional budget for ranking
    signals).

    ``skew_salt``: power-law graphs concentrate in-degree — a dst holding
    ~30% of edges pins ~30% of every iteration's aggregation into the one
    partition the dst-keyed layout assigns it. ``skew_salt=s`` partitions
    the edge table by (dst, hash(src) mod s) instead, spreading a hot dst
    over s partitions (measured in tests: max-partition edge share drops
    to ~1/s of the hot key's), and computes contributions as a two-stage
    aggregate — partial sum per (dst, salt) reusing the stored
    partitioning (no extra edge Exchange), then a final sum over the tiny
    (|dst|·s)-row partials. Ranks are identical up to float summation
    order (equivalence-tested against the numpy oracle at 1e-9).
    """
    n_part = edges.sparkSession.sparkContext.defaultParallelism
    base = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    if skew_salt:
        base = base.withColumn(
            "__salt", F.pmod(F.hash("src"), F.lit(int(skew_salt)))
        ).repartition(n_part, "dst", "__salt")
    else:
        base = base.repartition(n_part, "dst")
    e = register_persisted(base.persist())
    out_deg = e.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("__deg")
    )
    # static vertex table: every node with its out-degree (0 for dangling)
    nodes = register_persisted(
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .join(out_deg, on="node", how="left")
        .fillna({"__deg": 0})
        .persist()
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.select("node", F.lit(0.0).alias("rank"))
    ranks = nodes.select(
        "node", "__deg", F.lit(1.0 / n_nodes).alias("rank")
    ).transform(checkpoint_frame)

    for _ in range(iterations):
        shares = ranks.select(
            "node",
            F.when(F.col("__deg") > 0, F.col("rank") / F.col("__deg")).alias("__share"),
            F.when(F.col("__deg") == 0, F.col("rank")).otherwise(F.lit(0.0)).alias("__dangling"),
        )
        # dangling nodes (no out-edges) leak their rank; redistribute it
        dangling = shares.agg(F.sum("__dangling").alias("__dm"))
        joined = e.join(
            F.broadcast(shares.where(F.col("__share").isNotNull())
                        .select(F.col("node").alias("src"), "__share")),
            on="src",
        )
        if skew_salt:
            # partial per (dst, salt) reuses the stored partitioning; the
            # final agg shuffles only |dst|·salt partial rows
            contribs = (
                joined.groupBy("dst", "__salt")
                .agg(F.sum("__share").alias("__p"))
                .groupBy("dst")
                .agg(F.sum("__p").alias("__in"))
            )
        else:
            contribs = (
                joined.groupBy("dst")  # reuses e's dst partitioning: no Exchange
                .agg(F.sum("__share").alias("__in"))
            )
        ranks = (
            nodes.join(F.broadcast(contribs.withColumnRenamed("dst", "node")), on="node", how="left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                "__deg",
                (
                    F.lit((1.0 - damping) / n_nodes)
                    + F.lit(damping)
                    * (F.coalesce(F.col("__in"), F.lit(0.0)) + F.col("__dm") / n_nodes)
                ).alias("rank"),
            )
            .transform(checkpoint_frame)
        )
    return ranks.select("node", "rank")


def pagerank_exact(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 5,
    damping: float = 0.85,
) -> DataFrame:
    """Exact-replay PageRank: rank mass lives on an int64 10^15 grid, so
    the one order-dependent operation — summing contributions per dst —
    becomes an order-free integer sum, and every remaining float op is a
    fixed-order IEEE expression on identical doubles. A DuckDB oracle
    replays the whole power iteration bit-for-bit (the LPA/BFS
    integer-fixpoint discipline; see __spark_entry__._pagerank_oracle_sql).

    Per iteration (all quantities integer unless noted):

        share(u) = floor(double(q(u)) / deg(u) + 0.5)        deg > 0
        in(v)    = Σ_{u→v} share(u)                          int64 sum
        dm       = Σ_{deg(u)=0} q(u)
        q'(v)    = floor( (1-d)·(10^15/N)
                          + d·(double(in(v)) + double(dm)/N) + 0.5 )

    Same zero-edge-shuffle shape as :func:`pagerank` (edges partitioned on
    dst once, vertex-sized rank table broadcast per round). Output rank =
    double(q)/10^15 — within 1e-15·iterations of the float power method.
    The float :func:`pagerank` stays the production path for callers that
    want mass conservation to the last ulp.
    """
    n_part = edges.sparkSession.sparkContext.defaultParallelism
    base = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    e = register_persisted(base.repartition(n_part, "dst").persist())
    out_deg = e.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("__deg")
    )
    nodes = register_persisted(
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .join(out_deg, on="node", how="left")
        .fillna({"__deg": 0})
        .persist()
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.select("node", F.lit(0.0).alias("rank"))
    mass = 10**15
    ranks = nodes.select(
        "node", "__deg", F.lit(mass // n_nodes).alias("q")
    ).transform(lambda df: checkpoint_frame(df, eager=False))

    one_minus_d = 1.0 - damping
    for _ in range(iterations):
        shares = ranks.select(
            "node",
            F.when(
                F.col("__deg") > 0,
                F.floor(
                    F.col("q").cast("double") / F.col("__deg") + F.lit(0.5)
                ).cast("long"),
            ).alias("__share"),
            F.when(F.col("__deg") == 0, F.col("q")).otherwise(F.lit(0).cast("long")).alias("__dangling"),
        )
        dangling = shares.agg(F.sum("__dangling").alias("__dm"))
        contribs = (
            e.join(
                F.broadcast(
                    shares.where(F.col("__share").isNotNull())
                    .select(F.col("node").alias("src"), "__share")
                ),
                on="src",
            )
            .groupBy("dst")  # reuses e's dst partitioning: no Exchange
            .agg(F.sum("__share").alias("__in"))
        )
        # the expression tree below is replayed verbatim by the oracle —
        # keep the op order in sync with _pagerank_oracle_sql
        new_q = F.floor(
            F.lit(one_minus_d) * (F.lit(1.0e15) / F.lit(float(n_nodes)))
            + F.lit(damping)
            * (
                F.coalesce(F.col("__in"), F.lit(0).cast("long")).cast("double")
                + F.col("__dm").cast("double") / F.lit(float(n_nodes))
            )
            + F.lit(0.5)
        ).cast("long")
        ranks = (
            nodes.join(
                F.broadcast(contribs.withColumnRenamed("dst", "node")),
                on="node",
                how="left",
            )
            .crossJoin(F.broadcast(dangling))
            .select("node", "__deg", new_q.alias("q"))
            .transform(lambda df: checkpoint_frame(df, eager=False))
        )
    return ranks.select(
        "node", (F.col("q").cast("double") / F.lit(1.0e15)).alias("rank")
    )


def triangle_count(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "node",
) -> DataFrame:
    """Exact per-node triangle participation counts over an undirected graph.

    Input edges are treated as undirected: they are canonicalized
    (``least``/``greatest``), self-loops dropped, duplicates collapsed.
    Enumeration uses DEGREE ORDERING (Suri & Vassilvitskii, "Counting
    Triangles and the Curse of the Last Reducer", WWW'11): each undirected
    edge is oriented from its lower-rank endpoint to its higher-rank one,
    rank = (degree, id) lexicographic. Every triangle then has exactly ONE
    wedge centered at its minimum-rank vertex, so

    1. wedges — one self-equi-join of the oriented adjacency on the center
       (pairs per center bounded by C(out-degree, 2), and degree ordering
       bounds out-degree by O(sqrt(m)) on any graph — the hub that would
       generate O(d^2) candidate pairs under arbitrary orientation ranks
       HIGHEST and therefore generates none);
    2. closure — one equi-join of the wedges against the oriented edges.

    Both are plain hash-partitioned joins; per-node counts are one keyed
    explode+groupBy. No cross product, no driver state. Returns
    ``(node, n_triangles)`` for every node with at least one triangle.
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    # the canonical edge list feeds degrees (×2), the rank join and the
    # closure — without a persist each consumer re-runs the distinct()
    # from source (round-8b trap 5; observed ~15 re-executions = 500+
    # executor-seconds on a 10k-edge graph)
    e = register_persisted(e.persist())
    deg = (
        e.select(F.col("a").alias("n"))
        .unionAll(e.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    # attach degrees to both endpoints, orient low-rank -> high-rank
    ed = (
        e.join(deg.withColumnRenamed("n", "a").withColumnRenamed("d", "da"), "a")
        .join(deg.withColumnRenamed("n", "b").withColumnRenamed("d", "db"), "b")
    )
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = ed.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(a_first, F.col("db")).otherwise(F.col("da")).alias("dv"),
    )
    # consumed by both wedge sides and the closure join
    oriented = register_persisted(oriented.persist())
    w1 = oriented.select(
        F.col("u"), F.col("v").alias("v1"), F.col("dv").alias("d1")
    )
    w2 = oriented.select(
        F.col("u"), F.col("v").alias("v2"), F.col("dv").alias("d2")
    )
    wedges = w1.join(w2, "u").filter(
        (F.col("d1") < F.col("d2"))
        | ((F.col("d1") == F.col("d2")) & (F.col("v1") < F.col("v2")))
    )
    closer = oriented.select(
        F.col("u").alias("v1"), F.col("v").alias("v2")
    )
    tri = wedges.join(closer, ["v1", "v2"]).select("u", "v1", "v2")
    return (
        tri.select(
            F.explode(F.array(F.col("u"), F.col("v1"), F.col("v2"))).alias(
                node_col
            )
        )
        .groupBy(node_col)
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )


def clustering_coefficient(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "node",
) -> DataFrame:
    """Local clustering coefficient per node: triangles / C(degree, 2).

    Composes :func:`triangle_count` with the degree table (left join — a
    node with degree >= 2 but zero triangles reports 0.0). Exact double
    division, deterministic. Returns (node, degree, n_triangles, coeff).
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    # reused by the degree table and the whole triangle subtree
    e = register_persisted(e.persist())
    deg = (
        e.select(F.col("a").alias(node_col))
        .unionAll(e.select(F.col("b").alias(node_col)))
        .groupBy(node_col)
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    tri = triangle_count(e, "a", "b", node_col=node_col)
    pairs = (F.col("degree") * (F.col("degree") - F.lit(1))).cast("double") / F.lit(2.0)
    return (
        deg.join(tri, node_col, "left")
        .select(
            node_col,
            "degree",
            F.coalesce(F.col("n_triangles"), F.lit(0)).alias("n_triangles"),
            F.when(
                F.col("degree") >= 2,
                F.coalesce(F.col("n_triangles"), F.lit(0)).cast("double")
                / pairs,
            )
            .otherwise(F.lit(0.0))
            .alias("coeff"),
        )
    )


def _driver_label_propagation(
    spark, sym: DataFrame, rounds: int
) -> DataFrame:
    """Exact synchronous-LPA replay for a SMALL materialized symmetric edge
    list: the same per-round votes (each undirected neighbor once + the
    self-vote) and the same deterministic tie-break (votes desc, label asc)
    as the distributed loop, vectorized in numpy. Label order comes from
    sorting the node values with their native comparison (int64 numeric /
    codepoint order for strings — identical to Spark's BIGINT / UTF8String
    binary order on this engine's id domains), so every round's winner —
    and therefore the output table — is equal row-for-row (asserted in
    tests/test_round7_ops.py). Bounded by
    ``label_propagation(driver_below=...)``; the toPandas of the
    (already-distinct) edge list is the only data movement."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import StructField, StructType

    id_type = sym.schema["u"].dataType
    pdf = sym.toPandas()
    pdf = pdf.dropna()  # a null endpoint drops the edge in both paths
    codes, uniques = pd.factorize(
        pd.concat([pdf["u"], pdf["v"]], ignore_index=True), sort=False
    )
    n = len(uniques)
    if n == 0:
        return spark.createDataFrame(
            [],
            StructType(
                [
                    StructField("node", id_type, True),
                    StructField("community", id_type, True),
                ]
            ),
        )
    vals = np.asarray(uniques)
    order = np.argsort(vals, kind="stable")  # native type order
    rank = np.empty(n, dtype="int64")
    rank[order] = np.arange(n, dtype="int64")
    half = len(pdf)
    iu = rank[codes[:half]]
    iv = rank[codes[half:]]
    labels = np.arange(n, dtype="int64")
    self_nodes = np.arange(n, dtype="int64")
    for _ in range(rounds):
        vote_node = np.concatenate([iu, self_nodes])
        vote_lab = np.concatenate([labels[iv], labels])
        keys = vote_node * n + vote_lab
        uk, cnt = np.unique(keys, return_counts=True)  # sorted (node, lab)
        ku = uk // n
        klab = uk % n
        # top-1 per node by (votes desc, label asc) without a lexsort:
        # composite = votes·n + (n-1-label) is max'd per node-segment by
        # maximum.reduceat, then decoded — the argmax with the exact
        # tie-break baked into the value
        composite = cnt * n + (n - 1 - klab)
        seg = np.ones(len(ku), dtype=bool)
        seg[1:] = ku[1:] != ku[:-1]
        starts = np.flatnonzero(seg)
        best = np.maximum.reduceat(composite, starts)
        labels = labels.copy()
        labels[ku[starts]] = (n - 1) - (best % n)
    sorted_vals = vals[order]
    schema = StructType(
        [
            StructField("node", id_type, True),
            StructField("community", id_type, True),
        ]
    )
    # Arrow-path createDataFrame (guide §6): a pandas frame ships as Arrow
    # batches instead of pickled Row objects
    out_pdf = pd.DataFrame(
        {"node": sorted_vals, "community": sorted_vals[labels]}
    )
    return spark.createDataFrame(out_pdf, schema)


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    rounds: int = 5,
    broadcast_vertex_limit: int = 8_000_000,
    symmetric_distinct: bool = False,
    driver_below: int = 4_000_000,
) -> DataFrame:
    """Synchronous label-propagation community detection → (node,
    community); community ids are node ids (each community is named after
    one of its members).

    Classic asynchronous LPA (Raghavan et al. 2007) is update-order-
    dependent; the GraphFrames/Pregel formulation used here is synchronous
    with a DETERMINISTIC tie-break — each round every node adopts the most
    frequent label among its neighbors *plus its own current label as one
    extra vote* (the self-vote damps the 2-coloring oscillation synchronous
    LPA exhibits on bipartite structures), ties broken by smallest label.
    ``rounds`` is fixed, not convergence-polled, so the output is a pure
    function of the edge set: stable under repartitioning and replayable.

    Scale shape: the label table is |V| rows — usually orders of magnitude
    smaller than |E| — so while it fits (``broadcast_vertex_limit`` nodes,
    counted once up front) each round BROADCASTS the labels onto the
    persisted symmetric edge list: the edges never shuffle, and the only
    exchange per round is the partial-aggregated (node, label) vote
    groupBy plus a |V|-sized top-1 re-agg (``min(struct(-votes, label))``
    — no sort window). Past the limit the join falls back to keyed
    hash-join, still one keyed join + one groupBy per round with no driver
    traffic; ``localCheckpoint`` truncates the iterative lineage exactly
    like :func:`connected_components`.

    ``symmetric_distinct``: the caller asserts ``edges`` is ALREADY a
    symmetric, self-loop-free, duplicate-free edge list — skip the explode
    + |E|-sized ``distinct`` (the :func:`connected_components` contract;
    the trade-graph query qualifies by construction: distinct BIPARTITE
    (customer, supplier) pairs symmetrize with no possible duplicate or
    loop).

    ``driver_below``: when the MEASURED symmetric edge count fits, replay
    the fixed-round synchronous loop on the driver
    (:func:`_driver_label_propagation`) instead of paying ``rounds`` ×
    (broadcast build + two vote exchanges + eager checkpoint) of scheduler
    barriers — the same runtime-size-gated routing as
    ``connected_components(driver_below=...)``, bit-equal output by the
    same vote/tie-break arithmetic. Pass 0 to force the distributed loop.
    """
    if symmetric_distinct:
        sym = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    else:
        sym = (
            edges.select(
                F.explode(
                    F.array(
                        F.struct(F.col(src).alias("u"), F.col(dst).alias("v")),
                        F.struct(F.col(dst).alias("u"), F.col(src).alias("v")),
                    )
                ).alias("e")
            )
            .select("e.u", "e.v")
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
    sym = register_persisted(sym.persist())
    n_edges = sym.count()  # materializes the persist; sizes the fixpoint

    if n_edges <= driver_below:
        out = _driver_label_propagation(edges.sparkSession, sym, rounds)
        sym.unpersist()
        return out

    from preprocessor_spark.caching import fixpoint_shuffle_scope

    with fixpoint_shuffle_scope(edges.sparkSession, n_edges):
        labels = sym.select(F.col("u").alias("node")).distinct().select(
            "node", F.col("node").alias("community")
        ).transform(lambda df: checkpoint_frame(df, eager=False))
        # one tiny job up front: |V| decides keyed-join vs broadcast rounds
        small_vertex_set = labels.count() <= broadcast_vertex_limit

        for r in range(rounds):
            lab = F.broadcast(labels) if small_vertex_set else labels
            incoming = sym.join(
                lab.select(F.col("node").alias("v"), "community"), "v"
            ).select(F.col("u").alias("node"), "community")
            # self-vote folded into the ONE vote aggregation: union the
            # node's own (node, community) row with the neighbor stream and
            # count — identical votes to count+union+re-sum but a single
            # shuffle/agg per round instead of two
            votes = (
                incoming.unionByName(labels.select("node", "community"))
                .groupBy("node", "community")
                .agg(F.count(F.lit(1)).alias("votes"))
            )
            # deterministic top-1 per node WITHOUT a sort window:
            # min(struct(-votes, community)) == (votes desc, community asc);
            # partial-aggregates map-side, re-shuffles only |V|·labels rows
            labels = (
                votes.groupBy("node")
                .agg(
                    F.min(
                        F.struct(
                            (-F.col("votes")).alias("neg_votes"), F.col("community")
                        )
                    ).alias("top")
                )
                .select("node", F.col("top.community").alias("community"))
            )
            # eager per-round materialization: measured FASTER than
            # every-other-round persist-then-checkpoint (the off-round frame
            # is referenced twice next round — join + self-vote union — and
            # the double recompute costs more than a |V|-sized checkpoint
            # job; A/B at sf0.1: ~11.5 s vs ~14.3 s). EAGER on purpose:
            # the next round references labels twice (broadcast build +
            # self-vote union) with no convergence probe to merge into —
            # the round-12 lazy-checkpoint A/B measured eager 6.0 s vs
            # lazy 8.2 s solo for communities_lpa, the opposite of the
            # probe-merged fixpoints above.
            labels = labels.transform(checkpoint_frame)
    return labels


def _driver_bfs(
    spark, e: DataFrame, seeds: DataFrame, seed_col: str, max_hops: int
) -> DataFrame:
    """Exact multi-source BFS replay for a SMALL materialized edge list:
    level-synchronous frontier expansion in numpy. Hop distances are exact
    integers and the min-plus fixpoint is confluent, so the table equals
    the distributed loop's row-for-row (asserted in tests). Node universe =
    edge endpoints ∪ seeds, exactly like the distributed init (an isolated
    seed reports 0). Bounded by ``shortest_hops(driver_below=...)``."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import IntegerType, StructField, StructType

    id_type = e.schema["s"].dataType
    epdf = e.toPandas()
    spdf = (
        seeds.select(F.col(seed_col).alias("node"))
        .where(F.col("node").isNotNull())
        .distinct()
        .toPandas()
    )
    codes, uniques = pd.factorize(
        pd.concat([epdf["s"], epdf["d"], spdf["node"]], ignore_index=True),
        sort=False,
    )
    n = len(uniques)
    schema = StructType(
        [
            StructField("node", id_type, True),
            StructField("hops", IntegerType(), False),
        ]
    )
    if n == 0:
        return spark.createDataFrame([], schema)
    ne = len(epdf)
    iu = codes[:ne]
    iv = codes[ne : 2 * ne]
    iseed = codes[2 * ne :]
    INF = np.iinfo(np.int64).max
    dist = np.full(n, INF, dtype="int64")
    dist[iseed] = 0
    for level in range(max_hops):
        active = dist[iu] == level
        if not active.any():
            break
        np.minimum.at(dist, iv[active], level + 1)
    reached = dist < INF
    vals = np.asarray(uniques)[reached]
    out = pd.DataFrame({"node": vals, "hops": dist[reached].astype("int32")})
    return spark.createDataFrame(out, schema)


def shortest_hops(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    seed_col: str = "node",
    max_hops: int = 10,
    driver_below: int = 2_000_000,
) -> DataFrame:
    """Multi-source BFS hop distances — (node, hops) for every node
    reachable from ``seeds`` within ``max_hops`` directed edges (pass a
    symmetrized edge list for undirected graphs; seeds report 0).

    The classic Pregel shortest-path specialization for unit weights:
    synchronous frontier expansion, dist' = min(dist, min over in-edges
    dist+1), one keyed join + one groupBy per round, lineage truncated by
    ``localCheckpoint`` and shuffles sized by
    :func:`preprocessor_spark.caching.fixpoint_shuffle_scope` — the
    connected-components engine with min-plus messages instead of min.
    Early-exits when a round adds no nodes and relaxes no distance (the
    frontier is empty — BFS never revisits at larger d, so the integer
    sum certificate is monotone).

    VALUE-oracle-able despite being iterative: hop distances are exact
    integers and the fixpoint is confluent (min-plus is idempotent /
    commutative), so DuckDB replays it with a bounded WITH RECURSIVE walk
    + MIN(d) — the first of the repo's iterative operators with a full
    SQL twin.
    """
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d")).where(
        F.col("s").isNotNull() & F.col("d").isNotNull()
    ).distinct()
    e = register_persisted(e.persist())
    n_edges = e.count()

    spark = edges.sparkSession
    if n_edges <= driver_below:
        # size-gated driver replay (the connected_components / LPA
        # discipline): hop distances are exact integers with a confluent
        # min-plus fixpoint — zero per-round scheduler barriers, identical
        # table. Pass driver_below=0 to force the distributed loop.
        out = _driver_bfs(spark, e, seeds, seed_col, max_hops)
        e.unpersist()
        return out

    from preprocessor_spark.caching import fixpoint_shuffle_scope
    with fixpoint_shuffle_scope(spark, n_edges):
        dist = (
            seeds.select(F.col(seed_col).alias("node"))
            .where(F.col("node").isNotNull())
            .distinct()
            .select("node", F.lit(0).alias("hops"))
            .transform(lambda df: checkpoint_frame(df, eager=False))
        )
        n_dist = dist.count()  # materializes the lazy checkpoint
        prev_sum, prev_cnt = None, None
        for _ in range(max_hops):
            # frontier table is vertex-sized: broadcast it (gated on the
            # probe's measured count) so the persisted edge table never
            # re-shuffles; the min groupBy partial-aggregates map-side, so
            # its exchange is vertex-bounded. Lazy checkpoint + probe = one
            # job per round.
            msgs = e.join(
                _maybe_broadcast(dist.withColumnRenamed("node", "s"), n_dist, n_edges), "s"
            ).select(F.col("d").alias("node"), (F.col("hops") + 1).alias("hops"))
            dist = (
                dist.unionByName(msgs)
                .groupBy("node")
                .agg(F.min("hops").alias("hops"))
                .transform(lambda df: checkpoint_frame(df, eager=False))
            )
            probe = dist.agg(
                F.count(F.lit(1)).alias("c"), F.sum("hops").alias("s")
            ).collect()[0]
            if (probe["c"], probe["s"]) == (prev_cnt, prev_sum):
                break
            prev_cnt, prev_sum = probe["c"], probe["s"]
            n_dist = probe["c"]
    e.unpersist()
    return dist


def link_prediction_scores(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    top_k: int = 50,
    max_center_degree: int | None = None,
) -> DataFrame:
    """Neighborhood-based link prediction: score NON-adjacent node pairs by
    common neighbors, Jaccard, and Adamic–Adar (Liben-Nowell & Kleinberg,
    CIKM'03) over an undirected graph.

    Shape: edges canonicalize/dedup once (persisted — feeds degrees, the
    wedge join and the anti join); candidate pairs come from ONE
    self-equi-join of the adjacency on the shared neighbor (a wedge join —
    the same equi-join-not-cross-product shape as triangle_count), existing
    edges drop with one left-anti join, and the per-pair reduction is one
    groupBy. Adamic–Adar's float sum folds in sorted order over the pair's
    common-neighbor weight list, whose length is bounded by
    min(deg a, deg b) ≤ ``max_center_degree`` — the bounded-list contract
    that keeps it engine-portable (DuckDB: list_reduce(list_sort(...))).

    ``max_center_degree``: hub centers with more neighbors generate
    deg² wedges AND carry the least evidence (an Adamic–Adar weight of
    1/ln d → 0); excluding them bounds the wedge join by |E|·cap and is
    the standard recall trade (same role as LSH banding in the dedup
    family). Full degrees (not capped-subgraph degrees) still feed
    Jaccard. Returns the ``top_k`` pairs by (jaccard, cn, a, b) —
    TakeOrderedAndProject, no global sort.
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .filter(F.col("a").isNotNull() & F.col("b").isNotNull())
        .distinct()
    )
    e = register_persisted(e.persist())
    adj = e.select(F.col("a").alias("w"), F.col("b").alias("n")).unionAll(
        e.select(F.col("b").alias("w"), F.col("a").alias("n"))
    )
    deg = adj.groupBy("w").agg(F.count(F.lit(1)).alias("d"))
    centers = adj.join(deg, "w").select("w", "n", "d")
    if max_center_degree is not None:
        centers = centers.filter(F.col("d") <= max_center_degree)
    centers = register_persisted(centers.persist())
    left = centers.select("w", F.col("n").alias("a"))
    right = centers.select("w", F.col("n").alias("b"))
    wedges = left.join(right, "w").filter(F.col("a") < F.col("b"))
    # phase 1 — rank candidates WITHOUT the Adamic-Adar weight list: the
    # candidate frame is ~|E|·cap pairs and building per-pair arrays there
    # dominated the wall (measured 2× at sf0.1); cn + degrees suffice for
    # the (jaccard, cn, a, b) ranking, which TakeOrderedAndProject keeps
    # sort-free. The ranking ignores adamic_adar by construction.
    pair_counts = wedges.groupBy("a", "b").agg(F.count(F.lit(1)).alias("cn"))
    new_pairs = pair_counts.join(e, ["a", "b"], "left_anti")
    da = deg.select(F.col("w").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("w").alias("b"), F.col("d").alias("db"))
    scored = (
        new_pairs.join(da, "a")
        .join(db, "b")
        .select(
            "a",
            "b",
            "cn",
            F.round(
                F.col("cn").cast("double")
                / (F.col("da") + F.col("db") - F.col("cn")).cast("double"),
                6,
            ).alias("jaccard"),
        )
    )
    winners = scored.orderBy(
        F.col("jaccard").desc(), F.col("cn").desc(), "a", "b"
    ).limit(top_k)
    top = winners.collect()  # k rows — model-sized driver state
    spark = edges.sparkSession
    if not top:
        from pyspark.sql.types import DoubleType

        e.unpersist()
        centers.unpersist()
        return spark.createDataFrame([], winners.schema.add("adamic_adar", DoubleType()))
    # phase 2 — Adamic-Adar for the k winners only: isin filters on both
    # wedge sides push to the (persisted) centers scan, so the re-join
    # touches a k-node-bounded slice instead of the full candidate set.
    # The float sum folds in sorted order over the pair's common-neighbor
    # weight list (bounded by min degree ≤ cap) — the lm_kn idiom.
    a_nodes = sorted({r["a"] for r in top})
    b_nodes = sorted({r["b"] for r in top})
    wl = centers.filter(F.col("n").isin(a_nodes)).select(
        "w", F.col("n").alias("a"), "d"
    )
    wr = centers.filter(F.col("n").isin(b_nodes)).select(
        "w", F.col("n").alias("b")
    )
    aa = (
        wl.join(wr, "w")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(
            F.aggregate(
                F.sort_array(
                    F.collect_list(1.0 / F.log(F.col("d").cast("double")))
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("aa_raw")
        )
    )
    winners_df = spark.createDataFrame(top)
    out = winners_df.join(F.broadcast(aa), ["a", "b"]).select(
        "a",
        "b",
        "cn",
        "jaccard",
        F.round(F.col("aa_raw"), 6).alias("adamic_adar"),
    )
    return out.orderBy(F.col("jaccard").desc(), F.col("cn").desc(), "a", "b")


def k_core(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 100,
) -> DataFrame:
    """The k-core of an undirected graph: the maximal subgraph in which
    every node has degree ≥ k, found by iterative peeling (Seidman 1983;
    Batagelj–Zaveršnik's distributed variant: delete ALL sub-k nodes each
    round, not one).

    Per round: one degree groupBy, one broadcast-able sub-k node frame,
    two left-anti joins to drop their edges, localCheckpoint to truncate
    lineage; shuffles sized by
    :func:`preprocessor_spark.caching.fixpoint_shuffle_scope`. The
    surviving-edge count is the convergence certificate (monotone
    decreasing — unchanged count IS the fixpoint). Rows-only by design:
    iterative deletion is non-monotone, so no recursive-CTE SQL twin;
    graded by planted-graph equivalence against a scalar peel in pytest.

    Returns (node, degree) for every node of the k-core, with degree
    counted INSIDE the core.
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .filter(F.col("a").isNotNull() & F.col("b").isNotNull())
        .distinct()
        .transform(lambda df: checkpoint_frame(df, eager=False))
    )
    n_edges = e.count()  # materializes the lazy checkpoint

    from preprocessor_spark.caching import fixpoint_shuffle_scope

    spark = edges.sparkSession
    with fixpoint_shuffle_scope(spark, n_edges):
        for _ in range(max_iterations):
            if n_edges == 0:
                break
            deg = (
                e.select(F.col("a").alias("n"))
                .unionAll(e.select(F.col("b").alias("n")))
                .groupBy("n")
                .agg(F.count(F.lit(1)).alias("d"))
            )
            # the sub-k node frame is vertex-sized (|low| <= |V| <= 2·|E|,
            # and n_edges is tracked every round): broadcast-gate it so the
            # two anti joins never shuffle the surviving edge table; lazy
            # checkpoint + count = one job per round
            low = deg.filter(F.col("d") < k).select("n")
            e2 = (
                e.join(
                    _maybe_broadcast(low.withColumnRenamed("n", "a"), 2 * n_edges, n_edges),
                    "a",
                    "left_anti",
                )
                .join(
                    _maybe_broadcast(low.withColumnRenamed("n", "b"), 2 * n_edges, n_edges),
                    "b",
                    "left_anti",
                )
                .select("a", "b")
                .transform(lambda df: checkpoint_frame(df, eager=False))
            )
            n2 = e2.count()
            e = e2
            if n2 == n_edges:
                break
            n_edges = n2
        else:
            raise RuntimeError(f"k_core: not converged in {max_iterations} rounds")
    return (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )


def shortest_paths_weighted(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str = "weight",
    seed_col: str = "node",
    max_rounds: int = 10,
) -> DataFrame:
    """Multi-source WEIGHTED shortest paths: (node, cost) for every node
    reachable from ``seeds`` within ``max_rounds`` edge relaxations —
    :func:`shortest_hops` upgraded from unit weights to a cost column
    (the distributed Bellman-Ford / Pregel SSSP shape; negative weights
    are rejected, so every relaxation round only improves).

    Weights are cast to exact DECIMAL(18,4) and path costs accumulate in
    DECIMAL(38,8): min-plus over exact decimals is confluent AND
    bit-exact, so the fixpoint is VALUE-oracle-able the same way as the
    unit-weight walk — DuckDB replays it with a round-bounded
    WITH RECURSIVE walk + MIN(cost). The convergence certificate
    (node count + exact cost sum, both monotone) is exact arithmetic,
    never a float comparison. One keyed join + one min groupBy per round,
    localCheckpoint lineage truncation, fixpoint-scoped shuffles.
    """
    e = (
        edges.select(
            F.col(src).alias("s"),
            F.col(dst).alias("d"),
            F.col(weight).cast("decimal(18,4)").alias("w"),
        )
        .where(F.col("s").isNotNull() & F.col("d").isNotNull() & F.col("w").isNotNull())
        .groupBy("s", "d")
        .agg(F.min("w").alias("w"))
    )
    e = register_persisted(e.persist())
    neg = e.where(F.col("w") < 0).count()
    if neg:
        raise ValueError(f"shortest_paths_weighted: {neg} negative-weight edges")
    n_edges = e.count()

    from preprocessor_spark.caching import fixpoint_shuffle_scope

    spark = edges.sparkSession
    with fixpoint_shuffle_scope(spark, n_edges):
        dist = (
            seeds.select(F.col(seed_col).alias("node"))
            .where(F.col("node").isNotNull())
            .distinct()
            .select("node", F.lit("0").cast("decimal(38,8)").alias("cost"))
            .transform(lambda df: checkpoint_frame(df, eager=False))
        )
        n_dist = dist.count()  # materializes the lazy checkpoint
        prev = None
        for _ in range(max_rounds):
            # broadcast the vertex-sized frontier (probe-count gated) so
            # the persisted edge table never re-shuffles; min over exact
            # DECIMAL is order-independent, so results are bit-equal under
            # either join shape. Lazy checkpoint + probe = one job/round.
            msgs = e.join(
                _maybe_broadcast(dist.withColumnRenamed("node", "s"), n_dist, n_edges), "s"
            ).select(
                F.col("d").alias("node"),
                (F.col("cost") + F.col("w")).cast("decimal(38,8)").alias("cost"),
            )
            dist = (
                dist.unionByName(msgs)
                .groupBy("node")
                .agg(F.min("cost").alias("cost"))
                .transform(lambda df: checkpoint_frame(df, eager=False))
            )
            probe = dist.agg(
                F.count(F.lit(1)).alias("c"), F.sum("cost").alias("s")
            ).collect()[0]
            key = (probe["c"], str(probe["s"]))
            if key == prev:
                break
            prev = key
            n_dist = probe["c"]
    e.unpersist()
    return dist
