"""Alternating least squares matrix factorization — the recommender tier.

Explicit-feedback ALS (Koren/Bell/Volinsky 2009; the Netflix-era
workhorse): factor the sparse rating matrix R ≈ P Qᵀ by alternating ridge
solves — fix Q, solve each user's p_u from their rated items' normal
equations; fix P, solve each item's q_i symmetrically.

Engine shape: the RATINGS are the data-sized axis and never leave the
executors — each half-step is one keyed groupBy + an Arrow solve stage
over (entity, [(counterpart_id, rating)]) groups, with the counterpart
FACTOR MATRIX broadcast (model-sized: |entities|·rank doubles; a
fail-fast guard trips past ``max_entities`` — the same bound every
broadcast join has; past it the half-step would become a keyed join +
cogroup, same math). Per-entity solves sort their rated counterparts by
id before accumulating, and init is seeded — the whole fit is
BIT-DETERMINISTIC across partitionings.

Rows-only grading by design (an iterative float fit has no SQL twin):
pytest checks planted low-rank recovery, monotone in-sample RMSE descent,
and repartition determinism.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class ALSModel:
    rank: int
    reg: float
    user_ids: np.ndarray  # (U,)
    user_factors: np.ndarray  # (U, k)
    item_ids: np.ndarray  # (I,)
    item_factors: np.ndarray  # (I, k)
    rmse_history: tuple  # in-sample RMSE after each full iteration


#: ratings-count gate for hoisting the per-half-step (repartition + sort)
#: into two persisted layouts built once. BELOW the gate the hoist is a
#: measured REGRESSION (round-12 A/B at sf0.1: +0.7 s — the hoisted
#: exchanges move ~86k tiny rows while the extra InMemoryRelation adds a
#: materialization job and per-step cache-read overhead); ABOVE it the
#: `iterations` re-shuffles + re-sorts removed per side are data-sized and
#: dominate (guide §2.4). Partition boundaries and in-partition order are
#: identical to the per-step repartition (same count, same key, same sort;
#: explicit numPartitions, which AQE never coalesces), so every Arrow batch
#: — and therefore the fit — is bit-identical (asserted in
#: tests/test_round9b_ops.py).
ALS_LAYOUT_HOIST_MIN_ROWS = 10_000_000


def _solve_side(
    ratings: DataFrame,
    solve_col: str,
    fixed_col: str,
    rating_col: str,
    fixed_ids: np.ndarray,
    fixed_factors: np.ndarray,
    rank: int,
    reg: float,
    prelaid: bool = False,
) -> tuple[np.ndarray, np.ndarray]:
    """One ALS half-step: per-``solve_col`` ridge solve against the
    broadcast ``fixed`` factors. Returns (ids, factors) sorted by id.

    Shape: the data-sized work (per-rating outer products q_i q_iᵀ and
    q_i·r) runs VECTORIZED in one ``mapInPandas`` pass — per-key segment
    sums via ``np.add.reduceat`` over (key, counterpart)-sorted batches,
    not a Python call per entity. Batches emit model-sized PARTIAL normal
    equations (a key can straddle Arrow batches); the driver merges the
    partials (exact: addition of per-segment sums in key-sorted order)
    and runs ONE batched (g,k,k) solve — the driver touches only
    O(entities·k²), never ratings."""
    spark = ratings.sparkSession
    bc = spark.sparkContext.broadcast((fixed_ids, fixed_factors))
    k, lam = rank, float(reg)

    def _partials(batches):
        fids, q = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            pdf = pdf.sort_values([solve_col, fixed_col], kind="stable")
            keys = pdf[solve_col].to_numpy()
            sel = np.searchsorted(fids, pdf[fixed_col].to_numpy())
            qm = q[sel]  # (m, k)
            vals = pdf[rating_col].to_numpy(dtype="float64")
            outer = qm[:, :, None] * qm[:, None, :]  # (m, k, k)
            rq = vals[:, None] * qm  # (m, k)
            uniq, starts = np.unique(keys, return_index=True)
            counts = np.diff(np.append(starts, len(keys)))
            a = np.add.reduceat(outer, starts, axis=0)
            b = np.add.reduceat(rq, starts, axis=0)
            yield pd.DataFrame(
                {
                    "__id": uniq.astype("int64"),
                    "__n": counts.astype("int64"),
                    "__a": list(a.reshape(len(uniq), -1)),
                    "__b": list(b),
                }
            )

    if prelaid:
        # caller guarantees ratings is ALREADY hash-partitioned on
        # solve_col and sorted (solve_col, fixed_col) — the hoisted layout
        laid = ratings
    else:
        n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
        # repartition on the solve key (each key's partials come from ONE
        # task) and SORT within partitions: shuffle-fetch order is
        # nondeterministic, so without the sort the Arrow batch boundaries
        # — and therefore which partial sums a straddling key splits into —
        # would vary run to run and break bit-determinism
        laid = ratings.repartition(n_shuffle, solve_col).sortWithinPartitions(
            solve_col, fixed_col
        )
    parts = (
        laid.mapInPandas(
            _partials,
            "__id long, __n long, __a array<double>, __b array<double>",
        )
        .collect()
    )
    bc.unpersist()
    acc: dict[int, list] = {}
    for r in sorted(parts, key=lambda x: x["__id"]):
        i = int(r["__id"])
        if i not in acc:
            acc[i] = [
                np.zeros((k, k)),
                np.zeros(k),
                0,
            ]
        acc[i][0] += np.array(r["__a"]).reshape(k, k)
        acc[i][1] += np.array(r["__b"])
        acc[i][2] += int(r["__n"])
    ids = np.array(sorted(acc), dtype="int64")
    a = np.stack([acc[int(i)][0] + lam * acc[int(i)][2] * np.eye(k) for i in ids])
    b = np.stack([acc[int(i)][1] for i in ids])
    factors = np.linalg.solve(a, b)
    return ids, factors


def als_fit(
    ratings: DataFrame,
    user_col: str,
    item_col: str,
    rating_col: str,
    rank: int = 8,
    reg: float = 0.1,
    iterations: int = 10,
    seed: int = 17,
    max_entities: int = 2_000_000,
) -> ALSModel:
    """Fit R ≈ P Qᵀ. Ratings with any null drop listwise; duplicate
    (user, item) pairs average first (one keyed groupBy)."""
    r = (
        ratings.where(
            F.col(user_col).isNotNull()
            & F.col(item_col).isNotNull()
            & F.col(rating_col).isNotNull()
        )
        .groupBy(
            F.col(user_col).cast("long").alias("__u"),
            F.col(item_col).cast("long").alias("__i"),
        )
        .agg(F.avg(F.col(rating_col).cast("double")).alias("__r"))
    )
    from preprocessor_spark.caching import fixpoint_shuffle_scope

    n_ratings = r.count()  # sizes the loop's shuffles AND r's own layout
    n_shuffle = int(ratings.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    n_parts = max(8, min(n_shuffle, (int(n_ratings) + 99_999) // 100_000))
    r = r.repartition(n_parts, "__u").persist()
    r_u = r_i = None
    try:
        item_ids = np.array(
            sorted(x["__i"] for x in r.select("__i").distinct().collect()),
            dtype="int64",
        )
        if len(item_ids) > max_entities:
            raise ValueError(
                f"als_fit: {len(item_ids)} items exceed the broadcast guard "
                f"({max_entities}); shrink the catalog or raise max_entities"
            )
        rng = np.random.default_rng(seed)
        item_f = rng.normal(0.0, 0.1, (len(item_ids), rank))
        user_ids = np.array([], dtype="int64")
        user_f = np.zeros((0, rank))
        rmse_hist = []
        # the alternating loop is a fixpoint: size its per-step shuffles
        # to the ratings, not the session default (no-op at scale)
        with fixpoint_shuffle_scope(ratings.sparkSession, n_ratings):
            hoist = n_ratings >= ALS_LAYOUT_HOIST_MIN_ROWS
            if hoist:
                # build each half-step's (key-partitioned, sorted) layout
                # ONCE instead of re-shuffling + re-sorting the immutable
                # ratings every iteration — see ALS_LAYOUT_HOIST_MIN_ROWS
                spark = ratings.sparkSession
                n_sh = int(
                    spark.conf.get("spark.sql.shuffle.partitions", "32")
                )
                r_u = (
                    r.repartition(n_sh, "__u")
                    .sortWithinPartitions("__u", "__i")
                    .persist()
                )
                r_i = (
                    r.repartition(n_sh, "__i")
                    .sortWithinPartitions("__i", "__u")
                    .persist()
                )
            for _ in range(iterations):
                user_ids, user_f = _solve_side(
                    r_u if hoist else r,
                    "__u", "__i", "__r", item_ids, item_f, rank, reg,
                    prelaid=hoist,
                )
                item_ids, item_f = _solve_side(
                    r_i if hoist else r,
                    "__i", "__u", "__r", user_ids, user_f, rank, reg,
                    prelaid=hoist,
                )
                rmse_hist.append(
                    _rmse(r, user_ids, user_f, item_ids, item_f)
                )
    finally:
        r.unpersist()
        for cached in (r_u, r_i):
            if cached is not None:
                cached.unpersist()
    return ALSModel(
        rank=rank,
        reg=float(reg),
        user_ids=user_ids,
        user_factors=user_f,
        item_ids=item_ids,
        item_factors=item_f,
        rmse_history=tuple(rmse_hist),
    )


def _rmse(r, user_ids, user_f, item_ids, item_f) -> float:
    spark = r.sparkSession
    bc = spark.sparkContext.broadcast(
        (
            {int(i): j for j, i in enumerate(user_ids)},
            user_f,
            {int(i): j for j, i in enumerate(item_ids)},
            item_f,
        )
    )

    def _err(batches):
        uidx, p, iidx, q = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            pu = p[[uidx[int(u)] for u in pdf["__u"]]]
            qi = q[[iidx[int(i)] for i in pdf["__i"]]]
            e = pdf["__r"].to_numpy(dtype="float64") - np.einsum(
                "ij,ij->i", pu, qi
            )
            yield pd.DataFrame({"se": [float(np.sum(e * e))], "n": [len(e)]})

    # per-batch partials folded on the driver in sorted order: Spark's
    # distributed SUM merges partials in task-completion order, which is
    # a last-ulp nondeterminism the fit's bit-determinism contract forbids
    parts = r.sortWithinPartitions("__u", "__i").mapInPandas(
        _err, "se double, n long"
    ).collect()
    bc.unpersist()
    se = 0.0
    for v in sorted(p["se"] for p in parts):
        se += v
    n = sum(p["n"] for p in parts)
    return float((se / n) ** 0.5)


def als_predict_topk(
    model: ALSModel, spark, k: int = 5, users: np.ndarray | None = None
) -> DataFrame:
    """Top-k item recommendations per user from the factor matrices —
    a driver-side GEMM over the (model-sized) factors, returned as a
    DataFrame for composition. For catalog-scale serving, ship the item
    factors through `operators/similarity.py`'s ANN indexes instead."""
    p = model.user_factors
    uids = model.user_ids
    if users is not None:
        mask = np.isin(uids, users)
        p, uids = p[mask], uids[mask]
    scores = p @ model.item_factors.T  # (U, I)
    order = np.argsort(-scores, axis=1, kind="stable")[:, :k]
    rows = [
        (int(u), int(model.item_ids[j]), float(round(scores[i, j], 6)), rk + 1)
        for i, u in enumerate(uids)
        for rk, j in enumerate(order[i])
    ]
    return spark.createDataFrame(
        rows, "user_id long, item_id long, score double, rank int"
    )
