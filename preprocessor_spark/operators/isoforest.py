"""Isolation forest — sample-fit, expression-free distributed scoring.

The classic tabular data-QA shape at 100 TB (Liu/Ting/Zhou, ICDM 2008):
anomalies isolate in few random splits, so the expected isolation depth
over a forest of random trees IS the score. The standard algorithm already
fits on a SMALL uniform sample (the paper's ψ=256 default) — so the fit is
a bounded deterministic driver sample + numpy tree construction, exactly
the PQ-codebook pattern (`operators/pq.py`), and scoring the full corpus is
an embarrassingly parallel Arrow-batched pass: trees broadcast with the
closure, each batch walks all trees vectorized per node (boolean masks —
no per-row Python), ZERO shuffles in the whole plan.

Score: s(x) = 2^(−E[h(x)]/c(ψ)) with the paper's c(n) = 2(H(n−1) − (n−1)/n)
average-BST-depth normalizer and the same truncation credit c(|leaf|) at
unsplit leaves. s → 1 anomalous, s ≈ 0.5 ordinary.

Determinism: the fit sample is xxhash64-ordered (the repo's content-addressed
sampling idiom — reproducible across partitionings/engines), trees use a
seeded numpy Generator, and scoring is per-row pure — the whole operator is
bit-stable across runs and repartitionings (pytest-asserted). Rows-only
grading (randomized trees are not SQL-expressible); tests plant gross
outliers in clustered data and assert they take the top scores, plus
score-range/monotonicity invariants and an independent path-length check
against a straight-line per-row tree walk.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SAMPLE = 256  # the paper's psi
DEFAULT_TREES = 100


def _c(n: float) -> float:
    """Average unsuccessful-search depth in a BST of n nodes."""
    if n <= 1.0:
        return 0.0
    h = math.log(n - 1.0) + 0.5772156649015329  # harmonic via Euler gamma
    return 2.0 * h - 2.0 * (n - 1.0) / n


def _build_tree(x: np.ndarray, rng: np.random.Generator, depth_cap: int) -> list:
    """Array-encoded iTree: node = (feature, threshold, left, right) or
    (-1, leaf_size, -1, -1). Built iteratively; split bounds come from the
    node's own value range (the paper's construction)."""
    nodes: list[tuple[float, float, int, int]] = []
    stack = [(np.arange(len(x)), 0, -1, False)]  # (rows, depth, parent, is_right)
    while stack:
        rows, depth, parent, is_right = stack.pop()
        idx = len(nodes)
        if parent >= 0:
            f, t, l, r = nodes[parent]
            nodes[parent] = (f, t, l, idx) if is_right else (f, t, idx, r)
        sub = x[rows]
        split = None
        if len(rows) > 1 and depth < depth_cap:
            lo, hi = sub.min(axis=0), sub.max(axis=0)
            splittable = np.nonzero(hi > lo)[0]
            if len(splittable):
                f = int(rng.choice(splittable))
                t = float(rng.uniform(lo[f], hi[f]))
                left = rows[sub[:, f] < t]
                right = rows[sub[:, f] >= t]
                if len(left) and len(right):
                    split = (f, t, left, right)
        if split is None:
            nodes.append((-1.0, float(len(rows)), -1, -1))
        else:
            f, t, left, right = split
            nodes.append((float(f), t, -1, -1))
            stack.append((right, depth + 1, idx, True))
            stack.append((left, depth + 1, idx, False))
    return nodes


def _c_vec(n: np.ndarray) -> np.ndarray:
    """Vectorized `_c` (leaf-size truncation credit)."""
    n = np.asarray(n, dtype=np.float64)
    out = np.zeros_like(n)
    m = n > 1.0
    nm = n[m]
    out[m] = 2.0 * (np.log(nm - 1.0) + 0.5772156649015329) - 2.0 * (nm - 1.0) / nm
    return out


def _tree_arrays(tree: list) -> tuple:
    """Columnar encoding (feature, threshold, left, right) for the
    level-synchronous walk; feature < 0 marks a leaf whose size is stored
    in the threshold slot."""
    arr = np.asarray(tree, dtype=np.float64).reshape(-1, 4)
    return (
        arr[:, 0].astype(np.int64),
        arr[:, 1],
        arr[:, 2].astype(np.int64),
        arr[:, 3].astype(np.int64),
    )


def _path_lengths(mat: np.ndarray, tree) -> np.ndarray:
    """Depths (+ leaf-size credit) for every row, level-synchronously: all
    rows step one tree level per iteration (<= depth_cap full-vector
    compares total), instead of one small fancy-indexed mask per visited
    node — ~10x fewer numpy dispatches on psi=256 trees."""
    feat, thr, left, right = tree if isinstance(tree, tuple) else _tree_arrays(tree)
    node = np.zeros(len(mat), dtype=np.int64)
    depth = np.zeros(len(mat))
    active = np.nonzero(feat[node] >= 0)[0]
    while len(active):
        nd = node[active]
        go_left = mat[active, feat[nd]] < thr[nd]
        nxt = np.where(go_left, left[nd], right[nd])
        node[active] = nxt
        depth[active] += 1.0
        active = active[feat[nxt] >= 0]
    return depth + _c_vec(thr[node])


def isolation_forest_fit(
    df: DataFrame,
    features: list[str],
    n_trees: int = DEFAULT_TREES,
    sample_size: int = DEFAULT_SAMPLE,
    seed: int = 0,
) -> dict:
    """Fit on a bounded deterministic sample: rows are xxhash64-ranked on
    their feature tuple (content-addressed — the same rows win on any
    partitioning; xxhash64 is JVM-native and ~10x cheaper than the
    md5-over-formatted-strings variant at full-scan width), `sample_size`
    rows collect to the driver, trees build in numpy. Returns {"trees",
    "psi", "features"} — a small broadcastable model (the paper's defaults
    are ψ=256, 100 trees)."""
    cols = [F.col(c).cast("double").alias(c) for c in features]
    key = F.xxhash64(*[F.col(c).cast("double") for c in features])
    sample = (
        df.dropna(subset=features)
        .select(*cols, key.alias("__k"))
        .orderBy("__k")
        .limit(sample_size)
        .collect()
    )
    if len(sample) < 2:
        raise ValueError(f"isolation_forest_fit: {len(sample)} usable rows < 2")
    x = np.array([[r[c] for c in features] for r in sample], dtype=np.float64)
    psi = len(x)
    depth_cap = math.ceil(math.log2(psi))
    rng = np.random.default_rng(seed)
    trees = [_build_tree(x, rng, depth_cap) for _ in range(n_trees)]
    return {"trees": trees, "psi": psi, "features": list(features)}


def isolation_forest_score(
    df: DataFrame, model: dict, output_col: str = "anomaly_score"
) -> DataFrame:
    """Append s(x) = 2^(−E[h]/c(ψ)) for every row — one Arrow-batched
    mapInPandas projection, trees shipped in the closure (a ψ-bounded
    model, not data), zero shuffles. Rows with a null feature get null."""
    import pandas as pd
    from pyspark.sql import types as T

    feats = model["features"]
    trees = [_tree_arrays(t) for t in model["trees"]]  # columnar, once
    cpsi = _c(float(model["psi"]))
    names = [f.name for f in df.schema.fields]
    schema = T.StructType(
        list(df.schema.fields) + [T.StructField(output_col, T.DoubleType(), True)]
    )

    def score(batches):
        for pdf in batches:
            mat = pdf[feats].to_numpy(dtype=np.float64, na_value=np.nan)
            ok = ~np.isnan(mat).any(axis=1)
            s = np.full(len(pdf), np.nan)
            if ok.any():
                sub = mat[ok]
                depths = np.zeros(len(sub))
                for tree in trees:
                    depths += _path_lengths(sub, tree)
                s[ok] = np.power(2.0, -(depths / len(trees)) / cpsi)
            out = pdf[names].copy()
            out[output_col] = pd.arrays.FloatingArray(s, np.isnan(s))
            yield out

    return df.mapInPandas(score, schema=schema)
