"""DBSCAN (cosine) — planted-cluster recovery vs an independent scalar
region-query implementation; determinism and LSH/exact agreement."""

from __future__ import annotations

import numpy as np
import pytest

from preprocessor_spark.operators.clustering import dbscan_cosine


@pytest.fixture(scope="module")
def spark():
    from preprocessor_spark.session import get_spark

    return get_spark("test-dbscan")


def _make_planted(rng, d=16):
    """Two tight direction cones + isolated noise directions."""
    def cone(center, n, spread):
        pts = center + rng.normal(0, spread, (n, d))
        return pts / np.linalg.norm(pts, axis=1, keepdims=True)

    c1 = rng.normal(size=d); c1 /= np.linalg.norm(c1)
    c2 = -c1  # antipodal: cosine between clusters ~ -1
    a = cone(c1, 30, 0.05)
    b = cone(c2, 25, 0.05)
    noise = []
    while len(noise) < 5:
        v = rng.normal(size=d); v /= np.linalg.norm(v)
        if max(abs(v @ c1), abs(v @ c2)) < 0.5:
            noise.append(v)
    x = np.vstack([a, b, np.array(noise)])
    return x


def _scalar_dbscan(x, eps, min_pts):
    """Textbook region-query DBSCAN on the cosine >= eps relation."""
    n = len(x)
    sim = x @ x.T
    neigh = [set(np.nonzero(sim[i] >= eps)[0].tolist()) for i in range(n)]
    core = [len(neigh[i]) >= min_pts for i in range(n)]  # includes self
    label = [None] * n
    for i in sorted(range(n)):
        if not core[i] or label[i] is not None:
            continue
        label[i] = i
        stack = [i]
        while stack:
            j = stack.pop()
            for k in neigh[j]:
                if core[k] and label[k] is None:
                    label[k] = i
                    stack.append(k)
    roles = []
    for i in range(n):
        if core[i]:
            roles.append("core")
        elif any(core[j] for j in neigh[i] if j != i):
            roles.append("border")
        else:
            roles.append("noise")
    return roles, label, core


def test_exact_matches_scalar_reference(spark):
    rng = np.random.default_rng(42)
    x = _make_planted(rng)
    eps, min_pts = 0.9, 4
    rows = [(i, [float(v) for v in x[i]]) for i in range(len(x))]
    df = spark.createDataFrame(rows, "id long, emb array<double>")
    got = {
        r.id: r
        for r in dbscan_cosine(
            df, "id", "emb", eps_cosine=eps, min_pts=min_pts, brute_force=True
        ).collect()
    }
    roles, label, core = _scalar_dbscan(x, eps, min_pts)
    assert len(got) == len(x)
    for i in range(len(x)):
        assert got[i].role == roles[i], (i, got[i].role, roles[i])
    # cluster partitions agree (ids may differ from the scalar's seeds):
    # same-cluster iff same-cluster, over core points
    core_ids = [i for i in range(len(x)) if core[i]]
    for i in core_ids:
        for j in core_ids:
            assert (got[i].cluster == got[j].cluster) == (label[i] == label[j])
    # the two planted cones never merge
    assert got[0].cluster != got[35].cluster
    noise_ids = [i for i, r in enumerate(roles) if r == "noise"]
    assert all(got[i].cluster is None for i in noise_ids)


def test_lsh_path_agrees_on_well_separated_data(spark):
    rng = np.random.default_rng(7)
    x = _make_planted(rng)
    rows = [(i, [float(v) for v in x[i]]) for i in range(len(x))]
    df = spark.createDataFrame(rows, "id long, emb array<double>")
    exact = {
        r.id: (r.role, r.cluster)
        for r in dbscan_cosine(df, "id", "emb", 0.9, 4, brute_force=True).collect()
    }
    lsh = {
        r.id: (r.role, r.cluster)
        for r in dbscan_cosine(df, "id", "emb", 0.9, 4, brute_force=False).collect()
    }
    # LSH recall at cosine>=0.9 with 16/4 banding is ~0.95 per pair, and
    # tight cones share band keys — demand >=90% identical role labels
    same = sum(exact[i][0] == lsh[i][0] for i in exact)
    assert same / len(exact) >= 0.9
    # deterministic under repartition
    lsh2 = {
        r.id: (r.role, r.cluster)
        for r in dbscan_cosine(
            df.repartition(13), "id", "emb", 0.9, 4, brute_force=False
        ).collect()
    }
    assert lsh == lsh2


def test_min_pts_one_everything_core(spark):
    rows = [(1, [1.0, 0.0]), (2, [0.0, 1.0])]
    df = spark.createDataFrame(rows, "id long, emb array<double>")
    got = {r.id: r for r in dbscan_cosine(df, "id", "emb", 0.99, 1, brute_force=True).collect()}
    # orthogonal singletons: each its own core cluster
    assert got[1].role == got[2].role == "core"
    assert got[1].cluster == 1 and got[2].cluster == 2
    with pytest.raises(ValueError, match="min_pts"):
        dbscan_cosine(df, "id", "emb", 0.9, 0)
