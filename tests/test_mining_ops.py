"""Itemsets / survival / target-encoding — independent reference checks.

Each test recomputes the result by a different path than the operator
(brute-force dict counting for pairs, a sequential lifelines-style KM
recursion, per-row leave-fold-out means). Cross-engine value parity is
covered by the DuckDB oracles (basket_brand_pairs, survival_km_customers,
target_encode_priority) in tests/test_queries.py."""

from __future__ import annotations

import itertools

import numpy as np
import pytest

from preprocessor_spark.operators.encoding import oof_fold_expr, target_encode_oof
from preprocessor_spark.operators.itemsets import frequent_pairs
from preprocessor_spark.operators.survival import kaplan_meier


@pytest.fixture(scope="module")
def spark():
    from preprocessor_spark.session import get_spark

    return get_spark("test-mining")


def test_frequent_pairs_vs_bruteforce(spark):
    rng = np.random.default_rng(3)
    items = list("abcdefg")
    baskets = {
        bid: sorted(set(rng.choice(items, size=rng.integers(1, 5))))
        for bid in range(200)
    }
    rows = [(b, i) for b, its in baskets.items() for i in its]
    # duplicates in the input must not double count
    rows += rows[:40]
    df = spark.createDataFrame(rows, "b int, i string")
    got = {
        (r.item_a, r.item_b): r
        for r in frequent_pairs(df, "b", "i").collect()
    }

    item_cnt: dict = {}
    pair_cnt: dict = {}
    for its in baskets.values():
        for i in its:
            item_cnt[i] = item_cnt.get(i, 0) + 1
        for a, b in itertools.combinations(its, 2):
            pair_cnt[(a, b)] = pair_cnt.get((a, b), 0) + 1
    n = len(baskets)
    assert set(got) == set(pair_cnt)
    for (a, b), cnt in pair_cnt.items():
        r = got[(a, b)]
        assert r.pair_cnt == cnt and r.cnt_a == item_cnt[a] and r.cnt_b == item_cnt[b]
        assert r.support == pytest.approx(cnt / n, abs=1e-6)
        assert r.lift == pytest.approx(
            (cnt / n) / ((item_cnt[a] / n) * (item_cnt[b] / n)), abs=1e-5
        )


def test_frequent_pairs_prune_and_max_basket(spark):
    rows = [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"), (3, "c")]
    df = spark.createDataFrame(rows, "b int, i string")
    # c appears once -> pruned before pairing at min_item_count=2
    got = frequent_pairs(df, "b", "i", min_item_count=2).collect()
    assert {(r.item_a, r.item_b) for r in got} == {("a", "b")}
    # mega-basket guard: basket 9 exceeds the cap and emits nothing
    rows9 = rows + [(9, x) for x in "abcdefgh"]
    got2 = frequent_pairs(
        spark.createDataFrame(rows9, "b int, i string"), "b", "i", max_basket=4
    ).collect()
    assert all(r.pair_cnt == 2 for r in got2 if (r.item_a, r.item_b) == ("a", "b"))
    assert not any(r.item_a == "g" or r.item_b == "h" for r in got2)


def test_kaplan_meier_vs_sequential_recursion(spark):
    rng = np.random.default_rng(6)
    dur = rng.integers(1, 15, 300)
    event = (rng.random(300) < 0.7).astype(int)
    df = spark.createDataFrame(
        [(int(d), int(e)) for d, e in zip(dur, event)], "d int, e int"
    )
    got = {r.duration: r for r in kaplan_meier(df, "d", "e").collect()}

    # straight-line textbook recursion over sorted times
    s = 1.0
    at_risk = len(dur)
    for t in sorted(set(dur.tolist())):
        d_t = int(((dur == t) & (event == 1)).sum())
        c_t = int(((dur == t) & (event == 0)).sum())
        r = got[t]
        assert r.n_at_risk == at_risk and r.events == d_t and r.censored == c_t
        s *= 1.0 - d_t / at_risk
        assert r.survival == pytest.approx(s, abs=2e-6)
        at_risk -= d_t + c_t
    assert at_risk == 0


def test_kaplan_meier_no_censoring_matches_ecdf(spark):
    # with zero censoring, S(t) = 1 - ECDF(t)
    rows = [(d, 1) for d in (1, 1, 2, 3, 3, 3, 5, 8)]
    df = spark.createDataFrame(rows, "d int, e int")
    got = {r.duration: r.survival for r in kaplan_meier(df, "d", "e").collect()}
    assert got[1] == pytest.approx(6 / 8)
    assert got[3] == pytest.approx(2 / 8)
    assert got[8] == pytest.approx(0.0)


def test_target_encode_oof_leakage_free(spark):
    rng = np.random.default_rng(8)
    rows = [
        (int(k), ["x", "y", "z"][int(rng.integers(0, 3))], float(rng.normal(100, 10)))
        for k in range(600)
    ]
    df = spark.createDataFrame(rows, "k long, cat string, y double")
    k = 4
    enc = {
        (r.category, r.fold): r
        for r in target_encode_oof(df, "cat", "y", "k", k=k).collect()
    }
    folds = {
        r.k: r.fold
        for r in df.select("k", oof_fold_expr(df.k, k).alias("fold")).collect()
    }
    # reference: per (cat, fold), mean of the OTHER folds' targets
    for (cat, fold), r in enc.items():
        others = [y for kk, c, y in rows if c == cat and folds[kk] != fold]
        mine = [y for kk, c, y in rows if c == cat and folds[kk] == fold]
        assert r.n_in_fold == len(mine) and r.n_oof == len(others)
        assert r.encoded == pytest.approx(float(np.mean(others)), abs=1e-5)
        # leakage check: the in-fold mean must NOT equal the encoding
        if abs(np.mean(mine) - np.mean(others)) > 1e-9:
            assert r.encoded != pytest.approx(float(np.mean(mine)), abs=1e-9)


def test_target_encode_single_fold_category_falls_back_global(spark):
    # category "solo" has rows in exactly one fold -> encodes to the
    # out-of-fold global mean, never NaN
    rows = [(i, "big", 10.0) for i in range(100)]
    solo_key = 0
    rows.append((1000 + solo_key, "solo", 99.0))
    df = spark.createDataFrame(rows, "k long, cat string, y double")
    out = target_encode_oof(df, "cat", "y", "k", k=5).collect()
    solo = [r for r in out if r.category == "solo"]
    assert len(solo) == 1 and solo[0].n_oof == 0
    # g excludes the solo row's ENTIRE fold (all categories) -> mean of
    # the "big" rows in the other folds, all 10.0
    assert solo[0].encoded == pytest.approx(10.0, abs=1e-9)


def test_target_encode_global_mean_excludes_whole_fold(spark):
    # the smoothing prior / single-fold fallback must not see labels from
    # the SAME fold in OTHER categories: plant an extreme-label category
    # entirely inside the solo row's fold and check g ignores it
    import hashlib

    k = 5

    def py_fold(key: int) -> int:  # python twin of oof_fold_expr
        return int(hashlib.md5(str(key).encode()).hexdigest()[:8], 16) % 10000 % k

    rows = [(i, "big", 10.0) for i in range(200)]
    solo_key = 1000
    rows.append((solo_key, "solo", 99.0))
    solo_fold = py_fold(solo_key)
    poison_keys = [i for i in range(2000, 3000) if py_fold(i) == solo_fold][:50]
    rows += [(pk, "poison", 1e6) for pk in poison_keys]
    df = spark.createDataFrame(rows, "k long, cat string, y double")
    out = target_encode_oof(df, "cat", "y", "k", k=k).collect()
    solo = [r for r in out if r.category == "solo"][0]
    # expected: mean over everything OUTSIDE solo_fold = "big" rows only
    outside = [y for kk, c, y in rows if py_fold(kk) != solo_fold]
    assert all(c == "big" for kk, c, y in rows if py_fold(kk) != solo_fold)
    assert solo.encoded == pytest.approx(float(np.mean(outside)), abs=1e-6)
    # the poison labels (1e6, same fold) must not have leaked in
    assert solo.encoded < 100.0
