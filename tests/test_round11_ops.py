"""Round-11 operator tests: Mann-Kendall/Theil-Sen trend, Kendall tau-b,
and the streaming sessionization twin."""

import math

import numpy as np
import pytest


def _mk_reference(xs):
    """Brute-force Mann-Kendall + Theil-Sen on one series (positions are
    1..n in order)."""
    n = len(xs)
    s = 0
    slopes = []
    tied = 0
    npairs = 0
    for i in range(n):
        for j in range(i + 1, n):
            d = float(xs[j]) - float(xs[i])
            s += int(d > 0) - int(d < 0)
            tied += int(d == 0)
            npairs += 1
            slopes.append(d / (j - i))
    slopes.sort()
    m = len(slopes)
    lo = slopes[(m + 1) // 2 - 1]
    hi = slopes[m // 2]
    med = (lo + hi) / 2.0
    from collections import Counter

    tt = sum(t * (t - 1) * (2 * t + 5) for t in Counter(xs).values())
    var_s = (n * (n - 1) * (2 * n + 5) - tt) / 18.0
    if var_s > 0:
        z = (s - 1) / math.sqrt(var_s) if s > 0 else (
            (s + 1) / math.sqrt(var_s) if s < 0 else 0.0
        )
    else:
        z = 0.0
    tau = (
        s / math.sqrt((npairs - tied) * npairs) if npairs > tied else None
    )
    return s, var_s, z, med, tau


class TestMannKendall:
    def test_matches_bruteforce_reference(self, spark):
        from preprocessor_spark.operators.trend import mann_kendall

        rng = np.random.default_rng(19)
        series = {
            "up": np.round(np.arange(20) * 0.5 + rng.normal(0, 1, 20), 2),
            "down": np.round(-np.arange(15) * 0.3 + rng.normal(0, 0.5, 15), 2),
            "flat": np.round(rng.normal(5, 0.1, 25), 2),
            "ties": np.array([1.0, 2.0, 2.0, 2.0, 3.0, 1.0, 2.0]),
        }
        rows = [
            (k, i + 1, float(v))
            for k, xs in series.items()
            for i, v in enumerate(xs)
        ]
        df = spark.createDataFrame(rows, "g string, pos long, v double")
        got = {
            r["key"]: r
            for r in mann_kendall(df, "g", "pos", "v", last_k=100).collect()
        }
        for k, xs in series.items():
            s, var_s, z, med, tau = _mk_reference(list(xs))
            r = got[k]
            assert r["s_stat"] == s, k
            assert r["var_s"] == pytest.approx(var_s, rel=1e-12), k
            assert r["z"] == pytest.approx(z, rel=1e-9), k
            assert r["theil_sen_slope"] == pytest.approx(med, rel=1e-12), k
            if tau is None:
                assert r["kendall_tau_b"] is None, k
            else:
                assert r["kendall_tau_b"] == pytest.approx(tau, rel=1e-9), k
        # signs make sense
        assert got["up"]["z"] > 3 and got["down"]["z"] < -3
        assert abs(got["flat"]["z"]) < 2
        assert got["up"]["theil_sen_slope"] == pytest.approx(0.5, abs=0.2)

    def test_last_k_window_bounds_pairs(self, spark):
        from preprocessor_spark.operators.trend import mann_kendall

        rows = [("u", i, float(i % 7)) for i in range(200)]
        df = spark.createDataFrame(rows, "g string, pos long, v double")
        r = mann_kendall(df, "g", "pos", "v", last_k=10).collect()[0]
        assert r["n_used"] == 10

    def test_session_stream_matches_batch_across_batches(self, spark, tmp_path):
        """Two time-cut files drained with maxFilesPerTrigger=1 exercise
        cross-batch state continuation: sessions spanning the cut must
        merge, and the drained report must equal the batch session_stats
        frame exactly."""
        import pandas as pd

        from preprocessor_spark.operators.sessions import session_stats
        from preprocessor_spark.streaming import (
            run_available_now,
            session_report_from_states,
            sessionize_stream,
        )

        rng = np.random.default_rng(23)
        rows = []
        base = pd.Timestamp("2024-03-01 00:00:00")
        for u in range(8):
            t = base
            for _ in range(40):
                gap_min = int(rng.choice([1, 5, 90, 200], p=[0.5, 0.3, 0.1, 0.1]))
                t = t + pd.Timedelta(minutes=gap_min)
                rows.append((u, t))
        pdf = pd.DataFrame(rows, columns=["user_id", "ts"])
        cut = pdf.ts.quantile(0.5)
        src = str(tmp_path / "sess_src")
        spark.createDataFrame(pdf[pdf.ts < cut]).coalesce(1).write.parquet(src)
        spark.createDataFrame(pdf[pdf.ts >= cut]).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        stream = (
            spark.readStream.schema("user_id long, ts timestamp")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        run_available_now(
            sessionize_stream(stream, gap_seconds=3600.0),
            "sess_state_t",
            output_mode="update",
        )
        got = sorted(
            session_report_from_states(spark.table("sess_state_t")).collect(),
            key=lambda r: (r["user_id"], r["session_seq"]),
        )
        want = sorted(
            session_stats(
                spark.createDataFrame(pdf), "ts", ["user_id"], 3600.0
            ).collect(),
            key=lambda r: (r["user_id"], r["session_seq"]),
        )
        assert len(got) == len(want) > 8
        for g, w in zip(got, want):
            assert g["user_id"] == w["user_id"]
            assert g["session_seq"] == w["session_seq"]
            assert g["n_events"] == w["n_events"]
            assert g["session_start"] == w["session_start"]
            assert g["session_end"] == w["session_end"]
            assert g["duration_sec"] == pytest.approx(
                float(w["duration_sec"]), abs=1e-9
            )

    def test_diff_in_diff_recovers_planted_effect(self, spark):
        from preprocessor_spark.operators.abtest import diff_in_diff

        rng = np.random.default_rng(31)
        rows = []
        # control: 10 -> 12 (trend +2); treated: 20 -> 27 (trend +2,
        # effect +5)
        for t, p, mu, n in [
            (0, 0, 10.0, 400),
            (0, 1, 12.0, 400),
            (1, 0, 20.0, 300),
            (1, 1, 27.0, 300),
        ]:
            for v in rng.normal(mu, 1.0, n):
                rows.append((bool(t), bool(p), round(float(v), 3)))
        df = spark.createDataFrame(rows, "treated boolean, post boolean, y double")
        r = diff_in_diff(df, "treated", "post", "y").collect()[0]
        assert r["n"] == 1400
        assert r["did_effect"] == pytest.approx(5.0, abs=0.3)
        assert r["diff_control"] == pytest.approx(2.0, abs=0.2)
        assert r["z"] > 10  # strongly significant
        assert r["ci95_lo"] < r["did_effect"] < r["ci95_hi"]
        # no effect -> z near zero
        rows2 = [
            (bool(t), bool(p), round(float(v), 3))
            for t in (0, 1)
            for p in (0, 1)
            for v in rng.normal(10 + 2 * p, 1.0, 300)
        ]
        df2 = spark.createDataFrame(rows2, "treated boolean, post boolean, y double")
        r2 = diff_in_diff(df2, "treated", "post", "y").collect()[0]
        assert abs(r2["z"]) < 3

    def test_james_stein_shrinks_small_groups_and_cuts_mse(self, spark):
        from preprocessor_spark.operators.shrinkage import james_stein_means

        rng = np.random.default_rng(41)
        truth = {}
        rows = []
        for g in range(60):
            mu = float(rng.normal(50, 3))  # real between-group spread
            n = int(rng.choice([2, 3, 5, 40, 80]))
            truth[f"g{g}"] = mu
            for v in rng.normal(mu, 10, n):
                rows.append((f"g{g}", round(float(v), 3)))
        df = spark.createDataFrame(rows, "g string, y double")
        got = {r["group"]: r for r in james_stein_means(df, "g", "y").collect()}
        assert len(got) == 60
        # small-n groups shrink harder
        small = [r for r in got.values() if r["n"] <= 5]
        big = [r for r in got.values() if r["n"] >= 40]
        assert min(r["shrink_factor"] for r in small) > max(
            r["shrink_factor"] for r in big
        )
        # the EB estimate beats the raw mean in aggregate MSE vs truth
        mse_raw = np.mean(
            [(got[g]["mean_raw"] - truth[g]) ** 2 for g in truth]
        )
        mse_eb = np.mean(
            [(got[g]["mean_shrunk"] - truth[g]) ** 2 for g in truth]
        )
        assert mse_eb < mse_raw
        # tau2 recovers the planted between-group variance's scale
        tau2 = next(iter(got.values()))["tau2"]
        assert 2.0 < tau2 < 30.0

    def test_james_stein_collapses_when_no_signal(self, spark):
        from preprocessor_spark.operators.shrinkage import james_stein_means

        rng = np.random.default_rng(43)
        rows = [
            (f"g{g}", round(float(v), 3))
            for g in range(20)
            for v in rng.normal(10, 5, 4)  # identical true means
        ]
        df = spark.createDataFrame(rows, "g string, y double")
        out = james_stein_means(df, "g", "y").collect()
        raw_spread = np.std([r["mean_raw"] for r in out])
        eb_spread = np.std([r["mean_shrunk"] for r in out])
        assert eb_spread < raw_spread * 0.7

    def test_sequential_looks_null_and_effect(self, spark):
        from preprocessor_spark.operators.abtest import sequential_ztest_looks

        rng = np.random.default_rng(47)
        # null experiment: no look should cross OBF (overwhelmingly)
        rows = [
            (bool(i % 2), round(float(rng.normal(10, 2)), 3), p)
            for p in range(5)
            for i in range(400)
        ]
        df = spark.createDataFrame(rows, "variant boolean, y double, period int")
        looks = sequential_ztest_looks(df, "variant", "y", "period").orderBy(
            "look"
        ).collect()
        assert [r["look"] for r in looks] == [1, 2, 3, 4, 5]
        # boundaries: OBF decreasing to ~1.96 at the last look; HP flat 3
        # until the final 1.96
        assert looks[0]["obf_bound"] > looks[-1]["obf_bound"]
        assert looks[-1]["obf_bound"] == pytest.approx(1.959963984540054)
        assert all(r["hp_bound"] == 3.0 for r in looks[:-1])
        assert looks[-1]["hp_bound"] == pytest.approx(1.959963984540054)
        assert not any(r["cross_obf"] for r in looks)
        # strong effect from period 2 on: a later look crosses
        rows2 = [
            (bool(i % 2), round(float(rng.normal(10 + (3.0 if (i % 2 and p >= 2) else 0.0), 2)), 3), p)
            for p in range(5)
            for i in range(400)
        ]
        df2 = spark.createDataFrame(rows2, "variant boolean, y double, period int")
        looks2 = sequential_ztest_looks(df2, "variant", "y", "period").orderBy(
            "look"
        ).collect()
        assert any(r["cross_obf"] for r in looks2)
        assert any(r["cross_hp"] for r in looks2)

    def test_containment_detects_quotes_jaccard_misses(self, spark):
        from preprocessor_spark.operators.dedup import containment_pairs

        quote = "the quick brown fox jumps over the lazy dog tonight"
        filler = " ".join(f"w{i} x{i} y{i}" for i in range(60))
        rows = [
            (1, quote),
            (2, filler + " " + quote + " " + filler.replace("w", "v")),
            (3, "completely different text about other things entirely now"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {
            (r["id_a"], r["id_b"]): r
            for r in containment_pairs(
                df, "text", "doc_id", shingle_n=3, threshold=0.5
            ).collect()
        }
        assert (1, 2) in out
        r = out[(1, 2)]
        # every shingle of the quote (except the two seam-crossing ones at
        # the splice) appears in doc 2 -> containment(1 in 2) high, while
        # Jaccard would be tiny (doc 2 has ~360 shingles)
        assert r["containment_a_in_b"] >= 0.7
        assert r["containment_b_in_a"] < 0.1
        assert (1, 3) not in out and (2, 3) not in out

    def test_containment_df_cap_drops_boilerplate(self, spark):
        from preprocessor_spark.operators.dedup import containment_pairs

        # 30 docs share ONE boilerplate sentence; with max_df below 30 the
        # hot shingles leave the index and no pair qualifies
        boiler = "all rights reserved contact us terms of service apply"
        rows = [(i, f"doc {i} body text piece {i} " + boiler) for i in range(30)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        hits = containment_pairs(
            df, "text", "doc_id", shingle_n=3, threshold=0.5, max_df=10
        ).count()
        assert hits == 0
        hits_nocap = containment_pairs(
            df, "text", "doc_id", shingle_n=3, threshold=0.5, max_df=1000
        ).count()
        assert hits_nocap > 100  # boilerplate joins everything

    def test_ranking_metrics_match_reference(self, spark):
        from preprocessor_spark.operators.ranking_eval import ranking_metrics

        # q1: rel docs at ranks 1,3 of 2 relevant -> perfect recall
        # q2: rel doc at rank 4 of 3 relevant
        # q3: nothing relevant retrieved
        results = spark.createDataFrame(
            [("q1", f"d{i}", i) for i in range(1, 11)]
            + [("q2", f"e{i}", i) for i in range(1, 11)]
            + [("q3", f"f{i}", i) for i in range(1, 11)],
            "query_id string, doc_id string, rank int",
        )
        qrels = spark.createDataFrame(
            [("q1", "d1", 1), ("q1", "d3", 1),
             ("q2", "e4", 1), ("q2", "x9", 1), ("q2", "x10", 1),
             ("q3", "z1", 1)],
            "query_id string, doc_id string, rel int",
        )
        got = {
            r["query_id"]: r
            for r in ranking_metrics(results, qrels, k=10).collect()
        }
        dcg1 = 1 / math.log2(2) + 1 / math.log2(4)
        idcg1 = 1 / math.log2(2) + 1 / math.log2(3)
        assert got["q1"]["ndcg"] == pytest.approx(dcg1 / idcg1, abs=1e-6)
        assert got["q1"]["mrr"] == 1.0
        assert got["q1"]["recall"] == 1.0 and got["q1"]["hit"]
        dcg2 = 1 / math.log2(5)
        idcg2 = 1 / math.log2(2) + 1 / math.log2(3) + 1 / math.log2(4)
        assert got["q2"]["ndcg"] == pytest.approx(dcg2 / idcg2, abs=1e-6)
        assert got["q2"]["mrr"] == 0.25
        assert got["q2"]["recall"] == pytest.approx(1 / 3, abs=1e-6)
        assert got["q3"]["ndcg"] == 0.0 and got["q3"]["mrr"] == 0.0
        assert not got["q3"]["hit"] and got["q3"]["n_relevant"] == 1

    def test_ranking_metrics_graded_gains(self, spark):
        from preprocessor_spark.operators.ranking_eval import ranking_metrics

        # graded rel=2 doc ranked below rel=1 doc -> NDCG < 1
        results = spark.createDataFrame(
            [("q", "a", 1), ("q", "b", 2)],
            "query_id string, doc_id string, rank int",
        )
        qrels = spark.createDataFrame(
            [("q", "a", 1), ("q", "b", 2)],
            "query_id string, doc_id string, rel int",
        )
        r = ranking_metrics(results, qrels, k=10).collect()[0]
        dcg = 1 / math.log2(2) + 3 / math.log2(3)
        idcg = 3 / math.log2(2) + 1 / math.log2(3)
        assert r["ndcg"] == pytest.approx(dcg / idcg, abs=1e-6)
        assert r["ndcg"] < 1.0

    def test_calibration_report_identity_and_gaps(self, spark):
        from preprocessor_spark.operators.metrics import calibration_report

        rng = np.random.default_rng(53)
        rows = []
        # scores constant within bins (bin centers) -> the Murphy identity
        # BRIER = REL - RES + UNC holds exactly
        for center, true_rate, n in [
            (0.05, 0.05, 400),  # calibrated
            (0.45, 0.45, 400),  # calibrated
            (0.85, 0.55, 400),  # overconfident: gap = +0.3
        ]:
            ys = (rng.uniform(0, 1, n) < true_rate).astype(int)
            rows += [(center, int(y)) for y in ys]
        df = spark.createDataFrame(rows, "score double, label int")
        out = {r["bin"]: r for r in calibration_report(df, "score", "label").collect()}
        assert set(out) == {0, 4, 8}
        r = out[8]
        assert r["mean_predicted"] == pytest.approx(0.85, abs=1e-9)
        assert abs(r["gap"] - (0.85 - r["observed_rate"])) < 1e-9
        assert r["gap"] > 0.2  # overconfident bin surfaced
        any_row = out[0]
        ident = (
            any_row["reliability"] - any_row["resolution"] + any_row["uncertainty"]
        )
        assert any_row["brier"] == pytest.approx(ident, abs=1e-6)
        # a perfectly calibrated score set has near-zero reliability
        rows2 = []
        for center in (0.05, 0.25, 0.45, 0.65, 0.85):
            ys = (rng.uniform(0, 1, 2000) < center).astype(int)
            rows2 += [(center, int(y)) for y in ys]
        df2 = spark.createDataFrame(rows2, "score double, label int")
        r2 = calibration_report(df2, "score", "label").collect()[0]
        assert r2["reliability"] < 0.002

    def test_calibration_validation_and_clamp(self, spark):
        from preprocessor_spark.operators.metrics import calibration_report

        df = spark.createDataFrame(
            [(1.7, 1), (-0.3, 0), (1.0, 1)], "score double, label int"
        )
        out = {r["bin"]: r for r in calibration_report(df, "score", "label").collect()}
        assert set(out) == {0, 9}  # clamped into the edge bins
        assert out[9]["n"] == 2
        with pytest.raises(ValueError, match="n_bins"):
            calibration_report(df, "score", "label", n_bins=1)

    def test_outlier_resistance_of_theil_sen(self, spark):
        from preprocessor_spark.operators.trend import mann_kendall

        xs = [1.0 * i for i in range(30)]
        xs[7] = 500.0  # gross outlier barely moves the slope median
        rows = [("u", i + 1, v) for i, v in enumerate(xs)]
        df = spark.createDataFrame(rows, "g string, pos long, v double")
        r = mann_kendall(df, "g", "pos", "v", last_k=100).collect()[0]
        assert r["theil_sen_slope"] == pytest.approx(1.0, abs=0.05)
