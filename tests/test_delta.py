"""Pure-Python Delta Lake layer tests: log replay, stats pruning,
time travel, overwrite removes, checkpoints, spec-shaped actions."""

import datetime as dt
import json
import os

import pytest
from pyspark.sql import functions as F

from preprocessor_spark.sources.delta import (
    _latest_version,
    _load_state,
    delta_history,
    plan_delta_scan,
    read_delta,
    write_delta,
)

SF = "/root/testdata/sf0.001"


def _orders(spark):
    return spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderkey", "o_totalprice", "o_orderdate", "o_orderpriority"
    )


class TestDeltaRoundTrip:
    def test_write_read_lossless(self, spark, tmp_path):
        t = str(tmp_path / "t1")
        o = _orders(spark)
        v = write_delta(o.repartition(4), t, mode="append")
        assert v == 0
        back = read_delta(spark, t)
        assert back.count() == o.count()
        a = sorted(o.collect(), key=lambda r: r["o_orderkey"])
        b = sorted(back.collect(), key=lambda r: r["o_orderkey"])
        assert a == b
        # schema restored through schemaString
        assert back.schema == o.schema

    def test_append_and_time_travel(self, spark, tmp_path):
        t = str(tmp_path / "t2")
        o = _orders(spark)
        lo = o.where(F.col("o_orderkey") % 2 == 0)
        hi = o.where(F.col("o_orderkey") % 2 == 1)
        assert write_delta(lo, t) == 0
        assert write_delta(hi, t, mode="append") == 1
        assert read_delta(spark, t).count() == o.count()
        assert read_delta(spark, t, version=0).count() == lo.count()

    def test_overwrite_emits_removes(self, spark, tmp_path):
        t = str(tmp_path / "t3")
        o = _orders(spark)
        write_delta(o, t)
        small = o.limit(10)
        write_delta(small, t, mode="overwrite")
        assert read_delta(spark, t).count() == 10
        assert read_delta(spark, t, version=0).count() == o.count()
        log1 = open(
            os.path.join(t, "_delta_log", f"{1:020d}.json")
        ).read()
        assert '"remove"' in log1

    def test_latest_version_empty_dir(self, tmp_path):
        assert _latest_version(str(tmp_path)) == -1
        with pytest.raises(FileNotFoundError):
            _load_state(str(tmp_path))


class TestDeltaPruning:
    def _ranged_table(self, spark, tmp_path):
        t = str(tmp_path / "ranged")
        o = _orders(spark)
        write_delta(
            o.repartitionByRange(6, "o_orderdate").sortWithinPartitions(
                "o_orderdate"
            ),
            t,
        )
        return t, o

    def test_stats_prune_files_and_stay_lossless(self, spark, tmp_path):
        t, o = self._ranged_table(spark, tmp_path)
        cut = dt.datetime(1997, 1, 1)
        kept, total, _schema = plan_delta_scan(
            t, where=[("o_orderdate", ">=", cut)]
        )
        assert total == 6
        assert 0 < len(kept) < total  # pruning actually bit
        got = read_delta(spark, t, where=[("o_orderdate", ">=", cut)])
        expect = o.where(F.col("o_orderdate") >= F.lit(cut))
        assert got.count() == expect.count()
        assert sorted(r["o_orderkey"] for r in got.collect()) == sorted(
            r["o_orderkey"] for r in expect.collect()
        )

    def test_equality_and_upper_bound_ops(self, spark, tmp_path):
        t, o = self._ranged_table(spark, tmp_path)
        cut = dt.datetime(1996, 6, 1)
        kept_lt, total, _ = plan_delta_scan(
            t, where=[("o_orderdate", "<", cut)]
        )
        assert 0 < len(kept_lt) < total
        got = read_delta(spark, t, where=[("o_orderdate", "<", cut)])
        assert got.count() == o.where(F.col("o_orderdate") < F.lit(cut)).count()

    def test_unknown_column_and_op_rejected(self, spark, tmp_path):
        t, _ = self._ranged_table(spark, tmp_path)
        with pytest.raises(KeyError):
            plan_delta_scan(t, where=[("nope", ">=", 1)])
        with pytest.raises(ValueError):
            plan_delta_scan(t, where=[("o_orderkey", "!=", 1)])

    def test_empty_prune_returns_empty_frame(self, spark, tmp_path):
        t, _ = self._ranged_table(spark, tmp_path)
        far = dt.datetime(2099, 1, 1)
        df = read_delta(spark, t, where=[("o_orderdate", ">=", far)])
        assert df.count() == 0
        assert "o_orderpriority" in df.columns


class TestDeltaCheckpoint:
    def test_checkpoint_written_and_replayed(self, spark, tmp_path):
        t = str(tmp_path / "ck")
        o = _orders(spark).limit(50)
        for i in range(4):
            write_delta(
                o.withColumn("batch", F.lit(i)),
                t,
                mode="append",
                checkpoint_interval=3,
            )
        log = os.path.join(t, "_delta_log")
        assert os.path.exists(
            os.path.join(log, f"{3:020d}.checkpoint.parquet")
        )
        ptr = json.load(open(os.path.join(log, "_last_checkpoint")))
        assert ptr["version"] == 3
        # checkpoint fast path == full JSON replay
        s_fast = _load_state(t)
        s_slow = _load_state(t, use_checkpoint=False)
        assert s_fast["adds"].keys() == s_slow["adds"].keys()
        assert (
            s_fast["metaData"]["schemaString"]
            == s_slow["metaData"]["schemaString"]
        )
        assert read_delta(spark, t).count() == 200

    def test_history_records_operations(self, spark, tmp_path):
        t = str(tmp_path / "hist")
        o = _orders(spark).limit(20)
        write_delta(o, t)
        write_delta(o, t, mode="append", operation="BACKFILL")
        h = delta_history(t)
        assert [e["version"] for e in h] == [0, 1]
        assert h[0]["operation"] == "WRITE"
        assert h[1]["operation"] == "BACKFILL"
        assert h[1]["operationMetrics"]["numOutputRows"] == "20"


class TestDeltaSpecShape:
    def test_first_commit_actions(self, spark, tmp_path):
        t = str(tmp_path / "spec")
        write_delta(_orders(spark).limit(30).repartition(2), t)
        lines = [
            json.loads(x)
            for x in open(
                os.path.join(t, "_delta_log", f"{0:020d}.json")
            )
            if x.strip()
        ]
        kinds = [next(iter(a)) for a in lines]
        assert kinds[0] == "protocol" and kinds[1] == "metaData"
        assert kinds.count("add") == 2 and kinds[-1] == "commitInfo"
        meta = lines[1]["metaData"]
        assert meta["format"]["provider"] == "parquet"
        json.loads(meta["schemaString"])  # valid Spark schema JSON
        add = next(a["add"] for a in lines if "add" in a)
        assert not os.path.isabs(add["path"])  # spec: relative paths
        stats = json.loads(add["stats"])
        assert set(stats) == {
            "numRecords", "minValues", "maxValues", "nullCount",
        }
        assert stats["minValues"]["o_orderkey"] <= stats["maxValues"][
            "o_orderkey"
        ]
        assert "T" in stats["minValues"]["o_orderdate"]  # ISO timestamp


class TestDeltaConcurrency:
    def test_losing_commit_raises_not_clobbers(
        self, spark, tmp_path, monkeypatch
    ):
        """True race: both writers read latest=0, the other lands v1
        first. The loser must raise ConcurrentDeltaCommit and leave the
        winner's commit intact — never overwrite it."""
        from preprocessor_spark.sources import delta as delta_mod

        t = str(tmp_path / "race")
        o = _orders(spark).limit(20)
        write_delta(o, t)
        winner = os.path.join(t, "_delta_log", f"{1:020d}.json")
        with open(winner, "w") as fh:
            fh.write('{"commitInfo": {"operation": "WINNER"}}\n')
        # pin the loser's view of the log to before the winner's commit
        monkeypatch.setattr(delta_mod, "_latest_version", lambda p: 0)
        with pytest.raises(
            delta_mod.ConcurrentDeltaCommit, match="version 1"
        ):
            delta_mod.write_delta(o, t, mode="append")
        assert '"WINNER"' in open(winner).read()  # untouched
