"""Round-7 fixes: avro_py save modes + pre-epoch timestamps, fallback
option passthrough, protoshim auto-vivification, DST-safe cohort offsets.

Reference parity notes: the save-mode contract mirrors Spark's
DataFrameWriter modes; the protobuf semantics mirror real protobuf
message auto-vivification (write-through submessage presence).
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest


class TestAvroPyRound7:
    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "id long, ts timestamp")

    def test_pre_epoch_fractional_timestamp_roundtrip(self, spark, tmp_path):
        """1969-12-31T23:59:59.999999 must encode as -1 micro, not
        +999999 (round-6 advice: total_seconds() truncation bug)."""
        from preprocessor_spark.sources.avro_py import (
            register_avro_source,
            write_avro_py,
        )

        rows = [
            (1, dt.datetime(1969, 12, 31, 23, 59, 59, 999999)),
            (2, dt.datetime(1969, 12, 31, 23, 59, 58, 500000)),
            (3, dt.datetime(1832, 6, 1, 0, 0, 0, 123456)),  # large magnitude
            (4, dt.datetime(2024, 2, 29, 12, 0, 0, 1)),
        ]
        dest = str(tmp_path / "preepoch")
        write_avro_py(self._df(spark, rows), dest)
        register_avro_source(spark)
        back = {
            r["id"]: r["ts"]
            for r in spark.read.format("avro_py").load(dest).collect()
        }
        for i, ts in rows:
            assert back[i] == ts, (i, back[i], ts)

    def test_append_mode_accumulates_without_clobber(self, spark, tmp_path):
        from preprocessor_spark.sources.avro_py import (
            register_avro_source,
            write_avro_py,
        )

        dest = str(tmp_path / "appendable")
        df = self._df(spark, [(1, dt.datetime(2024, 1, 1))])
        write_avro_py(df, dest)
        write_avro_py(df, dest, mode="append")
        write_avro_py(df, dest, mode="append")
        register_avro_source(spark)
        assert spark.read.format("avro_py").load(dest).count() == 3

    def test_error_and_ignore_modes(self, spark, tmp_path):
        from preprocessor_spark.sources.avro_py import (
            register_avro_source,
            write_avro_py,
        )

        dest = str(tmp_path / "modal")
        df1 = self._df(spark, [(1, dt.datetime(2024, 1, 1))])
        df2 = self._df(spark, [(2, dt.datetime(2025, 1, 1))])
        write_avro_py(df1, dest)
        with pytest.raises(FileExistsError):
            write_avro_py(df2, dest, mode="error")
        write_avro_py(df2, dest, mode="ignore")  # no-op
        register_avro_source(spark)
        got = spark.read.format("avro_py").load(dest).collect()
        assert [r["id"] for r in got] == [1]
        with pytest.raises(ValueError):
            write_avro_py(df2, dest, mode="bogus")

    def test_fallback_rejects_unsupported_options(self, spark, tmp_path):
        """read_avro / write_avro refuse loudly instead of silently
        dropping spark-avro options the pure-Python path can't honor."""
        from preprocessor_spark.sources import read_avro, write_avro

        dest = str(tmp_path / "opts")
        df = self._df(spark, [(1, dt.datetime(2024, 1, 1))])
        # supported mapping: compression -> codec
        write_avro(df, dest, compression="uncompressed")
        assert read_avro(spark, dest).count() == 1
        with pytest.raises(NotImplementedError):
            write_avro(df, str(tmp_path / "opts2"), avroSchema="{}")
        with pytest.raises(NotImplementedError):
            read_avro(spark, dest, avroSchema="{}")


class TestProtoShimAutoViv:
    def test_submessage_write_through(self):
        """msg.sub.field = x must mutate the STORED submessage and appear
        on the wire (round-6 advice: throwaway default lost writes)."""
        from preprocessor_spark.protoshim import install

        install()
        from pyspark.sql.streaming.proto import StateMessage_pb2 as sm

        req = sm.StateRequest()
        req.statefulProcessorCall.getValueState.stateName = "totals"
        assert req.statefulProcessorCall.getValueState.stateName == "totals"
        back = sm.StateRequest()
        back.ParseFromString(req.SerializeToString())
        assert back.statefulProcessorCall.getValueState.stateName == "totals"

    def test_untouched_autoviv_not_serialized(self):
        from preprocessor_spark.protoshim import install

        install()
        from pyspark.sql.streaming.proto import StateMessage_pb2 as sm

        req = sm.StateRequest(version=3)
        _ = req.statefulProcessorCall  # read-only touch
        blob = req.SerializeToString()
        only_version = sm.StateRequest(version=3).SerializeToString()
        assert blob == only_version


class TestCohortOffsetArithmetic:
    def test_week_offsets_from_calendar_days(self, spark):
        """Offsets are floor(datediff/7) of Monday-truncated weeks, not
        epoch-second division (DST-safe by construction)."""
        from preprocessor_spark.operators.funnel import cohort_retention

        rows = [
            ("u1", dt.datetime(2024, 1, 1, 9)),   # Mon wk0
            ("u1", dt.datetime(2024, 1, 8, 9)),   # wk1
            ("u1", dt.datetime(2024, 1, 21, 9)),  # Sun of wk2
            ("u2", dt.datetime(2024, 1, 3, 9)),   # Wed wk0 cohort 2024-01-01
            ("u2", dt.datetime(2024, 1, 15, 9)),  # wk2
        ]
        df = spark.createDataFrame(pd.DataFrame(rows, columns=["user_id", "ts"]))
        got = {
            (str(r["cohort_week"]), r["week_offset"]): r["n_users"]
            for r in cohort_retention(df, "user_id", "ts").collect()
        }
        assert got == {
            ("2024-01-01 00:00:00", 0): 2,
            ("2024-01-01 00:00:00", 1): 1,
            ("2024-01-01 00:00:00", 2): 2,
        }
