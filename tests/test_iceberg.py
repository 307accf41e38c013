"""Pure-Python Iceberg v2 layer (sources/iceberg.py): commit round-trip,
stats pruning, append + time travel, and the spec-format details the reader
relies on (Avro metadata schemas, single-value bound serialization)."""

import datetime
import os
import shutil
import struct

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def table(spark, tmp_path_factory):
    from preprocessor_spark.sources.iceberg import write_iceberg

    tp = str(tmp_path_factory.mktemp("ice") / "lineitem")
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").select(
        "l_orderkey", "l_quantity", "l_extendedprice", "l_shipdate", "l_returnflag"
    )
    sid = write_iceberg(
        li.repartitionByRange(8, "l_shipdate").sortWithinPartitions("l_shipdate"),
        tp,
    )
    return tp, sid, li


class TestIcebergRoundtrip:
    def test_scan_equals_source(self, spark, table):
        from preprocessor_spark.sources.iceberg import read_iceberg

        tp, _, li = table
        back = read_iceberg(spark, tp)
        assert sorted(map(tuple, back.collect())) == sorted(
            map(tuple, li.collect())
        )

    def test_schema_restored(self, spark, table):
        from preprocessor_spark.sources.iceberg import read_iceberg

        tp, _, li = table
        got = read_iceberg(spark, tp).schema
        assert [f.name for f in got.fields] == li.columns
        assert {f.name: f.dataType for f in got.fields} == {
            f.name: f.dataType for f in li.schema.fields
        }


class TestIcebergPruning:
    def test_bounds_prune_files_and_stay_lossless(self, spark, table):
        from preprocessor_spark.sources.iceberg import (
            plan_iceberg_scan,
            read_iceberg,
        )

        tp, _, li = table
        cut = datetime.datetime(1997, 1, 1)
        kept, total, _, _ = plan_iceberg_scan(tp, where=[("l_shipdate", ">=", cut)])
        assert total == 8
        assert 0 < len(kept) < total  # range-sorted files actually prune
        got = read_iceberg(spark, tp, where=[("l_shipdate", ">=", cut)])
        want = li.filter("l_shipdate >= '1997-01-01'")
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        )

    def test_impossible_predicate_prunes_everything(self, spark, table):
        from preprocessor_spark.sources.iceberg import (
            plan_iceberg_scan,
            read_iceberg,
        )

        tp, _, _ = table
        kept, total, _, _ = plan_iceberg_scan(
            tp, where=[("l_quantity", ">", 1e12)]
        )
        assert kept == [] and total == 8
        assert read_iceberg(spark, tp, where=[("l_quantity", ">", 1e12)]).count() == 0

    def test_equality_predicate_uses_both_bounds(self, spark, table):
        from preprocessor_spark.sources.iceberg import plan_iceberg_scan

        tp, _, _ = table
        cut = datetime.datetime(1998, 6, 1)
        kept, total, _, _ = plan_iceberg_scan(tp, where=[("l_shipdate", "=", cut)])
        assert len(kept) <= 2  # a point probe hits the one straddling file

    def test_conjunction_prunes_with_all_terms(self, spark, table):
        from preprocessor_spark.sources.iceberg import (
            plan_iceberg_scan,
            read_iceberg,
        )

        tp, _, li = table
        where = [
            ("l_shipdate", ">=", datetime.datetime(1996, 1, 1)),
            ("l_shipdate", "<", datetime.datetime(1997, 1, 1)),
        ]
        kept, total, _, _ = plan_iceberg_scan(tp, where=where)
        assert 0 < len(kept) < total
        got = read_iceberg(spark, tp, where=where).count()
        assert got == li.filter(
            "l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'"
        ).count()

    def test_unknown_column_and_op_rejected(self, table):
        from preprocessor_spark.sources.iceberg import plan_iceberg_scan

        tp, _, _ = table
        with pytest.raises(KeyError):
            plan_iceberg_scan(tp, where=[("nope", ">=", 1)])
        with pytest.raises(ValueError):
            plan_iceberg_scan(tp, where=[("l_quantity", "!=", 1)])


class TestIcebergHistory:
    def test_append_and_time_travel(self, spark, table):
        from preprocessor_spark.sources.iceberg import (
            iceberg_snapshots,
            read_iceberg,
            write_iceberg,
        )

        tp, sid1, li = table
        tp2 = tp + "_hist"
        shutil.rmtree(tp2, ignore_errors=True)
        shutil.copytree(tp, tp2)
        # the copied layout embeds tp paths; re-commit instead for tp2
        shutil.rmtree(tp2, ignore_errors=True)
        s1 = write_iceberg(li, tp2)
        s2 = write_iceberg(li.limit(100), tp2, mode="append")
        snaps = iceberg_snapshots(tp2)
        assert [s["snapshot-id"] for s in snaps] == [s1, s2]
        n = li.count()
        assert read_iceberg(spark, tp2).count() == n + 100
        assert read_iceberg(spark, tp2, snapshot_id=s1).count() == n
        with pytest.raises(KeyError):
            read_iceberg(spark, tp2, snapshot_id=12345)


class TestIcebergFormat:
    def test_metadata_json_shape(self, table):
        import json

        tp, sid, _ = table
        v = int(open(os.path.join(tp, "metadata", "version-hint.text")).read())
        meta = json.load(
            open(os.path.join(tp, "metadata", f"v{v}.metadata.json"))
        )
        assert meta["format-version"] == 2
        assert meta["current-snapshot-id"] == sid
        sch = meta["schemas"][0]
        assert {f["name"] for f in sch["fields"]} >= {"l_orderkey", "l_shipdate"}
        assert all(f["id"] >= 1 for f in sch["fields"])

    def test_manifests_are_valid_avro_containers(self, table):
        """The metadata Avro files must parse with the generic Avro reader
        (schema in the header, sync-marker framing) — not just our own
        fixed-shape decoder."""
        from preprocessor_spark.sources.avro_py import (
            _iter_file_rows,
            read_avro_schema,
        )

        tp, _, _ = table
        meta_dir = os.path.join(tp, "metadata")
        avros = [f for f in os.listdir(meta_dir) if f.endswith(".avro")]
        assert len(avros) == 2  # one manifest + one manifest list
        for name in avros:
            p = os.path.join(meta_dir, name)
            schema, styp = read_avro_schema(p)
            rows = list(_iter_file_rows(p))
            assert rows, name
            assert schema["name"] in ("manifest_file", "manifest_entry")

    def test_single_value_serialization_roundtrip(self):
        from preprocessor_spark.sources.iceberg import _sv_decode, _sv_encode

        cases = [
            ("int", 42), ("int", -7), ("long", 1 << 40), ("double", 3.5),
            ("float", 0.25), ("string", "naïve"), ("boolean", True),
            ("date", datetime.date(2024, 2, 29)),
            ("timestamptz", datetime.datetime(2020, 1, 2, 3, 4, 5, 6)),
            ("binary", b"\x00\xff"),
        ]
        for t, v in cases:
            assert _sv_decode(_sv_encode(v, t), t) == v, (t, v)
        # spec Appendix D: little-endian fixed widths
        assert _sv_encode(1, "int") == struct.pack("<i", 1)
        assert _sv_encode(1, "long") == struct.pack("<q", 1)

    def test_bounds_cover_values(self, spark, table):
        """Every file's decoded [lower, upper] must bracket the actual
        column min/max of that file."""
        from preprocessor_spark.sources.iceberg import (
            _kv_to_dict,
            _avro_records,
            _load_metadata,
            _read_manifest_list,
            _resolve_snapshot,
            _sv_decode,
        )

        tp, _, _ = table
        meta, _v = _load_metadata(tp)
        snap = _resolve_snapshot(meta, None)
        fields = {f["name"]: f for f in meta["schemas"][0]["fields"]}
        qf = fields["l_quantity"]
        for m in _read_manifest_list(snap["manifest-list"]):
            for e in _avro_records(m["manifest_path"]):
                df = e["data_file"]
                lo = _sv_decode(_kv_to_dict(df["lower_bounds"]).get(qf["id"]), qf["type"])
                hi = _sv_decode(_kv_to_dict(df["upper_bounds"]).get(qf["id"]), qf["type"])
                pdf = spark.read.parquet(df["file_path"]).agg(
                    {"l_quantity": "min"}
                ).collect()
                actual_min = pdf[0][0]
                assert lo is not None and hi is not None
                assert lo <= actual_min <= hi


class TestPositionDeletes:
    """v2 merge-on-read: delete_iceberg writes position-delete parquet +
    a content=1 delete manifest; read_iceberg anti-joins (path, pos)."""

    SF = "/root/testdata/sf0.001"

    def _table(self, spark, tmp_path):
        t = str(tmp_path / "mor")
        o = spark.read.parquet(f"{self.SF}/orders.parquet").select(
            "o_orderkey", "o_totalprice", "o_orderpriority"
        )
        from preprocessor_spark.sources.iceberg import write_iceberg

        snap0 = write_iceberg(o.repartition(4), t)
        return t, o, snap0

    def test_delete_then_scan_matches_filtered_batch(self, spark, tmp_path):
        from preprocessor_spark.sources.iceberg import (
            delete_iceberg,
            position_delete_files,
        )

        from preprocessor_spark.sources.iceberg import read_iceberg

        t, o, snap0 = self._table(spark, tmp_path)
        n0 = o.count()
        _sid, nd = delete_iceberg(
            spark, t, [("o_orderpriority", "=", "1-URGENT")]
        )
        expect = o.where(F.col("o_orderpriority") != "1-URGENT")
        assert nd == n0 - expect.count() and nd > 0
        got = read_iceberg(spark, t)
        assert got.count() == expect.count()
        assert sorted(r["o_orderkey"] for r in got.collect()) == sorted(
            r["o_orderkey"] for r in expect.collect()
        )
        assert len(position_delete_files(t)) == 1
        # time travel to the pre-delete snapshot still sees every row
        assert read_iceberg(spark, t, snapshot_id=snap0).count() == n0

    def test_redelete_is_idempotent_and_deletes_stack(self, spark, tmp_path):
        from preprocessor_spark.sources.iceberg import delete_iceberg

        t, o, _ = self._table(spark, tmp_path)
        sid1, nd1 = delete_iceberg(
            spark, t, [("o_orderpriority", "=", "1-URGENT")]
        )
        sid2, nd2 = delete_iceberg(
            spark, t, [("o_orderpriority", "=", "1-URGENT")]
        )
        assert nd2 == 0 and sid2 == sid1  # no empty snapshot committed
        _sid3, nd3 = delete_iceberg(
            spark, t, [("o_totalprice", ">", 400000.0)]
        )
        from preprocessor_spark.sources.iceberg import read_iceberg

        assert nd3 > 0
        expect = o.where(
            (F.col("o_orderpriority") != "1-URGENT")
            & (F.col("o_totalprice") <= 400000.0)
        )
        got = read_iceberg(spark, t)
        assert got.count() == expect.count()
        a = got.agg(F.sum("o_orderkey")).collect()[0][0]
        b = expect.agg(F.sum("o_orderkey")).collect()[0][0]
        assert a == b

    def test_delete_manifest_is_content_one(self, spark, tmp_path):
        """Spec shape: the delete snapshot's manifest list carries the
        data manifests (content=0) forward plus one content=1 manifest;
        the data-file walk must not count delete files."""
        from preprocessor_spark.sources.iceberg import (
            _load_metadata,
            _read_manifest_list,
            _resolve_snapshot,
            delete_iceberg,
        )

        t, _o, _ = self._table(spark, tmp_path)
        delete_iceberg(spark, t, [("o_orderpriority", "=", "2-HIGH")])
        meta, _ = _load_metadata(t)
        snap = _resolve_snapshot(meta, None)
        contents = sorted(
            m.get("content", 0)
            for m in _read_manifest_list(snap["manifest-list"])
        )
        assert contents == [0, 1]
        from preprocessor_spark.sources.iceberg import plan_iceberg_scan

        kept, total, _schema, _ = plan_iceberg_scan(t)
        assert total == 4 and len(kept) == 4  # data files only

    def test_append_after_delete_untouched(self, spark, tmp_path):
        """Rows appended AFTER a delete must all survive (position
        deletes name explicit paths — new files cannot be hit)."""
        from preprocessor_spark.sources.iceberg import delete_iceberg

        from preprocessor_spark.sources.iceberg import (
            read_iceberg,
            write_iceberg,
        )

        t, o, _ = self._table(spark, tmp_path)
        delete_iceberg(spark, t, [("o_orderpriority", "=", "1-URGENT")])
        extra = o.limit(50).withColumn(
            "o_orderpriority", F.lit("1-URGENT")
        )
        write_iceberg(extra, t, mode="append")
        urgent_now = (
            read_iceberg(spark, t)
            .where(F.col("o_orderpriority") == "1-URGENT")
            .count()
        )
        assert urgent_now == 50  # the appended urgents, none of the old
