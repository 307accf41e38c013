"""Pure-Python Apache Iceberg v2 metadata layer — write and read Iceberg
table layouts with file-level statistics pruning, no JVM extension jars.

Public spec: https://iceberg.apache.org/spec/ (format version 2). The
reference system has no table formats at all (SURVEY.md §2.1) — this is a
north-star component: the one lake feature a 100 TB user actually leans on
is METADATA-DRIVEN SCAN PLANNING, i.e. skipping data files whose column
bounds cannot satisfy the predicate, before any parquet footer is opened.

What is implemented (and why this subset):

* ``write_iceberg`` — commit a DataFrame as an Iceberg v2 table: parquet
  data files (written by Spark, so the data path is the ordinary
  distributed writer), one manifest Avro file per commit with per-file
  record counts, value/null counts and lower/upper bounds (harvested from
  the parquet FOOTERS on executors — a metadata-only job, no data reads),
  a manifest-list Avro file per snapshot, ``vN.metadata.json`` and
  ``version-hint.text``. Append mode adds a snapshot that carries the
  previous snapshot's manifests forward (the spec's "existing" manifest
  reuse), so history stays queryable.
* ``read_iceberg`` — resolve the current (or any historical) snapshot from
  the metadata chain, walk manifest-list → manifests → data-file entries
  (all via the in-repo pure-Python Avro reader,
  :mod:`preprocessor_spark.sources.avro_py`), PRUNE files whose
  [lower, upper] bounds cannot satisfy the caller's predicate, and return
  ``spark.read.parquet(<surviving files>)`` with the residual predicate
  applied — Catalyst then adds ordinary row-group pushdown on top.
* ``plan_iceberg_scan`` — the same planning step exposed for tests and
  plan assertions: (kept_files, total_files, spark_schema).
* ``iceberg_snapshots`` — snapshot log for time travel.

Bounds use the spec's single-value binary serialization (Appendix D):
little-endian int32/int64/float/double, UTF-8 strings, date as int32 days
from epoch, timestamp as int64 micros. The Avro metadata schemas carry the
spec's ``field-id`` attributes; Iceberg's int-keyed maps are written the
way the spec stores them physically — arrays of (key, value) records.

Scale shape: the metadata walk is DRIVER-side but O(#files) tiny records
(an Iceberg manifest is ~a few hundred bytes per file); stats harvesting
at write time is a ``parallelize(files).map(footer)`` job returning only
per-file stat rows. Nothing ever collects data rows. At a real 100 TB
table (~1e5-1e6 files) manifests would be read in an executor job — the
reader below keeps one manifest in memory at a time, the same bound the
Java library honors.
"""

from __future__ import annotations

import json
import os
import struct
import time
import uuid as _uuid

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from preprocessor_spark.sources.avro_py import (
    _container_header,
    _iter_file_rows,
    _zigzag,
    read_avro_schema,
)

# ---------------------------------------------------------------- avro write


def _enc_long(out: bytearray, v: int) -> None:
    out += _zigzag(int(v))


def _enc_str(out: bytearray, s: str) -> None:
    b = s.encode("utf-8")
    out += _zigzag(len(b))
    out += b


def _enc_bytes(out: bytearray, b: bytes) -> None:
    out += _zigzag(len(b))
    out += bytes(b)


def _enc_opt(out: bytearray, v, enc) -> None:
    """[null, X] union: branch index then the value."""
    if v is None:
        out += _zigzag(0)
    else:
        out += _zigzag(1)
        enc(out, v)


def _enc_kv_array(out: bytearray, items: dict | None, venc) -> None:
    """Iceberg int-keyed map, physically an Avro array of k/v records."""
    if items is None:
        out += _zigzag(0)
        return
    out += _zigzag(1)
    if items:
        out += _zigzag(len(items))
        for k in sorted(items):
            _enc_long(out, k)
            venc(out, items[k])
    out += _zigzag(0)


def _avro_write(path: str, schema_json: str, encoded_records: list[bytes]) -> int:
    """One-block null-codec Avro container; returns bytes written."""
    sync = os.urandom(16)
    body = b"".join(encoded_records)
    blob = (
        _container_header(schema_json, "null", sync)
        + _zigzag(len(encoded_records))
        + _zigzag(len(body))
        + body
        + sync
    )
    with open(path, "wb") as f:
        f.write(blob)
    return len(blob)


# ------------------------------------------------- single-value serialization

_ICEBERG_TYPES = {
    "boolean": T.BooleanType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "string": T.StringType(),
    "date": T.DateType(),
    "timestamptz": T.TimestampType(),
    "timestamp": T.TimestampNTZType(),
    "binary": T.BinaryType(),
}
_SPARK_TO_ICEBERG = {
    T.BooleanType(): "boolean",
    T.IntegerType(): "int",
    T.ShortType(): "int",
    T.ByteType(): "int",
    T.LongType(): "long",
    T.FloatType(): "float",
    T.DoubleType(): "double",
    T.StringType(): "string",
    T.DateType(): "date",
    T.TimestampType(): "timestamptz",
    T.TimestampNTZType(): "timestamp",
    T.BinaryType(): "binary",
}

_EPOCH = __import__("datetime").date(1970, 1, 1)
_EPOCH_TS = __import__("datetime").datetime(1970, 1, 1)


def _sv_encode(v, ice_type: str) -> bytes | None:
    """Iceberg single-value serialization (spec Appendix D)."""
    if v is None:
        return None
    if ice_type == "boolean":
        return b"\x01" if v else b"\x00"
    if ice_type == "int":
        return struct.pack("<i", int(v))
    if ice_type == "long":
        return struct.pack("<q", int(v))
    if ice_type == "float":
        return struct.pack("<f", float(v))
    if ice_type == "double":
        return struct.pack("<d", float(v))
    if ice_type == "string":
        return str(v).encode("utf-8")
    if ice_type == "date":
        return struct.pack("<i", (v - _EPOCH).days)
    if ice_type in ("timestamptz", "timestamp"):
        delta = v.replace(tzinfo=None) - _EPOCH_TS
        return struct.pack("<q", delta // __import__("datetime").timedelta(microseconds=1))
    if ice_type == "binary":
        return bytes(v)
    return None  # no bounds for unsupported types — pruning just skips them


def _sv_decode(b: bytes, ice_type: str):
    if b is None:
        return None
    if ice_type == "boolean":
        return b == b"\x01"
    if ice_type == "int":
        return struct.unpack("<i", b)[0]
    if ice_type == "long":
        return struct.unpack("<q", b)[0]
    if ice_type == "float":
        return struct.unpack("<f", b)[0]
    if ice_type == "double":
        return struct.unpack("<d", b)[0]
    if ice_type == "string":
        return b.decode("utf-8")
    if ice_type == "date":
        return _EPOCH + __import__("datetime").timedelta(days=struct.unpack("<i", b)[0])
    if ice_type in ("timestamptz", "timestamp"):
        return _EPOCH_TS + __import__("datetime").timedelta(
            microseconds=struct.unpack("<q", b)[0]
        )
    if ice_type == "binary":
        return b
    return None


# ---------------------------------------------------------- metadata schemas

_MANIFEST_LIST_SCHEMA = json.dumps(
    {
        "type": "record",
        "name": "manifest_file",
        "fields": [
            {"name": "manifest_path", "type": "string", "field-id": 500},
            {"name": "manifest_length", "type": "long", "field-id": 501},
            {"name": "partition_spec_id", "type": "int", "field-id": 502},
            {"name": "content", "type": "int", "field-id": 517},
            {"name": "sequence_number", "type": "long", "field-id": 515},
            {"name": "min_sequence_number", "type": "long", "field-id": 516},
            {"name": "added_snapshot_id", "type": "long", "field-id": 503},
            {"name": "added_files_count", "type": "int", "field-id": 504},
            {"name": "existing_files_count", "type": "int", "field-id": 505},
            {"name": "deleted_files_count", "type": "int", "field-id": 506},
            {"name": "added_rows_count", "type": "long", "field-id": 512},
            {"name": "existing_rows_count", "type": "long", "field-id": 513},
            {"name": "deleted_rows_count", "type": "long", "field-id": 514},
        ],
    }
)


def _kv_schema(name: str, vtype: str, kid: int, vid: int) -> dict:
    return [
        "null",
        {
            "type": "array",
            "logicalType": "map",
            "items": {
                "type": "record",
                "name": name,
                "fields": [
                    {"name": "key", "type": "int", "field-id": kid},
                    {"name": "value", "type": vtype, "field-id": vid},
                ],
            },
        },
    ]


_MANIFEST_SCHEMA = json.dumps(
    {
        "type": "record",
        "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "int", "field-id": 0},
            {"name": "snapshot_id", "type": ["null", "long"], "field-id": 1},
            {"name": "sequence_number", "type": ["null", "long"], "field-id": 3},
            {"name": "file_sequence_number", "type": ["null", "long"], "field-id": 4},
            {
                "name": "data_file",
                "field-id": 2,
                "type": {
                    "type": "record",
                    "name": "r2",
                    "fields": [
                        {"name": "content", "type": "int", "field-id": 134},
                        {"name": "file_path", "type": "string", "field-id": 100},
                        {"name": "file_format", "type": "string", "field-id": 101},
                        {
                            "name": "partition",
                            "field-id": 102,
                            "type": {"type": "record", "name": "r102", "fields": []},
                        },
                        {"name": "record_count", "type": "long", "field-id": 103},
                        {"name": "file_size_in_bytes", "type": "long", "field-id": 104},
                        {
                            "name": "value_counts",
                            "type": _kv_schema("k119_v120", "long", 119, 120),
                            "field-id": 109,
                        },
                        {
                            "name": "null_value_counts",
                            "type": _kv_schema("k121_v122", "long", 121, 122),
                            "field-id": 110,
                        },
                        {
                            "name": "lower_bounds",
                            "type": _kv_schema("k126_v127", "bytes", 126, 127),
                            "field-id": 125,
                        },
                        {
                            "name": "upper_bounds",
                            "type": _kv_schema("k129_v130", "bytes", 129, 130),
                            "field-id": 128,
                        },
                    ],
                },
            },
        ],
    }
)


def _enc_manifest_entry(
    status: int,
    snapshot_id: int,
    seq: int | None,
    file_info: dict,
    content: int = 0,
) -> bytes:
    out = bytearray()
    _enc_long(out, status)
    _enc_opt(out, snapshot_id, _enc_long)
    _enc_opt(out, seq, _enc_long)  # null inherits the manifest's sequence
    _enc_opt(out, seq, _enc_long)
    _enc_long(out, content)  # 0 = data, 1 = position deletes (spec v2)
    _enc_str(out, file_info["file_path"])
    _enc_str(out, "PARQUET")
    # partition record r102: zero fields, zero bytes
    _enc_long(out, file_info["record_count"])
    _enc_long(out, file_info["file_size_in_bytes"])
    _enc_kv_array(out, file_info.get("value_counts"), _enc_long)
    _enc_kv_array(out, file_info.get("null_value_counts"), _enc_long)
    _enc_kv_array(out, file_info.get("lower_bounds"), _enc_bytes)
    _enc_kv_array(out, file_info.get("upper_bounds"), _enc_bytes)
    return bytes(out)


def _enc_manifest_file(m: dict) -> bytes:
    out = bytearray()
    _enc_str(out, m["manifest_path"])
    _enc_long(out, m["manifest_length"])
    _enc_long(out, 0)  # partition_spec_id
    _enc_long(out, m.get("content", 0))  # 0 = data, 1 = delete manifest
    _enc_long(out, m["sequence_number"])
    _enc_long(out, m["min_sequence_number"])
    _enc_long(out, m["added_snapshot_id"])
    _enc_long(out, m["added_files_count"])
    _enc_long(out, m["existing_files_count"])
    _enc_long(out, m["deleted_files_count"])
    _enc_long(out, m["added_rows_count"])
    _enc_long(out, m["existing_rows_count"])
    _enc_long(out, m["deleted_rows_count"])
    return bytes(out)


# -------------------------------------------------------------------- writer


def _footer_stats(file_path: str, field_ids: dict, ice_types: dict) -> dict:
    """Per-file stats from the parquet FOOTER only (runs on executors)."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(file_path).metadata
    names = [md.schema.column(i).path for i in range(md.num_columns)]
    lower, upper, vcounts, ncounts = {}, {}, {}, {}
    for ci, name in enumerate(names):
        fid = field_ids.get(name)
        if fid is None:
            continue
        ice = ice_types[name]
        lo = hi = None
        nulls = 0
        vals = 0
        ok = True
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(ci)
            vals += col.num_values
            st = col.statistics
            if st is None or not st.has_min_max:
                ok = False
                continue
            nulls += st.null_count or 0
            mn, mx = st.min, st.max
            lo = mn if lo is None or mn < lo else lo
            hi = mx if hi is None or mx > hi else hi
        vcounts[fid] = vals
        ncounts[fid] = nulls
        if ok and lo is not None:
            lb, ub = _sv_encode(lo, ice), _sv_encode(hi, ice)
            if lb is not None and ub is not None:
                lower[fid] = lb
                upper[fid] = ub
    return {
        "file_path": file_path,
        "record_count": md.num_rows,
        "file_size_in_bytes": os.path.getsize(file_path),
        "value_counts": vcounts,
        "null_value_counts": ncounts,
        "lower_bounds": lower,
        "upper_bounds": upper,
    }


def _load_metadata(table_path: str) -> tuple[dict, int] | tuple[None, int]:
    hint = os.path.join(table_path, "metadata", "version-hint.text")
    if not os.path.exists(hint):
        return None, 0
    v = int(open(hint).read().strip())
    meta = json.load(open(os.path.join(table_path, "metadata", f"v{v}.metadata.json")))
    return meta, v


def write_iceberg(
    df: DataFrame,
    table_path: str,
    mode: str = "overwrite",
    publish_location: str | None = None,
) -> int:
    """Commit ``df`` as an Iceberg v2 snapshot at ``table_path``; returns
    the new snapshot id. ``mode="append"`` adds a snapshot on top of the
    existing table (previous manifests carried forward as "existing"),
    keeping history addressable for time travel.

    ``publish_location``: record THIS path in every manifest / metadata
    entry instead of ``table_path`` — for the stage-then-atomic-rename
    publish pattern (build under a temp dir, ``os.rename`` to the final
    location; Avro strings are length-prefixed, so paths cannot be
    rewritten in place afterwards)."""
    if mode not in ("overwrite", "append"):
        raise ValueError("mode must be 'overwrite' or 'append'")
    loc = publish_location or table_path

    def _pub(p: str) -> str:
        return loc + p[len(table_path):] if p.startswith(table_path) else p
    spark = df.sparkSession
    meta, ver = _load_metadata(table_path)
    if mode == "overwrite" or meta is None:
        meta, ver = None, 0

    meta_dir = os.path.join(table_path, "metadata")
    os.makedirs(meta_dir, exist_ok=True)
    commit = _uuid.uuid4().hex[:12]
    data_dir = os.path.join(table_path, "data", commit)
    df.write.mode("error").parquet(data_dir)

    schema = df.schema
    field_ids = {f.name: i + 1 for i, f in enumerate(schema.fields)}
    ice_types = {
        f.name: _SPARK_TO_ICEBERG.get(f.dataType, "binary") for f in schema.fields
    }
    files = sorted(
        os.path.join(data_dir, p)
        for p in os.listdir(data_dir)
        if p.endswith(".parquet")
    )
    # footer-only stats job: executors read footers, driver gets stat rows
    sc = spark.sparkContext
    stats = (
        sc.parallelize(files, max(1, len(files)))
        .map(lambda p: _footer_stats(p, field_ids, ice_types))
        .collect()
    )
    stats.sort(key=lambda s: s["file_path"])
    for s in stats:
        s["file_path"] = _pub(s["file_path"])

    snapshot_id = int.from_bytes(os.urandom(7), "big")
    seq = (meta["last-sequence-number"] + 1) if meta else 1

    entries = [_enc_manifest_entry(1, snapshot_id, seq, s) for s in stats]
    man_name = f"manifest-{commit}.avro"
    man_path = os.path.join(meta_dir, man_name)
    man_len = _avro_write(man_path, _MANIFEST_SCHEMA, entries)

    new_manifest = {
        "manifest_path": _pub(man_path),
        "manifest_length": man_len,
        "sequence_number": seq,
        "min_sequence_number": seq,
        "added_snapshot_id": snapshot_id,
        "added_files_count": len(stats),
        "existing_files_count": 0,
        "deleted_files_count": 0,
        "added_rows_count": sum(s["record_count"] for s in stats),
        "existing_rows_count": 0,
        "deleted_rows_count": 0,
    }
    manifests = [new_manifest]
    if meta is not None:  # append: carry the current snapshot's manifests
        cur = next(
            s for s in meta["snapshots"]
            if s["snapshot-id"] == meta["current-snapshot-id"]
        )
        for m in _read_manifest_list(cur["manifest-list"]):
            manifests.append(m)

    ml_name = f"snap-{snapshot_id}-{commit}.avro"
    ml_path = os.path.join(meta_dir, ml_name)
    _avro_write(
        ml_path, _MANIFEST_LIST_SCHEMA, [_enc_manifest_file(m) for m in manifests]
    )

    now_ms = int(time.time() * 1000)
    snapshot = {
        "snapshot-id": snapshot_id,
        "sequence-number": seq,
        "timestamp-ms": now_ms,
        "manifest-list": _pub(ml_path),
        "summary": {
            "operation": "append",
            "added-data-files": str(len(stats)),
            "added-records": str(new_manifest["added_rows_count"]),
        },
        "schema-id": 0,
    }
    ice_fields = [
        {
            "id": field_ids[f.name],
            "name": f.name,
            "required": False,
            "type": ice_types[f.name],
        }
        for f in schema.fields
    ]
    new_meta = {
        "format-version": 2,
        "table-uuid": (meta or {}).get("table-uuid", str(_uuid.uuid4())),
        "location": loc,
        "last-sequence-number": seq,
        "last-updated-ms": now_ms,
        "last-column-id": len(ice_fields),
        "current-schema-id": 0,
        "schemas": [{"schema-id": 0, "type": "struct", "fields": ice_fields}],
        "default-spec-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "last-partition-id": 999,
        "default-sort-order-id": 0,
        "sort-orders": [{"order-id": 0, "fields": []}],
        "current-snapshot-id": snapshot_id,
        "snapshots": ((meta or {}).get("snapshots") or []) + [snapshot],
        "snapshot-log": ((meta or {}).get("snapshot-log") or [])
        + [{"snapshot-id": snapshot_id, "timestamp-ms": now_ms}],
        "metadata-log": [],
    }
    new_ver = ver + 1
    with open(os.path.join(meta_dir, f"v{new_ver}.metadata.json"), "w") as f:
        json.dump(new_meta, f, indent=1)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as f:
        f.write(str(new_ver))
    return snapshot_id


# -------------------------------------------------------------------- reader


def _tuples_to_dicts(v, typ):
    if isinstance(typ, T.StructType):
        return {
            f.name: _tuples_to_dicts(x, f.dataType) for f, x in zip(typ.fields, v)
        }
    if isinstance(typ, T.ArrayType) and v is not None:
        return [_tuples_to_dicts(x, typ.elementType) for x in v]
    return v


def _avro_records(path: str) -> list[dict]:
    _, styp = read_avro_schema(path)
    return [_tuples_to_dicts(t, styp) for t in _iter_file_rows(path)]


def _kv_to_dict(arr) -> dict:
    return {e["key"]: e["value"] for e in (arr or [])}


def _read_manifest_list(path: str) -> list[dict]:
    return _avro_records(path)


def iceberg_snapshots(table_path: str) -> list[dict]:
    meta, _ = _load_metadata(table_path)
    if meta is None:
        raise FileNotFoundError(f"no Iceberg metadata at {table_path}")
    return meta["snapshots"]


def _resolve_snapshot(meta: dict, snapshot_id: int | None) -> dict:
    sid = snapshot_id if snapshot_id is not None else meta["current-snapshot-id"]
    for s in meta["snapshots"]:
        if s["snapshot-id"] == sid:
            return s
    raise KeyError(f"snapshot {sid} not in table history")


_OPS = (">=", "<=", ">", "<", "==", "=")


def _file_may_match(lo, hi, op: str, lit) -> bool:
    """Conservative bounds check: False ONLY when no row can satisfy."""
    if lo is None or hi is None:
        return True
    if op == ">=":
        return hi >= lit
    if op == ">":
        return hi > lit
    if op == "<=":
        return lo <= lit
    if op == "<":
        return lo < lit
    return lo <= lit <= hi  # = / ==


def _spark_schema(meta: dict) -> T.StructType:
    sch = next(s for s in meta["schemas"] if s["schema-id"] == meta["current-schema-id"])
    return T.StructType(
        [
            T.StructField(f["name"], _ICEBERG_TYPES.get(f["type"], T.BinaryType()), True)
            for f in sch["fields"]
        ]
    )


def plan_iceberg_scan(
    table_path: str,
    snapshot_id: int | None = None,
    where: list[tuple] | None = None,
) -> tuple[list[str], int, T.StructType, dict]:
    """Metadata-only scan planning: returns (kept_files, total_files,
    spark_schema, field_map). ``where`` is a conjunction of
    (column, op, literal) triples with op in {>=, >, <=, <, =, ==}."""
    meta, _ = _load_metadata(table_path)
    if meta is None:
        raise FileNotFoundError(f"no Iceberg metadata at {table_path}")
    snap = _resolve_snapshot(meta, snapshot_id)
    sch = next(s for s in meta["schemas"] if s["schema-id"] == meta["current-schema-id"])
    by_name = {f["name"]: f for f in sch["fields"]}
    for cond in where or []:
        col, op, _ = cond
        if col not in by_name:
            raise KeyError(f"predicate column {col!r} not in table schema")
        if op not in _OPS:
            raise ValueError(f"unsupported predicate op {op!r}")
    kept, total = [], 0
    for m in _read_manifest_list(snap["manifest-list"]):
        if m.get("content", 0) != 0:
            continue  # delete manifests are not data
        for entry in _avro_records(m["manifest_path"]):
            if entry["status"] == 2:  # deleted
                continue
            dfile = entry["data_file"]
            if dfile.get("content", 0) != 0:
                continue
            total += 1
            lower = _kv_to_dict(dfile.get("lower_bounds"))
            upper = _kv_to_dict(dfile.get("upper_bounds"))
            keep = True
            for col, op, lit in where or []:
                f = by_name[col]
                lo = _sv_decode(lower.get(f["id"]), f["type"])
                hi = _sv_decode(upper.get(f["id"]), f["type"])
                if not _file_may_match(lo, hi, op, lit):
                    keep = False
                    break
            if keep:
                kept.append(dfile["file_path"])
    return kept, total, _spark_schema(meta), by_name


def position_delete_files(
    table_path: str, snapshot_id: int | None = None
) -> list[str]:
    """Paths of the snapshot's position-delete parquet files (v2 spec
    content=1 manifests / data-file entries)."""
    meta, _ = _load_metadata(table_path)
    if meta is None:
        raise FileNotFoundError(f"no Iceberg metadata at {table_path}")
    snap = _resolve_snapshot(meta, snapshot_id)
    out = []
    for m in _read_manifest_list(snap["manifest-list"]):
        if m.get("content", 0) != 1:
            continue
        for entry in _avro_records(m["manifest_path"]):
            if entry["status"] == 2:
                continue
            dfile = entry["data_file"]
            if dfile.get("content", 0) == 1:
                out.append(dfile["file_path"])
    return out


# strip the file URI scheme Spark's _metadata.file_path carries so row
# positions join against the plain absolute paths manifests record
_STRIP_SCHEME = r"^file:/*"


def _plain_path(c: Column) -> Column:
    return F.regexp_replace(c, _STRIP_SCHEME, "/")


def read_iceberg(
    spark: SparkSession,
    table_path: str,
    snapshot_id: int | None = None,
    where: list[tuple] | None = None,
) -> DataFrame:
    """Iceberg table scan: stats-pruned file list + residual predicate.
    With ``snapshot_id`` this is time travel to any committed snapshot.

    MERGE-ON-READ: when the snapshot carries position-delete files
    (:func:`delete_iceberg`), each data row's (file, row-ordinal) — from
    Spark's ``_metadata.file_path`` / ``_metadata.row_index`` hidden
    columns — is ANTI-JOINED against the delete set before the residual
    predicate. Position deletes name explicit (path, pos) pairs, so
    applying the full delete set to every data file is exact regardless
    of sequence numbers (a newer file's path cannot collide — data dirs
    are per-commit UUIDs)."""
    kept, _total, schema, _ = plan_iceberg_scan(table_path, snapshot_id, where)
    if not kept:
        return spark.createDataFrame([], schema)
    dels = position_delete_files(table_path, snapshot_id)
    if dels:
        base = spark.read.schema(schema).parquet(*kept).select(
            "*",
            _plain_path(F.col("_metadata.file_path")).alias("__fp"),
            F.col("_metadata.row_index").alias("__pos"),
        )
        dd = spark.read.parquet(*dels).select(
            F.col("file_path").alias("__fp"), F.col("pos").alias("__pos")
        )
        df = base.join(
            F.broadcast(dd), ["__fp", "__pos"], "left_anti"
        ).drop("__fp", "__pos")
    else:
        df = spark.read.schema(schema).parquet(*kept)
    for col, op, lit in where or []:
        c = F.col(col)
        df = df.filter(
            {"<": c < lit, "<=": c <= lit, ">": c > lit, ">=": c >= lit}.get(
                op, c == lit
            )
        )
    return df


def delete_iceberg(
    spark: SparkSession,
    table_path: str,
    where: list[tuple],
) -> tuple[int, int]:
    """DELETE FROM the Iceberg table by predicate, v2 merge-on-read
    style: no data file is rewritten — the matching rows' (file path,
    row ordinal) pairs are written as a POSITION-DELETE parquet (spec
    §position-delete-files: columns ``file_path``, ``pos``, sorted) and
    committed as a new snapshot whose manifest list carries the previous
    data manifests forward plus one content=1 delete manifest. Readers
    (:func:`read_iceberg`) apply the deletes with an anti-join.

    ``where`` is the same (column, op, literal) conjunction the scan
    planner takes — file pruning bounds the scan to files that can
    contain matches. Returns (new_snapshot_id, n_deleted); if no row
    matches, no snapshot is committed and the current id is returned.

    Scale shape: one distributed scan of the PRUNED file set projecting
    only (path, pos); the delete parquet is data-sized in the number of
    DELETED rows only.
    """
    meta, ver = _load_metadata(table_path)
    if meta is None:
        raise FileNotFoundError(f"no Iceberg metadata at {table_path}")
    kept, _total, schema, _ = plan_iceberg_scan(table_path, None, where)
    cur_snap = _resolve_snapshot(meta, None)
    if not kept:
        return cur_snap["snapshot-id"], 0
    base = spark.read.schema(schema).parquet(*kept).select(
        _plain_path(F.col("_metadata.file_path")).alias("file_path"),
        F.col("_metadata.row_index").alias("pos"),
        *[F.col(c) for c in {cond[0] for cond in where}],
    )
    pred = None
    for col, op, lit in where:
        c = F.col(col)
        e = {"<": c < lit, "<=": c <= lit, ">": c > lit, ">=": c >= lit}.get(
            op, c == lit
        )
        pred = e if pred is None else (pred & e)
    # the existing deletes must not be deleted twice (idempotent re-runs):
    # anti-join against the current delete set first
    positions = base.filter(pred).select("file_path", "pos")
    old = position_delete_files(table_path)
    if old:
        prev = spark.read.parquet(*old).select("file_path", "pos")
        positions = positions.join(
            F.broadcast(prev), ["file_path", "pos"], "left_anti"
        )
    n_deleted = positions.count()
    if n_deleted == 0:
        return cur_snap["snapshot-id"], 0

    meta_dir = os.path.join(table_path, "metadata")
    commit = _uuid.uuid4().hex[:12]
    del_dir = os.path.join(table_path, "data", f"{commit}-deletes")
    (
        positions.coalesce(1)
        .sortWithinPartitions("file_path", "pos")
        .write.mode("error")
        .parquet(del_dir)
    )
    del_files = sorted(
        os.path.join(del_dir, p)
        for p in os.listdir(del_dir)
        if p.endswith(".parquet")
    )
    snapshot_id = int.from_bytes(os.urandom(7), "big")
    seq = meta["last-sequence-number"] + 1
    entries = []
    for p in del_files:
        entries.append(
            _enc_manifest_entry(
                1,
                snapshot_id,
                seq,
                {
                    "file_path": p,
                    "record_count": n_deleted,
                    "file_size_in_bytes": os.path.getsize(p),
                },
                content=1,
            )
        )
    man_path = os.path.join(meta_dir, f"manifest-{commit}-deletes.avro")
    man_len = _avro_write(man_path, _MANIFEST_SCHEMA, entries)
    del_manifest = {
        "manifest_path": man_path,
        "manifest_length": man_len,
        "content": 1,
        "sequence_number": seq,
        "min_sequence_number": seq,
        "added_snapshot_id": snapshot_id,
        "added_files_count": len(del_files),
        "existing_files_count": 0,
        "deleted_files_count": 0,
        "added_rows_count": n_deleted,
        "existing_rows_count": 0,
        "deleted_rows_count": 0,
    }
    manifests = [del_manifest] + list(
        _read_manifest_list(cur_snap["manifest-list"])
    )
    ml_path = os.path.join(meta_dir, f"snap-{snapshot_id}-{commit}.avro")
    _avro_write(
        ml_path,
        _MANIFEST_LIST_SCHEMA,
        [_enc_manifest_file(m) for m in manifests],
    )
    now_ms = int(time.time() * 1000)
    snapshot = {
        "snapshot-id": snapshot_id,
        "sequence-number": seq,
        "timestamp-ms": now_ms,
        "manifest-list": ml_path,
        "summary": {
            "operation": "delete",
            "added-delete-files": str(len(del_files)),
            "added-position-deletes": str(n_deleted),
        },
        "schema-id": 0,
    }
    new_meta = dict(meta)
    new_meta["last-sequence-number"] = seq
    new_meta["last-updated-ms"] = now_ms
    new_meta["current-snapshot-id"] = snapshot_id
    new_meta["snapshots"] = list(meta["snapshots"]) + [snapshot]
    new_meta["snapshot-log"] = list(meta.get("snapshot-log") or []) + [
        {"snapshot-id": snapshot_id, "timestamp-ms": now_ms}
    ]
    new_ver = ver + 1
    with open(os.path.join(meta_dir, f"v{new_ver}.metadata.json"), "w") as f:
        json.dump(new_meta, f, indent=1)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as f:
        f.write(str(new_ver))
    return snapshot_id, n_deleted
