"""Pure-Python Delta Lake transaction-log layer — write and read Delta
table layouts with file-level statistics pruning, no delta-spark jars.

Public spec: https://github.com/delta-io/delta/blob/master/PROTOCOL.md.
The reference system has no table formats at all (SURVEY.md §2.1); with
:mod:`preprocessor_spark.sources.iceberg` this closes the second half of
the lake-format story: the two formats a 100 TB lake user actually meets
are Iceberg (Avro manifests) and Delta (a JSON action log), and BOTH are
metadata problems, not data problems — the data path stays Spark's
ordinary distributed parquet reader/writer.

What is implemented (and why this subset):

* ``write_delta`` — commit a DataFrame as a Delta table version: parquet
  data files written by Spark's distributed writer, per-file ``add``
  actions carrying the spec's ``stats`` JSON (numRecords / minValues /
  maxValues / nullCount, harvested from the parquet FOOTERS on executors
  — a metadata-only job), ``protocol`` + ``metaData`` actions on the
  first commit, ``remove`` actions on overwrite, zero-padded
  ``_delta_log/<v>.json`` commit files, and a spec-shaped
  ``<v>.checkpoint.parquet`` + ``_last_checkpoint`` every
  ``checkpoint_interval`` commits so readers replay O(interval) JSONs,
  not O(history).
* ``read_delta`` — replay the log (checkpoint + tail) to the requested
  version (time travel), PRUNE data files whose [minValues, maxValues]
  cannot satisfy the caller's predicate BEFORE any footer opens, and
  return ``spark.read.parquet(<surviving files>)`` with the residual
  predicate applied — Catalyst adds ordinary row-group pushdown on top.
* ``plan_delta_scan`` — the planning step exposed for tests and plan
  assertions: (kept_files, total_files, spark_schema).
* ``delta_history`` — the commitInfo trail for auditing/time travel.

Scale shape: the log walk is DRIVER-side but O(#files) small JSON
records (an ``add`` is a few hundred bytes); stats harvesting at write
time is a ``parallelize(files).map(footer)`` job returning only per-file
stat rows. Nothing ever collects data rows. Partition pruning via
``partitionValues`` is intentionally out of scope — the synthetic layout
is unpartitioned and stats-based data skipping subsumes it for
range-sorted files (the same trade the Iceberg layer documents).
"""

from __future__ import annotations

import datetime as _dt
import json
import os
import time
import uuid as _uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_LOG_DIR = "_delta_log"
_PROTOCOL = {"minReaderVersion": 1, "minWriterVersion": 2}


class ConcurrentDeltaCommit(RuntimeError):
    """Another writer committed the same version first (the optimistic-
    concurrency loser); re-read table state and retry."""


# ------------------------------------------------------------------- helpers


def _log_path(table_path: str, version: int) -> str:
    return os.path.join(table_path, _LOG_DIR, f"{version:020d}.json")


def _ckpt_path(table_path: str, version: int) -> str:
    return os.path.join(
        table_path, _LOG_DIR, f"{version:020d}.checkpoint.parquet"
    )


def _stat_json_value(v):
    """Serialize a footer min/max into Delta's stats JSON: numerics and
    bools as-is, datetimes/dates as ISO strings (the spec stores stats as
    JSON, so temporal values are strings), bytes dropped (unbounded)."""
    if isinstance(v, (_dt.datetime, _dt.date)):
        return v.isoformat()
    if isinstance(v, (int, float, bool, str)):
        return v
    return None


def _footer_stats(file_path: str) -> dict:
    """Per-file Delta stats from the parquet FOOTER only (executors)."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(file_path).metadata
    names = [md.schema.column(i).path for i in range(md.num_columns)]
    mins, maxs, nulls = {}, {}, {}
    for ci, name in enumerate(names):
        lo = hi = None
        nc = 0
        ok = True
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(ci)
            st = col.statistics
            if st is None or not st.has_min_max:
                ok = False
                continue
            nc += st.null_count or 0
            mn, mx = st.min, st.max
            lo = mn if lo is None or mn < lo else lo
            hi = mx if hi is None or mx > hi else hi
        nulls[name] = nc
        if ok and lo is not None:
            jlo, jhi = _stat_json_value(lo), _stat_json_value(hi)
            if jlo is not None and jhi is not None:
                mins[name] = jlo
                maxs[name] = jhi
    return {
        "path": file_path,
        "size": os.path.getsize(file_path),
        "stats": json.dumps(
            {
                "numRecords": md.num_rows,
                "minValues": mins,
                "maxValues": maxs,
                "nullCount": nulls,
            }
        ),
    }


def _latest_version(table_path: str) -> int:
    log = os.path.join(table_path, _LOG_DIR)
    if not os.path.isdir(log):
        return -1
    vs = [
        int(f[:20])
        for f in os.listdir(log)
        if f.endswith(".json") and f[:20].isdigit()
    ]
    return max(vs) if vs else -1


# -------------------------------------------------------------------- write


def write_delta(
    df: DataFrame,
    table_path: str,
    mode: str = "append",
    checkpoint_interval: int = 10,
    operation: str | None = None,
) -> int:
    """Commit ``df`` as the next Delta table version; returns the version.

    ``mode='append'`` adds files; ``mode='overwrite'`` additionally emits
    ``remove`` actions for every previously-live file. The first commit
    writes ``protocol`` + ``metaData``. Data files are written by Spark's
    ordinary distributed parquet writer into the table root (staged +
    moved, the Delta layout); their stats come from a footer-only
    executor job.
    """
    if mode not in ("append", "overwrite"):
        raise ValueError(f"write_delta: unsupported mode {mode!r}")
    spark = df.sparkSession
    prev_version = _latest_version(table_path)
    version = prev_version + 1
    if version == 0:
        os.makedirs(os.path.join(table_path, _LOG_DIR), exist_ok=True)

    staging = os.path.join(table_path, f"_staging-{_uuid.uuid4().hex}")
    df.write.mode("overwrite").parquet(staging)
    moved = []
    for f in sorted(os.listdir(staging)):
        if f.endswith(".parquet"):
            dest = os.path.join(table_path, f)
            os.rename(os.path.join(staging, f), dest)
            moved.append(dest)
    for leftover in os.listdir(staging):
        os.remove(os.path.join(staging, leftover))
    os.rmdir(staging)

    sc = spark.sparkContext
    stats = (
        sc.parallelize(moved, max(1, min(len(moved), 32)))
        .map(_footer_stats)
        .collect()
    )
    now_ms = int(time.time() * 1000)
    actions: list[dict] = []
    num_records = 0
    if version == 0:
        actions.append({"protocol": dict(_PROTOCOL)})
        actions.append(
            {
                "metaData": {
                    "id": str(_uuid.uuid4()),
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": df.schema.json(),
                    "partitionColumns": [],
                    "configuration": {},
                    "createdTime": now_ms,
                }
            }
        )
    removed = 0
    if mode == "overwrite" and version > 0:
        state = _load_state(table_path, prev_version)
        for rel in sorted(state["adds"]):
            actions.append(
                {
                    "remove": {
                        "path": rel,
                        "deletionTimestamp": now_ms,
                        "dataChange": True,
                    }
                }
            )
            removed += 1
    for s in sorted(stats, key=lambda r: r["path"]):
        num_records += json.loads(s["stats"])["numRecords"]
        actions.append(
            {
                "add": {
                    "path": os.path.basename(s["path"]),
                    "partitionValues": {},
                    "size": s["size"],
                    "modificationTime": now_ms,
                    "dataChange": True,
                    "stats": s["stats"],
                }
            }
        )
    actions.append(
        {
            "commitInfo": {
                "timestamp": now_ms,
                "operation": operation
                or ("WRITE" if version == 0 else mode.upper()),
                "operationMetrics": {
                    "numFiles": str(len(moved)),
                    "numOutputRows": str(num_records),
                    "numRemovedFiles": str(removed),
                },
            }
        }
    )
    # the Delta commit protocol is PUT-if-absent on the version file: two
    # writers racing to the same version must not clobber each other —
    # the loser surfaces a conflict instead (os.rename would overwrite)
    final = _log_path(table_path, version)
    tmp = final + f".tmp-{_uuid.uuid4().hex}"
    with open(tmp, "w") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")
    try:
        os.link(tmp, final)  # atomic fail-if-exists publish
    except FileExistsError:
        os.remove(tmp)
        for rel in moved:
            try:
                os.remove(rel)  # orphaned data files of the losing commit
            except OSError:
                pass
        raise ConcurrentDeltaCommit(
            f"version {version} of {table_path} was committed concurrently;"
            " re-read the table state and retry the write"
        ) from None
    os.remove(tmp)

    if checkpoint_interval > 0 and version > 0 and (
        version % checkpoint_interval == 0
    ):
        _write_checkpoint(spark, table_path, version)
    return version


def _write_checkpoint(
    spark: SparkSession, table_path: str, version: int
) -> None:
    """Spec-shaped checkpoint: one parquet with nullable protocol /
    metaData / add action structs (one action per row), plus the
    ``_last_checkpoint`` pointer file."""
    state = _load_state(table_path, version, use_checkpoint=False)
    add_t = T.StructType(
        [
            T.StructField("path", T.StringType()),
            T.StructField("size", T.LongType()),
            T.StructField("modificationTime", T.LongType()),
            T.StructField("dataChange", T.BooleanType()),
            T.StructField("stats", T.StringType()),
        ]
    )
    schema = T.StructType(
        [
            T.StructField("protocol", T.StructType(
                [
                    T.StructField("minReaderVersion", T.IntegerType()),
                    T.StructField("minWriterVersion", T.IntegerType()),
                ]
            )),
            T.StructField("metaData", T.StructType(
                [
                    T.StructField("id", T.StringType()),
                    T.StructField("schemaString", T.StringType()),
                    T.StructField("createdTime", T.LongType()),
                ]
            )),
            T.StructField("add", add_t),
        ]
    )
    rows = [
        (
            (
                state["protocol"]["minReaderVersion"],
                state["protocol"]["minWriterVersion"],
            ),
            None,
            None,
        ),
        (
            None,
            (
                state["metaData"]["id"],
                state["metaData"]["schemaString"],
                state["metaData"].get("createdTime"),
            ),
            None,
        ),
    ] + [
        (
            None,
            None,
            (
                rel,
                a.get("size"),
                a.get("modificationTime"),
                True,
                a.get("stats"),
            ),
        )
        for rel, a in sorted(state["adds"].items())
    ]
    staging = os.path.join(table_path, _LOG_DIR, f"_ckpt-{_uuid.uuid4().hex}")
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(staging)
    part = next(
        f for f in os.listdir(staging) if f.endswith(".parquet")
    )
    os.replace(
        os.path.join(staging, part), _ckpt_path(table_path, version)
    )
    for leftover in os.listdir(staging):
        os.remove(os.path.join(staging, leftover))
    os.rmdir(staging)
    ptr = {"version": version, "size": len(rows)}
    tmp = os.path.join(
        table_path, _LOG_DIR, f"_last_checkpoint.tmp-{_uuid.uuid4().hex}"
    )
    with open(tmp, "w") as fh:
        json.dump(ptr, fh)
    os.rename(tmp, os.path.join(table_path, _LOG_DIR, "_last_checkpoint"))


# --------------------------------------------------------------------- read


def _read_checkpoint_state(table_path: str, version: int) -> dict:
    import pyarrow.parquet as pq

    tbl = pq.read_table(_ckpt_path(table_path, version)).to_pylist()
    state = {"adds": {}, "metaData": None, "protocol": None}
    for row in tbl:
        if row.get("protocol") and row["protocol"].get("minReaderVersion"):
            state["protocol"] = row["protocol"]
        elif row.get("metaData") and row["metaData"].get("schemaString"):
            state["metaData"] = row["metaData"]
        elif row.get("add") and row["add"].get("path"):
            a = row["add"]
            state["adds"][a["path"]] = a
    return state


def _load_state(
    table_path: str,
    version: int | None = None,
    use_checkpoint: bool = True,
) -> dict:
    """Replay the action log to ``version`` (default: latest). Starts from
    the newest checkpoint at or below the target when one exists."""
    latest = _latest_version(table_path)
    if latest < 0:
        raise FileNotFoundError(f"no Delta log at {table_path}")
    target = latest if version is None else int(version)
    if target > latest or target < 0:
        raise ValueError(
            f"version {target} out of range [0, {latest}] at {table_path}"
        )
    state = {"adds": {}, "metaData": None, "protocol": None}
    start = 0
    if use_checkpoint:
        ptr_path = os.path.join(table_path, _LOG_DIR, "_last_checkpoint")
        if os.path.exists(ptr_path):
            ckpt_v = json.load(open(ptr_path))["version"]
            if ckpt_v <= target and os.path.exists(
                _ckpt_path(table_path, ckpt_v)
            ):
                state = _read_checkpoint_state(table_path, ckpt_v)
                start = ckpt_v + 1
    for v in range(start, target + 1):
        path = _log_path(table_path, v)
        with open(path) as fh:
            for line in fh:
                if not line.strip():
                    continue
                action = json.loads(line)
                if "add" in action:
                    state["adds"][action["add"]["path"]] = action["add"]
                elif "remove" in action:
                    state["adds"].pop(action["remove"]["path"], None)
                elif "metaData" in action:
                    state["metaData"] = action["metaData"]
                elif "protocol" in action:
                    state["protocol"] = action["protocol"]
    if state["metaData"] is None:
        raise ValueError(f"Delta log at {table_path} has no metaData action")
    return state


def _spark_schema(state: dict) -> T.StructType:
    return T.StructType.fromJson(json.loads(state["metaData"]["schemaString"]))


def _typed_stat(v, dtype: T.DataType):
    """Decode a stats-JSON value back to the comparison domain of its
    Spark type (temporal stats are ISO strings in the JSON)."""
    if v is None:
        return None
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        return _dt.datetime.fromisoformat(v)
    if isinstance(dtype, T.DateType):
        return _dt.date.fromisoformat(v)
    return v


def _norm_lit(lit):
    return lit


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


_OPS = {">=", ">", "<=", "<", "=", "=="}


def plan_delta_scan(
    table_path: str,
    version: int | None = None,
    where: list[tuple] | None = None,
) -> tuple[list[str], int, T.StructType]:
    """Metadata-only scan planning: (kept_files, total_files, schema).
    ``where`` is a conjunction of (column, op, literal) triples with op
    in {>=, >, <=, <, =, ==}; files are kept unless their stats bounds
    PROVE no row can match."""
    state = _load_state(table_path, version)
    schema = _spark_schema(state)
    by_name = {f.name: f.dataType for f in schema.fields}
    for col, op, _ in where or []:
        if col not in by_name:
            raise KeyError(f"predicate column {col!r} not in table schema")
        if op not in _OPS:
            raise ValueError(f"unsupported predicate op {op!r}")
    kept, total = [], 0
    for rel, add in sorted(state["adds"].items()):
        total += 1
        stats = json.loads(add["stats"]) if add.get("stats") else {}
        mins = stats.get("minValues", {})
        maxs = stats.get("maxValues", {})
        keep = True
        for col, op, lit in where or []:
            lo = _typed_stat(mins.get(col), by_name[col])
            hi = _typed_stat(maxs.get(col), by_name[col])
            if not _file_may_match(lo, hi, op, _norm_lit(lit)):
                keep = False
                break
        if keep:
            kept.append(os.path.join(table_path, rel))
    return kept, total, schema


def read_delta(
    spark: SparkSession,
    table_path: str,
    version: int | None = None,
    where: list[tuple] | None = None,
) -> DataFrame:
    """Delta table scan: stats-pruned file list + residual predicate.
    With ``version`` this is time travel to any committed version."""
    kept, _total, schema = plan_delta_scan(table_path, version, where)
    if not kept:
        return spark.createDataFrame([], schema)
    df = spark.read.schema(schema).parquet(*kept)
    for col, op, lit in where or []:
        c = F.col(col)
        df = df.filter(
            {"<": c < lit, "<=": c <= lit, ">": c > lit, ">=": c >= lit}.get(
                op, c == lit
            )
        )
    return df


def delta_history(table_path: str) -> list[dict]:
    """The commitInfo trail, oldest first: one dict per version."""
    latest = _latest_version(table_path)
    out = []
    for v in range(latest + 1):
        info = {"version": v}
        with open(_log_path(table_path, v)) as fh:
            for line in fh:
                if not line.strip():
                    continue
                action = json.loads(line)
                if "commitInfo" in action:
                    info.update(action["commitInfo"])
        out.append(info)
    return out
