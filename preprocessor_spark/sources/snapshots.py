"""Versioned snapshot tables: append/overwrite commits, time travel,
incremental diff — a minimal lakehouse transaction log over plain parquet.

The public pattern (Delta Lake / Iceberg, re-derived minimally): a table is
a directory of immutable parquet data files plus a ``_manifests/`` log; a
manifest is ONE small JSON naming the complete file set visible at that
version. Readers plan directly from the manifest's file list — no
directory listing of the data tree, which at 100 TB (millions of files)
is the thing that kills naive parquet layouts. Writers follow the classic
commit protocol: data files first, manifest last, created with
O_CREAT|O_EXCL so two concurrent writers racing to the same version get a
clean conflict instead of a corrupted log.

What this gives a pipeline at scale:

- **time travel** — ``read(version=n)`` replans an old file set; nothing
  is ever rewritten in place, so reproducing last week's training set is
  a metadata operation;
- **incremental diff** — ``diff(a, b)`` reads ONLY the files added
  between two versions (append-only CDC-lite: consumers fold in new
  shards without rescanning the table);
- **atomic overwrite** — a full rewrite becomes visible in one manifest
  swap; readers of version n are never torn;
- **rollback** — a new version that re-points at an old file set
  (metadata-only undo).

Single-table, single-writer-per-version; cross-table transactions and
compaction policies are out of scope (the compaction SINK in
``sources.compact_parquet_dir`` composes: compact into a new version).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any

from pyspark.sql import DataFrame, SparkSession


class SnapshotConflict(RuntimeError):
    """Another writer committed this version first (O_EXCL lost the race)."""


class SnapshotTable:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path.rstrip("/")
        self._mdir = os.path.join(self.path, "_manifests")
        os.makedirs(self._mdir, exist_ok=True)

    # -- log access -------------------------------------------------------

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self._mdir, f"v{version:06d}.json")

    def versions(self) -> list[dict[str, Any]]:
        """All committed manifests, ascending."""
        out = []
        for name in sorted(os.listdir(self._mdir)):
            if name.startswith("v") and name.endswith(".json"):
                with open(os.path.join(self._mdir, name)) as f:
                    out.append(json.load(f))
        return out

    def latest_version(self) -> int:
        """0 if the table has no commits yet."""
        vs = [
            int(n[1:7])
            for n in os.listdir(self._mdir)
            if n.startswith("v") and n.endswith(".json")
        ]
        return max(vs) if vs else 0

    def _manifest(self, version: int) -> dict[str, Any]:
        p = self._manifest_path(version)
        if not os.path.exists(p):
            raise ValueError(f"snapshot version {version} does not exist")
        with open(p) as f:
            return json.load(f)

    # -- commit protocol --------------------------------------------------

    def write(self, df: DataFrame, mode: str = "append") -> int:
        """Commit a new version; returns its number.

        ``append`` unions the new files into the parent's visible set (and
        requires a matching schema); ``overwrite`` replaces the visible set.
        Data files are written (by executors, ordinary distributed parquet
        write) BEFORE the manifest exists, so a crash mid-write leaves an
        invisible orphan directory, never a torn table.
        """
        if mode not in ("append", "overwrite"):
            raise ValueError(f"unknown snapshot write mode: {mode}")
        parent_v = self.latest_version()
        version = parent_v + 1
        schema_json = df.schema.json()
        parent_files: list[str] = []
        if parent_v and mode == "append":
            parent = self._manifest(parent_v)
            if parent["schema"] != schema_json:
                raise ValueError(
                    "snapshot append: schema does not match the table schema "
                    "(use mode='overwrite' to change it)"
                )
            parent_files = parent["files"]

        data_dir = os.path.join(self.path, "data", f"v{version:06d}")
        df.write.mode("errorifexists").parquet(data_dir)
        new_files = sorted(
            os.path.join(data_dir, n)
            for n in os.listdir(data_dir)
            if n.endswith(".parquet")
        )
        self._commit(
            version,
            {
                "version": version,
                "parent": parent_v,
                "op": mode,
                "files": parent_files + new_files,
                "added_files": new_files,
                "schema": schema_json,
                "committed_at": time.time(),
            },
        )
        return version

    def rollback(self, to_version: int) -> int:
        """Commit a NEW version whose visible file set is an old one —
        metadata-only undo; nothing is deleted, history stays intact."""
        target = self._manifest(to_version)
        version = self.latest_version() + 1
        self._commit(
            version,
            {
                "version": version,
                "parent": self.latest_version(),
                "op": f"rollback:{to_version}",
                "files": target["files"],
                "added_files": [],
                "schema": target["schema"],
                "committed_at": time.time(),
            },
        )
        return version

    def _commit(self, version: int, manifest: dict[str, Any]) -> None:
        try:
            fd = os.open(
                self._manifest_path(version), os.O_CREAT | os.O_EXCL | os.O_WRONLY
            )
        except FileExistsError as exc:
            raise SnapshotConflict(
                f"version {version} was committed concurrently"
            ) from exc
        with os.fdopen(fd, "w") as f:
            json.dump(manifest, f)

    # -- reads ------------------------------------------------------------

    def read(self, version: int | None = None) -> DataFrame:
        """The table as of ``version`` (default: latest). Plans directly
        from the manifest's file list; an empty table reads as an empty
        frame with the recorded schema."""
        v = version if version is not None else self.latest_version()
        if v == 0:
            raise ValueError("snapshot table has no commits")
        man = self._manifest(v)
        return self._read_files(man["files"], man["schema"])

    def diff(self, from_version: int, to_version: int) -> DataFrame:
        """Rows in files ADDED by commits in (from_version, to_version] —
        the incremental-consumption path. Append-only semantics: an
        overwrite or rollback inside the range raises (its delta is not a
        pure file addition)."""
        if to_version <= from_version:
            raise ValueError("diff requires to_version > from_version")
        self._manifest(from_version) if from_version else None
        added: list[str] = []
        schema = None
        for v in range(from_version + 1, to_version + 1):
            man = self._manifest(v)
            if man["op"] != "append":
                raise ValueError(
                    f"diff crosses a non-append commit (v{v}: {man['op']}); "
                    "read both versions and EXCEPT them instead"
                )
            added.extend(man["added_files"])
            schema = man["schema"]
        return self._read_files(added, schema)

    def _read_files(self, files: list[str], schema_json: str) -> DataFrame:
        from pyspark.sql.types import StructType

        schema = StructType.fromJson(json.loads(schema_json))
        if not files:
            return self.spark.createDataFrame([], schema)
        return self.spark.read.schema(schema).parquet(*files)
