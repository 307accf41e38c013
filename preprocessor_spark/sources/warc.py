"""WARC (Web ARChive) ingestion as a Spark 4 Python Data Source.

Web-scale pretraining corpora start life as WARC shards (the CommonCrawl
distribution format — ISO 28500); Spark has no built-in reader for them.
Spark 4's Python Data Source API (`pyspark.sql.datasource`) lets a pure-
Python parser plug into the normal reader pipeline: registration gives
``spark.read.format("warc").load(path)`` with one input partition per
shard file, so a 90k-shard crawl fans out across the cluster exactly like
a parquet scan (each WARC shard is independently parseable; per-record
gzip members keep .warc.gz shards streamable without whole-file
decompression).

Parser scope (the stable core of ISO 28500):
- WARC/1.0 and 1.1 record framing: header block (CRLF lines) +
  ``Content-Length`` octets of payload + CRLF CRLF separator;
- plain ``.warc`` and multi-member ``.warc.gz`` (one gzip member per
  record — the CommonCrawl layout) via stdlib zlib;
- for ``response`` records the HTTP header block is split off the payload
  (body = octets after the first CRLF CRLF), exposed as ``http_headers``.

Rows: (path, record_id, warc_type, target_uri, content_type, http_headers,
payload). Downstream: ``payload`` → text extraction / language id;
``target_uri`` → operators/urls.py canonicalization + domain caps.

Driver-side work is just the file listing (os.scandir on the glob) — the
same bounded listing any file source performs; record parsing runs inside
executors' Python workers, Arrow-batched back to the JVM.
"""

from __future__ import annotations

import glob as _glob
import os
import zlib
from typing import Iterator

try:  # Spark 4 Python Data Source API
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
        SimpleDataSourceStreamReader,
    )

    _HAS_DSAPI = True
except ImportError:  # pragma: no cover - pyspark < 4
    _HAS_DSAPI = False

    class SimpleDataSourceStreamReader:  # type: ignore[no-redef]
        pass

    class DataSource:  # type: ignore[no-redef]
        def __init__(self, options):
            self.options = options

    class DataSourceReader:  # type: ignore[no-redef]
        pass

    class InputPartition:  # type: ignore[no-redef]
        def __init__(self, value):
            self.value = value


WARC_SCHEMA = (
    "path string, record_id string, warc_type string, target_uri string, "
    "content_type string, http_headers string, payload binary"
)


def _split_headers(block: bytes) -> dict:
    headers = {}
    for line in block.split(b"\r\n")[1:]:  # first line is WARC/1.x
        if b":" in line:
            k, v = line.split(b":", 1)
            headers[k.strip().lower().decode("ascii", "replace")] = v.strip().decode(
                "utf-8", "replace"
            )
    return headers


def parse_warc_stream(chunks) -> Iterator[tuple]:
    """Yield (record_id, warc_type, target_uri, content_type, http_headers,
    payload) tuples from an ITERATOR of decompressed byte chunks, holding
    at most one record (plus one input chunk) in memory — a multi-GB
    CommonCrawl shard streams through a bounded buffer instead of being
    materialized. Strict on framing: a malformed Content-Length, missing
    version line, or truncated tail raises (corrupt shards should fail
    loudly, not truncate silently)."""
    it = iter(chunks)
    buf = b""
    exhausted = False
    offset = 0  # consumed bytes, for error messages

    def pull() -> bool:
        nonlocal buf, exhausted
        if exhausted:
            return False
        try:
            buf += next(it)
            return True
        except StopIteration:
            exhausted = True
            return False

    while True:
        # skip inter-record CRLFs
        while True:
            while len(buf) < 2 and pull():
                pass
            if buf[:2] == b"\r\n":
                buf = buf[2:]
                offset += 2
            else:
                break
        while len(buf) < 5 and pull():
            pass
        if not buf:
            return
        if not buf.startswith(b"WARC/"):
            raise ValueError(f"expected WARC version line at offset {offset}")
        while (hdr_end := buf.find(b"\r\n\r\n")) < 0:
            if not pull():
                raise ValueError("truncated WARC record header")
        headers = _split_headers(buf[:hdr_end])
        length = int(headers["content-length"])
        body_start = hdr_end + 4
        while len(buf) < body_start + length:
            if not pull():
                raise ValueError("truncated WARC record payload")
        payload = buf[body_start : body_start + length]
        buf = buf[body_start + length :]
        offset += body_start + length
        wtype = headers.get("warc-type", "")
        http_headers = ""
        if wtype == "response" and payload.startswith(b"HTTP/"):
            sep = payload.find(b"\r\n\r\n")
            if sep >= 0:
                http_headers = payload[:sep].decode("utf-8", "replace")
                payload = payload[sep + 4 :]
        yield (
            headers.get("warc-record-id", ""),
            wtype,
            headers.get("warc-target-uri", ""),
            headers.get("content-type", ""),
            http_headers,
            payload,
        )


def parse_warc_records(raw: bytes) -> Iterator[tuple]:
    """One-buffer convenience wrapper over :func:`parse_warc_stream`."""
    yield from parse_warc_stream((raw,))


_CHUNK = 1 << 20  # 1 MiB compressed-read granularity


def _shard_chunks(path: str) -> Iterator[bytes]:
    """Stream decompressed chunks from a shard file without ever holding
    the whole (de)compressed shard: plain ``.warc`` reads fixed blocks;
    ``.warc.gz`` inflates one gzip member at a time (the CommonCrawl
    record-per-member layout), rolling over to the next member on EOF.
    The file handle lives in a context manager and closes when the
    generator is exhausted or dropped."""
    with open(path, "rb") as f:
        if not path.endswith(".gz"):
            while block := f.read(_CHUNK):
                yield block
            return
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        while True:
            comp = f.read(_CHUNK)
            if not comp:
                tail = d.flush()
                if tail:
                    yield tail
                return
            while comp:
                out = d.decompress(comp)
                if out:
                    yield out
                if d.eof:  # member boundary: restart on the leftover bytes
                    comp = d.unused_data
                    d = zlib.decompressobj(16 + zlib.MAX_WBITS)
                else:
                    comp = b""


def iter_warc_records(path: str) -> Iterator[tuple]:
    """Stream-parse one shard file: bounded memory end to end."""
    yield from parse_warc_stream(_shard_chunks(path))


class _WarcPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class WarcReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("warc source requires a path")
        self._type_filter: str | None = None

    def partitions(self):
        p = self.path
        if os.path.isdir(p):
            files = sorted(
                e.path
                for e in os.scandir(p)
                if e.is_file() and (".warc" in e.name)
            )
        else:
            files = sorted(_glob.glob(p))
        if not files:
            raise FileNotFoundError(f"no WARC shards under {p}")
        return [_WarcPartition(f) for f in files]

    def read(self, partition):
        for rec in iter_warc_records(partition.path):
            if self._type_filter is not None and rec[1] != self._type_filter:
                continue
            yield (partition.path, *rec)


class WarcReaderPushdown(WarcReader):
    """Pushdown-capable variant, selected via ``.option("pushdown",
    "true")``. A separate class because merely IMPLEMENTING pushFilters
    makes the Python worker require
    ``spark.sql.python.filterPushdown.enabled`` (it asserts otherwise) —
    the plain reader must stay usable in sessions that haven't opted in.
    ``register_warc_source`` enables the conf, so the option is safe on
    any session created through it."""

    def pushFilters(self, filters):
        """Filter pushdown (Spark asks the source to evaluate what it can):
        an ``EqualTo(warc_type, v)`` prunes records during the parse — the
        dominant real case, since pipelines read only ``response`` records
        and a crawl is ~half request/metadata records that now never cross
        into the JVM. Everything else is yielded back as unsupported and
        Spark re-applies it above the scan."""
        from pyspark.sql.datasource import EqualTo

        for f in filters:
            if (
                isinstance(f, EqualTo)
                and tuple(f.attribute) == ("warc_type",)
                and isinstance(f.value, str)
                and self._type_filter is None
            ):
                self._type_filter = f.value
            else:
                yield f


class WarcStreamReader(SimpleDataSourceStreamReader):
    """Tail a crawl directory as a Structured Stream: each micro-batch
    ingests the shard files that appeared since the last offset.

    The offset is the sorted list of already-ingested file names — exact
    and replayable (``readBetweenOffsets`` re-parses exactly the files in
    ``end - start``, giving failure recovery the same rows), at the cost
    of an offset that grows with file count; a production deployment
    whose shard names are monotonic (the CommonCrawl convention) can
    switch to a high-watermark name. New files are assumed closed (the
    writer-renames-into-place convention all file streams rely on).
    """

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("warc source requires a path")

    def _list(self):
        p = self.path
        if os.path.isdir(p):
            return sorted(
                e.path for e in os.scandir(p) if e.is_file() and ".warc" in e.name
            )
        return sorted(_glob.glob(p))

    def initialOffset(self):
        return {"files": []}

    def read(self, start):
        seen = set(start["files"])
        new = [f for f in self._list() if f not in seen]
        end = {"files": sorted(seen | set(new))}
        # the simple stream API pickles the prefetched rows to the JVM, so
        # this must be a materialized list — one micro-batch of new shards
        # is the memory bound (the simple-reader contract; use the full
        # partition-planning streamReader when batches outgrow one worker)
        return list(self._rows(new)), end

    def readBetweenOffsets(self, start, end):
        delta = sorted(set(end["files"]) - set(start["files"]))
        return list(self._rows(delta))

    def _rows(self, files):
        for path in files:
            for rec in iter_warc_records(path):
                yield (path, *rec)


class WarcDataSource(DataSource):
    """``spark.dataSource.register(WarcDataSource)`` then
    ``spark.read.format("warc").load(path_or_glob)`` (batch) or
    ``spark.readStream.format("warc").load(dir)`` (tail the directory)."""

    @classmethod
    def name(cls):
        return "warc"

    def schema(self):
        return WARC_SCHEMA

    def reader(self, schema):
        if str(self.options.get("pushdown", "")).lower() == "true":
            return WarcReaderPushdown(self.options)
        return WarcReader(self.options)

    def simpleStreamReader(self, schema):
        return WarcStreamReader(self.options)


def register_warc_source(spark) -> None:
    """Idempotent registration of the WARC reader on a session; also
    enables Python-source filter pushdown so ``.option("pushdown",
    "true")`` reads can prune records at parse time."""
    if not _HAS_DSAPI:
        raise ImportError(
            "the Python Data Source API (pyspark.sql.datasource) requires "
            "Spark >= 4.0"
        )
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(WarcDataSource)
