"""Caller-managed lifetime for operator-internal persisted DataFrames.

Several operators (MinHash LSH, n-gram Jaccard, embedding near-dup) persist
an intermediate frame that multiple downstream joins re-reference, so an
expensive kernel (signature / shingle UDF) runs once instead of 3×. The
persist is load-bearing for performance, but its lifetime can't end inside
the operator — the returned DataFrame is lazy and the persisted frame must
survive until the CALLER materializes the result.

``persist_scope()`` solves the lifetime half: operators register their
persisted frames via ``register_persisted``; a caller wraps build +
materialize in the scope and every registered frame is unpersisted on exit.

    with persist_scope():
        pairs = minhash_lsh_pairs(docs, "text", "doc_id")
        result = pairs.collect()          # materialize INSIDE the scope
    # executor storage for the signature frame is released here

Without an active scope the behavior is unchanged (frames stay persisted
until session end / LRU eviction) — fine for short-lived driver sessions,
necessary for callers that materialize the result lazily later. On a
long-lived 100 TB cluster session running many dedup calls, the scope is
the difference between bounded and monotonically-growing executor storage.

Scopes nest: a frame registered while two scopes are active is released by
the innermost one. Thread-local, so concurrent jobs from different threads
don't release each other's caches.
"""

from __future__ import annotations

import threading
from contextlib import contextmanager
from typing import Iterator

from pyspark.sql import DataFrame

_local = threading.local()


def register_persisted(df: DataFrame) -> DataFrame:
    """Record ``df`` (already ``.persist()``-ed) in the innermost active
    ``persist_scope``, if any. Returns ``df`` for chaining."""
    stack = getattr(_local, "stack", None)
    if stack:
        stack[-1].append(df)
    return df


@contextmanager
def persist_scope() -> Iterator[list[DataFrame]]:
    """Unpersist every operator-internal cached frame created in the body.

    Yields the (mutable) list of registered frames, mostly for tests."""
    stack = getattr(_local, "stack", None)
    if stack is None:
        stack = _local.stack = []
    frames: list[DataFrame] = []
    stack.append(frames)
    try:
        yield frames
    finally:
        stack.pop()
        for f in frames:
            try:
                f.unpersist()
            except Exception:  # session already stopped — nothing to free
                pass
