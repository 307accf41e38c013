"""Structured Streaming surface over the events table.

The reference has no streaming at all (SURVEY §2.10); this module provides
the canonical streaming shapes the engine supports, built so that the same
transformation functions apply to batch and streaming frames (the Spark
unified-API design):

- tumbling / sliding windowed aggregation (`F.window`)
- session windows (`F.session_window`)
- watermark-bounded state (`withWatermark`) for late data
- stateful streaming dedup (`dropDuplicatesWithinWatermark`)

``run_available_now`` drains a file-backed stream with the availableNow
trigger into an in-memory sink — the batch-equivalence test pattern: the
streamed result must equal the batch query over the same files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string"


def read_events_stream(spark: SparkSession, path: str, schema: str = EVENTS_SCHEMA) -> DataFrame:
    """File-source stream over a directory of parquet event files."""
    return spark.readStream.schema(schema).parquet(path)


def tumbling_counts(events: DataFrame, window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value")
    )


def sliding_counts(
    events: DataFrame, window: str = "1 hour", slide: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )


def session_counts(events: DataFrame, gap: str = "10 minutes", watermark: str = "2 hours") -> DataFrame:
    """Per-user session windows: a session closes after ``gap`` of silence."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("s"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def dedup_within_watermark(events: DataFrame, keys: list[str], watermark: str = "1 hour") -> DataFrame:
    """Stateful streaming dedup: drops re-deliveries of the same key within
    the watermark horizon with bounded state."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)


def stateful_running_totals(events: DataFrame, key: str = "user_id") -> DataFrame:
    """Custom stateful streaming operator via ``applyInPandasWithState``:
    per-key running (count, sum(value)) maintained across micro-batches in
    Arrow-batched pandas. The canonical shape for operators Spark's built-in
    streaming aggregations can't express (arbitrary per-group state machines);
    state is per-key and partitioned, so it scales with the key cardinality,
    not the stream length.
    """
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    key_type = events.schema[key].dataType.simpleString()
    out_schema = f"{key} {key_type}, n_events bigint, sum_value double"
    state_schema = "n bigint, s double"

    def _update(key_tuple, pdfs, state: GroupState):
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].fillna(0.0).sum())
        state.update((n, s))
        yield pd.DataFrame({key: [key_tuple[0]], "n_events": [n], "sum_value": [s]})

    return events.groupBy(key).applyInPandasWithState(
        _update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    left_ts: str = "ts",
    right_ts: str = "r_ts",
    max_delay: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join on a key within a time interval: a right
    event matches a left event at most ``max_delay`` AFTER it (the
    view→purchase attribution shape). Both sides carry watermarks and the
    join condition bounds event-time distance, so Spark can expire buffered
    state — without the interval bound a stream-stream join's state grows
    forever. State per side ≈ watermark-horizon's worth of rows, sharded by
    the equi-key (scales with key cardinality, not stream length)."""
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (lw[key] == rw[key])
        & (F.col(right_ts) >= F.col(left_ts))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {max_delay}"))
    )
    return lw.join(rw, cond, "inner").drop(rw[key])


def enrich_with_static(stream_df: DataFrame, static_df: DataFrame, on: list[str], how: str = "left") -> DataFrame:
    """Stream-static join: every micro-batch joins against the (batch) dim
    table — the standard streaming enrichment shape. The static side is
    broadcast, so no stream-side shuffle and no streaming state at all
    (unlike stream-stream joins, which buffer rows within the watermark)."""
    return stream_df.join(F.broadcast(static_df), on, how)


def run_foreach_batch(stream_df: DataFrame, batch_fn, timeout: int = 120):
    """foreachBatch sink with the availableNow trigger: arbitrary batch
    logic per micro-batch (idempotent upserts keyed by batch_id, multi-sink
    fan-out, JDBC writes) — the escape hatch for sinks Structured Streaming
    doesn't provide natively. ``batch_fn(batch_df, batch_id)``."""
    q = stream_df.writeStream.foreachBatch(batch_fn).trigger(availableNow=True).start()
    q.awaitTermination(timeout)
    return q


def run_available_now(
    stream_df: DataFrame,
    table_name: str,
    output_mode: str = "append",
    timeout: int = 120,
    rows_hint: int | None = None,
):
    """Drain everything currently available into an in-memory table and stop.
    Returns after the trigger completes; read results with
    ``spark.table(table_name)``.

    ``rows_hint`` (approximate input rows) sizes the streaming query's
    state/shuffle partitioning via
    :func:`preprocessor_spark.caching.fixpoint_shuffle_scope` — a stateful
    streaming query pins ``spark.sql.shuffle.partitions`` at its FIRST
    batch as the state-store partition count, and every micro-batch then
    loads+commits one store per partition per stateful operator (×4 for a
    stream-stream join). At the session default that is a fleet of
    near-empty state stores whose per-batch setup/commit dominates a small
    drain; the scope clamps the count to the data
    (clamp(rows/100k, 8, session default)), and at 100 TB the hint exceeds
    the session default so the clamp is a no-op — the same scale-adaptive
    policy the iterative fixpoints use. Per-key state contents and emitted
    rows are partitioning-independent, so results are unchanged. The scope
    stays open until the drain terminates (the conf is read per batch)."""
    from contextlib import nullcontext

    from preprocessor_spark.caching import fixpoint_shuffle_scope

    scope = (
        fixpoint_shuffle_scope(stream_df.sparkSession, rows_hint)
        if rows_hint is not None
        else nullcontext()
    )
    with scope:
        q = (
            stream_df.writeStream.format("memory")
            .queryName(table_name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout)
    return q


def screen_stream_against_corpus(
    stream_docs: DataFrame,
    corpus: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Streaming incremental dedup: drop arriving documents whose content
    hash already exists in the (static, deduplicated) corpus — the
    continuous-crawl form of
    :func:`preprocessor_spark.operators.dedup.incremental_dedup_stats`.

    Stream-static LEFT ANTI join on the content hash: the corpus side
    reduces to a DISTINCT hash index, broadcast per micro-batch, so the
    stream never shuffles and carries zero streaming state (in production
    the index is a pre-built table that each trigger re-reads — new corpus
    appends are picked up between batches). Exact-equivalence to the batch
    screen is asserted in tests."""
    index = corpus.select(F.md5(F.col(text_col)).alias("__h")).distinct()
    return stream_docs.withColumn("__h", F.md5(F.col(text_col))).join(
        F.broadcast(index), "__h", "left_anti"
    ).drop("__h")


def holt_stream(
    events: DataFrame,
    key: str = "user_id",
    order_col: str = "ts",
    value_col: str = "value",
    alpha: float = 0.5,
    beta: float = 0.3,
    horizon: int = 3,
) -> DataFrame:
    """Streaming twin of :func:`preprocessor_spark.operators.holt.
    holt_forecast` — the per-key Holt level+trend recursion maintained
    across micro-batches in ``applyInPandasWithState``.

    State per key is O(1): (n, level, trend, sse) — the recursion is
    associative over batch boundaries as long as rows arrive per-key in
    event order ACROSS batches (the usual append-log contract; within a
    batch rows are sorted by ``order_col`` before updating). After a full
    in-order drain the emitted (level, trend, rmse, forecast) equal the
    batch operator exactly — pytest-asserted batch-twin equivalence, the
    same contract as the window twins above. Keys still inside their first
    observation (n < 2) emit nothing yet.
    """
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    key_type = events.schema[key].dataType.simpleString()
    out_schema = (
        f"{key} {key_type}, n bigint, level double, trend double, "
        "rmse double, forecast array<double>"
    )
    state_schema = "n bigint, lvl double, tr double, sse double, first double"
    a, b_, h = float(alpha), float(beta), int(horizon)

    def _update(key_tuple, pdfs, state: GroupState):
        n, lvl, tr, sse, first = (
            state.get if state.exists else (0, 0.0, 0.0, 0.0, 0.0)
        )
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows[
            rows[value_col].notna() & rows[order_col].notna()
        ].sort_values(order_col)
        for v in rows[value_col].astype(float):
            if n == 0:
                first, lvl, n = v, v, 1
                continue
            if n == 1:
                tr = v - first
                # replay the batch init: l_1 = y_1, b_1 = y_2 - y_1, and
                # y_2's one-step error is y_2 - (y_1 + b_1) = 0 by
                # construction -- so run the same update as any step
            err = v - (lvl + tr)
            sse += err * err
            new_lvl = a * v + (1.0 - a) * (lvl + tr)
            tr = b_ * (new_lvl - lvl) + (1.0 - b_) * tr
            lvl = new_lvl
            n += 1
        state.update((n, lvl, tr, sse, first))
        if n >= 2:
            yield pd.DataFrame(
                {
                    key: [key_tuple[0]],
                    "n": [n],
                    "level": [round(lvl, 6)],
                    "trend": [round(tr, 6)],
                    "rmse": [round(float((sse / (n - 1)) ** 0.5), 6)],
                    "forecast": [[round(lvl + (i + 1) * tr, 6) for i in range(h)]],
                }
            )

    return events.groupBy(key).applyInPandasWithState(
        _update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def cusum_stream(
    events: DataFrame,
    key: str = "user_id",
    order_col: str = "ts",
    value_col: str = "value",
    target_mean: float = 0.0,
    slack: float = 0.5,
    threshold: float = 5.0,
) -> DataFrame:
    """Streaming twin of :func:`preprocessor_spark.operators.changepoint.
    cusum_online` — Page's one-sided CUSUM pair maintained across
    micro-batches in ``applyInPandasWithState``.

    State per key is O(1): (n, S+, S-, n_alarms, first_alarm_pos). The
    max(0, .) recursion is associative over batch boundaries as long as
    rows arrive per-key in event order ACROSS batches (the append-log
    contract; within a batch rows sort by ``order_col``). After a full
    in-order drain the emitted row equals the batch operator exactly —
    pytest-asserted, the same contract as ``holt_stream``.
    """
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    key_type = events.schema[key].dataType.simpleString()
    out_schema = (
        f"key {key_type}, n bigint, n_alarms bigint, "
        "first_alarm_pos bigint, s_pos double, s_neg double"
    )
    state_schema = "n bigint, sp double, sn double, alarms bigint, first bigint"
    mu, k, h = float(target_mean), float(slack), float(threshold)

    def _update(key_tuple, pdfs, state: GroupState):
        n, sp, sn, alarms, first = (
            state.get if state.exists else (0, 0.0, 0.0, 0, -1)
        )
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows[
            rows[value_col].notna() & rows[order_col].notna()
        ].sort_values(order_col)
        for v in rows[value_col].astype(float):
            n += 1
            sp = max(0.0, sp + (v - mu - k))
            sn = max(0.0, sn - (v - mu + k))
            if sp > h or sn > h:
                alarms += 1
                if first < 0:
                    first = n
        state.update((n, sp, sn, alarms, first))
        if n:
            yield pd.DataFrame(
                {
                    "key": [key_tuple[0]],
                    "n": [n],
                    "n_alarms": [alarms],
                    "first_alarm_pos": [None if first < 0 else first],
                    "s_pos": [round(sp, 6)],
                    "s_neg": [round(sn, 6)],
                }
            )

    return events.groupBy(key).applyInPandasWithState(
        _update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def stateful_running_totals_tws(events: DataFrame, key: str = "user_id") -> DataFrame:
    """The same per-key running (count, sum) via Spark 4's
    ``transformWithStateInPandas`` — the successor API to
    ``applyInPandasWithState``: state lives in named typed handles
    (ValueState here; ListState/MapState/timers also exist) managed by the
    StatefulProcessor lifecycle instead of one opaque tuple, and the
    operator composes with the RocksDB state store + changelog
    checkpointing. Kept alongside the GroupState twin so both custom
    stateful surfaces stay exercised; the drained output is asserted equal
    to the batch groupBy (and therefore to the older twin) in tests.

    Runtime requirements (both satisfied in-repo): the worker<->JVM state
    protocol is protobuf — served by the real google.protobuf when
    installed, else by preprocessor_spark.protoshim (pure wire-format
    shim, installed by get_spark) — and the state store must support
    multiple column families, i.e. set
    ``spark.sql.streaming.stateStore.providerClass`` to
    ``...state.RocksDBStateStoreProvider`` (bundled in the Spark JVM)
    before starting the query."""
    import pandas as pd

    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    key_type = events.schema[key].dataType.simpleString()
    out_schema = f"{key} {key_type}, n_events bigint, sum_value double"

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "totals",
                StructType(
                    [StructField("n", LongType()), StructField("s", DoubleType())]
                ),
            )

        def handleInputRows(self, key_tuple, rows, timerValues):
            n, s = (self._state.get() or (0, 0.0)) if self._state.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                s += float(pdf["value"].fillna(0.0).sum())
            self._state.update((n, s))
            yield pd.DataFrame({key: [key_tuple[0]], "n_events": [n], "sum_value": [s]})

        def close(self) -> None:
            pass

    return events.groupBy(key).transformWithStateInPandas(
        RunningTotals(), out_schema, "Update", "None"
    )


def stateful_sessionize_tws(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: float = 1800.0,
) -> DataFrame:
    """Timer-driven streaming sessionization via transformWithStateInPandas
    — the full StatefulProcessor surface in one operator: ListState buffers
    the open session's event times, event-time TIMERS flush a session whose
    gap elapses without new events (registerTimer/deleteTimer/listTimers +
    handleExpiredTimer), and in-batch gaps close sessions synchronously.
    Emits one Append-mode row per CLOSED session: (key, session_start,
    session_end, n_events). The batch twin is operators/sessions.py::
    session_stats minus each key's trailing open session
    (equivalence-tested across a checkpointed restart).

    State per key is one open session's timestamps + one timer — RocksDB-
    resident, so a 100 TB stream's state scales with live keys, not
    history. Requires the RocksDB state store provider (see
    stateful_running_totals_tws)."""
    import pandas as pd

    from pyspark.sql import functions as F
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor
    from pyspark.sql.types import TimestampNTZType

    # watermarks require TIMESTAMP; parquet NANOS-normalized tables come in
    # as TIMESTAMP_NTZ (session TZ is UTC, so the cast is value-preserving)
    if isinstance(events.schema[ts_col].dataType, TimestampNTZType):
        events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))

    key_type = events.schema[key].dataType.simpleString()
    out_schema = (
        f"{key} {key_type}, session_start timestamp, session_end timestamp, "
        "n_events bigint"
    )
    gap_ms = int(gap_seconds * 1000)

    class Sessionizer(StatefulProcessor):
        def init(self, handle) -> None:
            self._buf = handle.getListState("open_events", "ts timestamp")
            self._handle = handle

        def _emit(self, key_tuple, sessions):
            return pd.DataFrame(
                {
                    key: [key_tuple[0]] * len(sessions),
                    "session_start": [s[0] for s in sessions],
                    "session_end": [s[-1] for s in sessions],
                    "n_events": [len(s) for s in sessions],
                }
            )

        def handleInputRows(self, key_tuple, rows, timerValues):
            new_ts = []
            for pdf in rows:
                new_ts.extend(pdf[ts_col].tolist())
            old = [r[0] for r in self._buf.get()] if self._buf.exists() else []
            allts = sorted(old + new_ts)
            sessions, cur = [], [allts[0]]
            for t in allts[1:]:
                if (t - cur[-1]).total_seconds() > gap_seconds:
                    sessions.append(cur)
                    cur = [t]
                else:
                    cur.append(t)
            # re-arm: exactly one live timer per key, at open-end + gap
            for stale in list(self._handle.listTimers()):
                self._handle.deleteTimer(stale)
            self._handle.registerTimer(
                int(cur[-1].timestamp() * 1000) + gap_ms
            )
            self._buf.put([(t,) for t in cur])
            if sessions:
                yield self._emit(key_tuple, sessions)

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            key_tuple = key
            buf = sorted(
                r[0] for r in (self._buf.get() if self._buf.exists() else [])
            )
            # a stale timer (same-batch input already re-armed) must not
            # flush the new open session early
            if buf and expiredTimerInfo.getExpiryTimeInMs() >= int(
                buf[-1].timestamp() * 1000
            ) + gap_ms:
                self._buf.clear()
                yield self._emit(key_tuple, [buf])

        def close(self) -> None:
            pass

    return (
        events.withWatermark(ts_col, "0 seconds")
        .groupBy(key)
        .transformWithStateInPandas(Sessionizer(), out_schema, "Append", "eventTime")
    )


def holt_winters_stream(
    events: DataFrame,
    key: str = "user_id",
    order_col: str = "ts",
    value_col: str = "value",
    season: int = 6,
    alpha: float = 0.5,
    beta: float = 0.3,
    gamma: float = 0.3,
    horizon: int = 3,
) -> DataFrame:
    """Streaming twin of :func:`preprocessor_spark.operators.holt.
    holt_winters_forecast` — the additive triple-smoothing recursion
    maintained across micro-batches in ``applyInPandasWithState``.

    State per key is O(season): until 2·season observations arrive, raw
    values buffer (the two-season init is a function of that prefix);
    afterwards state is (n, level, trend, the season-length seasonal ring,
    sse, count). Rows must arrive per-key in event order across batches
    (the append-log contract shared with holt_stream); within a batch they
    sort by ``order_col``. After a full in-order drain the emitted values
    equal the batch operator exactly — pytest-asserted. Keys still inside
    their init window emit nothing yet.
    """
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    key_type = events.schema[key].dataType.simpleString()
    out_schema = (
        f"{key} {key_type}, n bigint, level double, trend double, "
        "seasonal array<double>, rmse double, forecast array<double>"
    )
    # buf holds the init prefix until 2m rows are seen; seas is the
    # rolling seasonal ring (s_{t-m+1}..s_t) once the recursion is live
    state_schema = (
        "n bigint, lvl double, tr double, sse double, cnt bigint, "
        "live boolean, buf array<double>, seas array<double>"
    )
    a, b_, g, m, h = float(alpha), float(beta), float(gamma), int(season), int(horizon)

    def _update(key_tuple, pdfs, state: GroupState):
        if state.exists:
            n, lvl, tr, sse, cnt, live, buf, seas = state.get
            buf, seas = list(buf), list(seas)
        else:
            n, lvl, tr, sse, cnt, live, buf, seas = 0, 0.0, 0.0, 0.0, 0, False, [], []
        rows = pd.concat(list(pdfs), ignore_index=True)
        # drop null order_col rows too — the batch twin's where clause
        # filters both, and a null timestamp must not enter the recursion
        rows = rows[
            rows[value_col].notna() & rows[order_col].notna()
        ].sort_values(order_col)

        def step(v):
            nonlocal lvl, tr, sse, cnt
            s_lag = seas.pop(0)
            err = v - (lvl + tr + s_lag)
            sse += err * err
            cnt += 1
            new_lvl = a * (v - s_lag) + (1.0 - a) * (lvl + tr)
            tr = b_ * (new_lvl - lvl) + (1.0 - b_) * tr
            lvl = new_lvl
            seas.append(g * (v - lvl) + (1.0 - g) * s_lag)

        for v in rows[value_col].astype(float):
            n += 1
            if live:
                step(v)
                continue
            buf.append(v)
            if len(buf) == 2 * m:
                # replay the batch init on the buffered two seasons, then
                # run the recursion over the second season's values
                import numpy as np

                vals = np.array(buf, dtype=np.float64)
                lvl = float(vals[:m].mean())
                tr = float((vals[m:].mean() - vals[:m].mean()) / m)
                seas = [float(x - lvl) for x in vals[:m]]
                live = True
                for w in vals[m:]:
                    step(float(w))
                buf = []
        state.update((n, lvl, tr, sse, cnt, live, buf, seas))
        if live:
            last_season = seas[-m:]
            yield pd.DataFrame(
                {
                    key: [key_tuple[0]],
                    "n": [n],
                    "level": [round(lvl, 6)],
                    "trend": [round(tr, 6)],
                    "seasonal": [[round(s, 6) for s in last_season]],
                    "rmse": [round(float((sse / cnt) ** 0.5), 6)],
                    "forecast": [[
                        round(lvl + (i + 1) * tr + last_season[i % m], 6)
                        for i in range(h)
                    ]],
                }
            )

    return events.groupBy(key).applyInPandasWithState(
        _update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def heavy_hitters_stream(
    events: DataFrame,
    value_col: str = "event_type",
    capacity: int = 64,
    order_col: str = "ts",
    shards: int = 1,
) -> DataFrame:
    """Streaming Misra-Gries heavy hitters — the standing "what's trending
    right now" sketch, maintained across micro-batches in
    ``applyInPandasWithState`` under a single global sketch key.

    Classic MG semantics (the batch twin is
    :func:`preprocessor_spark.operators.sketches.heavy_hitters`'s
    per-partition pass, sequentialized): at most ``capacity`` counters;
    an unseen item beyond capacity decrements every counter and evicts
    zeros. The streaming guarantee holds at every emission: for every
    item, est ≤ true ≤ est + n_decrements, and any item with true
    frequency > N/capacity is guaranteed present. State is O(capacity)
    regardless of stream length. Rows sort by ``order_col`` within each
    batch; after an in-order drain the sketch equals the sequential
    scalar MG over the full stream (pytest-asserted against an
    independent reference implementation).

    Scale shape (``shards``, round-10): a single state key serializes the
    stream through one task — right for control-plane cardinalities
    (event types, domains, status codes). For high-rate streams set
    ``shards=S``: items route to ``pmod(xxhash64(value), S)`` state keys,
    so the S sketches update in parallel across state partitions and
    every item's FULL substream lands in exactly one shard. Because the
    sharding is value-deterministic, the drain merge is a disjoint union
    — :func:`merge_sharded_heavy_hitters` — and the per-item bound stays
    est ≤ true ≤ est + its OWN shard's decrement count (tighter than the
    batch operator's Σ-over-partitions bound, where an item's stream
    splits). Presence guarantee per shard: true freq > N_shard/capacity.
    """
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    if shards < 1:
        raise ValueError(f"shards must be >= 1, got {shards}")
    out_schema = (
        "shard int, item string, est bigint, n bigint, n_decrements bigint"
    )
    state_schema = "items array<string>, counts array<long>, n bigint, dec bigint"

    def _update(key_tuple, pdfs, state: GroupState):
        shard = int(key_tuple[0])
        if state.exists:
            items, counts, n, dec = state.get
            counters = dict(zip(list(items), list(counts)))
        else:
            counters, n, dec = {}, 0, 0
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows[
            rows[value_col].notna() & rows[order_col].notna()
        ].sort_values(order_col)
        for v in rows[value_col].astype(str):
            n += 1
            if v in counters:
                counters[v] += 1
            elif len(counters) < capacity:
                counters[v] = 1
            else:
                dec += 1
                for key in list(counters):
                    counters[key] -= 1
                    if counters[key] == 0:
                        del counters[key]
        state.update((list(counters), [counters[i] for i in counters], n, dec))
        out = sorted(counters.items(), key=lambda kv: (-kv[1], kv[0]))
        yield pd.DataFrame(
            {
                "shard": [shard] * len(out),
                "item": [i for i, _ in out],
                "est": [c for _, c in out],
                "n": [n] * len(out),
                "n_decrements": [dec] * len(out),
            }
        )

    if shards == 1:
        shard_key = F.lit(0)
    else:
        # null values are dropped inside the update fn; route them to 0
        shard_key = F.coalesce(
            F.pmod(F.xxhash64(F.col(value_col)), F.lit(shards)), F.lit(0)
        ).cast("int")
    sketch = events.withColumn("__sk", shard_key)
    return sketch.groupBy("__sk").applyInPandasWithState(
        _update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def merge_sharded_heavy_hitters(
    summaries: DataFrame, k: int | None = None
) -> DataFrame:
    """Merge the drained sink table of a sharded
    :func:`heavy_hitters_stream` into one ``(item, est, err, n_total)``
    frame.

    Per shard, the LATEST emission (max ``n`` — n is nondecreasing) is its
    final summary; because items route to exactly one shard, the merge is
    a disjoint union with ``err`` = the item's own shard's decrement count
    and the additive guarantee est ≤ true ≤ est + err per item. n_total
    sums the per-shard stream lengths. Batch frame in, batch frame out
    (run it on ``spark.table(sink)`` after the drain)."""
    from pyspark.sql import Window

    # summaries is sketch-sized (emissions x capacity rows), so a per-shard
    # window here is a bounded frame, not a data-sized SinglePartition
    mx = F.max("n").over(Window.partitionBy("shard"))
    latest = (
        summaries.withColumn("__mx", mx)
        .where(F.col("n") == F.col("__mx"))
        .drop("__mx")
        .dropDuplicates(["shard", "item"])
    )
    n_total = latest.select("shard", "n").distinct().agg(
        F.sum("n").alias("n_total")
    )
    out = (
        latest.select("item", "est", F.col("n_decrements").alias("err"))
        .join(F.broadcast(n_total))
        .orderBy(F.desc("est"), F.asc("item"))
    )
    return out.limit(k) if k else out


def funnel_stream(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Stateful streaming funnel — the live twin of
    :func:`preprocessor_spark.operators.funnel.funnel_report`.

    Per-user state is the k-slot completion-time vector of the strictly
    ordered first-touch funnel, held as EPOCH-MICROSECOND bigints (the
    state codec does not take timestamp arrays; micros are also exactly
    the unit the batch report's gap arithmetic uses). The forward pass is
    EXACTLY the batch chained-min semantics under the per-key in-order
    drain contract (induction: step i−1's completion is set at the event
    that attains the batch minimum; every earlier step-i event has
    ts ≤ t_{i−1} and fails the strict >, every later one is examined in
    time order, so the first qualifying step-i event IS the batch min —
    pytest-asserted exact report equivalence incl. repeated step types
    and ts ties).

    Emits one row per user per batch: (user, n_events, stage,
    t0..t{k−1} micros); aggregate the drained sink with
    :func:`funnel_report_from_states` for the batch report. State is
    O(k) per user.
    """
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    steps = list(steps)
    if not steps:
        raise ValueError("steps must be non-empty")
    k = len(steps)
    idx_of: dict = {}
    for i, st in enumerate(steps):
        idx_of.setdefault(st, []).append(i)
    key_type = events.schema[user_col].dataType.simpleString()
    tcols = [f"t{i}" for i in range(k)]
    out_schema = (
        f"{user_col} {key_type}, n_events bigint, stage int, "
        + ", ".join(f"{t} bigint" for t in tcols)
    )
    state_schema = "n bigint, " + ", ".join(f"{t} bigint" for t in tcols)

    def _update(key_tuple, pdfs, state: GroupState):
        if state.exists:
            got = state.get
            n, times = got[0], list(got[1:])
        else:
            n, times = 0, [None] * k
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows[
            rows[type_col].notna() & rows[ts_col].notna()
        ].sort_values(ts_col)
        for ts, et in zip(rows[ts_col], rows[type_col]):
            n += 1
            us = pd.Timestamp(ts).value // 1000  # exact epoch micros
            for i in idx_of.get(et, ()):
                if times[i] is not None:
                    continue
                if i == 0 or (times[i - 1] is not None and us > times[i - 1]):
                    times[i] = us
        state.update((n, *times))
        if n:
            stage = sum(1 for t in times if t is not None)
            yield pd.DataFrame(
                [{
                    user_col: key_tuple[0],
                    "n_events": n,
                    "stage": stage,
                    **{t: times[i] for i, t in enumerate(tcols)},
                }]
            )

    return events.groupBy(user_col).applyInPandasWithState(
        _update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def sessionize_stream(
    events: DataFrame,
    gap_seconds: float,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Stateful streaming gap-sessionization — the live twin of
    :func:`preprocessor_spark.operators.sessions.session_stats`.

    Per-user state is (events_seen, open-session seq/start/last/count) in
    EPOCH-MICROSECOND bigints. The gap test replicates the batch
    operator's float math exactly — ``us/1e6`` (exact int→double while
    |us| < 2^53, i.e. until the year 2255) then a double subtraction
    compared to the gap — so after a full per-key in-order drain the
    per-session stats are BIT-EQUAL to the batch report. Each batch
    emits every session it touched (closed ones finally, the open one
    provisionally, tagged with the running event count); aggregate the
    drained sink with :func:`session_report_from_states`.
    """
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    if gap_seconds <= 0:
        raise ValueError("gap_seconds must be > 0")
    key_type = events.schema[user_col].dataType.simpleString()
    out_schema = (
        f"{user_col} {key_type}, session_seq bigint, n_total bigint, "
        "n_events bigint, start_us bigint, end_us bigint"
    )
    state_schema = (
        "n_total bigint, seq bigint, start_us bigint, last_us bigint, "
        "n_in bigint"
    )
    gap = float(gap_seconds)

    def _update(key_tuple, pdfs, state: GroupState):
        if state.exists:
            n_total, seq, start_us, last_us, n_in = state.get
        else:
            n_total, seq, start_us, last_us, n_in = 0, 0, None, None, 0
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows[rows[ts_col].notna()].sort_values(ts_col)
        emitted = []
        for ts in rows[ts_col]:
            us = pd.Timestamp(ts).value // 1000
            n_total += 1
            if last_us is None or (us / 1e6 - last_us / 1e6) > gap:
                if last_us is not None:
                    emitted.append((seq, n_total - 1, int(n_in), start_us, last_us))
                seq += 1
                start_us = us
                n_in = 1
            else:
                n_in += 1
            last_us = us
        state.update((n_total, seq, start_us, last_us, n_in))
        if last_us is not None:
            emitted.append((seq, n_total, int(n_in), start_us, last_us))
        if emitted:
            yield pd.DataFrame(
                [
                    {
                        user_col: key_tuple[0],
                        "session_seq": s,
                        "n_total": nt,
                        "n_events": ne,
                        "start_us": su,
                        "end_us": lu,
                    }
                    for s, nt, ne, su, lu in emitted
                ]
            )

    return events.groupBy(user_col).applyInPandasWithState(
        _update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def session_report_from_states(states: DataFrame) -> DataFrame:
    """Drained sessionize_stream emissions → the batch ``session_stats``
    frame (user_id, session_seq, n_events, session_start, session_end,
    duration_sec), bit-equal after a full in-order drain. A session
    re-emitted across batches resolves to its LATEST emission (max
    n_total — the running event counter is nondecreasing)."""
    user_col = states.columns[0]
    per_session = states.groupBy(user_col, "session_seq").agg(
        F.max_by("n_events", "n_total").alias("n_events"),
        F.max_by("start_us", "n_total").alias("start_us"),
        F.max_by("end_us", "n_total").alias("end_us"),
    )
    # the batch frame's duration: MAX(us/1e6) - MIN(us/1e6), same op order
    sa = F.col("start_us").cast("double") / F.lit(1e6)
    sb = F.col("end_us").cast("double") / F.lit(1e6)
    return per_session.select(
        user_col,
        "session_seq",
        "n_events",
        F.timestamp_micros(F.col("start_us")).alias("session_start"),
        F.timestamp_micros(F.col("end_us")).alias("session_end"),
        F.round(sb - sa, 3).alias("duration_sec"),
    )


def funnel_report_from_states(states: DataFrame, steps: list[str]) -> DataFrame:
    """Drained per-user funnel states → the batch ``funnel_report`` frame
    (step_idx, step, n_users, conv_from_prev, avg_gap_secs), using the
    SAME exact BIGINT-microsecond arithmetic so the two reports are
    bit-equal after a full in-order drain. The latest emission per user
    (max n_events — nondecreasing) is its final state."""
    from preprocessor_spark.operators.funnel import _report_from_per_user

    k = len(steps)
    tcols = [f"__t{i}" for i in range(k)]
    per_user = states.groupBy(states.columns[0]).agg(
        *[
            F.timestamp_micros(F.max_by(f"t{i}", "n_events")).alias(t)
            for i, t in enumerate(tcols)
        ]
    )
    return _report_from_per_user(per_user, tcols, steps)


def interval_join_stream(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    on: list[str],
    watermark_delay: str = "2 hours",
) -> DataFrame:
    """STREAM-STREAM interval join: each arriving point row matches every
    interval row with the same ``on`` keys whose [start, end] contains the
    point's event time — the continuous twin of
    :func:`preprocessor_spark.operators.interval.interval_join` (incident
    windows catching clicks, sessions catching beacons) built on Spark's
    watermarked stream-stream inner join.

    Both sides carry a ``watermark_delay`` event-time watermark; the join
    condition is the equi keys plus the explicit time range
    ``start <= ts <= end``, which Spark uses to BOUND the buffered state
    on both sides (late rows beyond the watermark are dropped, matched
    pairs emit append-mode as soon as both sides arrive). Inner-join
    emissions do not wait for the watermark, so a single availableNow
    drain yields exactly the batch join's pairs — the twin contract the
    registry query grades via the batch oracle.

    Returns all columns of ``points`` plus the non-``on`` columns of
    ``intervals``. Column names must not otherwise collide. The three
    event-time columns are cast to TIMESTAMP (watermarks reject
    TIMESTAMP_NTZ; with the engine's fixed UTC session timezone the cast
    is value-preserving).
    """
    p = (
        points.withColumn(point_ts, F.col(point_ts).cast("timestamp"))
        .withWatermark(point_ts, watermark_delay)
        .alias("p")
    )
    i = (
        intervals.withColumn(start_col, F.col(start_col).cast("timestamp"))
        .withColumn(end_col, F.col(end_col).cast("timestamp"))
        .withWatermark(start_col, watermark_delay)
        .alias("i")
    )
    cond = None
    for c in on:
        eq = F.col(f"p.{c}") == F.col(f"i.{c}")
        cond = eq if cond is None else (cond & eq)
    rng = (F.col(f"p.{point_ts}") >= F.col(f"i.{start_col}")) & (
        F.col(f"p.{point_ts}") <= F.col(f"i.{end_col}")
    )
    cond = rng if cond is None else (cond & rng)
    other = [c for c in intervals.columns if c not in on]
    return p.join(i, cond, "inner").select(
        *[F.col(f"p.{c}") for c in points.columns],
        *[F.col(f"i.{c}") for c in other],
    )
