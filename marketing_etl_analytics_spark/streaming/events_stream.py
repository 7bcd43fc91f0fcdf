"""Streaming operators over the events table.

Batch/stream equivalence contract: ``daily_event_aggregates`` over a
bounded stream (``trigger(availableNow=True)``) must produce exactly
the rows of the equivalent batch tumbling-window aggregation — the
test suite asserts this.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# schema of events.parquet with nanos ts read as long (see suite.common.events)
EVENTS_RAW_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet (bounded; use
    availableNow trigger for batch-equivalence runs).

    The parquet file source requires a *directory*, so the single
    events.parquet file is exposed via a symlink inside a temp dir.
    """
    import hashlib
    import os
    import tempfile

    # abspath: a relative sf_dir would otherwise produce a symlink whose
    # relative target resolves against /tmp — a broken link the parquet
    # stream source reads as an EMPTY directory (0 rows, no error)
    src = os.path.abspath(os.path.join(sf_dir, "events.parquet"))
    if os.path.isdir(src):
        # already a directory of part files (Spark-written layout) —
        # stream straight from it; a nested symlink would be invisible
        # to the file source (non-partition subdirs are not recursed)
        stage = src
    else:
        tag = hashlib.md5(src.encode()).hexdigest()[:8]
        stage = os.path.join(tempfile.gettempdir(), f"events_stream_{tag}")
        os.makedirs(stage, exist_ok=True)
        link = os.path.join(stage, "events.parquet")
        if os.path.lexists(link) and os.path.realpath(link) != os.path.realpath(
            src
        ):
            os.remove(link)  # stale/broken link from an earlier process
        if not os.path.lexists(link):
            os.symlink(src, link)

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # the file stream source needs an explicit schema; the physical ts
    # type varies by writer (driver testdata: INT64 nanos -> long under
    # nanosAsLong; Spark-written copies: INT96/INT64 timestamps), so
    # probe it with a batch footer read and adapt like suite.common.events
    ts_type = dict(spark.read.parquet(stage).dtypes).get("ts")
    if ts_type == "bigint":
        raw = spark.readStream.schema(EVENTS_RAW_SCHEMA).format("parquet").load(stage)
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    schema = StructType(
        [
            f if f.name != "ts" else StructField("ts", TimestampType())
            for f in EVENTS_RAW_SCHEMA.fields
        ]
    )
    return spark.readStream.schema(schema).format("parquet").load(stage)


def dedup_events(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Stateful dedup on event_id within the watermark horizon — the
    streaming analog of ON CONFLICT DO NOTHING idempotency.

    Uses ``dropDuplicatesWithinWatermark``, not ``dropDuplicates``:
    with a key subset that excludes the event-time column, plain
    dropDuplicates NEVER evicts its state (the watermark only bounds
    state when event time is part of the key), so on an unbounded
    stream the dedup map grows with total distinct keys — the classic
    silent OOM at cluster scale. The WithinWatermark variant evicts a
    key once the watermark passes its first-seen timestamp, trading
    "exact forever" for "exact within the deduplication horizon",
    which is the contract replays actually need (a source that can
    replay an event a day later needs a day's watermark, not an
    unbounded map). Duplicate handling verified by
    tests/test_streaming.py::test_dedup_within_watermark_drops_replays.
    """
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def attribution_join(
    events: DataFrame, window: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Stream-stream inner join: each click matched to same-user views
    in the preceding ``window`` (the last-touch attribution shape).

    Both sides carry watermarks and the join predicate carries an
    event-time range, so the state store is bounded: a buffered view
    row is evicted once the watermark passes ``view_ts + window``, a
    click row once it passes ``click_ts`` — the state size is
    O(events per watermark horizon), independent of stream length.
    """
    views = (
        events.filter(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            "user_id",
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", watermark)
    )
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("click_user"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    return views.join(
        clicks,
        (F.col("user_id") == F.col("click_user"))
        & (F.col("view_ts") < F.col("click_ts"))
        & (F.col("view_ts") >= F.col("click_ts") - F.expr(f"INTERVAL {window}")),
    ).select(
        "click_id",
        "view_id",
        "user_id",
        (F.unix_micros("click_ts") - F.unix_micros("view_ts")).alias("gap_us"),
    )


def attribution_join_outer(
    events: DataFrame, window: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Stream-stream LEFT OUTER join: every click, matched to same-user
    views in the preceding ``window`` — clicks with no qualifying view
    emit a NULL-view row (the unattributed-click feed).

    Outer rows cannot be emitted eagerly: a matching view may still
    arrive. Spark buffers the click and emits the NULL-joined row only
    once the global watermark (min across both sides) passes the
    click's last possible match time, so the unmatched feed is exactly
    the clicks provably beyond late-data reach — state stays bounded by
    the watermark horizon just like the inner join."""
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("click_user"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    views = (
        events.filter(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            "user_id",
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", watermark)
    )
    return clicks.join(
        views,
        (F.col("user_id") == F.col("click_user"))
        & (F.col("view_ts") < F.col("click_ts"))
        & (F.col("view_ts") >= F.col("click_ts") - F.expr(f"INTERVAL {window}")),
        "leftOuter",
    ).select(
        "click_id",
        F.col("click_user").alias("user_id"),
        "view_id",
        (F.unix_micros("click_ts") - F.unix_micros("view_ts")).alias("gap_us"),
    )


def daily_event_aggregates(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Tumbling daily windows per event_type with late-data watermark —
    the streaming form of the reference's nightly (day, campaign) grain."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.approx_count_distinct("user_id").alias("approx_users"),
            F.round(F.sum(F.col("value").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("w.start").cast("date").alias("day"),
            "event_type",
            "n_events",
            "approx_users",
            "total_value",
        )
    )


SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n", LongType()),
        StructField("value", DoubleType()),
    ]
)

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 minutes


def _sessionize_user(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Custom stateful operator: split one user's event stream into
    sessions separated by >30 min of inactivity. Emits closed sessions;
    keeps the open one in state (flushed on timeout)."""
    (user_id,) = key
    if state.hasTimedOut:
        if state.exists:
            start_us, last_us, n, value = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(last_us, unit="us")],
                    "n_events": [n],
                    "total_value": [round(value, 2)],
                }
            )
        return

    import numpy as np

    # vectorized gaps-and-islands: a Python per-event loop costs ~1 ms
    # per group x thousands of groups per partition; numpy keeps the
    # whole group batch in C
    ts_parts, val_parts = [], []
    for pdf in pdfs:
        ts_parts.append(
            pd.to_datetime(pdf["ts"]).values.astype("datetime64[us]").astype(np.int64)
        )
        val_parts.append(pdf["value"].to_numpy(dtype=np.float64))
    us = np.concatenate(ts_parts) if ts_parts else np.empty(0, np.int64)
    vals = np.concatenate(val_parts) if val_parts else np.empty(0, np.float64)
    if len(us) == 0:
        # empty non-timeout batch for this key: nothing to sessionize;
        # re-arm the timeout so the open session still flushes
        if state.exists:
            _, last0, _, _ = state.get
            wm = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(
                max(last0 // 1000 + SESSION_GAP_US // 1000, wm + 1)
            )
        return
    order = np.argsort(us, kind="stable")
    us, vals = us[order], vals[order]

    seg_starts = np.concatenate(
        ([0], np.flatnonzero(np.diff(us) > SESSION_GAP_US) + 1)
    )
    seg_last = np.concatenate((seg_starts[1:] - 1, [len(us) - 1]))
    counts = np.diff(np.concatenate((seg_starts, [len(us)])))
    sums = np.add.reduceat(vals, seg_starts)
    segments = [
        (int(us[s]), int(us[e]), int(c), float(v))
        for s, e, c, v in zip(seg_starts, seg_last, counts, sums)
    ]

    if state.exists:
        # place the open session on the segment timeline and re-merge:
        # an in-watermark out-of-order batch can sit entirely BEFORE
        # the stored session (or straddle it), so pairwise in-gap
        # merging over the sorted segment list is the correct general
        # form — not a special case on the first batch segment
        segments.append(tuple(state.get))
        segments.sort()
        merged = [segments[0]]
        for seg in segments[1:]:
            prev = merged[-1]
            if seg[0] - prev[1] <= SESSION_GAP_US:
                merged[-1] = (
                    min(prev[0], seg[0]),
                    max(prev[1], seg[1]),
                    prev[2] + seg[2],
                    prev[3] + seg[3],
                )
            else:
                merged.append(seg)
        segments = merged

    out = segments[:-1]
    start_us, last_us, n, value = segments[-1]
    state.update((start_us, last_us, n, value))
    # event-time timeout: the open session closes when the watermark
    # passes last_event + gap (no more in-gap events can arrive). A
    # processing-time timeout would keep an availableNow run spinning
    # empty "state cleanup" batches until wall-clock expiry.
    timeout_ms = last_us // 1000 + SESSION_GAP_US // 1000
    wm = state.getCurrentWatermarkMs()
    state.setTimeoutTimestamp(max(timeout_ms, wm + 1))
    if out:
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(out),
                "session_start": [pd.Timestamp(s, unit="us") for s, _, _, _ in out],
                "session_end": [pd.Timestamp(e, unit="us") for _, e, _, _ in out],
                "n_events": [n_ for _, _, n_, _ in out],
                "total_value": [round(v_, 2) for _, _, _, v_ in out],
            }
        )


def sessionize(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """30-min-gap sessionization via applyInPandasWithState — the
    custom-stateful-operator pattern Spark's built-ins can't express."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_user,
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


# --- transformWithState sessionizer (next-gen stateful API) ------------------


def sessionize_tws(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """The same 30-min-gap sessionizer on ``transformWithStateInPandas``
    (Spark 4's successor to applyInPandasWithState): named value state,
    explicit event-time timers, Arrow-batched input. Output must equal
    :func:`sessionize` row-for-row — the test suite asserts it.

    API differences that matter here vs the GroupState form: state is a
    named handle created once in ``init`` (and can be one of several —
    value/list/map — per processor); timers are first-class (register/
    delete/list) instead of one implicit timeout per key, so the stale
    timer is deleted explicitly when the open session extends.

    Environment note: the TWS Python driver worker requires the
    ``google.protobuf`` package to handshake with the JVM; in
    environments without it the stream fails at initialization
    (STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE). The equality
    test against :func:`sessionize` importorskips on that package."""
    import numpy as np
    from pyspark.sql.streaming.stateful_processor import (
        ExpiredTimerInfo,
        StatefulProcessor,
        StatefulProcessorHandle,
        TimerValues,
    )

    gap_us = SESSION_GAP_US

    class SessionProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self.handle = handle
            self.state = handle.getValueState(
                "open_session",
                "start_us long, last_us long, n long, value double",
            )

        def _emit(self, user_id, segs):
            return pd.DataFrame(
                {
                    "user_id": [user_id] * len(segs),
                    "session_start": [
                        pd.Timestamp(s, unit="us") for s, _, _, _ in segs
                    ],
                    "session_end": [
                        pd.Timestamp(e, unit="us") for _, e, _, _ in segs
                    ],
                    "n_events": [n for _, _, n, _ in segs],
                    "total_value": [round(v, 2) for _, _, _, v in segs],
                }
            )

        def _rearm(self, last_us: int, wm_ms: int) -> None:
            # exactly one live timer per key: drop any stale ones, then
            # arm at watermark-safe session expiry
            for t in list(self.handle.listTimers()):
                self.handle.deleteTimer(t)
            self.handle.registerTimer(max(last_us // 1000 + gap_us // 1000, wm_ms + 1))

        def handleInputRows(
            self, key, rows, timerValues: TimerValues
        ) -> Iterator[pd.DataFrame]:
            (user_id,) = key
            ts_parts, val_parts = [], []
            for pdf in rows:
                ts_parts.append(
                    pd.to_datetime(pdf["ts"])
                    .values.astype("datetime64[us]")
                    .astype(np.int64)
                )
                val_parts.append(pdf["value"].to_numpy(dtype=np.float64))
            us = np.concatenate(ts_parts) if ts_parts else np.empty(0, np.int64)
            vals = (
                np.concatenate(val_parts) if val_parts else np.empty(0, np.float64)
            )
            if len(us) == 0:
                if self.state.exists():
                    _, last0, _, _ = self.state.get()
                    self._rearm(int(last0), timerValues.getCurrentWatermarkInMs())
                return
            order = np.argsort(us, kind="stable")
            us, vals = us[order], vals[order]
            seg_starts = np.concatenate(
                ([0], np.flatnonzero(np.diff(us) > gap_us) + 1)
            )
            seg_last = np.concatenate((seg_starts[1:] - 1, [len(us) - 1]))
            counts = np.diff(np.concatenate((seg_starts, [len(us)])))
            sums = np.add.reduceat(vals, seg_starts)
            segments = [
                (int(us[s]), int(us[e]), int(c), float(v))
                for s, e, c, v in zip(seg_starts, seg_last, counts, sums)
            ]
            if self.state.exists():
                segments.append(tuple(self.state.get()))
                segments.sort()
                merged = [segments[0]]
                for seg in segments[1:]:
                    prev = merged[-1]
                    if seg[0] - prev[1] <= gap_us:
                        merged[-1] = (
                            min(prev[0], seg[0]),
                            max(prev[1], seg[1]),
                            prev[2] + seg[2],
                            prev[3] + seg[3],
                        )
                    else:
                        merged.append(seg)
                segments = merged
            out = segments[:-1]
            start_us, last_us, n, value = segments[-1]
            self.state.update((start_us, last_us, n, value))
            self._rearm(last_us, timerValues.getCurrentWatermarkInMs())
            if out:
                yield self._emit(user_id, out)

        def handleExpiredTimer(
            self, key, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
        ) -> Iterator[pd.DataFrame]:
            (user_id,) = key
            if self.state.exists():
                seg = tuple(self.state.get())
                self.state.clear()
                yield self._emit(user_id, [seg])

        def close(self) -> None:
            pass

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .transformWithStateInPandas(
            SessionProcessor(),
            outputStructType=SESSION_SCHEMA,
            outputMode="append",
            timeMode="eventTime",
        )
    )


def session_window_agg(
    events: DataFrame, watermark: str = "1 hour", gap: str = "30 minutes"
) -> DataFrame:
    """Native session-window sessionization under Structured Streaming:
    the SAME expression as the batch ext_session_window_native entry,
    with a watermark bounding state. Append mode emits a session once
    the watermark passes its end (last event + gap) — sessions closer
    to the head of the stream stay in state (a later event could still
    extend them), which the suite oracle mirrors explicitly."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            F.col("n_events").cast("long").alias("n_events"),
            "total_value",
        )
    )


def read_table_stream(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """File-source stream over any driver testdata parquet (bounded;
    availableNow for batch-equivalence runs). Same symlink staging as
    ``read_events_stream`` — the parquet stream source needs a
    directory — with the schema probed from a batch footer read."""
    import hashlib
    import os
    import tempfile

    src = os.path.abspath(os.path.join(sf_dir, f"{name}.parquet"))
    if os.path.isdir(src):
        stage = src
    else:
        tag = hashlib.md5(src.encode()).hexdigest()[:8]
        stage = os.path.join(tempfile.gettempdir(), f"{name}_stream_{tag}")
        os.makedirs(stage, exist_ok=True)
        link = os.path.join(stage, f"{name}.parquet")
        if os.path.lexists(link) and os.path.realpath(link) != os.path.realpath(src):
            os.remove(link)
        if not os.path.lexists(link):
            os.symlink(src, link)
    schema = spark.read.parquet(stage).schema
    return spark.readStream.schema(schema).format("parquet").load(stage)
