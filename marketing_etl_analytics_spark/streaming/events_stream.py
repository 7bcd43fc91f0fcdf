"""Streaming operators over the events table.

Batch/stream equivalence contract: ``daily_event_aggregates`` over a
bounded stream (``trigger(availableNow=True)``) must produce exactly
the rows of the batch ``ext_stream_daily_window`` suite entry — the
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

    src = os.path.join(sf_dir, "events.parquet")
    tag = hashlib.md5(src.encode()).hexdigest()[:8]
    stage = os.path.join(tempfile.gettempdir(), f"events_stream_{tag}")
    os.makedirs(stage, exist_ok=True)
    link = os.path.join(stage, "events.parquet")
    if not os.path.exists(link):
        os.symlink(src, link)

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = (
        spark.readStream.schema(EVENTS_RAW_SCHEMA)
        .format("parquet")
        .load(stage)
    )
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def dedup_events(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Stateful exact dedup on event_id within the watermark horizon —
    the streaming analog of ON CONFLICT DO NOTHING idempotency."""
    return events.withWatermark("ts", watermark).dropDuplicates(["event_id"])


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

    if state.exists:
        start_us, last_us, n, value = state.get
    else:
        start_us = last_us = -1
        n, value = 0, 0.0

    out = []
    ts_all, val_all = [], []
    for pdf in pdfs:
        ts_all.extend(int(x.value) // 1000 for x in pd.to_datetime(pdf["ts"]))
        val_all.extend(float(v) for v in pdf["value"])
    for us, v in sorted(zip(ts_all, val_all)):
        if start_us < 0:
            start_us = last_us = us
            n, value = 1, v
        elif us - last_us > SESSION_GAP_US:
            out.append((start_us, last_us, n, value))
            start_us = last_us = us
            n, value = 1, v
        else:
            last_us = us
            n += 1
            value += v
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
