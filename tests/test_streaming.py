"""Streaming tests: batch/stream equivalence + stateful operators.

All runs use bounded input with trigger(availableNow=True) so they
terminate; the daily-aggregate stream must reproduce the batch suite
entry's rows exactly (modulo the approx-distinct column).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from marketing_etl_analytics_spark.streaming import (
    daily_event_aggregates,
    dedup_events,
    read_events_stream,
    sessionize,
)
from marketing_etl_analytics_spark.suite.common import events as batch_events

SF = "/root/testdata/sf0.001"


def _run_stream(df, name: str):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append" if name == "sessions" else "complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_daily_aggregates_match_batch(spark):
    stream = read_events_stream(spark, SF)
    q = (
        daily_event_aggregates(stream)
        .writeStream.format("memory")
        .queryName("daily_agg")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.day, r.event_type): (r.n_events, r.total_value)
        for r in spark.sql("SELECT * FROM daily_agg").collect()
    }
    expected = {
        (r.day, r.event_type): (r.n_events, r.total_value)
        for r in batch_events(spark, SF)
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("total_value"),
        )
        .select(F.col("w.start").cast("date").alias("day"), "event_type",
                "n_events", "total_value")
        .collect()
    }
    assert got == expected
    assert len(got) > 0


def test_stateful_dedup(spark):
    stream = read_events_stream(spark, SF)
    q = (
        dedup_events(stream)
        .groupBy()
        .agg(F.count(F.lit(1)).alias("n"))
        .writeStream.format("memory")
        .queryName("dedup_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    row = spark.sql("SELECT * FROM dedup_counts").collect()[0]
    n_batch = batch_events(spark, SF).count()
    assert row.n == n_batch  # input ids are unique; dedup drops nothing


def test_sessionize(spark):
    stream = read_events_stream(spark, SF)
    q = (
        sessionize(stream)
        .writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql("SELECT * FROM sessions").collect()
    # closed sessions only (open ones wait for the processing-time
    # timeout, which an availableNow run doesn't reach) — still, a
    # month of events per user must yield many >30min gaps
    assert len(rows) > 0
    for r in rows[:50]:
        assert r.session_end >= r.session_start
        assert r.n_events >= 1
    # session invariant: per user, sessions don't overlap
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append((r.session_start, r.session_end))
    for spans in by_user.values():
        spans.sort()
        for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
            assert e1 < s2


def test_attribution_join_matches_batch(spark):
    """Stream-stream interval join over a bounded stream must equal
    the batch join: watermarks only evict state, never drop matches
    when every row arrives before the final watermark advance."""
    from marketing_etl_analytics_spark.streaming.events_stream import (
        attribution_join,
        read_events_stream,
    )
    from marketing_etl_analytics_spark.suite.common import events as batch_events

    sf_dir = "/root/testdata/sf0.001"
    q = (
        attribution_join(read_events_stream(spark, sf_dir))
        .writeStream.format("memory")
        .queryName("attrib_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r.click_id, r.view_id, r.user_id, r.gap_us)
        for r in spark.sql("SELECT * FROM attrib_test").collect()
    }

    ev = batch_events(spark, sf_dir)
    c = ev.filter(F.col("event_type") == "click").selectExpr(
        "event_id AS click_id", "user_id AS cu", "ts AS cts"
    )
    v = ev.filter(F.col("event_type") == "view").selectExpr(
        "event_id AS view_id", "user_id", "ts AS vts"
    )
    want = {
        (r.click_id, r.view_id, r.user_id, r.gap_us)
        for r in c.join(
            v,
            (F.col("cu") == F.col("user_id"))
            & (F.col("vts") < F.col("cts"))
            & (F.col("vts") >= F.col("cts") - F.expr("INTERVAL 30 MINUTES")),
        )
        .select(
            "click_id", "view_id", "user_id",
            (F.unix_micros("cts") - F.unix_micros("vts")).alias("gap_us"),
        )
        .collect()
    }
    assert got == want and len(got) > 0


def test_stream_sessionize_equals_batch(spark):
    """The availableNow streaming sessionizer must emit exactly the
    batch gaps-and-islands sessions whose event-time timeout fired
    before the final watermark (sessions still 'open' at end-of-stream
    wait for a timeout that never comes — the only permitted
    difference). This gives the no-oracle stream_sessionize entry real
    correctness evidence against its fully-oracled batch twin."""
    from marketing_etl_analytics_spark.streaming.events_stream import (
        SESSION_GAP_US,
    )
    from marketing_etl_analytics_spark.suite.ext_scale import sessionize_batch
    from marketing_etl_analytics_spark.suite.udf import stream_sessionize

    streamed = {
        (r.user_id, r.session_start, r.session_end, r.n_events): r.total_value
        for r in stream_sessionize(spark, SF).collect()
    }

    ev = batch_events(spark, SF)
    batch_rows = (
        sessionize_batch(ev)
        .withColumn("end_us", F.unix_micros("session_end"))
        .collect()
    )
    # final watermark: global max event time minus the 2h delay (ms
    # precision, matching Spark's watermark arithmetic)
    max_us = ev.agg(F.max(F.unix_micros("ts"))).collect()[0][0]
    wm_ms = max_us // 1000 - 2 * 3600 * 1000

    closed, still_open = {}, set()
    gap_ms = SESSION_GAP_US // 1000
    for r in batch_rows:
        key = (r.user_id, r.session_start, r.session_end, r.n_events)
        if r.end_us // 1000 + gap_ms <= wm_ms:
            closed[key] = float(r.total_value)
        else:
            still_open.add(key)

    assert len(streamed) > 0 and len(closed) > 0
    assert set(streamed) == set(closed)
    # every session NOT emitted must be one whose timeout never fired
    assert still_open.isdisjoint(streamed)
    # money: streaming sums float64 in state, batch sums exact decimal
    # — identical after 2dp rounding up to one-ulp boundary noise
    for key, got in streamed.items():
        assert abs(got - closed[key]) <= 0.011, (key, got, closed[key])


def test_transform_with_state_sessionizer_equals_group_state(spark):
    """The transformWithStateInPandas sessionizer (next-gen stateful
    API: named value state + explicit event-time timers) must emit
    exactly the rows of the applyInPandasWithState one on the same
    bounded stream — two implementations, one contract."""
    # the TWS Python driver worker speaks protobuf to the JVM; without
    # the google.protobuf package the runner cannot even start
    # (STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE) — environment
    # gap, not an implementation one, so skip rather than xfail
    pytest.importorskip("google.protobuf")
    from marketing_etl_analytics_spark.streaming.events_stream import (
        sessionize_tws,
    )

    def run(build, name):
        q = (
            build(read_events_stream(spark, SF))
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        return {
            (r.user_id, r.session_start, r.session_end, r.n_events): round(
                r.total_value, 2
            )
            for r in spark.table(name).collect()
        }

    old = run(sessionize, "tws_old_sessions")
    new = run(sessionize_tws, "tws_new_sessions")
    assert len(old) > 100
    assert new == old


def test_dedup_within_watermark_drops_replays(spark, tmp_path):
    """dropDuplicatesWithinWatermark must swallow replayed events whose
    duplicate arrives inside the watermark horizon (the bounded-state
    dedup contract; plain dropDuplicates would too, but by holding
    every key forever)."""
    base = (
        batch_events(spark, SF)
        .limit(100)
        .select("event_id", "ts", "user_id", "event_type", "value")
    )
    replays = base.withColumn("ts", F.col("ts") + F.expr("INTERVAL 2 MINUTES"))
    src = str(tmp_path / "dup_events")
    base.unionAll(replays).coalesce(1).write.parquet(src)

    stream = spark.readStream.schema(base.schema).parquet(src)
    deduped = dedup_events(stream, watermark="1 hour")
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_replays")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql(
        "SELECT COUNT(*) AS n, COUNT(DISTINCT event_id) AS nd FROM dedup_replays"
    ).collect()[0]
    assert out.n == out.nd == 100


def test_stream_session_window_multibatch(spark, tmp_path):
    """Sessions must merge ACROSS micro-batches: events are split into
    four time-range files processed one per trigger
    (maxFilesPerTrigger=1), so sessions spanning a file boundary only
    come out right if the session-window state carries between
    batches. The closed-session set (end strictly before the final
    watermark) must equal the batch gaps-and-islands computation."""
    import os
    import time as _time

    from marketing_etl_analytics_spark.streaming.events_stream import (
        session_window_agg,
    )
    from marketing_etl_analytics_spark.suite.ext_scale import sessionize_batch

    ev = batch_events(spark, SF).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).collect()[0]
    span = (hi - lo) / 4
    src = str(tmp_path / "ev_parts")
    os.makedirs(src)
    for i in range(4):
        a = lo + i * span
        b = hi if i == 3 else lo + (i + 1) * span
        cond = (F.col("ts") >= F.lit(a)) & (
            (F.col("ts") <= F.lit(b)) if i == 3 else (F.col("ts") < F.lit(b))
        )
        part_dir = str(tmp_path / f"part_{i}")
        ev.filter(cond).coalesce(1).write.parquet(part_dir)
        pq = [f for f in os.listdir(part_dir) if f.endswith(".parquet")][0]
        dst = os.path.join(src, f"{i:04d}.parquet")
        os.rename(os.path.join(part_dir, pq), dst)
        # FileStreamSource orders new files by modification time;
        # spaced mtimes pin the intended batch order deterministically
        os.utime(dst, (1_700_000_000 + i * 10, 1_700_000_000 + i * 10))

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        session_window_agg(stream)
        .writeStream.format("memory")
        .queryName("sess_multibatch")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    wm = hi - __import__("datetime").timedelta(hours=1)
    got = sorted(
        map(
            tuple,
            spark.sql("SELECT * FROM sess_multibatch")
            .filter(F.col("session_end") < F.lit(wm))
            .select("user_id", "session_start", "n_events")
            .collect(),
        )
    )
    expected = sorted(
        map(
            tuple,
            sessionize_batch(ev)
            .withColumn(
                "session_end_w",
                F.col("session_end") + F.expr("INTERVAL 30 MINUTES"),
            )
            .filter(F.col("session_end_w") < F.lit(wm))
            .select("user_id", "session_start", "n_events")
            .collect(),
        )
    )
    assert len(expected) > 50
    assert got == expected


def test_dedup_within_watermark_drops_cross_batch_replays(spark, tmp_path):
    """A replay that arrives in a LATER micro-batch (still inside the
    watermark horizon) must be dropped — the dedup state has to carry
    across batches, not just within one."""
    import os

    base = (
        batch_events(spark, SF)
        .limit(50)
        .select("event_id", "ts", "user_id", "event_type", "value")
    )
    replays = base.withColumn("ts", F.col("ts") + F.expr("INTERVAL 5 MINUTES"))
    src = str(tmp_path / "dup_parts")
    os.makedirs(src)
    for i, part in enumerate((base, replays)):
        part_dir = str(tmp_path / f"dpart_{i}")
        part.coalesce(1).write.parquet(part_dir)
        pq = [f for f in os.listdir(part_dir) if f.endswith(".parquet")][0]
        dst = os.path.join(src, f"{i:04d}.parquet")
        os.rename(os.path.join(part_dir, pq), dst)
        os.utime(dst, (1_700_000_000 + i * 10, 1_700_000_000 + i * 10))

    stream = (
        spark.readStream.schema(base.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        dedup_events(stream, watermark="1 hour")
        .writeStream.format("memory")
        .queryName("dedup_xbatch")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql(
        "SELECT COUNT(*) AS n, COUNT(DISTINCT event_id) AS nd FROM dedup_xbatch"
    ).collect()[0]
    assert out.n == out.nd == 50


def test_rocksdb_state_store_backend_equivalent(spark, tmp_path):
    """The stateful dedup produces identical results on the RocksDB
    state-store provider — the bounded-memory backend a production
    cluster runs (state spills to local disk instead of executor
    heap). Backend choice must be a pure operational knob, never a
    semantics change."""
    from pyspark.sql import functions as F

    from marketing_etl_analytics_spark.streaming.events_stream import (
        dedup_events,
        read_events_stream,
    )

    sf_dir = "/root/testdata/sf0.001"
    prev = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider",
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        q = (
            dedup_events(read_events_stream(spark, sf_dir))
            .writeStream.format("memory")
            .queryName("rocks_dedup")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    finally:
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
    got = spark.table("rocks_dedup")
    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    assert got.count() == batch.select("event_id").distinct().count()
    assert got.select(F.countDistinct("event_id")).collect()[0][0] == got.count()
