"""Unit tests for the stateful sessionizer's batch handler.

Drives ``_sessionize_user`` directly with a fake GroupState, covering
the paths a streaming run rarely exercises deterministically: empty
non-timeout batches (must re-arm the timeout, not crash on
``np.add.reduceat`` of an empty array) and in-watermark out-of-order
batches that predate the stored session end (must merge via min/max,
never regress session boundaries).
"""

from __future__ import annotations

import pandas as pd
import pytest

from marketing_etl_analytics_spark.streaming.events_stream import (
    SESSION_GAP_US,
    _sessionize_user,
)

US = 1_000_000


class FakeState:
    def __init__(self, value=None, timed_out=False, watermark_ms=0):
        self._v = value
        self.hasTimedOut = timed_out
        self._wm = watermark_ms
        self.removed = False
        self.timeout_ts = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        if self._v is None:
            raise ValueError("no state")
        return self._v

    def update(self, v):
        self._v = v

    def remove(self):
        self._v = None
        self.removed = True

    def getCurrentWatermarkMs(self):
        return self._wm

    def setTimeoutTimestamp(self, ts):
        self.timeout_ts = ts


def _batch(ts_us, values=None):
    values = values or [1.0] * len(ts_us)
    return pd.DataFrame(
        {"ts": pd.to_datetime(pd.Series(ts_us), unit="us"), "value": values}
    )


def _run(state, *batches):
    return list(_sessionize_user((7,), iter(batches), state))


def test_empty_batch_rearms_timeout_and_keeps_state():
    state = FakeState(value=(0, 100 * US, 3, 5.0))
    out = _run(state, _batch([]))
    assert out == []
    assert state.exists and state.get == (0, 100 * US, 3, 5.0)
    # timeout re-armed past (last + gap) and past the watermark
    assert state.timeout_ts == max(
        (100 * US + SESSION_GAP_US) // 1000, state.getCurrentWatermarkMs() + 1
    )


def test_empty_batch_without_state_is_noop():
    state = FakeState()
    assert _run(state, _batch([])) == []
    assert not state.exists and state.timeout_ts is None


def test_out_of_order_batch_does_not_regress_session_end():
    # open session [0, 1000s]; a late in-watermark batch lands at 400s
    state = FakeState(value=(0, 1000 * US, 2, 2.0))
    out = _run(state, _batch([400 * US]))
    assert out == []
    start, last, n, val = state.get
    assert (start, last) == (0, 1000 * US)  # end NOT regressed to 400s
    assert (n, val) == (3, 3.0)


def test_out_of_order_batch_can_extend_session_start_backwards():
    # events arrive that predate the stored start but are in-gap
    state = FakeState(value=(500 * US, 600 * US, 1, 1.0))
    _run(state, _batch([300 * US, 650 * US]))
    start, last, n, val = state.get
    assert start == 300 * US and last == 650 * US and n == 3


def test_late_batch_fully_before_open_session_stays_separate():
    # open session 12:00-12:10; a late batch lands entirely earlier,
    # with its own internal gap: [10:30] and [11:20]. Neither is
    # in-gap with the open session (40+ min away), so two closed
    # sessions emit and the open one is untouched.
    h12, m10 = 12 * 3600 * US, 10 * 60 * US
    state = FakeState(value=(h12, h12 + m10, 2, 2.0))
    out = _run(
        state, _batch([10 * 3600 * US + 30 * 60 * US, 11 * 3600 * US + 20 * 60 * US])
    )
    assert len(out) == 1 and len(out[0]) == 2  # both late segments closed
    assert list(out[0]["n_events"]) == [1, 1]
    start, last, n, _ = state.get
    assert (start, last, n) == (h12, h12 + m10, 2)  # open session intact


def test_late_straddling_batch_merges_across_state():
    # late events on both sides of the stored session, all in-gap:
    # one merged open session spanning them
    state = FakeState(value=(1000 * US, 1100 * US, 1, 1.0))
    _run(state, _batch([900 * US, 1200 * US]))
    start, last, n, _ = state.get
    assert (start, last, n) == (900 * US, 1200 * US, 3)


def test_gap_split_emits_closed_sessions():
    state = FakeState()
    out = _run(state, _batch([0, 10 * US, SESSION_GAP_US + 20 * US]))
    assert len(out) == 1 and len(out[0]) == 1
    row = out[0].iloc[0]
    assert row["n_events"] == 2  # first session closed
    start, last, n, _ = state.get  # second stays open in state
    assert start == SESSION_GAP_US + 20 * US and n == 1


def test_timeout_flushes_open_session():
    state = FakeState(value=(0, 50 * US, 4, 8.0), timed_out=True)
    out = _run(state)
    assert state.removed
    assert len(out) == 1
    row = out[0].iloc[0]
    assert row["n_events"] == 4 and row["total_value"] == pytest.approx(8.0)


def test_session_window_boundary_is_inclusive(spark):
    """An event at exactly last_ts + gap MERGES into the session:
    Spark's session_window end bound is inclusive (verified here, not
    assumed from the docs). This pins the strict > rule the
    ext_session_window_native oracle uses — the same rule as the
    gaps-and-islands twin."""
    import datetime as dt

    from pyspark.sql import functions as F

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, t0),
        (1, t0 + dt.timedelta(minutes=30)),       # == gap -> merges
        (1, t0 + dt.timedelta(minutes=90)),       # > gap after prev -> new
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = (
        df.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select("w.start", "n")
        .orderBy("start")
        .collect()
    )
    assert [(r.start, r.n) for r in got] == [
        (t0, 2),
        (t0 + dt.timedelta(minutes=90), 1),
    ]
