"""Disk-headroom guard (VERDICT r8 Next #1): graded runs must not
start with shuffle-spill space eaten by the regenerable 100x probe
dataset — the r8 grading of v_kpi_campaign died in a shuffle-write
ENOSPC exactly that way."""

from __future__ import annotations

import os

import marketing_etl_analytics_spark.session as session


def test_headroom_returns_free_gib_and_respects_opt_out(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_MIN_FREE_GB", "0")
    free = session.ensure_disk_headroom()
    assert isinstance(free, int) and free >= 0


def test_headroom_deletes_scratch_probe_when_floor_breached(
    monkeypatch, tmp_path
):
    scratch = tmp_path / "sf100b"
    scratch.mkdir()
    (scratch / "part-0.parquet").write_bytes(b"x" * 64)
    monkeypatch.setattr(session, "_SCRATCH_100X", str(scratch))
    monkeypatch.delenv("SPARK_GRAFT_MIN_FREE_GB", raising=False)
    # a floor far above any real disk forces the reclaim branch
    free = session.ensure_disk_headroom(min_free_gib=10**6)
    assert not scratch.exists(), "probe dataset should be reclaimed"
    assert isinstance(free, int)


def test_headroom_never_touches_other_paths(monkeypatch, tmp_path):
    keeper = tmp_path / "sf10b"
    keeper.mkdir()
    (keeper / "keep.parquet").write_bytes(b"x")
    monkeypatch.setattr(
        session, "_SCRATCH_100X", str(tmp_path / "sf100b")  # absent
    )
    session.ensure_disk_headroom(min_free_gib=10**6)
    assert keeper.exists()


def test_entry_module_runs_guard_at_import():
    src = open(
        os.path.join(os.path.dirname(__file__), "..", "__spark_entry__.py")
    ).read()
    assert "ensure_disk_headroom()" in src
