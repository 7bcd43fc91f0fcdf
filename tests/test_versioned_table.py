"""Versioned parquet table (sources/acid.py): incremental MERGE with
snapshot isolation, copy-on-write file granularity, time travel,
optimistic-concurrency conflict detection, vacuum."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from marketing_etl_analytics_spark.sources import acid


def _df(spark, pairs):
    return spark.createDataFrame(pairs, "k long, v string")


@pytest.fixture()
def table(spark, tmp_path):
    path = str(tmp_path / "tbl")
    initial = _df(spark, [(k, f"a{k}") for k in range(100)]).repartitionByRange(
        4, "k"
    )
    acid.create(spark, path, initial)
    return path


def test_two_incremental_merges_roundtrip(spark, table):
    # merge 1: update 95..99, insert 100..104
    acid.merge(
        spark, table, _df(spark, [(k, f"b{k}") for k in range(95, 105)]), ["k"]
    )
    # merge 2: update 0..4 again
    acid.merge(
        spark, table, _df(spark, [(k, f"c{k}") for k in range(5)]), ["k"]
    )
    got = {r.k: r.v for r in acid.read(spark, table).collect()}
    assert len(got) == 105
    assert got[0] == "c0" and got[4] == "c4"
    assert got[97] == "b97" and got[104] == "b104"
    assert got[50] == "a50"
    assert acid.history(table) == [1, 2, 3]


def test_merge_is_copy_on_write(spark, table):
    m1 = acid.read_manifest(table, 1)
    # range-partitioned initial files: low keys live in few files
    acid.merge(spark, table, _df(spark, [(k, f"u{k}") for k in range(5)]), ["k"])
    m2 = acid.read_manifest(table, 2)
    carried = set(m1.files) & set(m2.files)
    rewritten = set(m1.files) - set(m2.files)
    assert carried, "untouched files must carry over by reference"
    assert rewritten, "files holding matched keys must be rewritten"
    assert len(rewritten) < len(m1.files)


def test_snapshot_isolation_and_time_travel(spark, table):
    before = acid.read(spark, table)  # pinned to version 1's files
    acid.merge(spark, table, _df(spark, [(0, "NEW")]), ["k"])
    # the pre-merge handle still reads the old snapshot
    assert {r.v for r in before.filter("k = 0").collect()} == {"a0"}
    assert {
        r.v for r in acid.read(spark, table).filter("k = 0").collect()
    } == {"NEW"}
    assert {
        r.v for r in acid.read(spark, table, version=1).filter("k = 0").collect()
    } == {"a0"}


def test_concurrent_writer_conflict(spark, table):
    # another writer commits version 2 first
    os.makedirs(acid._versions_dir(table), exist_ok=True)
    with open(acid._manifest_path(table, 2), "x") as f:
        f.write("{}")
    with pytest.raises(acid.ConcurrentWriteError):
        acid.merge(spark, table, _df(spark, [(0, "x")]), ["k"])


def test_delete_where_copy_on_write(spark, table):
    m1 = acid.read_manifest(table, 1)
    acid.delete_where(spark, table, "k < 10")
    assert acid.read(spark, table).count() == 90
    assert acid.read(spark, table).filter("k < 10").count() == 0
    m2 = acid.read_manifest(table, 2)
    assert set(m1.files) & set(m2.files), "untouched files carry over"


def test_delete_where_keeps_null_predicate_rows(spark, tmp_path):
    path = str(tmp_path / "nulls")
    df = spark.createDataFrame(
        [(1, None), (2, 10.0), (3, 2.0)], "k long, v double"
    )
    acid.create(spark, path, df)
    acid.delete_where(spark, path, "v > 5")
    # SQL DELETE semantics: the NULL-predicate row survives
    assert {r.k for r in acid.read(spark, path).collect()} == {1, 3}


def test_vacuum_drops_unreachable_files(spark, table):
    acid.merge(spark, table, _df(spark, [(k, "z") for k in range(100)]), ["k"])
    v1_files = set(acid.read_manifest(table, 1).files)
    removed = acid.vacuum(table, keep_last=1)
    # every v1-only file is gone, current snapshot intact
    assert v1_files <= set(removed) | set(acid.read_manifest(table, 2).files)
    assert acid.read(spark, table).count() == 100
    assert acid.history(table) == [2]
    for f in removed:
        assert not os.path.exists(f)


def test_merge_normalizes_source_column_order(spark, table):
    shuffled = spark.createDataFrame([("zz", 300)], "v string, k long")
    acid.merge(spark, table, shuffled, ["k"])
    got = {r.k: r.v for r in acid.read(spark, table).collect()}
    assert got[300] == "zz" and got[0] == "a0"


def test_insert_only_merge_carries_all_files(spark, table):
    m1 = acid.read_manifest(table, 1)
    acid.merge(
        spark, table, _df(spark, [(k, f"n{k}") for k in range(200, 210)]), ["k"]
    )
    m2 = acid.read_manifest(table, 2)
    assert set(m1.files) <= set(m2.files)
    assert acid.read(spark, table).count() == 110


def test_changes_feed_tags_insert_update_delete(spark, table):
    acid.merge(
        spark, table, _df(spark, [(0, "UPD"), (500, "NEW")]), ["k"]
    )  # v2: update k=0, insert k=500
    acid.delete_where(spark, table, "k = 1")  # v3
    got = {
        (r._change_type, r.k): r.v
        for r in acid.changes(spark, table, 1, 3, ["k"]).collect()
    }
    assert got == {("update", 0): "UPD", ("insert", 500): "NEW", ("delete", 1): "a1"}


def test_changes_feed_ignores_rewritten_but_unchanged_rows(spark, table):
    # k=0 shares a data file with other low keys; rewriting that file
    # must not report its unchanged neighbors as changes
    acid.merge(spark, table, _df(spark, [(0, "UPD")]), ["k"])
    rows = acid.changes(spark, table, 1, 2, ["k"]).collect()
    assert [(r._change_type, r.k, r.v) for r in rows] == [("update", 0, "UPD")]


def test_changes_feed_reads_only_touched_files(spark, table):
    m1, _ = acid.read_manifest(table, 1), acid.merge(
        spark, table, _df(spark, [(0, "UPD")]), ["k"]
    )
    m2 = acid.read_manifest(table, 2)
    # the diff inputs: files removed from v1 + files added by v2
    touched = (set(m1.files) - set(m2.files)) | (set(m2.files) - set(m1.files))
    assert len(touched) < len(set(m1.files) | set(m2.files)), (
        "carried-over files must stay out of the CDC diff"
    )


def test_compact_produces_empty_change_feed(spark, table):
    acid.compact(spark, table, target_files=2)
    assert acid.changes(spark, table, 1, 2, ["k"]).count() == 0


def test_merge_schema_evolution_appends_column(spark, table):
    src = spark.createDataFrame(
        [(0, "UPD", 1.5), (600, "NEW", 2.5)], "k long, v string, score double"
    )
    with pytest.raises(Exception):
        acid.merge(spark, table, src, ["k"])  # strict mode still errors
    v = acid.merge(spark, table, src, ["k"], schema_evolution=True)
    cur = acid.read(spark, table)
    assert cur.columns == ["k", "v", "score"]
    got = {r.k: (r.v, r.score) for r in cur.collect()}
    assert got[0] == ("UPD", 1.5) and got[600] == ("NEW", 2.5)
    assert got[50] == ("a50", None), "old rows read NULL for the appended column"
    # time travel to v1 keeps the original schema
    assert acid.read(spark, table, version=1).columns == ["k", "v"]
    # a later plain merge uses the evolved schema (missing col -> NULL? no:
    # strict mode requires all columns; evolution fills source gaps)
    acid.merge(
        spark,
        table,
        spark.createDataFrame([(700, "X")], "k long, v string"),
        ["k"],
        schema_evolution=True,
    )
    got = {r.k: (r.v, r.score) for r in acid.read(spark, table).collect()}
    assert got[700] == ("X", None)
    assert v == 2


def test_restore_rolls_back_as_new_commit(spark, table):
    v1_rows = sorted(map(tuple, acid.read(spark, table).collect()))
    acid.merge(spark, table, _df(spark, [(0, "CHANGED"), (200, "new")]), ["k"])
    assert sorted(map(tuple, acid.read(spark, table).collect())) != v1_rows

    v = acid.restore(table, 1)
    assert v == 3  # rollback is itself a commit, not history rewriting
    assert acid.current_version(table) == 3
    assert sorted(map(tuple, acid.read(spark, table).collect())) == v1_rows
    # the pre-restore state stays time-travelable
    assert sorted(map(tuple, acid.read(spark, table, version=2).collect())) != v1_rows
    assert acid.history(table) == [1, 2, 3]


def test_restore_survives_vacuum_of_target(spark, table):
    """After restoring v1 and vacuuming down to the last versions, the
    restored commit still reads: its manifest re-references v1's files,
    which vacuum must therefore retain."""
    v1_rows = sorted(map(tuple, acid.read(spark, table).collect()))
    acid.merge(spark, table, _df(spark, [(0, "CHANGED")]), ["k"])
    acid.restore(table, 1)
    acid.vacuum(table, keep_last=1)
    assert sorted(map(tuple, acid.read(spark, table).collect())) == v1_rows


def test_changes_feed_across_restore_shows_rollback(spark, table):
    """The CDC feed across a restore must describe the rollback itself:
    reading changes(pre_restore -> restored) yields the inverse of the
    rolled-back merge (the changed row back at its old value, the
    inserted row deleted)."""
    acid.merge(spark, table, _df(spark, [(0, "CHANGED"), (200, "new")]), ["k"])
    v_restore = acid.restore(table, 1)
    feed = {
        (r.k, r._change_type): r.v
        for r in acid.changes(spark, table, 2, v_restore, ["k"]).collect()
    }
    assert feed.get((0, "update")) == "a0"  # back to the v1 value
    assert (200, "delete") in feed
    assert not any(k == 1 for k, _ in feed)  # untouched rows stay silent
