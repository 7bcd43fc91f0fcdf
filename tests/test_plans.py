"""Physical-plan audits: the scale discipline, asserted.

Correctness tests prove the answers are right; these prove the plans
are the ones we'd want on a 1000-executor cluster reading 100 TB:
small dims broadcast (no shuffle of the fact side), filters reach the
parquet scan (PushedFilters), projections prune columns (ReadSchema),
hot paths stay in whole-stage codegen, and nothing degenerates into a
cartesian product.
"""

from __future__ import annotations

import contextlib
import io

import pytest

from marketing_etl_analytics_spark.suite import SUITE

SF_DIR = "/root/testdata/sf0.001"


def plan_of(spark, name: str) -> str:
    df = SUITE[name].fn(spark, SF_DIR)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_dim_joins_broadcast_not_shuffle(spark):
    """Fact⋈dim joins must broadcast the dim — a SortMergeJoin here
    would shuffle the full fact table on the join key."""
    for name in ("q1_top_sellers", "q2_top_profit", "q3_margin_having"):
        plan = plan_of(spark, name)
        assert "BroadcastHashJoin" in plan, name
        assert "SortMergeJoin" not in plan, name


def test_filter_pushed_to_parquet_scan(spark):
    """A filtered scan must reach the parquet reader as PushedFilters,
    not run as a post-scan Filter over all rows."""
    plan = plan_of(spark, "rel_window_frames")
    assert "PushedFilters" in plan
    assert "LessThan(o_custkey,100)" in plan.replace(" ", "")


def test_column_pruning_reaches_scan(spark):
    """q1 touches 3 of lineitem's 16 columns; the scan schema must not
    read the rest (l_comment is the big one)."""
    plan = plan_of(spark, "q1_top_sellers")
    scan_lines = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert scan_lines
    for line in scan_lines:
        assert "l_comment" not in line
        assert "l_shipinstruct" not in line


def test_hot_paths_in_wholestage_codegen(spark):
    """AQE only materializes codegen stages at execution time, so run
    the query and assert the *final* adaptive plan has WholeStageCodegen
    spans (the '*(n)' stage markers)."""
    for name in ("q0_pnl_summary", "ext_dedup_minhash_lsh", "ext_text_quality"):
        df = SUITE[name].fn(spark, SF_DIR)
        df.collect()
        final_plan = df._jdf.queryExecution().executedPlan().toString()
        assert "WholeStageCodegen" in final_plan or "*(" in final_plan, (
            name,
            final_plan[:800],
        )


def test_no_cartesian_products(spark):
    """Cross joins are only ever against broadcast-sized relations
    (1-row totals, centroid tables) — never a partitioned cartesian."""
    for name in sorted(SUITE):
        plan = plan_of(spark, name)
        assert "CartesianProduct" not in plan, name


def test_range_join_broadcasts_small_side(spark):
    """The non-equi date-range join must be a BroadcastNestedLoopJoin
    on the tiny windows relation, not a cartesian shuffle."""
    plan = plan_of(spark, "rel_range_join")
    assert "BroadcastNestedLoopJoin" in plan


def test_topk_is_take_ordered_not_full_sort(spark):
    """ORDER BY + LIMIT must plan TakeOrderedAndProject (per-partition
    top-k + merge), not a global Sort followed by Limit."""
    plan = plan_of(spark, "q1_top_sellers")
    assert "TakeOrderedAndProject" in plan
