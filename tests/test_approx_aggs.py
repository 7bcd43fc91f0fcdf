"""Approximate aggregates — the interactive path at 100 TB.

Exact COUNT(DISTINCT) and percentile require a full shuffle-and-sort
of the key set; the HLL / KLL-sketch versions are single-pass,
mergeable, and bounded-memory. Not oracle-gated (approximation is
engine-specific by definition) — asserted against the exact values
within the documented error bounds.
"""

from __future__ import annotations

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.01"


def test_approx_count_distinct_within_rsd(spark):
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    exact = o.select(F.countDistinct("o_custkey")).collect()[0][0]
    approx = o.select(F.approx_count_distinct("o_custkey", rsd=0.02)).collect()[0][0]
    assert abs(approx - exact) / exact < 0.08  # 4x the 2% rsd, generous


def test_approx_percentile_close_to_exact(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    q = F.col("l_quantity").cast("double")
    exact = li.select(F.percentile(q, F.lit(0.5))).collect()[0][0]
    approx = li.select(F.percentile_approx(q, F.lit(0.5), F.lit(1000))).collect()[0][0]
    assert abs(approx - exact) <= 1.0  # quantity is 1..50 integers


def test_hll_sketch_mergeable(spark):
    """hll_sketch_agg partial sketches union to the same estimate —
    the property that makes pre-aggregated distinct counts possible."""
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    merged = (
        o.groupBy(F.year(F.to_date("o_orderdate")).alias("yr"))
        .agg(F.hll_sketch_agg("o_custkey").alias("sk"))
        .agg(F.hll_union_agg("sk").alias("all_sk"))
        .select(F.hll_sketch_estimate("all_sk"))
        .collect()[0][0]
    )
    exact = o.select(F.countDistinct("o_custkey")).collect()[0][0]
    assert abs(merged - exact) / exact < 0.05
