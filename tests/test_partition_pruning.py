"""Partitioned-parquet layout: the index substitute, proven.

The reference's B-tree on fact_sales(date_id) (`schema.sql:68`) makes
date-filtered queries cheap; our substitute is hive-partitioned
storage (SURVEY.md §4). This test writes a fact partitioned by year
and asserts a year-filtered read PRUNES partitions at plan time —
scanning 1/Nth of the data — rather than filtering post-scan.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from marketing_etl_analytics_spark.sources.sinks import write_partitioned_parquet

SF_DIR = "/root/testdata/sf0.001"


def test_year_filter_prunes_partitions(spark, tmp_path):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").withColumn(
        "o_year", F.year(F.to_date("o_orderdate"))
    )
    out = str(tmp_path / "orders_by_year")
    write_partitioned_parquet(orders, out, ["o_year"])

    back = spark.read.parquet(out)
    filtered = back.filter(F.col("o_year") == 1995)

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        filtered.explain("formatted")
    plan = buf.getvalue()
    # the filter must appear as a PartitionFilters entry on the scan,
    # i.e. resolved against directory metadata, not row data
    assert "PartitionFilters" in plan
    assert "o_year" in plan.split("PartitionFilters", 1)[1].splitlines()[0]

    # and the pruned read returns exactly the 1995 rows
    expect = orders.filter(F.col("o_year") == 1995).count()
    assert filtered.count() == expect and expect > 0


def test_compact_parquet_reduces_files(spark, tmp_path):
    from marketing_etl_analytics_spark.sources.sinks import compact_parquet

    src = spark.range(10_000).withColumn("v", F.col("id") * 2)
    out = str(tmp_path / "fragmented")
    src.repartition(64).write.parquet(out)  # 64 tiny files
    import glob

    assert len(glob.glob(f"{out}/part-*.parquet")) == 64
    compact_parquet(spark, out, target_files=4)
    assert len(glob.glob(f"{out}/part-*.parquet")) == 4
    back = spark.read.parquet(out)
    assert back.count() == 10_000
    assert back.agg(F.sum("v")).collect()[0][0] == sum(2 * i for i in range(10_000))
