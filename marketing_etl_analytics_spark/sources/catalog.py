"""Testdata catalog: load the driver's synthetic parquet tables.

The driver generates TPC-H-ish tables (TESTDATA.md) at
``/root/testdata/sf{0.001,0.01,0.1}``. These are the inputs for the
correctness suite (``marketing_etl_analytics_spark.suite``) and bench.

Loading is plain ``spark.read.parquet`` — schema travels with the file,
predicate pushdown and column pruning come for free from the parquet
data source (SURVEY.md §4).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_testdata(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TESTDATA_TABLES
) -> dict[str, DataFrame]:
    """Load each parquet table under ``sf_dir`` as a lazy DataFrame."""
    return {
        name: spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        for name in tables
    }


def register_testdata_views(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TESTDATA_TABLES
) -> dict[str, DataFrame]:
    """Load testdata and register each table as a temp view (for spark.sql)."""
    dfs = load_testdata(spark, sf_dir, tables)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
