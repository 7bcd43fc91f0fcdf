"""Constraint validation — Spark's substitute for enforced PK/FK DDL.

The reference declares PRIMARY KEY / FOREIGN KEY constraints the
database enforces (`etl_script/01_schema.sql:92-95`,
`schema.sql:50-53,64-65`); Spark tables have no enforced constraints,
so the engine validates by computation (SURVEY.md §1.3). Each check
returns a DataFrame of violations (empty = constraint holds) so it
composes into pipelines and stays lazy/distributed — callers decide
whether to fail, quarantine, or log.

All checks are single-aggregation or semi/anti-join shaped: one
shuffle each, no collect of table-sized data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def key_violations(df: DataFrame, *key_cols: str) -> DataFrame:
    """Primary-key check: (key, count) rows where the key repeats."""
    return (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .filter(F.col("n_rows") > 1)
    )


def null_violations(df: DataFrame, *not_null_cols: str) -> DataFrame:
    """NOT NULL check: per-column null counts, only violating columns."""
    counts = df.agg(
        *[
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(c)
            for c in not_null_cols
        ]
    ).collect()[0]
    rows = [(c, int(counts[c])) for c in not_null_cols if counts[c]]
    spark = df.sparkSession
    return spark.createDataFrame(rows or [], "column string, n_nulls long")


def fk_violations(
    fact: DataFrame, fact_key: str, dim: DataFrame, dim_key: str
) -> DataFrame:
    """Foreign-key check: fact rows whose key has no dim match
    (left-anti join — the same shape the ON CONFLICT emulation uses)."""
    return fact.filter(F.col(fact_key).isNotNull()).join(
        dim, fact.__getattr__(fact_key) == dim.__getattr__(dim_key), "left_anti"
    )


def conservation_check(
    src: DataFrame, dst: DataFrame, src_expr, dst_expr
) -> DataFrame:
    """Quantity-conservation check through a transform (catches join
    fan-out / row loss): one row with both exact-decimal totals and
    their difference."""
    a = src.agg(F.sum(src_expr).alias("src_total"))
    b = dst.agg(F.sum(dst_expr).alias("dst_total"))
    return a.crossJoin(b).select(
        "src_total",
        "dst_total",
        (F.col("src_total") - F.col("dst_total")).alias("difference"),
    )
