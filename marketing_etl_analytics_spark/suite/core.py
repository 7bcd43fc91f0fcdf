"""Core analytics queries (reference analytics_queries.sql Q0-Q11),
mapped onto the driver testdata per FIXTURES.md §4."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from marketing_etl_analytics_spark.suite.common import (
    SQL_COST,
    SQL_REVENUE,
    cost_expr,
    dsum,
    lsum,
    money,
    ratio,
    revenue_expr,
    sql_dsum,
    sql_lsum,
    sql_ratio,
    t,
)
from marketing_etl_analytics_spark.suite.registry import register


# --- Q0: P&L summary — scalar aggregate (SURVEY §2.D D5/D8;
#     reference analytics_queries.sql:12-18) -------------------------------

@register(
    "q0_pnl_summary",
    f"""
    SELECT
      {sql_dsum(SQL_REVENUE, "total_revenue")},
      {sql_dsum(SQL_COST, "total_cost")},
      {sql_dsum(f"({SQL_REVENUE}) - ({SQL_COST})", "gross_profit")},
      {sql_lsum("l_quantity", "total_units")},
      CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS total_orders,
      {sql_ratio(f"(SUM(({SQL_REVENUE}) - ({SQL_COST}))) * 100", f"SUM({SQL_REVENUE})", 4, "gross_margin_pct")}
    FROM lineitem
    """,
    doc="Whole-table P&L: ratio-of-sums margin (analytics_queries.sql:12-18).",
)
def q0_pnl_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    rev, cst = revenue_expr(), cost_expr()
    return li.agg(
        dsum(rev).alias("total_revenue"),
        dsum(cst).alias("total_cost"),
        dsum(rev - cst).alias("gross_profit"),
        lsum("l_quantity").alias("total_units"),
        F.countDistinct("l_orderkey").alias("total_orders"),
        ratio(F.sum(rev - cst) * 100, F.sum(rev), 4).alias("gross_margin_pct"),
    )


# --- Q1: top-5 best sellers — fact⋈dim, groupBy, top-k
#     (SURVEY §2 C1/D1/F2; analytics_queries.sql:26-35) ---------------------

@register(
    "q1_top_sellers",
    f"""
    SELECT p.p_partkey, p.p_name,
      {sql_lsum("l.l_quantity", "total_units_sold")},
      CAST(COUNT(DISTINCT l.l_orderkey) AS BIGINT) AS order_cnt,
      {sql_dsum("CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(8,4)))", "total_revenue")}
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_partkey, p.p_name
    ORDER BY total_units_sold DESC, p.p_partkey
    LIMIT 5
    """,
    doc="Broadcast dim join + hash agg + TakeOrderedAndProject top-k.",
)
def q1_top_sellers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_partkey", "p_name")
        .agg(
            lsum("l_quantity").alias("total_units_sold"),
            F.countDistinct("l_orderkey").alias("order_cnt"),
            dsum(revenue_expr()).alias("total_revenue"),
        )
        .orderBy(F.desc("total_units_sold"), F.asc("p_partkey"))
        .limit(5)
    )
