"""KPI view-layer suite entries (``etl_script/04_views.sql``) on testdata.

The two "facts" both derive from ``events`` so their (date, user)
composite keys genuinely overlap partially — exercising the
partial-agg -> FULL OUTER -> COALESCE grain alignment with matched,
sales-only, and spend-only keys, exactly like the reference's
fact_sales/fact_spend pair:

- sales fact analog: 'purchase' events (revenue = value, cost = 0.6x)
- spend fact analog: 'click'/'view' events (spend = value,
  clicks/impressions = event counts)
- dim_campaigns analog: customer.c_mktsegment via user_id -> c_custkey
- dim_date analog: distinct *purchase* dates (the reference builds
  dim_date only from transactions — SURVEY.md §7.3.5)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from marketing_etl_analytics_spark.suite.common import memo_df, money, ratio, sql_ratio, t
from marketing_etl_analytics_spark.suite.registry import register

# Shared CTE prefix for the oracle side.
SQL_MERGED = """
WITH fs_agg AS (
  SELECT CAST(ts AS DATE) AS date_key, user_id,
         SUM(CAST(value AS DECIMAL(18,2))) AS revenue,
         SUM(CAST(value AS DECIMAL(18,2)) * CAST(0.6 AS DECIMAL(8,4))) AS cost,
         CAST(COUNT(*) AS BIGINT) AS orders
  FROM events WHERE event_type = 'purchase'
  GROUP BY 1, 2
),
sp_agg AS (
  SELECT CAST(ts AS DATE) AS date_key, user_id,
         SUM(CAST(value AS DECIMAL(18,2))) AS spend,
         CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS clicks,
         CAST(COUNT(*) AS BIGINT) AS impressions
  FROM events WHERE event_type IN ('click', 'view')
  GROUP BY 1, 2
),
merged AS (
  SELECT COALESCE(fs.date_key, sp.date_key) AS date_key,
         COALESCE(fs.user_id, sp.user_id) AS user_id,
         COALESCE(fs.revenue, 0) AS revenue,
         COALESCE(fs.cost, 0) AS cost,
         COALESCE(fs.orders, 0) AS orders,
         COALESCE(sp.spend, 0) AS spend,
         COALESCE(sp.clicks, 0) AS clicks,
         COALESCE(sp.impressions, 0) AS impressions
  FROM fs_agg fs
  FULL OUTER JOIN sp_agg sp
    ON fs.date_key = sp.date_key AND fs.user_id = sp.user_id
)
"""

SQL_KPIS = f"""
  CAST(ROUND(SUM(revenue), 2) AS DOUBLE) AS revenue,
  CAST(ROUND(SUM(cost), 2) AS DOUBLE) AS cost,
  CAST(ROUND(SUM(spend), 2) AS DOUBLE) AS spend,
  CAST(ROUND(SUM(revenue - cost), 2) AS DOUBLE) AS gross_profit,
  CAST(SUM(clicks) AS BIGINT) AS clicks,
  CAST(SUM(impressions) AS BIGINT) AS impressions,
  CAST(SUM(orders) AS BIGINT) AS orders,
  {sql_ratio("SUM(revenue)", "SUM(orders)", 4, "aov")},
  {sql_ratio("SUM(clicks)", "SUM(impressions)", 6, "ctr")},
  {sql_ratio("SUM(revenue)", "SUM(spend)", 4, "roas")},
  {sql_ratio("SUM(revenue) - SUM(cost)", "SUM(spend)", 4, "profit_roas")},
  {sql_ratio("SUM(revenue) - SUM(spend)", "SUM(spend)", 4, "roi")},
  {sql_ratio("SUM(revenue) - SUM(cost) - SUM(spend)", "SUM(spend)", 4, "profit_roi")}
"""


def merged_grain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fs_agg FULL OUTER sp_agg on (date, user), COALESCEd —
    the shared core of all three views (``04_views.sql:17-47``)."""
    return merged_from_events(t(spark, sf_dir, "events"))


def merged_from_events(ev: DataFrame) -> DataFrame:
    """merged_grain over an explicit events slice (the incremental
    refresh path aggregates disjoint time slices independently —
    (date, user) groups never span a date-boundary cutoff — and
    unions the resulting state additively)."""
    date_key = F.to_date("ts").alias("date_key")
    fs_agg = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(date_key, "user_id")
        .agg(
            F.sum(money("value")).alias("revenue"),
            F.sum(money("value") * F.lit(0.6).cast("decimal(8,4)")).alias("cost"),
            F.count(F.lit(1)).alias("orders"),
        )
    )
    sp_agg = (
        ev.filter(F.col("event_type").isin("click", "view"))
        .groupBy(date_key, "user_id")
        .agg(
            F.sum(money("value")).alias("spend"),
            F.count(F.when(F.col("event_type") == "click", 1)).alias("clicks"),
            F.count(F.lit(1)).alias("impressions"),
        )
    )
    joined = fs_agg.alias("fs").join(
        sp_agg.alias("sp"),
        (F.col("fs.date_key") == F.col("sp.date_key"))
        & (F.col("fs.user_id") == F.col("sp.user_id")),
        "full_outer",
    )
    zero = F.lit(0)
    return joined.select(
        F.coalesce("fs.date_key", "sp.date_key").alias("date_key"),
        F.coalesce("fs.user_id", "sp.user_id").alias("user_id"),
        F.coalesce("fs.revenue", zero).alias("revenue"),
        F.coalesce("fs.cost", zero).alias("cost"),
        F.coalesce("fs.orders", zero).alias("orders"),
        F.coalesce("sp.spend", zero).alias("spend"),
        F.coalesce("sp.clicks", zero).alias("clicks"),
        F.coalesce("sp.impressions", zero).alias("impressions"),
    )


def _kpi_agg(grouped) -> DataFrame:
    rev, cost, spend = F.sum("revenue"), F.sum("cost"), F.sum("spend")
    orders, clicks, impr = F.sum("orders"), F.sum("clicks"), F.sum("impressions")
    return grouped.agg(
        F.round(rev, 2).cast("double").alias("revenue"),
        F.round(cost, 2).cast("double").alias("cost"),
        F.round(spend, 2).cast("double").alias("spend"),
        F.round(F.sum(F.col("revenue") - F.col("cost")), 2).cast("double").alias("gross_profit"),
        clicks.cast("long").alias("clicks"),
        impr.cast("long").alias("impressions"),
        orders.cast("long").alias("orders"),
        ratio(rev, orders, 4).alias("aov"),
        ratio(clicks, impr, 6).alias("ctr"),
        ratio(rev, spend, 4).alias("roas"),
        ratio(rev - cost, spend, 4).alias("profit_roas"),
        ratio(rev - spend, spend, 4).alias("roi"),
        ratio(rev - cost - spend, spend, 4).alias("profit_roi"),
    )


SQL_V_CHANNEL_DAILY = (
    SQL_MERGED
    + """
    , dim_date AS (
      SELECT DISTINCT CAST(ts AS DATE) AS date_key FROM events
      WHERE event_type = 'purchase'
    )
    SELECT m.date_key AS date, c.c_mktsegment AS channel,
      CAST(ROUND(SUM(m.revenue), 2) AS DOUBLE) AS revenue,
      CAST(ROUND(SUM(m.cost), 2) AS DOUBLE) AS cost,
      CAST(ROUND(SUM(m.spend), 2) AS DOUBLE) AS spend,
      CAST(SUM(m.clicks) AS BIGINT) AS clicks,
      CAST(SUM(m.impressions) AS BIGINT) AS impressions,
      """ + sql_ratio("SUM(m.clicks)", "SUM(m.impressions)", 6, "ctr") + """,
      CAST(SUM(m.orders) AS BIGINT) AS orders
    FROM merged m
    LEFT JOIN customer c ON m.user_id = c.c_custkey
    JOIN dim_date d ON m.date_key = d.date_key
    GROUP BY m.date_key, c.c_mktsegment
    """
)


@register(
    "v_channel_daily",
    SQL_V_CHANNEL_DAILY,
    doc="mv_channel_daily analog: full-outer grain alignment + LEFT dim "
    "join + INNER dim_date join (drops spend-only dates) -> daily grain.",
)
def v_channel_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = merged_grain(spark, sf_dir)
    cust = t(spark, sf_dir, "customer").select(
        F.col("c_custkey"), F.col("c_mktsegment").alias("channel")
    )
    dim_date = (
        t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(F.to_date("ts").alias("dd"))
        .distinct()
    )
    return (
        m.join(F.broadcast(cust), m.user_id == cust.c_custkey, "left")
        .join(F.broadcast(dim_date), m.date_key == F.col("dd"), "inner")
        .groupBy(F.col("date_key").alias("date"), "channel")
        .agg(
            F.round(F.sum("revenue"), 2).cast("double").alias("revenue"),
            F.round(F.sum("cost"), 2).cast("double").alias("cost"),
            F.round(F.sum("spend"), 2).cast("double").alias("spend"),
            F.sum("clicks").cast("long").alias("clicks"),
            F.sum("impressions").cast("long").alias("impressions"),
            ratio(F.sum("clicks"), F.sum("impressions"), 6).alias("ctr"),
            F.sum("orders").cast("long").alias("orders"),
        )
    )


@register(
    "v_kpi_channel",
    SQL_MERGED
    + f"""
    SELECT c.c_mktsegment AS channel, {SQL_KPIS}
    FROM merged m
    LEFT JOIN customer c ON m.user_id = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
    doc="mv_kpi_channel analog: merged grain -> channel grain with the "
    "full ratio-of-sums KPI block (aov/ctr/roas/profit_roas/roi/profit_roi).",
)
def v_kpi_channel(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = merged_grain(spark, sf_dir)
    cust = t(spark, sf_dir, "customer").select(
        F.col("c_custkey"), F.col("c_mktsegment").alias("channel")
    )
    joined = m.join(F.broadcast(cust), m.user_id == cust.c_custkey, "left")
    return _kpi_agg(joined.groupBy("channel"))


@register(
    "v_kpi_campaign",
    SQL_MERGED
    + f"""
    SELECT m.user_id AS campaign_key, {SQL_KPIS}
    FROM merged m
    GROUP BY m.user_id
    """,
    doc="mv_kpi_campaign analog: same KPI block at the finer "
    "campaign (user) grain.",
)
def v_kpi_campaign(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = merged_grain(spark, sf_dir)
    return _kpi_agg(m.groupBy(F.col("user_id").alias("campaign_key")))


# --- incremental MV maintenance, graded --------------------------------------

@register(
    "v_channel_daily_incremental",
    SQL_V_CHANNEL_DAILY,
    doc="Incremental maintenance of v_channel_daily AS A GRADED ENTRY "
    "(the engine's views.py::incremental_refresh_* path on the "
    "testdata analog): the merged (date, user) grain is built from "
    "the historical slice as persisted state, the last 5 days arrive "
    "as a delta slice, and the view is served from state UNION delta "
    "without reprocessing base events — sound because slices cut on "
    "a date boundary, so no (date, user) group spans them, and every "
    "measure is an exact-decimal additive sum. The oracle is the "
    "plain FULL-REBUILD view SQL, so the driver grades incremental "
    "== full exactly. At cluster scale the base state is the stored "
    "MV; per-refresh cost is O(delta) + final regroup of state rows "
    "(date x user grain, orders of magnitude below raw events).",
)
def v_channel_daily_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    # deterministic date-boundary cutoff relative to the data: the
    # last 5 calendar days are "new" (broadcast 1-row bound, no
    # driver-side collect)
    bounds = ev.agg(F.date_add(F.max(F.to_date("ts")), -4).alias("cut"))
    ev_b = ev.crossJoin(F.broadcast(bounds))
    # the base state IS the persisted MV — materialized once per
    # corpus version (suite.common.memo_df), exactly like production;
    # the per-refresh cost below is delta-apply + final regroup only
    base = memo_df(
        spark,
        sf_dir,
        "channel_daily_base_state",
        lambda: merged_from_events(ev_b.filter(F.to_date("ts") < F.col("cut"))),
    )
    delta = merged_from_events(ev_b.filter(F.to_date("ts") >= F.col("cut")))
    state = base.unionAll(delta)
    cust = t(spark, sf_dir, "customer").select(
        F.col("c_custkey"), F.col("c_mktsegment").alias("channel")
    )
    # purchase dates recoverable from state itself (orders > 0), so
    # the dim_date filter never re-touches raw events either
    dim_date = (
        state.filter(F.col("orders") > 0).select(F.col("date_key").alias("dd")).distinct()
    )
    return (
        state.join(F.broadcast(cust), state.user_id == cust.c_custkey, "left")
        .join(F.broadcast(dim_date), state.date_key == F.col("dd"), "inner")
        .groupBy(F.col("date_key").alias("date"), "channel")
        .agg(
            F.round(F.sum("revenue"), 2).cast("double").alias("revenue"),
            F.round(F.sum("cost"), 2).cast("double").alias("cost"),
            F.round(F.sum("spend"), 2).cast("double").alias("spend"),
            F.sum("clicks").cast("long").alias("clicks"),
            F.sum("impressions").cast("long").alias("impressions"),
            ratio(F.sum("clicks"), F.sum("impressions"), 6).alias("ctr"),
            F.sum("orders").cast("long").alias("orders"),
        )
    )
