"""Marketing-analytics extensions: funnel, cohort retention, RFM.

The reference's published analyses stop at per-query KPIs (retention
rate in `analytics_queries.sql:217-230`, frequency segments at
:276-319). The three canonical next asks of any marketing warehouse —
a conversion FUNNEL with ordering semantics, a COHORT retention
matrix, and RFM segmentation — are added here as first-class entries:

- ``ext_funnel``: strict-order view→click→purchase funnel over the
  events stream. Ordering is resolved with per-user running windows
  (one shuffle on user_id), not per-stage self-joins (which would be
  three shuffles and a fan-out hazard): each event sees the earliest
  prior qualifying timestamp of the previous stage via a running
  ``min`` window, so "click after first view" and "purchase after
  first qualifying click" are plain column predicates.
- ``ext_cohort_retention``: customers cohorted by first-order month;
  the (cohort, month-offset) activity matrix with retention rates.
  Two aggregations (first-order per customer, then matrix) — the
  cohort frame is customer-grained, bounded, and broadcast back.
- ``ext_rfm``: per-customer recency/frequency/monetary quintiles via
  ``ntile(5)`` with full deterministic ordering (metric, custkey) and
  the classic segment labels. Monetary sums use exact decimals so the
  quintile ORDER BY is engine-independent (a double sum's value
  depends on add order — unacceptable under a rank boundary).
  Scale note: an unpartitioned ``ntile`` is a global sort whose window
  pass lands on one task — exact and fine to ~10^7 customers; beyond
  that, swap the ntile for bucketing against broadcast
  ``approxQuantile`` boundaries (the ZORDER bucketizer's approach,
  ``sources/acid.py::_zorder_value``) and keep the same downstream
  labels. The exact form is kept here because the oracle contract
  needs exact quintile boundaries.

All three are SQL-expressible; DuckDB oracles verify them exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from marketing_etl_analytics_spark.suite.common import money, ratio, sql_ratio, t
from marketing_etl_analytics_spark.suite.registry import register


# --- strict-order conversion funnel -----------------------------------------

@register(
    "ext_funnel",
    f"""
    WITH ordered AS (
      SELECT user_id, event_id, ts, event_type,
        MIN(CASE WHEN event_type = 'view' THEN ts END) OVER (
          PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        ) AS first_view_ts
      FROM events
    ),
    staged AS (
      SELECT user_id, event_id, ts, event_type, first_view_ts,
        MIN(CASE WHEN event_type = 'click' AND first_view_ts IS NOT NULL
                 THEN ts END) OVER (
          PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        ) AS first_qual_click_ts
      FROM ordered
    ),
    per_user AS (
      SELECT user_id,
        MAX(CASE WHEN first_view_ts IS NOT NULL THEN 1 ELSE 0 END) AS viewed,
        MAX(CASE WHEN first_qual_click_ts IS NOT NULL THEN 1 ELSE 0 END) AS clicked,
        MAX(CASE WHEN event_type = 'purchase'
                 AND first_qual_click_ts IS NOT NULL THEN 1 ELSE 0 END) AS purchased
      FROM staged GROUP BY user_id
    )
    SELECT
      CAST(COUNT(*) AS BIGINT) AS n_users,
      CAST(SUM(viewed) AS BIGINT) AS n_viewed,
      CAST(SUM(clicked) AS BIGINT) AS n_clicked_after_view,
      CAST(SUM(purchased) AS BIGINT) AS n_purchased_after_click,
      {sql_ratio("SUM(clicked)", "SUM(viewed)", 4, "view_to_click")},
      {sql_ratio("SUM(purchased)", "SUM(clicked)", 4, "click_to_purchase")}
    FROM per_user
    """,
    doc="Strict-order view→click→purchase funnel: running-min windows "
    "resolve 'after the first qualifying prior stage' in one shuffle "
    "on user_id; per-stage self-joins would shuffle three times and "
    "fan out on duplicate timestamps.",
)
def ext_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ordered = ev.select(
        "user_id", "event_id", "ts", "event_type",
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
        .alias("first_view_ts"),
    )
    staged = ordered.select(
        "user_id", "event_type",
        F.min(
            F.when(
                (F.col("event_type") == "click")
                & F.col("first_view_ts").isNotNull(),
                F.col("ts"),
            )
        ).over(w).alias("first_qual_click_ts"),
        "first_view_ts",
    )
    per_user = staged.groupBy("user_id").agg(
        F.max(F.col("first_view_ts").isNotNull().cast("int")).alias("viewed"),
        F.max(F.col("first_qual_click_ts").isNotNull().cast("int")).alias("clicked"),
        F.max(
            (
                (F.col("event_type") == "purchase")
                & F.col("first_qual_click_ts").isNotNull()
            ).cast("int")
        ).alias("purchased"),
    )
    return per_user.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("viewed").cast("long").alias("n_viewed"),
        F.sum("clicked").cast("long").alias("n_clicked_after_view"),
        F.sum("purchased").cast("long").alias("n_purchased_after_click"),
        ratio(F.sum("clicked"), F.sum("viewed"), 4).alias("view_to_click"),
        ratio(F.sum("purchased"), F.sum("clicked"), 4).alias("click_to_purchase"),
    )


# --- cohort retention matrix ------------------------------------------------

_COHORT_MAX_OFFSET = 11

@register(
    "ext_cohort_retention",
    f"""
    WITH firsts AS (
      SELECT o_custkey, MIN(o_orderdate) AS first_dt
      FROM orders GROUP BY o_custkey
    ),
    activity AS (
      SELECT DISTINCT o.o_custkey,
        (EXTRACT(YEAR FROM f.first_dt) * 12 + EXTRACT(MONTH FROM f.first_dt)) AS cm,
        (EXTRACT(YEAR FROM o.o_orderdate) * 12 + EXTRACT(MONTH FROM o.o_orderdate))
          - (EXTRACT(YEAR FROM f.first_dt) * 12 + EXTRACT(MONTH FROM f.first_dt))
          AS month_offset
      FROM orders o JOIN firsts f ON f.o_custkey = o.o_custkey
    ),
    sizes AS (
      SELECT cm, CAST(COUNT(*) AS BIGINT) AS cohort_size
      FROM activity WHERE month_offset = 0 GROUP BY cm
    ),
    cells AS (
      SELECT cm, month_offset, CAST(COUNT(*) AS BIGINT) AS n_active
      FROM activity WHERE month_offset <= {_COHORT_MAX_OFFSET}
      GROUP BY cm, month_offset
    )
    SELECT
      CAST(make_date(CAST((c.cm - 1) // 12 AS INT), CAST((c.cm - 1) % 12 + 1 AS INT), 1) AS DATE)
        AS cohort_month,
      CAST(c.month_offset AS BIGINT) AS month_offset,
      c.n_active, s.cohort_size,
      {sql_ratio("c.n_active", "s.cohort_size", 4, "retention")}
    FROM cells c JOIN sizes s ON s.cm = c.cm
    ORDER BY cohort_month, month_offset
    """,
    doc="Cohort retention matrix: customers cohorted by first-order "
    "month, (cohort × month-offset) active counts and retention "
    "rates. The first-order frame is customer-grained and joins back "
    "broadcast-style; month arithmetic is integer (y*12+m), immune to "
    "calendar-function divergence.",
)
def ext_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    firsts = o.groupBy("o_custkey").agg(F.min("o_orderdate").alias("first_dt"))
    ym = lambda c: F.year(c) * 12 + F.month(c)  # noqa: E731
    activity = (
        o.join(firsts, "o_custkey")
        .select(
            "o_custkey",
            ym(F.col("first_dt")).alias("cm"),
            (ym(F.col("o_orderdate")) - ym(F.col("first_dt"))).alias("month_offset"),
        )
        .distinct()
    )
    sizes = (
        activity.filter(F.col("month_offset") == 0)
        .groupBy("cm")
        .agg(F.count(F.lit(1)).cast("long").alias("cohort_size"))
    )
    cells = (
        activity.filter(F.col("month_offset") <= _COHORT_MAX_OFFSET)
        .groupBy("cm", "month_offset")
        .agg(F.count(F.lit(1)).cast("long").alias("n_active"))
    )
    cohort_month = F.make_date(
        ((F.col("cm") - 1) / 12).cast("int"),
        ((F.col("cm") - 1) % 12 + 1).cast("int"),
        F.lit(1),
    )
    return (
        cells.join(F.broadcast(sizes), "cm")
        .select(
            cohort_month.alias("cohort_month"),
            F.col("month_offset").cast("long"),
            "n_active",
            "cohort_size",
            ratio(F.col("n_active"), F.col("cohort_size"), 4).alias("retention"),
        )
        .orderBy("cohort_month", "month_offset")
    )


# --- RFM segmentation --------------------------------------------------------

@register(
    "ext_rfm",
    """
    WITH anchor AS (SELECT MAX(o_orderdate) AS mx FROM orders),
    base AS (
      SELECT o_custkey,
        CAST(date_diff('day', MAX(o_orderdate), (SELECT mx FROM anchor)) AS BIGINT)
          AS recency_days,
        CAST(COUNT(*) AS BIGINT) AS frequency,
        CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
          AS monetary
      FROM orders GROUP BY o_custkey
    ),
    scored AS (
      SELECT o_custkey, recency_days, frequency, monetary,
        ntile(5) OVER (ORDER BY recency_days DESC, o_custkey) AS r_score,
        ntile(5) OVER (ORDER BY frequency ASC, o_custkey) AS f_score,
        ntile(5) OVER (ORDER BY monetary ASC, o_custkey) AS m_score
      FROM base
    )
    SELECT o_custkey, recency_days, frequency, monetary,
      CAST(r_score AS INT) AS r_score,
      CAST(f_score AS INT) AS f_score,
      CAST(m_score AS INT) AS m_score,
      CASE
        WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4 THEN 'champion'
        WHEN r_score >= 3 AND f_score >= 3 THEN 'loyal'
        WHEN r_score >= 4 THEN 'recent'
        WHEN f_score >= 4 OR m_score >= 4 THEN 'at_risk_valuable'
        ELSE 'hibernating'
      END AS segment
    FROM scored
    ORDER BY o_custkey
    """,
    doc="RFM segmentation: per-customer recency/frequency/monetary "
    "quintiles (ntile(5) with full deterministic ordering — ties "
    "broken on custkey, monetary summed in exact decimal so the rank "
    "ORDER BY is engine-independent) and classic segment labels. "
    "Higher score = better on every axis.",
)
def ext_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    base = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_dt"),
        F.count(F.lit(1)).cast("long").alias("frequency"),
        F.round(F.sum(money("o_totalprice")), 2).cast("double").alias("monetary"),
    )
    anchor = o.agg(F.max("o_orderdate").alias("mx"))
    base = base.crossJoin(F.broadcast(anchor)).select(
        "o_custkey",
        F.datediff(F.col("mx").cast("date"), F.col("last_dt").cast("date"))
        .cast("long")
        .alias("recency_days"),
        "frequency",
        "monetary",
    )
    r = F.ntile(5).over(Window.orderBy(F.desc("recency_days"), "o_custkey"))
    f = F.ntile(5).over(Window.orderBy(F.asc("frequency"), "o_custkey"))
    m = F.ntile(5).over(Window.orderBy(F.asc("monetary"), "o_custkey"))
    scored = base.select(
        "o_custkey", "recency_days", "frequency", "monetary",
        r.alias("r_score"), f.alias("f_score"), m.alias("m_score"),
    )
    seg = (
        F.when(
            (F.col("r_score") >= 4) & (F.col("f_score") >= 4) & (F.col("m_score") >= 4),
            "champion",
        )
        .when((F.col("r_score") >= 3) & (F.col("f_score") >= 3), "loyal")
        .when(F.col("r_score") >= 4, "recent")
        .when((F.col("f_score") >= 4) | (F.col("m_score") >= 4), "at_risk_valuable")
        .otherwise("hibernating")
    )
    return scored.select(
        "o_custkey", "recency_days", "frequency", "monetary",
        F.col("r_score").cast("int"),
        F.col("f_score").cast("int"),
        F.col("m_score").cast("int"),
        seg.alias("segment"),
    ).orderBy("o_custkey")
