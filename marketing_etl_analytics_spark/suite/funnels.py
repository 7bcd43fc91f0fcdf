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

from marketing_etl_analytics_spark.suite.common import (
    money,
    pround,
    ratio,
    sql_pround,
    sql_ratio,
    t,
)
from marketing_etl_analytics_spark.suite.registry import register


# --- strict-order conversion funnel -----------------------------------------

_SQL_FUNNEL = f"""
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
    """


def ext_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-order view→click→purchase funnel: running-min windows
    resolve 'after the first qualifying prior stage' in one shuffle
    on user_id; per-stage self-joins would shuffle three times and
    fan out on duplicate timestamps. Graded via the ext_funnel_cohort
    merged row (r5 consolidation)."""
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

_SQL_COHORT = f"""
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
    """


def ext_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: customers cohorted by first-order
    month, (cohort × month-offset) active counts and retention
    rates. The first-order frame is customer-grained and joins back
    broadcast-style; month arithmetic is integer (y*12+m), immune to
    calendar-function divergence. Graded via the ext_funnel_cohort
    merged row (r5 consolidation)."""
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


# --- merged funnel + cohort row (r5 consolidation) ---------------------------

@register(
    "ext_funnel_cohort",
    f"""
    SELECT 'funnel' AS kind, CAST(NULL AS VARCHAR) AS k1,
      CAST(NULL AS BIGINT) AS off,
      n_users AS c1, n_viewed AS c2, n_clicked_after_view AS c3,
      n_purchased_after_click AS c4,
      view_to_click AS r1, click_to_purchase AS r2
    FROM ({_SQL_FUNNEL}) f
    UNION ALL
    SELECT 'cohort', CAST(cohort_month AS VARCHAR), month_offset,
      n_active, cohort_size, CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
      retention, CAST(NULL AS DOUBLE)
    FROM ({_SQL_COHORT}) c
    ORDER BY kind, k1, off
    """,
    doc="Merged funnel + cohort-retention row (r5 consolidation of the "
    "two r3-green singles ext_funnel / ext_cohort_retention — the "
    "ext_sketch_suite precedent): the strict-order view→click→purchase "
    "funnel (running-min windows, one shuffle on user_id) and the "
    "(cohort × month-offset) retention matrix, union-tagged into one "
    "graded row. Both underlying operators stay independently callable "
    "(ext_funnel / ext_cohort_retention in this module).",
)
def ext_funnel_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    null_s = F.lit(None).cast("string")
    null_l = F.lit(None).cast("long")
    null_d = F.lit(None).cast("double")
    fu = ext_funnel(spark, sf_dir).select(
        F.lit("funnel").alias("kind"),
        null_s.alias("k1"),
        null_l.alias("off"),
        F.col("n_users").alias("c1"),
        F.col("n_viewed").alias("c2"),
        F.col("n_clicked_after_view").alias("c3"),
        F.col("n_purchased_after_click").alias("c4"),
        F.col("view_to_click").alias("r1"),
        F.col("click_to_purchase").alias("r2"),
    )
    co = ext_cohort_retention(spark, sf_dir).select(
        F.lit("cohort").alias("kind"),
        F.col("cohort_month").cast("string").alias("k1"),
        F.col("month_offset").alias("off"),
        F.col("n_active").alias("c1"),
        F.col("cohort_size").alias("c2"),
        null_l.alias("c3"),
        null_l.alias("c4"),
        F.col("retention").alias("r1"),
        null_d.alias("r2"),
    )
    return fu.unionAll(co).orderBy("kind", "k1", "off")


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


# --- multi-touch attribution -------------------------------------------------

# Touch lookback window before each conversion, and the day width used
# for the time-decay exponent. 7 days keeps the interval join's state
# bounded (same bound the streaming attribution join uses).
_ATTR_WINDOW_US = 7 * 86_400 * 1_000_000
_DAY_US = 86_400 * 1_000_000


@register(
    "ext_attribution_multitouch",
    f"""
    WITH purch AS (
      SELECT event_id AS p_id, user_id, epoch_us(ts) AS p_us, value
      FROM events WHERE event_type = 'purchase'
    ),
    touch AS (
      SELECT event_id AS t_id, user_id, epoch_us(ts) AS t_us, event_type AS touch_type
      FROM events WHERE event_type IN ('view', 'click', 'signup')
    ),
    j AS (
      SELECT p.p_id, p.value, t.t_id, t.t_us, t.touch_type,
        (p.p_us - t.t_us) // {_DAY_US} AS days_back
      FROM purch p JOIN touch t ON p.user_id = t.user_id
      WHERE t.t_us < p.p_us AND t.t_us >= p.p_us - {_ATTR_WINDOW_US}
    ),
    w AS (
      SELECT *,
        ROW_NUMBER() OVER (PARTITION BY p_id ORDER BY t_us, t_id) AS rn,
        COUNT(*) OVER (PARTITION BY p_id) AS n,
        POWER(0.5, days_back) AS wt,
        SUM(POWER(0.5, days_back)) OVER (PARTITION BY p_id) AS sum_wt
      FROM j
    ),
    credits AS (
      SELECT touch_type,
        {sql_pround("CAST(value AS DOUBLE) / n", 6)} AS c_linear,
        {sql_pround(
            "CAST(value AS DOUBLE) * (CASE WHEN n = 1 THEN 1.0"
            " WHEN n = 2 THEN 0.5"
            " WHEN rn = 1 OR rn = n THEN 0.4"
            " ELSE 0.2 / (n - 2) END)", 6)} AS c_position,
        {sql_pround("CAST(value AS DOUBLE) * wt / sum_wt", 6)} AS c_timedecay
      FROM w
    )
    SELECT touch_type,
      CAST(COUNT(*) AS BIGINT) AS n_touches,
      CAST(ROUND(SUM(CAST(c_linear AS DECIMAL(28,6))), 2) AS DOUBLE) AS credit_linear,
      CAST(ROUND(SUM(CAST(c_position AS DECIMAL(28,6))), 2) AS DOUBLE) AS credit_position,
      CAST(ROUND(SUM(CAST(c_timedecay AS DECIMAL(28,6))), 2) AS DOUBLE) AS credit_timedecay
    FROM credits
    GROUP BY touch_type
    """,
    doc="Multi-touch attribution over the events stream: every "
    "purchase distributes its value across the user's view/click/"
    "signup touches in the prior 7 days under three models — linear "
    "(equal split), U-shaped position (40/20/40; 100 for a single "
    "touch, 50/50 for two), and time-decay (half-life of one day: "
    "weight 2^-days_back, normalized per conversion). One bounded "
    "interval join on user_id (the batch twin of the streaming "
    "attribution join's watermark state), one window pass on the "
    "conversion key, one final aggregation. Determinism: decay "
    "weights are exact powers of two (their sums are exact in "
    "binary, hence order-free); per-touch credits are portably "
    "rounded to 6 dp then summed in the decimal domain.",
)
def ext_attribution_multitouch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    purch = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        "user_id",
        F.unix_micros("ts").alias("p_us"),
        "value",
    )
    touch = ev.filter(F.col("event_type").isin("view", "click", "signup")).select(
        F.col("event_id").alias("t_id"),
        "user_id",
        F.unix_micros("ts").alias("t_us"),
        F.col("event_type").alias("touch_type"),
    )
    j = (
        purch.join(touch, "user_id")
        .filter(
            (F.col("t_us") < F.col("p_us"))
            & (F.col("t_us") >= F.col("p_us") - F.lit(_ATTR_WINDOW_US))
        )
        .select(
            "p_id", "value", "t_id", "t_us", "touch_type",
            F.expr(f"(p_us - t_us) div {_DAY_US}").alias("days_back"),
        )
    )
    by_p = Window.partitionBy("p_id")
    w = j.select(
        "*",
        F.row_number().over(by_p.orderBy("t_us", "t_id")).alias("rn"),
        F.count(F.lit(1)).over(by_p).alias("n"),
        F.pow(F.lit(0.5), F.col("days_back")).alias("wt"),
        F.sum(F.pow(F.lit(0.5), F.col("days_back"))).over(by_p).alias("sum_wt"),
    )
    v = F.col("value").cast("double")
    pos_w = (
        F.when(F.col("n") == 1, F.lit(1.0))
        .when(F.col("n") == 2, F.lit(0.5))
        .when((F.col("rn") == 1) | (F.col("rn") == F.col("n")), F.lit(0.4))
        .otherwise(F.lit(0.2) / (F.col("n") - 2))
    )
    credits = w.select(
        "touch_type",
        pround(v / F.col("n"), 6).alias("c_linear"),
        pround(v * pos_w, 6).alias("c_position"),
        pround(v * F.col("wt") / F.col("sum_wt"), 6).alias("c_timedecay"),
    )

    def dsum6(c: str, alias: str):
        return (
            F.round(F.sum(F.col(c).cast("decimal(28,6)")), 2)
            .cast("double")
            .alias(alias)
        )

    return credits.groupBy("touch_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_touches"),
        dsum6("c_linear", "credit_linear"),
        dsum6("c_position", "credit_position"),
        dsum6("c_timedecay", "credit_timedecay"),
    )
