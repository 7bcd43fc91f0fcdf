"""Core analytics queries (reference analytics_queries.sql Q0-Q11),
mapped onto the driver testdata per FIXTURES.md §4."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from marketing_etl_analytics_spark.suite.common import (
    SQL_COST,
    SQL_REVENUE,
    cost_expr,
    dsum,
    lsum,
    avg_det,
    avg_det_raw,
    money,
    pround,
    ratio,
    revenue_expr,
    sql_avg_det,
    sql_avg_det_raw,
    sql_dsum,
    sql_lsum,
    sql_pround,
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
    # Split the naive mixed distinct+sum aggregate (caught by the
    # 1000x sweep at 1153 s, BASELINE.md r7): that spelling plans an
    # Expand x2 of the whole fact table — 1.2 B decimal-payload rows
    # through one shuffle. The sums need NO row shuffle at all (a
    # global aggregate partial-aggregates per partition and merges
    # 256 one-row states), and only COUNT(DISTINCT l_orderkey) needs
    # one — over the pruned 8-byte key column, map-side-deduped. The
    # two 1-row frames combine via the C6 broadcast cross join.
    sums = li.agg(
        dsum(rev).alias("total_revenue"),
        dsum(cst).alias("total_cost"),
        dsum(rev - cst).alias("gross_profit"),
        lsum("l_quantity").alias("total_units"),
        ratio(F.sum(rev - cst) * 100, F.sum(rev), 4).alias("gross_margin_pct"),
    )
    orders = li.agg(F.countDistinct("l_orderkey").alias("total_orders"))
    return sums.crossJoin(F.broadcast(orders)).select(
        "total_revenue", "total_cost", "gross_profit", "total_units",
        "total_orders", "gross_margin_pct",
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
    doc="Fact pre-agg, dim join, TakeOrderedAndProject top-k.",
)
def q1_top_sellers(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Aggregate the fact BEFORE the dim join (the D6 discipline): the
    # shuffle then carries one int key per lineitem row instead of
    # part-name strings, and the join sees |part| rows, not |lineitem|.
    # The join strategy is left to the optimizer — auto-broadcast under
    # the 64 MB threshold, SMJ once the dim outgrows it. (The previous
    # join-then-agg body FORCED a broadcast of part; at sf100b that is
    # a 20 M-row / ~2 GB build side, and the wide post-join shuffle made
    # the query superlinear: 857 s at 100x the sf1 data vs 13-108x for
    # its batch peers. Caught by the 1000x sweep, BASELINE.md r7.)
    #
    # r8 rework of the exact-distinct branch (VERDICT r7 #4): the mixed
    # distinct+sum aggregate made Spark's single-distinct rewrite carry
    # the decimal partial sums THROUGH the (l_partkey, l_orderkey) pair
    # shuffle — ~60 B/row x ~600 M irreducibly-distinct pairs at sf100b
    # was the heap/spill cliff (228x wall for 100x data vs q2's 120x).
    # Splitting the aggregate (the q0 precedent, per-group here) makes
    # the pair shuffle carry BARE 16-byte (partkey, orderkey) keys and
    # gives the sums branch full map-side combine (|part|-sized shuffle
    # instead of pair-sized). The two pk-keyed aggregates join without
    # an extra exchange (both hash-partitioned on the group key).
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    sums = li.groupBy("l_partkey").agg(
        lsum("l_quantity").alias("total_units_sold"),
        dsum(revenue_expr()).alias("total_revenue"),
    )
    orders = li.groupBy("l_partkey").agg(
        F.countDistinct("l_orderkey").alias("order_cnt")
    )
    per_part = sums.join(orders, "l_partkey")
    return (
        per_part.join(part, per_part.l_partkey == part.p_partkey)
        .select(
            "p_partkey", "p_name", "total_units_sold", "order_cnt",
            "total_revenue",
        )
        .orderBy(F.desc("total_units_sold"), F.asc("p_partkey"))
        .limit(5)
    )


# --- Q2: top-5 profit products — group key superset of select list
#     (analytics_queries.sql:38-46) ----------------------------------------

@register(
    "q2_top_profit",
    f"""
    SELECT p.p_name, p.p_brand,
      {sql_dsum(f"({SQL_REVENUE}) - ({SQL_COST})", "total_profit")}
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_partkey, p.p_name, p.p_brand
    ORDER BY total_profit DESC, p.p_name, p.p_brand
    LIMIT 5
    """,
    doc="GROUP BY includes product key not present in the select list.",
)
def q2_top_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Fact pre-agg before the dim join (same sf100b-driven rework as
    # q1_top_sellers; p_partkey determines p_name/p_brand, so grouping
    # by the fact-side key is equivalent).
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    per_part = li.groupBy("l_partkey").agg(
        dsum(revenue_expr() - cost_expr()).alias("total_profit")
    )
    return (
        per_part.join(part, per_part.l_partkey == part.p_partkey)
        .select("p_name", "p_brand", "total_profit")
        .orderBy(F.desc("total_profit"), "p_name", "p_brand")
        .limit(5)
    )


# --- Q3: top-5 margin products — HAVING + ratio-of-sums margin
#     (analytics_queries.sql:49-62) ----------------------------------------

@register(
    "q3_margin_having",
    f"""
    SELECT p.p_partkey, p.p_name,
      {sql_dsum(SQL_REVENUE, "total_revenue")},
      {sql_dsum(SQL_COST, "total_cost")},
      {sql_ratio(f"(SUM({SQL_REVENUE}) - SUM({SQL_COST})) * 100", f"SUM({SQL_REVENUE})", 2, "profit_margin_pct")}
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_partkey, p.p_name
    HAVING SUM({SQL_REVENUE}) > 100000
    ORDER BY profit_margin_pct DESC, p.p_partkey
    LIMIT 5
    """,
    doc="HAVING on aggregate + ratio-of-sums margin pct (B6/D8).",
)
def q3_margin_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Fact pre-agg before the dim join (same sf100b-driven rework as
    # q1_top_sellers) — the HAVING filter also applies BEFORE the join,
    # so only qualifying part keys reach it at all.
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    rev, cst = revenue_expr(), cost_expr()
    per_part = (
        li.groupBy("l_partkey")
        .agg(
            dsum(rev).alias("total_revenue"),
            dsum(cst).alias("total_cost"),
            ratio((F.sum(rev) - F.sum(cst)) * 100, F.sum(rev), 2).alias("profit_margin_pct"),
            F.sum(rev).alias("__rev_exact"),
        )
        .filter(F.col("__rev_exact") > 100000)
        .drop("__rev_exact")
    )
    return (
        per_part.join(part, per_part.l_partkey == part.p_partkey)
        .select(
            "p_partkey", "p_name", "total_revenue", "total_cost",
            "profit_margin_pct",
        )
        .orderBy(F.desc("profit_margin_pct"), "p_partkey")
        .limit(5)
    )


# --- Q4: channel KPIs over orders (analytics_queries.sql:68-89) -------------

@register(
    "q4_channel_kpis",
    f"""
    SELECT o_orderpriority AS channel,
      CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS revenue,
      CAST(COUNT(*) AS BIGINT) AS orders,
      {sql_ratio("SUM(CAST(o_totalprice AS DECIMAL(18,2)))", "COUNT(*)", 2, "aov")}
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY revenue DESC
    """,
    doc="Ratio-of-sums KPI (AOV) at channel grain (D8).",
)
def q4_channel_kpis(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    rev = F.sum(money("o_totalprice"))
    return (
        o.groupBy(F.col("o_orderpriority").alias("channel"))
        .agg(
            F.round(rev, 2).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("orders"),
            ratio(rev, F.count(F.lit(1)), 2).alias("aov"),
        )
        .orderBy(F.desc("revenue"))
    )


# --- Q5: repeat purchase drivers — first-event self-join + FILTER counts
#     (analytics_queries.sql:95-120) ----------------------------------------

@register(
    "q5_repeat_drivers",
    f"""
    WITH sales AS (
      SELECT o.o_custkey AS customer_id, l.l_partkey AS product_id,
             CAST(o.o_orderdate AS DATE) AS d
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    first_product AS (
      SELECT customer_id, product_id, MIN(d) AS first_date
      FROM sales GROUP BY customer_id, product_id
    ),
    flagged AS (
      SELECT s.customer_id, s.product_id,
             CASE WHEN s.d > fp.first_date THEN 1 ELSE 0 END AS is_repeat
      FROM sales s
      JOIN first_product fp USING (customer_id, product_id)
    )
    SELECT p.p_name,
      {sql_lsum("f.is_repeat", "repeat_buyers")},
      CAST(COUNT(*) AS BIGINT) AS total_buyers,
      {sql_ratio("SUM(f.is_repeat)", "COUNT(*)", 3, "repeat_rate")}
    FROM flagged f JOIN part p ON f.product_id = p.p_partkey
    GROUP BY p.p_name
    ORDER BY repeat_rate DESC, p.p_name
    LIMIT 10
    """,
    doc="First-purchase CTE self-join (C7) + FILTER-count repeat rate (B7).",
)
def q5_repeat_drivers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    part = t(spark, sf_dir, "part")
    sales = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.col("o_custkey").alias("customer_id"),
        F.col("l_partkey").alias("product_id"),
        F.to_date("o_orderdate").alias("d"),
    )
    # first-purchase date via a MIN window over the same key the old
    # first_product CTE grouped by (guide §2.4): one exchange of the
    # sales rows instead of groupBy + join-back, which planned the
    # lineitem⋈orders subtree twice and shuffled it twice. MIN over
    # the full partition = the CTE's MIN per (customer, product);
    # row multiplicity unchanged (window, not join).
    wfirst = Window.partitionBy("customer_id", "product_id")
    flagged = sales.select(
        "product_id",
        F.when(F.col("d") > F.min("d").over(wfirst), 1)
        .otherwise(0)
        .alias("is_repeat"),
    )
    rep, tot = F.sum("is_repeat"), F.count(F.lit(1))
    return (
        flagged.join(F.broadcast(part), flagged.product_id == part.p_partkey)
        .groupBy("p_name")
        .agg(
            rep.cast("long").alias("repeat_buyers"),
            tot.alias("total_buyers"),
            ratio(rep, tot, 3).alias("repeat_rate"),
        )
        .orderBy(F.desc("repeat_rate"), "p_name")
        .limit(10)
    )


# --- Q6: category winners & losers — AVG-of-ratio margin + loyalty
#     (analytics_queries.sql:126-156) ----------------------------------------

@register(
    "q6_category_performance",
    f"""
    WITH enriched AS (
      SELECT o.o_custkey AS customer_id, p.p_type AS category,
             {SQL_REVENUE} AS revenue, {SQL_COST} AS cost
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN part p ON l.l_partkey = p.p_partkey
    ),
    loyalty AS (
      SELECT customer_id, COUNT(*) AS purchase_count
      FROM enriched GROUP BY customer_id
    ),
    cat_loyalty AS (
      SELECT e.category,
             CAST(COUNT(*) FILTER (WHERE cl.purchase_count > 1) AS BIGINT) AS repeat_customers,
             CAST(COUNT(*) AS BIGINT) AS total_customers
      FROM enriched e JOIN loyalty cl USING (customer_id)
      GROUP BY e.category
    )
    SELECT e.category,
      {sql_dsum("e.revenue", "revenue")},
      {sql_dsum("e.revenue - e.cost", "profit")},
      {sql_avg_det("CAST(e.revenue - e.cost AS DOUBLE) / NULLIF(CAST(e.revenue AS DOUBLE), 0)", 3)} AS avg_margin,
      cl.repeat_customers, cl.total_customers,
      {sql_ratio("cl.repeat_customers", "cl.total_customers", 3, "loyalty_rate")}
    FROM enriched e JOIN cat_loyalty cl USING (category)
    GROUP BY e.category, cl.repeat_customers, cl.total_customers
    ORDER BY revenue DESC
    """,
    doc="AVG-of-row-ratio margin (D7, != ratio of sums) + loyalty CTEs (C3).",
)
def q6_category_performance(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    part = t(spark, sf_dir, "part")
    enriched = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select(
            F.col("o_custkey").alias("customer_id"),
            F.col("p_type").alias("category"),
            revenue_expr().alias("revenue"),
            cost_expr().alias("cost"),
        )
    )
    # One pass over the enriched fact: purchase_count is a
    # per-customer COUNT of enriched itself, so a count window over
    # the customer partition attaches it to every row in ONE exchange
    # — the r9 rework of the previous groupBy+join-back shape, which
    # planned the three-table join subtree TWICE (loyalty branch +
    # main branch) and paid a second customer_id exchange for the
    # join (guide §2.4: an aggregate keyed like a window shares its
    # shuffle). Row multiplicity is unchanged (window, not join), so
    # the money aggregates, AVG-of-ratio margin, and fan-out loyalty
    # counts are value-identical.
    wcust = Window.partitionBy("customer_id")
    return (
        enriched.withColumn("purchase_count", F.count(F.lit(1)).over(wcust))
        .groupBy("category")
        .agg(
            dsum(F.col("revenue")).alias("revenue"),
            dsum(F.col("revenue") - F.col("cost")).alias("profit"),
            avg_det(
                (F.col("revenue").cast("double") - F.col("cost").cast("double"))
                / F.nullif(F.col("revenue").cast("double"), F.lit(0.0)),
                3,
            ).alias("avg_margin"),
            F.count(F.when(F.col("purchase_count") > 1, 1)).alias("repeat_customers"),
            F.count(F.lit(1)).alias("total_customers"),
        )
        .select(
            "category", "revenue", "profit", "avg_margin",
            "repeat_customers", "total_customers",
            ratio(F.col("repeat_customers"), F.col("total_customers"), 3).alias("loyalty_rate"),
        )
        .orderBy(F.desc("revenue"))
    )


# --- Q7: hero/free-rider quadrant — agg-of-agg + cross join + CASE
#     (analytics_queries.sql:162-190) ----------------------------------------

@register(
    "q7_product_quadrant",
    f"""
    WITH product_profit AS (
      SELECT p.p_partkey AS product_id, p.p_name AS item_name,
             {sql_lsum("l.l_quantity", "units_sold")},
             {sql_dsum(SQL_REVENUE, "revenue")},
             {sql_dsum(f"({SQL_REVENUE}) - ({SQL_COST})", "profit")},
             {sql_avg_det(f"CAST(({SQL_REVENUE}) - ({SQL_COST}) AS DOUBLE) / NULLIF(CAST({SQL_REVENUE} AS DOUBLE), 0)", 3)} AS margin
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY p.p_partkey, p.p_name
    ),
    stats AS (
      SELECT AVG(CAST(units_sold AS DOUBLE)) AS avg_units,
             {sql_avg_det_raw("margin")} AS avg_margin
      FROM product_profit
    )
    SELECT pp.product_id, pp.item_name, pp.units_sold, pp.revenue, pp.profit, pp.margin,
      CASE
        WHEN pp.units_sold > s.avg_units AND pp.margin > s.avg_margin THEN 'HERO PRODUCT'
        WHEN pp.units_sold < s.avg_units AND pp.margin > s.avg_margin THEN 'High Potential'
        WHEN pp.units_sold > s.avg_units AND pp.margin < s.avg_margin THEN 'Volume Driver'
        ELSE 'Free Rider'
      END AS product_type
    FROM product_profit pp CROSS JOIN stats s
    ORDER BY pp.revenue DESC, pp.product_id
    """,
    doc="Aggregate-of-aggregate stats (D9) + 1-row cross join (C6) + "
    "CASE quadrant labels (B4).",
)
def q7_product_quadrant(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    rev, cst = revenue_expr(), cost_expr()
    product_profit = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.col("p_partkey").alias("product_id"), F.col("p_name").alias("item_name"))
        .agg(
            lsum("l_quantity").alias("units_sold"),
            dsum(rev).alias("revenue"),
            dsum(rev - cst).alias("profit"),
            avg_det(
                (rev.cast("double") - cst.cast("double"))
                / F.nullif(rev.cast("double"), F.lit(0.0)),
                3,
            ).alias("margin"),
        )
    )
    # The dim-grain aggregate is bounded (#products, not #facts), but it
    # feeds two consumers — the global stats row and the final quadrant
    # projection — and column pruning makes the two subtrees differ, so
    # Catalyst cannot ReuseExchange them and would scan+aggregate the
    # fact table twice. Materialize it once; at 100 TB this is the
    # difference between one fact scan and two.
    product_profit = product_profit.localCheckpoint(eager=True)
    stats = product_profit.agg(
        F.avg(F.col("units_sold").cast("double")).alias("avg_units"),
        avg_det_raw(F.col("margin")).alias("avg_margin"),
    )
    pp = product_profit.crossJoin(F.broadcast(stats))
    return pp.select(
        "product_id", "item_name", "units_sold", "revenue", "profit", "margin",
        F.when((F.col("units_sold") > F.col("avg_units")) & (F.col("margin") > F.col("avg_margin")), "HERO PRODUCT")
        .when((F.col("units_sold") < F.col("avg_units")) & (F.col("margin") > F.col("avg_margin")), "High Potential")
        .when((F.col("units_sold") > F.col("avg_units")) & (F.col("margin") < F.col("avg_margin")), "Volume Driver")
        .otherwise("Free Rider")
        .alias("product_type"),
    ).orderBy(F.desc("revenue"), "product_id")


# --- Q8: spend waste — many-to-many fan-out join + 3-conjunct HAVING
#     (analytics_queries.sql:196-211) ----------------------------------------

@register(
    "q8_spend_waste",
    """
    WITH spend_rows AS (
      SELECT CAST(ts AS DATE) AS d, user_id,
             CAST(value AS DECIMAL(18,2)) AS spend,
             CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_click
      FROM events WHERE event_type IN ('click', 'view')
    ),
    sales_rows AS (
      SELECT CAST(ts AS DATE) AS d, user_id,
             CAST(value AS DECIMAL(18,2)) AS revenue
      FROM events WHERE event_type = 'purchase'
    )
    SELECT sp.user_id AS campaign_key,
      CAST(ROUND(SUM(sp.spend), 2) AS DOUBLE) AS spend,
      CAST(SUM(sp.is_click) AS BIGINT) AS clicks,
      CAST(ROUND(SUM(fs.revenue), 2) AS DOUBLE) AS revenue
    FROM spend_rows sp
    LEFT JOIN sales_rows fs ON sp.d = fs.d AND sp.user_id = fs.user_id
    GROUP BY sp.user_id
    HAVING SUM(sp.spend) > 1500 AND SUM(sp.is_click) < 15
       AND SUM(fs.revenue) < 800
    ORDER BY spend DESC, campaign_key
    """,
    doc="Deliberate many-to-many fan-out before SUM (double-counting, "
    "C8) + 3-conjunct HAVING; NULL revenue sums drop via comparison.",
)
def q8_spend_waste(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    d = F.to_date("ts").alias("d")
    spend_rows = ev.filter(F.col("event_type").isin("click", "view")).select(
        d, "user_id", money("value").alias("spend"),
        F.when(F.col("event_type") == "click", 1).otherwise(0).alias("is_click"),
    )
    sales_rows = ev.filter(F.col("event_type") == "purchase").select(
        d, "user_id", money("value").alias("revenue")
    )
    joined = spend_rows.alias("sp").join(
        sales_rows.alias("fs"),
        (F.col("sp.d") == F.col("fs.d")) & (F.col("sp.user_id") == F.col("fs.user_id")),
        "left",
    )
    return (
        joined.groupBy(F.col("sp.user_id").alias("campaign_key"))
        .agg(
            F.round(F.sum("sp.spend"), 2).cast("double").alias("spend"),
            F.sum("sp.is_click").cast("long").alias("clicks"),
            F.round(F.sum("fs.revenue"), 2).cast("double").alias("revenue"),
            F.sum("sp.spend").alias("__spend_exact"),
            F.sum("fs.revenue").alias("__rev_exact"),
        )
        .filter(
            (F.col("__spend_exact") > 1500)
            & (F.col("clicks") < 15)
            & (F.col("__rev_exact") < 800)
        )
        .drop("__spend_exact", "__rev_exact")
        .orderBy(F.desc("spend"), "campaign_key")
    )


# --- Q9: retention rate — scalar FILTER aggregate (:217-230) -----------------

@register(
    "q9_retention",
    """
    WITH first_purchase AS (
      SELECT o_custkey, MIN(CAST(o_orderdate AS DATE)) AS first_date
      FROM orders GROUP BY o_custkey
    )
    SELECT
      CAST(COUNT(*) FILTER (WHERE CAST(o.o_orderdate AS DATE) > fp.first_date) AS BIGINT) AS returning_customers,
      CAST(COUNT(*) AS BIGINT) AS total_customers,
      """ + sql_ratio(
        "COUNT(*) FILTER (WHERE CAST(o.o_orderdate AS DATE) > fp.first_date)",
        "COUNT(*)", 3, "retention_rate",
    ) + """
    FROM orders o JOIN first_purchase fp ON o.o_custkey = fp.o_custkey
    """,
    doc="Retention: min-date self-join + FILTER count over all fact rows.",
)
def q9_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    first = o.groupBy("o_custkey").agg(
        F.min(F.to_date("o_orderdate")).alias("first_date")
    )
    joined = o.join(first, "o_custkey")
    returning = F.sum(
        F.when(F.to_date("o_orderdate") > F.col("first_date"), 1).otherwise(0)
    )
    total = F.count(F.lit(1))
    return joined.agg(
        returning.cast("long").alias("returning_customers"),
        total.alias("total_customers"),
        ratio(returning, total, 3).alias("retention_rate"),
    )


# --- Q10: demographic segmentation — banding + countDistinct + pct-of-total
#     (:236-272) --------------------------------------------------------------

@register(
    "q10_demographics",
    f"""
    WITH segments AS (
      SELECT c_custkey,
        CASE WHEN c_acctbal < 0 THEN 'Negative'
             WHEN c_acctbal BETWEEN 0 AND 2999.99 THEN 'Low'
             WHEN c_acctbal BETWEEN 3000 AND 6999.99 THEN 'Mid'
             ELSE 'High' END AS balance_band,
        c_mktsegment
      FROM customer
    ),
    segment_sales AS (
      SELECT s.balance_band, s.c_mktsegment AS segment,
        CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT) AS customers,
        SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS total_revenue_exact,
        CAST(COUNT(*) AS BIGINT) AS total_orders
      FROM orders o JOIN segments s ON o.o_custkey = s.c_custkey
      GROUP BY s.balance_band, s.c_mktsegment
    ),
    totals AS (
      SELECT SUM(customers) AS all_customers,
             SUM(total_revenue_exact) AS all_revenue
      FROM segment_sales
    )
    SELECT s.balance_band, s.segment, s.customers,
      CAST(ROUND(s.total_revenue_exact, 2) AS DOUBLE) AS total_revenue,
      s.total_orders,
      {sql_ratio("s.customers * 100", "t.all_customers", 2, "pct_customers")},
      {sql_ratio("s.total_revenue_exact * 100", "t.all_revenue", 2, "pct_revenue")}
    FROM segment_sales s CROSS JOIN totals t
    ORDER BY pct_revenue DESC, s.balance_band, s.segment
    """,
    doc="CASE banding (B4) + COUNT DISTINCT (D3) + cross-join totals "
    "pct-of-total (C6/D10).",
)
def q10_demographics(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    segments = cust.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "Negative")
        .when(F.col("c_acctbal").between(0, 2999.99), "Low")
        .when(F.col("c_acctbal").between(3000, 6999.99), "Mid")
        .otherwise("High")
        .alias("balance_band"),
        F.col("c_mktsegment").alias("segment"),
    )
    segment_sales = (
        o.join(F.broadcast(segments), o.o_custkey == segments.c_custkey)
        .groupBy("balance_band", "segment")
        .agg(
            F.countDistinct("o_custkey").alias("customers"),
            F.sum(money("o_totalprice")).alias("total_revenue_exact"),
            F.count(F.lit(1)).alias("total_orders"),
        )
    )
    totals = segment_sales.agg(
        F.sum("customers").alias("all_customers"),
        F.sum("total_revenue_exact").alias("all_revenue"),
    )
    return (
        segment_sales.crossJoin(F.broadcast(totals))
        .select(
            "balance_band", "segment", "customers",
            F.round(F.col("total_revenue_exact"), 2).cast("double").alias("total_revenue"),
            "total_orders",
            ratio(F.col("customers") * 100, F.col("all_customers"), 2).alias("pct_customers"),
            ratio(F.col("total_revenue_exact") * 100, F.col("all_revenue"), 2).alias("pct_revenue"),
        )
        .orderBy(F.desc("pct_revenue"), "balance_band", "segment")
    )


# --- Q11: frequency segmentation (:278-319) -----------------------------------

@register(
    "q11_frequency_segments",
    f"""
    WITH freq AS (
      SELECT o_custkey, COUNT(*) AS purchase_count
      FROM orders GROUP BY o_custkey
    ),
    seg AS (
      SELECT o_custkey,
        CASE WHEN purchase_count >= 10 THEN 'Whales (10+ orders)'
             WHEN purchase_count >= 5 THEN 'Heavy Buyers (5-9)'
             WHEN purchase_count >= 2 THEN 'Repeat Buyers (2-4)'
             ELSE 'One-Time Buyers' END AS segment
      FROM freq
    ),
    segment_sales AS (
      SELECT s.segment,
        CAST(COUNT(*) AS BIGINT) AS customers,
        SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS total_revenue_exact
      FROM seg s JOIN orders o ON o.o_custkey = s.o_custkey
      GROUP BY s.segment
    ),
    totals AS (
      SELECT SUM(customers) AS all_customers,
             SUM(total_revenue_exact) AS all_revenue
      FROM segment_sales
    )
    SELECT s.segment, s.customers,
      CAST(ROUND(s.total_revenue_exact, 2) AS DOUBLE) AS total_revenue,
      {sql_ratio("s.customers * 100", "t.all_customers", 2, "pct_customers")},
      {sql_ratio("s.total_revenue_exact * 100", "t.all_revenue", 2, "pct_revenue")}
    FROM segment_sales s CROSS JOIN totals t
    ORDER BY pct_revenue DESC, s.segment
    """,
    doc="Frequency banding; 'customers' counts fact rows per segment — "
    "reference quirk preserved (analytics_queries.sql:299).",
)
def q11_frequency_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    freq = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("purchase_count"))
    seg = freq.select(
        "o_custkey",
        F.when(F.col("purchase_count") >= 10, "Whales (10+ orders)")
        .when(F.col("purchase_count") >= 5, "Heavy Buyers (5-9)")
        .when(F.col("purchase_count") >= 2, "Repeat Buyers (2-4)")
        .otherwise("One-Time Buyers")
        .alias("segment"),
    )
    segment_sales = (
        o.join(seg, "o_custkey")
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("customers"),
            F.sum(money("o_totalprice")).alias("total_revenue_exact"),
        )
    )
    totals = segment_sales.agg(
        F.sum("customers").alias("all_customers"),
        F.sum("total_revenue_exact").alias("all_revenue"),
    )
    return (
        segment_sales.crossJoin(F.broadcast(totals))
        .select(
            "segment", "customers",
            F.round(F.col("total_revenue_exact"), 2).cast("double").alias("total_revenue"),
            ratio(F.col("customers") * 100, F.col("all_customers"), 2).alias("pct_customers"),
            ratio(F.col("total_revenue_exact") * 100, F.col("all_revenue"), 2).alias("pct_revenue"),
        )
        .orderBy(F.desc("pct_revenue"), "segment")
    )
