"""Differential test: Spark view layer vs the reference view SQL.

We materialize the Spark-built warehouse (10k rows — trivially small)
into DuckDB and run SQL transcribed from ``etl_script/04_views.sql``
and ``analytics_queries.sql`` over the *same* tables. Any divergence
in join/agg/NULL semantics between our DataFrame code and the
reference SQL shows up as a value mismatch.

(Single documented deviation: mv_channel_daily.ctr uses true division;
the reference hits PG bigint integer-division and yields 0 —
SURVEY.md §7.5.)
"""

from __future__ import annotations

import duckdb
import pytest

MERGED_CTE = """
WITH fs_agg AS (
  SELECT date_id, campaign_id, SUM(revenue) AS revenue, SUM(cost) AS cost,
         COUNT(DISTINCT sale_id) AS orders
  FROM fact_sales GROUP BY date_id, campaign_id
),
sp_agg AS (
  SELECT date_id, campaign_id, SUM(spend) AS spend, SUM(clicks) AS clicks,
         SUM(impressions) AS impressions
  FROM fact_spend GROUP BY date_id, campaign_id
),
merged AS (
  SELECT COALESCE(fs.date_id, sp.date_id) AS date_id,
         COALESCE(fs.campaign_id, sp.campaign_id) AS campaign_id,
         COALESCE(fs.revenue,0) AS revenue, COALESCE(fs.cost,0) AS cost,
         COALESCE(fs.orders,0) AS orders, COALESCE(sp.spend,0) AS spend,
         COALESCE(sp.clicks,0) AS clicks, COALESCE(sp.impressions,0) AS impressions
  FROM fs_agg fs FULL OUTER JOIN sp_agg sp
    ON fs.date_id = sp.date_id AND fs.campaign_id = sp.campaign_id
)
"""


@pytest.fixture(scope="module")
def duck(warehouse):
    con = duckdb.connect()
    # Arrow interchange keeps decimal types exact (pandas objects make
    # DuckDB re-infer decimal width from a sample and fail on overflow).
    tables = {
        name: warehouse[name].toArrow()
        for name in ("fact_sales", "fact_spend", "dim_campaigns", "dim_date",
                     "dim_products", "dim_customers")
    }
    for name, tbl in tables.items():
        con.register(name, tbl)
    yield con
    del tables


def _by_key(rows, *keys):
    return {tuple(r[k] for k in keys): r for r in rows}


def test_mv_channel_daily_matches(warehouse, duck):
    spark_rows = [r.asDict() for r in warehouse["mv_channel_daily"].collect()]
    duck_rows = duck.execute(
        MERGED_CTE
        + """
        SELECT d.date, c.channel, SUM(revenue) AS revenue, SUM(cost) AS cost,
               ROUND(SUM(spend), 2) AS spend, SUM(clicks) AS clicks,
               SUM(impressions) AS impressions,
               ROUND(CAST(SUM(clicks) AS DOUBLE) / NULLIF(SUM(impressions),0), 6) AS ctr,
               SUM(orders) AS orders
        FROM merged m
        LEFT JOIN dim_campaigns c ON m.campaign_id = c.campaign_id
        JOIN dim_date d ON m.date_id = d.date_id
        GROUP BY d.date, c.channel
        """
    ).fetch_arrow_table().to_pylist()
    assert len(spark_rows) == len(duck_rows)
    s, d = _by_key(spark_rows, "date", "channel"), _by_key(duck_rows, "date", "channel")
    assert s.keys() == d.keys()
    for k in s:
        for col in ("revenue", "cost", "spend", "clicks", "impressions", "orders"):
            assert float(s[k][col]) == pytest.approx(float(d[k][col]), abs=1e-6), (k, col)
        assert float(s[k]["ctr"]) == pytest.approx(float(d[k]["ctr"]), abs=1e-6), k


def test_mv_kpi_channel_matches(warehouse, duck):
    spark_rows = _by_key([r.asDict() for r in warehouse["mv_kpi_channel"].collect()], "channel")
    duck_rows = _by_key(
        duck.execute(
            MERGED_CTE
            + """
            SELECT c.channel, SUM(revenue) AS revenue, SUM(cost) AS cost,
                   ROUND(SUM(spend), 2) AS spend,
                   SUM(revenue - cost) AS gross_profit,
                   SUM(clicks) AS clicks, SUM(impressions) AS impressions,
                   SUM(orders) AS orders,
                   ROUND(CAST(SUM(revenue) AS DOUBLE) / NULLIF(SUM(orders),0), 4) AS aov,
                   ROUND(CAST(SUM(clicks) AS DOUBLE) / NULLIF(SUM(impressions),0), 6) AS ctr,
                   ROUND(CAST(SUM(revenue) AS DOUBLE) / NULLIF(CAST(SUM(spend) AS DOUBLE),0), 4) AS roas,
                   ROUND(CAST(SUM(revenue) - SUM(cost) AS DOUBLE) / NULLIF(CAST(SUM(spend) AS DOUBLE),0), 4) AS profit_roas,
                   ROUND(CAST(SUM(revenue) - SUM(spend) AS DOUBLE) / NULLIF(CAST(SUM(spend) AS DOUBLE),0), 4) AS roi,
                   ROUND(CAST(SUM(revenue) - SUM(cost) - SUM(spend) AS DOUBLE) / NULLIF(CAST(SUM(spend) AS DOUBLE),0), 4) AS profit_roi
            FROM merged m
            LEFT JOIN dim_campaigns c ON m.campaign_id = c.campaign_id
            GROUP BY c.channel
            """
        ).fetch_arrow_table().to_pylist(),
        "channel",
    )
    assert spark_rows.keys() == duck_rows.keys()
    for k in spark_rows:
        for col in ("revenue", "cost", "spend", "gross_profit", "clicks",
                    "impressions", "orders", "aov", "ctr", "roas",
                    "profit_roas", "roi", "profit_roi"):
            assert float(spark_rows[k][col]) == pytest.approx(
                float(duck_rows[k][col]), rel=1e-9, abs=1e-9
            ), (k, col)


def test_mv_kpi_campaign_matches(warehouse, duck):
    spark_rows = _by_key(
        [r.asDict() for r in warehouse["mv_kpi_campaign"].collect()], "campaign_id"
    )
    duck_rows = _by_key(
        duck.execute(
            MERGED_CTE
            + """
            SELECT c.campaign_id, SUM(revenue) AS revenue,
                   ROUND(SUM(spend), 2) AS spend, SUM(orders) AS orders,
                   ROUND(CAST(SUM(revenue) AS DOUBLE) / NULLIF(CAST(SUM(spend) AS DOUBLE),0), 4) AS roas
            FROM merged m
            LEFT JOIN dim_campaigns c ON m.campaign_id = c.campaign_id
            GROUP BY c.campaign_id
            """
        ).fetch_arrow_table().to_pylist(),
        "campaign_id",
    )
    assert spark_rows.keys() == duck_rows.keys()
    for k in spark_rows:
        for col in ("revenue", "spend", "orders", "roas"):
            assert float(spark_rows[k][col]) == pytest.approx(
                float(duck_rows[k][col]), rel=1e-9, abs=1e-9
            ), (k, col)
