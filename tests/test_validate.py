"""functions.validate: constraint checks over the built warehouse."""

from __future__ import annotations

from pyspark.sql import functions as F

from marketing_etl_analytics_spark.functions.validate import (
    conservation_check,
    fk_violations,
    key_violations,
    null_violations,
)
from marketing_etl_analytics_spark.suite.common import money


def test_warehouse_constraints_hold(warehouse):
    wh = warehouse
    assert key_violations(wh["dim_products"], "product_id").count() == 0
    assert key_violations(wh["dim_customers"], "customer_id").count() == 0
    assert key_violations(wh["fact_sales"], "sale_id").count() == 0
    assert null_violations(wh["fact_sales"], "date_id", "customer_id").count() == 0
    assert (
        fk_violations(
            wh["fact_sales"], "product_id", wh["dim_products"], "product_id"
        ).count()
        == 0
    )
    cons = conservation_check(
        wh["fact_sales"], wh["fact_sales"], money("revenue"), money("revenue")
    ).collect()[0]
    assert float(cons.difference) == 0.0


def test_checks_catch_violations(spark):
    bad = spark.createDataFrame(
        [(1, None), (1, 5), (2, 7)], "id long, ref long"
    )
    assert key_violations(bad, "id").count() == 1  # id=1 twice
    nv = {r.column: r.n_nulls for r in null_violations(bad, "ref").collect()}
    assert nv == {"ref": 1}
    dim = spark.createDataFrame([(5,)], "k long")
    # ref=7 has no dim match; ref=None is skipped (SQL FK semantics)
    assert fk_violations(bad, "ref", dim, "k").count() == 1
