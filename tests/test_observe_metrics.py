"""observe() metrics ride the caller's action — no second scan."""

from __future__ import annotations

from pyspark.sql import functions as F

from marketing_etl_analytics_spark.functions.observe import with_metrics


def test_metrics_piggyback_on_single_write(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, None, 5.0), (3, "c", None)],
        "id long, name string, amount double",
    )
    out, obs = with_metrics(
        df,
        "stage_load",
        F.round(F.sum(F.col("amount").cast("decimal(18,2)")), 2)
        .cast("double")
        .alias("amount_sum"),
        count_nulls_in=["name", "amount"],
    )
    out.write.mode("overwrite").parquet(str(tmp_path / "out"))  # the ONE action
    m = obs.get
    assert m["n_rows"] == 3
    assert m["n_null_name"] == 1
    assert m["n_null_amount"] == 1
    assert m["amount_sum"] == 15.0
    # and the written data is intact
    assert spark.read.parquet(str(tmp_path / "out")).count() == 3
