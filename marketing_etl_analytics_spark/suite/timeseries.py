"""Time-series rollup and sketch operators (engine extensions).

Two custom-operator shapes the task brief calls out that no reference
query needs but a production engine at corpus scale does:

- ``rel_time_rollup``: hypertable-style fixed-width time-bucket rollup
  with a dense generated spine (gap-fill) and last-observation-carried-
  forward — the TimescaleDB ``time_bucket`` + ``locf(gapfill(...))``
  semantics expressed as pure DataFrame ops: bucket = integer floor of
  epoch micros (codegen arithmetic, no UDF), spine = ``sequence`` +
  ``explode`` of a broadcast 1-row bounds relation, LOCF =
  ``last(..., ignorenulls=True)`` over an ordered window. Scale: the
  rollup aggregation shuffles once on (bucket, type) with map-side
  combine; the spine is O(buckets x types) — tiny by construction — so
  the left join broadcasts nothing from the fact side and the window
  partitions by event_type over spine-sized data only.

- ``ext_sketch_kmv``: K-minimum-values distinct sketch. All hashing is
  md5-derived exactly as the dedup family (one 48-bit integer per
  value), so unlike HLL registers the sketch is bit-reproducible across
  engines — the DuckDB oracle verifies the ESTIMATES exactly, not just
  plumbing. Estimator: with hashes uniform on [0, 2^48), the k-th
  smallest h_k gives distinct ~= (k-1) * 2^48 / h_k (Bar-Yossef et al.,
  "Counting distinct elements in a data stream", RANDOM 2002); groups
  with fewer than k distinct hashes report the exact count (the sketch
  IS the value set there). Scale path: the windowed k-smallest pass
  would be quadratic-ish on a billion-distinct group, so a broadcast
  per-group threshold (4x-margin over approx_count_distinct) pre-filters
  the hash set down to O(k) rows per group first — the filter provably
  keeps every hash <= h_k (threshold >= 4x the expected h_k), so the
  output is unchanged and the oracle needs no such filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from marketing_etl_analytics_spark.suite.common import money, t
from marketing_etl_analytics_spark.suite.registry import register

BUCKET_US = 6 * 3600 * 1_000_000  # 6-hour buckets
KMV_K = 256
HASH_SPACE = 1 << 48  # md5-derived hashes are uniform on [0, 2^48)


@register(
    "rel_time_rollup",
    f"""
    WITH b AS (
      SELECT (epoch_us(ts) // {BUCKET_US}) * {BUCKET_US} AS bucket_us,
        event_type,
        CAST(COUNT(*) AS BIGINT) AS n_events,
        CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS value_sum
      FROM events
      GROUP BY 1, 2
    ),
    bounds AS (SELECT MIN(bucket_us) AS lo, MAX(bucket_us) AS hi FROM b),
    spine AS (
      SELECT unnest(generate_series(lo, hi, {BUCKET_US})) AS bucket_us FROM bounds
    ),
    grid AS (
      SELECT s.bucket_us, et.event_type
      FROM spine s CROSS JOIN (SELECT DISTINCT event_type FROM events) et
    )
    SELECT make_timestamp(g.bucket_us) AS bucket, g.event_type AS event_type,
      CAST(COALESCE(b.n_events, 0) AS BIGINT) AS n_events,
      CAST(COALESCE(b.value_sum, 0.0) AS DOUBLE) AS value_sum,
      CAST(last_value(b.value_sum IGNORE NULLS) OVER (
        PARTITION BY g.event_type ORDER BY g.bucket_us
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
      ) AS DOUBLE) AS value_locf
    FROM grid g
    LEFT JOIN b ON b.bucket_us = g.bucket_us AND b.event_type = g.event_type
    ORDER BY 2, 1
    """,
    doc="Hypertable-style 6h time-bucket rollup with dense gap-fill "
    "spine and LOCF (TimescaleDB time_bucket/gapfill/locf semantics). "
    "One shuffled aggregation on (bucket, type); the spine is "
    "sequence+explode of broadcast bounds, so gap-fill never touches "
    "the fact table again.",
)
def rel_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    bucket_us = F.expr(f"unix_micros(ts) div {BUCKET_US} * {BUCKET_US}")
    b = (
        ev.select(bucket_us.alias("bucket_us"), "event_type", "value")
        .groupBy("bucket_us", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(money("value")), 2).cast("double").alias("value_sum"),
        )
    )
    bounds = b.agg(F.min("bucket_us").alias("lo"), F.max("bucket_us").alias("hi"))
    spine = (
        spark.range(1)
        .crossJoin(F.broadcast(bounds))
        .select(
            F.explode(
                F.sequence("lo", "hi", F.lit(BUCKET_US).cast("long"))
            ).alias("bucket_us")
        )
    )
    types = ev.select("event_type").distinct()
    grid = spine.crossJoin(F.broadcast(types))
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket_us")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(b, ["bucket_us", "event_type"], "left")
        .select(
            F.timestamp_micros("bucket_us").alias("bucket"),
            "event_type",
            F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
            F.coalesce("value_sum", F.lit(0.0)).cast("double").alias("value_sum"),
            F.last("value_sum", ignorenulls=True).over(w).alias("value_locf"),
        )
        .orderBy("event_type", "bucket")
    )


@register(
    "ext_sketch_kmv",
    f"""
    WITH h AS (
      SELECT DISTINCT event_type,
        ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12))::BIGINT AS hv
      FROM events
    ),
    r AS (
      SELECT event_type, hv,
        row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn
      FROM h
    ),
    agg AS (
      SELECT event_type, CAST(MAX(rn) AS BIGINT) AS n_kept,
        MAX(CASE WHEN rn = {KMV_K} THEN hv END) AS hk
      FROM r GROUP BY event_type
    ),
    ex AS (
      SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact
      FROM events GROUP BY event_type
    )
    SELECT a.event_type, e.n_exact,
      CAST(CASE WHEN a.n_kept < {KMV_K} THEN a.n_kept
           ELSE ({KMV_K - 1} * {HASH_SPACE}) // a.hk END AS BIGINT) AS kmv_estimate
    FROM agg a JOIN ex e USING (event_type)
    ORDER BY event_type
    """,
    doc="KMV (k-minimum-values) distinct-count sketch, k=256, over "
    "md5-derived 48-bit hashes — deterministic, so the oracle verifies "
    "the estimates themselves. A broadcast 4x-margin threshold from "
    "approx_count_distinct bounds the per-group windowed set to O(k) "
    "rows regardless of corpus size without changing the output.",
)
def ext_sketch_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    hv = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 12), 16, 10
    ).cast("long")
    h = ev.select("event_type", hv.alias("hv")).distinct()
    # scale guard: keep only hashes below ~4x the expected h_k. The
    # threshold >= h_k with huge margin (HLL err ~2% vs 4x headroom),
    # so the k smallest always survive and the result is invariant;
    # groups near/below k distinct get threshold >= 2^48 (keep all).
    thr = h.groupBy("event_type").agg(
        F.least(
            F.lit(HASH_SPACE),
            F.expr(
                f"CAST({HASH_SPACE} * {4 * KMV_K} / "
                "GREATEST(approx_count_distinct(hv), 1) AS BIGINT)"
            ),
        ).alias("thr")
    )
    kept = h.join(F.broadcast(thr), "event_type").filter(F.col("hv") <= F.col("thr"))
    rn = F.row_number().over(Window.partitionBy("event_type").orderBy("hv"))
    agg = (
        kept.withColumn("rn", rn)
        .groupBy("event_type")
        .agg(
            F.max("rn").cast("long").alias("n_kept"),
            F.max(F.when(F.col("rn") == KMV_K, F.col("hv"))).alias("hk"),
        )
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_exact")
    )
    est = F.when(F.col("n_kept") < KMV_K, F.col("n_kept")).otherwise(
        F.expr(f"({KMV_K - 1} * {HASH_SPACE}) div hk")
    )
    return (
        agg.join(exact, "event_type")
        .select(
            "event_type",
            "n_exact",
            est.cast("long").alias("kmv_estimate"),
        )
        .orderBy("event_type")
    )
