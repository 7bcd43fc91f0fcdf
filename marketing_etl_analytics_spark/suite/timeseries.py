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

from marketing_etl_analytics_spark.suite.common import money, pround, sql_pround, t
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


@register(
    "ext_sketch_kmv_setops",
    f"""
    WITH h AS (
      SELECT DISTINCT event_type,
        ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12))::BIGINT AS hv
      FROM events
    ),
    sk AS (
      SELECT event_type, hv FROM (
        SELECT event_type, hv,
          row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn
        FROM h
      ) WHERE rn <= {KMV_K}
    ),
    types AS (SELECT DISTINCT event_type FROM h),
    pairs AS (
      SELECT a.event_type AS ta, b.event_type AS tb
      FROM types a JOIN types b ON a.event_type < b.event_type
    ),
    un AS (
      SELECT p.ta, p.tb, s.hv,
        MAX(CASE WHEN s.event_type = p.ta THEN 1 ELSE 0 END) AS fa,
        MAX(CASE WHEN s.event_type = p.tb THEN 1 ELSE 0 END) AS fb
      FROM pairs p JOIN sk s ON s.event_type IN (p.ta, p.tb)
      GROUP BY p.ta, p.tb, s.hv
    ),
    r AS (
      SELECT *, row_number() OVER (PARTITION BY ta, tb ORDER BY hv) AS rn
      FROM un
    ),
    agg AS (
      SELECT ta, tb, COUNT(*) AS cnt,
        MAX(CASE WHEN rn = {KMV_K} THEN hv END) AS hk,
        CAST(SUM(fa * fb) AS BIGINT) AS m
      FROM r WHERE rn <= {KMV_K} GROUP BY ta, tb
    ),
    ex_i AS (
      SELECT p.ta, p.tb, CAST(COUNT(*) AS BIGINT) AS exact_intersect
      FROM pairs p
      JOIN h a ON a.event_type = p.ta
      JOIN h b ON b.event_type = p.tb AND b.hv = a.hv
      GROUP BY p.ta, p.tb
    ),
    ex_t AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM h GROUP BY event_type),
    est AS (
      SELECT ta, tb, m, cnt,
        CAST(CASE WHEN cnt < {KMV_K} THEN cnt
             ELSE ({KMV_K - 1} * {HASH_SPACE}) // hk END AS BIGINT) AS union_est
      FROM agg
    )
    SELECT e.ta AS type_a, e.tb AS type_b, e.union_est,
      CAST((e.m * e.union_est) // LEAST({KMV_K}, e.cnt) AS BIGINT) AS intersect_est,
      {sql_pround(f"CAST(e.m AS DOUBLE) / LEAST({KMV_K}, e.cnt)", 4)} AS jaccard_est,
      CAST(ta_n.n + tb_n.n - COALESCE(i.exact_intersect, 0) AS BIGINT) AS exact_union,
      CAST(COALESCE(i.exact_intersect, 0) AS BIGINT) AS exact_intersect
    FROM est e
    JOIN ex_t ta_n ON ta_n.event_type = e.ta
    JOIN ex_t tb_n ON tb_n.event_type = e.tb
    LEFT JOIN ex_i i ON i.ta = e.ta AND i.tb = e.tb
    ORDER BY type_a, type_b
    """,
    doc="KMV sketch SET OPERATIONS: per-type k-minimum sketches are "
    "merged pairwise — the k smallest of the merged set estimate "
    "|A∪B|, and the fraction of merged-sketch members present in both "
    "sides estimates Jaccard, hence |A∩B| (Beyer et al., SIGMOD 2007). "
    "Everything after the per-type sketch build (O(k) rows per type, "
    "same scale guard as ext_sketch_kmv) runs on sketch-sized data — "
    "set cardinalities over a 100 TB corpus from KB-sized mergeable "
    "summaries. md5-derived hashing keeps the estimates deterministic, "
    "so the oracle verifies them exactly; exact_union/exact_intersect "
    "columns quantify the sketch error in the report itself.",
)
def ext_sketch_kmv_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    from marketing_etl_analytics_spark.suite.common import memo_df, pround

    ev = t(spark, sf_dir, "events")

    def build_sketch():
        hv = F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 12), 16, 10
        ).cast("long")
        h = ev.select("event_type", hv.alias("hv")).distinct()
        thr = h.groupBy("event_type").agg(
            F.least(
                F.lit(HASH_SPACE),
                F.expr(
                    f"CAST({HASH_SPACE} * {4 * KMV_K} / "
                    "GREATEST(approx_count_distinct(hv), 1) AS BIGINT)"
                ),
            ).alias("thr")
        )
        kept = h.join(F.broadcast(thr), "event_type").filter(
            F.col("hv") <= F.col("thr")
        )
        rn = F.row_number().over(Window.partitionBy("event_type").orderBy("hv"))
        return kept.withColumn("rn", rn).filter(F.col("rn") <= KMV_K).drop("rn")

    def build_h_exact():
        hv = F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 12), 16, 10
        ).cast("long")
        return ev.select("event_type", hv.alias("hv")).distinct()

    sk = memo_df(spark, sf_dir, "kmv_sketch_sets", build_sketch)
    h = memo_df(spark, sf_dir, "kmv_hash_sets", build_h_exact)

    types = sk.select("event_type").distinct()
    pairs = (
        types.alias("a")
        .join(types.alias("b"), F.col("a.event_type") < F.col("b.event_type"))
        .select(F.col("a.event_type").alias("ta"), F.col("b.event_type").alias("tb"))
    )
    rows_a = pairs.join(sk, sk.event_type == F.col("ta")).select(
        "ta", "tb", "hv", F.lit(1).alias("fa"), F.lit(0).alias("fb")
    )
    rows_b = pairs.join(sk, sk.event_type == F.col("tb")).select(
        "ta", "tb", "hv", F.lit(0).alias("fa"), F.lit(1).alias("fb")
    )
    un = (
        rows_a.unionAll(rows_b)
        .groupBy("ta", "tb", "hv")
        .agg(F.max("fa").alias("fa"), F.max("fb").alias("fb"))
    )
    rn = F.row_number().over(Window.partitionBy("ta", "tb").orderBy("hv"))
    agg = (
        un.withColumn("rn", rn)
        .filter(F.col("rn") <= KMV_K)
        .groupBy("ta", "tb")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.max(F.when(F.col("rn") == KMV_K, F.col("hv"))).alias("hk"),
            F.sum(F.col("fa") * F.col("fb")).cast("long").alias("m"),
        )
    )
    union_est = (
        F.when(F.col("cnt") < KMV_K, F.col("cnt"))
        .otherwise(F.expr(f"({KMV_K - 1} * {HASH_SPACE}) div hk"))
        .cast("long")
    )
    est = agg.select("ta", "tb", "m", "cnt", union_est.alias("union_est"))

    ex_t = h.groupBy("event_type").agg(F.count(F.lit(1)).cast("long").alias("n"))
    ha, hb = h.alias("ha"), h.alias("hb")
    ex_i = (
        pairs.join(ha, F.col("ha.event_type") == F.col("ta"))
        .join(
            hb,
            (F.col("hb.event_type") == F.col("tb"))
            & (F.col("hb.hv") == F.col("ha.hv")),
        )
        .groupBy("ta", "tb")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_intersect"))
    )
    denom = F.least(F.lit(KMV_K), F.col("cnt"))
    return (
        est.join(ex_t.withColumnRenamed("event_type", "ta").withColumnRenamed("n", "na"), "ta")
        .join(ex_t.withColumnRenamed("event_type", "tb").withColumnRenamed("n", "nb"), "tb")
        .join(ex_i, ["ta", "tb"], "left")
        .select(
            F.col("ta").alias("type_a"),
            F.col("tb").alias("type_b"),
            "union_est",
            F.expr(f"(m * union_est) div LEAST({KMV_K}, cnt)")
            .cast("long")
            .alias("intersect_est"),
            pround(F.col("m").cast("double") / denom, 4).alias("jaccard_est"),
            (F.col("na") + F.col("nb") - F.coalesce(F.col("exact_intersect"), F.lit(0)))
            .cast("long")
            .alias("exact_union"),
            F.coalesce(F.col("exact_intersect"), F.lit(0))
            .cast("long")
            .alias("exact_intersect"),
        )
        .orderBy("type_a", "type_b")
    )


# --- rolling 7-day distinct users (DAU / trailing-WAU / stickiness) ----------

@register(
    "ext_rolling_dau",
    """
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d
      FROM events
    ),
    bounds AS (SELECT MAX(d) AS mx FROM ud),
    contrib AS (
      SELECT DISTINCT user_id, date_add(d, CAST(g.i AS INT)) AS wday
      FROM ud, LATERAL unnest(generate_series(0, 6)) AS g(i)
    ),
    wau AS (
      SELECT wday, CAST(COUNT(*) AS BIGINT) AS wau7
      FROM contrib, bounds
      WHERE wday <= mx
      GROUP BY wday
    ),
    dau AS (
      SELECT d, CAST(COUNT(*) AS BIGINT) AS dau FROM ud GROUP BY d
    )
    SELECT w.wday AS day,
      CAST(COALESCE(a.dau, 0) AS BIGINT) AS dau,
      w.wau7,
      FLOOR(CAST(COALESCE(a.dau, 0) AS DOUBLE)
            / NULLIF(CAST(w.wau7 AS DOUBLE), 0) * 10000.0 + 0.5) / 10000.0
        AS stickiness
    FROM wau w LEFT JOIN dau a ON a.d = w.wday
    ORDER BY day
    """,
    doc="Rolling engagement: DAU, trailing-7-day distinct users "
    "(WAU7), and the DAU/WAU7 stickiness ratio per day. COUNT "
    "DISTINCT over a sliding window isn't a window function in any "
    "engine, so the plan uses the contribute-to-window shape: each "
    "active (user, day) pair is exploded to the <=7 window-end days "
    "it supports, deduped, and counted — two shuffles, both on "
    "bounded (user, day) keys with map-side combine, never a per-day "
    "self-join of the fact table. At extreme scale the same query "
    "drops the exactness and merges per-day HLL/KMV sketches over "
    "the trailing window (cf. ext_sketch_kmv_setops); the exact "
    "explode form is kept here because the oracle contract verifies "
    "counts exactly.",
)
def ext_rolling_dau(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    ud = ev.select(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("d")
    ).distinct()
    bounds = ud.agg(F.max("d").alias("mx"))
    contrib = (
        ud.select(
            "user_id",
            F.explode(F.sequence(F.lit(0), F.lit(6))).alias("i"),
            "d",
        )
        .select("user_id", F.date_add("d", F.col("i")).alias("wday"))
        .distinct()
    )
    wau = (
        contrib.crossJoin(F.broadcast(bounds))
        .filter(F.col("wday") <= F.col("mx"))
        .groupBy("wday")
        .agg(F.count(F.lit(1)).cast("long").alias("wau7"))
    )
    dau = ud.groupBy("d").agg(F.count(F.lit(1)).cast("long").alias("dau"))
    return (
        wau.join(dau, wau.wday == dau.d, "left")
        .select(
            F.col("wday").alias("day"),
            F.coalesce("dau", F.lit(0)).cast("long").alias("dau"),
            "wau7",
            pround(
                F.coalesce("dau", F.lit(0)).cast("double")
                / F.nullif(F.col("wau7").cast("double"), F.lit(0.0)),
                4,
            ).alias("stickiness"),
        )
        .orderBy("day")
    )


# --- rolling z-score anomaly detection ---------------------------------------

# Trailing-history window: the 7 buckets before the current one (the
# current bucket must not influence its own baseline).
_Z_HIST = 7
_Z_MIN_N = 4


@register(
    "ext_anomaly_zscore",
    f"""
    WITH b AS (
      SELECT (epoch_us(ts) // {BUCKET_US}) * {BUCKET_US} AS bucket_us,
        event_type,
        CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS value_sum
      FROM events
      GROUP BY 1, 2
    ),
    w AS (
      SELECT bucket_us, event_type, value_sum,
        CAST(SUM(CAST(value_sum AS DECIMAL(28,6))) OVER hist AS DOUBLE) AS sx,
        CAST(SUM(CAST({sql_pround("value_sum * value_sum", 6)} AS DECIMAL(38,6)))
             OVER hist AS DOUBLE) AS sxx,
        COUNT(*) OVER hist AS n
      FROM b
      WINDOW hist AS (
        PARTITION BY event_type ORDER BY bucket_us
        ROWS BETWEEN {_Z_HIST} PRECEDING AND 1 PRECEDING
      )
    ),
    m AS (
      SELECT *, sx / n AS mean FROM w WHERE n >= {_Z_MIN_N}
    ),
    v AS (
      SELECT *,
        sqrt(GREATEST(0.0, {sql_pround("sxx / n - mean * mean", 6)})) AS std
      FROM m
    )
    SELECT make_timestamp(bucket_us) AS bucket, event_type, value_sum,
      {sql_pround("mean", 4)} AS mean7,
      {sql_pround("std", 4)} AS std7,
      {sql_pround("(value_sum - mean) / NULLIF(std, 0.0)", 4)} AS z,
      CASE WHEN ABS((value_sum - mean) / NULLIF(std, 0.0)) > 2.0
           THEN 1 ELSE 0 END AS is_anomaly
    FROM v
    ORDER BY event_type, bucket
    """,
    doc="Rolling z-score anomaly detection on 6h revenue buckets per "
    "event type: each bucket is scored against the mean/std of its "
    "trailing 7 buckets (self-excluded). One shuffled aggregation "
    "builds the buckets (map-side combine), then a bounded ROWS "
    "window per type — state is O(history) per key, the same plan a "
    "streaming job would run with a sliding watermark. Determinism: "
    "sums and sums-of-squares snap to decimals (order-free), the "
    "variance is portably rounded, and IEEE-754 sqrt is correctly "
    "rounded on both engines, so z-scores and flags are oracle-exact "
    "— no libm-divergence risk.",
)
def ext_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    bucket_us = F.expr(f"unix_micros(ts) div {BUCKET_US} * {BUCKET_US}")
    b = (
        ev.select(bucket_us.alias("bucket_us"), "event_type", "value")
        .groupBy("bucket_us", "event_type")
        .agg(F.round(F.sum(money("value")), 2).cast("double").alias("value_sum"))
    )
    hist = (
        Window.partitionBy("event_type")
        .orderBy("bucket_us")
        .rowsBetween(-_Z_HIST, -1)
    )
    x = F.col("value_sum")
    w = b.select(
        "bucket_us",
        "event_type",
        "value_sum",
        F.sum(x.cast("decimal(28,6)")).over(hist).cast("double").alias("sx"),
        F.sum(pround(x * x, 6).cast("decimal(38,6)"))
        .over(hist)
        .cast("double")
        .alias("sxx"),
        F.count(F.lit(1)).over(hist).alias("n"),
    ).filter(F.col("n") >= _Z_MIN_N)
    m = w.withColumn("mean", F.col("sx") / F.col("n"))
    v = m.withColumn(
        "std",
        F.sqrt(
            F.greatest(
                F.lit(0.0),
                pround(F.col("sxx") / F.col("n") - F.col("mean") * F.col("mean"), 6),
            )
        ),
    )
    z = pround((x - F.col("mean")) / F.nullif(F.col("std"), F.lit(0.0)), 4)
    return (
        v.select(
            F.timestamp_micros("bucket_us").alias("bucket"),
            "event_type",
            "value_sum",
            pround(F.col("mean"), 4).alias("mean7"),
            pround(F.col("std"), 4).alias("std7"),
            z.alias("z"),
            F.when(
                F.abs(
                    (x - F.col("mean")) / F.nullif(F.col("std"), F.lit(0.0))
                )
                > 2.0,
                1,
            )
            .otherwise(0)
            .alias("is_anomaly"),
        )
        .orderBy("event_type", "bucket")
    )


# --- native session windows --------------------------------------------------

_SESSION_GAP_US = 30 * 60 * 1_000_000


@register(
    "ext_session_window_native",
    f"""
    WITH ordered AS (
      SELECT user_id, event_id, ts, value,
        lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events
    ),
    flagged AS (
      SELECT user_id, ts, value,
        -- strict > : session_window's end bound is INCLUSIVE (an
        -- event at exactly last_ts + gap merges into the session;
        -- pinned by test_session_window_boundary_is_inclusive), the
        -- same rule as the gaps-and-islands twin
        CASE WHEN prev_ts IS NULL
                  OR epoch_us(ts) - epoch_us(prev_ts) > {_SESSION_GAP_US}
             THEN 1 ELSE 0 END AS new_session
      FROM ordered
    ),
    numbered AS (
      SELECT user_id, ts, value,
        SUM(new_session) OVER (
          PARTITION BY user_id ORDER BY ts
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        ) AS session_no
      FROM flagged
    )
    SELECT user_id,
      MIN(ts) AS session_start,
      MAX(ts) + INTERVAL 30 MINUTE AS session_end,
      CAST(COUNT(*) AS BIGINT) AS n_events,
      CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_value
    FROM numbered
    GROUP BY user_id, session_no
    ORDER BY user_id, session_start
    """,
    doc="Sessionization via Spark's NATIVE session_window grouping — "
    "the idiomatic engine form of the 30-min-gap sessionizer (one "
    "shuffled aggregation; Catalyst plans dynamic-gap session merge "
    "directly, and the same expression works under Structured "
    "Streaming with a watermark). The oracle mirrors the exact "
    "semantics with gaps-and-islands: session end = last event + gap, "
    "and the end bound is inclusive (boundary pinned by "
    "tests/test_sessionize_unit.py::test_session_window_boundary_is_inclusive). "
    "Complements ext_sessionize (authored islands form) and the "
    "stateful streaming sessionizer.",
)
def ext_session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(F.sum(money("value")), 2).cast("double").alias("total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
        .orderBy("user_id", "session_start")
    )
