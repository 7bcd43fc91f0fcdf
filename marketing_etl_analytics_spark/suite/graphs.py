"""Graph operators over the document corpus (engine extensions).

The dedup family already runs one iterative graph algorithm
(connected components, `ext_dedup_cluster`). This module adds
centrality: PageRank over the rare-shingle co-occurrence graph —
docs are linked when a 3-word shingle occurs in EXACTLY two distinct
documents (a rare shared phrase is strong evidence of direct reuse;
common shingles are noise and high-fanout, so df=2 is both the
signal and the skew guard — bucket fanout is capped at one edge by
construction).

Scale shape: the edge build is ONE aggregation over shingle hashes
(map-side combine collapses per-partition repeats); each PageRank
iteration is edges⋈ranks (shuffle on node id, edge-partitioned —
Pregel's shape) + one aggregation. Iterations are unrolled a fixed
3 deep, so the whole computation is a static DAG that Catalyst/AQE
optimizes end-to-end and a DuckDB oracle can mirror exactly.

Determinism (the usual discipline, see ``suite.common``): rank
updates sum floating-point contributions, which is order-dependent
— so every per-edge contribution is portably rounded to 12 dp,
snapped to DECIMAL(38,12), summed exactly, and only then cast back
to double. Both engines then apply identical IEEE ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from marketing_etl_analytics_spark.suite.common import pround, sql_pround, t
from marketing_etl_analytics_spark.suite.ext import SQL_SHINGLES, shingle_rows
from marketing_etl_analytics_spark.suite.registry import register

DAMPING = 0.85
N_ITER = 3


def _sql_iteration(prev: str, it: str) -> str:
    """One unrolled PageRank round (DuckDB side)."""
    contrib = sql_pround("CAST(r.r AS DOUBLE) / r.deg", 12)
    return f"""
    s{it} AS (
      SELECT e.dst AS node,
        CAST(SUM(CAST({contrib} AS DECIMAL(38,12))) AS DOUBLE) AS s
      FROM edges e JOIN {prev} r ON e.src = r.node
      GROUP BY e.dst
    ),
    {it} AS (
      SELECT d.node, d.deg, nn.n,
        {sql_pround(f"0.15 / nn.n + {DAMPING} * COALESCE(s{it}.s, 0.0)", 12)} AS r
      FROM deg d CROSS JOIN nn LEFT JOIN s{it} ON d.node = s{it}.node
    )"""


@register(
    "ext_graph_pagerank",
    f"""
    WITH sh AS (
      SELECT d.doc_id, md5(s.sh) AS h
      FROM (
        SELECT doc_id, {SQL_SHINGLES} AS shingles
        FROM documents
        WHERE len(string_split(lower(text), ' ')) >= 3
      ) d, LATERAL unnest(d.shingles) AS s(sh)
    ),
    pairs AS (
      SELECT MIN(doc_id) AS a, MAX(doc_id) AS b
      FROM sh GROUP BY h
      HAVING COUNT(DISTINCT doc_id) = 2
    ),
    e2 AS (SELECT DISTINCT a, b FROM pairs),
    edges AS (
      SELECT a AS src, b AS dst FROM e2
      UNION ALL
      SELECT b AS src, a AS dst FROM e2
    ),
    deg AS (SELECT src AS node, COUNT(*) AS deg FROM edges GROUP BY src),
    nn AS (SELECT COUNT(*) AS n FROM deg),
    r0 AS (SELECT node, deg, nn.n, 1.0 / nn.n AS r FROM deg CROSS JOIN nn),
    {_sql_iteration("r0", "r1")},
    {_sql_iteration("r1", "r2")},
    {_sql_iteration("r2", "r3")}
    SELECT node AS doc_id, CAST(deg AS BIGINT) AS degree,
      {sql_pround("r", 8)} AS pagerank
    FROM r3
    ORDER BY doc_id
    """,
    doc="PageRank (damping 0.85, 3 unrolled iterations) over the "
    "rare-shingle co-occurrence graph: docs sharing a 3-word shingle "
    "that occurs in exactly two documents are linked. Edge build is "
    "one shingle-hash aggregation; each iteration is an edge⋈rank "
    "join partitioned on node id plus a decimal-exact contribution "
    "sum — the Pregel message-passing shape as a static DataFrame "
    "DAG. Second iterative-algorithm entry beside the connected-"
    "components dedup clusterer, and like it fully oracle-verified.",
)
def ext_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    sh = shingle_rows(docs).select("doc_id", F.md5("sh_str").alias("h"))
    pairs = (
        sh.groupBy("h")
        .agg(
            F.countDistinct("doc_id").alias("nd"),
            F.min("doc_id").alias("a"),
            F.max("doc_id").alias("b"),
        )
        .filter(F.col("nd") == 2)
        .select("a", "b")
        .distinct()
    )
    edges = pairs.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionAll(
        pairs.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg")).withColumnRenamed("src", "node")
    nn = deg.agg(F.count(F.lit(1)).alias("n"))
    ranks = deg.crossJoin(F.broadcast(nn)).select(
        "node", "deg", "n", (F.lit(1.0) / F.col("n")).alias("r")
    )
    for _ in range(N_ITER):
        contrib = edges.join(ranks, edges.src == ranks.node).select(
            "dst", pround(F.col("r").cast("double") / F.col("deg"), 12).alias("c")
        )
        sums = contrib.groupBy("dst").agg(
            F.sum(F.col("c").cast("decimal(38,12)")).cast("double").alias("s")
        )
        ranks = (
            deg.crossJoin(F.broadcast(nn))
            .join(sums, F.col("node") == F.col("dst"), "left")
            .select(
                "node",
                "deg",
                "n",
                pround(
                    F.lit(0.15) / F.col("n")
                    + F.lit(DAMPING) * F.coalesce("s", F.lit(0.0)),
                    12,
                ).alias("r"),
            )
        )
    return ranks.select(
        F.col("node").alias("doc_id"),
        F.col("deg").cast("long").alias("degree"),
        pround(F.col("r"), 8).alias("pagerank"),
    ).orderBy("doc_id")
