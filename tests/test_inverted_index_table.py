"""Persisted per-term inverted index as a bucketed table.

The suite's `ext_inverted_index` builds its postings inline per query;
a production engine persists them ONCE per corpus version and serves
every lookup from the persisted layout (the reference's GIN-style
index analog; SURVEY §2.A6 maps indexes to partition/bucket layout).

Bucketing the postings table BY TERM gives the two properties that
matter at 100 TB:

- **Bucket pruning**: an equality / IN filter on the bucket column
  reads only the matching buckets (`SelectedBucketsCount: k out of n`
  in the scan node) — a term lookup touches 1/n of the index files,
  no matter how large the corpus.
- **Shuffle-free per-term aggregation**: the table reports its hash
  distribution on `term`, so df-counts and posting-list length stats
  group WITHOUT an Exchange.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"
N_BUCKETS = 16


def _postings(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    return (
        docs.select(
            "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("term")
        )
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )


@pytest.fixture(scope="module")
def postings_table(spark):
    spark.sql("DROP TABLE IF EXISTS postings_b")
    (
        _postings(spark)
        .write.mode("overwrite")
        .bucketBy(N_BUCKETS, "term")
        .sortBy("term", "doc_id")
        .saveAsTable("postings_b")
    )
    yield spark
    spark.sql("DROP TABLE IF EXISTS postings_b")


def test_term_lookup_prunes_buckets(postings_table):
    spark = postings_table
    # the auto-bucketed-scan heuristic turns the bucketed layout off
    # for scan-only queries (no join/agg on the bucket key); a point
    # lookup wants the pruned bucketed scan, so pin it on
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        q = spark.table("postings_b").filter(F.col("term").isin("spark", "table"))
        q.collect()
    finally:
        spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "SelectedBucketsCount" in plan, plan[:800]
    # the pruned scan must read strictly fewer buckets than the table has
    import re

    m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
    assert m, plan[:800]
    assert int(m.group(1)) < int(m.group(2))
    assert int(m.group(2)) == N_BUCKETS


def test_per_term_stats_need_no_exchange(postings_table):
    spark = postings_table
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        stats = (
            spark.table("postings_b")
            .groupBy("term")
            .agg(
                F.count(F.lit(1)).cast("long").alias("df"),
                F.sum("tf").cast("long").alias("ctf"),
            )
        )
        stats.collect()
        plan = stats._jdf.queryExecution().executedPlan().toString()
        final = plan.split("== Initial Plan ==")[0]
        assert "Exchange hashpartitioning(term" not in final, final[:1200]
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_persisted_index_matches_inline_search(postings_table):
    """Conjunctive AND over the persisted index == the suite entry's
    inline-postings result (same HAVING count = |terms| shape)."""
    spark = postings_table
    terms = ["spark", "table"]
    via_table = (
        spark.table("postings_b")
        .filter(F.col("term").isin(*terms))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("nt"), F.sum("tf").cast("long").alias("score"))
        .filter(F.col("nt") == len(terms))
        .select("doc_id", "score")
    )
    inline = (
        _postings(spark)
        .filter(F.col("term").isin(*terms))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("nt"), F.sum("tf").cast("long").alias("score"))
        .filter(F.col("nt") == len(terms))
        .select("doc_id", "score")
    )
    assert sorted(map(tuple, via_table.collect())) == sorted(
        map(tuple, inline.collect())
    )
    assert via_table.count() > 0
