"""Persisted per-term inverted index — the `ext/search.py` engine API.

The suite's `ext_inverted_index` / `ext_bm25_search` build postings
inline per query; `build_term_index` persists them ONCE per corpus
version as a bucketed-by-term table (the reference's GIN-style index
analog; SURVEY §2.A6 maps indexes to partition/bucket layout), and
`search_terms` / `term_stats` / `bm25_search` serve every lookup from
the persisted layout. Asserted here:

- **Bucket pruning**: a term lookup reads only the matching buckets
  (`SelectedBucketsCount: k out of n` in the scan node) — 1/n of the
  index files regardless of corpus size.
- **Shuffle-free per-term aggregation**: the bucketed hash
  distribution on `term` serves df/ctf stats without an Exchange.
- **Result parity**: conjunctive search over the persisted index
  equals the inline-postings result, and `bm25_search` equals the
  driver-graded `ext_bm25_search` suite entry row-for-row — the
  oracle evidence transfers to the persisted path.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from marketing_etl_analytics_spark.ext.search import (
    bm25_search,
    build_term_index,
    search_terms,
    term_stats,
)

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
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    build_term_index(docs, "postings_b", n_buckets=N_BUCKETS)
    yield spark
    spark.sql("DROP TABLE IF EXISTS postings_b")
    spark.sql("DROP TABLE IF EXISTS postings_b_meta")


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
        stats = term_stats(spark, "postings_b")
        stats.collect()
        plan = stats._jdf.queryExecution().executedPlan().toString()
        final = plan.split("== Initial Plan ==")[0]
        assert "Exchange hashpartitioning(term" not in final, final[:1200]
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_persisted_index_matches_inline_search(postings_table):
    """Conjunctive AND over the persisted index == the suite entry's
    inline-postings result (same HAVING count = |terms| shape); OR
    mode keeps partial matches."""
    spark = postings_table
    terms = ["spark", "table"]
    via_table = search_terms(spark, "postings_b", terms, mode="and").select(
        "doc_id", F.col("total_tf").alias("score")
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
    n_or = search_terms(spark, "postings_b", terms, mode="or").count()
    n_and = via_table.count()
    assert n_or >= n_and


def test_bm25_over_persisted_index_matches_suite_entry(postings_table):
    """`bm25_search` over the persisted index (denormalized df/dl +
    broadcast meta — row-local scoring, one doc aggregation) is
    row-identical to the driver-graded ext_bm25_search suite entry:
    the oracle evidence transfers to the persisted path."""
    from marketing_etl_analytics_spark.suite.ext_pipeline import (
        _IDX_TERMS,
        ext_bm25_search,
    )

    spark = postings_table
    via_index = bm25_search(spark, "postings_b", list(_IDX_TERMS))
    # graded via the ext_search_suite merged row since late-r5; the
    # single stays callable and must keep matching the persisted path
    suite = ext_bm25_search(spark, SF_DIR)
    cols = ["doc_id", "n_terms", "score"]
    got = [tuple(r[c] for c in cols) for r in via_index.collect()]
    want = [tuple(r[c] for c in cols) for r in suite.collect()]
    assert got == want  # ordered: same ranking, same scores


def test_suite_search_entries_scan_pruned_buckets(spark):
    """r5 (VERDICT r4 #4): the graded ext_inverted_index /
    ext_bm25_search entries themselves serve from the persisted
    bucketed index — their executed plans must show a bucket-pruned
    scan (SelectedBucketsCount k < n), not a corpus re-tokenization."""
    import re

    from marketing_etl_analytics_spark.suite.ext_pipeline import (
        ext_bm25_search,
        ext_inverted_index,
    )

    for name, fn in (
        ("ext_inverted_index", ext_inverted_index),
        ("ext_bm25_search", ext_bm25_search),
    ):
        df = fn(spark, SF_DIR)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
        assert m, f"{name}: no bucket pruning in plan\n{plan[:800]}"
        assert int(m.group(1)) < int(m.group(2)), (name, m.groups())
