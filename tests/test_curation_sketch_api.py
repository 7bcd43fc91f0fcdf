"""Library API (ext/curation.py, ext/sketches.py) equals the verified
suite entries when parameterized identically — the suite's oracle
evidence transfers to the reusable column-parameterized surface."""

from __future__ import annotations

from pyspark.sql import functions as F

from marketing_etl_analytics_spark.suite import SUITE

SF_DIR = "/root/testdata/sf0.01"


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_chunk_documents_matches_suite(spark):
    from marketing_etl_analytics_spark.ext import chunk_documents

    lib = chunk_documents(_docs(spark)).select(
        "doc_id", "chunk_ord", "n_chunk_tokens", "chunk_hash"
    )
    suite = SUITE["ext_chunk_documents"].fn(spark, SF_DIR)
    cols = ["doc_id", "chunk_ord", "n_chunk_tokens", "chunk_hash"]
    assert _rows(lib, cols) == _rows(suite, cols)
    # chunk_text round-trips: hash of the text column is the hash column
    bad = chunk_documents(_docs(spark)).filter(
        F.md5("chunk_text") != F.col("chunk_hash")
    )
    assert bad.count() == 0


def test_domain_balance_matches_suite(spark):
    from marketing_etl_analytics_spark.ext import domain_balance

    lib = domain_balance(_docs(spark)).withColumnRenamed("lang", "stratum")
    suite = SUITE["ext_domain_balance"].fn(spark, SF_DIR)
    cols = ["doc_id", "stratum", "sample_rank"]
    assert _rows(lib, cols) == _rows(suite, cols)


def test_temperature_sample_matches_suite(spark):
    from marketing_etl_analytics_spark.ext import temperature_sample

    lib = temperature_sample(_docs(spark)).select(
        "doc_id", F.col("lang").alias("stratum")
    )
    suite = SUITE["ext_sample_temperature"].fn(spark, SF_DIR)
    cols = ["doc_id", "stratum"]
    assert _rows(lib, cols) == _rows(suite.select(*cols), cols)


def test_semantic_dedup_matches_suite(spark):
    from marketing_etl_analytics_spark.ext import semantic_dedup

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    lib = semantic_dedup(emb)
    suite = SUITE["ext_semantic_dedup"].fn(spark, SF_DIR)
    cols = ["vec_id", "cluster", "n_dups_to_lower", "is_kept"]
    assert _rows(lib, cols) == _rows(suite, cols)


def test_hll_api_matches_suite(spark):
    from marketing_etl_analytics_spark.ext import hll_estimate, hll_registers

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    regs = hll_registers(ev, "user_id", ["event_type"])
    est = hll_estimate(regs, ["event_type"]).withColumnRenamed("event_type", "grp")
    suite = SUITE["ext_sketch_hll"].fn(spark, SF_DIR).filter(F.col("grp") != "(all)")
    cols = ["grp", "n_zero_registers", "hll_estimate"]
    assert _rows(est, cols) == _rows(suite.select(*cols), cols)


def test_hll_merge_is_lossless(spark):
    """Partial sketches over disjoint splits merge to the whole-data
    sketch — the distributed-aggregation contract."""
    from marketing_etl_analytics_spark.ext import (
        hll_estimate,
        hll_merge,
        hll_registers,
    )

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    whole = hll_estimate(hll_registers(ev, "user_id")).collect()[0]
    parts = hll_merge(
        hll_registers(ev.filter("event_id % 2 = 0"), "user_id").unionAll(
            hll_registers(ev.filter("event_id % 2 = 1"), "user_id")
        )
    )
    merged = hll_estimate(parts).collect()[0]
    assert merged["hll_estimate"] == whole["hll_estimate"]
    assert merged["n_zero_registers"] == whole["n_zero_registers"]


def test_countmin_api_matches_suite(spark):
    from marketing_etl_analytics_spark.ext import countmin_counters, countmin_query

    toks = (
        _docs(spark)
        .select(F.explode(F.split(F.lower("text"), " ")).alias("tok"))
        .filter(F.col("tok") != "")
    )
    counters = countmin_counters(toks, "tok")
    top = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.desc("n"), "tok")
        .limit(20)
    )
    est = countmin_query(counters, top.select("tok"), "tok")
    suite = SUITE["ext_sketch_countmin"].fn(spark, SF_DIR)
    cols = ["token", "cm_estimate"]
    lib = est.withColumnRenamed("tok", "token")
    assert _rows(lib, cols) == _rows(suite.select(*cols), cols)


def test_countmin_query_unseen_probe_estimates_zero(spark):
    """A probe value absent from the sketched data must return an
    estimate (0 unless it collides in ALL d rows), not vanish from
    the output — empty counter cells are zeros, not missing rows."""
    from marketing_etl_analytics_spark.ext import countmin_counters, countmin_query

    data = spark.createDataFrame([("a",)] * 5 + [("b",)] * 2, "v string")
    counters = countmin_counters(data, "v")
    probes = spark.createDataFrame(
        [("a",), ("never-seen-value",)], "v string"
    )
    got = {r["v"]: r["cm_estimate"] for r in countmin_query(counters, probes, "v").collect()}
    assert got["a"] == 5
    assert "never-seen-value" in got
    assert got["never-seen-value"] == 0  # all-4-cell collision is ~(2/512)^4


def test_semantic_dedup_narrow_vectors(spark):
    """The hot-cluster refine degrades gracefully on embeddings
    narrower than the 9..16 hyperplane dims (ANSI element_at would
    otherwise throw): 4-dim vectors cluster and dedup without error,
    with the refine key falling back to the cluster alone."""
    from marketing_etl_analytics_spark.ext import semantic_dedup

    rows = [(i, [float(i % 3 + 1), 1.0, -1.0, 0.5]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semantic_dedup(df, n_centroids=2, cluster_cap=8, threshold=0.99)
    got = out.collect()
    assert len(got) == 40
    assert {r["vec_id"] for r in got} == set(range(40))
