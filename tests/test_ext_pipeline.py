"""Curation-pipeline operators: planted-case behavior + plan shape.

The differential suite already proves oracle parity on the driver
testdata; these tests pin the *semantics* on planted inputs (a known
eval-set clone must flag as contaminated, a degenerate repeated doc
must be dropped) and the *plan* (the corpus side of decontamination
must never shuffle on content — eval n-grams broadcast).
"""

from __future__ import annotations

from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from marketing_etl_analytics_spark.suite.ext_pipeline import (
    ext_doc_filters,
    ext_sample_stratified,
)

DOCS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
    ]
)

EVAL_TEXT = (
    "the quick brown fox jumps over the lazy dog near the riverbank at dawn"
)
CLEAN_TEXT = (
    "completely unrelated prose about glacier formation and tectonic drift "
    "across several million years of slow geological change"
)


def _write_docs(spark, tmp_path, rows):
    sf_dir = str(tmp_path)
    spark.createDataFrame(rows, DOCS_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{sf_dir}/documents.parquet")
    return sf_dir


def test_decontaminate_flags_planted_clone(spark, tmp_path):
    # doc_id 0 -> eval split (0 % 97 == 0); doc 1 is its exact clone,
    # doc 2 shares nothing with the eval split
    rows = [
        (0, EVAL_TEXT, "en", "bench"),
        (1, EVAL_TEXT, "en", "crawl"),
        (2, CLEAN_TEXT, "en", "crawl"),
    ]
    sf_dir = _write_docs(spark, tmp_path, rows)
    out = {r.doc_id: r for r in ext_doc_filters(spark, sf_dir).collect()}
    assert set(out) == {0, 1, 2}
    # eval docs are not scored: decontamination columns NULL
    assert out[0].is_eval == 1 and out[0].contaminated is None
    assert out[0].overlap_ratio is None
    assert out[1].contaminated == 1 and out[1].overlap_ratio == 1.0
    assert out[1].n_overlap == out[1].n_shingles
    assert out[2].contaminated == 0 and out[2].n_overlap == 0


def test_decontaminate_broadcasts_eval_ngrams(spark):
    df = ext_doc_filters(spark, "/root/testdata/sf0.001")
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the corpus-side shingle rows must meet the eval set via a
    # broadcast hash join, never a sort-merge shuffle on the hash
    assert "BroadcastHashJoin" in plan


def test_sample_stratified_rates_and_weights(spark):
    out = ext_sample_stratified(spark, "/root/testdata/sf0.001").collect()
    assert out, "sample should be non-empty"
    by_lang = {"en": 0.5, "es": 0.25, "de": 0.125}
    for r in out:
        expected = by_lang.get(r.lang, 0.0625)
        assert r.rate == expected
        assert 0.0 <= r.sample_key < r.rate
        assert r.weight == 1.0 / expected


def test_sample_stratified_is_nested(spark, tmp_path):
    # same hash key at a lower rate selects a strict subset: the
    # composability contract that lets a 1% dev sample live inside
    # the 50% training sample
    rows = [(i, CLEAN_TEXT, "en", "crawl") for i in range(1, 400)]
    sf_dir = _write_docs(spark, tmp_path, rows)
    full = {r.doc_id for r in ext_sample_stratified(spark, sf_dir).collect()}
    rows_es = [(i, CLEAN_TEXT, "es", "crawl") for i in range(1, 400)]
    sf_dir2 = _write_docs(spark, tmp_path / "es", rows_es)
    quarter = {r.doc_id for r in ext_sample_stratified(spark, sf_dir2).collect()}
    assert quarter <= full  # rate 0.25 sample nests inside rate 0.5 sample
    assert len(quarter) < len(full)


def test_repetition_filter_drops_degenerate_doc(spark, tmp_path):
    rows = [
        (1, "spam spam spam spam spam spam spam spam", "en", "crawl"),
        (2, CLEAN_TEXT, "en", "crawl"),
    ]
    sf_dir = _write_docs(spark, tmp_path, rows)
    out = {r.doc_id: r for r in ext_doc_filters(spark, sf_dir).collect()}
    assert out[1].keep_repetition == 0
    # 8 identical words -> 7 2-grams, 1 distinct -> 6/7 duplicated
    assert out[1].top_word_frac == 1.0 and out[1].dup_2gram_frac == 0.8571
    assert out[2].keep_repetition == 1
    assert out[2].dup_word_frac < 0.3
