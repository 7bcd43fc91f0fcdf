"""Sequence packing: the two-phase distributed prefix scan equals the
naive global-window spelling, and the packed layout is self-consistent
(contiguous offsets, correct sequence spans)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from marketing_etl_analytics_spark.ext.text import pack_sequences
from marketing_etl_analytics_spark.suite import SUITE

SF_DIR = "/root/testdata/sf0.01"
SEQ_LEN = 128


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_distributed_scan_equals_naive_global_window(spark):
    """The scale path (range partition -> partial totals -> broadcast
    offsets -> per-partition cumsum) must compute the IDENTICAL global
    prefix sum as the single-partition window it replaces."""
    docs = _docs(spark)
    dist = pack_sequences(docs, seq_len=SEQ_LEN, n_parts=7)
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    naive = (
        docs.select(
            "doc_id",
            F.size(F.split(F.lower("text"), " ")).cast("long").alias("n_tokens"),
        )
        .withColumn("tok_end", F.sum("n_tokens").over(w).cast("long"))
        .select(
            "doc_id",
            "n_tokens",
            (F.col("tok_end") - F.col("n_tokens")).alias("tok_start"),
        )
    )
    got = {r["doc_id"]: (r["n_tokens"], r["tok_start"]) for r in dist.collect()}
    want = {r["doc_id"]: (r["n_tokens"], r["tok_start"]) for r in naive.collect()}
    assert got == want


def test_packing_layout_invariants(spark):
    rows = sorted(
        SUITE["ext_pack_sequences"].fn(spark, SF_DIR).collect(),
        key=lambda r: r["doc_id"],
    )
    # contiguity: each doc starts exactly where the previous ended
    pos = 0
    for r in rows:
        assert r["tok_start"] == pos
        pos += r["n_tokens"]
        assert r["n_tokens"] >= 1
        # sequence math
        assert r["first_seq"] == r["tok_start"] // SEQ_LEN
        assert r["offset_in_first"] == r["tok_start"] % SEQ_LEN
        last = (r["tok_start"] + r["n_tokens"] - 1) // SEQ_LEN
        assert r["n_seqs"] == last - r["first_seq"] + 1
    # total stream length covers ceil(total/SEQ_LEN) sequences, and
    # every sequence id in range is spanned by at least one doc
    n_seq_total = (pos + SEQ_LEN - 1) // SEQ_LEN
    covered = set()
    for r in rows:
        covered.update(range(r["first_seq"], r["first_seq"] + r["n_seqs"]))
    assert covered == set(range(n_seq_total))


def test_partition_count_does_not_change_result(spark):
    """The scan is exact for ANY partitioning — 1 partition (degenerate
    serial case) and a wide split agree bit-for-bit."""
    docs = _docs(spark).limit(200)
    a = pack_sequences(docs, seq_len=64, n_parts=1).collect()
    b = pack_sequences(docs, seq_len=64, n_parts=13).collect()
    key = lambda rs: sorted(tuple(r) for r in rs)  # noqa: E731
    assert key(a) == key(b)
