"""Semantic unit tests for the scale-path operators (suite.ext_scale).

The differential suite proves Spark==DuckDB; these prove both are
*right*: SimHash flags a true near-duplicate pair, sessionization
splits exactly at the gap threshold, and IVF probing returns a subset
of the brute-force neighbors.
"""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F

from marketing_etl_analytics_spark.suite.ext_scale import (
    SESSION_GAP_US,
    ext_ann_cosine_for_ivf_check,
    ext_dedup_simhash_frame,
    sessionize_batch,
)


@pytest.fixture(scope="module")
def docs(spark):
    base = (
        "the quick brown fox jumps over the lazy dog near the river bank "
        "while birds sing in the tall green trees above"
    )
    rows = [
        (1, base),
        (2, base.replace("green", "blue")),  # near-dup: 1 token changed
        (3, "completely different text about spark catalyst optimizer internals"),
        (4, "another unrelated document counting tokens and shingles for tests"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_simhash_flags_near_dup_pair(docs):
    pairs = ext_dedup_simhash_frame(docs).collect()
    found = {(r.doc_a, r.doc_b) for r in pairs}
    assert (1, 2) in found
    by_pair = {(r.doc_a, r.doc_b): r.hamming for r in pairs}
    assert by_pair[(1, 2)] <= 2
    # unrelated docs must not pair with the near-dup cluster
    assert not any(3 in p or 4 in p for p in found)


def test_sessionize_splits_on_gap(spark):
    t0 = dt.datetime(2025, 1, 1, 12, 0, 0)
    gap = dt.timedelta(microseconds=SESSION_GAP_US)
    rows = [
        (1, 10, t0, 1.0),
        (2, 10, t0 + dt.timedelta(minutes=10), 2.0),          # same session
        (3, 10, t0 + dt.timedelta(minutes=10) + gap, 4.0),    # exactly gap: same
        (4, 10, t0 + dt.timedelta(hours=3), 8.0),             # new session
        (5, 20, t0, 16.0),                                    # other user
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    got = {
        (r.user_id, r.session_no): (r.n_events, r.total_value)
        for r in sessionize_batch(ev).collect()
    }
    assert got[(10, 1)] == (3, 7.0)
    assert got[(10, 2)] == (1, 8.0)
    assert got[(20, 1)] == (1, 16.0)


def test_ivf_results_subset_of_brute_force(spark):
    sf_dir = "/root/testdata/sf0.001"
    from marketing_etl_analytics_spark.suite.ext_scale import ext_ann_ivf

    ivf = ext_ann_ivf(spark, sf_dir).collect()
    brute = ext_ann_cosine_for_ivf_check(spark, sf_dir).collect()
    brute_cos = {(r.qid, r.cid): r.cosine for r in brute}
    # every IVF neighbor must carry the exact brute-force cosine, and
    # per-query recall vs the true top-5 must be positive
    for r in ivf:
        assert brute_cos[(r.qid, r.cid)] == r.cosine
    true_top = {}
    for r in sorted(brute, key=lambda r: (r.qid, -r.cosine, r.cid)):
        true_top.setdefault(r.qid, [])
        if len(true_top[r.qid]) < 5:
            true_top[r.qid].append(r.cid)
    hits = sum(
        1 for r in ivf if r.cid in true_top.get(r.qid, [])
    )
    assert hits >= len(true_top)  # at least ~1 true neighbor per query on average


def test_ann_recall_floor(spark):
    """IVF probe search must retain a useful fraction of the brute-force
    top-5 (recall floor 0.2 mean at the correctness SF; measured 0.32
    at sf0.01 / 0.54 at sf0.1 — scale helps because clusters tighten)."""
    from marketing_etl_analytics_spark.suite.ext_scale import ext_ann_recall

    rows = ext_ann_recall(spark, "/root/testdata/sf0.01").collect()
    assert len(rows) == 10
    mean_recall = sum(r.recall for r in rows) / len(rows)
    assert mean_recall >= 0.2, mean_recall


def test_pq_recall_floor(spark):
    """The PQ compressed scan + exact re-rank must retain a useful
    fraction of the brute-force top-5 (floor 0.5; measured 0.80 at
    sf0.001, 0.68 at sf0.01 — 8-byte codes on near-orthogonal synthetic
    embeddings are the hard case for PQ, and the honest number)."""
    from marketing_etl_analytics_spark.suite.ext_scale import ext_ann_pq_adc

    rows = ext_ann_pq_adc(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 50
    hit = sum(r.in_exact_topk for r in rows) / len(rows)
    assert hit >= 0.5, hit
    # approximate and exact scores agree in ballpark on the hits
    for r in rows:
        assert r.approx_cos is not None and r.exact_cos is not None
