"""ext_lm_perplexity (CCNet-style bigram-LM quality filter):
algorithmic properties plus a from-first-principles Python replay of
one document's cross-entropy (same rounding discipline), so the suite
entry's arithmetic is pinned independently of the DuckDB oracle."""

from __future__ import annotations

import math
from collections import Counter

from marketing_etl_analytics_spark.suite import SUITE
from marketing_etl_analytics_spark.suite.ext_pipeline import (
    _LM_MIN_COUNT,
    _LM_TRAIN_PRED,
)

SF_DIR = "/root/testdata/sf0.01"


def _pround(x: float, nd: int) -> float:
    scale = float(10**nd)
    return math.floor(x * scale + 0.5) / scale


def _result(spark):
    return SUITE["ext_lm_perplexity"].fn(spark, SF_DIR).collect()


def test_tertile_buckets_and_keep_verdict(spark):
    rows = _result(spark)
    n = len(rows)
    assert n == 500
    by_bucket = Counter(r["ppl_bucket"] for r in rows)
    assert set(by_bucket) == {"head", "middle", "tail"}
    # interpolated tertiles: each bucket holds roughly a third
    for b in ("head", "middle", "tail"):
        assert by_bucket[b] >= 0.2 * n, (b, by_bucket)
    # keep verdict is exactly "not tail"
    for r in rows:
        assert r["keep_lm"] == (0 if r["ppl_bucket"] == "tail" else 1)
    # bucket ordering is consistent with the score
    max_head = max(r["cross_entropy"] for r in rows if r["ppl_bucket"] == "head")
    min_mid = min(r["cross_entropy"] for r in rows if r["ppl_bucket"] == "middle")
    min_tail = min(r["cross_entropy"] for r in rows if r["ppl_bucket"] == "tail")
    assert max_head <= min_mid <= min_tail


def test_oov_is_nonzero_and_bounded(spark):
    rows = _result(spark)
    assert sum(r["n_oov"] for r in rows) > 0  # the filter has signal
    for r in rows:
        assert 0 <= r["n_oov"] <= r["n_bigrams"]
        assert 0.0 <= r["oov_rate"] <= 1.0
        assert r["cross_entropy"] > 0.0


def test_cross_entropy_replays_from_first_principles(spark):
    """Recompute one document's score in pure Python with the same
    rounding discipline (6-dp snap per distinct ln argument, exact
    6-dp weighted mean) and match the engine bit-for-bit."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()

    def bigrams(text: str) -> list[str]:
        w = text.lower().split(" ")
        return [f"{a} {b}" for a, b in zip(w, w[1:])]

    train = Counter()
    for d in docs:
        if d["doc_id"] % 10 < 7:  # _LM_TRAIN_PRED
            train.update(bigrams(d["text"]))
    assert _LM_TRAIN_PRED == "doc_id % 10 < 7"
    t_tokens = sum(train.values())
    vocab = {b: c for b, c in train.items() if c >= _LM_MIN_COUNT}
    denom = t_tokens + len(vocab) + 1

    got = {r["doc_id"]: r for r in _result(spark)}
    for d in docs[:25]:
        counts = Counter(bigrams(d["text"]))
        wsum = 0  # exact integer arithmetic in 1e-6 units
        n = 0
        for b, cnt in counts.items():
            lnp = _pround(math.log((vocab.get(b, 0) + 1) / denom), 6)
            wsum += cnt * round(lnp * 1_000_000)
            n += cnt
        expect = _pround(-(wsum / 1_000_000) / n, 6)
        r = got[d["doc_id"]]
        assert r["n_bigrams"] == n
        assert r["cross_entropy"] == expect, (d["doc_id"], r["cross_entropy"], expect)


def test_quantile_sketch_error_bounded_by_bucket_width(spark):
    """The fixed-width histogram's interpolated estimate can never be
    off by more than one bucket width from the exact-rank value; the
    '(all)' row comes from the bucket-wise histogram MERGE, so the
    bound holding there pins mergeability too."""
    from marketing_etl_analytics_spark.suite.timeseries import (
        QH_W,
        ext_sketch_quantile,
    )

    rows = ext_sketch_quantile(spark, SF_DIR).collect()
    assert len(rows) == 18  # 5 priorities + '(all)', x p50/p90/p99
    assert {r["grp"] for r in rows} == {
        "(all)", "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW",
    }
    for r in rows:
        # <= is the true interpolation bound: when the selected rank
        # is the last element of a bucket whose values all sit on the
        # lower bucket edge, est = (bucket+1)*W while exact =
        # bucket*W — err exactly W (ADVICE r5: strict < was a
        # data-dependent flake on exact bucket-multiple prices)
        assert abs(r["err_cents"]) <= QH_W, r
        assert r["n"] > 0


def test_library_api_matches_suite(spark):
    """ext/text.py::lm_bigram_counts + lm_perplexity_scores (the
    column-parameterized engine API) reproduce the graded entry's
    score columns exactly."""
    from pyspark.sql import functions as F

    from marketing_etl_analytics_spark.ext import (
        lm_bigram_counts,
        lm_perplexity_scores,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    lib = lm_perplexity_scores(
        lm_bigram_counts(docs), train=F.expr(_LM_TRAIN_PRED), min_count=_LM_MIN_COUNT
    )
    cols = ["doc_id", "n_bigrams", "n_oov", "cross_entropy"]
    suite_rows = sorted(
        (r["doc_id"], r["n_bigrams"], r["n_oov"], r["cross_entropy"])
        for r in _result(spark)
    )
    lib_rows = sorted(tuple(r[c] for c in cols) for r in lib.collect())
    assert lib_rows == suite_rows
