"""Pure-Python twin for ext_quality_perceptron — independent of the
DuckDB recursive-CTE oracle (which the differential gate already
replays): recompute the iterative-parameter-mixing perceptron
(McDonald, Hall & Mann 2010) from the raw parquet in plain Python and
compare the graded output exactly. The replay itself lives in
tools/perceptron_replay.py (it is also the large-SF verification
path — the recursive oracle's depth is the max shard length, a
measured harness boundary at 100x, the dsir_sliced_oracle precedent)
and is a first-principles reimplementation: no imports from
ext/classifier.py inside the replay.
"""

from __future__ import annotations

import hashlib
from collections import defaultdict

import pytest

from marketing_etl_analytics_spark.ext.classifier import (
    PCTR_B,
    PCTR_EPOCHS,
    PCTR_STOP_DEN,
    PCTR_STOPWORDS,
    PCTR_TRAIN_LT,
    PCTR_TRAIN_MOD,
)
from tools.perceptron_replay import replay_ipm

SF_DIR = "/root/testdata/sf0.001"


def _md5hex(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


@pytest.fixture(scope="module")
def raw_docs(spark):
    return [
        (r["doc_id"], r["text"])
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    ]


@pytest.fixture(scope="module")
def entry_rows(spark):
    from marketing_etl_analytics_spark.suite.ext_select import (
        ext_quality_perceptron,
    )

    return ext_quality_perceptron(spark, SF_DIR).collect()


def test_perceptron_matches_python(entry_rows, raw_docs):
    ref = replay_ipm(raw_docs)
    got_w = {
        r["id"]: r["val"] for r in entry_rows if r["kind"] == "weight"
    }
    assert got_w == {j: ref["w"][j] for j in range(PCTR_B)}
    (got_bias,) = [r["val"] for r in entry_rows if r["kind"] == "bias"]
    assert got_bias == ref["bias"]
    got_eps = sorted(
        (r["id"], r["val"]) for r in entry_rows if r["kind"] == "epoch"
    )
    assert got_eps == ref["history"]
    got_ev = sorted(
        (r["id"], r["lbl"], r["val"], r["extra"])
        for r in entry_rows
        if r["kind"] == "eval"
    )
    assert got_ev == ref["eval"]


def test_perceptron_epoch_rows_carry_train_count(entry_rows, raw_docs):
    n_train = sum(
        1 for d, _ in raw_docs if d % PCTR_TRAIN_MOD < PCTR_TRAIN_LT
    )
    extras = {r["extra"] for r in entry_rows if r["kind"] == "epoch"}
    assert extras == {n_train}
    assert (
        len([r for r in entry_rows if r["kind"] == "epoch"]) == PCTR_EPOCHS
    )


def test_perceptron_learns(entry_rows):
    """The IPM mistake counts must decrease from the first epoch to
    the last (the full-batch variant cycles with period 2 — this
    pins that the convergent algorithm is the one wired in), and the
    learned classifier must beat both constant predictors on the
    held-out split."""
    eps = sorted(
        (r["id"], r["val"]) for r in entry_rows if r["kind"] == "epoch"
    )
    assert eps[-1][1] < eps[0][1]
    ev = [r for r in entry_rows if r["kind"] == "eval"]
    acc = sum(1 for r in ev if r["extra"] == r["lbl"]) / len(ev)
    pos_rate = sum(1 for r in ev if r["lbl"] == 1) / len(ev)
    assert acc > max(pos_rate, 1 - pos_rate) + 0.05


def test_shard_scaling_keeps_margin_signs_exact():
    """The S**(e-1) update scaling is exactly uniform parameter
    mixing: running the replay with rescaled integer weights divided
    through by S per mix (exact rationals via fractions) must produce
    identical mistake sequences."""
    from fractions import Fraction

    docs = [
        (0, "the a the a x"),
        (1, "x y z w q r s t u v"),
        (2, "the the a a a"),
        (3, "q w e r t y u i o p"),
        (12, "the a b"),
        (13, "m n b v c x z a s d f g h j k l"),
    ]
    b, s, epochs = PCTR_B, 2, 3

    ref = replay_ipm(docs, b=b, epochs=epochs, s=s)

    # rational-arithmetic reference: true uniform averaging
    feat = {}
    lab = {}
    for doc_id, text in docs:
        toks = text.lower().split(" ")
        n_stop = sum(1 for t in toks if t in PCTR_STOPWORDS)
        lab[doc_id] = 1 if PCTR_STOP_DEN * n_stop - len(toks) >= 0 else -1
        f = defaultdict(int)
        for t in toks:
            f[int(_md5hex(t)[:6], 16) % b] += 1
        feat[doc_id] = dict(f)
    shards: list[list[tuple[str, int]]] = [[] for _ in range(s)]
    for doc_id in feat:
        if doc_id % PCTR_TRAIN_MOD < PCTR_TRAIN_LT:
            shards[int(_md5hex(f"pshard:{doc_id}")[:6], 16) % s].append(
                (_md5hex(f"pord:{doc_id}"), doc_id)
            )
    for rows in shards:
        rows.sort()
    w = [Fraction(0)] * b
    bias = Fraction(0)
    hist = []
    for _ in range(epochs):
        acc_w = [Fraction(0)] * b
        acc_b = Fraction(0)
        mis_total = 0
        for rows in shards:
            lw = list(w)
            lb = bias
            for _, doc_id in rows:
                y = lab[doc_id]
                f = feat[doc_id]
                m = lb + sum(lw[k] * v for k, v in f.items())
                if y * m <= 0:
                    mis_total += 1
                    for k, v in f.items():
                        lw[k] += y * v
                    lb += y
            for j in range(b):
                acc_w[j] += lw[j]
            acc_b += lb
        w = [v / s for v in acc_w]
        bias = acc_b / s
        hist.append(mis_total)
    assert [m for _, m in ref["history"]] == hist
    # and the scaled-integer weights are exactly s**epochs * average
    assert ref["w"] == [int(v * s**epochs) for v in w]
    assert ref["bias"] == int(bias * s**epochs)


def test_perceptron_plan_shapes(spark):
    """Pin the stage shapes the docstrings claim: the docvec build and
    the literal-weight eval scan are zero-shuffle codegen projections
    (no Exchange, no Python eval), and the training table pays exactly
    ONE Exchange (the S-shard repartition the epochs then reuse)."""
    from pyspark.sql import functions as F

    from marketing_etl_analytics_spark.ext.classifier import (
        PCTR_SHARDS,
        margin_col,
        perceptron_docvec,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    docvec = perceptron_docvec(docs)
    plan = docvec._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan

    ev = docvec.filter(F.col("is_train") == 0).select(
        margin_col([1] * 64, 7).alias("margin")
    )
    plan = ev._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan

    train = (
        docvec.filter(F.col("is_train") == 1)
        .repartition(PCTR_SHARDS, F.col("shard"))
        .sortWithinPartitions("shard", "ord_key", "doc_id")
    )
    plan = train._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
