"""Pure-Python replay verification for ext_quality_perceptron.

The entry's DuckDB oracle replays the sharded per-sample folds as one
recursive CTE per epoch; its recursion depth is the max shard length,
which makes the one-shot oracle a harness boundary at 100x-class SFs
(the dsir_sliced_oracle precedent). This tool is the large-SF
verification path the entry docstring promises: recompute the full
iterative-parameter-mixing perceptron (McDonald, Hall & Mann 2010)
from the raw parquet in first-principles Python (no imports from the
engine's ext/classifier.py), run the UNMODIFIED Spark entry on the
same directory, and compare the complete output multiset exactly.

tests/test_perceptron.py imports ``replay_ipm`` from here and pins it
against both the Spark entry and the recursive-CTE oracle at the
graded SFs, so this replay and the oracle are interchangeable
arbiters.

Usage: python tools/perceptron_replay.py [sf_dir]
"""

from __future__ import annotations

import hashlib
import sys
import time
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from marketing_etl_analytics_spark.ext.classifier import (  # noqa: E402
    PCTR_B,
    PCTR_EPOCHS,
    PCTR_SHARDS,
    PCTR_STOP_DEN,
    PCTR_STOPWORDS,
    PCTR_TRAIN_LT,
    PCTR_TRAIN_MOD,
)


def _md5hex(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def replay_ipm(
    docs: list[tuple[int, str]],
    b: int = PCTR_B,
    epochs: int = PCTR_EPOCHS,
    s: int = PCTR_SHARDS,
) -> dict:
    """First-principles IPM perceptron over (doc_id, text) rows.
    Returns weights (scale s**epochs), bias, per-epoch mistakes, and
    eval-split (doc_id, y, margin, pred) rows. Token-bucket md5s are
    memoized per distinct token (the corpus vocabulary is tiny next
    to the token stream)."""
    bucket_memo: dict[str, int] = {}

    def bucket(tok: str) -> int:
        bk = bucket_memo.get(tok)
        if bk is None:
            bk = int(_md5hex(tok)[:6], 16) % b
            bucket_memo[tok] = bk
        return bk

    feat: dict[int, dict[int, int]] = {}
    lab: dict[int, int] = {}
    for doc_id, text in docs:
        toks = text.lower().split(" ")
        n_stop = sum(1 for t in toks if t in PCTR_STOPWORDS)
        lab[doc_id] = 1 if PCTR_STOP_DEN * n_stop - len(toks) >= 0 else -1
        f: dict[int, int] = defaultdict(int)
        for t in toks:
            f[bucket(t)] += 1
        feat[doc_id] = dict(f)

    shards: list[list[tuple[str, int]]] = [[] for _ in range(s)]
    for doc_id in feat:
        if doc_id % PCTR_TRAIN_MOD < PCTR_TRAIN_LT:
            sh = int(_md5hex(f"pshard:{doc_id}")[:6], 16) % s
            shards[sh].append((_md5hex(f"pord:{doc_id}"), doc_id))
    for rows in shards:
        rows.sort()

    w = [0] * b
    bias = 0
    history = []
    for e in range(1, epochs + 1):
        step = s ** (e - 1)
        mixed_w = [0] * b
        mixed_b = 0
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
                        lw[k] += step * y * v
                    lb += step * y
            for j in range(b):
                mixed_w[j] += lw[j]
            mixed_b += lb
        w, bias = mixed_w, mixed_b
        history.append((e, mis_total))

    ev = []
    for doc_id in sorted(feat):
        if doc_id % PCTR_TRAIN_MOD < PCTR_TRAIN_LT:
            continue
        f = feat[doc_id]
        m = bias + sum(w[k] * v for k, v in f.items())
        ev.append((doc_id, lab[doc_id], m, 1 if m > 0 else -1))
    return {"w": w, "bias": bias, "history": history, "eval": ev}


def replay_rows(docs: list[tuple[int, str]]) -> list[tuple]:
    """The replay rendered in the entry's exact output schema
    (kind, id, lbl, val, extra)."""
    ref = replay_ipm(docs)
    n_train = sum(
        1 for d, _ in docs if d % PCTR_TRAIN_MOD < PCTR_TRAIN_LT
    )
    rows = [("weight", j, -9, ref["w"][j], -9) for j in range(PCTR_B)]
    rows.append(("bias", -1, -9, ref["bias"], -9))
    rows.extend(("epoch", e, -9, mis, n_train) for e, mis in ref["history"])
    rows.extend(
        ("eval", d, y, m, p) for d, y, m, p in ref["eval"]
    )
    return rows


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    import duckdb

    t0 = time.perf_counter()
    docs = duckdb.connect().execute(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'"
        if not Path(f"{sf_dir}/documents.parquet").is_dir()
        else f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet/**/*.parquet'"
    ).fetchall()
    ref = sorted(replay_rows(docs))
    t_replay = time.perf_counter() - t0
    print(
        f"[replay] {len(docs)} docs -> {len(ref)} rows in {t_replay:.1f}s",
        file=sys.stderr,
        flush=True,
    )

    from marketing_etl_analytics_spark.session import get_spark
    from marketing_etl_analytics_spark.suite.ext_select import (
        ext_quality_perceptron,
    )

    spark = get_spark()
    t0 = time.perf_counter()
    got = sorted(
        tuple(r) for r in ext_quality_perceptron(spark, sf_dir).collect()
    )
    t_spark = time.perf_counter() - t0
    print(f"[spark] {len(got)} rows in {t_spark:.1f}s",
          file=sys.stderr, flush=True)

    if got == ref:
        print(
            f"PASS ext_quality_perceptron replay: rows={len(got)} "
            f"(replay {t_replay:.1f}s, spark {t_spark:.1f}s)"
        )
    else:
        extra = [r for r in got if r not in set(ref)][:5]
        missing = [r for r in ref if r not in set(got)][:5]
        print(f"FAIL: spark-only={extra} replay-only={missing}")
        sys.exit(1)


if __name__ == "__main__":
    main()
