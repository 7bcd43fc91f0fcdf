"""Pure-Python twins for the two round-9 LM/clustering entries —
independent of the DuckDB oracle (which the differential gate already
replays): recompute interpolated Kneser-Ney cross-entropies and
lattice-quantized Lloyd k-means from the raw parquet in plain Python
and compare exactly.
"""

from __future__ import annotations

import hashlib
import math

import pytest

SF_DIR = "/root/testdata/sf0.001"


def _round6(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6


def _round4(x: float) -> float:
    return math.floor(x * 1e4 + 0.5) / 1e4


@pytest.fixture(scope="module")
def raw_docs(spark):
    return [
        (r["doc_id"], r["text"], r["lang"])
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    ]


@pytest.fixture(scope="module")
def raw_embs(spark):
    return sorted(
        (r["vec_id"], list(r["embedding"]))
        for r in spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    )


def test_kneser_ney_matches_python(spark, raw_docs):
    from marketing_etl_analytics_spark.suite.ext_pipeline import (
        KN_MIN_COUNT,
        ext_lm_kneser_ney,
    )

    def is_train(doc_id: int) -> bool:
        return doc_id % 10 < 7

    # raw bigrams per doc
    doc_bg: dict[int, list[tuple[str, str]]] = {}
    for doc_id, text, _ in raw_docs:
        toks = text.lower().split(" ")
        if len(toks) < 2:
            continue
        doc_bg[doc_id] = [(toks[i], toks[i + 1]) for i in range(len(toks) - 1)]

    # vocab: words by TRAIN bigram-context occurrence >= floor
    cw: dict[str, int] = {}
    for doc_id, bgs in doc_bg.items():
        if is_train(doc_id):
            for w1, _ in bgs:
                cw[w1] = cw.get(w1, 0) + 1
    vocab = {w for w, c in cw.items() if c >= KN_MIN_COUNT}

    def remap(w: str) -> str:
        return w if w in vocab else "<unk>"

    # model tables from remapped TRAIN bigrams
    big: dict[tuple[str, str], int] = {}
    for doc_id, bgs in doc_bg.items():
        if is_train(doc_id):
            for w1, w2 in bgs:
                k = (remap(w1), remap(w2))
                big[k] = big.get(k, 0) + 1
    ctx: dict[str, int] = {}
    n1fwd: dict[str, int] = {}
    cont: dict[str, int] = {}
    for (m1, m2), c in big.items():
        ctx[m1] = ctx.get(m1, 0) + c
        n1fwd[m1] = n1fwd.get(m1, 0) + 1
        cont[m2] = cont.get(m2, 0) + 1
    cv = len(big) + len({m2 for _, m2 in big}) + 1

    def lnp6(m1: str, m2: str) -> int:
        c0 = big.get((m1, m2), 0)
        cont0 = cont.get(m2, 0)
        if m1 not in ctx:
            num, den = cont0 + 1, cv
        else:
            num = max(4 * c0 - 3, 0) * cv + 3 * n1fwd[m1] * (cont0 + 1)
            den = 4 * ctx[m1] * cv
        return round(_round6(math.log(num / den)) * 1_000_000)

    expect = {}
    for doc_id, bgs in doc_bg.items():
        mapped: dict[tuple[str, str], int] = {}
        for w1, w2 in bgs:
            k = (remap(w1), remap(w2))
            mapped[k] = mapped.get(k, 0) + 1
        n = sum(mapped.values())
        n_unk = sum(
            c for (m1, m2), c in mapped.items()
            if m1 == "<unk>" or m2 == "<unk>"
        )
        # exact decimal(…,6) sum in integer micro-units, then the two
        # mirrored IEEE ops (cast-to-double, divide)
        s_mu = sum(c * lnp6(m1, m2) for (m1, m2), c in mapped.items())
        ce = _round6(-(s_mu / 1e6) / n)
        expect[doc_id] = (n, n_unk, _round4(n_unk / n), ce)

    rows = ext_lm_kneser_ney(spark, SF_DIR).collect()
    got = {
        r["doc_id"]: (r["n_bigrams"], r["n_unk"], r["unk_rate"],
                      r["cross_entropy_kn"])
        for r in rows
    }
    assert got == expect

    # tertile cut: ~1/3 head, ~2/3 kept (percentile interpolation is
    # the engines' shared exact form; the twin asserts the semantics)
    kept = sum(r["keep_kn"] for r in rows)
    assert abs(kept - 2 / 3 * len(rows)) <= max(2, 0.02 * len(rows))
    heads = sum(1 for r in rows if r["ppl_bucket"] == "head")
    assert abs(heads - len(rows) / 3) <= max(2, 0.02 * len(rows))
    # bucket boundaries are consistent with the CE ordering
    ce_sorted = sorted(r["cross_entropy_kn"] for r in rows)
    max_head = max(
        (r["cross_entropy_kn"] for r in rows if r["ppl_bucket"] == "head"),
        default=None,
    )
    min_tail = min(
        (r["cross_entropy_kn"] for r in rows if r["ppl_bucket"] == "tail"),
        default=None,
    )
    assert max_head is None or min_tail is None or max_head < min_tail
    assert ce_sorted[0] >= 0.0  # probabilities < 1 => positive CE


def test_kneser_ney_discount_redistributes_vs_addone(spark):
    """Model-quality sanity: on the same corpus, KN assigns HIGHER
    probability (lower CE) than add-one to frequent in-vocab text and
    never produces a zero/negative probability."""
    from marketing_etl_analytics_spark.suite.ext_pipeline import (
        ext_lm_kneser_ney,
        ext_lm_perplexity,
    )

    kn = {r["doc_id"]: r["cross_entropy_kn"]
          for r in ext_lm_kneser_ney(spark, SF_DIR).collect()}
    a1 = {r["doc_id"]: r["cross_entropy"]
          for r in ext_lm_perplexity(spark, SF_DIR).collect()}
    assert set(kn) == set(a1)
    # add-one flattens everything toward uniform; KN should beat it on
    # the corpus average (it was designed to) — a distribution-level
    # claim, not per-doc
    assert sum(kn.values()) / len(kn) < sum(a1.values()) / len(a1)
    assert all(v > 0 for v in kn.values())


def test_kmeans_matches_python(spark, raw_embs):
    from marketing_etl_analytics_spark.suite.ext_select import (
        _KM_ITERS,
        _KM_K,
        ext_cluster_kmeans,
    )

    pts = {
        vid: [math.floor(float(x) * 1e6 + 0.5) for x in emb]
        for vid, emb in raw_embs
    }
    dim = len(next(iter(pts.values())))

    def md5s(v: int) -> str:
        return hashlib.md5(str(v).encode()).hexdigest()

    seeds = sorted(pts, key=lambda v: (md5s(v), v))[:_KM_K]
    cents = [list(pts[v]) for v in seeds]

    def nearest(xq: list[int]) -> tuple[int, int]:
        best = None
        for k, c in enumerate(cents):
            d2 = sum((x - cc) * (x - cc) for x, cc in zip(xq, c))
            if best is None or (d2, k) < best:
                best = (d2, k)
        return best[1], best[0]

    for _ in range(_KM_ITERS):
        sums = {k: [0] * dim for k in range(_KM_K)}
        counts = {k: 0 for k in range(_KM_K)}
        for xq in pts.values():
            k, _d2 = nearest(xq)
            counts[k] += 1
            for j, x in enumerate(xq):
                sums[k][j] += x
        for k in range(_KM_K):
            if counts[k] > 0:
                cents[k] = [
                    math.floor(float(s) / counts[k] + 0.5)
                    for s in sums[k]
                ]

    stats = {k: [0, 0] for k in range(_KM_K)}
    for xq in pts.values():
        k, d2 = nearest(xq)
        stats[k][0] += 1
        stats[k][1] += d2
    expect = {}
    for k, c in enumerate(cents):
        n, sd2 = stats[k]
        expect[k] = (
            n,
            _round6(float(sd2) / 1e12),
            _round6(math.sqrt(float(sum(v * v for v in c))) / 1e6),
        )

    rows = ext_cluster_kmeans(spark, SF_DIR).collect()
    got = {
        r["cluster"]: (r["n_assigned"], r["inertia"], r["centroid_l2"])
        for r in rows
    }
    assert got == expect
    assert sum(n for n, _, _ in got.values()) == len(pts)


def test_kmeans_iterations_do_not_increase_inertia(spark):
    """Lloyd's invariant: total inertia is non-increasing round over
    round — checked by replaying the Spark entry's own lattice math in
    Python at 1, 2, 3 iterations over the sf0.001 vectors."""
    import marketing_etl_analytics_spark.suite.ext_select as sel

    emb = [
        list(r["embedding"])
        for r in spark.read.parquet(
            f"{SF_DIR}/embeddings.parquet"
        ).collect()
    ]
    ids = list(range(len(emb)))
    pts = {
        i: [math.floor(float(x) * 1e6 + 0.5) for x in e]
        for i, e in zip(ids, emb)
    }
    k = sel._KM_K
    seeds = sorted(
        pts, key=lambda v: (hashlib.md5(str(v).encode()).hexdigest(), v)
    )[:k]

    def run(iters: int) -> int:
        cents = [list(pts[v]) for v in seeds]
        for _ in range(iters):
            sums = {ki: [0] * len(cents[0]) for ki in range(k)}
            counts = {ki: 0 for ki in range(k)}
            for xq in pts.values():
                best = min(
                    (sum((x - c) * (x - c) for x, c in zip(xq, cc)), ki)
                    for ki, cc in enumerate(cents)
                )
                counts[best[1]] += 1
                for j, x in enumerate(xq):
                    sums[best[1]][j] += x
            for ki in range(k):
                if counts[ki]:
                    cents[ki] = [
                        math.floor(float(s) / counts[ki] + 0.5)
                        for s in sums[ki]
                    ]
        return sum(
            min(
                sum((x - c) * (x - c) for x, c in zip(xq, cc))
                for cc in cents
            )
            for xq in pts.values()
        )

    inertias = [run(i) for i in (1, 2, 3)]
    # lattice quantization can cost a few units, but the Lloyd descent
    # must dominate: allow no more than a 0.1% uptick
    assert inertias[1] <= inertias[0] * 1.001
    assert inertias[2] <= inertias[1] * 1.001
