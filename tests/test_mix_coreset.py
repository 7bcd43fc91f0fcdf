"""Pure-Python twins for the two round-9 entries — independent of the
DuckDB oracle (which the differential gate already replays): recompute
UniMax water-filling and greedy k-center selection from the raw
parquet in plain Python and compare exactly.
"""

from __future__ import annotations

import math

import pytest

SF_DIR = "/root/testdata/sf0.001"


def _round(x: float, nd: int) -> float:
    scale = float(10 ** nd)
    return math.floor(x * scale + 0.5) / scale


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


def test_unimax_matches_python(spark, raw_docs):
    from marketing_etl_analytics_spark.suite.ext_select import (
        _BUDGET_DEN,
        _BUDGET_NUM,
        _EPOCH_CAP,
        ext_mix_unimax,
    )

    ntok: dict[str, int] = {}
    ndoc: dict[str, int] = {}
    for _, text, lang in raw_docs:
        ntok[lang] = ntok.get(lang, 0) + len(text.lower().split(" "))
        ndoc[lang] = ndoc.get(lang, 0) + 1

    budget = sum(ntok.values()) * _BUDGET_NUM // _BUDGET_DEN
    order = sorted(ntok, key=lambda s: (ntok[s] * _EPOCH_CAP, s))
    n_src = len(order)
    # reference water-filling: walk ascending caps, cap while the cap
    # fits under the equal share of what remains
    remaining, alloc = budget, {}
    for i, s in enumerate(order):
        cap = ntok[s] * _EPOCH_CAP
        if cap * (n_src - i) <= remaining:
            alloc[s] = cap
            remaining -= cap
        else:
            share = remaining // (n_src - i)
            for s2 in order[i:]:
                alloc[s2] = share
            break

    rows = {r["lang"]: r for r in ext_mix_unimax(spark, SF_DIR).collect()}
    assert set(rows) == set(ntok)
    capped_seen = fair_seen = 0
    for s, r in rows.items():
        assert r["n_docs"] == ndoc[s]
        assert r["n_tokens"] == ntok[s]
        assert r["cap_tokens"] == ntok[s] * _EPOCH_CAP
        assert r["allocated_tokens"] == alloc[s], s
        assert r["is_capped"] == (1 if alloc[s] == ntok[s] * _EPOCH_CAP else 0)
        assert r["epochs"] == _round(alloc[s] / ntok[s], 4)
        assert r["budget_frac"] == _round(alloc[s] / budget, 6)
        capped_seen += r["is_capped"]
        fair_seen += 1 - r["is_capped"]
    # the fixture is non-degenerate by design: the 3/2-budget water
    # level lands mid-distribution, so both behaviors are exercised
    assert capped_seen >= 1 and fair_seen >= 1
    # allocation never exceeds budget; leftover is < n_src (integer
    # fair-share remainder) unless everything capped below budget
    total = sum(alloc.values())
    assert total <= budget


def _dot_l(a: list[float], b: list[float]) -> int:
    return sum(
        math.floor(float(x) * float(y) * 1e12 + 0.5) for x, y in zip(a, b)
    )


def test_kcenter_matches_python(spark, raw_embs):
    from marketing_etl_analytics_spark.suite.ext_select import (
        _K_CENTERS,
        ext_coreset_kcenter,
    )

    n2 = {vid: _dot_l(e, e) for vid, e in raw_embs}
    emb = dict(raw_embs)

    def d2(a: int, b: int) -> int:
        return n2[a] + n2[b] - 2 * _dot_l(emb[a], emb[b])

    seed = min(emb)
    centers = [(0, seed, None)]
    dmin = {vid: d2(vid, seed) for vid, _ in raw_embs}
    for r in range(1, _K_CENTERS):
        # farthest point, ties broken by vec_id (total order)
        nxt = max(dmin, key=lambda v: (dmin[v], -v))
        centers.append((r, nxt, dmin[nxt]))
        for vid in dmin:
            dmin[vid] = min(dmin[vid], d2(vid, nxt))

    # final Voronoi assignment: nearest center, ties to earliest round
    sizes = {r: 0 for r, _, _ in centers}
    for vid, _ in raw_embs:
        best = min((d2(vid, c), r) for r, c, _ in centers)
        sizes[best[1]] += 1

    rows = ext_coreset_kcenter(spark, SF_DIR).collect()
    assert len(rows) == _K_CENTERS
    for row, (r, c, rad) in zip(rows, centers):
        assert row["round"] == r
        assert row["center_vec_id"] == c
        if rad is None:
            assert row["radius2"] is None
        else:
            assert row["radius2"] == _round(rad / 1e12, 6)
        assert row["n_assigned"] == sizes[r]
    # radii are non-increasing (greedy max-min property)
    radii = [row["radius2"] for row in rows[1:]]
    assert radii == sorted(radii, reverse=True)
