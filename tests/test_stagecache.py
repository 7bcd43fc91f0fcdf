"""Oracle stage-cache lint (tools/diffcheck.py --stagecache,
VERDICT r8 Next #7): the temp-table substitution must be
verdict-neutral — for every oracle that receives a substitution, the
substituted query returns exactly the raw oracle's multiset.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from diffcheck import (  # noqa: E402
    _oracle_stage_chains,
    _parse_top_ctes,
    apply_stage_plan,
    build_stage_plan,
    norm_rows,
)
from marketing_etl_analytics_spark.suite import SUITE  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def test_parse_handles_cte_forms():
    ctes = _parse_top_ctes(
        "WITH a AS (SELECT 1 AS x), b(y) AS (VALUES (2)), "
        "c AS MATERIALIZED (SELECT x FROM a JOIN b ON x < y) "
        "SELECT * FROM c"
    )
    assert [(n, c is not None) for n, c, _ in ctes] == [
        ("a", False), ("b", True), ("c", False)
    ]
    # strings and comments inside bodies don't break balancing
    ctes = _parse_top_ctes(
        "WITH a AS (SELECT ')(' AS s -- comment with ) paren\n"
        ", len('it''s') AS l) SELECT * FROM a"
    )
    assert len(ctes) == 1 and "it''s" in ctes[0][2]
    # no leading WITH / recursive -> no caching
    assert _parse_top_ctes("SELECT 1") == []
    assert _parse_top_ctes("WITH RECURSIVE r AS (SELECT 1) SELECT 1") == []


def test_chain_keys_embed_dependencies():
    pad = " AND doc_id <> 987654321" * 12  # clear the size floor
    a = _oracle_stage_chains(
        f"WITH x AS (SELECT doc_id FROM documents WHERE doc_id > 1{pad}), "
        f"y AS (SELECT doc_id FROM x WHERE doc_id < 9{pad}) "
        "SELECT * FROM y"
    )
    b = _oracle_stage_chains(
        f"WITH x AS (SELECT doc_id FROM documents WHERE doc_id > 2{pad}), "
        f"y AS (SELECT doc_id FROM x WHERE doc_id < 9{pad}) "
        "SELECT * FROM y"
    )
    ka = {n: k for k, n, _, _ in a}
    kb = {n: k for k, n, _, _ in b}
    assert ka["x"] != kb["x"]
    # y's own body is identical, but its chain key must differ because
    # the upstream x differs — same-table reuse would be WRONG here
    assert ka["y"] != kb["y"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


def test_substituted_oracles_match_raw(con):
    plan = build_stage_plan(SUITE.values())
    assert plan, "expected shared stages across the registry"
    created: set[str] = set()
    checked = 0
    for name, entry in SUITE.items():
        if entry.oracle is None:
            continue
        eff = apply_stage_plan(entry.oracle, plan, con, created)
        if eff == entry.oracle:
            continue
        cur = con.execute(entry.oracle)
        rcols = [d[0] for d in cur.description]
        raw = norm_rows(rcols, [tuple(r) for r in cur.fetchall()])
        cur = con.execute(eff)
        ecols = [d[0] for d in cur.description]
        sub = norm_rows(ecols, [tuple(r) for r in cur.fetchall()])
        assert raw == sub, f"stage substitution changed {name}'s result"
        checked += 1
    # the families the cache exists for: merged-grain views, LSH dedup
    # chain, graph shingle edges, ANN norms, semantic-dedup base
    assert checked >= 10, checked
