"""Oracle output-type lint — the typed-value twin of test_plan_lint.

The driver's correctness gate hashes TYPED values, not Python-level
reprs. DuckDB silently promotes some expressions to types whose
serialization differs from Spark's even when every value compares
equal at the Python level — the canonical case being SUM(BIGINT)
(including window sums) returning HUGEINT (int128), which cost two
driver rows in r5/r6 (VERDICT r6 #1: `ext_sketch_quantile` and, via
UNION ALL type-unification, `ext_sketch_suite`).

This lint runs DESCRIBE on every registered oracle against the
sf0.001 tables and asserts each output column's type is in the closed
set the driver hashes stably. It would have caught both red rows at
registration time. A DECIMAL that survives to the output is equally
suspect (scale/precision serialization drift) — cast to DOUBLE or an
integer lattice before the final SELECT (SURVEY §7.5 discipline).
"""

from __future__ import annotations

import os

import duckdb
import pytest

from marketing_etl_analytics_spark.suite import SUITE

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)

# Types whose DuckDB->Python->hash round-trip is identical to Spark's
# for equal values. Notably ABSENT: HUGEINT/UHUGEINT (int128 — typed
# serialization differs from int64), DECIMAL(p,s) (scale-dependent),
# unsigned ints, intervals, nested types other than the LIST forms the
# driver compares element-wise.
STABLE_TYPES = {
    "BOOLEAN",
    "TINYINT",
    "SMALLINT",
    "INTEGER",
    "BIGINT",
    "FLOAT",
    "DOUBLE",
    "VARCHAR",
    "DATE",
    "TIMESTAMP",
    "TIMESTAMP WITH TIME ZONE",
    "BIGINT[]",
    "DOUBLE[]",
    "VARCHAR[]",
}


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


# --- pround-discipline lint (ADVICE r8, diffcheck agghash) ------------------
#
# The in-engine hash compare (tools/diffcheck.py agghash) snaps doubles
# to DECIMAL(38,6) before hashing, and a matching hash is accepted as
# PASS with no exact-compare fallback. That is sound ONLY if every
# double output is either (a) quantized on the 6-dp lattice by the
# suite's pround discipline — so any genuine cross-engine divergence is
# >= 1e-6 and HASH-VISIBLE — or (b) bit-identical in both engines by
# construction (pure pass-through / integer-lattice-derived values,
# where a sub-1e-6 divergence cannot arise at all). This lint executes
# every oracle at sf0.001 and asserts each double column satisfies (a)
# unless explicitly allowlisted as (b).
#
# Allowlist audit (each column's bit-identity argument):
#   ext_embed_transform.scale/quant_mse — derived from integer-lattice
#     quantization (ext/embedding.py): identical integer ops then one
#     identical double division in both engines.
#   ext_graph_pagerank.pagerank — fixed-iteration-count synchronous
#     updates over exact integer degree counts; both engines evaluate
#     the same rational expression tree per node.
#   ext_hybrid_search.rrf — sum of 1/(60+rank) over <= 2 small ranks;
#     identical IEEE operands and operation order in both engines.
#   ext_sample_stratified.sample_key — md5-slice / 2^48: integer hash
#     then one exact double division.
ENGINE_INVARIANT_DOUBLES = {
    ("ext_embed_transform", "scale"),
    ("ext_embed_transform", "quant_mse"),
    ("ext_graph_pagerank", "pagerank"),
    ("ext_hybrid_search", "rrf"),
    ("ext_sample_stratified", "sample_key"),
}


@pytest.mark.parametrize(
    "name", [n for n, e in SUITE.items() if e.oracle is not None]
)
def test_oracle_doubles_pround_disciplined(con, name):
    import math

    desc = con.execute(f"DESCRIBE ({SUITE[name].oracle})").fetchall()
    dcols = [
        c for c, t, *_ in desc
        if t in ("DOUBLE", "FLOAT") and (name, c) not in ENGINE_INVARIANT_DOUBLES
    ]
    if not dcols:
        return
    sel = ", ".join(f'"{c}"' for c in dcols)
    rows = con.execute(f"SELECT {sel} FROM ({SUITE[name].oracle})").fetchall()
    offending = set()
    for r in rows:
        for i, c in enumerate(dcols):
            v = r[i]
            # |v| > 9e9 (ulp > 1e-6) is agghash's documented MISmatch
            # direction -> exact-compare fallback, which is safe
            if v is None or not math.isfinite(v) or abs(v) > 9e9:
                continue
            if v != round(v, 6):
                offending.add(c)
    assert not offending, (
        f"oracle '{name}' emits doubles off the 6-dp lattice in "
        f"{sorted(offending)}: a sub-1e-6 cross-engine divergence there "
        "would FALSELY hash-MATCH under diffcheck --agghash. Quantize "
        "with pround/dsum, or add to ENGINE_INVARIANT_DOUBLES with a "
        "bit-identity argument."
    )


@pytest.mark.parametrize(
    "name", [n for n, e in SUITE.items() if e.oracle is not None]
)
def test_oracle_output_types_stable(con, name):
    desc = con.execute(f"DESCRIBE ({SUITE[name].oracle})").fetchall()
    offending = [
        (col, typ) for col, typ, *_ in desc if typ not in STABLE_TYPES
    ]
    assert not offending, (
        f"oracle '{name}' emits driver-hash-unstable output types "
        f"{offending}; CAST them in the final SELECT "
        f"(VERDICT r6 #1 — the HUGEINT class)"
    )
