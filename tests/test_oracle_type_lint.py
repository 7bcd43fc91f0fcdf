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
