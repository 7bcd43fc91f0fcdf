"""Every suite entry vs its DuckDB oracle at sf0.001.

Mirrors the driver's t2 gate (tools/diffcheck.py) inside pytest so
`python -m pytest tests/ -x -q` stays a self-contained green signal:
row count, column names, and the order-insensitive value multiset
must match exactly.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from marketing_etl_analytics_spark.suite import SUITE

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


@pytest.fixture(scope="module")
def oracle():
    con = duckdb.connect()
    for tbl in TABLES:
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM "
            f"read_parquet('{os.path.join(SF_DIR, tbl)}.parquet')"
        )
    yield con


def _norm(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def cell(v):
        if isinstance(v, float) and math.isnan(v):
            return "NaN"
        return v

    out = [tuple(cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out, key=lambda tup: tuple(str(x) for x in tup))


# Spark type -> acceptable DuckDB DESCRIBE types. The driver's value
# hash is TYPED (VERDICT r6 #1: DuckDB HUGEINT vs Spark int64 red a
# row whose Python-level values compared equal), so every output
# column must carry the SAME width/kind on both engines, not merely
# equal Python values. Spark timestamps read back as TIMESTAMP or
# TIMESTAMP WITH TIME ZONE depending on the parquet writer's
# isAdjustedToUTC flag — both serialize as UTC instants.
_TYPE_MAP = {
    "bigint": {"BIGINT"},
    "int": {"INTEGER"},
    "smallint": {"SMALLINT"},
    "tinyint": {"TINYINT"},
    "double": {"DOUBLE"},
    "float": {"FLOAT"},
    "string": {"VARCHAR"},
    "date": {"DATE"},
    "timestamp": {"TIMESTAMP", "TIMESTAMP WITH TIME ZONE"},
    "boolean": {"BOOLEAN"},
    "array<bigint>": {"BIGINT[]"},
    "array<double>": {"DOUBLE[]"},
    "array<string>": {"VARCHAR[]"},
}


@pytest.mark.parametrize("name", sorted(SUITE))
def test_suite_entry_matches_oracle(name, spark, oracle):
    entry = SUITE[name]
    sdf = entry.fn(spark, SF_DIR)
    scols, srows = _norm(list(sdf.columns), [tuple(r) for r in sdf.collect()])
    if entry.oracle is None:
        assert srows is not None  # rows-only check (driver's weak gate)
        return
    # 1:1 typed-schema check (the stronger half of the oracle type
    # lint): DuckDB output type must map to the Spark column's type
    # column-for-column
    spark_types = {f.name: f.dataType.simpleString() for f in sdf.schema.fields}
    desc = oracle.execute(f"DESCRIBE ({entry.oracle})").fetchall()
    for col, dtyp, *_ in desc:
        styp = spark_types.get(col)
        assert styp is not None, f"oracle column {col!r} missing from Spark"
        allowed = _TYPE_MAP.get(styp)
        assert allowed is not None, (
            f"{name}.{col}: Spark type {styp!r} has no stable DuckDB "
            f"mapping — cast it on both sides"
        )
        assert dtyp in allowed, (
            f"{name}.{col}: Spark {styp} vs DuckDB {dtyp} — typed "
            f"value-hash would diverge (VERDICT r6 #1 class)"
        )
    cur = oracle.execute(entry.oracle)
    ocols, orows = _norm(
        [d[0] for d in cur.description], [tuple(r) for r in cur.fetchall()]
    )
    assert scols == ocols
    assert len(srows) == len(orows)
    assert srows == orows
