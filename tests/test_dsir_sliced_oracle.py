"""The sliced DSIR oracle replay (tools/dsir_sliced_oracle.py) must be
BIT-IDENTICAL to the raw registry oracle — slicing on doc_id is exact
for per-doc grains. Pinned at the graded SFs so the sf100b run (where
the raw oracle exceeds single-process memory/disk) rests on a proven
equivalence, not an assumption.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.dsir_sliced_oracle import FINAL_SQL, build_sliced  # noqa: E402


def _raw_oracle_rows(sf_dir: str):
    from marketing_etl_analytics_spark.suite import SUITE

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM read_parquet("
        f"'{sf_dir}/documents.parquet')"
    )
    rows = con.execute(SUITE["ext_quality_dsir"].oracle).fetchall()
    con.close()
    return rows


@pytest.mark.parametrize("sf_dir,n_slices", [
    ("/root/testdata/sf0.001", 3),
    ("/root/testdata/sf0.01", 7),
])
def test_sliced_equals_raw_oracle(sf_dir, n_slices):
    con = duckdb.connect()
    build_sliced(con, sf_dir, n_slices)
    sliced = con.execute(FINAL_SQL).fetchall()
    con.close()
    assert sliced == _raw_oracle_rows(sf_dir)


def test_sliced_agghash_compare_passes_spark(spark):
    """End-to-end: the tool's agghash compare (Spark entry vs sliced
    DuckDB stages) passes at sf0.001 — the exact path the sf100b
    boundary run uses."""
    from marketing_etl_analytics_spark.suite import SUITE
    from tools.diffcheck import agghash

    sf_dir = "/root/testdata/sf0.001"
    con = duckdb.connect()
    build_sliced(con, sf_dir, 4)
    sdf = SUITE["ext_quality_dsir"].fn(spark, sf_dir)
    pair = agghash(sdf, FINAL_SQL, con)
    con.close()
    assert pair is not None
    s3, o3 = pair
    assert s3 == o3
