"""Source-format matrix: the engine is storage-format-agnostic.

The reference loads CSVs (SURVEY §2.A1); production lakes mix
parquet, ORC, JSON-lines, and CSV. A query must return identical
results over any of them — the format only changes the scan node,
never the semantics. Also pins the two properties that matter for
scan efficiency: parquet/ORC carry their own schema + column
pruning, while CSV/JSON get an explicit schema (never inference on a
100 TB lake — inference is a full extra pass over the data).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def format_copies(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("formats")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    # timestamps: CSV/JSON round-trip them as strings; write ISO form
    out = {}
    for fmt in ("parquet", "orc", "json", "csv"):
        path = str(base / fmt)
        w = orders.write.mode("overwrite")
        if fmt == "csv":
            w = w.option("header", True).option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
        if fmt == "json":
            w = w.option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
        getattr(w, "format")(fmt).save(path)
        out[fmt] = path
    return orders.schema, out


def _agg(df):
    return sorted(
        map(
            tuple,
            df.groupBy("o_orderstatus")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(
                    F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2
                )
                .cast("double")
                .alias("total"),
                F.min(F.to_date("o_orderdate")).alias("first_day"),
            )
            .collect(),
        )
    )


def test_all_formats_agree(spark, format_copies):
    schema, paths = format_copies
    expected = _agg(spark.read.parquet(paths["parquet"]))
    assert expected  # non-empty
    got_orc = _agg(spark.read.orc(paths["orc"]))
    got_json = _agg(
        spark.read.schema(schema)
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
        .json(paths["json"])
    )
    got_csv = _agg(
        spark.read.schema(schema)
        .option("header", True)
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
        .csv(paths["csv"])
    )
    assert got_orc == expected
    assert got_json == expected
    assert got_csv == expected


def test_columnar_formats_prune_columns(spark, format_copies):
    _, paths = format_copies
    for reader, path in (
        (spark.read.parquet, paths["parquet"]),
        (spark.read.orc, paths["orc"]),
    ):
        q = reader(path).select("o_orderkey").filter(F.col("o_orderkey") < 10)
        plan = q._jdf.queryExecution().executedPlan().toString()
        scan_lines = [l for l in plan.splitlines() if "ReadSchema" in l]
        assert scan_lines, plan[:500]
        for line in scan_lines:
            assert "o_totalprice" not in line  # pruned
        assert "PushedFilters" in plan


def test_csv_quarantine_splits_malformed_rows(spark, tmp_path):
    """Malformed CSV rows land in the quarantine frame with their raw
    text; valid rows parse with the declared schema. Neither silent
    nulling (PERMISSIVE default) nor whole-job failure (FAILFAST)."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from marketing_etl_analytics_spark.sources.csv import read_csv_with_quarantine

    f = tmp_path / "in.csv"
    f.write_text(
        "id,name,qty\n"
        "1,alpha,10\n"
        "2,beta,notanumber\n"   # uncastable cell
        "3,gamma,30\n"
    )
    schema = StructType(
        [
            StructField("id", LongType()),
            StructField("name", StringType()),
            StructField("qty", LongType()),
        ]
    )
    qdir = str(tmp_path / "quarantine")
    valid, quarantined = read_csv_with_quarantine(
        spark, str(f), schema, quarantine_path=qdir
    )
    assert sorted(r["id"] for r in valid.collect()) == [1, 3]
    bad = [r["raw_record"] for r in quarantined.collect()]
    assert bad == ["2,beta,notanumber"]
    # persisted for replay (deterministic per-input subdir)
    q = spark.read.option("recursiveFileLookup", "true").parquet(qdir)
    assert q.count() == 1

    # IDEMPOTENT: re-reading the same input overwrites its slice —
    # the "replay after upstream fix" workflow must not double-append
    read_csv_with_quarantine(spark, str(f), schema, quarantine_path=qdir)
    q = spark.read.option("recursiveFileLookup", "true").parquet(qdir)
    assert q.count() == 1

    # the upstream fix empties the quarantine slice on the next read
    f.write_text("id,name,qty\n1,alpha,10\n2,beta,20\n3,gamma,30\n")
    valid, _ = read_csv_with_quarantine(
        spark, str(f), schema, quarantine_path=qdir
    )
    assert valid.count() == 3
    q = spark.read.option("recursiveFileLookup", "true").parquet(qdir)
    assert q.count() == 0
