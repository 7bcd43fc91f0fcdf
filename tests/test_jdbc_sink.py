"""JDBC sink round-trip against embedded Derby (ships in Spark's jars).

The reference loads staging tables over a DB connection
(`etl_script/02_load_csv.py:36-38`, pandas ``to_sql`` to Postgres);
`sources.sinks.write_jdbc` is the engine-native form. No external
database exists in this environment, but Spark bundles Apache Derby
(for the Hive metastore), whose embedded driver serves as a real
in-process JDBC endpoint — the write path, dialect mapping, and
read-back are exercised for real, only the wire protocol differs from
a networked warehouse.
"""

from __future__ import annotations

from pyspark.sql import Row

from marketing_etl_analytics_spark.sources.sinks import write_jdbc

PROPS = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}


def _url(tmp_path):
    return f"jdbc:derby:{tmp_path}/derbydb;create=true"


def test_jdbc_write_read_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, f"name{i}", float(i) * 1.5) for i in range(100)],
        "id long, name string, amount double",
    )
    url = _url(tmp_path)
    write_jdbc(df, url, "staging_sales", mode="overwrite", properties=PROPS)
    back = spark.read.jdbc(url, "staging_sales", properties=PROPS)
    assert back.count() == 100
    got = {r.id: (r.name, r.amount) for r in back.collect()}
    assert got[7] == ("name7", 10.5)
    assert set(back.columns) == {"id", "name", "amount"}


def test_jdbc_overwrite_replaces(spark, tmp_path):
    url = _url(tmp_path)
    first = spark.createDataFrame([Row(id=1, v="old")])
    second = spark.createDataFrame([Row(id=2, v="new"), Row(id=3, v="new")])
    write_jdbc(first, url, "t_replace", mode="overwrite", properties=PROPS)
    write_jdbc(second, url, "t_replace", mode="overwrite", properties=PROPS)
    rows = spark.read.jdbc(url, "t_replace", properties=PROPS).collect()
    assert sorted(r.id for r in rows) == [2, 3]


def test_jdbc_append_accumulates(spark, tmp_path):
    url = _url(tmp_path)
    batch = spark.createDataFrame([Row(id=1, v="a")])
    write_jdbc(batch, url, "t_append", mode="overwrite", properties=PROPS)
    write_jdbc(
        spark.createDataFrame([Row(id=2, v="b")]),
        url,
        "t_append",
        mode="append",
        properties=PROPS,
    )
    assert spark.read.jdbc(url, "t_append", properties=PROPS).count() == 2


def test_jdbc_partitioned_read(spark, tmp_path):
    """read_jdbc with a partition column must split the table into
    parallel range fetches (multiple RDD partitions) and return exactly
    the written rows — the one-connection whole-table pull is the
    scale anti-pattern the wrapper exists to avoid."""
    from pyspark.sql import functions as F

    from marketing_etl_analytics_spark.sources.sinks import read_jdbc, write_jdbc

    url = _url(tmp_path)
    df = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    write_jdbc(df, url, "t_part", properties=PROPS)

    back = read_jdbc(
        spark, url, "t_part", properties=PROPS,
        partition_column="k", num_partitions=4,
    )
    assert back.rdd.getNumPartitions() == 4
    assert sorted(r.k for r in back.collect()) == list(range(1000))

    # bounds short-circuit: no probe query, same data
    back2 = read_jdbc(
        spark, url, "t_part", properties=PROPS,
        partition_column="k", num_partitions=3, bounds=(0, 999),
    )
    assert back2.rdd.getNumPartitions() == 3
    assert back2.count() == 1000
