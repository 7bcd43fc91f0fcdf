"""Writers.

The reference's sinks are Postgres tables written via pandas ``to_sql``
(replace) and ``INSERT ... SELECT`` (SURVEY.md §2.A A2/A8). Our
equivalents are parquet directories; ``partitionBy`` on coarse date
columns replaces the reference's B-tree indexes (`schema.sql:68-70`)
— partition pruning + parquet min/max stats give the same access paths
declaratively.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame


def write_partitioned_parquet(
    df: DataFrame,
    path: str,
    partition_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet, optionally hive-partitioned.

    At 100 TB, facts go out partitioned by (year, month) so that
    date-filtered queries prune partitions instead of scanning
    everything; dims stay unpartitioned (they broadcast).
    """
    writer = df.write.mode(mode)
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    mode: str = "overwrite",
) -> None:
    """Save as a bucketed (and bucket-sorted) managed table.

    Both sides of a hot fact-fact join bucketed on the join key with
    the same bucket count join WITHOUT an Exchange — the co-located
    join layout for joins where neither side broadcasts
    (tests/test_bucketing.py asserts the shuffle-free plan).
    """
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .saveAsTable(table)
    )


def compact_parquet(
    spark,
    path: str,
    target_files: int,
    partition_cols: list[str] | None = None,
) -> None:
    """Small-files compaction: rewrite a parquet directory into
    ``target_files`` files (per partition when partitioned).

    At 100 TB the small-files problem is operational reality —
    streaming sinks and fine-grained partitioning produce thousands of
    KB-sized files whose per-file open cost dominates scans. Rewrite
    with a narrow repartition; readers see multi-row-group files the
    scanner can parallelize. (The inverse of the single-row-group
    pathology handled in suite.common.)
    """
    old = path.rstrip("/") + "__compact_old"
    if os.path.isdir(old):
        if os.path.isdir(path):
            # stale leftover from a crash after the swap completed
            shutil.rmtree(old)
        else:
            # crash happened mid-swap: the old data is the only copy
            shutil.move(old, path)
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + "__compact_tmp"
    writer = df.repartition(target_files).write.mode("overwrite")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(tmp)
    # swap via rename-aside: a crash leaves either the old data at
    # `path`, or (mid-swap) at `__compact_old` — which the recovery
    # branch above restores on the next run. Parquet dirs still aren't
    # transactional under concurrent readers; production layers a
    # table format (see sources/acid.py) for that.
    shutil.move(path, old)
    shutil.move(tmp, path)
    shutil.rmtree(old)


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "overwrite",
    properties: dict[str, str] | None = None,
) -> None:
    """JDBC table sink — the engine-native form of the reference's
    pandas ``to_sql(..., if_exists='replace')`` staging load
    (`etl_script/02_load_csv.py:36-38`, SURVEY.md §2.A A2).

    Spark writes partitions in parallel over N connections; pair with
    ``df.repartition(n)`` to bound connection count against the target
    database. Exercised end-to-end against embedded Derby (bundled in
    Spark's jars) in tests/test_jdbc_sink.py; a networked warehouse
    only changes the URL + driver properties.
    """
    df.write.jdbc(url=url, table=table, mode=mode, properties=properties or {})


def read_jdbc(
    spark,
    url: str,
    table: str,
    properties: dict[str, str] | None = None,
    partition_column: str | None = None,
    num_partitions: int = 8,
    bounds: tuple[int, int] | None = None,
) -> DataFrame:
    """JDBC table source, with the option that matters at scale:
    a partitioned read. A bare ``spark.read.jdbc`` pulls the whole
    table through ONE connection on one task; passing a numeric
    ``partition_column`` splits it into ``num_partitions`` range
    predicates fetched in parallel — how a warehouse table actually
    gets into a cluster. ``bounds`` (min, max) skips the probe query
    when the caller already knows them."""
    props = properties or {}
    if partition_column is None:
        return spark.read.jdbc(url, table, properties=props)
    if bounds is None:
        # ANSI-quoted identifier: Spark's JDBC writer creates quoted
        # (case-preserved) columns, and unquoted names would fold to
        # the database's default case (Derby/PG: k -> K). Databases
        # with non-ANSI quoting (MySQL backticks) should pass bounds.
        qc = f'"{partition_column}"'
        probe = spark.read.jdbc(
            url,
            f"(SELECT MIN({qc}) AS lo, MAX({qc}) AS hi FROM {table}) probe",
            properties=props,
        ).collect()[0]
        # positional access: unquoted aliases case-fold per database
        if probe[0] is None:
            return spark.read.jdbc(url, table, properties=props)
        bounds = (int(probe[0]), int(probe[1]))
    return spark.read.jdbc(
        url,
        table,
        column=partition_column,
        lowerBound=bounds[0],
        upperBound=bounds[1] + 1,
        numPartitions=num_partitions,
        properties=props,
    )
