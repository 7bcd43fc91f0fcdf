"""Writers.

The reference's sinks are Postgres tables written via pandas ``to_sql``
(replace) and ``INSERT ... SELECT`` (SURVEY.md §2.A A2/A8). Our
equivalents are parquet directories; ``partitionBy`` on coarse date
columns replaces the reference's B-tree indexes (`schema.sql:68-70`)
— partition pruning + parquet min/max stats give the same access paths
declaratively.
"""

from __future__ import annotations

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
