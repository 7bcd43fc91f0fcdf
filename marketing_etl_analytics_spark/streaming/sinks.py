"""Streaming upsert sink: Structured Streaming -> versioned table.

The production pattern for exactly-once-ish streaming upserts without a
lakehouse jar: each micro-batch MERGEs into a ``sources/acid.py``
versioned table inside ``foreachBatch``. Readers see a consistent
snapshot at every instant (the pointer swap is atomic); replayed
micro-batches are idempotent because MERGE by key replaces rather than
appends (the Delta `foreachBatch`+MERGE recipe, reduced to this repo's
table format).

Scale shape: the per-batch MERGE is copy-on-write at file granularity,
so a micro-batch touching recent keys rewrites recent files only;
``acid.compact`` runs periodically to fold the accreted small files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from marketing_etl_analytics_spark.sources import acid


def stream_merge_sink(
    stream_df: DataFrame,
    table_path: str,
    key_cols: list[str],
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Start a streaming query that MERGEs each micro-batch into the
    versioned table at ``table_path`` (created on first batch).

    Returns the StreamingQuery; callers typically
    ``.awaitTermination()`` (availableNow) or manage it themselves.
    """

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_df = batch_df.dropDuplicates(key_cols)
        try:
            acid.current_version(table_path)
        except FileNotFoundError:
            acid.create(spark, table_path, batch_df)
            return
        acid.merge(spark, table_path, batch_df, key_cols)

    writer = (
        stream_df.writeStream.outputMode("update")
        .foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
