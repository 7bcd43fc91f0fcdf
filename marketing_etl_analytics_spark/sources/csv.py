"""CSV reader with explicit schemas.

Reference behavior (SURVEY.md §2.A A1): ``pd.read_csv`` with pandas
type inference (``etl_script/02_load_csv.py:27-29``). We deliberately
use *explicit* StructTypes instead — inference is nondeterministic
under sampling at scale and costs an extra pass over 100 TB of input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructField, StructType


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    header: bool = True,
    **options: str,
) -> DataFrame:
    """Read a CSV with header; explicit schema when supplied (preferred)."""
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        # Fallback for ad-hoc exploration only; production paths pass schemas.
        reader = reader.option("inferSchema", "true")
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.csv(path)


def read_csv_with_quarantine(
    spark: SparkSession,
    path: str,
    schema: StructType,
    quarantine_path: str | None = None,
    header: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Schema-enforced CSV read that QUARANTINES malformed rows
    instead of nulling them silently (PERMISSIVE default), dropping
    them (DROPMALFORMED), or failing the whole 100 TB job (FAILFAST).

    Returns ``(valid, quarantined)``: valid rows with the declared
    schema, and the raw text of every row that failed to parse
    (wrong column count / uncastable cell), optionally persisted
    under ``quarantine_path`` for replay after the upstream fix —
    the bad-records pattern every production ingest needs.

    The quarantine write is IDEMPOTENT: each input path gets a
    deterministic subdirectory (md5 of the absolute input path)
    written with OVERWRITE, so re-reading the same input — the
    normal "replay after the upstream file was fixed" workflow —
    replaces that input's quarantine slice instead of appending a
    second copy. Read the whole quarantine with
    ``spark.read.option("recursiveFileLookup", "true")``.

    The parsed frame is materialized with an eager localCheckpoint
    before the corrupt-column split: Spark rejects any query whose
    scan references ONLY the internal corrupt-record column (which
    includes ``valid.count()`` after column pruning, not just the
    quarantine projection), so the split genuinely requires a
    materialization — and unlike a session-lifetime ``.cache()``
    entry, checkpoint storage is reclaimed when the frames are
    garbage-collected, so repeated calls don't accrete state. With a
    ``quarantine_path``, the returned ``quarantined`` frame READS
    BACK the just-written parquet — a stable, replayable snapshot
    with no checkpoint blocks to lose. (localCheckpoint blocks are
    single-copy: on a cluster with executor churn, re-call this
    function — the CSV re-parse is deterministic — or lift the
    snapshot to reliable storage; the quarantine side is already
    durable.)
    """
    import hashlib
    import os

    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType

    corrupt_col = "_corrupt_record"
    schema_q = StructType(schema.fields + [StructField(corrupt_col, StringType())])
    snap = (
        spark.read.option("header", str(header).lower())
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .schema(schema_q)
        .csv(path)
        .localCheckpoint(eager=True)
    )
    valid = snap.filter(F.col(corrupt_col).isNull()).drop(corrupt_col)
    quarantined = snap.filter(F.col(corrupt_col).isNotNull()).select(
        F.col(corrupt_col).alias("raw_record")
    )
    if quarantine_path is not None:
        sub = hashlib.md5(os.path.abspath(path).encode()).hexdigest()[:12]
        out_dir = os.path.join(quarantine_path, f"input-{sub}")
        quarantined.write.mode("overwrite").parquet(out_dir)
        quarantined = spark.read.parquet(out_dir)
    return valid, quarantined
