"""CSV reader with explicit schemas.

Reference behavior (SURVEY.md §2.A A1): ``pd.read_csv`` with pandas
type inference (``etl_script/02_load_csv.py:27-29``). We deliberately
use *explicit* StructTypes instead — inference is nondeterministic
under sampling at scale and costs an extra pass over 100 TB of input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


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
