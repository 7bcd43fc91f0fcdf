"""Date/time column builders.

Reference semantics (SURVEY.md §2.H H1-H3):
- raw dates are ``M/d/yyyy`` strings with single-digit month/day
  (``etl_script/03_transform.sql:8``: ``to_date(..., 'MM/DD/YYYY')`` —
  Postgres accepts 1-digit fields under that pattern; Spark needs the
  single-letter pattern).
- ``date_id`` is epoch-seconds of midnight UTC
  (``etl_script/03_transform.sql:7``), not a serial.
- ``week`` is ISO week (Postgres ``EXTRACT(WEEK ...)``); Spark
  ``weekofyear`` is also ISO — they agree by construction.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MDY_PATTERN = "M/d/yyyy"


def parse_mdy(col: Column | str) -> Column:
    """Parse a ``M/d/yyyy`` string (single-digit month/day) into a date."""
    return F.to_date(F.col(col) if isinstance(col, str) else col, MDY_PATTERN)


def epoch_date_id(date_col: Column | str) -> Column:
    """Epoch-seconds-of-midnight surrogate key (UTC session TZ required).

    Mirrors ``EXTRACT(EPOCH FROM to_date(...))::BIGINT`` at
    ``etl_script/03_transform.sql:7``.
    """
    c = F.col(date_col) if isinstance(date_col, str) else date_col
    return F.unix_timestamp(c.cast("timestamp")).cast("long")


def date_parts(date_col: Column | str) -> dict[str, Column]:
    """day / ISO week / month / year parts, as the dim_date build needs."""
    c = F.col(date_col) if isinstance(date_col, str) else date_col
    return {
        "day": F.dayofmonth(c),
        "week": F.weekofyear(c),  # ISO week, matches PG EXTRACT(WEEK ...)
        "month": F.month(c),
        "year": F.year(c),
    }
