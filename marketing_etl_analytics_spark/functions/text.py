"""Text scalar functions used by the ETL."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def channel_from_campaign(campaign_name: Column | str) -> Column:
    """Channel = leading non-digit prefix of the campaign name.

    Mirrors ``REGEXP_SUBSTR("Campaign Name", '^[^0-9]+')`` at
    ``etl_script/03_transform.sql:32``. Deliberately KEEPS the trailing
    space ('Paid Search 2024-11' -> 'Paid Search ') — reference
    semantics, do not trim (SURVEY.md §7.5).
    """
    c = F.col(campaign_name) if isinstance(campaign_name, str) else campaign_name
    return F.regexp_extract(c, r"^([^0-9]+)", 1)
