"""Scalar column builders shared across ETL, views, and queries."""

from marketing_etl_analytics_spark.functions.dates import (  # noqa: F401
    date_parts,
    epoch_date_id,
    parse_mdy,
)
from marketing_etl_analytics_spark.functions.kpis import (  # noqa: F401
    kpi_columns,
    safe_div,
)
from marketing_etl_analytics_spark.functions.text import (  # noqa: F401
    channel_from_campaign,
)
from marketing_etl_analytics_spark.functions.bands import (  # noqa: F401
    age_band,
    frequency_band,
    thai_season,
)
