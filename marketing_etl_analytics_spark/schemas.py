"""Explicit StructTypes for the raw CSVs and warehouse tables.

The reference loads staging with pandas inference
(``etl_script/02_load_csv.py:27-38``) — the typed staging DDL in
``01_schema.sql`` is dead code (SURVEY.md §1.1). We declare schemas
explicitly: deterministic, and no inference pass over the input.

Money columns are DecimalType: the reference casts them ``::numeric``
into the facts (``etl_script/03_transform.sql:44-45,59``), and exact
decimal aggregation is what keeps our sums hash-stable.
"""

from __future__ import annotations

from pyspark.sql.types import (
    DecimalType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MONEY = DecimalType(18, 2)

# data/raw/ecom_mens_streetwear_10000.csv (header names preserved —
# the reference's live staging columns ARE the CSV headers)
RAW_TRANSACTIONS = StructType(
    [
        StructField("Transaction Date", StringType()),
        StructField("Customer ID", StringType()),
        StructField("Age", IntegerType()),
        StructField("Gender", StringType()),
        StructField("Item Purchased", StringType()),
        StructField("Category", StringType()),
        StructField("Quantity", IntegerType()),
        StructField("Purchase Amount (THB)", LongType()),
        StructField("Cost Price (THB)", LongType()),
        StructField("Location", StringType()),
        StructField("Subscription Status", StringType()),
        StructField("Shipping Type", StringType()),
        StructField("Payment Method", StringType()),
        StructField("Previous Purchases", IntegerType()),
        StructField("Campaign Name", StringType()),
    ]
)

# data/raw/channel_spend_daily_campaign.csv
RAW_SPEND = StructType(
    [
        StructField("Date", StringType()),
        StructField("Campaign Name", StringType()),
        StructField("Spending", DoubleType()),
        StructField("Impressions", LongType()),
        StructField("Clicks", LongType()),
        StructField("Observed CTR", DoubleType()),
    ]
)

# data/raw/campaigns_details.csv (declared but never loaded by the
# reference main path — SURVEY.md §7.3; we load it for extensions)
RAW_CAMPAIGNS = StructType(
    [
        StructField("campaign_id", IntegerType()),
        StructField("campaign_name", StringType()),
        StructField("channel", StringType()),
        StructField("promo_code", StringType()),
        StructField("start_date", StringType()),
        StructField("end_date", StringType()),
    ]
)

# data/raw/promotion_reference.csv
RAW_PROMOTIONS = StructType(
    [
        StructField("promo_code", StringType()),
        StructField("discount_pct", IntegerType()),
    ]
)

RAW_CSV_FILES = {
    "transactions": ("ecom_mens_streetwear_10000.csv", RAW_TRANSACTIONS),
    "spend": ("channel_spend_daily_campaign.csv", RAW_SPEND),
    "campaigns": ("campaigns_details.csv", RAW_CAMPAIGNS),
    "promo": ("promotion_reference.csv", RAW_PROMOTIONS),
}
