"""Shared helpers + numeric discipline for engine-vs-oracle parity.

Cross-engine determinism rules (Spark vs DuckDB must hash identically):

1. **Never sum raw doubles.** Floating-point addition is
   order-dependent and the two engines aggregate in different orders.
   Money-like doubles are cast to DECIMAL first (exact, deterministic
   round-to-nearest of the same IEEE value in both engines), summed
   exactly as decimals, and only then cast to DOUBLE for output.
2. **Counts/sums of integers output as BIGINT** (DuckDB SUM(int) is
   INT128 — the oracle casts back to BIGINT).
3. **Ratios**: double(exact sum) / double(exact sum), then ROUND(x, n)
   — identical IEEE operands, identical result.
4. **Top-k needs total order**: every ORDER BY ... LIMIT carries a
   unique key as the final tie-breaker.

The marketing-schema mapping onto the testdata follows FIXTURES.md §4:
lineitem+orders = fact_sales, part = dim_products, customer(+nation)
= dim_customers, events = fact_spend, o_orderdate-derived = dim_date.
Line revenue = extendedprice*(1-discount); line cost =
extendedprice*(1-discount)*0.6 (fixed COGS ratio, stands in for the
reference's cost_price_thb column).
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# --- table access -----------------------------------------------------------

def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# --- numeric discipline (Spark side) ---------------------------------------

MONEY = "decimal(18,2)"
RATE = "decimal(8,4)"


def money(col: Column | str) -> Column:
    """Exact 2-dp decimal view of a money-like double column."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(MONEY)


def rate(col: Column | str) -> Column:
    """Exact 4-dp decimal view of a small ratio column (discount/tax)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(RATE)


def revenue_expr() -> Column:
    """Line revenue: extendedprice * (1 - discount), exact decimal."""
    return money("l_extendedprice") * (F.lit(1).cast(RATE) - rate("l_discount"))


def cost_expr() -> Column:
    """Line cost analog: revenue * 0.6 fixed COGS ratio, exact decimal."""
    return revenue_expr() * F.lit(0.6).cast(RATE)


def dsum(col: Column, ndigits: int = 2) -> Column:
    """SUM of exact decimals, emitted as a rounded DOUBLE."""
    return F.round(F.sum(col).cast("double"), ndigits)


def lsum(col: Column | str) -> Column:
    """SUM of an integral column, emitted as BIGINT."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast("long")).cast("long")


# --- numeric discipline (oracle/DuckDB side SQL fragments) ------------------

SQL_REVENUE = (
    "CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (1 - CAST(l_discount AS DECIMAL(8,4)))"
)
SQL_COST = f"({SQL_REVENUE}) * CAST(0.6 AS DECIMAL(8,4))"


def sql_dsum(expr: str, alias: str, ndigits: int = 2) -> str:
    return f"ROUND(CAST(SUM({expr}) AS DOUBLE), {ndigits}) AS {alias}"


def sql_lsum(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST({expr} AS BIGINT)) AS BIGINT) AS {alias}"
