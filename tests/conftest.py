"""Shared pytest fixtures: one SparkSession per test session."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from marketing_etl_analytics_spark.session import get_spark  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="pytest", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def warehouse(spark):
    """Marketing warehouse built from the reference CSVs + views."""
    from marketing_etl_analytics_spark.etl import run_etl
    from marketing_etl_analytics_spark.views import build_views

    wh = run_etl(spark)
    wh.update(build_views(wh))
    return wh
