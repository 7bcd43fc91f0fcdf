"""Suite-wide physical-plan lint — the 100 TB discipline enforced
mechanically over EVERY batch entry, not spot-checked.

For each registered suite entry (excluding the stream_* entries, whose
fn() executes a real streaming query rather than building a lazy
plan), build the DataFrame and walk its physical plan:

1. No ``CartesianProduct`` — an unconditional all-pairs join is never
   acceptable at scale; cross joins must broadcast
   (BroadcastNestedLoopJoin over a 1-row/handful-row side).
2. No row-at-a-time Python UDF (``BatchEvalPython``) — Python in the
   hot path must be Arrow-batched (ArrowEvalPython, mapInPandas /
   FlatMapGroupsInPandas / MapInArrow operators are all fine).

New entries get this guarantee for free the moment they register.
"""

from __future__ import annotations

import pytest

from marketing_etl_analytics_spark.suite import SUITE

# stream_* entries run a Structured Streaming query inside fn() —
# real work, not a lazy plan build. Their plan discipline is covered
# by their own entries/tests.
BATCH_ENTRIES = [n for n in SUITE if not n.startswith("stream_")]

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def plans(spark):
    out = {}
    for name in BATCH_ENTRIES:
        df = SUITE[name].fn(spark, SF_DIR)
        out[name] = df._jdf.queryExecution().executedPlan().toString()
    return out


def test_no_cartesian_product_anywhere(plans):
    bad = [n for n, p in plans.items() if "CartesianProduct" in p]
    assert not bad, f"entries planning CartesianProduct: {bad}"


def test_no_row_at_a_time_python_udf(plans):
    bad = [n for n, p in plans.items() if "BatchEvalPython" in p]
    assert not bad, f"entries planning row-at-a-time Python UDFs: {bad}"
