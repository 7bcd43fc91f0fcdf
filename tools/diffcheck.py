"""Local replica of the driver's t2 correctness gate.

Runs every suite query on Spark and its DuckDB oracle twin on the same
parquet files, then compares row count, column names, and an
order-insensitive value multiset. Floats are compared exactly first;
on mismatch the max abs diff is reported (to distinguish real bugs
from last-ulp noise).

Usage: python tools/diffcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from marketing_etl_analytics_spark.session import (  # noqa: E402
    env_positive_int,
    get_spark,
)
from marketing_etl_analytics_spark.suite import SUITE  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out, key=lambda tup: tuple(str(x) for x in tup))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    # the gate COLLECTS full results for the multiset compare; at the
    # 100x probe SFs a fact-table build serializes >1 GiB of rows,
    # tripping the 1g maxResultSize safety default. The collect is the
    # harness's comparison mechanism, not an engine data path — raise
    # the cap here (knob: SPARK_MAX_RESULT), never in get_spark.
    # Shuffle width: 8 suits the graded SFs (tiny shuffles, fast
    # session); 100x-class probe runs need hundreds of partitions —
    # honor the same env knob the bench/session layer uses when set
    # (parsed+validated in session.py per ADVICE r7: '0'/''/garbage
    # fall back to the 8-partition default instead of reaching Spark).
    spark = get_spark(
        app_name="diffcheck",
        shuffle_partitions=env_positive_int(
            "SPARK_GRAFT_SHUFFLE_PARTITIONS", 8
        ),
        extra_conf={
            "spark.driver.maxResultSize": os.environ.get("SPARK_MAX_RESULT", "8g")
        },
    )
    con = duckdb.connect()
    for tbl in TABLES:
        path = os.path.join(sf_dir, f"{tbl}.parquet")
        if os.path.isdir(path):  # Spark-written multi-file layout
            path = os.path.join(path, "*.parquet")
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM read_parquet('{path}')"
        )

    n_pass = n_fail = n_weak = 0
    for name, entry in SUITE.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = entry.fn(spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            scols = list(sdf.columns)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if entry.oracle is None:
            print(f"weak  {name}: rows={len(srows)} (no oracle) "
                  f"[{time.time()-t0:.1f}s]")
            n_weak += 1
            continue
        try:
            cur = con.execute(entry.oracle)
            ocols = [d[0] for d in cur.description]
            orows = [tuple(r) for r in cur.fetchall()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb raised {type(e).__name__}: {e}")
            n_fail += 1
            continue

        sc, sr = norm_rows(scols, srows)
        oc, orr = norm_rows(ocols, orows)
        problems = []
        if len(sr) != len(orr):
            problems.append(f"rowcount spark={len(sr)} oracle={len(orr)}")
        if sc != oc:
            problems.append(f"cols spark={sc} oracle={oc}")
        if not problems and sr != orr:
            # locate first diff + max float deviation
            max_dev, first = 0.0, None
            for i, (a, b) in enumerate(zip(sr, orr)):
                if a != b:
                    if first is None:
                        first = (i, a, b)
                    for x, y in zip(a, b):
                        if isinstance(x, float) and isinstance(y, float):
                            max_dev = max(max_dev, abs(x - y))
                        elif x != y:
                            max_dev = float("inf")
            problems.append(
                f"values differ (first@{first[0]}:\n    spark={first[1]}\n"
                f"    oracle={first[2]}\n    max_float_dev={max_dev:g})"
            )
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS  {name}: rows={len(sr)} [{time.time()-t0:.1f}s]")
            n_pass += 1

    print(f"\n{n_pass} pass, {n_weak} weak (rows-only), {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
