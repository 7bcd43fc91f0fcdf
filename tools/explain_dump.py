"""Dump .explain("formatted") for suite entries to files.

Usage: python tools/explain_dump.py <sf_dir> <out_dir> <suffix> <entry...>

Writes <out_dir>/<entry>_<suffix>.txt for each entry. Runs with the
default (no table-cache) session so the plans show the real parquet
scans (ReadSchema / PushedFilters), matching what the driver's
correctness runs execute.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from marketing_etl_analytics_spark.session import get_spark  # noqa: E402
from marketing_etl_analytics_spark.suite import SUITE  # noqa: E402


def main() -> None:
    sf_dir, out_dir, suffix, *names = sys.argv[1:]
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    spark = get_spark(app_name="explain-dump")
    for name in names:
        df = SUITE[name].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = out / f"{name}_{suffix}.txt"
        path.write_text(plan)
        print(f"wrote {path} ({len(plan.splitlines())} lines)")


if __name__ == "__main__":
    main()
