"""Sliced DuckDB replay of the ext_quality_dsir oracle for corpora
where the ONE-SHOT oracle exceeds single-process limits.

At .scratch/sf100b (5 M docs, ~330 M bigrams, up to ~600 M
(doc_id, lang, bucket) groups) the raw oracle died twice in round 9:
the hash aggregate's spill filled 58 GB of free disk (ENOSPC in
duckdb_temp_storage), and the exact-compare fallback was OOM-killed at
~94 GB RSS. The oracle SEMANTICS, however, are per-document up to a
pair of corpus-level reductions (the 256-bucket model and the
percentile cutoff), so the computation slices EXACTLY on doc_id:

  1. `feats`  — per-doc hashed-bigram bucket counts: doc-local, so
     `WHERE doc_id % N = i` slices are disjoint and exhaustive;
  2. `raw_b` / `tgt_b` / `wt` — 256-row bucket models aggregated from
     the staged `feats` (order-free BIGINT sums);
  3. `doc_w`  — per-doc weight sums: doc-local again, sliced;
  4. `cut` + final projection — one quantile_cont over 5 M doubles.

Every staged stage is the oracle's own CTE text with only the slice
predicate added, appended into on-disk DuckDB tables, so the final
SELECT computes bit-identical rows to the raw oracle (pinned at the
graded SFs by tests/test_dsir_sliced_oracle.py). The comparison
reuses tools/diffcheck.py's agghash discipline verbatim — count plus
two order-free 48-bit md5 sums over the canonical row rendering,
computed in each engine.

This is a HARNESS-capacity workaround, not an engine path: the graded
driver always runs the raw oracle, and the Spark side here is the
unmodified suite entry.

Usage: python tools/dsir_sliced_oracle.py SF_DIR [N_SLICES]
"""

from __future__ import annotations

import os
import shutil
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
from marketing_etl_analytics_spark.suite.ext_pipeline import (  # noqa: E402
    DSIR_B,
    DSIR_KEEP_Q,
    DSIR_TARGET,
)
from tools.diffcheck import agghash  # noqa: E402

FINAL_SQL = """
    SELECT doc_id, n_feats, log_w,
      CASE WHEN log_w >= p_keep THEN 1 ELSE 0 END AS keep_dsir
    FROM doc_w CROSS JOIN cut
    ORDER BY doc_id
"""


def build_sliced(con: duckdb.DuckDBPyConnection, sf_dir: str,
                 n_slices: int) -> None:
    """Stage the oracle's tables into ``con`` (views/tables:
    documents, feats, raw_b, tgt_b, stats, wt, doc_w, cut)."""
    path = os.path.join(sf_dir, "documents.parquet")
    if os.path.isdir(path):
        path = os.path.join(path, "*.parquet")
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}')"
    )
    con.execute(
        "CREATE TABLE feats (doc_id BIGINT, lang VARCHAR, bk BIGINT,"
        " cnt BIGINT)"
    )
    for i in range(n_slices):
        t0 = time.perf_counter()
        con.execute(f"""
            INSERT INTO feats
            WITH tk AS (
              SELECT doc_id, lang, string_split(lower(text), ' ') AS w
              FROM documents WHERE doc_id % {n_slices} = {i}
            ),
            bg AS (
              SELECT doc_id, lang, w[i] || ' ' || w[i + 1] AS b
              FROM tk, LATERAL unnest(generate_series(1, len(w) - 1)) AS g(i)
              WHERE len(w) >= 2
            )
            SELECT doc_id, lang,
              ('0x' || substr(md5(b), 1, 6))::BIGINT % {DSIR_B} AS bk,
              CAST(COUNT(*) AS BIGINT) AS cnt
            FROM bg GROUP BY doc_id, lang, bk
        """)
        print(f"[sliced] feats slice {i + 1}/{n_slices}: "
              f"{time.perf_counter() - t0:.1f}s", file=sys.stderr, flush=True)
    con.execute(
        "CREATE TABLE raw_b AS SELECT bk, CAST(SUM(cnt) AS BIGINT) AS rc"
        " FROM feats GROUP BY bk"
    )
    con.execute(
        f"CREATE TABLE tgt_b AS SELECT bk, CAST(SUM(cnt) AS BIGINT) AS tc"
        f" FROM feats WHERE {DSIR_TARGET} GROUP BY bk"
    )
    # the oracle's ln-per-bucket weight table, verbatim discipline
    # (sql_pround 6 -> DECIMAL(18,6)); _SQL_DSIR_LW inlined
    lw = (
        f"ln(CAST(tc + 1 AS DOUBLE) / CAST(t_tot + {DSIR_B} AS DOUBLE))"
        f" - ln(CAST(rc + 1 AS DOUBLE) / CAST(r_tot + {DSIR_B} AS DOUBLE))"
    )
    con.execute(f"""
        CREATE TABLE wt AS
        WITH stats AS (
          SELECT (SELECT CAST(SUM(rc) AS BIGINT) FROM raw_b) AS r_tot,
                 (SELECT CAST(COALESCE(SUM(tc), 0) AS BIGINT) FROM tgt_b)
                   AS t_tot
        )
        SELECT bk, CAST(FLOOR(CAST(({lw}) AS DOUBLE) * 1000000.0 + 0.5)
                        / 1000000.0 AS DECIMAL(18,6)) AS lw
        FROM (
          SELECT r.bk, COALESCE(t.tc, 0) AS tc, r.rc, s.t_tot, s.r_tot
          FROM raw_b r LEFT JOIN tgt_b t USING (bk) CROSS JOIN stats s
        ) filled
    """)
    con.execute(
        "CREATE TABLE doc_w (doc_id BIGINT, n_feats BIGINT, log_w DOUBLE)"
    )
    for i in range(n_slices):
        con.execute(f"""
            INSERT INTO doc_w
            SELECT f.doc_id,
              CAST(SUM(f.cnt) AS BIGINT) AS n_feats,
              FLOOR(CAST(
                CAST(SUM(CAST(f.cnt * w.lw AS DECIMAL(28,6))) AS DOUBLE)
                AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0 AS log_w
            FROM feats f JOIN wt w ON w.bk = f.bk
            WHERE f.doc_id % {n_slices} = {i}
            GROUP BY f.doc_id
        """)
    con.execute(
        f"CREATE TABLE cut AS SELECT quantile_cont(log_w, {DSIR_KEEP_Q})"
        f" AS p_keep FROM doc_w"
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_slices = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    tmp = Path(".tmp")
    tmp.mkdir(exist_ok=True)
    db_path = tmp / "dsir_sliced.duckdb"
    if db_path.exists():
        db_path.unlink()
    con = duckdb.connect(str(db_path))
    con.execute(f"PRAGMA temp_directory='{tmp}/duckdb_spill'")
    con.execute("PRAGMA memory_limit='40GB'")
    con.execute("SET preserve_insertion_order=false")

    t0 = time.perf_counter()
    build_sliced(con, sf_dir, n_slices)
    t_oracle = time.perf_counter() - t0
    print(f"[sliced] oracle staged in {t_oracle:.1f}s", file=sys.stderr)

    spark = get_spark(
        app_name="dsir-sliced-oracle",
        shuffle_partitions=env_positive_int(
            "SPARK_GRAFT_SHUFFLE_PARTITIONS", 8
        ),
    )
    t0 = time.perf_counter()
    sdf = SUITE["ext_quality_dsir"].fn(spark, sf_dir)
    pair = agghash(sdf, FINAL_SQL, con)
    t_cmp = time.perf_counter() - t0
    con.close()
    shutil.rmtree(tmp / "duckdb_spill", ignore_errors=True)
    db_path.unlink(missing_ok=True)
    if pair is None:
        print("FAIL  ext_quality_dsir: schema has no canonical form")
        return 1
    s3, o3 = pair
    ok = s3 == o3
    print(f"{'PASS' if ok else 'FAIL'}  ext_quality_dsir (sliced oracle, "
          f"N={n_slices}): spark={s3} duck={o3} "
          f"[oracle {t_oracle:.1f}s, spark+hash {t_cmp:.1f}s]")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
