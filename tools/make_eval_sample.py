"""Deterministic content-hash subsample of a testdata dir's documents.

Purpose (VERDICT r6 #5a): the `ext_dedup_eval` DuckDB ORACLE — not the
Spark side — exceeds the container's temp disk at the 100x probe SF
(exact-Jaccard truth is quadratic in shingle-bucket sizes). Sampling
the DOCUMENT universe by a deterministic md5 bucket (the same
content-addressed discipline as `ext_sample_stratified`) shrinks the
truth workload ~(k/m)^2 while both engines see the identical sampled
corpus, so the evaluation harness itself gets an oracle-exact row at
100x instead of an exclusion. Every other table is symlinked
unchanged.

Usage: python tools/make_eval_sample.py SRC_DIR OUT_DIR [K] [M]
       (keeps docs with ('0x'||substr(md5(text),1,8))::BIGINT % M < K;
        default 1/8)
"""

from __future__ import annotations

import os
import sys

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def main() -> int:
    src, out = sys.argv[1], sys.argv[2]
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    m = int(sys.argv[4]) if len(sys.argv) > 4 else 8
    os.makedirs(out, exist_ok=True)

    def src_path(tname: str) -> str:
        p = os.path.join(src, f"{tname}.parquet")
        return os.path.join(p, "*.parquet") if os.path.isdir(p) else p

    con = duckdb.connect()
    n_all, n_kept = con.execute(
        f"""
        SELECT COUNT(*),
          COUNT(*) FILTER (
            ('0x' || substr(md5(text), 1, 8))::BIGINT % {m} < {k})
        FROM read_parquet('{src_path("documents")}')
        """
    ).fetchone()
    con.execute(
        f"""
        COPY (
          SELECT * FROM read_parquet('{src_path("documents")}')
          WHERE ('0x' || substr(md5(text), 1, 8))::BIGINT % {m} < {k}
        ) TO '{os.path.join(out, "documents.parquet")}' (FORMAT PARQUET)
        """
    )
    for tname in TABLES:
        if tname == "documents":
            continue
        dst = os.path.join(out, f"{tname}.parquet")
        if not os.path.exists(dst):
            os.symlink(
                os.path.abspath(os.path.join(src, f"{tname}.parquet")), dst
            )
    print(f"{out}: documents {n_all} -> {n_kept} (mod {m} < {k})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
