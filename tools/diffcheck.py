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
import re
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


# --- in-engine hash compare (VERDICT r7 #3) ---------------------------------
#
# The multiset compare COLLECTS both result sets into this process —
# at 100x-class SFs that is the dominant sweep cost (the r7 session-2
# sweep spent 66 of 156 min inside the Python compare of
# etl_fact_sales, 60 M rows x 2 engines) and doubles peak RSS. Agghash
# mode instead reduces each side IN ITS OWN ENGINE to three scalars —
# COUNT(*) plus two order-free sums of 48-bit md5 slices over a
# canonical per-row rendering — and compares the scalars; any mismatch
# falls back to the exact multiset compare, so a hash MISMATCH can slow
# a run but never flip a verdict to FAIL. The asymmetry is deliberate
# and worth naming (ADVICE r8): a matching hash is accepted as PASS
# with no exact-compare fallback, so in the pass direction agghash IS
# the arbiter — a 96-bit additive-multiset collision, or a genuine
# sub-1e-6 double divergence on an output that escaped the suite's
# pround quantization, would record a false MATCH. The suite-side
# guard is tests/test_oracle_type_lint.py's pround-discipline lint on
# double-bearing schemas; the residual risk is the 2^-96 collision.
#
# Canonical rendering parity (validated cross-engine in round 8):
# ints/decimals/dates/booleans cast to identical strings; timestamps
# via an explicit microsecond format; doubles snap to DECIMAL(38,6) —
# Spark's double->decimal cast goes through the shortest-repr string
# (Java semantics) while DuckDB converts the binary value exactly, but
# both land on the same 6-dp decimal for the suite's pround-
# disciplined outputs (the double sits ~1e-10 from the 6-dp lattice
# point, never at the 5e-7 tie). Known blind spots, both accepted:
# sub-1e-6 double differences hash equal (the suite's numeric
# discipline quantizes every reported double at >= 1e-6), and doubles
# with |d| > ~9e9 (ulp > 1e-6) may falsely MISmatch -> fallback.
# -0.0 normalizes to 0.0 via `+ 0.0` (Python == semantics); NaN maps
# to a literal, NULL to a sentinel. Array/struct/map/binary columns
# are not supported -> the entry silently uses the exact compare.

_NULL = "\x01N"
_SEP = "\x1f"


def _canon_exprs(cols_types: list[tuple[str, str]], dialect: str):
    """Per-column canonical-string SQL (sorted by column name), or
    None if a column type has no cross-engine canonical form."""
    out = []
    for col, typ in sorted(cols_types):
        t_ = typ.lower()
        q = f"`{col}`" if dialect == "spark" else f'"{col}"'
        if t_ in ("double", "float", "real"):
            if dialect == "spark":
                e = (f"CASE WHEN isnan({q}) THEN 'nan' ELSE "
                     f"CAST(CAST({q} + CAST(0.0 AS DOUBLE) AS DECIMAL(38,6))"
                     f" AS STRING) END")
            else:
                e = (f"CASE WHEN isnan({q}) THEN 'nan' ELSE "
                     f"CAST(CAST({q} + 0.0 AS DECIMAL(38,6)) AS VARCHAR) END")
        elif (t_.startswith("decimal") or t_ in (
                "tinyint", "smallint", "int", "integer", "bigint", "hugeint",
                "boolean", "date", "string", "varchar")):
            e = f"CAST({q} AS {'STRING' if dialect == 'spark' else 'VARCHAR'})"
        elif t_.startswith("timestamp"):
            e = (f"date_format({q}, 'yyyy-MM-dd HH:mm:ss.SSSSSS')"
                 if dialect == "spark"
                 else f"strftime({q}, '%Y-%m-%d %H:%M:%S.%f')")
        else:  # array/struct/map/binary/interval -> unsupported
            return None
        out.append(f"COALESCE({e}, '{_NULL}')")
    return out


def agghash(sdf, oracle: str, con):
    """(spark_triple, duck_triple) of (count, sum_lo, sum_hi) — or
    None when the schema has no canonical form. Sums are exact
    (DECIMAL(38,0) / HUGEINT) over 48-bit md5 slices, order-free."""
    spark_canon = _canon_exprs(sdf.dtypes, "spark")
    if spark_canon is None:
        return None
    row = f"md5(concat_ws('{_SEP}', {', '.join(spark_canon)}))"
    s = sdf.selectExpr(
        "COUNT(*) AS n",
        f"SUM(CAST(CONV(SUBSTRING({row}, 1, 12), 16, 10) AS DECIMAL(38,0))) AS h1",
        f"SUM(CAST(CONV(SUBSTRING({row}, 13, 12), 16, 10) AS DECIMAL(38,0))) AS h2",
    ).collect()[0]
    s3 = (int(s[0]), int(s[1] or 0), int(s[2] or 0))

    # cursor.description only exposes generic DBAPI type names
    # ('NUMBER'); DESCRIBE gives the concrete DuckDB column types
    duck_types = [
        (r[0], r[1])
        for r in con.execute(f"DESCRIBE SELECT * FROM ({oracle}) __t").fetchall()
    ]
    duck_canon = _canon_exprs(duck_types, "duck")
    if duck_canon is None:
        return None
    drow = f"md5(concat_ws('{_SEP}', {', '.join(duck_canon)}))"
    o = con.execute(
        f"SELECT COUNT(*), "
        f"SUM(('0x' || substr({drow}, 1, 12))::BIGINT), "
        f"SUM(('0x' || substr({drow}, 13, 12))::BIGINT) "
        f"FROM ({oracle}) __t"
    ).fetchone()
    o3 = (int(o[0]), int(o[1] or 0), int(o[2] or 0))
    return s3, o3


# --- shared-oracle stage cache (VERDICT r8 Next #7) --------------------------
#
# The sf10b sweep's residual wall is DuckDB ORACLE evaluation on the
# dedup/graph family: 13 oracles inline the same shingle-explosion CTE
# (byte-identical text — they are all built from the same Python
# constants), so the sweep recomputes the same multi-hundred-second
# stage table per entry. --stagecache parses each oracle's TOP-LEVEL
# CTEs, finds bodies that (a) appear verbatim in >= 2 oracles and
# (b) reference only base tables (no sibling CTE names — so the body
# is a self-contained deterministic SELECT), materializes each such
# body ONCE as a DuckDB temp table on first use, and textually
# substitutes `(body)` -> `(SELECT * FROM stage_<sha>)` before
# executing. Exact-text keying means the temp table IS the CTE's
# result — same rows, same types, same verdicts. Like --agghash this
# is an accelerator, never an arbiter: ANY error in parsing, creation,
# or the substituted query falls back to the raw oracle. The graded
# driver always runs the raw oracle text; only this harness
# accelerates.

_MIN_STAGE_LEN = 200  # ignore trivial CTE bodies (VALUES lists etc.)


def _parse_top_ctes(sql: str) -> list[tuple[str, str | None, str]]:
    """[(name, column_list_or_None, body)] of top-level WITH ctes, or
    [] if the statement has no leading WITH / uses RECURSIVE / fails
    to parse. Handles single-quoted strings and -- line comments
    during paren balancing, and the ``name(cols) AS (...)`` form."""
    i, n = 0, len(sql)

    def skip_ws(j: int) -> int:
        while j < n:
            if sql[j].isspace():
                j += 1
            elif sql.startswith("--", j):
                k = sql.find("\n", j)
                j = n if k < 0 else k + 1
            else:
                break
        return j

    def balanced(j: int) -> int:
        """Index of the ')' closing the '(' at j, or -1."""
        depth = 0
        while j < n:
            c = sql[j]
            if c == "'":  # string literal ('' escapes)
                j += 1
                while j < n:
                    if sql[j] == "'":
                        if j + 1 < n and sql[j + 1] == "'":
                            j += 2
                            continue
                        break
                    j += 1
            elif sql.startswith("--", j):
                k = sql.find("\n", j)
                j = n if k < 0 else k
            elif c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
                if depth == 0:
                    return j
            j += 1
        return -1

    i = skip_ws(i)
    if not re.match(r"WITH\b", sql[i:], re.IGNORECASE):
        return []
    i += 4
    if re.match(r"\s*RECURSIVE\b", sql[i:], re.IGNORECASE):
        return []  # self-referencing bodies — never cacheable
    out = []
    while True:
        i = skip_ws(i)
        m = re.match(r'("?[\w]+"?)', sql[i:])
        if not m:
            return []
        name = m.group(1).strip('"')
        i = skip_ws(i + m.end())
        cols = None
        if i < n and sql[i] == "(":  # name(col, ...) AS (...)
            j = balanced(i)
            if j < 0:
                return []
            cols = sql[i + 1:j]
            i = skip_ws(j + 1)
        m = re.match(r"AS\b", sql[i:], re.IGNORECASE)
        if not m:
            return []
        i = skip_ws(i + 2)
        # optional DuckDB materialization hint
        m = re.match(r"(NOT\s+)?MATERIALIZED\b", sql[i:], re.IGNORECASE)
        if m:
            i = skip_ws(i + m.end())
        if i >= n or sql[i] != "(":
            return []
        j = balanced(i)
        if j < 0:
            return []
        out.append((name, cols, sql[i + 1:j]))
        i = skip_ws(j + 1)
        if i < n and sql[i] == ",":
            i += 1
            continue
        return out


def _oracle_stage_chains(oracle: str) -> list[tuple[str, str, str, list[str]]]:
    """[(chain_key, name, body, dep_names)] of cacheable CTEs in
    definition order. A CTE is cacheable when it has no column list
    and every sibling CTE it references is itself cacheable (one
    materialized stage can then be built FROM the dep's stage table).
    The chain key hashes the body plus its deps' chain keys, so two
    oracles share a stage only when the whole upstream chain is
    byte-identical — the exact-text guarantee that makes the temp
    table's rows THE CTE's rows."""
    import hashlib

    ctes = _parse_top_ctes(oracle)
    names = [nm for nm, _, _ in ctes]
    keys: dict[str, str] = {}
    out = []
    for name, cols, body in ctes:
        if cols is not None:
            continue  # column-list CTEs rename outputs — skip
        refs = [
            nm for nm in names
            if nm != name and re.search(rf"\b{re.escape(nm)}\b", body)
        ]
        if any(r not in keys for r in refs):
            continue
        if refs and re.match(r"\s*WITH\b", body, re.IGNORECASE):
            continue  # can't prepend the dep-binding WITH prefix
        h = hashlib.sha1(body.encode())
        for r in sorted(refs):
            h.update(b"\x00")
            h.update(keys[r].encode())
        keys[name] = h.hexdigest()
        out.append((keys[name], name, body, refs))
    return out


def build_stage_plan(entries) -> dict[str, str]:
    """{chain_key: temp_table_name} for stages shared by >= 2
    oracles. Dependencies of a shared stage are shared by
    construction (the chain key embeds them), so apply_stage_plan can
    always materialize bottom-up."""
    from collections import Counter

    counts: Counter[str] = Counter()
    sizes: dict[str, int] = {}
    for entry in entries:
        if entry.oracle is None:
            continue
        try:
            chains = _oracle_stage_chains(entry.oracle)
        except Exception:  # noqa: BLE001 — parse failure = no caching
            continue
        counts.update({c[0] for c in chains})
        for key, _, body, _ in chains:
            sizes[key] = len(body)
    return {
        key: f"stage_{key[:12]}"
        for key, cnt in counts.items()
        if cnt >= 2 and sizes[key] >= _MIN_STAGE_LEN
    }


def apply_stage_plan(oracle: str, plan: dict[str, str], con,
                     created: set[str]) -> str:
    """Substitute cached stages into ``oracle``, creating each temp
    table on first use (deps first — chain order is definition
    order). Raises on creation failure — the caller falls back to the
    raw oracle text."""
    chains = _oracle_stage_chains(oracle)
    info = {name: (key, body, refs) for key, name, body, refs in chains}

    def ensure(name: str) -> str:
        """Materialize CTE ``name`` (deps first), return its table."""
        key, body, refs = info[name]
        tbl = f"stage_{key[:12]}"
        if tbl not in created:
            # re-bind dep names via a WITH prefix rather than editing
            # the body text — a column may share its CTE's name (the
            # graph family's `sh`), which a textual substitution would
            # corrupt
            mat = body
            if refs:
                binds = ", ".join(
                    f"{r} AS (SELECT * FROM {ensure(r)})" for r in refs
                )
                mat = f"WITH {binds} {body}"
            t0 = time.time()
            con.execute(f"CREATE TEMP TABLE {tbl} AS {mat}")
            created.add(tbl)
            print(f"  ..  stagecache: built {tbl} ({name}) "
                  f"[{time.time()-t0:.1f}s]")
        return tbl

    out = oracle
    for key, name, body, refs in chains:
        tbl = plan.get(key)
        if tbl is None:
            continue  # not shared (or too small) — leave the raw CTE
        out = out.replace(body, f" SELECT * FROM {ensure(name)} ", 1)
    return out


def main() -> int:
    args = [a for a in sys.argv[1:]
            if a not in ("--agghash", "--stagecache")]
    agg_mode = "--agghash" in sys.argv[1:]
    stage_mode = "--stagecache" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

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

    stage_plan: dict[str, str] = {}
    stage_created: set[str] = set()
    if stage_mode:
        stage_plan = build_stage_plan(SUITE.values())
        print(f"[stagecache] {len(stage_plan)} shared stage bodies "
              f"across the registry")

    n_pass = n_fail = n_weak = 0
    for name, entry in SUITE.items():
        if only and name not in only:
            continue
        t0 = time.time()
        oracle_eff = entry.oracle
        if stage_mode and entry.oracle is not None:
            try:
                oracle_eff = apply_stage_plan(
                    entry.oracle, stage_plan, con, stage_created
                )
            except Exception as e:  # noqa: BLE001 — accelerator only
                print(f"  ..  {name}: stagecache raised "
                      f"{type(e).__name__}: {e} -> raw oracle")
                oracle_eff = entry.oracle
        try:
            sdf = entry.fn(spark, sf_dir)
            if agg_mode and entry.oracle is not None:
                # column-name parity first (cheap), then the scalar
                # hash compare; only a mismatch pays the collect.
                # ANY agghash-path error (e.g. the DuckDB hash query
                # spilling past free temp disk on a heavy oracle)
                # demotes to the exact compare instead of failing the
                # entry — agghash is an accelerator, never an arbiter.
                try:
                    cur = con.execute(
                        f"SELECT * FROM ({oracle_eff}) LIMIT 0"
                    )
                    ocols_probe = sorted(d[0] for d in cur.description)
                    hashes = (
                        agghash(sdf, oracle_eff, con)
                        if ocols_probe == sorted(sdf.columns)
                        else None
                    )
                except Exception as e:  # noqa: BLE001
                    print(f"  ..  {name}: agghash path raised "
                          f"{type(e).__name__}: {e} -> exact compare")
                    hashes = None
                if hashes is not None:
                    s3, o3 = hashes
                    if s3 == o3:
                        print(f"PASS  {name}: rows={s3[0]} (agghash) "
                              f"[{time.time()-t0:.1f}s]")
                        n_pass += 1
                        continue
                    print(f"  ..  {name}: agghash mismatch "
                          f"spark={s3} oracle={o3} -> exact compare")
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
            try:
                cur = con.execute(oracle_eff)
            except Exception:  # noqa: BLE001
                if oracle_eff == entry.oracle:
                    raise
                # substituted oracle failed — retry the raw text (the
                # stage cache must never change a verdict)
                print(f"  ..  {name}: stage-substituted oracle failed "
                      "-> raw oracle")
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
