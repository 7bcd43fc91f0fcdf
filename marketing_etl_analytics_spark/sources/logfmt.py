"""Custom connector: a `logfmt` reader via the Python Data Source API.

Spark has no native reader for logfmt (`key=value key2="quoted val"`
lines — the ops-log format popularized by Heroku). This implements one
through the public Spark 4 Python Data Source API
(``pyspark.sql.datasource``), demonstrating the three things a real
connector must get right at scale:

1. **Partition planning** (``partitions``): one input partition per
   file, so a directory of N log files parses on N tasks; at cluster
   scale this is the split-enumeration step (extendable to byte-range
   splits since logfmt is line-delimited).
2. **Filter pushdown** (``pushFilters``, Spark 4.1): EqualTo /
   IsNotNull / StringStartsWith predicates on schema columns are
   accepted and applied DURING parsing — rows are dropped before they
   are materialized into Arrow batches, which is where a Python
   source pays its cost. Unsupported filters are handed back to Spark
   (which re-applies everything anyway — pushdown is a fast path,
   never a correctness dependency).
3. **Schema contract**: honors a user-supplied schema (string, long,
   double, boolean fields); without one, infers an all-string schema
   from the first line of the lexically-first file (cheap, bounded).

Usage::

    spark.dataSource.register(LogfmtDataSource)
    df = (spark.read.format("logfmt")
          .schema("ts string, level string, msg string, dur_ms long")
          .load("/var/log/app"))
"""

from __future__ import annotations

import glob
import os
import re
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    EqualTo,
    Filter,
    InputPartition,
    IsNotNull,
    SimpleDataSourceStreamReader,
    StringStartsWith,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

_PAIR = re.compile(r'([A-Za-z0-9_.-]+)=("(?:[^"\\]|\\.)*"|\S*)')


def parse_logfmt_line(line: str) -> dict[str, str]:
    """One logfmt line -> {key: raw string value} (quotes stripped,
    escapes unescaped). Malformed segments are simply not matched —
    logfmt is a best-effort format by design."""
    out: dict[str, str] = {}
    for k, v in _PAIR.findall(line):
        if v.startswith('"') and v.endswith('"') and len(v) >= 2:
            v = v[1:-1].replace('\\"', '"').replace("\\\\", "\\")
        out[k] = v
    return out


def _files(path: str) -> list[str]:
    if os.path.isdir(path):
        return sorted(
            glob.glob(os.path.join(path, "*.log"))
            + glob.glob(os.path.join(path, "*.logfmt"))
            + glob.glob(os.path.join(path, "*.txt"))
        )
    return sorted(glob.glob(path))


def _cast(raw: str | None, spark_type: str):
    if raw is None or raw == "":
        return None
    try:
        if spark_type in ("bigint", "int", "long", "integer", "smallint"):
            return int(raw)
        if spark_type in ("double", "float"):
            return float(raw)
        if spark_type == "boolean":
            low = raw.lower()
            if low in ("true", "1", "t", "yes"):
                return True
            if low in ("false", "0", "f", "no"):
                return False
            # explicit truthy/falsy sets only: a garbage cell becomes
            # NULL (matching the int/double paths), never a concrete
            # False — an IsNotNull pushed filter must drop it
            return None
        return raw
    except ValueError:
        return None  # permissive: unparseable cell -> NULL, row survives


class LogfmtReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.schema = schema
        self.options = options
        path = options.get("path")
        if not path:
            raise ValueError("logfmt source requires a path")
        self.paths = _files(path)
        self.applied: list[Filter] = []

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        names = {f.name for f in self.schema.fields}
        for f in filters:
            # single-segment column paths on schema fields only
            if (
                isinstance(f, (EqualTo, IsNotNull, StringStartsWith))
                and len(f.attribute) == 1
                and f.attribute[0] in names
            ):
                self.applied.append(f)
            else:
                yield f  # unsupported -> Spark keeps it

    def partitions(self) -> list[InputPartition]:
        # Hadoop-style byte-range splits: a single 100 GB log file
        # must not become one task. Each partition is
        # (path, start, end); readers resolve the line boundary at
        # runtime (skip the partial first line unless start == 0,
        # read through the line that crosses `end`) — every line is
        # consumed exactly once without coordination. splitSize=0
        # (default) keeps file granularity, the right call for
        # directories of rotated logs.
        split = int(self.options.get("splitsize", 0) or 0)
        parts: list[InputPartition] = []
        for p in self.paths:
            size = os.path.getsize(p)
            if split <= 0 or size <= split:
                parts.append(InputPartition((p, 0, size)))
            else:
                for start in range(0, size, split):
                    parts.append(InputPartition((p, start, min(start + split, size))))
        return parts

    def _keep(self, row: dict) -> bool:
        for f in self.applied:
            v = row.get(f.attribute[0])
            if isinstance(f, EqualTo):
                if v != f.value:
                    return False
            elif isinstance(f, IsNotNull):
                if v is None:
                    return False
            elif isinstance(f, StringStartsWith):
                if v is None or not str(v).startswith(f.value):
                    return False
        return True

    def read(self, partition: InputPartition):
        fields = [(f.name, f.dataType.simpleString()) for f in self.schema.fields]
        path, start, end = partition.value
        with open(path, "rb") as fh:
            fh.seek(start)
            if start > 0:
                # the split began mid-line: that line belongs to the
                # PREVIOUS split (which reads through its crossing
                # line), so discard up to the first newline
                fh.readline()
            while True:
                pos_before = fh.tell()
                # Hadoop line-boundary rule, INCLUSIVE at end: a line
                # starting exactly at `end` belongs to THIS split (the
                # next split discards its first line unconditionally,
                # having no way to know it was complete) — an
                # exclusive bound here would drop exactly-aligned
                # lines from both splits
                if pos_before > end:
                    break
                bline = fh.readline()
                if not bline:
                    break
                line = bline.decode("utf-8", errors="replace").strip()
                if not line:
                    continue
                raw = parse_logfmt_line(line)
                row = {n: _cast(raw.get(n), t) for n, t in fields}
                if self._keep(row):
                    yield tuple(row[n] for n, _ in fields)


class LogfmtDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "logfmt"

    def schema(self):
        # no user schema: infer all-string fields from the first line
        # of the first file (bounded, one line of IO)
        paths = _files(self.options.get("path", ""))
        if not paths:
            raise ValueError("logfmt source requires a non-empty path")
        with open(paths[0], "r", encoding="utf-8", errors="replace") as fh:
            first = fh.readline()
        keys = list(parse_logfmt_line(first))
        if not keys:
            raise ValueError("could not infer a logfmt schema from the first line")
        return ", ".join(f"{k} string" for k in keys)

    def reader(self, schema: StructType) -> LogfmtReader:
        return LogfmtReader(schema, dict(self.options))

    def simpleStreamReader(self, schema: StructType) -> "LogfmtStreamReader":
        return LogfmtStreamReader(schema, dict(self.options))

    def streamWriter(self, schema: StructType, overwrite: bool) -> "LogfmtStreamWriter":
        return LogfmtStreamWriter(schema, dict(self.options))


# --- streaming: tail a logfmt directory --------------------------------------


class LogfmtStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch tail of a logfmt directory.

    Offsets are ``{file: lines_consumed}`` — a replayable cursor, so
    a restarted query resumes exactly where the checkpoint left off
    and ``readBetweenOffsets`` can replay any past batch for
    recovery. New files and appended lines both advance the offset.
    The simple-reader API executes reads on the driver and is the
    right tier for control-plane-sized streams (log tailing,
    config/CDC feeds); the partitioned ``DataSourceStreamReader`` is
    the data-plane tier.
    """

    def __init__(self, schema: StructType, options: dict):
        self.schema = schema
        self.path = options.get("path")
        if not self.path:
            raise ValueError("logfmt stream requires a path")

    def initialOffset(self) -> dict:
        return {}

    def _snapshot(self) -> dict:
        # Count only lines TERMINATED by '\n': a live writer's torn
        # final line must not be consumed — counting it would parse a
        # partial record AND skip the completed remainder forever
        # (its index would already be < the stored offset). The
        # fragment is picked up whole in a later batch once the
        # writer finishes the line.
        out = {}
        for p in _files(self.path):
            n = 0
            with open(p, "rb") as fh:
                while chunk := fh.read(1 << 20):
                    n += chunk.count(b"\n")
            out[p] = n
        return out

    def _lines(self, start: dict, end: dict):
        fields = [(f.name, f.dataType.simpleString()) for f in self.schema.fields]
        for p, hi in sorted(end.items()):
            lo = start.get(p, 0)
            if hi <= lo:
                continue
            # binary iteration splits on b'\n' exactly — the same rule
            # _snapshot counts by, so indexes and offsets always agree
            with open(p, "rb") as fh:
                for i, bline in enumerate(fh):
                    if i >= hi:
                        break
                    line = bline.decode("utf-8", errors="replace").strip()
                    if i < lo or not line:
                        continue
                    raw = parse_logfmt_line(line)
                    yield tuple(_cast(raw.get(n), t) for n, t in fields)

    def read(self, start: dict):
        end = self._snapshot()
        # carry forward files that vanished so offsets never regress
        for p, n in start.items():
            end.setdefault(p, n)
        # materialized, not a generator: the simple-reader API pickles
        # the batch for prefetch/replay; fine at this tier — a
        # micro-batch of a tailed log is bounded by arrival rate
        return list(self._lines(start, end)), end

    def readBetweenOffsets(self, start: dict, end: dict):
        return list(self._lines(start, end))


# --- streaming writer: emit logfmt files with rename-commit ------------------


class _LogfmtCommit(WriterCommitMessage):
    def __init__(self, staged: str | None, final: str | None):
        self.staged = staged
        self.final = final


class LogfmtStreamWriter(DataSourceStreamWriter):
    """Micro-batch logfmt file sink with two-phase commit.

    Executors serialize their partition to a STAGED file (`.staging`
    suffix, unique per batch/partition/attempt); the driver's
    ``commit`` renames every staged file into place — rename is the
    atomic publish, so a reader (or the logfmt stream TAIL above)
    never observes a half-written file, and a failed/speculative task
    attempt leaves only staging garbage that ``abort`` removes. This
    is the same stage-then-publish protocol the versioned table's
    manifest commit uses (sources/acid.py), at file granularity.
    Values serialize as `k=v` with quoting only when needed; None
    fields are omitted (logfmt's native missing-key convention).
    """

    def __init__(self, schema: StructType, options: dict):
        self.schema = schema
        self.path = options.get("path")
        if not self.path:
            raise ValueError("logfmt sink requires a path")
        os.makedirs(self.path, exist_ok=True)

    def _fmt(self, k: str, v) -> str | None:
        if v is None:
            return None
        s = str(v)
        if s == "" or " " in s or '"' in s:
            s = '"' + s.replace("\\", "\\\\").replace('"', '\\"') + '"'
        return f"{k}={s}"

    def write(self, iterator) -> "_LogfmtCommit":
        import uuid

        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx else 0
        # staged name stays attempt-unique (speculative attempts must
        # not collide); the FINAL name is assigned by commit() from
        # (batchId, message order) so a replayed batch re-publishes
        # onto the same paths instead of adding a second copy
        staged = os.path.join(
            self.path, f".part-{pid:05d}-{uuid.uuid4().hex[:8]}.staging"
        )
        final = None
        n = 0
        with open(staged, "w", encoding="utf-8") as fh:
            for row in iterator:
                pairs = [
                    p
                    for f in self.schema.fields
                    if (p := self._fmt(f.name, row[f.name])) is not None
                ]
                fh.write(" ".join(pairs) + "\n")
                n += 1
        if n == 0:
            os.remove(staged)
            return _LogfmtCommit(None, None)
        return _LogfmtCommit(staged, final)

    def commit(self, messages, batchId: int) -> None:
        # deterministic publish paths keyed by (batchId, slot):
        # os.replace is the atomic overwrite, so an at-least-once
        # replay of a batch lands on the SAME files — exactly-once
        # output by idempotent placement
        for i, m in enumerate(messages):
            if m is not None and m.staged is not None:
                final = os.path.join(
                    self.path, f"batch-{batchId:06d}-part-{i:05d}.log"
                )
                os.replace(m.staged, final)

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            if m is not None and m.staged is not None:
                try:
                    os.remove(m.staged)
                except OSError:
                    pass
