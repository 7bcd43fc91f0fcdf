"""Custom logfmt connector (Spark 4 Python Data Source API):
partition planning, schema contract, inference, and filter pushdown."""

from __future__ import annotations

from pyspark.sql.datasource import EqualTo, GreaterThan, IsNotNull, StringStartsWith

from marketing_etl_analytics_spark.sources.logfmt import (
    LogfmtDataSource,
    LogfmtReader,
    parse_logfmt_line,
)

LINES_A = [
    'ts=2026-01-01T00:00:00Z level=info msg="service started" dur_ms=12',
    'ts=2026-01-01T00:00:01Z level=error msg="db timeout \\"primary\\"" dur_ms=5000',
    "",
    'ts=2026-01-01T00:00:02Z level=info msg=ok dur_ms=3',
]
LINES_B = [
    'ts=2026-01-01T00:01:00Z level=warn msg="disk 90%" dur_ms=7',
    'ts=2026-01-01T00:01:01Z level=error msg=oom dur_ms=notanumber',
]


def _write(tmp_path):
    d = tmp_path / "logs"
    d.mkdir()
    (d / "a.log").write_text("\n".join(LINES_A))
    (d / "b.log").write_text("\n".join(LINES_B))
    return str(d)


def test_parse_line_quotes_and_escapes():
    row = parse_logfmt_line(LINES_A[1])
    assert row["msg"] == 'db timeout "primary"'
    assert row["dur_ms"] == "5000"


def test_read_with_schema_and_partition_per_file(spark, tmp_path):
    path = _write(tmp_path)
    spark.dataSource.register(LogfmtDataSource)
    df = (
        spark.read.format("logfmt")
        .schema("ts string, level string, msg string, dur_ms long")
        .load(path)
    )
    assert df.rdd.getNumPartitions() == 2  # one split per file
    rows = {r["ts"]: r for r in df.collect()}
    assert len(rows) == 5  # blank line skipped
    assert rows["2026-01-01T00:00:01Z"]["msg"] == 'db timeout "primary"'
    assert rows["2026-01-01T00:00:01Z"]["dur_ms"] == 5000
    assert rows["2026-01-01T00:01:01Z"]["dur_ms"] is None  # permissive cast


def test_schema_inference_all_strings(spark, tmp_path):
    path = _write(tmp_path)
    spark.dataSource.register(LogfmtDataSource)
    df = spark.read.format("logfmt").load(path)
    assert [f.name for f in df.schema.fields] == ["ts", "level", "msg", "dur_ms"]
    assert all(f.dataType.simpleString() == "string" for f in df.schema.fields)
    assert df.count() == 5


def test_filtered_query_end_to_end(spark, tmp_path):
    path = _write(tmp_path)
    spark.dataSource.register(LogfmtDataSource)
    df = (
        spark.read.format("logfmt")
        .schema("ts string, level string, msg string, dur_ms long")
        .load(path)
        .filter("level = 'error'")
    )
    assert sorted(r["ts"] for r in df.collect()) == [
        "2026-01-01T00:00:01Z",
        "2026-01-01T00:01:01Z",
    ]


def test_push_filters_split_and_applied(spark, tmp_path):
    """Supported predicates are retained and applied during parsing;
    unsupported ones are handed back to Spark."""
    from pyspark.sql.types import StructType

    path = _write(tmp_path)
    schema = StructType.fromDDL("ts string, level string, msg string, dur_ms long")
    reader = LogfmtReader(schema, {"path": path})
    unsupported = list(
        reader.pushFilters(
            [
                EqualTo(("level",), "error"),
                IsNotNull(("msg",)),
                StringStartsWith(("ts",), "2026-01-01T00:00"),
                GreaterThan(("dur_ms",), 10),  # not supported -> returned
                EqualTo(("nosuchcol",), 1),  # not in schema -> returned
            ]
        )
    )
    assert {type(f).__name__ for f in unsupported} == {"GreaterThan", "EqualTo"}
    assert len(reader.applied) == 3
    parts = reader.partitions()
    got = [row for p in parts for row in reader.read(p)]
    # only the file-A error row survives all three applied predicates
    assert got == [
        ("2026-01-01T00:00:01Z", "error", 'db timeout "primary"', 5000)
    ]


def test_stream_tails_appended_lines(spark, tmp_path):
    """Two availableNow runs over one checkpoint: the second run sees
    ONLY lines appended after the first (file-offset cursor resume)."""
    d = tmp_path / "slogs"
    d.mkdir()
    f = d / "app.log"
    f.write_text("\n".join(LINES_A) + "\n")
    spark.dataSource.register(LogfmtDataSource)
    ckpt = str(tmp_path / "ckpt")

    out = str(tmp_path / "out")

    def run():
        q = (
            spark.readStream.format("logfmt")
            .schema("ts string, level string, msg string, dur_ms long")
            .load(str(d))
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    assert spark.read.parquet(out).count() == 3  # blank line skipped

    with open(f, "a") as fh:
        fh.write("\n".join(LINES_B) + "\n")
    run()
    rows = spark.read.parquet(out).collect()
    got = {r["ts"] for r in rows}
    assert len(rows) == 5 and len(got) == 5  # 3 + 2 appended, no re-reads
    assert "2026-01-01T00:01:00Z" in got


def test_stream_skips_torn_final_line(spark, tmp_path):
    """A trailing PARTIAL line (no terminating newline — a live
    writer's torn write) is not consumed: the offset counts only
    '\\n'-terminated lines, so the fragment is picked up WHOLE in a
    later batch once the writer finishes it. Counting it would parse
    a corrupted record and then skip the completed remainder
    forever."""
    d = tmp_path / "tlogs"
    d.mkdir()
    f = d / "app.log"
    # two complete lines + a torn third (writer mid-flush)
    f.write_text("\n".join(LINES_A[:2]) + "\n" + "ts=2026-01-01T00:00:02Z lev")
    spark.dataSource.register(LogfmtDataSource)
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def run():
        q = (
            spark.readStream.format("logfmt")
            .schema("ts string, level string, msg string, dur_ms long")
            .load(str(d))
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 2  # torn line NOT consumed
    assert all(r["level"] in ("info", "error") for r in rows)

    # the writer finishes the line; the record arrives whole
    with open(f, "a") as fh:
        fh.write('el=info msg="late flush" dur_ms=9\n')
    run()
    rows = {r["ts"]: r for r in spark.read.parquet(out).collect()}
    assert len(rows) == 3
    late = rows["2026-01-01T00:00:02Z"]
    assert late["level"] == "info" and late["msg"] == "late flush"
    assert late["dur_ms"] == 9


def test_boolean_cast_unparseable_is_null(spark, tmp_path):
    """An unparseable boolean cell becomes NULL (like the numeric
    paths), never a concrete False — so IsNotNull filters drop it."""
    from marketing_etl_analytics_spark.sources.logfmt import _cast

    assert _cast("true", "boolean") is True
    assert _cast("YES", "boolean") is True
    assert _cast("false", "boolean") is False
    assert _cast("0", "boolean") is False
    assert _cast("maybe", "boolean") is None
    assert _cast("xyz", "boolean") is None

    d = tmp_path / "blogs"
    d.mkdir()
    (d / "a.log").write_text(
        "id=1 ok=true\nid=2 ok=garbage\nid=3 ok=false\n"
    )
    spark.dataSource.register(LogfmtDataSource)
    df = (
        spark.read.format("logfmt")
        .schema("id long, ok boolean")
        .load(str(d))
    )
    got = {r["id"]: r["ok"] for r in df.collect()}
    assert got == {1: True, 2: None, 3: False}
    assert df.filter("ok IS NOT NULL").count() == 2


def test_byte_range_splits_exactly_once(spark, tmp_path):
    """With a small splitSize a single file fans out to many
    partitions, and the line-boundary handshake (skip partial first
    line unless start=0, read through the crossing line) yields every
    record exactly once."""
    d = tmp_path / "big"
    d.mkdir()
    lines = [f'seq={i} level=info msg="row number {i}"' for i in range(500)]
    (d / "big.log").write_text("\n".join(lines) + "\n")
    spark.dataSource.register(LogfmtDataSource)
    df = (
        spark.read.format("logfmt")
        .schema("seq long, level string, msg string")
        .option("splitSize", "1024")
        .load(str(d))
    )
    assert df.rdd.getNumPartitions() > 5  # ~18 KB file / 1 KB splits
    got = sorted(r["seq"] for r in df.collect())
    assert got == list(range(500))  # exactly once, none lost at boundaries


def test_byte_range_split_exact_line_alignment(spark, tmp_path):
    """Fixed-width lines with splitSize an exact multiple: every split
    boundary falls exactly on a line start — the case where an
    exclusive end-bound would drop one line per boundary (the previous
    split stops short AND the next discards it as 'partial')."""
    d = tmp_path / "aligned"
    d.mkdir()
    # each line exactly 16 bytes incl. newline: 'seq=0000 k=vvv\n' is 15 -> pad
    lines = [f"seq={i:04d} k=vvvv" for i in range(64)]
    assert all(len(l) + 1 == 16 for l in lines)
    (d / "a.log").write_text("\n".join(lines) + "\n")
    spark.dataSource.register(LogfmtDataSource)
    df = (
        spark.read.format("logfmt")
        .schema("seq long, k string")
        .option("splitSize", "64")  # 4 lines per split, exact alignment
        .load(str(d))
    )
    assert df.rdd.getNumPartitions() == 16
    got = sorted(r["seq"] for r in df.collect())
    assert got == list(range(64))


def test_stream_writer_round_trip(spark, tmp_path):
    """events stream -> logfmt stream sink -> logfmt reader: the
    connector loop closes. Staged files rename-publish on commit, so
    the output dir only ever holds complete .log files; quoting and
    None-omission round-trip through the parser."""
    import glob as _glob

    out = str(tmp_path / "logout")
    spark.dataSource.register(LogfmtDataSource)
    src = spark.createDataFrame(
        [(1, "hello world", 10), (2, None, 20), (3, 'say "hi"', None)],
        "id long, msg string, n long",
    )
    src.coalesce(1).write.mode("append").parquet(str(tmp_path / "in"))
    q = (
        spark.readStream.schema(src.schema)
        .parquet(str(tmp_path / "in"))
        .writeStream.format("logfmt")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert not _glob.glob(f"{out}/.*.staging")  # nothing half-published
    back = (
        spark.read.format("logfmt")
        .schema("id long, msg string, n long")
        .load(out)
    )
    rows = {r["id"]: (r["msg"], r["n"]) for r in back.collect()}
    assert rows == {1: ("hello world", 10), 2: (None, 20), 3: ('say "hi"', None)}
