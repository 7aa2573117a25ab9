r"""The custom Python DataSource (chunked headerless CSV): every byte read
exactly once across splits at ANY chunk size, \N/empty -> NULL, declared
all-string schema — the reference's chunked scan model as parallel splits."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from simple_land_registry_data_ingestion_spark.sources.pyds import (
    ChunkedCsvDataSource,
)


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(ChunkedCsvDataSource)
    return spark


@pytest.fixture(scope="module")
def csv_file(tmp_path_factory):
    path = tmp_path_factory.mktemp("pyds") / "data.csv"
    rows = []
    for i in range(500):
        null_mark = "\\N" if i % 7 == 0 else f"v{i}"
        rows.append(f"{i},{null_mark},cat{i % 3}")
    rows.append("tail,,x")  # empty field -> NULL
    path.write_text("\n".join(rows) + "\n")
    return str(path)


def _read(spark, path, chunk_bytes):
    return (
        spark.read.format("chunked_csv")
        .option("path", path)
        .option("columns", "id,val,cat")
        .option("chunk_bytes", str(chunk_bytes))
        .load()
    )


def test_rows_complete_and_chunk_size_invariant(registered, csv_file):
    """Same result at 1 split, tiny splits (records straddle boundaries),
    and mid-size splits — the InputFormat split contract."""
    whole = _read(registered, csv_file, 1 << 30).collect()
    assert len(whole) == 501
    baseline = sorted(map(tuple, whole))
    for chunk in (64, 997, 4096):
        df = _read(registered, csv_file, chunk)
        assert sorted(map(tuple, df.collect())) == baseline
    # tiny chunks genuinely produce many input partitions
    assert _read(registered, csv_file, 997).rdd.getNumPartitions() > 5


def test_null_sentinel_and_declared_schema(registered, csv_file):
    df = _read(registered, csv_file, 2048)
    assert [f.dataType.simpleString() for f in df.schema.fields] == ["string"] * 3
    n_null = df.where(F.col("val").isNull()).count()
    # 500/7 rounded up -> 72 \N rows, plus the empty-field row
    assert n_null == 72 + 1
    # values survive verbatim (no inference: id stays a string)
    assert df.where(F.col("id") == "tail").count() == 1


def test_matches_builtin_csv_reader(registered, spark, csv_file):
    """The custom source agrees with Spark's own csv reader configured the
    reference's way (headerless, all-string, nullValue=\\N)."""
    theirs = (
        spark.read.schema("id string, val string, cat string")
        .option("nullValue", "\\N")
        .option("emptyValue", None)
        .csv(csv_file)
    )
    ours = _read(registered, csv_file, 1024)
    assert sorted(map(tuple, ours.collect())) == sorted(
        map(tuple, theirs.collect())
    )


def test_streaming_tail_reads_appends_exactly_once(registered, tmp_path):
    """The streaming flavor tails the file: a first run drains the initial
    lines; after APPENDING more (plus one incomplete line), a NEW query on
    the same checkpoint emits only the completed appended rows — offsets
    restore from the checkpoint, nothing re-emits, the partial line waits."""
    from simple_land_registry_data_ingestion_spark.streaming import ops

    spark = registered
    path = tmp_path / "tail.csv"
    path.write_text("1,a,x\n2,b,y\n")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    seen_batches = [-1]

    def drain():
        # memory sink can't recover from a checkpoint; the foreachBatch
        # parquet sink can — new rows are the batches beyond the last run's
        stream = (
            spark.readStream.format("chunked_csv")
            .option("path", str(path))
            .option("columns", "id,val,cat")
            .load()
        )
        q = ops.foreach_batch_parquet_sink(stream, out, ckpt)
        q.awaitTermination()
        df = spark.read.parquet(out)
        import pyspark.sql.functions as F

        fresh = df.where(F.col("batch_id") > seen_batches[0])
        seen_batches[0] = df.agg(F.max("batch_id")).first()[0]
        return sorted(
            map(tuple, fresh.select("id", "val", "cat").collect())
        )

    assert drain() == [("1", "a", "x"), ("2", "b", "y")]

    with open(path, "a") as fh:
        fh.write("3,\\N,z\n4,partial")  # 4 has no newline yet -> withheld
    assert drain() == [("3", None, "z")]

    with open(path, "a") as fh:
        fh.write(",w\n")  # completes row 4
    assert drain() == [("4", "partial", "w")]


def test_stream_writer_commits_batches_atomically(registered, tmp_path):
    r"""The custom streaming WRITER: rows flow source->sink through the same
    DataSource, each micro-batch becomes manifested part files (\N for
    NULL), temp files never linger, and the manifest row counts equal the
    data exactly."""
    import json
    import os

    spark = registered
    src = tmp_path / "src.csv"
    src.write_text("1,a,x\n2,\\N,y\n3,c,\\N\n")
    out = str(tmp_path / "sink")
    ckpt = str(tmp_path / "wckpt")

    stream = (
        spark.readStream.format("chunked_csv")
        .option("path", str(src))
        .option("columns", "id,val,cat")
        .load()
    )
    q = (
        stream.writeStream.format("chunked_csv")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    files = sorted(os.listdir(out))
    manifests = [f for f in files if f.startswith("_manifest-")]
    parts = [f for f in files if f.startswith("part-")]
    assert manifests, files
    assert not [f for f in files if f.startswith(".tmp-")], files
    manifested, total = set(), 0
    for m in manifests:
        meta = json.loads((tmp_path / "sink" / m).read_text())
        manifested.update(meta["files"])
        total += meta["rows"]
    assert manifested == set(parts)
    assert total == 3
    lines = sorted(
        line
        for p in parts
        for line in (tmp_path / "sink" / p).read_text().splitlines()
    )
    assert lines == ["1,a,x", "2,\\N,y", "3,c,\\N"]


def test_writer_quotes_commas_and_reader_round_trips(registered, tmp_path):
    r"""Values containing commas/quotes are QUOTE_MINIMAL-encoded (the
    reference encodes via pandas to_csv, which quotes the same way), \N is
    NULL, and an empty string survives the writer->reader round trip as an
    empty STRING, not NULL."""
    import os

    spark = registered
    src = tmp_path / "src.csv"
    # source line with a QUOTED comma field + an empty field
    src.write_text('1,"a,b",x\n2,\\N,\n')
    out = str(tmp_path / "sink")
    ckpt = str(tmp_path / "wckpt")

    stream = (
        spark.readStream.format("chunked_csv")
        .option("path", str(src))
        .option("columns", "id,val,cat")
        .load()
    )
    q = (
        stream.writeStream.format("chunked_csv")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    parts = sorted(f for f in os.listdir(out) if f.startswith("part-"))
    lines = sorted(
        line
        for p in parts
        for line in (tmp_path / "sink" / p).read_text().splitlines()
    )
    # comma value re-quoted on write; NULL -> \N; empty string stays bare
    assert lines == ['1,"a,b",x', "2,\\N,"]

    # and reading the sink back through the same source restores the values
    back = (
        spark.readStream.format("chunked_csv")
        .option("path", os.path.join(out, parts[0]))
        .option("columns", "id,val,cat")
        .load()
    )
    q2 = (
        back.writeStream.format("memory")
        .queryName("pyds_roundtrip")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination()
    got = sorted(map(tuple, spark.table("pyds_roundtrip").collect()))
    assert got == [("1", "a,b", "x"), ("2", None, "")]


def test_writer_rejects_embedded_newline_and_parse_mirrors_quoting():
    """Unit level: the writer raises on newline-bearing values (the line
    protocol would corrupt offsets); the stream parser unquotes exactly what
    csv.writer QUOTE_MINIMAL emits and keeps empty as empty string."""
    from simple_land_registry_data_ingestion_spark.sources.pyds import (
        ChunkedCsvStreamReader,
        ChunkedCsvStreamWriter,
    )
    from pyspark.sql.types import StringType, StructField, StructType

    schema = StructType([StructField(c, StringType(), True) for c in "abc"])
    reader = ChunkedCsvStreamReader.__new__(ChunkedCsvStreamReader)
    reader.n_cols = 3
    rows = reader._parse(b'1,"a,b",\n2,\\N,"say ""hi"""\n')
    assert rows == [("1", "a,b", ""), ("2", None, 'say "hi"')]

    writer = ChunkedCsvStreamWriter.__new__(ChunkedCsvStreamWriter)
    writer.path = "/tmp/pyds-newline-reject"
    with pytest.raises(ValueError, match="line-oriented"):
        writer.write(iter([("1", "bad\nvalue", "x")]))


def test_manifest_written_atomically(registered, tmp_path):
    """commit() leaves no *.inprogress manifest temp and no orphan .tmp-*
    part (a retried-task leftover is swept), and every manifest parses."""
    import json
    import os

    spark = registered
    src = tmp_path / "src.csv"
    src.write_text("1,a,x\n")
    out = tmp_path / "sink"
    out.mkdir()
    # plant an orphan temp part from a "retried task attempt"
    (out / ".tmp-deadbeef.csv").write_text("ghost,row,here\n")
    ckpt = str(tmp_path / "wckpt")

    stream = (
        spark.readStream.format("chunked_csv")
        .option("path", str(src))
        .option("columns", "id,val,cat")
        .load()
    )
    q = (
        stream.writeStream.format("chunked_csv")
        .option("path", str(out))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    files = sorted(os.listdir(out))
    assert not [f for f in files if f.endswith(".inprogress")], files
    assert not [f for f in files if f.startswith(".tmp-")], files
    for m in (f for f in files if f.startswith("_manifest-")):
        json.loads((out / m).read_text())  # complete, parseable JSON
