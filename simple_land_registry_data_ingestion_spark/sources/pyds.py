r"""Custom Python DataSource: the reference's chunked headerless-CSV scan as
a real, partition-parallel Spark source.

The reference reads its CSV in 50k-row pandas chunks on one thread
(reference main.py:180,204-210: ``chunksize=50000``, ``header=None``,
``dtype=str``, ``keep_default_na=False``) and treats ``\N`` as SQL NULL on
the COPY wire (reference main.py:200).  Spark's own csv reader already
covers that shape (sources/csv.py); this module re-expresses the CHUNKING
itself through the Spark 4 Python DataSource API, so the chunk loop becomes
N ``InputPartition`` byte-ranges read in parallel by executors — the
idiomatic translation of "iterate chunks" into "plan splits".

Split semantics are the classic InputFormat (Hadoop LineRecordReader)
contract: a mid-file reader always DISCARDS its first line (it belongs to
the previous split), and every reader keeps reading through the line whose
start position is <= its end offset — so a line starting exactly on a
boundary is read by the earlier split and skipped by the later one.  Every
record is read exactly once across partitions, whatever the chunk size —
property-tested in tests/test_sources_pyds.py.

All columns are StringType (the reference's ``dtype=str`` discipline:
schema is declared, never inferred) and ``\N`` / empty map to NULL.
"""

from __future__ import annotations

import os
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import StringType, StructField, StructType

#: Default split size.  The reference's 50k rows x ~130 B/row ~ 6.5 MB;
#: real deployments align this with fs block size (128 MiB).
DEFAULT_CHUNK_BYTES = 8 * 1024 * 1024

NULL_SENTINEL = "\\N"


class _ByteRange(InputPartition):
    def __init__(self, path: str, start: int, end: int):
        self.path = path
        self.start = start
        self.end = end


class ChunkedCsvReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.path = options["path"]
        self.n_cols = len(schema.fields)
        self.chunk_bytes = int(options.get("chunk_bytes", DEFAULT_CHUNK_BYTES))

    def partitions(self) -> list[InputPartition]:
        size = os.path.getsize(self.path)
        step = max(1, self.chunk_bytes)
        return [
            _ByteRange(self.path, lo, min(lo + step, size))
            for lo in range(0, max(size, 1), step)
        ]

    def read(self, partition: _ByteRange) -> Iterator[tuple]:
        with open(partition.path, "rb") as fh:
            pos = partition.start
            if pos > 0:
                # mid-file split: the partial record belongs to the previous
                # split; skip to the byte after the next newline
                fh.seek(pos)
                pos += len(fh.readline())
            else:
                fh.seek(0)
            while pos <= partition.end:
                line = fh.readline()
                if not line:
                    break
                pos += len(line)
                text = line.decode("utf-8").rstrip("\r\n")
                if not text:
                    continue
                fields = text.split(",")
                # ragged rows: pad/truncate to the declared width (the
                # declared-schema discipline: width comes from the schema,
                # never from the data)
                fields = (fields + [None] * self.n_cols)[: self.n_cols]
                yield tuple(
                    None if f in (None, "", NULL_SENTINEL) else f for f in fields
                )


class ChunkedCsvDataSource(DataSource):
    """``spark.read.format("chunked_csv")`` after
    ``spark.dataSource.register(ChunkedCsvDataSource)``.

    Options: ``path`` (local file), ``columns`` (comma-separated names,
    all string), ``chunk_bytes`` (split size; the reference's chunksize
    knob, reference main.py:180).
    """

    @classmethod
    def name(cls) -> str:
        return "chunked_csv"

    def schema(self) -> StructType:
        cols = [c for c in self.options.get("columns", "").split(",") if c]
        if not cols:
            raise ValueError("chunked_csv requires a 'columns' option")
        return StructType([StructField(c, StringType(), True) for c in cols])

    def reader(self, schema: StructType) -> DataSourceReader:
        return ChunkedCsvReader(schema, dict(self.options))

    def simpleStreamReader(self, schema: StructType):
        return ChunkedCsvStreamReader(schema, dict(self.options))

    def streamWriter(self, schema: StructType, overwrite: bool):
        return ChunkedCsvStreamWriter(dict(self.options))


class ChunkedCsvStreamReader(SimpleDataSourceStreamReader):
    """Streaming flavor: TAIL the CSV as it grows.  Offsets are byte
    positions; each micro-batch emits the COMPLETE lines appended since the
    last committed offset (a trailing partial line waits for its newline).

    ``readBetweenOffsets`` re-reads a committed range verbatim, which is
    what makes recovery exactly-once: after a crash the engine replays the
    range from the checkpoint and gets identical rows.

    Scale note: the Simple reader API executes on the DRIVER — right for
    control-plane-sized feeds (the reference's single download stream,
    reference main.py:119-166, is exactly that); a partition-parallel
    variant implements DataSourceStreamReader with partitions() instead.
    """

    def __init__(self, schema: StructType, options: dict):
        self.path = options["path"]
        self.n_cols = len(schema.fields)

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def _parse(self, chunk: bytes) -> list[tuple]:
        rows = []
        for raw in chunk.splitlines():
            text = raw.decode("utf-8").rstrip("\r")
            if not text:
                continue
            fields = text.split(",")
            fields = (fields + [None] * self.n_cols)[: self.n_cols]
            rows.append(
                tuple(None if f in (None, "", NULL_SENTINEL) else f for f in fields)
            )
        return rows

    def read(self, start: dict):
        pos = int(start["pos"])
        with open(self.path, "rb") as fh:
            fh.seek(pos)
            data = fh.read()
        cut = data.rfind(b"\n") + 1  # only complete lines advance the offset
        return iter(self._parse(data[:cut])), {"pos": pos + cut}

    def readBetweenOffsets(self, start: dict, end: dict):
        with open(self.path, "rb") as fh:
            fh.seek(int(start["pos"]))
            data = fh.read(int(end["pos"]) - int(start["pos"]))
        return iter(self._parse(data))


class _PartFile(WriterCommitMessage):
    """Commit message: one executor-written temp part file."""

    def __init__(self, tmp_path: str, n_rows: int):
        self.tmp_path = tmp_path
        self.n_rows = n_rows


class ChunkedCsvStreamWriter(DataSourceStreamWriter):
    """Streaming SINK flavor: the reference's CSV encode (``\\N`` for NULL,
    reference main.py:200,243-291) as a Spark 4 Python DataSource stream
    writer with a MANIFEST commit protocol.

    Executors write each partition's rows to a hidden temp file and return
    it as the commit message; ``commit`` (driver, once per micro-batch)
    renames every part into place and THEN writes ``_manifest-<batch>.json``
    listing them — a reader that only trusts manifested files sees each
    batch atomically, the same visibility rule as the parquet
    ``_SUCCESS``/Iceberg-snapshot discipline and the single-transaction
    staging swap in sinks.py.  ``abort`` deletes the temp parts, so a
    failed batch leaves nothing visible.

    Scale note: parts are written executor-parallel; only the rename+
    manifest (O(#partitions) metadata) runs on the driver — the same
    commit-coordinator shape as every production table format.
    """

    def __init__(self, options: dict):
        self.path = options["path"]

    def write(self, iterator) -> "_PartFile":
        import uuid

        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(self.path, f".tmp-{uuid.uuid4().hex}.csv")
        n = 0
        with open(tmp, "w", encoding="utf-8") as fh:
            for row in iterator:
                fields = [
                    NULL_SENTINEL if v is None else str(v) for v in row
                ]
                fh.write(",".join(fields) + "\n")
                n += 1
        return _PartFile(tmp, n)

    def commit(self, messages, batchId: int) -> None:
        import json

        parts = []
        total = 0
        for m in messages:
            if m is None or m.n_rows == 0:
                if m is not None:
                    os.remove(m.tmp_path)
                continue
            final = os.path.join(
                self.path, f"part-{batchId}-{len(parts):05d}.csv"
            )
            os.replace(m.tmp_path, final)
            parts.append(os.path.basename(final))
            total += m.n_rows
        manifest = os.path.join(self.path, f"_manifest-{batchId}.json")
        with open(manifest, "w", encoding="utf-8") as fh:
            json.dump({"batch": batchId, "files": parts, "rows": total}, fh)

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.tmp_path):
                os.remove(m.tmp_path)
