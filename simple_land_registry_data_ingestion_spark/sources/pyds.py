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
    InputPartition,
    SimpleDataSourceStreamReader,
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
