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

import csv
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


def _parse_csv_line(text: str, n_cols: int, empty_is_null: bool) -> tuple:
    """Decode ONE physical line as a CSV record (QUOTE_MINIMAL quoting, the
    reference's pandas ``to_csv``/``read_csv`` convention — reference
    main.py:204-210) and normalize to the declared width.

    ``\\N`` is always NULL.  ``empty_is_null`` selects the batch rule
    (reference CSV format E4: empty field == NULL) vs the stream round-trip
    rule, where the paired writer emits ``\\N`` for NULL so an empty field
    is a genuine empty string.
    """
    fields = next(csv.reader([text]), [])
    fields = (list(fields) + [None] * n_cols)[:n_cols]
    nulls = (None, "", NULL_SENTINEL) if empty_is_null else (None, NULL_SENTINEL)
    return tuple(None if f in nulls else f for f in fields)


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
                # ragged rows pad/truncate to the declared width (the
                # declared-schema discipline: width comes from the schema,
                # never from the data); quoting is QUOTE_MINIMAL per line —
                # embedded newlines are unsupported in byte-range splits,
                # the same contract as Hadoop's LineRecordReader
                yield _parse_csv_line(text, self.n_cols, empty_is_null=True)


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
        # Mirrors ChunkedCsvStreamWriter.write exactly: QUOTE_MINIMAL CSV,
        # \N == NULL, and an empty field is an empty STRING (the writer
        # always emits \N for NULL, so empty is never ambiguous here).
        rows = []
        for raw in chunk.splitlines():
            text = raw.decode("utf-8").rstrip("\r")
            if not text:
                continue
            rows.append(_parse_csv_line(text, self.n_cols, empty_is_null=False))
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
        with open(tmp, "w", encoding="utf-8", newline="") as fh:
            enc = csv.writer(fh, quoting=csv.QUOTE_MINIMAL, lineterminator="\n")
            for row in iterator:
                fields = []
                for v in row:
                    if v is None:
                        fields.append(NULL_SENTINEL)
                        continue
                    s = str(v)
                    if "\n" in s or "\r" in s:
                        # the manifest protocol (and the paired tail reader's
                        # byte offsets) are line-oriented; an embedded
                        # newline would make a committed offset fall inside
                        # a record, so it is rejected rather than corrupted
                        raise ValueError(
                            "chunked_csv sink is line-oriented: value "
                            "contains a newline; strip or encode it upstream"
                        )
                    fields.append(s)
                enc.writerow(fields)  # QUOTE_MINIMAL: commas/quotes quoted
                n += 1
        return _PartFile(tmp, n)

    def _sweep_orphans(self, keep: set[str]) -> None:
        """Remove .tmp-* files no surviving commit message references —
        retried task attempts leave them and abort() never hears of them."""
        try:
            names = os.listdir(self.path)
        except FileNotFoundError:
            return
        for name in names:
            full = os.path.join(self.path, name)
            if name.startswith(".tmp-") and full not in keep:
                try:
                    os.remove(full)
                except FileNotFoundError:
                    pass

    def commit(self, messages, batchId: int) -> None:
        import json

        parts = []
        total = 0
        for m in messages:
            if m is None or m.n_rows == 0:
                if m is not None and os.path.exists(m.tmp_path):
                    os.remove(m.tmp_path)
                continue
            final = os.path.join(
                self.path, f"part-{batchId}-{len(parts):05d}.csv"
            )
            os.replace(m.tmp_path, final)
            parts.append(os.path.basename(final))
            total += m.n_rows
        # manifest is written to a temp name then atomically renamed into
        # place: a crash mid-write can never leave a truncated manifest for
        # a trust-only-manifested-files reader to choke on
        manifest = os.path.join(self.path, f"_manifest-{batchId}.json")
        tmp_manifest = manifest + ".inprogress"
        with open(tmp_manifest, "w", encoding="utf-8") as fh:
            json.dump({"batch": batchId, "files": parts, "rows": total}, fh)
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp_manifest, manifest)
        self._sweep_orphans(keep=set())

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.tmp_path):
                os.remove(m.tmp_path)
        self._sweep_orphans(keep=set())
