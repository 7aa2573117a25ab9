"""Sinks: atomic full-refresh files, JDBC, and the COPY fast path.

The reference's sink is Postgres COPY inside ONE transaction with a leading
TRUNCATE (reference main.py:194-251) — atomic full refresh, readers never see
partial data (E6).  Spark JDBC writes are per-partition transactions, so the
same semantics need either (a) staging-table-then-swap on the DB side or
(b) an atomic directory swap for file sinks.  Both are implemented here.
"""

from __future__ import annotations

import logging
import os
import shutil
import uuid

from pyspark.sql import DataFrame

logger = logging.getLogger(__name__)


def write_parquet_atomic(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
) -> None:
    """Full-refresh parquet write with publish-by-rename.

    Writes to a staging directory next to ``path`` and swaps it in only
    after the job commits — the file-sink analog of the reference's
    TRUNCATE+COPY+COMMIT single transaction (main.py:196,251).  On HDFS the
    rename is atomic; on object stores the real answer is a table format
    (Delta/Iceberg) — this keeps the same published-all-or-nothing contract
    for plain directories.

    ``partition_by`` is the at-rest partitioning (e.g. year of the
    transaction date): at 100 TB it turns date-range queries into partition
    pruning instead of full scans.
    """
    staging = f"{path}__staging_{uuid.uuid4().hex[:8]}"
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(staging)
    backup = f"{path}__old_{uuid.uuid4().hex[:8]}"
    if os.path.exists(path):
        os.rename(path, backup)
    try:
        os.rename(staging, path)
    except Exception:
        if os.path.exists(backup):  # roll back the unpublish
            os.rename(backup, path)
        raise
    if os.path.exists(backup):
        shutil.rmtree(backup, ignore_errors=True)
    logger.info("published %s", path)


def write_jdbc_append(df: DataFrame, table: str, jdbc_options: dict[str, str],
                      batchsize: int = 10_000) -> None:
    """Plain JDBC append (used for the metadata row, reference main.py:274-295)."""
    (
        df.write.format("jdbc")
        .options(**jdbc_options)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .mode("append")
        .save()
    )


def write_jdbc_full_refresh(
    df: DataFrame, table: str, jdbc_options: dict[str, str], batchsize: int = 10_000
) -> None:
    """Truncate-then-load (reference S6, main.py:196): JDBC overwrite with
    ``truncate=true`` keeps the table's DDL/indexes and empties it before the
    parallel per-partition inserts.

    NOT single-transaction-atomic like the reference's COPY path — readers
    can observe the empty table mid-load.  For strict E6 semantics load into
    ``{table}__staging`` with this function and swap names in one DB
    transaction (``ALTER TABLE ... RENAME``) — that swap needs a live DB
    connection and is left to deployment scripts.
    """
    (
        df.write.format("jdbc")
        .options(**jdbc_options)
        .option("dbtable", table)
        .option("truncate", "true")
        .option("batchsize", str(batchsize))
        .mode("overwrite")
        .save()
    )


def copy_into_postgres(df: DataFrame, table: str, columns: list[str],
                       conninfo: str) -> None:
    """COPY fast-path sink (reference E5, main.py:200,243): each partition
    opens one connection and streams CSV text through the COPY protocol —
    order-of-magnitude faster than row-wise INSERT, and parallel across
    partitions (the reference is single-connection).

    Requires psycopg on the executors; gated import so environments without
    a database never pay for it.
    """
    try:
        import psycopg  # noqa: F401
    except ImportError as exc:  # pragma: no cover - not installed here
        raise NotImplementedError(
            "copy_into_postgres needs the 'psycopg' package on executors"
        ) from exc

    col_list = ", ".join(columns)

    def _copy_partition(rows) -> None:  # pragma: no cover - needs live DB
        import csv
        import io

        import psycopg

        buf = io.StringIO()
        writer = csv.writer(buf)
        n = 0
        for row in rows:
            writer.writerow(row)
            n += 1
        if n == 0:
            return
        buf.seek(0)
        with psycopg.connect(conninfo) as conn:
            with conn.cursor() as cur:
                with cur.copy(
                    f"COPY {table} ({col_list}) FROM STDIN WITH (FORMAT csv, NULL '\\N')"
                ) as copy:
                    copy.write(buf.getvalue())
            conn.commit()

    df.select(*columns).foreachPartition(_copy_partition)
