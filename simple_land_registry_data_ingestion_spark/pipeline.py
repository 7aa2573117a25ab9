"""The land-registry ingest pipeline, Spark-first (reference main.py:71-372).

Same dataflow as the reference — download -> parse -> type -> max-date ->
bulk load -> metadata row — with the hand-rolled execution machinery
(50k-row chunk loop, StringIO buffers, running max) replaced by a
declarative plan:

    reference main.py                      this pipeline
    ---------------------------------      --------------------------------
    requests.get(stream=True)    :148      sources.http.download_with_retry
    read_csv(chunksize=50000)    :204      spark.read.csv (partitioned scan)
    chunk.columns = [...]        :217      declared StructType
    to_datetime(utc, format=...) :218      to_timestamp(col, 'yyyy-MM-dd HH:mm')
    per-chunk running max        :228      agg(max(...)) partial+final
    chunk.to_csv -> COPY         :234,243  sinks.write_parquet_atomic / JDBC
    per-stage wall clocks        :211-247  StageTimer around each action
    ORM metadata insert          :274      single-row DataFrame append

Per-stage timing note: Spark is lazy, so "read time" and "write time" only
exist per materialization.  The pipeline forces two actions — the max-date
aggregation (read+convert measured together, as one scan) and the sink write
— and attributes wall clock to those, which is the honest Spark equivalent
of the reference's per-chunk accounting (O1).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field
from datetime import date, datetime, timezone

from pyspark.sql import DataFrame, SparkSession, Row
from pyspark.sql import functions as F

from simple_land_registry_data_ingestion_spark import sinks
from simple_land_registry_data_ingestion_spark.logging_setup import get_logger
from simple_land_registry_data_ingestion_spark.schemas import (
    PP_COMPLETE_COLUMNS,
    PP_COMPLETE_METADATA_SCHEMA,
)
from simple_land_registry_data_ingestion_spark.sources.csv import (
    read_pp_complete_csv,
    with_pp_complete_types,
)
from simple_land_registry_data_ingestion_spark.sources.http import download_with_retry

logger = get_logger("slr_pipeline")


@dataclass
class ProcessMetadata:
    """Run metrics, mirroring the reference dataclass (main.py:49-68) and
    persisted table (lib_db.py:44-58)."""

    download_size_MB: int = 0
    auto_date: date | None = None
    process_start_timestamp: datetime | None = None
    process_complete_timestamp: datetime | None = None
    process_duration_s: float = 0.0
    download_duration_s: float = 0.0
    read_duration_s: float = 0.0
    datetime_convert_duration_s: float = 0.0
    write_duration_s: float = 0.0
    database_upload_duration_s: float = 0.0
    row_count: int = 0
    _t0: float = field(default=0.0, repr=False)

    def to_row(self) -> Row:
        return Row(
            download_size_MB=self.download_size_MB,
            auto_date=self.auto_date,
            process_start_timestamp=self.process_start_timestamp,
            process_complete_timestamp=self.process_complete_timestamp,
            process_duration_s=self.process_duration_s,
            download_duration_s=self.download_duration_s,
            read_duration_s=self.read_duration_s,
            datetime_convert_duration_s=self.datetime_convert_duration_s,
            write_duration_s=self.write_duration_s,
            database_upload_duration_s=self.database_upload_duration_s,
            row_count=self.row_count,
        )


class StageTimer:
    def __init__(self) -> None:
        self._start = 0.0

    def __enter__(self) -> "StageTimer":
        self._start = time.monotonic()
        return self

    def __exit__(self, *exc) -> None:
        self.elapsed = time.monotonic() - self._start


def run_ingest(
    spark: SparkSession,
    source: str,
    output_path: str,
    metadata_path: str | None = None,
    url_retries: int = 3,
    retry_sleep_seconds: float = 10.0,
    partition_by_year: bool = True,
    jdbc_options: dict[str, str] | None = None,
    jdbc_table: str = "pp_complete_data",
    jdbc_dialect: str = "postgres",
    jdbc_target_exists: bool = True,
) -> ProcessMetadata:
    """End-to-end ingest (reference main():298-372).

    ``source`` is an http(s):// URL (driver-side fetch, reference S1/S2) or a
    path Spark can scan directly.  ``output_path`` gets the typed table as
    atomically-published parquet, partitioned by transaction year — at 100 TB
    the year partitioning makes freshness/date-range queries prune instead of
    scan.  The metadata row is appended at ``metadata_path`` (or
    ``output_path + '_metadata'``).

    ``jdbc_options`` switches the publish to the DATABASE path — the
    reference's actual sink (single-transaction TRUNCATE+COPY+COMMIT,
    main.py:194-251): the typed table loads into ``{jdbc_table}__staging``
    and swaps in atomically (sinks.write_jdbc_full_refresh_atomic), and the
    metadata row appends to ``{jdbc_table}_metadata`` over the same
    connection options (reference S8, main.py:274-295).  The parquet
    publish still runs — it is the lake copy the analytics queries scan.
    """
    meta = ProcessMetadata()
    meta.process_start_timestamp = datetime.now(timezone.utc)
    t_process = time.monotonic()

    if source.startswith(("http://", "https://")):
        with StageTimer() as t:
            source = download_with_retry(
                source, max_retries=url_retries, sleep_seconds=retry_sleep_seconds
            )
        meta.download_duration_s = t.elapsed
        meta.download_size_MB = os.path.getsize(source) // (1024 * 1024)
    elif os.path.exists(source):
        size = (
            os.path.getsize(source)
            if os.path.isfile(source)
            else sum(
                os.path.getsize(os.path.join(d, f))
                for d, _, fs in os.walk(source)
                for f in fs
            )
        )
        meta.download_size_MB = size // (1024 * 1024)

    raw = read_pp_complete_csv(spark, source)
    typed = with_pp_complete_types(raw)

    # Action 1: one scan computing freshness + row count (the reference's
    # per-chunk running max, main.py:228-230, as a partial+final agg).
    with StageTimer() as t:
        summary = typed.agg(
            F.to_date(F.max("transaction_date")).alias("auto_date"),
            F.count(F.lit(1)).alias("n"),
        ).first()
    meta.read_duration_s = t.elapsed
    # In Spark the string->timestamp convert is fused into the same scan by
    # codegen; report it as part of read and keep the column for parity.
    meta.datetime_convert_duration_s = 0.0
    meta.auto_date = summary["auto_date"]
    meta.row_count = summary["n"]
    logger.info("ingest scan: %d rows, auto_date=%s", meta.row_count, meta.auto_date)

    # Action 2: atomic full-refresh publish (reference TRUNCATE+COPY+COMMIT).
    with StageTimer() as t:
        out = typed
        partition_cols: list[str] = []
        if partition_by_year:
            out = out.withColumn("transaction_year", F.year("transaction_date"))
            partition_cols = ["transaction_year"]
        sinks.write_parquet_atomic(out, output_path, partition_by=partition_cols or None)
    meta.write_duration_s = t.elapsed

    # Optional DB publish (reference E5/E6): staging load + atomic swap.
    if jdbc_options is not None:
        with StageTimer() as t:
            sinks.write_jdbc_full_refresh_atomic(
                typed,
                jdbc_table,
                jdbc_options,
                dialect=jdbc_dialect,
                target_exists=jdbc_target_exists,
            )
        meta.database_upload_duration_s = t.elapsed
    else:
        meta.database_upload_duration_s = meta.write_duration_s

    meta.process_complete_timestamp = datetime.now(timezone.utc)
    meta.process_duration_s = time.monotonic() - t_process

    # Metadata sink (reference S8, main.py:274-295): single-row append.
    meta_df = spark.createDataFrame([meta.to_row()], PP_COMPLETE_METADATA_SCHEMA)
    if jdbc_options is not None:
        sinks.write_jdbc_append(meta_df, f"{jdbc_table}_metadata", jdbc_options)
    target = metadata_path or f"{output_path.rstrip('/')}_metadata"
    meta_df.write.mode("append").parquet(target)
    logger.info(
        "ingest complete: %.2fs total (%0.2fs read, %0.2fs write)",
        meta.process_duration_s, meta.read_duration_s, meta.write_duration_s,
    )
    return meta


def read_pp_complete_table(spark: SparkSession, path: str) -> DataFrame:
    """Read back the published table, dropping the partition helper column."""
    df = spark.read.parquet(path)
    if "transaction_year" in df.columns:
        df = df.drop("transaction_year")
    return df.select(*PP_COMPLETE_COLUMNS)
