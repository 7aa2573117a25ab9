"""Declared schemas — the reference's data model re-expressed as StructTypes.

The reference declares its schema twice: a 16-name column list for ingest
(reference lib_land_registry_data/lib_dataframe.py:1-18) and a SQLAlchemy ORM
for at-rest tables (reference lib_land_registry_data/lib_db.py:19-66).  Spark
unifies both as StructType constants.  Schema is always DECLARED, never
inferred — the reference reads with ``dtype=str`` precisely to suppress
inference (reference main.py:204-210); we match that discipline because an
``inferSchema`` CSV read costs an extra full scan at 100 TB and can mangle
values.
"""

from __future__ import annotations

from pyspark.sql import types as T

#: Ingest column order for the pp-complete CSV (no header row in the file;
#: reference lib_dataframe.py:1-18, duplicated at main.py:198).  The
#: ``price_paid_data_id`` surrogate PK is DB-assigned and absent from ingest.
PP_COMPLETE_COLUMNS = [
    "transaction_unique_id",
    "price",
    "transaction_date",
    "postcode",
    "property_type",
    "new_tag",
    "lease",
    "primary_address_object_name",
    "secondary_address_object_name",
    "street",
    "locality",
    "town_city",
    "district",
    "county",
    "ppd_cat",
    "record_op",
]

#: Raw ingest schema: all-string, mirroring ``dtype=str`` (reference
#: main.py:207).  Empty string is a VALUE, not null; only the ``\N`` sentinel
#: is null (reference main.py:200,208) — enforced by reader options, not type.
PP_COMPLETE_RAW_SCHEMA = T.StructType(
    [T.StructField(c, T.StringType(), True) for c in PP_COMPLETE_COLUMNS]
)

#: Typed at-rest schema (reference lib_db.py:19-39).  ``price`` long,
#: ``transaction_date`` timestamp; everything else string.  ``ppd_cat`` is the
#: only column the reference declares nullable (lib_db.py:38); Spark file
#: formats do not enforce NOT NULL, so nullability here is documentation.
PP_COMPLETE_SCHEMA = T.StructType(
    [
        T.StructField("transaction_unique_id", T.StringType(), False),
        T.StructField("price", T.LongType(), False),
        T.StructField("transaction_date", T.TimestampType(), False),
        T.StructField("postcode", T.StringType(), False),
        T.StructField("property_type", T.StringType(), False),
        T.StructField("new_tag", T.StringType(), False),
        T.StructField("lease", T.StringType(), False),
        T.StructField("primary_address_object_name", T.StringType(), False),
        T.StructField("secondary_address_object_name", T.StringType(), False),
        T.StructField("street", T.StringType(), False),
        T.StructField("locality", T.StringType(), False),
        T.StructField("town_city", T.StringType(), False),
        T.StructField("district", T.StringType(), False),
        T.StructField("county", T.StringType(), False),
        T.StructField("ppd_cat", T.StringType(), True),
        T.StructField("record_op", T.StringType(), False),
    ]
)

#: Run-metadata row (reference lib_db.py:44-58; dataclass main.py:49-68).
#: Durations persisted as double seconds (portable across sinks; the
#: reference's Postgres ``interval`` maps to DayTimeIntervalType if needed).
PP_COMPLETE_METADATA_SCHEMA = T.StructType(
    [
        T.StructField("download_size_MB", T.LongType(), True),
        T.StructField("auto_date", T.DateType(), True),
        T.StructField("process_start_timestamp", T.TimestampType(), True),
        T.StructField("process_complete_timestamp", T.TimestampType(), True),
        T.StructField("process_duration_s", T.DoubleType(), True),
        T.StructField("download_duration_s", T.DoubleType(), True),
        T.StructField("read_duration_s", T.DoubleType(), True),
        T.StructField("datetime_convert_duration_s", T.DoubleType(), True),
        T.StructField("write_duration_s", T.DoubleType(), True),
        T.StructField("database_upload_duration_s", T.DoubleType(), True),
        T.StructField("row_count", T.LongType(), True),
    ]
)

#: Smoke-test table (reference lib_db.py:61-66, test.py:5-15).
TEST_TABLE_SCHEMA = T.StructType(
    [
        T.StructField("string_column", T.StringType(), True),
        T.StructField("int_column", T.LongType(), True),
    ]
)

#: Timestamp format of the pp-complete feed.  The reference uses the Python
#: strptime dialect ``'%Y-%m-%d %H:%M'`` (main.py:218-222); Spark's dialect:
PP_TIMESTAMP_FORMAT = "yyyy-MM-dd HH:mm"

#: The only NULL sentinel in the feed (reference main.py:200: COPY ... NULL '\N').
PP_NULL_SENTINEL = "\\N"
