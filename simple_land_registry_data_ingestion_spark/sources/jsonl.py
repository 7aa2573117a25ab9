"""JSONL source with declared schema and explicit bad-record policy.

The reference ingests exactly one format (headerless CSV, sources/csv.py);
a training-data pipeline's second-most-common feed is JSON-lines (crawl
dumps, API exports, annotation files).  Semantics here follow the same
discipline as the CSV scan:

 - DECLARED schema, never ``inferSchema`` — inference is a full extra scan
   at 100 TB and silently widens types between runs.
 - Malformed lines are a POLICY, not a crash: PERMISSIVE mode keeps every
   line, parking unparseable ones in ``_corrupt_record`` (audit/quarantine
   them downstream); DROPMALFORMED silently drops; FAILFAST aborts the job
   on the first bad line.  PERMISSIVE + quarantine is the 100 TB default —
   one bad crawl record must not kill a day-long job, but it also must not
   vanish unaccounted.
 - JSONL (one object per line) keeps the file SPLITTABLE: Spark assigns
   byte ranges per task exactly like CSV.  Multi-line JSON arrays are not
   splittable and parse single-threaded; never write them at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

#: The documents table's JSONL shape, plus the corrupt-record column the
#: PERMISSIVE parser fills for unparseable lines.
DOCUMENTS_JSONL_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("lang", StringType()),
        StructField("text", StringType()),
        StructField("_corrupt_record", StringType()),
    ]
)

CORRUPT_COL = "_corrupt_record"


def read_documents_jsonl(
    spark: SparkSession, path: str, mode: str = "PERMISSIVE"
) -> DataFrame:
    """Documents from JSONL with the declared schema and ``mode`` as the
    bad-record policy (PERMISSIVE | DROPMALFORMED | FAILFAST).

    Deliberately a TEXT scan + ``from_json`` expression rather than
    ``spark.read.json``: the native JSON relation treats the corrupt
    column as internal and REFUSES any query that references only it
    (which is exactly what a quarantine count/audit does).  With parsing
    as an expression, the corrupt column is an ordinary column, the text
    source stays splittable by byte ranges, and the parse fuses into the
    same codegen stage — same cost, composable semantics."""
    raw = spark.read.text(path)
    if mode.upper() == "FAILFAST":
        opts = {"mode": "FAILFAST"}
    else:
        opts = {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL}
    parsed = raw.select(
        F.from_json("value", DOCUMENTS_JSONL_SCHEMA, opts).alias("j")
    ).select("j.*")
    if mode.upper() == "DROPMALFORMED":
        parsed = parsed.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    return parsed


def split_quarantine(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantine): parseable rows without the corrupt column, and
    the raw text of every line that failed the schema — the audit trail a
    PERMISSIVE ingest must keep."""
    clean = df.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    quarantine = df.where(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line")
    )
    return clean, quarantine
