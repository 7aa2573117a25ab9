"""Spark 4 NATIVE XML source (S9 family): schema-declared read, roundtrip
fidelity, and attribute handling — the remaining built-in file format the
source surface had not exercised (parquet/json/orc/csv/jsonl/text are
covered elsewhere)."""

from __future__ import annotations

from pyspark.sql import functions as F

from simple_land_registry_data_ingestion_spark.tables import load
from tests.conftest import SF_SMALL


def test_xml_roundtrip_preserves_documents_sample(spark, tmp_path):
    """documents sample -> XML -> read back with a DECLARED schema (the
    reference's inference-off discipline, ref main.py:207): every row and
    column survives byte-identically, including empty-ish strings."""
    out = str(tmp_path / "docs_xml")
    sample = (
        load(spark, SF_SMALL, "documents")
        .where(F.col("doc_id") % 20 == 0)
        .select("doc_id", "lang", "source", "n_chars", "text")
    )
    sample.write.mode("overwrite").format("xml").option("rootTag", "docs").option(
        "rowTag", "doc"
    ).save(out)
    back = (
        spark.read.format("xml")
        .schema(sample.schema)
        .option("rowTag", "doc")
        .load(out)
    )
    want = sorted(tuple(r) for r in sample.collect())
    got = sorted(tuple(r) for r in back.collect())
    assert got == want
    assert len(got) > 0


def test_xml_reads_attributes_and_nested_elements(spark, tmp_path):
    """Attribute (_id) and nested-element access — the shape real XML
    feeds (sitemaps, PubMed, legal corpora) actually have."""
    p = tmp_path / "feed.xml"
    p.write_text(
        """<feed>
  <entry id="1"><meta><lang>en</lang></meta><body>hello world</body></entry>
  <entry id="2"><meta><lang>fr</lang></meta><body>bonjour</body></entry>
</feed>
"""
    )
    df = (
        spark.read.format("xml")
        .option("rowTag", "entry")
        .load(str(p))
        .select(
            F.col("_id").cast("long").alias("entry_id"),
            F.col("meta.lang").alias("lang"),
            F.col("body").alias("body"),
        )
    )
    rows = sorted(tuple(r) for r in df.collect())
    assert rows == [(1, "en", "hello world"), (2, "fr", "bonjour")]
