"""JSONL source: declared-schema parse, corrupt-record quarantine, and the
splittability discipline documented in sources/jsonl.py."""

from __future__ import annotations

import json

import pytest

from simple_land_registry_data_ingestion_spark.sources import jsonl


@pytest.fixture()
def mixed_jsonl(tmp_path):
    lines = [
        json.dumps({"doc_id": 1, "lang": "en", "text": "hello world"}),
        json.dumps({"doc_id": 2, "lang": "fr", "text": "bonjour"}),
        '{"doc_id": 3, "lang": "de", "text": "kaputt',  # truncated JSON
        "not json at all",
        json.dumps({"doc_id": 4, "lang": "es", "text": None}),  # null field ok
    ]
    p = tmp_path / "docs.jsonl"
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_permissive_parses_and_quarantines(spark, mixed_jsonl):
    df = jsonl.read_documents_jsonl(spark, mixed_jsonl)
    clean, quarantine = jsonl.split_quarantine(df)
    rows = {r["doc_id"]: r for r in clean.collect()}
    assert set(rows) == {1, 2, 4}
    assert rows[1]["text"] == "hello world"
    assert rows[4]["text"] is None  # explicit null is data, not corruption
    bad = [r["raw_line"] for r in quarantine.collect()]
    assert len(bad) == 2
    assert "not json at all" in bad
    # nothing lost: clean + quarantined == input lines
    assert clean.count() + quarantine.count() == 5


def test_dropmalformed_drops_silently(spark, mixed_jsonl):
    df = jsonl.read_documents_jsonl(spark, mixed_jsonl, mode="DROPMALFORMED")
    assert {r["doc_id"] for r in df.collect()} == {1, 2, 4}


def test_failfast_raises(spark, mixed_jsonl):
    with pytest.raises(Exception):
        jsonl.read_documents_jsonl(spark, mixed_jsonl, mode="FAILFAST").collect()


def test_roundtrip_documents_table(spark, tmp_path):
    """The real documents table survives a JSONL round-trip bit-for-bit."""
    from simple_land_registry_data_ingestion_spark.tables import load
    from tests.conftest import SF_SMALL

    docs = load(spark, SF_SMALL, "documents").select("doc_id", "lang", "text")
    out = str(tmp_path / "docs_jsonl")
    docs.write.mode("overwrite").json(out)
    back, quarantine = jsonl.split_quarantine(
        jsonl.read_documents_jsonl(spark, out)
    )
    assert quarantine.count() == 0
    assert back.count() == docs.count()
    a = sorted(map(tuple, docs.collect()))
    b = sorted(map(tuple, back.select("doc_id", "lang", "text").collect()))
    assert a == b
