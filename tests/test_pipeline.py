r"""End-to-end ingest pipeline tests (reference parity, SURVEY section 7 phase 1).

Covers: headerless all-string CSV read, \N-vs-empty-string null semantics
(E4), timestamp format parsing, max-date derivation (A1), atomic parquet
publish, metadata row (S8/O1), and the HTTP retry source (S1/S2) against a
deliberately flaky local server.
"""

from __future__ import annotations

import datetime
import http.server
import threading

import pytest

from simple_land_registry_data_ingestion_spark.pipeline import (
    read_pp_complete_table,
    run_ingest,
)
from simple_land_registry_data_ingestion_spark.schemas import PP_COMPLETE_COLUMNS
from simple_land_registry_data_ingestion_spark.sources.csv import read_pp_complete_csv
from simple_land_registry_data_ingestion_spark.sources.http import (
    DownloadError,
    download_with_retry,
)


def _pp_row(uid: str, price: int, ts: str, *, postcode="AB1 2CD", ppd_cat="A",
            record_op="A", locality="Someville") -> str:
    cols = [uid, str(price), ts, postcode, "D", "N", "F", "12", "", "HIGH STREET",
            locality, "TOWNVILLE", "DISTRICT", "COUNTYSHIRE", ppd_cat, record_op]
    return ",".join(cols)


@pytest.fixture()
def pp_csv(tmp_path):
    """Synthetic pp-complete fixture (FIXTURES.md section 1): no header, 16
    columns, \\N nulls, an empty-string field, a known max date."""
    rows = [
        _pp_row("{U-1}", 100000, "2024-01-15 00:00"),
        _pp_row("{U-2}", 250000, "2024-03-28 00:00"),          # planted max
        _pp_row("{U-3}", 50000, "2023-12-01 00:00", ppd_cat="\\N"),  # NULL ppd_cat
        _pp_row("{U-4}", 75000, "2024-02-02 00:00", locality=""),   # empty string
        _pp_row("{U-2}", 260000, "2024-03-01 00:00", record_op="C"),  # CDC replay
    ]
    path = tmp_path / "pp_fixture.csv"
    path.write_text("\n".join(rows) + "\n")
    return str(path)


def test_csv_null_and_empty_semantics(spark, pp_csv):
    """E4 regression (FIXTURES.md section 4): \\N -> NULL, '' -> empty string."""
    df = read_pp_complete_csv(spark, pp_csv)
    assert df.columns == PP_COMPLETE_COLUMNS
    rows = {r["transaction_unique_id"]: r for r in df.collect()}
    assert rows["{U-3}"]["ppd_cat"] is None          # \N sentinel -> NULL
    assert rows["{U-1}"]["ppd_cat"] == "A"
    assert rows["{U-4}"]["locality"] == ""           # empty stays a VALUE
    assert rows["{U-4}"]["secondary_address_object_name"] == ""
    assert rows["{U-1}"]["price"] == "100000"        # all-string raw schema


def test_run_ingest_end_to_end(spark, pp_csv, tmp_path):
    out = str(tmp_path / "pp_complete_data")
    meta = run_ingest(spark, pp_csv, out)

    # A1: auto_date is the planted max transaction_date, as a date
    assert meta.auto_date == datetime.date(2024, 3, 28)
    assert meta.row_count == 5
    assert meta.download_size_MB == 0  # tiny fixture
    assert meta.process_duration_s > 0
    assert meta.read_duration_s >= 0 and meta.write_duration_s >= 0

    table = read_pp_complete_table(spark, out)
    assert table.columns == PP_COMPLETE_COLUMNS
    got = {r["transaction_unique_id"]: r for r in table.collect()}
    assert len(table.collect()) == 5
    assert got["{U-1}"]["price"] == 100000           # typed long now
    assert got["{U-2}"]["transaction_date"] in (
        datetime.datetime(2024, 3, 28, 0, 0),
        datetime.datetime(2024, 3, 1, 0, 0),
    )
    assert got["{U-3}"]["ppd_cat"] is None
    assert got["{U-4}"]["locality"] == ""

    # metadata row persisted (S8)
    meta_df = spark.read.parquet(out + "_metadata")
    mrow = meta_df.collect()[0]
    assert mrow["auto_date"] == datetime.date(2024, 3, 28)
    assert mrow["row_count"] == 5

    # partition pruning surface: published partitioned by year
    years = {r["transaction_year"] for r in spark.read.parquet(out).select("transaction_year").collect()}
    assert years == {2023, 2024}


def test_atomic_republish_overwrites(spark, pp_csv, tmp_path):
    """Second run fully replaces the first (truncate-then-load semantics)."""
    out = str(tmp_path / "pp")
    run_ingest(spark, pp_csv, out)
    run_ingest(spark, pp_csv, out)
    assert read_pp_complete_table(spark, out).count() == 5  # not 10
    meta_df = spark.read.parquet(out + "_metadata")
    assert meta_df.count() == 2  # metadata APPENDS, one row per run


class _FlakyHandler(http.server.BaseHTTPRequestHandler):
    failures_left = 2
    payload = b"hello world,1\ngoodbye world,2\n"

    def do_GET(self):  # noqa: N802
        if type(self).failures_left > 0:
            type(self).failures_left -= 1
            self.send_error(503)
            return
        self.send_response(200)
        self.send_header("Content-Length", str(len(self.payload)))
        self.end_headers()
        self.wfile.write(self.payload)

    def log_message(self, *args):  # silence
        pass


@pytest.fixture()
def flaky_server():
    _FlakyHandler.failures_left = 2
    server = http.server.HTTPServer(("127.0.0.1", 0), _FlakyHandler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{server.server_address[1]}/data.csv"
    server.shutdown()


def test_download_retry_recovers(flaky_server, tmp_path):
    """S2: two 503s then success — the 3-attempt loop must recover."""
    dest = str(tmp_path / "dl.csv")
    path = download_with_retry(flaky_server, dest, sleep_seconds=0.05)
    assert path == dest
    assert open(dest, "rb").read() == _FlakyHandler.payload


def test_download_retry_exhausts(flaky_server, tmp_path):
    _FlakyHandler.failures_left = 99
    with pytest.raises(DownloadError):
        download_with_retry(flaky_server, str(tmp_path / "x.csv"),
                            max_retries=2, sleep_seconds=0.05)
