"""Contract tests for the ClickHouse HTTP sink against a local mock server
mirroring the reference's retry semantics (solarman.py:192-225): every
insert retries until success with a fixed backoff; delivery is
at-least-once (a replayed body re-sends every row of the partition)."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from solis_solarman_clickhouse_spark.ingest.http_sink import (
    HttpSinkSettings,
    MissingSettingError,
    insert_rows_with_retry,
    settings_from_env,
    write_batch_http,
)
from solis_solarman_clickhouse_spark.ingest.registers import FACT_COLUMNS


class _MockClickHouse:
    """In-process HTTP server: fails the first `fail_first` POSTs with 500,
    then accepts; records every request body and query string."""

    def __init__(self, fail_first: int = 0):
        self.fail_first = fail_first
        self.requests: list[tuple[str, bytes]] = []
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def do_POST(self):  # noqa: N802
                length = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(length)
                outer.requests.append((self.path, body))
                if len(outer.requests) <= outer.fail_first:
                    self.send_response(500)
                    self.end_headers()
                    self.wfile.write(b"Code: 252. DB::Exception: Too many parts")
                else:
                    self.send_response(200)
                    self.end_headers()

            def log_message(self, *args):  # silence test output
                pass

        self.server = HTTPServer(("127.0.0.1", 0), Handler)
        self.thread = threading.Thread(target=self.server.serve_forever, daemon=True)
        self.thread.start()

    @property
    def url(self) -> str:
        return f"http://127.0.0.1:{self.server.server_address[1]}"

    def stop(self):
        self.server.shutdown()
        self.server.server_close()


@pytest.fixture()
def mock_ch():
    servers = []

    def make(fail_first: int = 0) -> _MockClickHouse:
        s = _MockClickHouse(fail_first)
        servers.append(s)
        return s

    yield make
    for s in servers:
        s.stop()


def _settings(server: _MockClickHouse, **kw) -> HttpSinkSettings:
    return HttpSinkSettings(
        url=server.url, user="default", password="", database="homelab",
        table="solis_solarman", **kw,
    )


def test_retry_until_success_with_reference_backoff(mock_ch):
    """Two 500s then success: the sink must keep retrying (never raise
    mid-stream), sleep the reference's 2 s between attempts, and replay
    the FULL body each time (at-least-once)."""
    server = mock_ch(fail_first=2)
    sleeps: list[float] = []
    rows = [{"inverter": "inv1", "time": "2026-08-13 12:00:00", "ac_actual_watts": 4200}]
    attempts = insert_rows_with_retry(
        rows, _settings(server), sleep=sleeps.append
    )
    assert attempts == 3
    assert sleeps == [2.0, 2.0]
    bodies = [b for _, b in server.requests]
    assert len(bodies) == 3
    assert bodies[0] == bodies[1] == bodies[2]  # identical replay = at-least-once
    assert json.loads(bodies[-1])["ac_actual_watts"] == 4200


def test_bounded_retries_raise_after_exhaustion(mock_ch):
    """With max_retries set (tests/ops), exhaustion surfaces the error
    instead of looping forever."""
    server = mock_ch(fail_first=100)
    with pytest.raises(Exception):
        insert_rows_with_retry(
            [{"inverter": "inv1"}],
            _settings(server, max_retries=2),
            sleep=lambda s: None,
        )
    assert len(server.requests) == 3  # initial + 2 retries


def test_empty_partition_sends_nothing(mock_ch):
    server = mock_ch()
    assert insert_rows_with_retry([], _settings(server)) == 0
    assert server.requests == []


def test_insert_query_targets_database_and_table(mock_ch):
    server = mock_ch()
    insert_rows_with_retry([{"a": 1}], _settings(server))
    path, _ = server.requests[0]
    assert "INSERT+INTO+homelab.solis_solarman" in path
    assert "FORMAT+JSONEachRow" in path


def test_settings_from_env_mirror_reference_contract():
    env = {
        "CLICKHOUSE_URL": "http://ch:8123",
        "CLICKHOUSE_USER": "u",
        "CLICKHOUSE_PASS": "p",
        "CLICKHOUSE_DB": "homelab",
    }
    s = settings_from_env(env)
    assert (s.url, s.user, s.password, s.database) == ("http://ch:8123", "u", "p", "homelab")
    assert s.table == "solis_solarman"  # default, solarman.py:190
    with pytest.raises(MissingSettingError):
        settings_from_env({k: v for k, v in env.items() if k != "CLICKHOUSE_PASS"})


def test_foreach_batch_posts_all_rows_from_executors(spark, mock_ch):
    """End-to-end through Spark: a 26-column micro-batch lands on the mock
    server via foreachPartition with every row delivered and the
    reference's column order preserved in each JSON object."""
    server = mock_ch()
    rows = [
        {c: (f"inv{i}" if c == "inverter"
             else "2026-08-13 12:00:00" if c == "time" else i * 10 + j)
         for j, c in enumerate(FACT_COLUMNS)}
        for i in range(7)
    ]
    df = spark.createDataFrame(rows).repartition(3)
    write_batch_http(df, 0, settings=_settings(server))
    got = []
    for _, body in server.requests:
        got.extend(json.loads(line) for line in body.decode().splitlines())
    assert sorted(r["inverter"] for r in got) == sorted(r["inverter"] for r in rows)
    assert all(list(r) == list(FACT_COLUMNS) for r in got)


def test_streaming_foreachbatch_to_http_sink(spark, mock_ch, tmp_path):
    """A11/A12 end-to-end: a Structured Streaming query posts every
    micro-batch to the ClickHouse HTTP endpoint via foreachBatch — the
    full reference dataflow (poll -> decode -> derive -> insert) with the
    queue/retry machinery replaced by triggers + the partition retry
    loop. All derived fact rows must land on the mock server."""
    from solis_solarman_clickhouse_spark.ingest.fixture import generate_raw_registers
    from solis_solarman_clickhouse_spark.ingest.pipeline import transform

    server = mock_ch()
    raw = generate_raw_registers(spark, inverters=2, days=1)
    raw_path = str(tmp_path / "raw")
    raw.write.parquet(raw_path)
    expected = transform(spark.read.parquet(raw_path)).count()

    settings = _settings(server)
    schema = spark.read.parquet(raw_path).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(raw_path)
    )
    q = (
        transform(stream)
        .writeStream.foreachBatch(
            lambda df, bid: write_batch_http(df, bid, settings=settings)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    landed = []
    for _, body in server.requests:
        landed.extend(json.loads(line) for line in body.decode().splitlines())
    assert len(landed) == expected
    assert all(list(r) == list(FACT_COLUMNS) for r in landed)
