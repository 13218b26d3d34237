"""ClickHouse sink — the reference's actual landing store
(/root/reference/solarman.py:192-225 single-row INSERTs into the Buffer
table defined at /root/reference/tables.sql:34-61).

Spark-native shape: ``foreachBatch`` bulk JDBC writes (one multi-row
INSERT per partition per trigger) replace both the reference's
row-at-a-time INSERT loop AND the server-side Buffer batching — a Spark
micro-batch IS the batch. Connection settings mirror the reference's env
vars (CLICKHOUSE_URL/USERNAME/PASSWORD/DATABASE/TABLE, solarman.py:165-190).

The JDBC driver jar is not present in this environment, so ``write_batch``
is gated: everything up to the actual ``.jdbc()`` call — column ordering,
DDL generation, connection-property assembly — is pure and unit-tested
(tests/test_ingest.py); the network write raises a clear error when the
driver is missing rather than failing deep inside py4j.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from .registers import FACT_COLUMNS

#: Spark type → ClickHouse type for the fact table, mirroring
#: tables.sql:5-32 (Float32 gauges, UInt32 counters, DateTime, and a
#: LowCardinality dictionary-encoded key).
_CH_TYPES = {
    "inverter": "LowCardinality(String)",
    "time": "DateTime",
}
_FLOAT32_COLS = {
    "inverter_temperature_celsius", "inverter_efficiency_percent",
    "dc_1_voltage", "dc_1_amps", "dc_2_voltage", "dc_2_amps",
    "dc_3_voltage", "dc_3_amps", "dc_busbar_voltage", "ground_voltage",
    "ac_voltage", "ac_amps", "ac_frequency", "kwh_day",
}


def clickhouse_type(col: str) -> str:
    if col in _CH_TYPES:
        return _CH_TYPES[col]
    return "Float32" if col in _FLOAT32_COLS else "UInt32"


def create_table_ddl(database: str = "homelab", table: str = "solis_solarman") -> str:
    """MergeTree DDL equivalent to tables.sql:5-32: monthly partitions,
    (inverter, time) ordering/primary key."""
    cols = ",\n    ".join(f"`{c}` {clickhouse_type(c)}" for c in FACT_COLUMNS)
    return (
        f"CREATE TABLE IF NOT EXISTS {database}.{table} (\n    {cols}\n)\n"
        "ENGINE = MergeTree\n"
        "PARTITION BY toYYYYMM(time)\n"
        "ORDER BY (inverter, time)\n"
        "PRIMARY KEY (inverter, time)"
    )


def connection_properties(env: dict[str, str] | None = None) -> dict[str, str]:
    """JDBC connection settings from the reference's env-var names
    (solarman.py:165-190; defaults follow the code, not the README —
    SURVEY.md §1.3 doc-vs-code notes)."""
    e = env if env is not None else dict(os.environ)
    url = e.get("CLICKHOUSE_URL", "localhost:8123")
    return {
        "url": f"jdbc:clickhouse://{url}/{e.get('CLICKHOUSE_DATABASE', 'homelab')}",
        "user": e.get("CLICKHOUSE_USERNAME", "default"),
        "password": e.get("CLICKHOUSE_PASSWORD", ""),
        "dbtable": e.get("CLICKHOUSE_TABLE", "solis_solarman"),
        "driver": "com.clickhouse.jdbc.ClickHouseDriver",
    }


def ordered_for_insert(df: DataFrame) -> DataFrame:
    """Project to the reference's exact 26-column INSERT order
    (solarman.py:209-215) — positional inserts depend on it."""
    return df.select(*FACT_COLUMNS)


def write_batch(df: DataFrame, batch_id: int, *, props: dict[str, str] | None = None) -> None:
    """foreachBatch target: bulk-insert one micro-batch over JDBC.

    Effectively-once: ClickHouse's ReplacingMergeTree (or an idempotency
    batch_id column + dedup TTL) absorbs replays; with the plain MergeTree
    DDL above this is at-least-once, exactly matching the reference's
    semantics (solarman.py:202-225). Raises a descriptive error when the
    ClickHouse JDBC driver is absent (this test environment)."""
    p = props or connection_properties()
    out = ordered_for_insert(df)
    try:
        (
            out.write.format("jdbc")
            .option("url", p["url"])
            .option("dbtable", p["dbtable"])
            .option("user", p["user"])
            .option("password", p["password"])
            .option("driver", p["driver"])
            .option("batchsize", "10000")
            .option("isolationLevel", "NONE")  # ClickHouse has no txns
            .mode("append")
            .save()
        )
    except Exception as exc:  # pragma: no cover - needs a live server+driver
        raise RuntimeError(
            "ClickHouse JDBC write failed — the driver jar "
            "(com.clickhouse:clickhouse-jdbc) must be on the Spark classpath "
            "and a server reachable at CLICKHOUSE_URL"
        ) from exc
