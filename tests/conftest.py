"""Shared fixtures: one SparkSession per test session, a DuckDB connection
with the fixture tables registered, and the differential-compare helper
mirroring the driver's check (row count + schema-insensitive column-sorted
value comparison on rounded values).
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from solis_solarman_clickhouse_spark.session import get_spark
from solis_solarman_clickhouse_spark.tables import TABLE_NAMES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    spark = get_spark("tests")
    yield spark


@pytest.fixture(scope="session")
def ducks():
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _norm_cell(v):
    if v is None:
        return "␀"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        r = round(v, 4)
        return f"{0.0 if r == 0 else r:.4f}"
    if isinstance(v, bool):
        return str(bool(v))
    return str(v)


def normalize(rows: list[dict]) -> list[tuple]:
    """Column-name-sorted, row-sorted, cell-normalized result set."""
    if not rows:
        return []
    cols = sorted(rows[0].keys())
    out = [tuple(_norm_cell(r[c]) for c in cols) for r in rows]
    return sorted(out)


def compare(spark_df, ducks, oracle_sql: str, *, name: str = "") -> None:
    """Assert the Spark result equals the DuckDB oracle result."""
    actual = normalize([r.asDict() for r in spark_df.collect()])
    oracle = normalize(
        [dict(zip([d[0] for d in cur.description], row))
         for cur in [ducks.execute(oracle_sql)]
         for row in cur.fetchall()]
    )
    assert len(actual) == len(oracle), (
        f"{name}: row count {len(actual)} != oracle {len(oracle)}\n"
        f"spark head: {actual[:3]}\noracle head: {oracle[:3]}"
    )
    mism = [(a, o) for a, o in zip(actual, oracle) if a != o]
    assert not mism, f"{name}: {len(mism)} mismatched rows; first 3: {mism[:3]}"
