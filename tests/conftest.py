"""Shared fixtures: one SparkSession per test session, a DuckDB connection
with the fixture tables registered, and the differential-compare helper
mirroring the driver's check.

DRIVER-FAITHFUL COMPARATOR: the external driver reads BOTH result sets
through pandas (``spark_df.toPandas()`` / ``duckdb_con.execute(sql).df()``),
sorts columns by name, sorts rows, and hashes cell representations. Reading
through pandas is load-bearing: DuckDB HUGEINT/DECIMAL outputs widen to
float64 there, so a Spark int64 column vs an uncast oracle ``SUM(...)``
hash-mismatches on representation even when values are identical (the
round-3 failure class). A ``fetchall()``-based compare returns HUGEINT as
Python int and silently masks it — never go back to that path.
"""

from __future__ import annotations

import math
import os

import duckdb
import numpy as np
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
    """Cell canonicalization with int/float TYPE TAGS — an int64 10000 and
    a float64 10000.0 must compare UNEQUAL, exactly as they hash-differ in
    the driver's canonicalizer."""
    if v is None:
        return "␀"
    if isinstance(v, (bool, np.bool_)):
        return f"b:{bool(v)}"
    if isinstance(v, (int, np.integer)):
        return f"i:{int(v)}"
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return "NaN"
        r = round(f, 4)
        return f"f:{0.0 if r == 0 else r:.4f}"
    return str(v)


def _canon_pandas(pdf) -> list[tuple]:
    """Column-name-sorted, row-sorted, cell-normalized result set from a
    pandas DataFrame (the driver's path). Raises TypeError on list/dict
    cells, as the driver's canonicalizer does."""
    cols = sorted(pdf.columns)
    out = []
    for row in pdf[cols].itertuples(index=False, name=None):
        for c in row:
            if isinstance(c, (list, dict, set, np.ndarray)):
                raise TypeError(
                    f"unhashable cell type {type(c).__name__}: top-level "
                    "array/map output columns crash the driver — serialize "
                    "them (array_to_string / concat_ws)"
                )
        out.append(tuple(_norm_cell(c) for c in row))
    return sorted(out)


def normalize(rows: list[dict]) -> list[tuple]:
    """Legacy helper for tests that build row dicts directly."""
    if not rows:
        return []
    cols = sorted(rows[0].keys())
    return sorted(tuple(_norm_cell(r[c]) for c in cols) for r in rows)


def compare(spark_df, ducks, oracle_sql: str, *, name: str = "") -> None:
    """Assert the Spark result equals the DuckDB oracle result, both read
    through pandas like the driver does."""
    spandas = spark_df.toPandas()
    opandas = ducks.execute(oracle_sql).df()
    assert sorted(spandas.columns) == sorted(opandas.columns), (
        f"{name}: column names {sorted(spandas.columns)} != "
        f"oracle {sorted(opandas.columns)}"
    )
    actual = _canon_pandas(spandas)
    oracle = _canon_pandas(opandas)
    assert len(actual) == len(oracle), (
        f"{name}: row count {len(actual)} != oracle {len(oracle)}\n"
        f"spark head: {actual[:3]}\noracle head: {oracle[:3]}"
    )
    mism = [(a, o) for a, o in zip(actual, oracle) if a != o]
    assert not mism, f"{name}: {len(mism)} mismatched rows; first 3: {mism[:3]}"
