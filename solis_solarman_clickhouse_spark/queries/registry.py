"""Central registry of the declared query surface (SURVEY.md §2-C).

Every query is registered with:
- a callable ``(spark, sf_dir) -> DataFrame`` (the Spark-native plan),
- optionally an ANSI-SQL oracle string DuckDB can run on the same Parquet
  fixtures (omitted only for genuinely non-SQL-expressible ops — real
  streaming, sinks, LSH candidate generation — which get a rows-only check).

Determinism conventions shared by query + oracle (SURVEY.md §2-C):
- float aggregates accumulate in DECIMAL(38,6) then cast to DOUBLE so the
  result is independent of partitioning / summation order on both engines;
- every floating-point output column is ROUND(x, 4)-ed in the query;
- timestamps are UTC (session timezone pinned in session.py);
- ties in top-k / arg-max are broken by an explicit key column.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None
    category: str
    check: str  # EXACT | TOL | SMOKE
    doc: str = field(default="")


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, *, category: str, oracle: str | None = None, check: str = "EXACT"):
    """Decorator registering a query implementation."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, category=category, check=check, doc=fn.__doc__ or ""
        )
        return fn

    return deco


# --- shared deterministic-aggregation helpers ------------------------------

_DEC = T.DecimalType(38, 6)


def dsum(col) -> F.Column:
    """Order-independent sum of a double column: accumulate exactly in
    DECIMAL(38,6), return DOUBLE. Matches oracle idiom
    ``CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE)``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(_DEC)).cast("double")


def davg(col) -> F.Column:
    """Order-independent mean: exact decimal sum / count."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(c.cast(_DEC)).cast("double") / F.count(c)).cast("double")


def r4(col) -> F.Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c, 4)


# SQL-side equivalents for oracle strings
def sql_dsum(expr: str) -> str:
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(38,6))) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    return f"CAST(CAST(SUM(CAST(({expr}) AS DECIMAL(38,6))) AS DOUBLE) / COUNT({expr}) AS DOUBLE)"
