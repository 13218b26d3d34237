"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship star-join query at sf0.001 (smoke check).
queries()    — every implemented operator/query from SURVEY.md §2-C,
               (spark, sf_dir) -> DataFrame.
oracle_sql() — DuckDB-runnable ANSI SQL equivalent per query (omitted for
               non-SQL-expressible ops: real streaming, sinks, LSH
               candidate generation → driver records rows-only).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from solis_solarman_clickhouse_spark.queries import oracle_dict, queries_dict


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the 5-way star join with
    broadcast dimensions (Q-JOIN-1)."""
    from solis_solarman_clickhouse_spark.queries.registry import REGISTRY

    return REGISTRY["join_star_revenue"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return queries_dict()


def oracle_sql() -> dict[str, str]:
    return oracle_dict()
