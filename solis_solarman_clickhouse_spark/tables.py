"""Fixture-table loaders (TESTDATA.md).

Tables live as one Parquet file per table under ``/root/testdata/sf*``.
Loading is always ``spark.read.parquet`` — columnar scan with predicate
pushdown and column pruning handled by Catalyst; never collect/driver-side.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Dimension tables small enough to broadcast at any realistic scale factor
#: (region/nation are constant-size; the reference's analogous dimension data
#: is the targets.json config list, solarman.py:70-141).
BROADCAST_DIMS = ("region", "nation")

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown fixture table {name!r}")
    if name == "events":
        # events.parquet stores ts as TIMESTAMP(NANOS), which Spark's reader
        # rejects. Read the raw int64 nanos (legacy conf, runtime-settable)
        # and truncate to microseconds with integer division — bit-identical
        # to how DuckDB's TIMESTAMP_NS → TIMESTAMP truncation sees the data,
        # so oracle comparisons agree. (ns magnitudes ~1.7e18 overflow a
        # double, hence `div`, never `/`.)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def spread(df: DataFrame, *cols: str) -> DataFrame:
    """Repartition up to the cluster's parallelism before CPU-heavy work,
    but only when the input is under-partitioned (the local fixtures are
    single-row-group parquet → a one-task scan that serializes heavy
    aggregation/expression work on one core). On a well-partitioned input
    (any real multi-file table) this is a no-op — no shuffle at scale.
    Apply AFTER filters so predicate pushdown still reaches the scan."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target, *cols) if cols else df.repartition(target)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql queries."""
    for name in TABLE_NAMES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
