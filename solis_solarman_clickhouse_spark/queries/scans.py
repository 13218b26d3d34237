"""Q-SCAN: full scans and pruned projections (SURVEY.md §2-C).

The reference's storage layout (MergeTree ordered by (inverter, time),
monthly partitions — /root/reference/tables.sql:32) exists to make exactly
these two access patterns cheap; in Spark the equivalents are Parquet
column pruning + predicate pushdown, which Catalyst applies when the plan
is declared with select/filter (verify via .explain: PushedFilters /
ReadSchema).
"""

from __future__ import annotations

import functools
import os

from pyspark.sql import functions as F

from ..tables import TABLE_NAMES, table
from .registry import davg, query, r4

_COUNT_ORACLE = " UNION ALL ".join(
    f"SELECT '{t}' AS table_name, COUNT(*) AS n_rows FROM {t}" for t in TABLE_NAMES
)


@query("scan_count_all", category="scan", oracle=_COUNT_ORACLE)
def scan_count_all(spark, sf_dir):
    """Q-SCAN-1: COUNT(*) of every fixture table.

    count() over Parquet is metadata-only per row group (no column
    materialization) — the cheapest possible full scan.
    """
    dfs = [
        table(spark, sf_dir, t).agg(
            F.lit(t).alias("table_name"), F.count(F.lit(1)).alias("n_rows")
        )
        for t in TABLE_NAMES
    ]
    return functools.reduce(lambda a, b: a.unionAll(b), dfs)


@query(
    "scan_pruned_projection",
    category="scan",
    oracle="""
    SELECT l_orderkey, l_extendedprice
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-03-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1995-06-01 00:00:00'
    """,
)
def scan_pruned_projection(spark, sf_dir):
    """Q-SCAN-2: 2-column projection + ship-date range filter.

    Catalyst pushes both the column pruning (ReadSchema: 3 of 11 cols) and
    the timestamp range predicate into the Parquet scan; at 100 TB with
    date-partitioned layout this also prunes partitions.
    """
    li = table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1995-03-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1995-06-01 00:00:00").cast("timestamp"))
    ).select("l_orderkey", "l_extendedprice")


@query(
    "scan_sample_hash",
    category="scan",
    oracle="""
    SELECT o_orderstatus, COUNT(*) AS n_sampled,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_price
    FROM orders
    WHERE ((o_orderkey * 2654435761) % 4294967296) % 100 < 5
    GROUP BY o_orderstatus
    """,
)
def scan_sample_hash(spark, sf_dir):
    """Deterministic ~5% Bernoulli sample by Knuth multiplicative hash of
    the key — the training-data alternative to rand()-sampling: stable
    across reruns, engines, partitionings, and cluster sizes, and the
    predicate pushes to the scan. (TABLESAMPLE/rand() would be
    nondeterministic and unverifiable against an oracle.)"""
    o = table(spark, sf_dir, "orders")
    keep = ((F.col("o_orderkey") * F.lit(2654435761)) % F.lit(4294967296)) % 100 < 5
    return (
        o.filter(keep)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum(F.col("o_totalprice").cast("decimal(38,6)")).cast("double").alias("sum_price"),
        )
    )


@query("source_python_datasource", python_boundary=True, category="scan", check="SMOKE")
def source_python_datasource(spark, sf_dir):
    """A1/A2 as a first-class Spark source: the custom Python DataSource
    (ingest/datasource.py) replays the register poll loop with one
    partition per inverter, then the decode->derive pipeline lands the
    26-column fact table. SMOKE (generated input has no parquet oracle);
    exact shape/monotonicity/exactly-once-offsets are asserted in
    tests/test_datasource.py."""
    from ..ingest.datasource import SolisRegisterDataSource
    from ..ingest.pipeline import transform

    spark.dataSource.register(SolisRegisterDataSource)
    raw = (
        spark.read.format("solis_registers")
        .option("inverters", 2).option("days", 1).load()
    )
    return (
        transform(raw)
        .groupBy("inverter")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.avg("dc_actual_watts"), 4).alias("avg_dc_watts"),
            F.max("kwh_total").alias("kwh_total_end"),
        )
    )


@query(
    "scan_reservoir_per_group",
    category="scan",
    oracle="""
    WITH h AS (
      SELECT source, doc_id,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS hk
      FROM documents
    ),
    rk AS (
      SELECT source, doc_id,
             ROW_NUMBER() OVER (PARTITION BY source ORDER BY hk, doc_id) AS rk
      FROM h
    )
    SELECT source, rk, doc_id FROM rk WHERE rk <= 5
    """,
)
def scan_reservoir_per_group(spark, sf_dir):
    """Deterministic k-per-group reservoir: every source contributes
    EXACTLY min(k, |group|) documents, chosen by portable md5 rank — the
    per-source cap a training-mix pipeline applies before mixing (each
    source's 5 "lottery winners" are stable across runs, engines and
    cluster sizes, unlike rand()-based reservoirs). One shuffle on
    source; Catalyst rewrites the rank filter to WindowGroupLimit, so
    only k rows per group survive the exchange — the 100 TB shape."""
    docs = table(spark, sf_dir, "documents")
    hk = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10).cast(
        "long"
    )
    from pyspark.sql import Window as W

    h = docs.select("source", "doc_id", hk.alias("hk"))
    rk = h.withColumn(
        "rk",
        F.row_number().over(W.partitionBy("source").orderBy("hk", "doc_id")),
    )
    return rk.where(F.col("rk") <= 5).select("source", "rk", "doc_id")


@query(
    "scan_files_metadata",
    category="scan",
    oracle="""
    SELECT 'documents.parquet' AS file_name,
           COUNT(*) AS n_rows,
           COUNT(DISTINCT source) AS n_sources
    FROM documents
    """,
)
def scan_files_metadata(spark, sf_dir):
    """Data-source V2 hidden `_metadata` column: per-input-file row counts
    and key cardinality — the lineage/debugging scan every lakehouse
    operator runs ("which file contributed these rows?"). The _metadata
    struct is populated by the FileScan itself (no extra I/O); the oracle
    uses DuckDB's filename=true equivalent. Both sides reduce the path to
    its basename so the check is location-independent."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        docs.select(
            F.regexp_extract(F.col("_metadata.file_name"), r"([^/]+)$", 1).alias(
                "file_name"
            ),
            "source",
        )
        .groupBy("file_name")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count_distinct("source").alias("n_sources"),
        )
    )


@query(
    "scan_profile_stats",
    category="scan",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           COUNT(DISTINCT user_id) AS user_card,
           COUNT(DISTINCT event_type) AS type_card,
           MIN(ts) AS ts_min, MAX(ts) AS ts_max,
           ROUND(MIN(value), 4) AS v_min, ROUND(MAX(value), 4) AS v_max,
           ROUND(CAST(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE)
                      / COUNT(value) AS DOUBLE), 4) AS v_mean,
           COUNT(*) - COUNT(props) AS props_nulls
    FROM events
    """,
)
def scan_profile_stats(spark, sf_dir):
    """One-pass data-profiling scan: row count, key cardinalities, time
    span, value range/mean, null counts — the table-health summary every
    catalog page shows and every ingest job should assert on (the
    reference lands data with no profiling at all; this is the query its
    operators were missing). Single aggregation, no grouping — partial
    aggregation reduces each partition to one row before the 1-row
    exchange."""
    ev = table(spark, sf_dir, "events")
    return ev.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct("user_id").alias("user_card"),
        F.count_distinct("event_type").alias("type_card"),
        F.min("ts").alias("ts_min"),
        F.max("ts").alias("ts_max"),
        F.round(F.min("value"), 4).alias("v_min"),
        F.round(F.max("value"), 4).alias("v_max"),
        r4(davg("value")).alias("v_mean"),
        (F.count(F.lit(1)) - F.count("props")).alias("props_nulls"),
    )


@query(
    "scan_select_except",
    category="scan",
    oracle="""
    SELECT * EXCLUDE (props, value) FROM events WHERE event_type = 'error'
    """,
)
def scan_select_except(spark, sf_dir):
    """Projection by EXCLUSION — Spark 4's SELECT * EXCEPT (…) ≡ DuckDB's
    EXCLUDE: drop the wide/PII columns, keep everything else, without
    enumerating the keep-list (the schema-evolution-proof way to strip a
    payload column before export). Catalyst still sees a plain
    projection, so column pruning reaches the scan exactly as if the
    kept columns were spelled out."""
    from ..tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        "SELECT * EXCEPT (props, value) FROM events WHERE event_type = 'error'"
    )


@query(
    "scan_validation_report",
    category="scan",
    oracle="""
    WITH checked AS (
      SELECT CASE
               WHEN value IS NULL THEN 'null_value'
               WHEN value < 0 OR value > 100 THEN 'out_of_range'
               WHEN ts < TIMESTAMP '2024-01-08' THEN 'stale_timestamp'
               WHEN json_extract(props, '$.k') IS NULL
                    OR CAST(json_extract_string(props, '$.k') AS INTEGER) > 90
                 THEN 'bad_props'
               ELSE 'ok' END AS reason
      FROM events
    )
    SELECT reason, COUNT(*) AS n_rows
    FROM checked GROUP BY reason
    """,
)
def scan_validation_report(spark, sf_dir):
    """Ingest validation report: every row classified by the FIRST failed
    check (null measure → range → staleness → payload-field validity) —
    the quarantine-split accounting the reference's pipeline never does
    (it trusts Modbus payloads end-to-end; A9 only validates config).
    Thresholds are calibrated to the synthetic fixture (value 0.01–490,
    ts all Jan-2024, props = {"k": int}) so every bucket except
    null_value is non-empty — an all-'ok' report would test nothing.
    The CASE chain is one codegen'd projection; at 100 TB the same
    expression feeds a partitioned quarantine sink instead of a count."""
    ev = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    reason = (
        F.when(F.col("value").isNull(), "null_value")
        .when((F.col("value") < 0) | (F.col("value") > 100), "out_of_range")
        .when(F.col("ts") < F.lit("2024-01-08").cast("timestamp"), "stale_timestamp")
        .when(k.isNull() | (k > 90), "bad_props")
        .otherwise("ok")
    )
    return ev.groupBy(reason.alias("reason")).agg(F.count(F.lit(1)).alias("n_rows"))


@query(
    "scan_stratified_sample",
    category="scan",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_sampled,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_price
    FROM orders
    WHERE ((o_orderkey * 2654435761) % 4294967296) % 100 <
          CASE o_orderpriority
            WHEN '1-URGENT' THEN 20
            WHEN '2-HIGH' THEN 10
            ELSE 5
          END
    GROUP BY o_orderpriority
    """,
)
def scan_stratified_sample(spark, sf_dir):
    """Stratified deterministic sampling (``df.sampleBy`` parity, the
    class-rebalancing step of training-data curation): each stratum keeps
    its own fraction — 20 % of urgent orders, 10 % of high, 5 % of the
    rest — selected by the same Knuth multiplicative key hash as
    scan_sample_hash, so membership is stable across reruns, engines,
    partitionings, and cluster sizes (rand()-based sampleBy is none of
    those). The per-stratum threshold is a CASE on the stratum column
    inside ONE scan predicate: no per-stratum passes, no shuffle before
    the filter, and the hash+compare pushes into the scan stage — at
    100 TB this is a single map-side filter however many strata exist."""
    o = table(spark, sf_dir, "orders")
    pct = ((F.col("o_orderkey") * F.lit(2654435761)) % F.lit(4294967296)) % 100
    frac = (
        F.when(F.col("o_orderpriority") == "1-URGENT", 20)
        .when(F.col("o_orderpriority") == "2-HIGH", 10)
        .otherwise(5)
    )
    return (
        o.filter(pct < frac)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum(F.col("o_totalprice").cast("decimal(38,6)"))
            .cast("double")
            .alias("sum_price"),
        )
    )


@query(
    "scan_merge_schema",
    category="scan",
    oracle="""
    WITH unified AS (
      SELECT o_orderkey, o_totalprice, NULL AS o_orderpriority, 1 AS batch
      FROM orders WHERE month(o_orderdate) <= 6
      UNION ALL
      SELECT o_orderkey, o_totalprice, o_orderpriority, 2 AS batch
      FROM orders WHERE month(o_orderdate) > 6
    )
    SELECT batch, o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_price
    FROM unified
    GROUP BY batch, o_orderpriority
    """,
)
def scan_merge_schema(spark, sf_dir):
    """Schema-evolution scan (``mergeSchema``): a corpus landed over time
    where later batches added a column — batch 1 carries (orderkey,
    totalprice), batch 2 additionally o_orderpriority — read as ONE
    relation whose unified schema null-fills the column for old files.
    This is the reader-side counterpart of set_union_by_name and the
    default state of any long-lived 100 TB lake: schemas drift, history
    is never rewritten. The two batches land as Hive-style batch=N
    partition directories, so the scan also proves partition discovery +
    per-file schema reconciliation happen in one pass (Spark merges
    footers distributed, not on the driver). Exact: counts + DECIMAL
    sums per (batch, priority-or-null)."""
    import os
    import tempfile

    o = table(spark, sf_dir, "orders")
    root = os.path.join(tempfile.mkdtemp(prefix="mergeschema_"), "orders_evolved")
    o.filter(F.month("o_orderdate") <= 6).select(
        "o_orderkey", "o_totalprice"
    ).write.mode("overwrite").parquet(os.path.join(root, "batch=1"))
    o.filter(F.month("o_orderdate") > 6).select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    ).write.mode("overwrite").parquet(os.path.join(root, "batch=2"))
    unified = spark.read.option("mergeSchema", "true").parquet(root)
    return unified.groupBy("batch", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(38,6)"))
        .cast("double")
        .alias("sum_price"),
    )


@query(
    "scan_ignore_corrupt_files",
    category="scan",
    oracle="""
    SELECT event_type, COUNT(*) AS n
    FROM events WHERE event_id % 2 = 0
    GROUP BY event_type ORDER BY event_type
    """,
)
def scan_ignore_corrupt_files(spark, sf_dir):
    """Corrupt-file resilience — the operational reality of a 100 TB
    landing zone (truncated uploads, torn writes, a dead node's partial
    part-file): the even-id half of events lands as healthy parquet
    next to a deliberately garbage `.parquet` file, and the scan reads
    with ``ignoreCorruptFiles`` so the poison file costs a warning, not
    the job — the batch analogue of the reference's skip-don't-fail
    config policy (solarman.py:82-125) applied to storage. The oracle
    aggregates the same deterministic subset directly, proving the scan
    recovered every healthy row and nothing else. (Without the option
    this read throws — which is the right DEFAULT; opting in is a
    per-pipeline decision, not a global config.)"""
    import tempfile

    ev = table(spark, sf_dir, "events").where(F.col("event_id") % 2 == 0)
    d = tempfile.mkdtemp(prefix="corrupt_scan_")
    ev.coalesce(2).write.mode("overwrite").parquet(d)
    with open(os.path.join(d, "part-corrupt-00099.snappy.parquet"), "wb") as f:
        f.write(b"PAR1 this is not a real parquet footer at all" * 20)
    return (
        spark.read.option("ignoreCorruptFiles", "true")
        .parquet(d)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("event_type")
    )


@query(
    "scan_json_corrupt_records",
    category="scan",
    oracle="""
    WITH good AS (
      SELECT event_type, COUNT(*) AS n_rows,
             CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events WHERE event_id % 3 = 0
      GROUP BY event_type
    )
    SELECT event_type, n_rows, cents FROM good
    UNION ALL
    SELECT '_corrupt_', CAST(7 AS BIGINT), CAST(0 AS BIGINT)
    ORDER BY event_type
    """,
)
def scan_json_corrupt_records(spark, sf_dir):
    """PERMISSIVE JSON-lines recovery — the semi-structured twin of
    scan_ignore_corrupt_files: a third of events lands as JSONL with 7
    deterministically planted garbage lines (truncated object, bare
    text, invalid escape — what a flaky producer actually emits), and
    the read runs in the default PERMISSIVE mode with
    columnNameOfCorruptRecord so broken lines become quarantine rows
    instead of killing the job (FAILFAST) or vanishing silently
    (DROPMALFORMED — the dangerous one: a lost line is invisible). The
    report counts healthy rows per type PLUS the quarantine bucket —
    the oracle knows exactly 7 lines were planted, so a parser that
    drops or double-counts either side hash-fails. Schema is supplied
    explicitly (production contract: never infer over a quarantine
    read). Scan-parallel at any scale; the quarantine rollup is one
    map-side-combinable aggregate."""
    import tempfile

    ev = table(spark, sf_dir, "events").where(F.col("event_id") % 3 == 0)
    d = tempfile.mkdtemp(prefix="json_corrupt_")
    ev.selectExpr(
        "event_id", "event_type", "CAST(floor(value * 100) AS BIGINT) AS cents"
    ).coalesce(2).write.mode("overwrite").json(d)
    bad = [
        '{"event_id": 1, "event_type": "click", "cents": ',
        "this is not json at all",
        '{"event_id": }',
        '{"event_id": 2, "event_type": "x", "cents": "\\q"}',
        "[1, 2,",
        '{"event_id" 3}',
        '{{"nested": true}',
    ]
    with open(os.path.join(d, "part-bad-00099.json"), "w") as f:
        f.write("\n".join(bad) + "\n")
    schema = (
        "event_id BIGINT, event_type STRING, cents BIGINT, _corrupt STRING"
    )
    parsed = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(d)
    )
    return (
        parsed.select(
            F.when(F.col("_corrupt").isNotNull(), F.lit("_corrupt_"))
            .otherwise(F.col("event_type"))
            .alias("event_type"),
            F.when(F.col("_corrupt").isNotNull(), F.lit(0))
            .otherwise(F.col("cents"))
            .alias("cents"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("cents").alias("cents"),
        )
        .orderBy("event_type")
    )


@query(
    "scan_observed_metrics",
    category="scan",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS cents,
           CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_null_value,
           CAST(MIN(user_id) AS BIGINT) AS min_user,
           CAST(MAX(user_id) AS BIGINT) AS max_user
    FROM events
    """,
)
def scan_observed_metrics(spark, sf_dir):
    """Spark's Observation API (``df.observe``) — pipeline observability
    WITHOUT a second pass: the metrics accumulate as the main action
    executes (here a noop-ish count), so a production job gets its
    row-count / checksum / null-rate / cardinality telemetry for free
    instead of re-scanning 100 TB to compute them. The observed values
    are returned AS the result frame so the oracle can hash-check that
    the free-rider metrics equal a direct aggregation — a divergence
    would mean observe() dropped rows (e.g. under task retries,
    which Spark's semantics guarantee against for deterministic
    metrics). All metrics are exact integers; DISTINCT aggregates are
    rejected by CollectMetrics (INVALID_OBSERVED_METRICS), so the
    cardinality telemetry slot carries the key ENVELOPE (min/max) —
    at scale the distinct-ish signal would be approx_count_distinct,
    which observe() does allow."""
    from pyspark.sql import Observation

    ev = table(spark, sf_dir, "events")
    obs = Observation("scan_metrics")
    observed = ev.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.floor(F.col("value") * 100).cast("bigint")).alias("cents"),
        F.sum(F.when(F.col("value").isNull(), 1).otherwise(0)).alias("n_null_value"),
        F.min("user_id").alias("min_user"),
        F.max("user_id").alias("max_user"),
    )
    observed.count()  # the main action; metrics ride along
    g = obs.get
    return spark.createDataFrame(
        [(g["n_rows"], g["cents"], g["n_null_value"], g["min_user"], g["max_user"])],
        "n_rows long, cents long, n_null_value long, min_user long, max_user long",
    )


@query(
    "scan_high_watermark_incremental",
    category="scan",
    oracle="""
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS cents
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def scan_high_watermark_incremental(spark, sf_dir):
    """High-watermark INCREMENTAL extraction — the pattern behind every
    scheduled ETL pull: run 1 takes rows up to a cutoff and records
    max(ts) as its watermark; run 2 takes STRICTLY ts > watermark. The
    query executes both runs and aggregates their UNION; equality with
    the oracle's direct full-table aggregation proves the contract the
    pattern lives or dies by — no row lost at the boundary (the
    classic bug: `>= watermark` duplicates the boundary row,
    `> cutoff` with watermark≠max loses late-arriving equals). The
    watermark is a one-row aggregate fetched between runs (exactly
    what an orchestrator persists); each run is a pushed-down range
    scan (PushedFilters on ts), so at 100 TB run 2 reads only the new
    partitions. Exact integer aggregation."""
    ev = table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.min(F.unix_micros("ts")).alias("lo"), F.max(F.unix_micros("ts")).alias("hi")
    ).first()
    cut = bounds["lo"] + (bounds["hi"] - bounds["lo"]) * 6 // 10
    run1 = ev.where(F.unix_micros("ts") <= cut)
    watermark = run1.agg(F.max(F.unix_micros("ts")).alias("w")).first()["w"]
    run2 = ev.where(F.unix_micros("ts") > watermark)
    return (
        run1.unionByName(run2)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.floor(F.col("value") * 100).cast("bigint")).alias("cents"),
        )
        .orderBy("event_type")
    )
