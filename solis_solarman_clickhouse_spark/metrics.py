"""Physical-execution metrics introspection — the observability surface a
query engine owes its operators (ClickHouse exposes this as
system.query_log; Spark keeps it on the executed plan's SQL metrics).

`run_with_metrics(df)` forces the plan with a noop write (full
computation, no driver collect) and walks the executed-plan tree
collecting the per-operator SQLMetrics Spark already maintains:
rows/bytes out of every scan, shuffle bytes written, spill sizes. Used by
tests to ASSERT scale properties numerically (e.g. a pruned scan reads
fewer bytes than a full scan) rather than by plan-string matching alone,
and available to operators for regression tracking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _walk(node, out: list) -> None:
    out.append(node)
    for i in range(node.children().size()):
        _walk(node.children().apply(i), out)
    # AQE wraps stages; descend into materialized stage plans
    cls = node.getClass().getSimpleName()
    if cls == "AdaptiveSparkPlanExec":
        _walk(node.executedPlan(), out)
    elif cls.endswith("QueryStageExec"):
        _walk(node.plan(), out)
    elif cls == "WholeStageCodegenExec" or cls == "InputAdapter":
        pass  # children() already descends through codegen wrappers


def run_with_metrics(df: DataFrame) -> dict[str, int]:
    """Execute `df` (noop write — computes everything, collects nothing)
    and return aggregated physical metrics:

    - scan_rows / scan_bytes: rows and bytes produced by file scans
    - shuffle_write_bytes: total shuffle data written
    - spill_bytes: memory+disk spill across operators
    - peak_rows_out: max rows output by any single operator
    """
    qe = df._jdf.queryExecution()
    # Execute THIS QueryExecution's plan (a df.write/.collect would build a
    # fresh QueryExecution and leave these metrics at zero): materialize
    # the plan's RDD — full computation, nothing shipped to the driver
    # beyond partition counts.
    qe.toRdd().count()
    plan = qe.executedPlan()
    nodes: list = []
    _walk(plan, nodes)

    agg = {"scan_rows": 0, "scan_bytes": 0, "shuffle_write_bytes": 0,
           "shuffle_write_rows": 0, "spill_bytes": 0, "peak_rows_out": 0}
    for n in nodes:
        cls = n.getClass().getSimpleName()
        metrics = n.metrics()
        it = metrics.iterator()
        while it.hasNext():
            kv = it.next()
            name, metric = kv._1(), kv._2()
            val = metric.value()
            if cls.startswith("FileSourceScan"):
                if name == "numOutputRows":
                    agg["scan_rows"] += val
                elif name in ("filesSize", "staticFilesSize"):
                    agg["scan_bytes"] += val
            if name == "shuffleBytesWritten" or name == "bytesWritten" and "Shuffle" in cls:
                agg["shuffle_write_bytes"] += val
            if name == "shuffleRecordsWritten":
                agg["shuffle_write_rows"] += val
            if "spill" in name.lower():
                agg["spill_bytes"] += val
            if name == "numOutputRows":
                agg["peak_rows_out"] = max(agg["peak_rows_out"], val)
    return agg
