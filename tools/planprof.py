#!/usr/bin/env python
"""Per-query profiler for the optimization rounds (guide §1: measure first).

For each named query:
  - captures ``explain("formatted")`` to ``plans/<tag>/<name>_<suffix>.txt``
  - times N noop-sink executions (bench methodology: min-of-N)
  - parses the Spark event log to report per-query job/stage counts,
    task counts, and the top stages by wall time — the local substitute
    for the Spark UI (disabled in this container).

Usage:
    python tools/planprof.py [--sf=/root/testdata/sf0.1] [--runs=3]
        [--tag=r09] [--suffix=before] [--no-plans] query1 query2 ...

Reads SPARK_GRAFT_CPUS like bench.py. Writes a JSON summary to stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf = "/root/testdata/sf0.1"
    runs = 3
    tag = "r09"
    suffix = "before"
    plans = True
    names = []
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            sf = a.split("=", 1)[1]
        elif a.startswith("--runs="):
            runs = int(a.split("=", 1)[1])
        elif a.startswith("--tag="):
            tag = a.split("=", 1)[1]
        elif a.startswith("--suffix="):
            suffix = a.split("=", 1)[1]
        elif a == "--no-plans":
            plans = False
        elif a == "--plans-only":
            runs = 0
        else:
            names.append(a)

    import tempfile

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    evdir = tempfile.mkdtemp(prefix="planprof_ev_")
    os.environ.setdefault("SPARK_GRAFT_SF_DIR", sf)

    # bench-identical session factory, plus event logging for stage metrics
    from solis_solarman_clickhouse_spark import session as S

    _orig_get = S.get_spark

    from pyspark.sql import SparkSession

    n = S.default_parallelism()
    advisory_mb = S._parse_advisory_mb(os.environ.get("SPARK_GRAFT_ADVISORY_MB"))
    shuffle_n = S.scaled_shuffle_partitions(n, S._fixture_bytes(), advisory_mb)
    spark = (
        SparkSession.builder.master(f"local[{n}]")
        .appName("planprof")
        .config("spark.sql.shuffle.partitions", str(shuffle_n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", f"{advisory_mb}m")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.enableVectorizedReader", "true")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.compress", "false")
        .config("spark.eventLog.dir", evdir)
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    from solis_solarman_clickhouse_spark.caching import release_cached
    from solis_solarman_clickhouse_spark.queries import REGISTRY

    # warmup (bench-identical)
    REGISTRY["scan_count_all"].fn(spark, sf).count()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.mode("overwrite").format("noop").save()

    plan_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag
    )
    os.makedirs(plan_dir, exist_ok=True)

    marks: dict[str, tuple[float, float]] = {}  # name -> (t_start, t_end) of run 2+
    results: dict[str, dict] = {}
    for name in names:
        spec = REGISTRY[name]
        if plans and not spec.eager:
            df = spec.fn(spark, sf)
            p = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(plan_dir, f"{name}_{suffix}.txt"), "w") as fh:
                fh.write(p)
            release_cached()
        if runs == 0:
            results[name] = {"min": None, "runs": []}
            continue
        samples = []
        spark.sparkContext.setJobDescription(f"planprof:{name}")
        t_first = time.time()
        for i in range(runs):
            t0 = time.perf_counter()
            spec.fn(spark, sf).write.mode("overwrite").format("noop").save()
            samples.append(round(time.perf_counter() - t0, 3))
        marks[name] = (t_first, time.time())
        spark.sparkContext.setJobDescription(None)
        release_cached()
        results[name] = {"min": min(samples), "runs": samples}
        print(f"# {name}: {min(samples)}s {samples}", file=sys.stderr)

    spark.stop()

    # parse event log: jobs/stages within each query's window
    import glob

    paths = []
    for f in glob.glob(os.path.join(evdir, "*")):
        if os.path.isdir(f):  # eventlog_v2 directory layout
            paths.extend(
                p for p in glob.glob(os.path.join(f, "*"))
                if os.path.isfile(p) and "appstatus" not in os.path.basename(p)
            )
        else:
            paths.append(f)
    ev = {}
    for f in paths:
        stages = {}  # id -> dict
        jobs_by_desc: dict[str, list] = {}
        with open(f, errors="replace") as fh:
            for line in fh:
                try:
                    e = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if not isinstance(e, dict):
                    continue
                et = e.get("Event")
                if et == "SparkListenerJobStart":
                    desc = e.get("Properties", {}).get("spark.job.description", "")
                    jobs_by_desc.setdefault(desc, []).append(
                        {
                            "job": e["Job ID"],
                            "t0": e["Submission Time"],
                            "stages": [s["Stage ID"] for s in e.get("Stage Infos", [])],
                            "n_tasks": sum(
                                s.get("Number of Tasks", 0)
                                for s in e.get("Stage Infos", [])
                            ),
                        }
                    )
                elif et == "SparkListenerJobEnd":
                    for lst in jobs_by_desc.values():
                        for j in lst:
                            if j["job"] == e["Job ID"]:
                                j["ms"] = e["Completion Time"] - j["t0"]
                elif et == "SparkListenerStageCompleted":
                    si = e["Stage Info"]
                    stages[si["Stage ID"]] = {
                        "name": si["Stage Name"].split("\n")[0][:80],
                        "tasks": si["Number of Tasks"],
                        "ms": si.get("Completion Time", 0) - si.get("Submission Time", 0),
                    }
        for desc, lst in jobs_by_desc.items():
            if not desc.startswith("planprof:"):
                continue
            qname = desc.split(":", 1)[1]
            agg = ev.setdefault(
                qname,
                {"n_jobs": 0, "n_stages": 0, "n_tasks": 0, "job_ms": 0, "top_stages": []},
            )
            agg["n_jobs"] += len(lst)
            agg["job_ms"] += sum(j.get("ms", 0) for j in lst)
            sids = {s for j in lst for s in j["stages"]}
            agg["n_stages"] += len([s for s in sids if s in stages])
            agg["n_tasks"] += sum(j["n_tasks"] for j in lst)
            top = sorted(
                (stages[s] for s in sids if s in stages),
                key=lambda d: -d["ms"],
            )[:6]
            agg["top_stages"] = top

    for name in names:
        results[name]["events"] = ev.get(name, {})
        e = ev.get(name, {})
        n_runs = runs
        print(
            f"# {name}: jobs={e.get('n_jobs', 0)} (/{n_runs} runs) "
            f"tasks={e.get('n_tasks', 0)} job_ms_sum={e.get('job_ms', 0)}",
            file=sys.stderr,
        )
        for s in e.get("top_stages", []):
            print(f"#    stage {s['ms']}ms x{s['tasks']}t {s['name']}", file=sys.stderr)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
