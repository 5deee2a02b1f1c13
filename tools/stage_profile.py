#!/usr/bin/env python
"""Stage-level profile of registry queries (optimization round 13, guide §1).

For each named query: one discarded warmup, then one timed run executed in
its own job group with the UI enabled; afterwards the driver scrapes its own
REST API (/api/v1) for the stages that ran inside the timed window and
prints, per stage: wall duration, task count, input/shuffle-read/
shuffle-write bytes, and the stage's first line of the name (operator hint).

This answers "where do the seconds go" (executor compute vs shuffle vs
scheduling vs driver gaps) without the interactive UI the sandbox can't
open. Driver-side time (planning, collects between jobs) shows up as the
gap between summed stage time and the query wall time.

Usage:
    python tools/stage_profile.py training_export dedup_prefix_filter ...
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _get(base: str, path: str):
    with urllib.request.urlopen(base + path) as r:
        return json.loads(r.read().decode())


def main() -> None:
    names = sys.argv[1:]
    if not names:
        print("usage: stage_profile.py <query> [...]", file=sys.stderr)
        sys.exit(2)

    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("stage-profile")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4099")
        .config("spark.sql.shuffle.partitions", os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from url_counter_mapreduce_spark import QUERIES
    from url_counter_mapreduce_spark.session import prep

    prep(spark)
    base = spark.sparkContext.uiWebUrl + "/api/v1/applications/" + spark.sparkContext.applicationId
    sc = spark.sparkContext

    for name in names:
        fn = QUERIES[name]
        # warmup (discarded)
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        jobs_before = {j["jobId"] for j in _get(base, "/jobs")}
        sc.setJobDescription(f"profile:{name}")
        t0 = time.perf_counter()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        sc.setJobDescription(None)

        jobs = [j for j in _get(base, "/jobs") if j["jobId"] not in jobs_before]
        stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
        rows = []
        for sid in stage_ids:
            try:
                datas = _get(base, f"/stages/{sid}")
            except Exception:
                continue
            for s in datas:
                if s["status"] == "SKIPPED":
                    continue
                dur = None
                if s.get("firstTaskLaunchedTime") and s.get("completionTime"):
                    # ISO strings; fall back to executorRunTime if parse fails
                    pass
                rows.append(
                    {
                        "stage": sid,
                        "tasks": s["numCompleteTasks"],
                        "run_ms": s["executorRunTime"],
                        "cpu_ms": s.get("executorCpuTime", 0) // 1_000_000,
                        "gc_ms": s.get("jvmGcTime", 0),
                        "fetch_ms": s.get("shuffleFetchWaitTime", 0),
                        "input_mb": round(s["inputBytes"] / 1e6, 2),
                        "sh_r_mb": round(s["shuffleReadBytes"] / 1e6, 2),
                        "sh_w_mb": round(s["shuffleWriteBytes"] / 1e6, 2),
                        "name": s["name"].split("\n")[0][:80],
                    }
                )
        print(f"\n=== {name}: wall {wall:.3f}s, {len(jobs)} jobs, {len(rows)} stages ===")
        tot_run = sum(r["run_ms"] for r in rows)
        print(f"  sum executorRunTime {tot_run/1000:.2f}s (task-parallel; wall gap = driver/sched)")
        for r in sorted(rows, key=lambda r: -r["run_ms"])[:14]:
            print(
                f"  st{r['stage']:<4} run {r['run_ms']/1000:7.2f}s cpu {r['cpu_ms']/1000:7.2f}s"
                f" gc {r['gc_ms']/1000:6.2f}s fw {r['fetch_ms']/1000:5.2f}s"
                f" tasks {r['tasks']:<4} in {r['input_mb']:7.2f}MB shR {r['sh_r_mb']:6.2f}MB"
                f" shW {r['sh_w_mb']:6.2f}MB  {r['name']}"
            )
    spark.stop()


if __name__ == "__main__":
    main()
