#!/usr/bin/env python
"""Per-job / per-stage timing breakdown for one or more bench queries.

Runs the query like bench.py (one untimed warmup, then a timed trial with
the cache cleared first) and then reads the status REST API (UI enabled
on an ephemeral port) for every job the trial submitted: job duration,
per-stage task counts and executor-run-time sums, so the per-job
scheduling floor can be separated from real compute.

Usage: python tools/profile_jobs.py query1[,query2,...]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 4)
    only = {s for s in (sys.argv[1].split(",") if len(sys.argv) > 1 else []) if s}

    from oxbow_spark.queries.registry import BENCH_QUERIES
    from oxbow_spark.session import get_spark

    spark = get_spark("oxbow_spark_jobprof", cpus=cpus, shuffle_partitions=cpus,
                      extra_conf={"spark.ui.retainedJobs": "100000",
                                  "spark.ui.retainedStages": "100000",
                                  "spark.ui.enabled": "true",
                                  "spark.ui.port": "4099"})
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    sc = spark.sparkContext

    import json
    import urllib.request

    app_id = sc.applicationId
    base = f"http://localhost:4099/api/v1/applications/{app_id}"

    def rest(path):
        with urllib.request.urlopen(base + path) as fh:
            return json.load(fh)

    from datetime import datetime

    def ms(iso):
        # "2026-08-17T17:20:01.123GMT"
        return datetime.strptime(iso.replace("GMT", ""),
                                 "%Y-%m-%dT%H:%M:%S.%f").timestamp() * 1000

    for q in BENCH_QUERIES:
        if not q.bench or (only and q.name not in only):
            continue
        # warmup (uncounted: pays JIT + memoized fits)
        df = q.fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        tag = f"jobprof-{q.name}"
        sc.setJobGroup(tag, q.name)
        t0 = time.perf_counter()
        df = q.fn(spark, sf_dir)
        t_build = time.perf_counter() - t0
        df.write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        sc.setLocalProperty("spark.jobGroup.id", None)
        job_ids = sorted(sc.statusTracker().getJobIdsForGroup(tag))
        print(f"\n=== {q.name}: wall {wall:.3f}s (build {t_build:.3f}s), "
              f"{len(job_ids)} jobs ===")
        total_gap = 0.0
        prev_end = None
        stage_info = {s["stageId"]: s for s in rest("/stages")}
        for jid in job_ids:
            j = rest(f"/jobs/{jid}")
            sub = ms(j["submissionTime"])
            end = ms(j.get("completionTime", j["submissionTime"]))
            dur = (end - sub) / 1000.0
            gap = 0.0 if prev_end is None else max(0.0, (sub - prev_end) / 1000.0)
            total_gap += gap
            prev_end = end
            stages = []
            for sid in j["stageIds"]:
                s = stage_info.get(sid)
                if s is None or s["status"] == "SKIPPED":
                    stages.append(f"s{sid}:skip")
                    continue
                stages.append(
                    f"s{sid}({s['name'].split(' at ')[0][:28]}):"
                    f"{s['numCompleteTasks']}t/"
                    f"{s['executorRunTime'] / 1000.0:.2f}s-run")
            print(f"  job {jid}: {dur:.3f}s  (+{gap:.3f}s gap)  "
                  f"[{' '.join(stages)}]")
        if job_ids:
            print(f"  sum(inter-job gaps) = {total_gap:.3f}s")
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
