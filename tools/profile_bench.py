#!/usr/bin/env python
"""Split each bench query's wall time into DataFrame-build time (python
plan construction, incl. any plan-time jobs), physical-planning time
(analysis+optimization via explainString), and execution time (noop
sink). Mirrors bench.py methodology: warmup once, then min-of-N with
cache cleared between trials.

Usage: python tools/profile_bench.py [only,names]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 4)
    trials = int(os.environ.get("SPARK_GRAFT_TRIALS", "3"))
    only = {s for s in (sys.argv[1].split(",") if len(sys.argv) > 1 else []) if s}

    from oxbow_spark.queries.registry import BENCH_QUERIES
    from oxbow_spark.session import get_spark

    spark = get_spark("oxbow_spark_profile", cpus=cpus, shuffle_partitions=cpus)
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    out = {}
    for q in BENCH_QUERIES:
        if not q.bench or (only and q.name not in only):
            continue
        rows = []
        for trial in range(trials + 1):
            t0 = time.perf_counter()
            df = q.fn(spark, sf_dir)
            t1 = time.perf_counter()
            # force analysis + optimization + physical planning
            df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "simple")
            t2 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t3 = time.perf_counter()
            if trial > 0:
                rows.append((t1 - t0, t2 - t1, t3 - t2))
            spark.catalog.clearCache()
        out[q.name] = {
            "build": round(min(r[0] for r in rows), 3),
            "plan": round(min(r[1] for r in rows), 3),
            "exec": round(min(r[2] for r in rows), 3),
            "total_min": round(min(sum(r) for r in rows), 3),
        }
        print(q.name, out[q.name], flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
