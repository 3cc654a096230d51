#!/usr/bin/env python
"""Capture `.explain("formatted")` for bench queries into plans/<tag>/.

Usage: python tools/capture_plans.py <outdir> <suffix> [only,names]

Writes plans/<outdir>/<query>_<suffix>.txt for every bench query (or the
comma-separated subset). Uses the same session config as bench.py so the
plans match what the bench actually executes.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> None:
    outdir = sys.argv[1] if len(sys.argv) > 1 else "r15"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    only = {s for s in (sys.argv[3].split(",") if len(sys.argv) > 3 else []) if s}
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 4)

    from oxbow_spark.queries.registry import BENCH_QUERIES
    from oxbow_spark.session import get_spark

    spark = get_spark("oxbow_spark_plans", cpus=cpus, shuffle_partitions=cpus)
    dest = os.path.join(REPO, "plans", outdir)
    os.makedirs(dest, exist_ok=True)
    for q in BENCH_QUERIES:
        if not q.bench or (only and q.name not in only):
            continue
        df = q.fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(dest, f"{q.name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")
    spark.stop()


if __name__ == "__main__":
    main()
