"""Root-cause probe for the residual per-task Python-runner latency at
high task concurrency (VERDICT r15 #5 / OPTIMIZATION_r15 "Not yet
optimized" 1b: after the zipimport fix, a trivial 1-task pandas_udf job
runs ~20 ms over the JVM floor, but a trivial 32-task pandas_udf job
holds ~0.23 s steady-state vs ~0.074 s JVM — something serializes
~60 ms/task across CONCURRENT tasks).

Measurements (all steady-state min-of-N on a warm session):
  jvm_Ntask        — pure-JVM N-task job (the scheduling floor)
  arrow_Ntask      — trivial pandas_udf (ArrowEvalPython) N-task job
  pickle_Ntask     — trivial @udf (BatchEvalPython / pickled rows)
  arrow_timeline   — per-task (pid, udf_enter, udf_exit) wall times
                     relative to job submit: if udf_enter staggers
                     linearly across tasks, the serialization is BEFORE
                     user code (runner/worker handshake); if enters are
                     simultaneous, it is after (result/accumulator path)
  reuse check      — distinct worker pids across repeated jobs (worker
                     reuse must hold them constant)

Usage: PYTHONPATH=. python tools/profile_pyrunner.py [--cpus 32]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

# module-level: pandas_udf resolves the (stringified, PEP 563) type
# hints against the function's __globals__, so `pd` must live here, not
# inside main()
import pandas as pd  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def steady(fn, reps: int = 6) -> float:
    fn()  # warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 4)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--reps", type=int, default=6)
    args = ap.parse_args()

    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf, udf

    from oxbow_spark.session import get_spark

    spark = get_spark("pyrunner_probe", cpus=args.cpus,
                      shuffle_partitions=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    @pandas_udf("long")
    def triv_arrow(s: pd.Series) -> pd.Series:
        return s

    @udf("long")
    def triv_pickle(x):
        return x

    out: dict = {"cpus": args.cpus,
                 "loadavg_start": round(os.getloadavg()[0], 2)}

    for n in (1, 8, 32):
        base = spark.range(0, n, 1, n)
        out[f"jvm_{n}task"] = steady(
            lambda b=base: b.select((F.col("id") + 1).alias("x"))
            .write.format("noop").mode("overwrite").save(), args.reps)
        out[f"arrow_{n}task"] = steady(
            lambda b=base: b.select(triv_arrow("id").alias("x"))
            .write.format("noop").mode("overwrite").save(), args.reps)
        out[f"pickle_{n}task"] = steady(
            lambda b=base: b.select(triv_pickle("id").alias("x"))
            .write.format("noop").mode("overwrite").save(), args.reps)

    # --- per-task timeline: when does user code actually start? ---
    @pandas_udf("struct<pid:long, enter:double, exit:double>")
    def stamp(s: pd.Series) -> pd.DataFrame:
        enter = time.time()
        # trivial work
        _ = s.sum()
        return pd.DataFrame({"pid": [os.getpid()] * len(s),
                             "enter": [enter] * len(s),
                             "exit": [time.time()] * len(s)})

    n = args.cpus
    base = spark.range(0, n, 1, n)
    df = base.select(stamp("id").alias("t"))
    df.write.format("noop").mode("overwrite").save()  # warm
    timelines = []
    pidsets = []
    for _ in range(3):
        t0 = time.time()
        rows = df.select("t.pid", "t.enter", "t.exit").collect()
        enters = sorted(round(r["enter"] - t0, 4) for r in rows)
        exits = sorted(round(r["exit"] - t0, 4) for r in rows)
        pidsets.append(sorted({r["pid"] for r in rows}))
        timelines.append({"enter_min": enters[0], "enter_med":
                          enters[len(enters) // 2], "enter_max": enters[-1],
                          "exit_max": exits[-1],
                          "wall": round(time.time() - t0, 4),
                          "enters": enters})
    out["timeline_trials"] = timelines
    out["n_distinct_worker_pids_per_trial"] = [len(p) for p in pidsets]
    out["pids_stable_across_trials"] = (pidsets[0] == pidsets[-1])

    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
