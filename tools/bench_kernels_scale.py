"""At-scale A/B of the Arrow-kernel vs JVM-expression formulations
(VERDICT r15 next-round #2: the r15 kernels were only ever measured at
sf0.1, where the ~60 ms/task boundary overhead dominates 150-doc batches;
their entire at-scale claim — "the win grows with rows/task" — was
extrapolation. This measures it on real-sized tasks so the
`shingle_stage(kernel=)` / `simhash(kernel=)` defaults can be flipped, or
kept, on evidence).

Interleaved trials (kernel and expression alternate within each trial
round) so host drift hits both arms equally; min-of-N per arm; noop sink.

Usage: PYTHONPATH=. python tools/bench_kernels_scale.py \
          --sf-dir /tmp/oxbow_scale/sf10 [--cpus 32] [--trials 3]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--trials", type=int, default=3)
    args = ap.parse_args()

    from oxbow_spark.operators import dedup, text
    from oxbow_spark.queries import registry
    from oxbow_spark.session import get_spark

    spark = get_spark("kernels_scale", cpus=args.cpus,
                      shuffle_partitions=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    docs = registry._tp(spark, args.sf_dir, "documents")

    cases = {
        "minhash_sig_kernel": lambda: dedup.minhash_signatures(
            docs, kernel=True),
        "minhash_sig_jvm": lambda: dedup.minhash_signatures(
            docs, kernel=False),
        "shingle_set_kernel": lambda: dedup.shingle_stage(
            docs, kernel=True),
        "shingle_set_jvm": lambda: dedup.shingle_stage(
            docs, kernel=False),
        "simhash_kernel": lambda: dedup.simhash(docs, kernel=True),
        "simhash_jvm": lambda: dedup.simhash(docs, kernel=False),
        "repetition_kernel": lambda: text.repetition_stats(
            docs, kernel=True),
        "repetition_jvm": lambda: text.repetition_stats(
            docs, kernel=False),
    }

    sc = spark.sparkContext
    best: dict[str, float] = {k: float("inf") for k in cases}
    loads: list[float] = []
    for trial in range(args.trials + 1):  # trial 0 = untimed warmup
        loads.append(round(os.getloadavg()[0], 2))
        for name, build in cases.items():
            sc.setJobDescription(f"kernels-scale {name} t{trial}")
            t0 = time.perf_counter()
            build().write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            if trial > 0:
                best[name] = min(best[name], dt)
            spark.catalog.clearCache()
    out = {k: round(v, 3) for k, v in best.items()}
    ratios = {}
    for op in ("minhash_sig", "shingle_set", "simhash", "repetition"):
        k, j = out[f"{op}_kernel"], out[f"{op}_jvm"]
        ratios[op] = round(k / j, 3)
    print(json.dumps({"sf_dir": args.sf_dir, "cpus": args.cpus,
                      "trials": args.trials, "sec": out,
                      "kernel_over_jvm": ratios,
                      "loadavg": loads}))
    spark.stop()


if __name__ == "__main__":
    main()
