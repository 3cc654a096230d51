"""At-scale A/B for bm25's scale-conditional base persist (VERDICT r15
#3/#4): above one scan split the three-consumer plan re-reads and
re-tokenizes the corpus three times; the persist trades one
InMemoryTableScan write for two of those scans. Measured r15 at sf0.1
(sub-split): persist LOSES (0.85 -> 1.02-1.26 s), so the branch derives
from input size and this tool proves the flip at real sizes.

Interleaved min-of-N, noop sink, cache cleared between trials.

Usage: PYTHONPATH=. python tools/bench_bm25_persist.py \
          --sf-dir /tmp/oxbow_scale/sf100 [--cpus 32] [--trials 3]
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

# same query vocabulary as the bm25_topk_docs bench row
TERMS = ["query", "spark", "table"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--trials", type=int, default=3)
    args = ap.parse_args()

    from oxbow_spark.operators import text
    from oxbow_spark.queries import registry
    from oxbow_spark.session import get_spark

    spark = get_spark("bm25_persist_ab", cpus=args.cpus,
                      shuffle_partitions=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    docs = registry._t(spark, args.sf_dir, "documents")
    auto = text._input_exceeds_one_split(docs,
                                          floor_bytes=8 * 1024 * 1024)

    best = {"persist": float("inf"), "no_persist": float("inf")}
    for trial in range(args.trials + 1):
        for name, flag in (("no_persist", False), ("persist", True)):
            t0 = time.perf_counter()
            df = text.bm25_topk(docs, TERMS, k=10, persist_base=flag)
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            if trial > 0:
                best[name] = min(best[name], dt)
            spark.catalog.clearCache()
    print(json.dumps({
        "sf_dir": args.sf_dir, "cpus": args.cpus, "trials": args.trials,
        "auto_threshold_would_persist": bool(auto),
        "sec": {k: round(v, 3) for k, v in best.items()},
        "persist_over_no_persist": round(
            best["persist"] / best["no_persist"], 3),
        "loadavg": round(os.getloadavg()[0], 2)}))
    spark.stop()


if __name__ == "__main__":
    main()
