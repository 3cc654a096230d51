"""Micro-benchmark for gc_windows formulations on multi-Mbp contigs.

Round-11 verdict follow-up: the shipped plain path (count structs built
inside one F.transform) degrades super-linearly above ~1 Mbp because
higher-order functions are interpreted and every reference to the outer
BINARY column pays a full UnsafeRow.getBinary copy per element.  This
script measures the shipped path, the explode-then-slice restructure
(whole-stage codegen, binary stays a JVM local), and the tiled path at
1/3/10/30/100 Mbp so SCALE.md rows are measured, not guessed.

Usage: python tools/bench_gc_windows.py [--sizes 1,3,10] [--trials 2]
"""
from __future__ import annotations

import argparse
import json
import random
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def make_contig(n_bp: int, seed: int = 7) -> str:
    rng = random.Random(seed)
    block = "".join(rng.choice("ACGTN") for _ in range(min(n_bp, 1 << 16)))
    b = len(block)
    # exact length: block repeats plus the remainder slice (the old
    # floor-division form left a 1 Mbp request 1.7% short, skewing
    # the per-Mbp rows recorded into SCALE.md)
    return block * (n_bp // b) + block[: n_bp % b]


def timed(df, trials: int) -> float:
    best = float("inf")
    for _ in range(trials):
        t0 = time.monotonic()
        df.groupBy().agg(F.count("*"), F.sum("gc_frac")).collect()
        best = min(best, time.monotonic() - t0)
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="1,3,10")
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--window", type=int, default=1000)
    ap.add_argument("--step", type=int, default=0, help="0 = tumbling")
    ap.add_argument("--paths", default="plain,tiled,auto")
    args = ap.parse_args()

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "16g")
        .appName("bench_gc_windows")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from oxbow_spark.operators import nuc

    step = args.step or args.window
    paths = args.paths.split(",")
    out = {}
    for mbp in [float(s) for s in args.sizes.split(",")]:
        n = int(mbp * 1_000_000)
        df = spark.createDataFrame(
            [("c1", make_contig(n))], "name string, sequence string"
        )
        df = df.persist()
        df.count()
        row = {}
        if "plain" in paths:
            row["plain"] = timed(
                nuc.gc_windows(df, args.window, step, plain_max_bp=None),
                args.trials)
        if "tiled" in paths:
            row["tiled"] = timed(
                nuc.gc_windows(df, args.window, step, tile_bp=1 << 20),
                args.trials)
        if "auto" in paths:
            row["auto"] = timed(nuc.gc_windows(df, args.window, step),
                                args.trials)
        df.unpersist()
        out[f"{mbp}Mbp"] = row
        print(json.dumps({f"{mbp}Mbp": row}), flush=True)
    print(json.dumps({"window": args.window, "step": step, "results": out}))


if __name__ == "__main__":
    main()
