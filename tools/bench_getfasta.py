"""Micro-benchmark for getfasta_intervals tile sizing on a ~100 Mbp
genome: the round-11 cost model says the tiled join's compute is
≈ n_intervals × (tile_bp + interval_len) bytes of memcpy, so the right
tile width tracks the interval length. Round 12 auto-sizes tile_bp
from percentile_approx(interval_len) (`nuc._auto_tile_bp`); this
script checks the auto pick is ≥ parity with hand-tuned tiles on both
regimes the docstring used to ask callers to tune by hand:

- SHORT: 200k × ~100 bp intervals (the 64 KiB-optimum stress)
- LONG: 200 × ~2 Mbp intervals (the raise-toward-1-MiB stress)

Usage: python tools/bench_getfasta.py [--trials 2] [--genome-mbp 100]
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
    return block * (n_bp // b) + block[: n_bp % b]


def timed(df, trials: int) -> float:
    best = float("inf")
    for _ in range(trials):
        t0 = time.monotonic()
        # aggregate the sliced sequence itself — count(*) alone lets
        # Catalyst prune iv_seq and measure only the explode
        df.groupBy().agg(F.count("*"), F.sum(F.length("iv_seq"))).collect()
        best = min(best, time.monotonic() - t0)
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--genome-mbp", type=int, default=100)
    ap.add_argument("--n-contigs", type=int, default=10)
    args = ap.parse_args()

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "16g")
        .appName("bench_getfasta")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from oxbow_spark.operators.nuc import _auto_tile_bp, getfasta_intervals

    clen = args.genome_mbp * 1_000_000 // args.n_contigs
    seqs = spark.createDataFrame(
        [(f"c{i}", make_contig(clen, seed=i)) for i in range(args.n_contigs)],
        "name string, seq string").persist()
    seqs.count()
    rng = random.Random(13)

    def iv_frame(n, lo, hi):
        rows = []
        for i in range(n):
            c = f"c{rng.randrange(args.n_contigs)}"
            ln = rng.randrange(lo, hi)
            st = rng.randrange(0, max(1, clen - ln))
            rows.append((c, st, st + ln))
        return spark.createDataFrame(
            rows, "chrom string, start long, end long").persist()

    stresses = {
        "short_200k_x_100bp": (iv_frame(200_000, 50, 150),
                               [1 << 16, 1 << 20]),
        "long_200_x_2Mbp": (iv_frame(200, 1_500_000, 2_500_000),
                            [1 << 16, 1 << 20, 1 << 22]),
    }
    out = {}
    for name, (iv, hand) in stresses.items():
        iv.count()
        auto_tb = _auto_tile_bp(iv, "start", "end")
        row = {"auto_tile_bp": auto_tb}
        # warm once (JIT/codegen) before any timed trial
        timed(getfasta_intervals(iv, seqs, tile_bp=hand[0]), 1)
        for tb in hand:
            row[f"tile_{tb}"] = timed(
                getfasta_intervals(iv, seqs, tile_bp=tb), args.trials)
        row["auto"] = timed(
            getfasta_intervals(iv, seqs, tile_bp=None), args.trials)
        out[name] = row
        print(json.dumps({name: row}), flush=True)
        iv.unpersist()
    print(json.dumps({"genome_mbp": args.genome_mbp, "results": out}))


if __name__ == "__main__":
    main()
