"""Scale-decade measurement (VERDICT r12 item 2): run the headline
bench at two scale factors produced by ONE generator (`tools/gen_sf.py`)
and record the per-query growth ratio for a 10× data step.

Every 100 TB claim otherwise rests on plan shape plus sf0.1 timings;
one measured decade converts "linear by construction" into "measured
≤ ~linear across 10×" (or surfaces the outlier to diagnose). Run on an
IDLE host (same discipline as tools/bench_quiet.py); each scale runs in
its own fresh process via bench.py (warmup + min-of-N noop writes).

Usage:
  python tools/gen_sf.py --sf 0.1 --out /tmp/oxbow_scale/sf0.1
  python tools/gen_sf.py --sf 1   --out /tmp/oxbow_scale/sf1
  python tools/bench_scale_decade.py --small /tmp/oxbow_scale/sf0.1 \
      --big /tmp/oxbow_scale/sf1 --round 13
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(sf_dir: str, cpus: int, trials: int) -> dict:
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR=sf_dir,
               SPARK_GRAFT_CPUS=str(cpus),
               SPARK_GRAFT_TRIALS=str(trials))
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True)
    if res.returncode != 0:
        # keep the evidence: a failed scale side otherwise discards the
        # subprocess stderr (the r16 sf100 maxResultSize abort cost a
        # full re-run just to SEE the error)
        tail = "\n".join(res.stderr.splitlines()[-40:])
        sys.stderr.write(f"bench.py failed on {sf_dir} (rc={res.returncode}); "
                         f"stderr tail:\n{tail}\n")
        res.check_returncode()
    return json.loads(res.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", required=True)
    ap.add_argument("--big", required=True)
    ap.add_argument("--factor", type=float, default=10.0,
                    help="data ratio big/small (for the verdict line)")
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--cpus", type=int, default=8,
                    help="8 is less scheduling-noisy than 32 on this host")
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--tag", default="", help=(
        "suffix for the output name, e.g. --tag 2 writes "
        "SCALE_DECADE2_r{N}.json (the second measured decade)"))
    args = ap.parse_args()

    load1 = os.getloadavg()[0]
    small = run_bench(args.small, args.cpus, args.trials)
    big = run_bench(args.big, args.cpus, args.trials)

    ratios = {}
    for k, v_small in small["queries"].items():
        v_big = big["queries"].get(k)
        r = round(v_big / v_small, 2) if v_big and v_small else None
        ratios[k] = r
        flag = ""
        if r is not None and r > 1.2 * args.factor:
            flag = "  <-- SUPER-LINEAR"
        print(f"{k:28s} {v_small:8.3f}s -> {v_big:8.3f}s  x{r}{flag}",
              flush=True)

    out = {
        "purpose": (f"Round {args.round} scale decade: bench.py min-of-"
                    f"{args.trials} (plus warmup) at cpus={args.cpus} on "
                    f"{args.small} vs {args.big} ({args.factor:g}x data, "
                    f"one generator: tools/gen_sf.py, seed 42; 1-min load "
                    f"{load1:.2f} before start). ratio <= ~{args.factor:g} "
                    "means the query grew at most linearly across the "
                    "decade."),
        "small": small,
        "big": big,
        "ratio_big_over_small": ratios,
    }
    dest = os.path.join(
        REPO, f"SCALE_DECADE{args.tag}_r{args.round}.json")
    json.dump(out, open(dest, "w"), indent=1)
    print("wrote", dest)


if __name__ == "__main__":
    main()
