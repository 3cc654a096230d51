"""Round-over-round quiet-bench envelope (VERDICT r11 item 6, pinned).

Runs bench.py twice (min-of-5 trials at cpus=32 and cpus=8, sf0.1),
loads the most recent BENCH_QUIET_r*.json as the reference envelope,
prints per-query ratios against it, and writes the new envelope to
BENCH_QUIET_r{N}.json. Run on an IDLE host (check `uptime` first —
the r11 finding was that host load masquerades as regression; judge
deltas against the cpus=8 column, which is far less scheduling-noisy
than local[32] on sf0.1's tiny tasks).

Usage: python tools/bench_quiet.py --round 13 [--trials 5]
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def wait_for_idle(threshold: float, timeout: float) -> dict:
    """Spin-wait until the 1-min load drops below ``threshold`` (VERDICT
    r14 'What's wrong' #1: the envelope RECORDED load but did not GATE
    on it, so an ambient ~2.2 window polluted a whole round's cpus8
    ratios). Returns a record of what happened; if the host never goes
    quiet within ``timeout`` seconds the caller proceeds anyway and the
    JSON carries gate_met=false — a flagged envelope beats no envelope,
    and the per-trial load samples still adjudicate individual rows."""
    t0 = time.time()
    load = os.getloadavg()[0]
    waited = 0.0
    while load > threshold and (time.time() - t0) < timeout:
        time.sleep(15)
        waited = round(time.time() - t0, 1)
        load = os.getloadavg()[0]
    return {"threshold": threshold, "final_load": round(load, 2),
            "waited_sec": waited, "gate_met": load <= threshold}


def run_bench(cpus: int, trials: int, sf_dir: str) -> dict:
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR=sf_dir,
               SPARK_GRAFT_CPUS=str(cpus),
               SPARK_GRAFT_TRIALS=str(trials))
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, check=True).stdout
    slim = json.loads(out.strip().splitlines()[-1])
    # r15: bench.py's stdout line is slim (the driver's tail capture
    # truncated the old diagnostics-laden line — BENCH_r10-r14 all show
    # parsed: null); the per-trial spread/loadavg/jobs detail the
    # envelope archives lives in the sidecar bench.py writes.
    try:
        detail = json.load(open(os.path.join(REPO, "bench_detail_last.json")))
        if detail.get("queries") == slim.get("queries"):
            return detail
    except (OSError, ValueError):
        pass
    return slim


def run_op_smoke(trials: int) -> dict:
    """Fixed-size operator probes (gc_windows sliding / getfasta auto /
    repetition+filter) — the SCALE.md regimes the headline bench's tiny
    rows cannot cover (tools/bench_op_smoke.py)."""
    env = dict(os.environ, PYTHONPATH=REPO)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "bench_op_smoke.py"),
         "--trials", str(trials)],
        env=env, capture_output=True, text=True, check=True).stdout
    return json.loads(out.strip().splitlines()[-1])


def latest_envelope(before_round: int):
    best = None
    for p in glob.glob(os.path.join(REPO, "BENCH_QUIET_r*.json")):
        m = re.search(r"r(\d+)\.json$", p)
        if m and int(m.group(1)) < before_round:
            if best is None or int(m.group(1)) > best[0]:
                best = (int(m.group(1)), p)
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--trials", type=int, default=5)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--idle-threshold", type=float, default=0.5,
                    help="1-min load the host must drop below before "
                         "each width's trials start")
    ap.add_argument("--idle-timeout", type=float, default=900.0)
    args = ap.parse_args()

    gates = [wait_for_idle(args.idle_threshold, args.idle_timeout)]
    load1 = os.getloadavg()[0]
    q32 = run_bench(32, args.trials, args.sf_dir)
    load_mid = os.getloadavg()[0]
    gates.append(wait_for_idle(args.idle_threshold, args.idle_timeout))
    q8 = run_bench(8, args.trials, args.sf_dir)
    load_post = os.getloadavg()[0]
    gates.append(wait_for_idle(args.idle_threshold, args.idle_timeout))
    smoke = run_op_smoke(min(args.trials, 2))

    ref = latest_envelope(args.round)
    ratios = {}
    smoke_ratios = {}
    if ref:
        prev = json.load(open(ref[1]))
        prev32 = prev["runs"]["cpus32_trials5"]["queries"]
        prev8 = prev["runs"]["cpus8_trials5"]["queries"]
        for k, v in q32["queries"].items():
            r32 = round(v / prev32[k], 2) if prev32.get(k) else None
            v8 = q8["queries"].get(k)
            r8 = round(v8 / prev8[k], 2) if v8 and prev8.get(k) else None
            ratios[k] = {"cpus32": r32, "cpus8": r8}
            print(f"{k:28s} r32={r32} r8={r8}", flush=True)
        prev_smoke = prev.get("op_smoke", {}).get("queries", {})
        prev_calib = prev.get("op_smoke", {}).get("ratio_vs_calib", {})
        now_calib = smoke.get("ratio_vs_calib", {})
        for k, v in smoke["queries"].items():
            r = round(v / prev_smoke[k], 2) if prev_smoke.get(k) else None
            # drift-robust comparison: probe/calibration ratio this round
            # vs last round (host speed cancels; VERDICT r15 #6 — judge
            # the probes by THIS, not by absolute seconds)
            rc = (round(now_calib[k] / prev_calib[k], 2)
                  if now_calib.get(k) and prev_calib.get(k) else None)
            smoke_ratios[k] = {"abs": r, "vs_calib": rc}
            print(f"[op_smoke] {k:28s} {v}s r_abs={r} r_calib={rc}",
                  flush=True)

    out = {
        "purpose": (f"Round {args.round} quiet-window envelope: min-of-"
                    f"{args.trials} idle-host runs at cpus=32 and cpus=8, "
                    f"sf0.1 (1-min load {load1:.2f} before start), ratios "
                    f"vs {os.path.basename(ref[1]) if ref else 'none'}. "
                    "Judge deltas against the cpus=8 column; each run's "
                    "spread now carries PER-TRIAL loadavg + job counts "
                    "(VERDICT r13 #2 — a contended window adjudicates "
                    "itself instead of needing a cross-reference)."),
        "loadavg": {"start": round(load1, 2), "after_cpus32":
                    round(load_mid, 2), "after_cpus8": round(load_post, 2)},
        "idle_gate": {"before_cpus32": gates[0], "before_cpus8": gates[1],
                      "before_op_smoke": gates[2]},
        "runs": {"cpus32_trials5": q32, "cpus8_trials5": q8},
        "ratios_vs_prev": ratios,
        "op_smoke": smoke,
        "op_smoke_ratios_vs_prev": smoke_ratios,
    }
    dest = os.path.join(REPO, f"BENCH_QUIET_r{args.round}.json")
    json.dump(out, open(dest, "w"), indent=1)
    print("wrote", dest)


if __name__ == "__main__":
    main()
