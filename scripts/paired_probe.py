#!/usr/bin/env python
"""Probe-gated same-mood scaling pair (companion to scaling_run.py).

This VM's CPU steal moves 2-3x within hours, so a fixed-schedule
scaling run can land its two legs in different host moods and measure
the weather instead of the engine.  This tool inverts the protocol:
keep running the HIGH leg until one run beats ``--gate`` (evidence of
a clean patch), then IMMEDIATELY run the LOW leg inside the same
patch, and report that adjacent pair's efficiency.  All runs are
printed; the pair is only as good as the patch lasting ~5 minutes,
which the raw numbers let a reader judge.

Usage: python scripts/paired_probe.py [--low 8] [--high 32]
       [--gate 115] [--tries 4] [--pages 240000]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_at(cpus: int, pages: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus),
               BENCH_PAGES=str(pages), BENCH_SKIP_QUERIES="1",
               BENCH_CRAWL_REPEATS="1")
    out = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                         env=env, capture_output=True, text=True,
                         timeout=3600)
    if out.returncode != 0:
        raise RuntimeError(
            f"bench.py failed at local[{cpus}] (rc={out.returncode}):\n"
            f"{out.stderr.strip()[-2000:]}"
        )
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(
            f"bench.py at local[{cpus}] printed no JSON line; stdout tail:\n"
            f"{out.stdout.strip()[-2000:]}"
        )
    return json.loads(lines[-1])["crawl"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    ap.add_argument("--gate", type=float, default=115.0,
                    help="high-leg rounds_sec below this = clean patch")
    ap.add_argument("--tries", type=int, default=4)
    ap.add_argument("--pages", type=int, default=240000)
    args = ap.parse_args()

    for i in range(args.tries):
        hi = run_at(args.high, args.pages)
        print(f"[pair] local[{args.high}] try {i}: rounds "
              f"{hi['rounds_sec']}s steady {hi['pages_per_sec_steady']}",
              flush=True)
        if hi["rounds_sec"] < args.gate:
            lo = run_at(args.low, args.pages)
            print(f"[pair] local[{args.low}] (same patch): rounds "
                  f"{lo['rounds_sec']}s steady "
                  f"{lo['pages_per_sec_steady']}", flush=True)
            lo_steady = lo["pages_per_sec_steady"] or float("nan")
            hi_steady = hi["pages_per_sec_steady"] or float("nan")
            eff = (hi_steady / lo_steady) / (args.high / args.low)
            print(json.dumps({
                "paired": True, "low": lo, "high": hi,
                "efficiency_steady": round(eff, 4),
            }))
            return
    print(json.dumps({"paired": False,
                      "reason": f"no high-leg run beat {args.gate}s "
                                f"in {args.tries} tries"}))


if __name__ == "__main__":
    main()
