#!/usr/bin/env python
"""Probe-gated scaling campaign: same-mood low→high pair PLUS a full
driver-style bench captured back-to-back inside the same clean patch.

Extends scripts/paired_probe.py (r5) per the r6 verdict: a fired gate
must bank not just the adjacent pair but also a full `bench.py` run
(queries included, driver defaults) so the round's bench artifact has
a same-window twin measured under the documented protocol.

Sequence per try: HIGH leg (crawl only).  If its rounds_sec beats
``--gate`` → LOW leg immediately → full bench at ``--bench-cpus``
(queries on, single crawl repeat to stay inside the patch) → write
everything to ``--out`` and exit 0.  Exhausted tries exit 0 with
``paired: false`` (raw legs still logged for the BASELINE.md record).

Usage: python scripts/campaign.py [--low 8] [--high 16] [--gate 100]
       [--tries 8] [--pages 240000] [--bench-cpus 32]
       [--out BENCH/campaign_r7.json]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(cpus: int, pages: int | None = None, *,
              skip_queries: bool = True, repeats: int = 1) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus),
               BENCH_CRAWL_REPEATS=str(repeats))
    if skip_queries:
        env["BENCH_SKIP_QUERIES"] = "1"
    else:
        env.pop("BENCH_SKIP_QUERIES", None)
    if pages is not None:
        env["BENCH_PAGES"] = str(pages)
    out = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                         env=env, capture_output=True, text=True,
                         timeout=3600)
    if out.returncode != 0:
        raise RuntimeError(
            f"bench.py failed at local[{cpus}] (rc={out.returncode}):\n"
            f"{out.stderr.strip()[-2000:]}")
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(
            f"bench.py at local[{cpus}] printed no JSON; stdout tail:\n"
            f"{out.stdout.strip()[-2000:]}")
    return json.loads(lines[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=16)
    ap.add_argument("--gate", type=float, default=100.0)
    ap.add_argument("--tries", type=int, default=8)
    ap.add_argument("--pages", type=int, default=240000)
    ap.add_argument("--bench-cpus", type=int, default=32)
    ap.add_argument("--bench-first", action="store_true",
                    help="run the full bench immediately after the "
                         "gate fires, before the low pair leg")
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH",
                                                  "campaign_r7.json"))
    args = ap.parse_args()

    raw_high: list[float] = []
    for i in range(args.tries):
        t0 = time.time()
        hi = run_bench(args.high, args.pages)["crawl"]
        raw_high.append(hi["rounds_sec"])
        print(f"[campaign] {time.strftime('%H:%M:%S')} local[{args.high}] "
              f"try {i}: rounds {hi['rounds_sec']}s steady "
              f"{hi['pages_per_sec_steady']} (leg {time.time()-t0:.0f}s)",
              flush=True)
        if hi["rounds_sec"] >= args.gate:
            continue

        def _full():
            print(f"[campaign] {time.strftime('%H:%M:%S')} full bench "
                  f"local[{args.bench_cpus}] (same patch)...", flush=True)
            return run_bench(args.bench_cpus, pages=None,
                             skip_queries=False, repeats=1)

        # --bench-first: the full bench's crawl leg is the scarcest
        # artifact (r7-A's ran last and caught the patch closing) —
        # run it immediately after the gate fires, pair leg second
        full = _full() if args.bench_first else None
        lo = run_bench(args.low, args.pages)["crawl"]
        print(f"[campaign] {time.strftime('%H:%M:%S')} local[{args.low}] "
              f"(same patch): rounds {lo['rounds_sec']}s steady "
              f"{lo['pages_per_sec_steady']}", flush=True)
        eff = ((hi["pages_per_sec_steady"] or float("nan"))
               / (lo["pages_per_sec_steady"] or float("nan"))
               / (args.high / args.low))
        print(f"[campaign] paired efficiency {args.low}->{args.high}: "
              f"{eff:.4f}", flush=True)
        if full is None:
            full = _full()
        result = {"paired": True, "low": lo, "high": hi,
                  "efficiency_steady": round(eff, 4),
                  "gate": args.gate, "raw_high_rounds_sec": raw_high,
                  "full_bench_same_patch": full,
                  "captured_at": time.strftime("%Y-%m-%dT%H:%M:%S")}
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
        print(json.dumps({k: v for k, v in result.items()
                          if k != "full_bench_same_patch"}), flush=True)
        print(json.dumps(full), flush=True)
        return
    print(json.dumps({"paired": False, "gate": args.gate,
                      "raw_high_rounds_sec": raw_high,
                      "reason": f"no local[{args.high}] leg beat "
                                f"{args.gate}s in {args.tries} tries"}),
          flush=True)


if __name__ == "__main__":
    main()
