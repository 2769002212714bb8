#!/usr/bin/env python
"""Real-HTTP fetch-stage throughput probe (S3/O3 evidence) →
BENCH/HTTP_FETCH.md.

The bench crawl measures the table-join fetch (the sandbox's
no-network path); this probe measures the OTHER S3 implementation —
`http_fetcher`'s Arrow-batched mapInPandas drain — against an
in-process loopback `ThreadingHTTPServer` with a fixed per-request
hold (simulated network RTT), so the orchestration itself is what's
timed: host-repartitioned tasks, per-host politeness semaphores,
cross-host round-robin interleave, bounded thread pools.

Each cell runs in its own subprocess (fresh JVM + fresh server farm).
URLs spread across 64 loopback hosts (127.0.0.x aliases); the crawl
wiring is mirrored exactly: repartition by host, one host's URLs
drain on one task at ≤ per_host in flight.  The server side is a FARM
of independent server processes (hosts sharded across them) — a
single ThreadingHTTPServer is GIL-bound near ~1k requests/s, which
would cap the measurement at exactly the point where the client
orchestration starts to matter (observed: the single-server draft of
this probe pinned every local[32] cell at 840-990 pages/s regardless
of per_host).

Theoretical ceiling per cell = running_tasks × per_host / hold; the
probe reports measured pages/s against it.  The parallelism pair
(local[8] vs local[32], same cell) is the IO-stage leg of the
north-rule scaling evidence — unlike the byte-moving stages this one
does not touch the memory bus, so it should (and does) scale with
worker threads.

Usage: python scripts/http_fetch_probe.py [--n 24000] [--hosts 64]
       [--hold-ms 40] [--smoke]
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import json, os, subprocess, sys, time

sys.path.insert(0, os.environ["PROBE_REPO"])

n = int(os.environ["PROBE_N"])
hosts = int(os.environ["PROBE_HOSTS"])
hold_s = float(os.environ["PROBE_HOLD_MS"]) / 1000.0
cpus = int(os.environ["PROBE_CPUS"])
conc = int(os.environ["PROBE_CONC"])
per_host = int(os.environ["PROBE_PER_HOST"])
n_servers = int(os.environ["PROBE_SERVERS"])

from doccrawler_spark.loopback_farm import (
    STATIC_SERVER_SRC, spawn_farm, stop_farm, host_of as _farm_host)

# server FARM: shard the host identities across independent server
# processes so the GIL of any one server never caps the client side
servers, ports = spawn_farm(STATIC_SERVER_SRC, n_servers,
                            lambda _s: [hold_s])


def host_of(i):
    return _farm_host(i, hosts, ports)


try:
    from pyspark.sql import functions as F
    from doccrawler_spark.session import get_spark
    from doccrawler_spark.fetch import HttpFetchConfig, http_fetcher

    spark = get_spark(app_name=f"http_probe_{cpus}",
                      master=f"local[{cpus}]", shuffle_partitions=hosts)

    rows = [(f"http://{host_of(i)}/page/{i}", host_of(i))
            for i in range(n)]
    df = spark.createDataFrame(rows, "url string, host string")
    fetch = http_fetcher(HttpFetchConfig(
        backend="urllib", concurrency=conc, per_host=per_host,
        timeout_s=60, retries=0,
    ))

    # untimed warm-up: Python-worker import + first connections
    warm = spark.createDataFrame(rows[:256], "url string, host string")
    fetch(warm.repartition(hosts, F.col("host")).select("url")).count()

    t0 = time.time()
    got = (fetch(df.repartition(hosts, F.col("host")).select("url"))
           .agg(F.count("*").alias("n"),
                F.sum(F.when(F.col("html").isNull(), 1).otherwise(0))
                .alias("misses"),
                F.sum(F.length("html")).alias("bytes")).collect()[0])
    dt = time.time() - t0
finally:
    stop_farm(servers)
assert got["n"] == n and got["misses"] == 0, (got["n"], got["misses"])
print("PROBEJSON " + json.dumps({
    "fetch_sec": round(dt, 2),
    "pages_per_sec": round(n / dt, 1),
    "mb_per_sec": round(got["bytes"] / dt / 1e6, 1),
}))
"""


def run_cell(cpus: int, conc: int, per_host: int, n: int, hosts: int,
             hold_ms: float, n_servers: int = 12) -> dict:
    env = dict(os.environ, PROBE_REPO=REPO, PROBE_N=str(n),
               PROBE_HOSTS=str(hosts), PROBE_HOLD_MS=str(hold_ms),
               PROBE_CPUS=str(cpus), PROBE_CONC=str(conc),
               PROBE_PER_HOST=str(per_host),
               PROBE_SERVERS=str(n_servers))
    r = subprocess.run([sys.executable, "-c", _WORKER], env=env,
                       capture_output=True, text=True, timeout=1800)
    for line in r.stdout.splitlines():
        if line.startswith("PROBEJSON "):
            out = json.loads(line[len("PROBEJSON "):])
            out.update(cpus=cpus, concurrency=conc, per_host=per_host)
            # the politeness ceiling this wiring can never exceed:
            # every running task serves one host at ≤ per_host in
            # flight, each request held hold_ms at the server
            out["ceiling_pages_per_sec"] = round(
                min(cpus, hosts) * per_host / (hold_ms / 1000.0), 1)
            return out
    raise RuntimeError(
        f"probe worker failed:\n{r.stdout[-2000:]}\n{r.stderr[-2000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=24000)
    ap.add_argument("--hosts", type=int, default=64)
    ap.add_argument("--hold-ms", type=float, default=40.0)
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH",
                                                  "HTTP_FETCH.md"))
    args = ap.parse_args()

    if args.smoke:
        cell = run_cell(8, 8, 4, 512, 16, 10.0, n_servers=4)
        print(f"[http-probe] SMOKE ok: {cell}")
        return

    # (cpus, concurrency, per_host): the 8→32 pair is the IO-stage
    # scaling leg; the per_host sweep shows the politeness cap, not
    # the pool, bounding throughput.  The per_host=8 cell gets a
    # 16-thread pool so a hash-collision partition holding two hosts
    # is politeness-capped, not pool-capped.
    cells = [(8, 8, 4), (32, 8, 4), (32, 8, 2), (32, 16, 8)]
    rows = []
    for cpus, conc, ph in cells:
        cell = run_cell(cpus, conc, ph, args.n, args.hosts, args.hold_ms)
        rows.append(cell)
        print(json.dumps(cell), flush=True)

    pair = {c["cpus"]: c for c in rows if c["per_host"] == 4}
    eff = round((pair[32]["pages_per_sec"] / pair[8]["pages_per_sec"])
                / (32 / 8), 3)
    util = {cp: round(c["pages_per_sec"] / c["ceiling_pages_per_sec"], 2)
            for cp, c in pair.items()}
    lines = [
        f"# Real-HTTP fetch-stage throughput "
        f"(`scripts/http_fetch_probe.py`, {datetime.date.today()})",
        "",
        f"{args.n:,} URLs across {args.hosts} loopback hosts sharded "
        "over a 12-process server farm (a single GIL-bound server "
        f"caps near ~1k pages/s), {args.hold_ms:.0f} ms simulated RTT "
        "per request, urllib backend, crawl wiring (host repartition "
        "→ one host per task at ≤ per_host in flight, cross-host "
        "interleaved drain).  Each cell is a fresh JVM + fresh farm; "
        "an untimed 256-URL warm-up precedes the timed fetch; zero "
        "misses asserted.  The ceiling is the ideal "
        "one-host-per-task figure min(N, hosts)·per_host/RTT; hash "
        "collisions in the host repartition can locally exceed it "
        "(a task holding two hosts legally runs 2·per_host in "
        "flight).",
        "",
        "| local[N] | concurrency | per_host | fetch s | pages/s "
        "| politeness ceiling pages/s |",
        "|---|---|---|---|---|---|",
    ]
    for c in rows:
        lines.append(
            f"| {c['cpus']} | {c['concurrency']} | {c['per_host']} "
            f"| {c['fetch_sec']} | {c['pages_per_sec']:,} "
            f"| {c['ceiling_pages_per_sec']:,} |")
    lines += [
        "",
        f"8→32 scaling efficiency at per_host=4: **{eff}** "
        "(pages/s ratio ÷ core ratio).  Each leg's honest bound is "
        f"its OWN politeness ceiling — utilization local[8] "
        f"{util[8]}, local[32] {util[32]}: when the low leg sits at "
        "or above its ceiling (politeness-capped, with collision "
        "slack), the pair efficiency understates pure "
        "thread-scaling.  The fetch stage is "
        "IO-orchestration, not byte-moving — it holds open sockets and "
        "sleeps on politeness semaphores — so unlike the scan/extract "
        "stages it does not compete for the single box's memory bus, "
        "and parallelism-level scaling is limited only by how many "
        "host-partitions run concurrently.  The per_host sweep shows "
        "the POLITENESS CAP bounding throughput (pages/s tracks "
        "per_host, not pool size): on a real cluster, fetch throughput "
        "= hosts-in-flight × per_host ÷ RTT, scaled across executors "
        "by partitioning the host space — exactly this wiring.",
    ]
    with open(args.out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
