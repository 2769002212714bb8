#!/usr/bin/env python
"""Full crawl loop over REAL HTTP at bench scale → BENCH/CRAWL_HTTP.md.

`tests/test_fetch.py::test_crawl_over_real_http` proves the
deployment shape (frontier → host-repartitioned http_fetcher →
extract → discover → snapshots) is seen-set-identical to the
table-join crawl on a tiny web.  This probe runs the SAME shape at
bench scale: the synthetic corpus (`webgen.bench_spec`) is served by
a multi-process loopback server farm and crawled with
`CrawlConfig.fetcher = http_fetcher(...)`, so every page the engine
touches crosses a real socket, a real per-host politeness semaphore,
and the cross-host interleaved urllib drain.  The table-join arm
crawls the identical corpus in the same JVM right after, and the two
arms' crawled-set fingerprints must match exactly.

Wiring details mirrored from the e2e test:
- URLs are hex-tunneled (`/u/<hex(url)>`) so the synthetic
  `https://siteN.example/...` authorities map onto loopback with no
  DNS; the loopback AUTHORITY is derived from the ORIGINAL host
  (127.0.0.x alias), so http_fetcher's per-host cap still binds per
  crawled site, not per tunnel.
- Pages are sharded across the server farm by crc32(HOST) — the same
  expression computes the shard client-side (Spark `F.crc32` over
  `host_col`) and server-side (`zlib.crc32` over the mirrored host
  regex), so each server only holds its sites' pages AND one site maps
  to exactly one netloc — the per-host cap genuinely binds per site
  (an earlier crc32(url) sharding spread each site over every port,
  silently multiplying the politeness cap by the farm size).

Each cell runs in its own subprocess (fresh JVM + fresh farm).
Regenerate: python scripts/crawl_http_probe.py [--pages 24000]
            [--hold-ms 10] [--smoke]
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SERVER = r"""
import glob, re, sys, time, zlib
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

corpus_dir, n_servers, shard, hold_ms = (
    sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), float(sys.argv[4]))
hold_s = hold_ms / 1000.0

import pyarrow.parquet as pq

# shard by crc32(HOST) — the SAME expression the client uses to pick
# the port (doccrawler_spark.functions.host_col regex mirrored here),
# so one site maps to exactly ONE server, i.e. one netloc: the per-host
# politeness semaphore binds per crawled site (sharding by crc32(url)
# split a site over every port and multiplied the cap by the farm size)
_HOST = re.compile(r"^https?://([^/?#\s]+)")

pages = {}
for part in glob.glob(corpus_dir + "/part-*.parquet"):
    t = pq.read_table(part, columns=["url", "html"])
    for url, html in zip(t.column("url").to_pylist(),
                         t.column("html").to_pylist()):
        m = _HOST.match(url)
        host = m.group(1) if m else ""
        if zlib.crc32(host.encode()) % n_servers == shard:
            pages[url] = html if isinstance(html, bytes) else html.encode()


class H(BaseHTTPRequestHandler):
    def do_GET(self):
        if hold_s:
            time.sleep(hold_s)
        if self.path.startswith("/u/"):
            try:
                url = bytes.fromhex(self.path[3:]).decode()
            except ValueError:
                self.send_error(400)
                return
            body = pages.get(url)
            if body is not None:
                self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
        self.send_error(404)

    def log_message(self, *a):
        pass


srv = ThreadingHTTPServer(("0.0.0.0", 0), H)
print(srv.server_address[1], flush=True)
srv.serve_forever()
"""

_WORKER = r"""
import json, os, shutil, subprocess, sys, tempfile, time

sys.path.insert(0, os.environ["PROBE_REPO"])

n_pages = int(os.environ["PROBE_PAGES"])
cpus = int(os.environ["PROBE_CPUS"])
hold_ms = float(os.environ["PROBE_HOLD_MS"])
n_servers = int(os.environ["PROBE_SERVERS"])

from pyspark.sql import functions as F

from doccrawler_spark import functions as Fx
from doccrawler_spark.crawl import CrawlConfig, crawl, crawled_all
from doccrawler_spark.fetch import HttpFetchConfig, http_fetcher
from doccrawler_spark.session import get_spark
from doccrawler_spark.webgen import bench_spec, gen_seeds, generate_web_pages_df

spark = get_spark(app_name=f"crawl_http_{cpus}", master=f"local[{cpus}]",
                  shuffle_partitions=64)

spec = bench_spec(n_pages=n_pages, n_sites=12)
s0 = spec.sites[0]
cache_root = ("/dev/shm/doccrawler_web_cache"
              if os.path.isdir("/dev/shm") else "/tmp/doccrawler_web_cache")
web_path = os.path.join(
    cache_root, f"web_{n_pages}_ts{s0.text_scale}_b{s0.branching}")
if not os.path.exists(os.path.join(web_path, "_SUCCESS")):
    generate_web_pages_df(spark, spec).write.mode("overwrite").parquet(web_path)

from doccrawler_spark.loopback_farm import spawn_farm, stop_farm

servers, ports = spawn_farm(
    os.environ["PROBE_SERVER_SRC"], n_servers,
    lambda shard: [web_path, n_servers, shard, hold_ms])

try:
    inner = http_fetcher(HttpFetchConfig(
        backend="urllib", concurrency=16, per_host=8,
        timeout_s=60, retries=1))
    ports_arr = F.array(*[F.lit(p) for p in ports])

    def rewriting_fetcher(urls):
        # loopback authority from the ORIGINAL host: IP alias AND port
        # both derive from crc32(host), so one site = one netloc and
        # the per-host politeness cap binds per crawled site (a
        # crc32(url) port split one site over the whole farm and
        # multiplied the cap by n_servers)
        host_crc = F.crc32(F.encode(Fx.host_col(F.col("url")), "utf-8"))
        mapped = urls.select(
            F.col("url").alias("orig"),
            F.concat(
                F.lit("http://127.0.0."),
                (F.pmod(host_crc, F.lit(64)) + 1).cast("string"),
                F.lit(":"),
                F.element_at(
                    ports_arr,
                    (F.pmod(host_crc, F.lit(n_servers)) + 1).cast("int")
                ).cast("string"),
                F.lit("/u/"),
                F.hex(F.encode(F.col("url"), "utf-8")),
            ).alias("url"),
        )
        got = inner(mapped.select("url"))
        return mapped.join(got, "url").select(
            F.col("orig").alias("url"),
            "html", "status", "error", "elapsed_ms")

    web = spark.read.parquet(web_path)
    seeds = [s["seed_url"] for s in gen_seeds(spec)]

    def run_arm(fetcher, web_pages):
        cfg = CrawlConfig(max_depth=10, budget_per_site=2**31,
                          politeness=True, max_rounds=16,
                          fetcher=fetcher)
        tmp = tempfile.mkdtemp(prefix="crawl_http_",
                               dir="/dev/shm" if os.path.isdir("/dev/shm")
                               else None)
        timings = {}
        t0 = time.time()
        catalog = crawl(spark, web_pages, seeds, tmp, cfg, timings=timings)
        dt = time.time() - t0
        crawled = crawled_all(spark, catalog)
        fp = crawled.agg(
            F.count("*").alias("n"),
            F.sum(F.crc32(F.encode(F.col("url"), "utf-8"))).alias("fp"),
        ).collect()[0]
        shutil.rmtree(tmp, ignore_errors=True)
        return {"crawl_sec": round(dt, 2),
                "rounds_sec": round(timings.get("rounds_sec") or dt, 2),
                "pages": fp["n"], "fingerprint": int(fp["fp"]),
                "pages_per_sec_steady": round(
                    fp["n"] / (timings.get("rounds_sec") or dt), 1)}

    http_arm = run_arm(rewriting_fetcher, None)
    join_arm = run_arm(None, web)
finally:
    stop_farm(servers)

assert http_arm["pages"] == join_arm["pages"] and \
    http_arm["fingerprint"] == join_arm["fingerprint"], (http_arm, join_arm)
print("PROBEJSON " + json.dumps({
    "cpus": cpus, "pages": http_arm["pages"],
    "http": http_arm, "join": join_arm,
}), flush=True)
"""


def run_cell(cpus: int, pages: int, hold_ms: float,
             n_servers: int = 12) -> dict:
    env = dict(os.environ, PROBE_REPO=REPO, PROBE_PAGES=str(pages),
               PROBE_CPUS=str(cpus), PROBE_HOLD_MS=str(hold_ms),
               PROBE_SERVERS=str(n_servers), PROBE_SERVER_SRC=_SERVER)
    r = subprocess.run([sys.executable, "-c", _WORKER], env=env,
                       capture_output=True, text=True, timeout=3600)
    for line in r.stdout.splitlines():
        if line.startswith("PROBEJSON "):
            return json.loads(line[len("PROBEJSON "):])
    raise RuntimeError(
        f"cell local[{cpus}] produced no PROBEJSON (rc={r.returncode}):\n"
        f"{r.stdout.strip()[-2000:]}\n{r.stderr.strip()[-2000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=24000)
    ap.add_argument("--hold-ms", type=float, default=10.0)
    ap.add_argument("--cpus", default="8,32",
                    help="comma-separated local[N] cells")
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args()

    if args.smoke:
        cell = run_cell(8, 2000, 5.0, n_servers=4)
        print(f"[crawl-http] SMOKE ok: {json.dumps(cell)}")
        return

    cells = []
    for cpus in [int(c) for c in args.cpus.split(",")]:
        cell = run_cell(cpus, args.pages, args.hold_ms)
        print(f"[crawl-http] {json.dumps(cell)}", flush=True)
        cells.append(cell)

    lines = [
        f"# Full crawl over real HTTP (`scripts/crawl_http_probe.py`, "
        f"{datetime.date.today()})",
        "",
        f"The bench corpus ({args.pages:,} pages, 12 sites) served by a "
        "12-process loopback farm (sites sharded by crc32(host); "
        f"{args.hold_ms:.0f} ms hold per request as simulated RTT) and "
        "crawled END-TO-END through `CrawlConfig.fetcher = "
        "http_fetcher(...)` — every page crosses a real socket, the "
        "per-host politeness semaphore, and the cross-host interleaved "
        "urllib drain; URLs hex-tunneled, loopback IP alias AND port "
        "both derived from the original HOST so one site = one netloc "
        "and the per-host cap genuinely binds per crawled site (r8 "
        "review fix: an earlier crc32(url) port split each site over "
        "the whole farm, multiplying the effective cap).  The "
        "table-join arm crawls the identical corpus in the same JVM; "
        "both arms' crawled-set fingerprints (count + Σcrc32(url)) "
        "asserted equal.",
        "",
        "| local[N] | arm | rounds s | steady pages/s |",
        "|---|---|---|---|",
    ]
    for c in cells:
        for arm in ("http", "join"):
            lines.append(
                f"| {c['cpus']} | {arm} | {c[arm]['rounds_sec']} "
                f"| {c[arm]['pages_per_sec_steady']} |")
    lines += [
        "",
        "The http arm IS the deployment shape (S3 over the network); "
        "the join arm is the bench/test shape (S3 as a table read).  "
        "Their gap is the real-socket + politeness cost of the fetch "
        "stage at this RTT; `BENCH/HTTP_FETCH.md` isolates that stage "
        "and shows it politeness-ceiling-bound, i.e. on a real cluster "
        "it scales with hosts-in-flight × per_host ÷ RTT, independent "
        "of the memory-bus ceiling that caps the byte-moving stages "
        "on this one box.",
        "",
    ]
    out = os.path.join(REPO, "BENCH", "CRAWL_HTTP.md")
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print(f"[crawl-http] wrote {out}")


if __name__ == "__main__":
    main()
