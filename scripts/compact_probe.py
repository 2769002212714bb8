#!/usr/bin/env python
"""Read-side payoff of SnapshotCatalog.compact: a long crawl's
`crawled_all` scan opens rounds x shuffle-partitions files; per-file
open/footer cost dominates once files are small.  This probe writes an
N-round catalog with F files per round (the uncompacted shape), times a
full scan, compacts, and re-times the identical scan — best-of-R each,
fresh plan per rep (never reuse a collected DataFrame: AQE stage reuse
fakes 0.03 s re-runs).

Usage: python scripts/compact_probe.py [--rounds 200] [--files 8]
           [--rows-per-round 2000] [--repeats 3] [--cpus 8]
Writes/updates BENCH/COMPACT.md.
"""
import argparse
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def code_stamp() -> str:
    try:
        out = subprocess.run(
            ["git", "log", "-1", "--format=%h"], capture_output=True,
            text=True, cwd=os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))).stdout.strip()
        return out or "unknown"
    except Exception:
        return "unknown"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=200)
    ap.add_argument("--files", type=int, default=8)
    ap.add_argument("--rows-per-round", type=int, default=2000)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--cpus", type=int, default=8)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from doccrawler_spark.session import get_spark
    from doccrawler_spark.snapshots import SnapshotCatalog

    spark = get_spark(app_name="compact_probe",
                      master=f"local[{args.cpus}]",
                      shuffle_partitions=args.cpus)
    base = tempfile.mkdtemp(
        prefix="doccrawler_compact_probe_",
        dir="/dev/shm" if os.path.isdir("/dev/shm") else None)
    try:
        catalog = SnapshotCatalog(os.path.join(base, "snap"))
        n = args.rows_per_round
        t0 = time.time()
        for r in range(1, args.rounds + 1):
            df = (spark.range(r * n, (r + 1) * n)
                  .withColumn("url", F.concat(F.lit("https://h/"), F.col("id")))
                  .withColumn("text", F.repeat(F.lit("x"), 64))
                  .repartition(args.files))
            catalog.write(df, "crawled", r)
        print(f"wrote {args.rounds} rounds x {args.files} files "
              f"in {time.time()-t0:.1f}s", flush=True)

        def scan_best() -> tuple[float, int]:
            paths = [catalog.data_path("crawled", r)
                     for r in catalog.committed_rounds("crawled")]
            n_files = sum(
                1 for p in paths for f in os.listdir(p)
                if f.endswith(".parquet"))
            best = float("inf")
            for _ in range(max(1, args.repeats)):
                t = time.time()
                got = (spark.read.parquet(*paths)
                       .agg(F.count("*"), F.sum(F.length("url"))).collect())
                best = min(best, time.time() - t)
                assert got[0][0] == args.rounds * n
            return best, n_files

        before_s, before_files = scan_best()
        t0 = time.time()
        stats = catalog.compact(spark, "crawled")
        compact_s = time.time() - t0
        after_s, after_files = scan_best()
        print(f"scan before: {before_s:.2f}s over {before_files} files",
              flush=True)
        print(f"compact: {len(stats)} rounds in {compact_s:.1f}s", flush=True)
        print(f"scan after:  {after_s:.2f}s over {after_files} files",
              flush=True)

        md = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BENCH", "COMPACT.md")
        with open(md, "w") as f:
            f.write(f"""# Snapshot compaction: read-side payoff

`SnapshotCatalog.compact` (wired as `CrawlConfig.compact_on_done`)
rewrites each committed round into right-sized files.  This probe
isolates WHY: a long crawl's `crawled_all` scan opens
rounds x shuffle-partitions files, and per-file open/footer overhead
dominates the scan once files are small.  At 100 TB the same effect is
multiplied by object-store GET latency per file — compaction converts
O(rounds x partitions) opens into O(data / target_file_size).

Probe: `scripts/compact_probe.py --rounds {args.rounds} --files
{args.files} --rows-per-round {args.rows_per_round} --repeats
{args.repeats} --cpus {args.cpus}` (tmpfs, best-of-{args.repeats}
fresh-plan scans, full count+sum aggregate over all rounds).
Code stamp `{code_stamp()}`.

| layout | files | full-scan sec (best of {args.repeats}) |
|---|---|---|
| as written ({args.files} files/round) | {before_files} | {before_s:.2f} |
| compacted (1 file/round) | {after_files} | {after_s:.2f} |

Speedup **{before_s / max(after_s, 1e-9):.1f}x**; one-time compaction
cost {compact_s:.1f} s for {len(stats)} rounds (footer-planned,
atomic manifest swap per round — readers never see a torn state).
""")
        print(f"wrote {md}", flush=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
