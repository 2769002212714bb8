#!/usr/bin/env python
"""spark-submit entry point for a full crawl job.

Cluster usage (north-rule shipping path):

    python scripts/package_pyfiles.py          # → dist/doccrawler_spark.zip
    spark-submit \
        --master <cluster-master> \
        --py-files dist/doccrawler_spark.zip \
        scripts/submit_crawl.py \
        --web  <path-or-iceberg-table of web_pages(url,warc_ts,html,text,lang)> \
        --seeds https://docs.example.com/ https://docs.other.com/ \
        --out  <snapshot-root> \
        [--max-depth 3] [--budget 50] [--resume]

Local sandbox usage (no cluster):

    python scripts/submit_crawl.py --demo --out /tmp/crawl_demo

The job is resumable: with ``--resume`` it reads the latest committed
round state under ``--out`` and continues from there (SnapshotCatalog
atomic-manifest commit protocol, SURVEY.md §4.2).
"""

from __future__ import annotations

import argparse
import os
import sys

# direct local invocation (python scripts/submit_crawl.py) puts scripts/
# on sys.path, not the repo root; on a cluster --py-files supplies the
# package instead and this insert is a no-op
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--web", help="parquet path or iceberg table of web_pages")
    ap.add_argument("--seeds", nargs="*", default=[], help="seed URLs")
    ap.add_argument("--seeds-table", default=None,
                    help="parquet path or table with a seed_url column "
                         "(cluster-scale: seeds never touch the driver)")
    ap.add_argument("--out", required=True, help="snapshot root (crawl state)")
    ap.add_argument("--max-depth", type=int, default=3)
    ap.add_argument("--budget", type=int, default=50,
                    help="per-site link-filter budget (MAX_LLM_REQUEST_COUNT)")
    ap.add_argument("--max-rounds", type=int, default=64)
    ap.add_argument("--no-politeness", action="store_true")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--demo", action="store_true",
                    help="crawl the built-in deterministic tiny web")
    args = ap.parse_args()

    from doccrawler_spark.crawl import CrawlConfig, crawl, crawled_all
    from doccrawler_spark.session import get_spark

    # spark-submit supplies master/conf; get_spark only fills gaps
    spark = get_spark(app_name="doccrawler_crawl")

    if args.demo:
        from doccrawler_spark.webgen import gen_seeds, tiny_spec, web_pages_pandas

        spec = tiny_spec()
        web = spark.createDataFrame(
            web_pages_pandas(spec),
            schema="url string, warc_ts timestamp, html binary, text string, lang string",
        )
        seeds = [s["seed_url"] for s in gen_seeds(spec)]
    else:
        if not args.web or not (args.seeds or args.seeds_table):
            ap.error("--web and --seeds/--seeds-table are required without --demo")

        def read_any(path: str):
            return (
                spark.read.table(path)
                if "/" not in path and "." in path
                else spark.read.parquet(path)
            )

        web = read_any(args.web)
        seeds = read_any(args.seeds_table) if args.seeds_table else args.seeds

    cfg = CrawlConfig(
        max_depth=args.max_depth,
        budget_per_site=args.budget,
        politeness=not args.no_politeness,
        max_rounds=args.max_rounds,
    )
    catalog = crawl(spark, web, seeds, args.out, cfg, resume=args.resume)
    crawled = crawled_all(spark, catalog)
    n = crawled.count()
    print(f"[submit_crawl] done: {n} pages crawled; snapshots at {args.out}")
    crawled.orderBy("priority").select("url", "depth", "round", "priority").show(
        20, truncate=False
    )


if __name__ == "__main__":
    sys.exit(main())
