#!/usr/bin/env python
"""Query-only measurement harness for optimization work (guide §1).

Times the same declared queries as the frozen ``bench.py`` with the
same methodology (fresh plan per rep, best-of-N, .count() action) but
WITHOUT the crawl leg, so a query-level change can be measured in ~1
minute instead of ~10.  Also captures ``.explain('formatted')`` per
query when asked — the plan evidence committed under ``plans/r09/``.

Env knobs:
  SPARK_GRAFT_SF_DIR   default /root/testdata/sf1.0
  SPARK_GRAFT_CPUS     default 32
  BENCH_QUERY_REPEATS  default 2 (same best-of protocol as bench.py)
  BENCH_ONLY           comma-separated query-name filter
  BENCH_PLANS_DIR      if set, write <dir>/<query>_<suffix>.txt explains
  BENCH_PLANS_SUFFIX   default "before"

Prints one JSON line: {"queries": {...}, "total": ..., "sf": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from doccrawler_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    shuffle_parts = int(os.environ.get("BENCH_SHUFFLE_PARTITIONS", "64"))
    spark = get_spark(app_name="doccrawler_bench_extra",
                      master=f"local[{cpus}]",
                      shuffle_partitions=shuffle_parts)

    import __spark_entry__ as E

    qs = E.queries()
    only = os.environ.get("BENCH_ONLY")
    names = [n for n in (
        "exact_dedup", "ngram_jaccard", "minhash_lsh", "minhash_verified",
        "simhash", "embedding_neardup", "cosine_topk", "lsh_topk", "ivf_topk",
        "lsh_topk_indexed", "ivf_topk_indexed", "knn_join", "knn_join_indexed",
        "token_stats", "quality_scores", "lang_id", "fingerprint",
        "hybrid_topk", "chunk_documents", "multimodal_features",
        "multimodal_frames", "groupby_agg", "broadcast_join", "anti_join",
        "topk_per_group", "sessionize",
    ) if not only or n in only.split(",")]

    plans_dir = os.environ.get("BENCH_PLANS_DIR")
    suffix = os.environ.get("BENCH_PLANS_SUFFIX", "before")
    if plans_dir:
        os.makedirs(plans_dir, exist_ok=True)

    # same session warm-up as bench.py (JIT/codegen/parquet-footer)
    try:
        qs["groupby_agg"](spark, sf_dir).count()
        qs["token_stats"](spark, sf_dir).count()
        qs["ivf_topk_indexed"](spark, sf_dir).count()
        qs["lsh_topk_indexed"](spark, sf_dir).count()
        qs["knn_join_indexed"](spark, sf_dir).count()
    except Exception:
        pass

    q_reps = int(os.environ.get("BENCH_QUERY_REPEATS", "2"))
    queries: dict[str, float] = {}
    for name in names:
        try:
            if plans_dir:
                df = qs[name](spark, sf_dir)
                plan = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted")
                with open(os.path.join(plans_dir,
                                       f"{name}_{suffix}.txt"), "w") as f:
                    f.write(plan)
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            times = []
            for _ in range(max(1, q_reps)):
                t0 = time.time()
                qs[name](spark, sf_dir).count()
                times.append(time.time() - t0)
            if max(times) > 2 * min(times):
                t0 = time.time()
                qs[name](spark, sf_dir).count()
                times.append(time.time() - t0)
            queries[name] = round(min(times), 3)
        except Exception as e:
            queries[name] = -1.0
            print(f"[bench_extra] {name} FAILED: {e}", file=sys.stderr)
        finally:
            spark.sparkContext.setJobDescription(None)

    total = sum(v for v in queries.values() if v > 0)
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else None
    print(json.dumps({"queries": queries, "total": round(total, 2), "sf": sf}))


if __name__ == "__main__":
    main()
