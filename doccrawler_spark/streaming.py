"""Structured-Streaming metrics feed (optional per SURVEY.md §1.2 —
the crawl loop itself is batch-iterative by design; only the live
metrics/monitoring surface streams).

The crawl commits one parquet snapshot dir per round under
``<root>/metrics/rNNNNN``; a monitoring job tails those directories as
a file stream and maintains running per-round aggregates — the
streaming analogue of the reference's MongoDB usage log
(src/app/repositories/llm_usage_repository.py:14-21).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

METRICS_SCHEMA = "partition_id int, pages_fetched bigint, bytes_fetched bigint, round int"


def metrics_stream(spark: SparkSession, snapshot_root: str) -> DataFrame:
    """readStream over the crawl's metrics snapshots → running totals
    per round (append as new rounds commit)."""
    src = (
        spark.readStream.schema(METRICS_SCHEMA)
        .option("pathGlobFilter", "*.parquet")
        .parquet(f"{snapshot_root}/metrics/r*")
    )
    return src.groupBy("round").agg(
        F.sum("pages_fetched").alias("pages_fetched"),
        F.sum("bytes_fetched").alias("bytes_fetched"),
        F.count("*").alias("n_partitions"),
    )


def run_metrics_query(spark: SparkSession, snapshot_root: str, name: str = "crawl_metrics"):
    """Start the monitoring query against an in-memory sink; call
    ``q.processAllAvailable()`` then query ``SELECT * FROM <name>``."""
    agg = metrics_stream(spark, snapshot_root)
    return (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
