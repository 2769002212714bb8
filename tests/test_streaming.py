"""Structured-Streaming metrics feed: tail the crawl's per-round
metrics snapshots and check the running aggregates match the batch
ground truth (SURVEY.md §2.5 O5 / S9 streaming surface)."""

from pyspark.sql import functions as F

from doccrawler_spark.crawl import CrawlConfig, crawl
from doccrawler_spark.streaming import run_metrics_query
from doccrawler_spark.webgen import gen_seeds, tiny_spec, web_pages_pandas

WEB_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def test_metrics_stream_matches_batch(spark, tmp_path):
    spec = tiny_spec()
    web = spark.createDataFrame(web_pages_pandas(spec), schema=WEB_SCHEMA)
    seeds = [s["seed_url"] for s in gen_seeds(spec)]
    root = str(tmp_path) + "/snap"
    catalog = crawl(spark, web, seeds, root, CrawlConfig(max_depth=3))

    q = run_metrics_query(spark, root, name="m_test")
    try:
        q.processAllAvailable()
        streamed = {
            r["round"]: (r["pages_fetched"], r["bytes_fetched"])
            for r in spark.sql("SELECT * FROM m_test").collect()
        }
    finally:
        q.stop()

    rounds = catalog.committed_rounds("metrics")
    assert rounds, "crawl produced no metrics snapshots"
    for r_ in rounds:
        batch = (
            catalog.read(spark, "metrics", r_)
            .agg(F.sum("pages_fetched"), F.sum("bytes_fetched"))
            .collect()[0]
        )
        assert streamed[r_] == (batch[0], batch[1]), f"round {r_}"
