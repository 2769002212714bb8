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


def test_stream_skips_uncommitted_torn_round(spark, tmp_path):
    """A crash can leave a junk partial round dir with NO manifest; the
    streaming source (commit-published stream dirs) must not consume
    it, while a raw frontier/r* glob would crash or read garbage.
    Also pins the r4 object-store contract: nothing under stream/ is a
    symlink (S3/GCS have no such primitive)."""
    import os

    from doccrawler_spark.crawl import seen_all
    from doccrawler_spark.streaming import frontier_stream, streaming_seen_dedup

    spec = tiny_spec()
    web = spark.createDataFrame(web_pages_pandas(spec), schema=WEB_SCHEMA)
    seeds = [s["seed_url"] for s in gen_seeds(spec)]
    root = str(tmp_path) + "/snap"
    catalog = crawl(spark, web, seeds, root, CrawlConfig(max_depth=3))

    # torn round: junk part-file in an UNCOMMITTED round dir
    torn = catalog.data_dir("frontier", 99)
    os.makedirs(torn)
    with open(os.path.join(torn, "part-00000-junk.snappy.parquet"), "wb") as f:
        f.write(b"\x00garbage that is not parquet")

    q = (streaming_seen_dedup(frontier_stream(spark, root))
         .writeStream.outputMode("append")
         .format("memory").queryName("seen_torn").start())
    try:
        q.processAllAvailable()
        streamed = {r["url"] for r in
                    spark.sql("SELECT url FROM seen_torn").collect()}
    finally:
        q.stop()
    batch_seen = {r["url"] for r in
                  seen_all(spark, catalog).select("url").collect()}
    assert streamed == batch_seen
    stream_root = os.path.join(root, "stream")
    links = [
        os.path.join(dp, n)
        for dp, dns, fns in os.walk(stream_root)
        for n in dns + fns
        if os.path.islink(os.path.join(dp, n))
    ]
    assert not links, f"object-store-unsafe symlinks in publish path: {links}"


def test_stream_publish_heals_interrupted_copy(spark, tmp_path):
    """A publish that crashed mid-copy leaves a round dir missing some
    files; stream_dir() must complete it idempotently and the stream
    must still see every committed row exactly once."""
    import os

    from doccrawler_spark.crawl import seen_all
    from doccrawler_spark.streaming import frontier_stream, streaming_seen_dedup

    spec = tiny_spec()
    web = spark.createDataFrame(web_pages_pandas(spec), schema=WEB_SCHEMA)
    seeds = [s["seed_url"] for s in gen_seeds(spec)]
    root = str(tmp_path) + "/snap"
    catalog = crawl(spark, web, seeds, root, CrawlConfig(max_depth=3))

    rounds = catalog.committed_rounds("frontier")
    assert rounds
    # simulate the torn publish: delete one published file + one whole
    # published round dir (as if the process died before copying them)
    r0 = rounds[0]
    pub = os.path.join(root, "stream", "frontier", f"r{r0:05d}")
    victims = [n for n in os.listdir(pub) if n.endswith(".parquet")]
    os.remove(os.path.join(pub, victims[0]))
    if len(rounds) > 1:
        import shutil

        shutil.rmtree(os.path.join(root, "stream", "frontier",
                                   f"r{rounds[-1]:05d}"))

    q = (streaming_seen_dedup(frontier_stream(spark, root))
         .writeStream.outputMode("append")
         .format("memory").queryName("seen_healed").start())
    try:
        q.processAllAvailable()
        streamed = {r["url"] for r in
                    spark.sql("SELECT url FROM seen_healed").collect()}
    finally:
        q.stop()
    batch_seen = {r["url"] for r in
                  seen_all(spark, catalog).select("url").collect()}
    assert streamed == batch_seen


def test_streaming_seen_dedup_and_site_progress(spark, tmp_path):
    """Streaming F8 analogue + stateful per-site progress: both match
    the batch ground truth computed from the same snapshots."""
    from doccrawler_spark.crawl import seen_all
    from doccrawler_spark.streaming import (
        frontier_stream,
        site_progress_stream,
        streaming_seen_dedup,
    )

    spec = tiny_spec()
    web = spark.createDataFrame(web_pages_pandas(spec), schema=WEB_SCHEMA)
    seeds = [s["seed_url"] for s in gen_seeds(spec)]
    root = str(tmp_path) + "/snap"
    catalog = crawl(spark, web, seeds, root, CrawlConfig(max_depth=3))

    fr = frontier_stream(spark, root)

    q = (streaming_seen_dedup(fr).writeStream.outputMode("append")
         .format("memory").queryName("seen_stream").start())
    try:
        q.processAllAvailable()
        streamed = {r["url"] for r in
                    spark.sql("SELECT url FROM seen_stream").collect()}
    finally:
        q.stop()
    batch_seen = {r["url"] for r in
                  seen_all(spark, catalog).select("url").collect()}
    assert streamed == batch_seen

    q2 = (site_progress_stream(frontier_stream(spark, root))
          .writeStream.outputMode("update")
          .format("memory").queryName("site_progress").start())
    try:
        q2.processAllAvailable()
        rows = spark.sql(
            "SELECT site_id, max_by(urls_discovered, urls_discovered) AS n "
            "FROM site_progress GROUP BY site_id"
        ).collect()
    finally:
        q2.stop()
    # a pure-sitemap site discovers no seen-delta urls — batch ground
    # truth has no row for it, streaming state reports an explicit 0
    got = {r["site_id"]: r["n"] for r in rows if r["n"] > 0}
    want = {
        r["site_id"]: r["n"]
        for r in seen_all(spark, catalog).groupBy("site_id")
        .agg(F.count("*").alias("n")).collect()
    }
    assert got == want
