"""End-to-end equivalence: Spark engine vs sequential oracle on the
tiny synthetic web (SURVEY.md §5.2 item 3).

Asserts (a) final URL-seen set equality, (b) crawl ordering at
(depth, priority) granularity, (c) byte-identical extracted text per
url (== the golden web_pages.text), (d) identical per-site budget
consumption, (e) resume-from-checkpoint reproduces identical state,
(f) politeness deferral (quota per host per round) matches.
"""

import os

import pytest

from doccrawler_spark.crawl import CrawlConfig, crawl, crawled_all, seen_all
from doccrawler_spark.webgen import (
    SiteSpec,
    WebSpec,
    gen_seeds,
    tiny_spec,
    web_pages_pandas,
)
from tests.oracle import OracleConfig, SequentialOracle

WEB_PAGES_SPARK_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def _load(spark, spec):
    pdf = web_pages_pandas(spec)
    web = spark.createDataFrame(pdf, schema=WEB_PAGES_SPARK_SCHEMA)
    pages_by_url = {
        r["url"]: bytes(r["html"]).decode("utf-8") for _, r in pdf.iterrows()
    }
    golden_text = {r["url"]: r["text"] for _, r in pdf.iterrows()}
    seeds = [s["seed_url"] for s in gen_seeds(spec)]
    return web, pages_by_url, golden_text, seeds


def _run_both(spark, tmp_path, spec, *, max_depth, politeness, round_seconds=60.0,
              budget=50, resume_after=None):
    web, pages, golden, seeds = _load(spark, spec)
    ocfg = OracleConfig(max_depth=max_depth, budget_per_site=budget,
                        politeness=politeness, round_seconds=round_seconds)
    oracle = SequentialOracle(pages, ocfg).run(seeds)

    ecfg = CrawlConfig(max_depth=max_depth, budget_per_site=budget,
                       politeness=politeness, round_seconds=round_seconds)
    root = os.path.join(str(tmp_path), "snap")
    if resume_after is not None:
        # run only N rounds, then resume to completion from the snapshot
        partial = CrawlConfig(**{**ecfg.__dict__, "max_rounds": resume_after})
        crawl(spark, web, seeds, root, partial)
        catalog = crawl(spark, web, seeds, root, ecfg, resume=True)
    else:
        catalog = crawl(spark, web, seeds, root, ecfg)
    return oracle, catalog, web, golden


def _assert_equivalent(spark, oracle, catalog, golden):
    eng = crawled_all(spark, catalog).orderBy("priority").collect()
    assert len(eng) == len(oracle.crawled), (
        f"engine crawled {len(eng)} pages, oracle {len(oracle.crawled)}"
    )
    o_sorted = sorted(oracle.crawled, key=lambda r: r["priority"])
    for e, o in zip(eng, o_sorted):
        assert e["url"] == o["url"], (e["url"], o["url"])
        assert e["site_id"] == o["site_id"]
        assert e["depth"] == o["depth"]
        assert e["round"] == o["round"]
        assert e["priority"] == o["priority"]
        # byte-identical text vs oracle AND vs the golden column
        assert e["text"] == o["text"], f"text mismatch for {e['url']}"
        assert e["text"] == golden[e["url"]], f"golden mismatch for {e['url']}"

    eng_seen = {r["url"] for r in seen_all(spark, catalog).select("url").collect()}
    assert eng_seen == oracle.seen

    eng_budget = {
        r["site_id"]: r["used"]
        for r in catalog.read(spark, "budget").collect()
    }
    assert eng_budget == oracle.budget


def test_tiny_bfs_and_sitemap(spark, tmp_path):
    oracle, catalog, _, golden = _run_both(
        spark, tmp_path, tiny_spec(), max_depth=3, politeness=True
    )
    # sanity: both modes produced pages; sitemap site fetched but never expanded
    assert any(r["site_id"].startswith("docsalphatest") for r in oracle.crawled)
    assert any(r["site_id"].startswith("docsbetatest") for r in oracle.crawled)
    _assert_equivalent(spark, oracle, catalog, golden)


def test_deeper_crawl_multi_round(spark, tmp_path):
    oracle, catalog, _, golden = _run_both(
        spark, tmp_path, tiny_spec(), max_depth=4, politeness=True
    )
    assert oracle.rounds >= 3
    _assert_equivalent(spark, oracle, catalog, golden)


def test_budget_clamp(spark, tmp_path):
    # budget of 2 filter batches per site → expansion stops early
    oracle, catalog, _, golden = _run_both(
        spark, tmp_path, tiny_spec(), max_depth=4, politeness=True, budget=2
    )
    assert max(oracle.budget.values()) == 2
    _assert_equivalent(spark, oracle, catalog, golden)


def test_politeness_deferral(spark, tmp_path):
    # a crawl-delayed host gets quota round_seconds/delay = 3 per round
    spec = WebSpec(sites=(
        SiteSpec("docs.slow.test", 40, branching=4, crawl_delay=20.0,
                 disallow=("/private/",)),
    ))
    oracle, catalog, _, golden = _run_both(
        spark, tmp_path, spec, max_depth=4, politeness=True, round_seconds=60.0
    )
    # quota must have forced deferral across extra rounds
    assert oracle.rounds > 3
    _assert_equivalent(spark, oracle, catalog, golden)


def test_politeness_off_matches_pure_reference_semantics(spark, tmp_path):
    oracle, catalog, _, golden = _run_both(
        spark, tmp_path, tiny_spec(), max_depth=3, politeness=False
    )
    _assert_equivalent(spark, oracle, catalog, golden)


def test_resume_from_checkpoint(spark, tmp_path):
    oracle, catalog, _, golden = _run_both(
        spark, tmp_path, tiny_spec(), max_depth=4, politeness=True,
        resume_after=1,
    )
    _assert_equivalent(spark, oracle, catalog, golden)


def test_dataframe_seeds_distributed_probe_path(spark, tmp_path):
    """A seed TABLE (cluster-scale: 10^6+ seeds never on the driver)
    must crawl identically to the same seeds as a python list; forcing
    seed_collect_max=0 exercises the distributed semi-join probe path
    plus the seed_probes snapshot."""
    spec = tiny_spec()
    web, pages, golden, seeds = _load(spark, spec)
    oracle = SequentialOracle(pages, OracleConfig(max_depth=3)).run(seeds)

    seeds_df = spark.createDataFrame(
        [(u, i) for i, u in enumerate(seeds)], "seed_url string, seed_ix int"
    )
    cfg = CrawlConfig(max_depth=3, seed_collect_max=0)
    root = os.path.join(str(tmp_path), "snap")
    catalog = crawl(spark, web, seeds_df, root, cfg)
    assert catalog.exists("seed_probes", 0)
    _assert_equivalent(spark, oracle, catalog, golden)


def test_resume_invisible_partial_round(spark, tmp_path):
    """Atomic-manifest contract: a crash mid-round leaves data files
    without a manifest — resume must neither read them (dedup/fetch
    source) nor trip over them (overwrite on retry), and the final
    crawl must still equal the oracle byte-for-byte."""
    spec = tiny_spec()
    web, pages, golden, seeds = _load(spark, spec)
    oracle = SequentialOracle(pages, OracleConfig(max_depth=4)).run(seeds)

    root = os.path.join(str(tmp_path), "snap")
    ecfg = CrawlConfig(max_depth=4)
    partial = CrawlConfig(**{**ecfg.__dict__, "max_rounds": 1})
    crawl(spark, web, seeds, root, partial)

    # simulate the crash: uncommitted data dirs + a torn tmp manifest
    for t in ("crawled", "frontier", "errors", "metrics"):
        d = os.path.join(root, t, "r00002")
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "part-junk.parquet"), "wb") as f:
            f.write(b"not a parquet file")
    with open(os.path.join(root, "frontier",
                           "_r00002.manifest.json.tmp.999"), "w") as f:
        f.write("{")

    catalog = crawl(spark, web, seeds, root, ecfg, resume=True)
    _assert_equivalent(spark, oracle, catalog, golden)


def test_sitemap_index_fallthrough(spark, tmp_path):
    """An existing-but-empty /sitemap.xml must fall through to
    /sitemap_index.xml (helper.py:219-225 breaks only when urls were
    FOUND, not when the file merely exists)."""
    spec = WebSpec(sites=(
        SiteSpec("docs.idx.test", 30, sitemap_size=10,
                 sitemap_index_fallthrough=True),
        SiteSpec("docs.plain.test", 10, branching=2),
    ))
    oracle, catalog, _, golden = _run_both(
        spark, tmp_path, spec, max_depth=3, politeness=True
    )
    # the fallthrough site crawled in sitemap mode: exactly its 10 locs,
    # all at depth 1, never expanded
    idx_rows = [r for r in oracle.crawled if "docs.idx.test" in r["url"]]
    assert len(idx_rows) == 10
    assert all(r["depth"] == 1 for r in idx_rows)
    _assert_equivalent(spark, oracle, catalog, golden)


def test_error_sink_records_fetch_misses(spark, tmp_path):
    """S8: every dead link (fixture seeds one every 7th page) lands in
    the errors table with reason=fetch_miss — exactly the urls the
    oracle records as misses (ref error_repository.py:14-21)."""
    from doccrawler_spark.crawl import errors_all

    oracle, catalog, _, golden = _run_both(
        spark, tmp_path, tiny_spec(), max_depth=3, politeness=True
    )
    errs = errors_all(spark, catalog).collect()
    assert len(errs) > 0, "fixture has dead links; errors table is empty"
    assert all(r["reason"] == "fetch_miss" for r in errs)
    assert {r["url"] for r in errs} == set(oracle.misses)
    _assert_equivalent(spark, oracle, catalog, golden)


def test_bucketed_seen_table_e2e(spark, tmp_path):
    """Cluster-scale F8 wired end-to-end: force the bucketed-seen-TABLE
    branch every round (broadcast cutoff 0) and assert (a) full crawl
    equivalence with the sequential oracle, (b) per-round appends were
    healed and manifest-committed, (c) a torn (un-manifested) append
    file is vacuumed, (d) the anti-join plan reads the seen table
    bucket-in-place — Bucketed: true, zero Exchange above its scan."""
    spec = tiny_spec()
    web, pages, golden, seeds = _load(spark, spec)
    oracle = SequentialOracle(pages, OracleConfig(max_depth=4)).run(seeds)
    cfg = CrawlConfig(max_depth=4, broadcast_dedup_max_frontier=0,
                      seen_buckets=8)
    root = os.path.join(str(tmp_path), "snap")
    catalog = crawl(spark, web, seeds, root, cfg)
    _assert_equivalent(spark, oracle, catalog, golden)

    # appends healed through the second-to-last frontier round
    frontier_rounds = catalog.committed_rounds("frontier")
    assert set(catalog.seen_appended_rounds()) >= set(frontier_rounds[:-1])
    tbl_urls = {r["url"] for r in catalog.seen_table(spark, 8).collect()}
    assert tbl_urls <= oracle.seen and tbl_urls

    # torn append: junk data file without a manifest entry → vacuumed
    junk_name = "part-99999-torn_00000.c000.snappy.parquet"
    with open(os.path.join(catalog._seen_dir(), junk_name), "wb") as f:
        f.write(b"not parquet")
    assert junk_name in catalog.seen_vacuum(spark, 8)

    # plan property (same assertion show_plans makes, here against the
    # crawl's OWN table): seen side scans Bucketed: true, and the only
    # Exchange in the join is on the candidate side
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        probe = spark.createDataFrame([("x",)], "url string")
        j = probe.join(catalog.seen_table(spark, 8), "url", "left_anti")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in plan
        seen_scan_part = plan[plan.index("FileScan"):]
        assert "Exchange" not in seen_scan_part
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                       str(64 * 1024 * 1024))


def test_count_true_stats_and_spark_fallback(spark, tmp_path):
    """count_true must agree with a full count across all three paths:
    pure row-group statistics (homogeneous groups), driver-side reads
    of mixed groups, and the distributed Spark fallback (forced by a
    tiny row cap) — and never double-count homogeneous groups inside
    mixed files."""
    from pyspark.sql import functions as F

    from doccrawler_spark.snapshots import SnapshotCatalog

    catalog = SnapshotCatalog(str(tmp_path / "snap"))
    # 4 partitions: some all-true, some all-false, some mixed
    df = spark.range(0, 4000).select(
        F.col("id"),
        ((F.col("id") % 3 == 0) | (F.col("id") < 1000)).alias("flag"),
    ).repartition(4, "id")
    catalog.write(df, "t", 0)
    expected = df.filter("flag").count()
    assert catalog.count_true("t", 0, "flag") == expected
    assert catalog.count_true("t", 0, "flag", spark=spark) == expected
    old = SnapshotCatalog.COUNT_TRUE_DRIVER_MAX_ROWS
    SnapshotCatalog.COUNT_TRUE_DRIVER_MAX_ROWS = 0  # force Spark path
    try:
        assert catalog.count_true("t", 0, "flag", spark=spark) == expected
    finally:
        SnapshotCatalog.COUNT_TRUE_DRIVER_MAX_ROWS = old


def test_invariants(spark, tmp_path):
    """Property checks: no URL fetched twice per site, nothing at depth
    >= MAX_DEPTH, seen-set monotone (SURVEY.md §5.2 item 4)."""
    oracle, catalog, _, golden = _run_both(
        spark, tmp_path, tiny_spec(), max_depth=3, politeness=True
    )
    df = crawled_all(spark, catalog)
    n = df.count()
    assert df.select("url", "site_id").distinct().count() == n
    assert df.filter(f"depth >= 3").count() == 0
    # seen contains every non-sitemap crawled url
    seen = {r["url"] for r in seen_all(spark, catalog).collect()}
    from pyspark.sql import functions as F
    non_sitemap = df.join(
        catalog.read(spark, "frontier", 0).filter("sitemap_mode").select("url"),
        "url", "left_anti",
    )
    for r in non_sitemap.select("url").collect():
        assert r["url"] in seen


def test_iceberg_backend_structural(tmp_path):
    """SURVEY §7 Iceberg backend, structural half: the config-only
    swap is pinned (catalog class, extension, warehouse wiring) so a
    cluster deployment is exactly ``get_spark(extra_conf=
    iceberg_conf(...))`` plus the runtime jar."""
    from doccrawler_spark.session import iceberg_conf

    conf = iceberg_conf("icecat", str(tmp_path / "wh"))
    assert conf["spark.sql.catalog.icecat"] == (
        "org.apache.iceberg.spark.SparkCatalog"
    )
    assert conf["spark.sql.catalog.icecat.type"] == "hadoop"
    assert conf["spark.sql.catalog.icecat.warehouse"].endswith("wh")
    assert "IcebergSparkSessionExtensions" in conf["spark.sql.extensions"]


def test_iceberg_backend_roundtrip(spark, tmp_path):
    """SURVEY §7 Iceberg backend, runtime half: snapshot write + read
    through a real Iceberg catalog whenever an iceberg-spark-runtime
    jar is on the classpath — skip-gated in this sandbox (no network,
    no jar; verified at round 1)."""
    import pytest

    from doccrawler_spark.session import iceberg_conf

    conf = iceberg_conf("icecat", str(tmp_path / "wh"))
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
    except Exception:
        pytest.skip("iceberg-spark-runtime jar not on classpath")

    # jar present (a real cluster): exercise snapshot write + read
    for k, v in conf.items():
        spark.conf.set(k, v)
    spark.sql("CREATE DATABASE IF NOT EXISTS icecat.db")
    spark.range(5).writeTo("icecat.db.t_smoke").createOrReplace()
    assert spark.table("icecat.db.t_smoke").count() == 5


def test_rewrite_committed_round_is_atomic(spark, tmp_path):
    """ADVICE r7 (fold_bloom torn-write): rewriting an already-
    committed round must publish into a FRESH directory with the
    manifest replace as the commit point — the original bytes stay
    intact until the new manifest is visible, so a crash mid-rewrite
    can never leave a committed manifest pointing at a torn dir, and
    a reader mid-scan never has files deleted under it."""
    from doccrawler_spark.snapshots import SnapshotCatalog

    catalog = SnapshotCatalog(str(tmp_path / "snap"))
    df1 = spark.range(0, 10).withColumnRenamed("id", "v")
    catalog.write(df1, "t", 3)
    first_dir = catalog.data_path("t", 3)
    assert first_dir == catalog.data_dir("t", 3)

    df2 = spark.range(100, 105).withColumnRenamed("id", "v")
    catalog.write(df2, "t", 3)
    second_dir = catalog.data_path("t", 3)
    assert second_dir != first_dir        # fresh dir, never in-place
    # superseded dir survives the grace window (a reader that resolved
    # it pre-swap finishes its scan), then vacuums on demand
    assert os.path.exists(first_dir)
    assert sorted(r["v"] for r in spark.read.parquet(first_dir).collect()) \
        == list(range(0, 10))
    assert catalog.vacuum_superseded(grace_s=0) == 1
    assert not os.path.exists(first_dir)
    got = sorted(r["v"] for r in catalog.read(spark, "t", 3).collect())
    assert got == list(range(100, 105))
    # footer-based counts resolve through the manifest path too
    assert catalog.count("t", 3) == 5
    # the stream view is SEALED at first publication (append-log
    # semantics: a file stream that consumed those paths must never
    # see renamed duplicates), so it keeps the first-published bytes —
    # alive via hard links even though the raw dir was vacuumed
    sd = os.path.join(catalog.stream_dir("t"), "r00003")
    names = {n for n in os.listdir(sd) if n.endswith(".parquet")}
    src = {n for n in os.listdir(second_dir) if n.endswith(".parquet")}
    assert names.isdisjoint(src) and names
    got = sorted(r["v"] for r in spark.read.parquet(sd).collect())
    assert got == list(range(0, 10))

    # crash-window simulation: rewrite data landed but the manifest
    # replace never happened → the committed snapshot still reads the
    # previously-published bytes, junk dir is simply unreferenced
    junk = catalog.data_dir("t", 3) + ".deadbeef"
    os.makedirs(junk)
    assert catalog.data_path("t", 3) == second_dir
    assert catalog.count("t", 3) == 5

def test_compact_snapshots(spark, tmp_path):
    """catalog.compact rewrites multi-file committed rounds into few
    right-sized files through the atomic committed-round rewrite path:
    contents identical, time-travel intact, untouched rounds left in
    place, stream view re-published to exactly the new bytes."""
    from doccrawler_spark.snapshots import SnapshotCatalog

    catalog = SnapshotCatalog(str(tmp_path / "snap"))
    catalog.write(spark.range(0, 100).repartition(8), "t", 1)
    catalog.write(spark.range(100, 250).repartition(8), "t", 2)
    catalog.write(spark.range(250, 260).coalesce(1), "t", 3)
    dir3 = catalog.data_path("t", 3)

    def files(r):
        return sorted(n for n in os.listdir(catalog.data_path("t", r))
                      if n.endswith(".parquet"))

    assert len(files(1)) == 8 and len(files(2)) == 8

    stats = catalog.compact(spark, "t")
    assert set(stats) == {1, 2}
    assert stats[1] == (8, 1) and stats[2] == (8, 1)
    assert catalog.data_path("t", 3) == dir3        # untouched
    got1 = sorted(r["id"] for r in catalog.read(spark, "t", 1).collect())
    got2 = sorted(r["id"] for r in catalog.read(spark, "t", 2).collect())
    assert got1 == list(range(0, 100))
    assert got2 == list(range(100, 250))
    assert catalog.count("t", 1) == 100 and catalog.count("t", 2) == 150

    # stream view: sealed at first publication — compaction does NOT
    # re-publish (a file stream would re-ingest every row under the new
    # names), so the entry keeps its original 8 files whose rows equal
    # the compacted table exactly
    sd = os.path.join(catalog.stream_dir("t"), "r00002")
    names = {n for n in os.listdir(sd) if n.endswith(".parquet")}
    assert len(names) == 8 and names.isdisjoint(set(files(2)))
    got_stream = sorted(r["id"] for r in spark.read.parquet(sd).collect())
    assert got_stream == list(range(100, 250))

    # idempotent: already-compacted rounds are not rewritten again
    assert catalog.compact(spark, "t") == {}

    # a sub-file-target row count still respects min_files
    assert catalog.compact(spark, "t", rounds=[3]) == {}


def test_crawl_compacts_on_done(spark, tmp_path):
    """compact_on_done (the default) leaves every committed crawled
    round as ONE right-sized file after the crawl finishes, with the
    oracle equivalence fully intact and the cost timed separately."""
    web, pages, golden, seeds = _load(spark, tiny_spec())
    from tests.oracle import OracleConfig, SequentialOracle

    oracle = SequentialOracle(
        pages, OracleConfig(max_depth=3, politeness=True)).run(seeds)
    timings: dict = {}
    catalog = crawl(spark, web, seeds, os.path.join(str(tmp_path), "s"),
                    CrawlConfig(max_depth=3), timings=timings)
    assert timings.get("compact_sec") is not None
    for r in catalog.committed_rounds("crawled"):
        files = [n for n in os.listdir(catalog.data_path("crawled", r))
                 if n.endswith(".parquet")]
        assert len(files) == 1, (r, files)
    _assert_equivalent(spark, oracle, catalog, golden)

    # a partial run (max_rounds cap, done=False) does NOT compact —
    # the table is still being appended to across resumes
    t2: dict = {}
    crawl(spark, web, seeds, os.path.join(str(tmp_path), "s2"),
          CrawlConfig(max_depth=3, max_rounds=1), timings=t2)
    assert "compact_sec" not in t2
