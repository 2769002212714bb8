"""Partitioned Bloom seen-set prefilter (north_rule's bloom/cuckoo
URL-seen; doccrawler_spark/bloom.py): primitive properties plus e2e
equivalence of the bloom-routed bucketed crawl."""

import os

from pyspark.sql import functions as F

from doccrawler_spark import bloom as B


def _urls(spark, prefix, n):
    return spark.createDataFrame(
        [(f"https://{prefix}.test/p/{i}",) for i in range(n)], "url string"
    )


def test_bloom_no_false_negatives_and_incremental_merge(spark):
    """Inserted urls are ALWAYS maybe-seen (no false negatives — the
    property exactness rests on), and the incremental or-merge of two
    delta blooms is bit-identical to the bulk build."""
    m_bits, k, nb = 1 << 12, 6, 8
    a, b = _urls(spark, "a", 400), _urls(spark, "b", 400)

    bl_a = B.bloom_delta(a, nb, m_bits, k)
    bl_b = B.bloom_delta(b, nb, m_bits, k)
    merged = {r["bucket"]: list(r["words"])
              for r in B.bloom_merge([bl_a, bl_b], m_bits).collect()}
    bulk = {r["bucket"]: list(r["words"])
            for r in B.bloom_delta(a.unionByName(b), nb, m_bits, k).collect()}
    assert merged == bulk

    probe = (
        a.withColumn("_b", F.expr(B.bucket_expr("url", nb)))
        .join(bl_a.withColumnRenamed("bucket", "_b"), "_b", "left")
        .withColumn("m", F.expr(B.maybe_seen_sql("url", "words", m_bits, k)))
    )
    assert probe.filter(~F.col("m")).count() == 0  # no false negatives


def test_bloom_prefilter_is_exact(spark):
    """prefilter_new == plain anti-join, bit-for-bit, including when
    the filter is deliberately tiny (high fp rate → everything routes
    through the exact check) and when a bucket has no bloom row."""
    for m_bits in (64, 1 << 12):  # 64 bits for 400 urls → fp-saturated
        k, nb = 4, 8
        seen = _urls(spark, "a", 400)
        bl = B.bloom_delta(seen, nb, m_bits, k)
        cand = _urls(spark, "a", 150).unionByName(_urls(spark, "c", 250))
        got = {r["url"]
               for r in B.prefilter_new(cand, bl, seen, nb, m_bits, k).collect()}
        want = {r["url"] for r in cand.join(seen, "url", "left_anti").collect()}
        assert got == want, m_bits


def test_bloom_routes_definitely_new_off_the_anti_join(spark):
    """With an adequately sized filter, disjoint candidates are
    overwhelmingly definitely-new (the rows that skip the seen table);
    quantifies the routing the prefilter exists for."""
    m_bits, k, nb = 1 << 14, 6, 8
    seen = _urls(spark, "a", 500)
    bl = B.bloom_delta(seen, nb, m_bits, k)
    fresh = _urls(spark, "z", 500)
    probe = (
        fresh.withColumn("_b", F.expr(B.bucket_expr("url", nb)))
        .join(bl.withColumnRenamed("bucket", "_b"), "_b", "left")
        .withColumn("m", F.expr(B.maybe_seen_sql("url", "words", m_bits, k)))
    )
    n_maybe = probe.filter(F.col("m")).count()
    # 2^14 bits per bucket for ~63 urls/bucket at k=6 → fp ~0
    assert n_maybe <= 5


def test_bloom_e2e_crawl_equivalence_and_healing(spark, tmp_path):
    """Forced-bucketed crawl with the bloom ON equals the same crawl
    with it OFF (identical seen set + frontier rows), bloom snapshots
    commit per round, and a deleted bloom history heals from frontier
    snapshots alone."""
    from doccrawler_spark.crawl import (
        CrawlConfig,
        _ensure_bloom,
        crawl,
        seen_all,
    )
    from doccrawler_spark.webgen import gen_seeds, tiny_spec, web_pages_pandas

    spec = tiny_spec()
    web = spark.createDataFrame(
        web_pages_pandas(spec),
        schema="url string, warc_ts timestamp, html binary, text string, lang string",
    )
    seeds = [s["seed_url"] for s in gen_seeds(spec)]

    roots, seen_sets = {}, {}
    for flag in (True, False):
        root = os.path.join(str(tmp_path), f"snap_{flag}")
        cfg = CrawlConfig(max_depth=3, broadcast_dedup_max_frontier=0,
                          seen_buckets=8, bloom_prefilter=flag,
                          bloom_m_bits=1 << 12)
        catalog = crawl(spark, web, seeds, root, cfg)
        roots[flag] = catalog
        seen_sets[flag] = {
            (r["url"], r["round"], r["depth"])
            for r in seen_all(spark, catalog).collect()
        }
    assert seen_sets[True] == seen_sets[False] and seen_sets[True]

    cat = roots[True]
    blooms = cat.committed_rounds(B.BLOOM_TABLE)
    assert blooms, "bloom snapshots never committed"

    # healing: wipe the bloom table; _ensure_bloom rebuilds the exact
    # same filter from frontier history
    before = {r["bucket"]: list(r["words"])
              for r in cat.read(spark, B.BLOOM_TABLE, blooms[-1]).collect()}
    import shutil

    shutil.rmtree(os.path.join(cat.root, B.BLOOM_TABLE))
    cfg = CrawlConfig(broadcast_dedup_max_frontier=0, seen_buckets=8,
                      bloom_m_bits=1 << 12)
    healed_df = _ensure_bloom(spark, cat, cfg, blooms[-1])
    healed = {r["bucket"]: list(r["words"]) for r in healed_df.collect()}
    assert healed == before


def test_bloom_prefilter_exact_hypothesis(spark):
    """Property (hypothesis): for generated seen/candidate url sets —
    arbitrary overlap, percent-escapes, dotted/dashed hosts — and any
    (m_bits, k) down to a 2-word filter, prefilter_new equals the
    plain anti-join exactly."""
    from hypothesis import given, settings, strategies as st

    url = st.from_regex(r"https?://[a-z0-9.\-]{1,12}/[a-zA-Z0-9/_%\-.~]{0,16}",
                        fullmatch=True)
    urls = st.lists(url, min_size=0, max_size=40, unique=True)

    @given(seen_urls=urls, cand_urls=urls,
           m_bits=st.sampled_from([128, 1 << 10]),
           k=st.integers(min_value=1, max_value=8))
    @settings(max_examples=8, deadline=None)
    def check(seen_urls, cand_urls, m_bits, k):
        nb = 4
        seen = spark.createDataFrame(
            [(u,) for u in seen_urls] or [("https://never.test/x",)],
            "url string",
        )
        cand = spark.createDataFrame(
            [(u,) for u in cand_urls] or [("https://only.test/y",)],
            "url string",
        )
        bl = B.bloom_delta(seen, nb, m_bits, k)
        got = {r["url"]
               for r in B.prefilter_new(cand, bl, seen, nb, m_bits, k).collect()}
        want = {r["url"] for r in cand.join(seen, "url", "left_anti").collect()}
        assert got == want

    check()
