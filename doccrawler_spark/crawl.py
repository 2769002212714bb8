"""The distributed crawl loop: URL frontier + fetch scheduler (M2/M3).

Reference semantics reproduced (SURVEY.md §3.4, against /root/reference):
  * depth: enter at 1, fetch iff depth < MAX_DEPTH
    (crawler_service.py:46), expand iff depth+1 < MAX_DEPTH (:88);
  * seen-set: global across sites, add-at-enqueue
    (crawler_service.py:114-118), seeds pre-added
    (crawler_usecase.py:132), sitemap URLs never added (:123-127);
  * sitemap-mode pages fetched but never expanded (crawler_service.py:82);
  * canonicalization = fragment strip only (helper.py:65-68);
  * same-domain filter against the CURRENT page's host (:99-101);
  * per-site filter budget: page-level pre-check then one unit per
    ≤180-link batch (crawler_service.py:103-112, helper.py:239-248);
  * the deterministic crawl order is the single-worker FIFO with
    canonically sorted link expansion (SURVEY.md §3.4.4) — matched
    here by per-round global sequence numbers over
    (parent_priority, url).

Spark-first physical design:
  * fetch = inner equi-join frontier ⋈ web_pages on url (runtime
    bloom-filter join prunes the scan by frontier keys);
  * seen-set dedup = left-anti join against per-round url deltas
    (Iceberg bucket-by-url_hash at cluster scale);
  * politeness = per-host round quota via salted two-phase top-k
    (skew-safe for hot hosts), deferred URLs keep their priority;
  * budget = broadcast dim join + bounded per-site window (only the
    top `budget` candidate pages per site enter the window);
  * every round commits atomic snapshots (frontier, seen delta,
    crawled, budget, metrics) — resumable mid-crawl.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import functions as Fx
from .shuffle import global_sequence, topk_per_group
from .snapshots import SnapshotCatalog

FRONTIER_SCHEMA = (
    "url string, host string, depth int, site_id string, home_url string, "
    "sitemap_mode boolean, priority long, url_hash long, round int, "
    "is_new boolean"
)
# the URL-seen set is carried INSIDE the frontier snapshots: rows with
# is_new=true are this round's seen-delta (one write instead of two per
# round; the anti-join scans frontier deltas' url column with the
# is_new filter pushed into parquet)
_FRONTIER_COLS = [
    "url", "host", "depth", "site_id", "home_url", "sitemap_mode", "priority",
]
CRAWLED_SCHEMA = (
    "url string, site_id string, base_url string, text string, depth int, "
    "round int, priority long"
)


@dataclass
class CrawlConfig:
    max_depth: int = 3
    budget_per_site: int = 50          # MAX_LLM_REQUEST_COUNT (readme.md:86)
    filter_batch_size: int = 180       # crawler_service.py:103
    politeness: bool = True            # north_rule addition (absent in ref)
    track_errors: bool = True          # S8 error sink (error_repository.py:14-21)
    round_seconds: float = 60.0        # per-host quota = round_seconds/delay
    max_rounds: int = 64
    salt: int = 32                     # skew salt for hot-host windows
    embed_dim: int = 64
    # frontier-size cutoff below which seen-set dedup uses the
    # broadcast semi/anti path (seen never shuffled); above it, the
    # hash-bucketed seen TABLE (one append per round, anti-join reads
    # buckets in place — Exchange only on the candidate side)
    broadcast_dedup_max_frontier: int = 2_000_000
    # bucket count of the seen table (cluster sizing: ≈ total seen
    # bytes / 256 MB; sandbox default keeps files small)
    seen_buckets: int = 64
    # partitioned Bloom prefilter over the bucketed seen path (the
    # north-rule's bloom/cuckoo seen set; bloom.py): definitely-new
    # candidates skip the exact anti-join entirely; exactness is
    # untouched (maybe-seen rows still anti-join).  m_bits is PER
    # url-hash bucket (cluster sizing: ~10-13 bits per expected url in
    # the bucket; 2^16 bits = 8 KB/bucket sandbox default), k the
    # number of probe bits
    bloom_prefilter: bool = True
    # 0 = auto: per-bucket array sized from the CURRENT seen-set size
    # (see _bloom_m_bits — amortized power-of-two doubling via the
    # params-drift rebuild); >0 pins it explicitly
    bloom_m_bits: int = 0
    bloom_k: int = 6
    # auto-sizing targets: ~10 bits/url ≈ 0.8% fp at k=6, with 4×
    # growth headroom so a resize (full rebuild from history) happens
    # only each time the seen set quadruples
    bloom_bits_per_url: int = 10
    bloom_headroom: int = 4
    # generation-chained resizes (scalable Bloom, r7): when the auto
    # sizer steps m, new deltas open a NEW generation at the new size
    # — O(new-delta) — instead of rebuilding the whole filter from
    # frontier history (at 10^10 seen URLs that rescan is the most
    # expensive maintenance op in the engine).  The full rebuild is
    # retained for k/bucketing/hash-format drift (those change bit
    # positions inside a generation) and for bloom_chained=False.
    # fold_bloom() collapses an old chain at vacuum time.
    bloom_chained: bool = True
    # self-maintaining fold cadence (r8): when the committed chain
    # reaches this many generations, the crawl loop folds it back to
    # one generation sized for today's seen set.  Generations only
    # appear on pow-4 auto-resize steps, so hitting the threshold
    # needs ~4^(n-1) growth past the floor — the history-proportional
    # fold stays amortized-rare, exactly like the resizes that caused
    # it.  0 disables (operator folds manually at vacuum time).
    bloom_fold_gens: int = 8
    # seen-set size below which the Bloom prefilter stays dormant:
    # the per-round delta-build + snapshot commit measured ~7% of a
    # small-corpus round (240k-URL seen set, r5 A/B) while routing
    # buys nothing until the exact check is expensive — the same
    # stats-gate family as knn_join's salted windows.  At 10^6+ seen
    # URLs the filter engages automatically; tests force 0.
    bloom_min_seen: int = 1_000_000
    # small-file maintenance (r8): when the crawl finishes, rewrite
    # each committed crawled/errors round into right-sized files via
    # catalog.compact (footer-planned, atomic manifest swap — the
    # Iceberg rewrite_data_files analogue).  A round is written with
    # shuffle-partition-many files; over hundreds of rounds the
    # downstream crawled_all scan pays thousands of file opens/footer
    # reads before the first row.  Runs AFTER the loop (the table is
    # read-heavy from then on) and is timed separately
    # (timings["compact_sec"]), so rounds_sec stays comparable.
    # False disables (operator compacts manually at vacuum cadence).
    compact_on_done: bool = True
    # frontier-size cutoff below which fetch uses an IN-list point
    # lookup (parquet row-group stats pruning — the CDX-index pattern:
    # a 12-URL round must not decode the whole corpus) instead of
    # streaming the corpus through the join.  Parquet's In pushdown
    # degrades (and eventually stack-overflows) past ~1k values, so
    # keep this small; big rounds stream.
    point_lookup_max_frontier: int = 512
    # seed-count cutoff below which round-0 probes use the driver-local
    # IN-list point-lookup path (plan-time parquet pruning + broadcast
    # joins); above it, probes run as a distributed semi-join and the
    # probe relation is snapshotted instead of collected (10^6+-seed
    # crawls never materialize on the driver)
    seed_collect_max: int = 10_000
    # pluggable page fetcher (the S3 seam, doccrawler_spark/fetch.py):
    # None = the sandbox's no-network equi-join against ``web_pages``;
    # any fetch.Fetcher (e.g. ``fetch.http_fetcher()`` for real
    # deployment) is handed the URL sets of BOTH the seed probes and
    # every round's frontier and must return FETCH_SCHEMA rows —
    # misses (html IS NULL) vanish exactly like join misses and are
    # recovered by the snapshot-derived S8 errors sink.  With a
    # fetcher set, ``web_pages`` may be None.
    fetcher: "object | None" = None


def _with_host(df: DataFrame, url_col: str = "url") -> DataFrame:
    return df.withColumn("host", Fx.host_col(F.col(url_col)))


def build_robots(spark: SparkSession, robots_rows: DataFrame) -> DataFrame:
    """(host, disallow ARRAY<STRING>, crawl_delay DOUBLE) from the
    /robots.txt rows — a small broadcastable dim.

    ``robots_rows`` is pre-pruned to the robots.txt urls of the seed
    hosts (the same-domain filter F5 keeps the crawl inside those
    hosts, so no other robots files can ever matter) — never a full
    ``endswith`` scan of the corpus."""
    parsed = robots_rows.select(
        F.col("url"),
        Fx.host_col(F.col("url")).alias("host"),
        Fx.parse_robots_udf(F.col("html")).alias("r"),
    )
    # one row per host: robots may have been probed under both schemes
    # (https preferred, matching live-crawler behavior where the https
    # fetch wins — 'https://…' sorts after 'http://…'); duplicate host
    # rows would fan out every broadcast politeness join downstream
    w = Window.partitionBy("host").orderBy(F.desc("url"))
    return (
        parsed.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("host", "r.disallow", "r.crawl_delay")
    )


def _drop_disallowed(cand: DataFrame, robots: DataFrame, enabled: bool) -> DataFrame:
    """Politeness: drop robots-disallowed URLs before they are enqueued
    (never enter frontier nor seen)."""
    if not enabled:
        return cand
    joined = cand.join(F.broadcast(robots.select("host", "disallow")), "host", "left")
    path = Fx.path_col(F.col("url"))
    blocked = F.exists("disallow", lambda p: path.startswith(p))
    return joined.filter(F.col("disallow").isNull() | ~F.coalesce(blocked, F.lit(False))).drop(
        "disallow"
    )


def seed_round(
    spark: SparkSession,
    catalog: SnapshotCatalog,
    web_pages: DataFrame,
    seeds: "list[str] | DataFrame",
    cfg: CrawlConfig,
) -> dict:
    """Round 0: site ids, sitemap probes, initial frontier + seen.

    Mirrors crawler_usecase.main (crawler_usecase.py:104-151): seeds in
    input order; sitemap hit → every <loc> at depth 1, sitemap_mode,
    NOT in seen; miss → the seed itself at depth 1, pre-seen.

    ``seeds`` is a python list (small crawls) or a DataFrame with a
    ``seed_url`` column (and optional ``seed_ix`` ordering column) —
    a 10^6+-row seed table never touches the driver: probes become a
    distributed semi-join and the probe relation is snapshotted.
    """
    if isinstance(seeds, DataFrame):
        seeds_df = seeds
        if "seed_ix" not in seeds_df.columns:
            # deterministic (LEXICOGRAPHIC seed_url) order — a DataFrame
            # has no stable "input order"; pass an explicit seed_ix
            # column when list-input ordering semantics matter
            seeds_df = global_sequence(seeds_df, ["seed_url"], "seed_ix")
        n_seeds = seeds_df.count()
    else:
        seeds_df = spark.createDataFrame(
            [(u, i) for i, u in enumerate(seeds)], "seed_url string, seed_ix int"
        )
        n_seeds = len(seeds)

    base = F.regexp_replace(F.col("seed_url"), r"/+$", "")
    probes = seeds_df.select(
        "seed_url", "seed_ix",
        F.concat(base, F.lit("/sitemap.xml")).alias("sm1"),
        F.concat(base, F.lit("/sitemap_index.xml")).alias("sm2"),
    )

    # Every special row seeding needs — seed base pages, sitemap
    # candidates, the seed hosts' robots.txt — as pure functions of the
    # seed urls (scheme://host from the same authority regex the
    # same-domain filter uses; urlparse semantics).
    scheme_host = F.regexp_extract("seed_url", r"^(https?://[^/?#\s]+)", 1)
    host_only = F.regexp_extract("seed_url", r"^https?://([^/?#\s]+)", 1)
    probe_urls_df = seeds_df.select(
        F.explode(F.array(
            F.col("seed_url"),
            F.concat(base, F.lit("/sitemap.xml")),
            F.concat(base, F.lit("/sitemap_index.xml")),
            # robots.txt probed under BOTH the seed's scheme and https:
            # an http:// seed must still pick up rules a corpus serves
            # only at https://host/robots.txt (robots semantics are
            # per-authority, not per-scheme)
            F.concat(scheme_host, F.lit("/robots.txt")),
            F.concat(F.lit("https://"), host_only, F.lit("/robots.txt")),
        )).alias("url")
    ).distinct()

    if cfg.fetcher is not None:
        # pluggable fetch (real HTTP in deployment): same URL set, same
        # hit shape; misses (html IS NULL) drop exactly like join
        # misses.  Small seed sets keep the driver-local-relation
        # semantics of the point-lookup path; big ones snapshot.
        # Host-repartitioned like the round fetch: the ~6 probe URLs
        # per seed authority land on one task under the per_host cap.
        fetched_probes = (
            cfg.fetcher(probe_urls_df.repartition(
                Fx.host_col(F.col("url"))))
            .filter(F.col("html").isNotNull())
            .select("url", "html")
        )
        if n_seeds <= cfg.seed_collect_max:
            probe_rows = fetched_probes.collect()
            probe_pages = spark.createDataFrame(
                probe_rows or [], "url string, html binary"
            )
            maybe_bc = F.broadcast
        else:
            catalog.write(fetched_probes, "seed_probes", 0)
            probe_pages = catalog.read(spark, "seed_probes", 0)
            maybe_bc = lambda df: df
    elif n_seeds <= cfg.seed_collect_max:
        # point-lookup path: a static IN-list filter Catalyst pushes
        # into the parquet scan as row-group-prunable predicates (no
        # join, no full decode); the ≤4·|seeds| surviving rows live in
        # a driver-local relation so every downstream broadcast join
        # references plain local data instead of corpus-scan lineage.
        probe_url_list = [r["url"] for r in probe_urls_df.collect()]
        probe_rows = (
            web_pages.select("url", "html")
            .filter(F.col("url").isin(probe_url_list))
            .collect()
        )
        probe_pages = spark.createDataFrame(
            probe_rows or [], "url string, html binary"
        )
        maybe_bc = F.broadcast
    else:
        # cluster-scale path: distributed semi-join against the seed
        # urls, snapshotted once (it feeds FOUR downstream joins — a
        # re-executed corpus scan per consumer would be 4x the cost),
        # never collected.
        catalog.write(
            web_pages.select("url", "html")
            .join(probe_urls_df, "url", "left_semi"),
            "seed_probes", 0,
        )
        probe_pages = catalog.read(spark, "seed_probes", 0)
        maybe_bc = lambda df: df  # too big to broadcast; AQE picks

    titled = (
        probes.join(
            maybe_bc(probe_pages),
            probes.seed_url == probe_pages.url, "left",
        )
        .drop("url")
        .select("seed_url", "seed_ix", "sm1", "sm2",
                Fx.title_udf(F.col("html")).alias("title"))
    )
    sid = Fx.site_id_udf()
    sites = titled.select(
        "seed_url", "seed_ix", "sm1", "sm2",
        sid(F.coalesce(F.col("title"), F.lit("")), F.col("seed_url")).alias("site_id"),
    )

    # sitemap probe: /sitemap.xml then /sitemap_index.xml (helper.py:215-226)
    p1 = probe_pages.withColumnRenamed("html", "html1")
    p2 = probe_pages.withColumnRenamed("html", "html2")
    probed = (
        sites.join(maybe_bc(p1), sites.sm1 == p1.url, "left").drop(p1.url)
        .join(maybe_bc(p2), sites.sm2 == p2.url, "left").drop(p2.url)
        # fall through on PARSE RESULT, not file presence: an existing
        # sitemap.xml with zero <loc> urls falls back to
        # /sitemap_index.xml (helper.py:219-225 — "if urls_found: break")
        .withColumn(
            "locs1",
            F.when(F.col("html1").isNotNull(), Fx.parse_sitemap_udf(F.col("html1"))),
        )
        .withColumn(
            "locs2",
            F.when(F.col("html2").isNotNull(), Fx.parse_sitemap_udf(F.col("html2"))),
        )
        .withColumn(
            "locs",
            F.when(F.size("locs1") > 0, F.col("locs1")).otherwise(F.col("locs2")),
        )
        .select("seed_url", "seed_ix", "site_id", "locs")
    ).cache()

    sitemap_entries = (
        probed.filter(F.size("locs") > 0)
        .select(
            "seed_ix", "site_id", F.col("seed_url").alias("home_url"),
            F.posexplode("locs").alias("loc_ix", "url"),
        )
        .withColumn("sitemap_mode", F.lit(True))
    )
    bfs_entries = (
        probed.filter(F.col("locs").isNull() | (F.size("locs") == 0))
        .select(
            "seed_ix", "site_id", F.col("seed_url").alias("home_url"),
            F.lit(-1).alias("loc_ix"), F.col("seed_url").alias("url"),
        )
        .withColumn("sitemap_mode", F.lit(False))
    )
    entries = _with_host(sitemap_entries.unionByName(bfs_entries))

    robots = build_robots(
        spark, probe_pages.filter(F.col("url").endswith("/robots.txt"))
    )
    catalog.write(robots, "robots", 0)
    robots = catalog.read(spark, "robots", 0)
    entries = _drop_disallowed(entries, robots, cfg.politeness)

    frontier = global_sequence(
        entries.withColumn("depth", F.lit(1)),
        ["seed_ix", "loc_ix", "url"],
        "priority",
        start=0,
        num_partitions=1 if n_seeds < 1000 else None,
    ).select(
        *_FRONTIER_COLS,
        F.xxhash64("url").alias("url_hash"),
        F.lit(0).alias("round"),
        # sitemap URLs are never added to the seen set
        # (crawler_usecase.py:123-127); plain seeds are (:132)
        (~F.col("sitemap_mode")).alias("is_new"),
    )
    catalog.write(frontier, "frontier", 0)

    budget0 = (
        sites.select("site_id").distinct()
        .withColumn("used", F.lit(0))
        .withColumn("max", F.lit(cfg.budget_per_site))
    )
    catalog.write(budget0, "budget", 0)
    probed.unpersist()

    n_frontier = catalog.count("frontier", 0)
    state = {"next_priority": n_frontier, "round": 0,
             "done": n_frontier == 0, "frontier_size": n_frontier,
             # cumulative is_new URLs — drives the bloom_min_seen gate
             "seen_size": catalog.count_true("frontier", 0, "is_new",
                                             spark=spark)}
    catalog.write_state(0, state)
    return state


def _ensure_seen_table(spark, catalog: SnapshotCatalog, cfg: CrawlConfig,
                       upto_round: int):
    """Heal the bucketed seen table through ``upto_round``: append the
    is_new url delta of every committed frontier round that has no
    committed append manifest yet (idempotent), then return the
    vacuumed table.  Crash-safe by construction — a torn append leaves
    un-manifested files that seen_table() vacuums."""
    appended = set(catalog.seen_appended_rounds())
    for r in catalog.committed_rounds("frontier"):
        if r <= upto_round and r not in appended:
            delta = (
                catalog.read(spark, "frontier", r)
                .filter(F.col("is_new")).select("url")
            )
            catalog.seen_append(spark, delta, r, cfg.seen_buckets)
    return catalog.seen_table(spark, cfg.seen_buckets)


def _bloom_m_bits(cfg: CrawlConfig, seen_size: int) -> int:
    """Per-bucket Bloom array size.  Explicit when cfg.bloom_m_bits>0;
    else auto: ``bits_per_url × headroom × seen ÷ buckets`` rounded up
    to a power of two, floored at 2^16 (the 8 KB/bucket sandbox size)
    and capped at 2^27 (16 MB/bucket row — past that, raise
    seen_buckets instead of the row size).  The rounding makes m a
    step function of seen growth: it changes only when the seen set
    outgrows capacity, the params-drift machinery in _ensure_bloom
    then rebuilds the filter from frontier history — cost ∝ |seen|,
    paid O(log |seen|) times over a crawl (amortized doubling).  A
    FIXED m would instead saturate to all-ones at 10^10 URLs and pass
    everything to the exact check.

    Sizes step in powers of FOUR (even exponents): power-of-two steps
    would resize on every doubling of the seen set no matter the
    headroom (headroom only phase-shifts the crossing), while pow-4
    stepping halves the number of full rebuilds between 10^6 and
    10^10 URLs for at most a transient 4× memory overshoot — and a
    rebuild at 10^10 is a rescan of all frontier history, by far the
    expensive side of that trade (measured: forcing the filter on at
    240k seen with min_seen=0 costs ~35% of a bench round, resize
    rebuilds included — the 10^6 gate + this cadence bound that)."""
    if cfg.bloom_m_bits:
        return cfg.bloom_m_bits
    per_bucket = (cfg.bloom_bits_per_url * cfg.bloom_headroom
                  * max(seen_size, 1)) // max(cfg.seen_buckets, 1)
    per_bucket = min(max(per_bucket, 1 << 16), 1 << 27)
    n = (per_bucket - 1).bit_length()
    n += n & 1  # even exponent → resizes only per 4× seen growth
    return 1 << min(n, 27)


def _ensure_bloom(spark, catalog: SnapshotCatalog, cfg: CrawlConfig,
                  upto_round: int, m_bits: int | None = None):
    """Heal the partitioned seen-Bloom snapshot through ``upto_round``
    and return it (None before any frontier commit).  Incremental: the
    latest committed bloom snapshot is OR-merged with the delta blooms
    of only the frontier rounds it predates — cost ∝ missed deltas,
    never ∝ |seen| — then committed at ``upto_round`` (the same
    atomic-manifest protocol as every table, so a torn build is
    invisible and simply rebuilt).

    ``m_bits`` sizes the NEW deltas.  Under ``cfg.bloom_chained`` a
    step of the auto sizer just opens a new GENERATION at the new size
    (rows keyed by their own m_bits; probe = any-generation), so a
    resize costs O(new-delta); the full from-history rebuild fires
    only on k/bucketing/hash-format drift.  Unchained, any param
    mismatch — resizes included — rebuilds the whole filter."""
    from . import bloom as B

    if m_bits is None:
        m_bits = _bloom_m_bits(cfg, 0)
    rounds = [r for r in catalog.committed_rounds("frontier")
              if r <= upto_round]
    if not rounds:
        return None
    have = [r for r in catalog.committed_rounds(B.BLOOM_TABLE)
            if r <= upto_round]
    latest = have[-1] if have else None
    latest_df = None
    if latest is not None:
        latest_df = catalog.read(spark, B.BLOOM_TABLE, latest)
        compatible = (
            B.chain_params_match(latest_df, cfg.seen_buckets,
                                 cfg.bloom_k)
            if cfg.bloom_chained else
            B.params_match(latest_df, cfg.seen_buckets,
                           m_bits, cfg.bloom_k)
        )
        if not compatible:
            # resume with changed bloom params (or a pre-fmt snapshot):
            # OR-merging incompatible bit patterns would yield FALSE
            # NEGATIVES (NULL-padded zip_with words / probes of
            # never-set bits) and silently break exactness — discard
            # and rebuild the whole filter from frontier history
            latest, latest_df = None, None
    missing = [r for r in rounds if latest is None or r > latest]
    if not missing:
        return latest_df
    frames = []
    if latest_df is not None:
        frames.append(latest_df)
    for r in missing:
        delta = (
            catalog.read(spark, "frontier", r)
            .filter(F.col("is_new")).select("url")
        )
        frames.append(
            B.bloom_delta(delta, cfg.seen_buckets, m_bits,
                          cfg.bloom_k)
        )
    merged = (B.bloom_merge_gens(frames) if cfg.bloom_chained
              else B.bloom_merge(frames, m_bits))
    catalog.write(merged, B.BLOOM_TABLE, upto_round)
    # read BACK from the committed snapshot: downstream consumers get a
    # plain pruned parquet scan (with accurate size stats for the
    # broadcast decision), not the whole merge lineage re-executed
    return catalog.read(spark, B.BLOOM_TABLE, upto_round)


def _bloom_generations(catalog: SnapshotCatalog, round_: int) -> int:
    """Distinct m_bits count of a committed bloom snapshot — the chain
    length.  Driver-side pyarrow read of the m_bits column only (the
    table has ≤ buckets·generations rows; the wide words arrays are
    never materialized), so the per-round fold-cadence check costs no
    Spark job."""
    import os as _os

    import pyarrow.parquet as pq

    from . import bloom as B

    d = catalog.data_path(B.BLOOM_TABLE, round_)
    vals: set[int] = set()
    for name in _os.listdir(d):
        if name.endswith(".parquet"):
            vals.update(
                pq.read_table(_os.path.join(d, name),
                              columns=["m_bits"])["m_bits"].to_pylist()
            )
    return len(vals)


def fold_bloom(spark, catalog: SnapshotCatalog, cfg: CrawlConfig,
               upto_round: int | None = None):
    """Collapse a generation-chained Bloom back to ONE generation sized
    for the current seen set: rebuild every committed frontier round's
    delta at today's auto m and commit the merge at ``upto_round``.
    This is the MAINTENANCE op (run it at vacuum cadence, like
    snapshot vacuuming) that bounds the chain's summed fp rate and
    probe width; the crawl loop itself never pays it — resizes there
    are O(new-delta) generation appends.  Returns the folded frame, or
    None before any frontier commit."""
    from . import bloom as B

    rounds = catalog.committed_rounds("frontier")
    if upto_round is not None:
        rounds = [r for r in rounds if r <= upto_round]
    if not rounds:
        return None
    upto = rounds[-1] if upto_round is None else upto_round
    seen_size = sum(
        catalog.count_true("frontier", r, "is_new", spark=spark)
        for r in rounds
    )
    m = _bloom_m_bits(cfg, seen_size)
    frames = [
        B.bloom_delta(
            catalog.read(spark, "frontier", r)
            .filter(F.col("is_new")).select("url"),
            cfg.seen_buckets, m, cfg.bloom_k,
        )
        for r in rounds
    ]
    catalog.write(B.bloom_merge(frames, m), B.BLOOM_TABLE, upto)
    return catalog.read(spark, B.BLOOM_TABLE, upto)


def run_round(
    spark: SparkSession,
    catalog: SnapshotCatalog,
    web_pages: DataFrame,
    cfg: CrawlConfig,
    round_: int,
    state: dict,
    has_delays: bool | None = None,
) -> dict:
    """One fetch→extract→discover→dedup round; commits round snapshots."""
    import os

    _phase_t: dict[str, float] = {}
    _timing = bool(os.environ.get("CRAWL_PHASE_TIMING"))
    _t0 = time.time()

    def _mark(name: str) -> None:
        nonlocal _t0
        if _timing:
            now = time.time()
            _phase_t[name] = round(now - _t0, 2)
            _t0 = now

    frontier = catalog.read(spark, "frontier", round_ - 1)
    # unlimited budget (throughput mode) never gates and is never
    # updated, so the budget table stays at its round-0 snapshot —
    # one fewer read+write job per round
    budget_gated = cfg.budget_per_site < 2**30
    budget = catalog.read_upto(spark, "budget", round_ - 1) if budget_gated else None
    robots = catalog.read(spark, "robots", 0)
    if has_delays is None:
        has_delays = not robots.filter(F.col("crawl_delay").isNotNull()).isEmpty()

    # ---- politeness: per-host quota, defer the rest (priority kept)
    if cfg.politeness and has_delays:
        quota = F.when(
            F.col("crawl_delay").isNotNull(),
            F.greatest(F.lit(1), F.floor(F.lit(cfg.round_seconds) / F.col("crawl_delay"))),
        )
        fr = frontier.join(F.broadcast(robots.select("host", "crawl_delay")), "host", "left")
        unlimited = fr.filter(F.col("crawl_delay").isNull()).drop("crawl_delay")
        limited = fr.filter(F.col("crawl_delay").isNotNull())
        top, rest = topk_per_group(
            limited.withColumn("quota", quota),
            "host",
            ["priority"],
            F.col("quota"),
            salt=cfg.salt,
            unique_col="url",
        )
        fetch_now = unlimited.unionByName(top.drop("crawl_delay", "quota"))
        deferred = rest.drop("crawl_delay", "quota")
    else:
        fetch_now, deferred = frontier, frontier.limit(0)

    # ---- depth gate F1 (items at depth >= max are consumed, not fetched)
    fetch_now = fetch_now.filter(F.col("depth") < cfg.max_depth)

    # ---- fetch = equi-join against web_pages (S3); misses vanish like
    # result.success=False does (crawler_service.py:62-70).
    # Extraction + link discovery run as ONE fused Arrow UDF (one
    # decode+parse per page), evaluated EXACTLY ONCE: the result is
    # committed straight to the round's crawled snapshot and every
    # downstream stage (metrics, discover, frontier) re-reads the
    # needed columns from that parquet.  A .persist() here would hold
    # gigabytes of deserialized text on the JVM heap and stall in GC —
    # columnar re-reads are strictly cheaper.
    frontier_size = state.get("frontier_size") or 0
    if cfg.fetcher is not None:
        # pluggable fetch (S3 seam): the fetcher is handed exactly this
        # round's URL set and its hits join back to the frontier rows
        # below — identical downstream plan, misses vanish identically.
        # Repartition by host FIRST: a side-effecting fetcher (http)
        # then sees any one host on ONE task, so its per_host cap is
        # the global per-server bound instead of tasks × per_host (the
        # O3 politeness quota already bounds how many URLs per delayed
        # host enter the round, which also caps this shuffle's skew)
        corpus = (
            cfg.fetcher(fetch_now.repartition(F.col("host")).select("url"))
            .filter(F.col("html").isNotNull())
            .select("url", "html")
        )
    else:
        corpus = web_pages.select("url", "html")
        if 0 < frontier_size <= cfg.point_lookup_max_frontier:
            # point-lookup fetch: push the round's URL list into the
            # scan as an IN filter so parquet row-group stats prune the
            # corpus (decodes only the row groups containing the URLs)
            fetch_urls = [r["url"] for r in fetch_now.select("url").collect()]
            corpus = corpus.filter(F.col("url").isin(fetch_urls))
    fetched = (
        fetch_now.join(corpus, "url", "inner")
        .withColumn("page", Fx.extract_page_udf(F.col("html")))
        .withColumn("html_len", F.length("html"))
        .select(
            "url", "site_id", F.col("home_url").alias("base_url"),
            F.col("page.text").alias("text"), "depth",
            F.lit(round_).alias("round"), "priority",
            # extra columns beyond CRAWLED_SCHEMA (readers prune them)
            "host", "sitemap_mode", "html_len",
            F.col("page.links").alias("raw_links"),
        )
    )
    try:
        _mark("plan")
        catalog.write(fetched, "crawled", round_)
        _mark("fetch_extract_write")
        crawled_back = catalog.read(spark, "crawled", round_)

        # ---- per-partition lineage + fetch metrics (S9/O5 analogue)
        lineage = crawled_back.groupBy(
            F.spark_partition_id().alias("partition_id")
        ).agg(
            F.count("*").alias("pages_fetched"),
            F.sum("html_len").alias("bytes_fetched"),
        ).withColumn("round", F.lit(round_))
        catalog.write(lineage, "metrics", round_)
        _mark("metrics")


        # ---- discover (X2) on expanding pages only (F2/F3 gates)
        expanding = crawled_back.filter(
            (~F.col("sitemap_mode")) & (F.col("depth") + 1 < cfg.max_depth)
        )
        links = expanding.select(
            "url", "host", "site_id",
            F.col("base_url").alias("home_url"), "depth", "priority",
            "raw_links",
        )
        # F4 fragment strip → in-page dedup F6 → same-host F5 → canonical sort
        links = links.withColumn(
            "internal",
            F.array_sort(
                F.filter(
                    F.array_distinct(
                        F.transform("raw_links", lambda u: Fx.strip_fragment_col(u))
                    ),
                    lambda u: Fx.host_col(u) == F.col("host"),
                )
            ),
        ).withColumn(
            "n_batches",
            F.ceil(F.size("internal") / F.lit(cfg.filter_batch_size)).cast("int"),
        ).drop("raw_links")
        # materialize once WHEN budget-gated: `links` then feeds BOTH
        # the children pipeline and the budget-spend aggregate, and
        # broadcast-exchange jobs would re-execute this whole lineage
        # per consumer.  Unlimited budget has a single consumer — the
        # checkpoint would only add a full materialization job.
        if budget_gated:
            links = links.localCheckpoint(eager=True)

        # ---- budget (F9): only the first `budget` consuming pages per
        # site can spend; bounded window after a salted top-k.
        # Fast path: an effectively-unlimited budget (throughput bench)
        # can never gate a batch, so the dim join + two windows vanish.
        if not budget_gated:
            kept = links.filter(F.col("n_batches") > 0).withColumn(
                "kept_links", Fx.rule_filter_links(F.col("internal"))
            )
        else:
            consuming = links.filter(F.col("n_batches") > 0).join(
                F.broadcast(budget), "site_id", "left"
            )
            cand, _over = topk_per_group(
                consuming, "site_id", ["priority"], F.col("max"), salt=cfg.salt,
                unique_col="url",
            )
            w = Window.partitionBy("site_id").orderBy("priority").rowsBetween(
                Window.unboundedPreceding, -1
            )
            cand = cand.withColumn(
                "cum_before", F.coalesce(F.sum("n_batches").over(w), F.lit(0))
            ).withColumn(
                "allowed_batches",
                F.greatest(
                    F.lit(0),
                    F.least(
                        F.col("n_batches"),
                        F.col("max") - F.col("used") - F.col("cum_before"),
                    ),
                ).cast("int"),
            )
            kept = cand.filter(F.col("allowed_batches") > 0).withColumn(
                "kept_links",
                Fx.rule_filter_links(
                    F.slice(
                        F.col("internal"), 1,
                        F.col("allowed_batches") * F.lit(cfg.filter_batch_size),
                    )
                ),
            )

        # ---- children candidates (enqueue at depth+1, crawler_service.py:114-121)
        children = kept.select(
            "site_id", "home_url",
            (F.col("depth") + 1).alias("depth"),
            F.col("priority").alias("parent_priority"),
            F.explode("kept_links").alias("url"),
        )
        children = _with_host(children)
        children = _drop_disallowed(children, robots, cfg.politeness)

        # first-enqueuer wins within the round (FIFO semantics).
        # Materialized once — it is consumed three times (semi-join
        # broadcast, anti-join, sequence numbering).
        firsts = children.groupBy("url").agg(
            F.min(
                F.struct("parent_priority", "site_id", "home_url", "depth", "host")
            ).alias("w")
        ).select("url", "w.*").localCheckpoint(eager=True)

        # ---- global seen-set anti-join (F8).  Only rounds strictly
        # before this one — a partially-committed attempt of THIS
        # round must not dedup against itself on resume.
        # Bloom gate: cumulative seen size from state (falls back to
        # parquet-footer sums for pre-r5 resumes — no Spark job)
        seen_size = state.get("seen_size")
        if seen_size is None:
            seen_size = sum(
                catalog.count_true("frontier", r, "is_new", spark=spark)
                for r in catalog.committed_rounds("frontier")
                if r < round_
            )
        use_bloom = cfg.bloom_prefilter and seen_size >= cfg.bloom_min_seen
        bloom_m = _bloom_m_bits(cfg, seen_size) if use_bloom else None
        if frontier_size < cfg.broadcast_dedup_max_frontier:
            # Bloom-prefiltered dedup: the seen-set (which grows every
            # round) is NEVER shuffled — it is scanned once (url column
            # only, is_new filter pushed into the parquet scan) against
            # a broadcast semi-join with this round's candidates, and
            # the small hit-set broadcasts back into a map-side
            # anti-join.  SURVEY §4.2: Bloom/anti-join split —
            # exactness always comes from the anti-join.
            seen_paths = [
                catalog.data_path("frontier", r)
                for r in catalog.committed_rounds("frontier")
                if r < round_
            ]
            seen = (
                spark.read.parquet(*seen_paths)
                .filter(F.col("is_new"))
                .select("url")
            )
            # Bloom routing in the broadcast branch too (r5): only
            # maybe-seen candidates enter the double-broadcast exact
            # check, shrinking both broadcasts (early rounds: almost
            # everything is definitely-new and skips them entirely).
            # The seen scan + double-broadcast shape is unchanged —
            # the seen side is still never shuffled.
            bloom_df = (
                _ensure_bloom(spark, catalog, cfg, round_ - 1, bloom_m)
                if use_bloom else None
            )
            if bloom_df is not None:
                from . import bloom as B

                if cfg.bloom_chained:
                    definitely_new, maybe = B.split_maybe_chained(
                        firsts, bloom_df, cfg.seen_buckets, cfg.bloom_k,
                    )
                else:
                    definitely_new, maybe = B.split_maybe(
                        firsts, bloom_df, cfg.seen_buckets,
                        bloom_m, cfg.bloom_k,
                    )
            else:
                definitely_new, maybe = None, firsts
            hits = seen.join(F.broadcast(maybe.select("url")), "url", "left_semi")
            new_items = maybe.join(F.broadcast(hits), "url", "left_anti")
            if definitely_new is not None:
                new_items = definitely_new.unionByName(new_items)
        else:
            # cluster-scale path: hash-bucketed seen TABLE.  The
            # SortMergeJoin reads the (huge, ever-growing) seen side
            # bucket-in-place with ZERO exchange; only this round's
            # candidates shuffle (to the bucket count).  Appends are
            # healed lazily up to round_-1, so crawls that crossed the
            # broadcast threshold mid-run bulk-load their history once,
            # and a crash between frontier commit and append is
            # invisible (manifest-committed appends only + vacuum).
            seen_tbl = _ensure_seen_table(spark, catalog, cfg, round_ - 1)
            bloom_df = (
                _ensure_bloom(spark, catalog, cfg, round_ - 1, bloom_m)
                if use_bloom else None
            )
            if bloom_df is not None:
                # Bloom split (bloom.py): definitely-new candidates
                # never touch the seen table; only maybe-seen rows
                # (true dups + fp rate) pay the exact anti-join.  The
                # bloom side is a committed parquet snapshot, so the
                # stats-based broadcast decision is accurate (sandbox
                # sizes broadcast; a 10^10-url filter co-partitions on
                # the bucket key instead).
                from . import bloom as B

                if cfg.bloom_chained:
                    new_items = B.prefilter_new_chained(
                        firsts, bloom_df, seen_tbl, cfg.seen_buckets,
                        cfg.bloom_k,
                    )
                else:
                    new_items = B.prefilter_new(
                        firsts, bloom_df, seen_tbl, cfg.seen_buckets,
                        bloom_m, cfg.bloom_k,
                    )
            else:
                new_items = firsts.join(seen_tbl, "url", "left_anti")

        # size the range exchange to the data: early rounds are tiny and
        # a single-partition window beats the two-phase sampling jobs
        npart = 1 if frontier_size < 100_000 else None
        new_frontier_items = global_sequence(
            new_items, ["parent_priority", "url"], "priority",
            start=state["next_priority"], num_partitions=npart,
        ).withColumn("sitemap_mode", F.lit(False)).select(
            *_FRONTIER_COLS,
            F.xxhash64("url").alias("url_hash"),
            F.lit(round_).alias("round"),
            F.lit(True).alias("is_new"),
        )

        # deferred rows entered the seen set when first enqueued —
        # re-snapshotting them must not re-mark them as deltas
        next_frontier = deferred.select(*_FRONTIER_COLS).select(
            "*",
            F.xxhash64("url").alias("url_hash"),
            F.lit(round_).alias("round"),
            F.lit(False).alias("is_new"),
        ).unionByName(new_frontier_items)
        catalog.write(next_frontier, "frontier", round_)
        _mark("discover_dedup_frontier")

        # ---- budget update: used' = min(max, used + Σ n_batches)
        # (skipped entirely for unlimited budget — table stays at r0)
        if budget_gated:
            spend = links.groupBy("site_id").agg(F.sum("n_batches").alias("spent"))
            new_budget = (
                budget.join(spend, "site_id", "left")
                .withColumn(
                    "used",
                    F.least(F.col("max"), F.col("used") + F.coalesce("spent", F.lit(0)).cast("int")),
                )
                .select("site_id", "used", "max")
            )
            catalog.write(new_budget, "budget", round_)

        # ---- error sink (S8): fetch misses — frontier rows that found
        # no corpus page — land in a per-round `errors` snapshot instead
        # of silently vanishing (ref error_repository.py:14-21, producer
        # crawler_service.py:62-70).  Computed ENTIRELY from committed
        # snapshots (pruned column reads, no UDF/window lineage
        # re-execution): missed = frontier(r-1) under the depth gate,
        # minus crawled(r), minus politeness-deferred rows (which were
        # re-snapshotted into frontier(r) with is_new=false).
        # Extraction itself is total (regex scanner), so fetch misses
        # are the only failure class here.
        if cfg.track_errors:
            prev = (
                catalog.read(spark, "frontier", round_ - 1)
                .filter(F.col("depth") < cfg.max_depth)
                .select("url", "host", "site_id", "depth", "priority")
            )
            not_missed = crawled_back.select("url")
            if cfg.politeness and has_delays:
                not_missed = not_missed.unionByName(
                    catalog.read(spark, "frontier", round_)
                    .filter(~F.col("is_new")).select("url")
                )
            misses = prev.join(not_missed, "url", "left_anti").select(
                "url", "host", "site_id", "depth",
                F.lit(round_).alias("round"), "priority",
                F.lit("fetch_miss").alias("reason"),
            )
            catalog.write(misses, "errors", round_)
            _mark("errors")

        # counts straight from the committed parquet footers / a single
        # driver-side column read — zero Spark jobs
        n_new = catalog.count_true("frontier", round_, "is_new", spark=spark)
        n_next = catalog.count("frontier", round_)
        new_state = {
            "next_priority": state["next_priority"] + n_new,
            "round": round_,
            "done": n_next == 0,
            "frontier_size": n_next,
            "seen_size": seen_size + n_new,
            # surfaced error count (parquet-footer read, no Spark job)
            "n_errors": (
                catalog.count("errors", round_) if cfg.track_errors else None
            ),
        }
        _mark("counts")
        if _timing:
            print(f"[phase] r{round_} {_phase_t}")
        catalog.write_state(round_, new_state)
        return new_state
    finally:
        pass


def crawl(
    spark: SparkSession,
    web_pages: DataFrame,
    seeds: "list[str] | DataFrame",
    snapshot_root: str,
    cfg: CrawlConfig | None = None,
    resume: bool = False,
    timings: dict | None = None,
) -> SnapshotCatalog:
    """Run (or resume) a full crawl; returns the snapshot catalog.

    Resume reads the latest committed driver state and continues from
    the following round — killed-mid-round work is invisible because
    manifests publish atomically (north_rule checkpoint requirement).
    """
    cfg = cfg or CrawlConfig()
    catalog = SnapshotCatalog(snapshot_root)

    state = None
    if resume:
        latest = catalog.latest_state()
        if latest is not None:
            state = latest[1]
    if state is None:
        t0 = time.time()
        state = seed_round(spark, catalog, web_pages, seeds, cfg)
        if timings is not None:
            timings["seed_sec"] = round(time.time() - t0, 2)

    # politeness machinery is skipped wholesale when no host declares a
    # crawl-delay (checked once, not per round)
    has_delays = False
    if cfg.politeness:
        robots = catalog.read(spark, "robots", 0)
        has_delays = not robots.filter(F.col("crawl_delay").isNotNull()).isEmpty()

    rounds_sec = 0.0
    while not state["done"] and state["round"] < cfg.max_rounds:
        t0 = time.time()
        state = run_round(
            spark, catalog, web_pages, cfg, state["round"] + 1, state,
            has_delays=has_delays,
        )
        dt = time.time() - t0
        rounds_sec += dt
        print(f"[crawl] round {state['round']} in {dt:.1f}s done={state['done']}")
        # self-maintaining chain fold (r8): a driver-side column-pruned
        # read of ONLY m_bits (the snapshot has ≤ buckets·generations
        # rows, so this is a few KB — the fat words arrays never load)
        # decides whether the chain earned its vacuum-cadence collapse;
        # the fold itself is the rewrite-safe catalog.write (fresh dir
        # + manifest swap)
        if (cfg.bloom_fold_gens and cfg.bloom_chained
                and cfg.bloom_prefilter):
            from . import bloom as B

            br = catalog.latest_round(B.BLOOM_TABLE)
            if (br is not None
                    and _bloom_generations(catalog, br)
                    >= cfg.bloom_fold_gens):
                tf = time.time()
                fold_bloom(spark, catalog, cfg, upto_round=br)
                fold_dt = time.time() - tf
                if timings is not None:
                    timings["fold_sec"] = round(
                        timings.get("fold_sec", 0.0) + fold_dt, 2)
                print(f"[crawl] folded bloom chain at round {br} "
                      f"in {fold_dt:.1f}s")
    if timings is not None:
        timings["rounds_sec"] = round(rounds_sec, 2)
    # finalize maintenance (r8): the crawl output flips read-heavy the
    # moment the loop exits — compact every committed round of the two
    # append-forever tables so crawled_all()/errors_all() open few
    # right-sized files instead of rounds×shuffle-partitions tiny ones.
    # Planning is parquet-footer-only and already-compacted rounds are
    # skipped, so a resume that adds nothing costs only footer reads.
    if cfg.compact_on_done and state["done"]:
        tc = time.time()
        stats = {}
        for table in ("crawled", "errors", "frontier"):
            stats.update({(table, r): v for r, v in
                          catalog.compact(spark, table).items()})
        if timings is not None:
            timings["compact_sec"] = round(time.time() - tc, 2)
        if stats:
            nb = sum(b for b, _ in stats.values())
            na = sum(a for _, a in stats.values())
            print(f"[crawl] compacted {len(stats)} snapshots: "
                  f"{nb} -> {na} files in {time.time() - tc:.1f}s")
    return catalog


def crawled_all(spark: SparkSession, catalog: SnapshotCatalog) -> DataFrame:
    """All crawled pages across rounds (url, site_id, base_url, text,
    depth, round, priority)."""
    paths = [catalog.data_path("crawled", r) for r in catalog.committed_rounds("crawled")]
    if not paths:
        return spark.createDataFrame([], CRAWLED_SCHEMA)
    return spark.read.schema(CRAWLED_SCHEMA).parquet(*paths)


ERRORS_SCHEMA = (
    "url string, host string, site_id string, depth int, round int, "
    "priority long, reason string"
)


def errors_all(spark: SparkSession, catalog: SnapshotCatalog) -> DataFrame:
    """All logged crawl errors across rounds (S8 sink)."""
    paths = [catalog.data_path("errors", r) for r in catalog.committed_rounds("errors")]
    if not paths:
        return spark.createDataFrame([], ERRORS_SCHEMA)
    return spark.read.schema(ERRORS_SCHEMA).parquet(*paths)


def seen_all(spark: SparkSession, catalog: SnapshotCatalog) -> DataFrame:
    """The URL-seen set = union of per-round frontier deltas
    (url, url_hash, site_id, depth, round)."""
    paths = [catalog.data_path("frontier", r) for r in catalog.committed_rounds("frontier")]
    return (
        spark.read.parquet(*paths)
        .filter(F.col("is_new"))
        .select("url", "url_hash", "site_id", "depth", "round")
    )
