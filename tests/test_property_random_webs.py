"""Property/randomized tests (SURVEY.md §5.2 item 4): seeded random
web specs with cycles, duplicate links, cross-site links, fragments,
dead links and deep chains; engine must equal oracle on every one and
the crawl invariants must hold."""

import os

import pytest

from doccrawler_spark.crawl import CrawlConfig, crawl, crawled_all, seen_all
from doccrawler_spark.webgen import SiteSpec, WebSpec, gen_seeds, web_pages_pandas
from tests.oracle import OracleConfig, SequentialOracle

SPECS = [
    WebSpec(seed=7, sites=(
        SiteSpec("docs.a7.test", 25, branching=2, extra_links=4),
        SiteSpec("docs.b7.test", 35, branching=5, extra_links=1,
                 disallow=("/doc/1",), crawl_delay=15.0),
        SiteSpec("docs.c7.test", 20, sitemap=True, sitemap_size=20),
    )),
    WebSpec(seed=99, sites=(
        SiteSpec("docs.a99.test", 60, branching=7, extra_links=5),
        SiteSpec("docs.b99.test", 10, branching=1, extra_links=0),
    )),
]


@pytest.mark.parametrize("spec_ix", range(len(SPECS)))
def test_random_web_equivalence_and_invariants(spark, tmp_path, spec_ix):
    spec = SPECS[spec_ix]
    pdf = web_pages_pandas(spec)
    web = spark.createDataFrame(
        pdf, schema="url string, warc_ts timestamp, html binary, text string, lang string"
    )
    pages = {r["url"]: bytes(r["html"]).decode() for _, r in pdf.iterrows()}
    seeds = [s["seed_url"] for s in gen_seeds(spec)]

    cfg_kw = dict(max_depth=4, budget_per_site=6, politeness=True,
                  round_seconds=60.0)
    oracle = SequentialOracle(pages, OracleConfig(**cfg_kw)).run(seeds)
    catalog = crawl(spark, web, seeds, os.path.join(str(tmp_path), "s"),
                    CrawlConfig(**cfg_kw))

    eng = crawled_all(spark, catalog).orderBy("priority").collect()
    o = sorted(oracle.crawled, key=lambda r: r["priority"])
    assert [(r["url"], r["site_id"], r["depth"], r["round"], r["priority"])
            for r in eng] == [
        (r["url"], r["site_id"], r["depth"], r["round"], r["priority"]) for r in o
    ]
    assert all(e["text"] == g["text"] for e, g in zip(eng, o))

    seen = {r["url"] for r in seen_all(spark, catalog).collect()}
    assert seen == oracle.seen

    # invariants
    urls_per_site = {}
    for r in eng:
        key = (r["url"], r["site_id"])
        assert key not in urls_per_site, f"double fetch {key}"
        urls_per_site[key] = True
        assert r["depth"] < 4
    # budget never exceeded
    budget = {r["site_id"]: r["used"] for r in catalog.read(spark, "budget").collect()}
    assert all(v <= 6 for v in budget.values())
    assert budget == oracle.budget
