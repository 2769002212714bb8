"""Pipeline-stage tests: chunk (X5), summary (X6), metadata
normalization (X9), and the crawl→chunk→embed→query chain (O6) —
each Spark stage vs the same pure kernel applied sequentially."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from doccrawler_spark.crawl import CrawlConfig, crawl, crawled_all
from doccrawler_spark.kernels.chunker import chunk_text, summary_chunk
from doccrawler_spark.pipeline import (
    all_chunks,
    build_vectors,
    chunk_pages,
    normalize_metadata,
    summary_chunks,
)
from doccrawler_spark.webgen import gen_seeds, tiny_spec, web_pages_pandas

WEB_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


@pytest.fixture(scope="module")
def crawled(spark, tmp_path_factory):
    spec = tiny_spec()
    web = spark.createDataFrame(web_pages_pandas(spec), schema=WEB_SCHEMA)
    seeds = [s["seed_url"] for s in gen_seeds(spec)]
    root = str(tmp_path_factory.mktemp("pipe")) + "/snap"
    catalog = crawl(spark, web, seeds, root, CrawlConfig(max_depth=3))
    return crawled_all(spark, catalog).cache()


def test_chunk_pages_matches_kernel(spark, crawled):
    rows = crawled.select("url", "site_id", "base_url", "text").collect()
    expected = {}
    for r in rows:
        for c in chunk_text(r["text"], href=r["url"], base_url=r["base_url"],
                            site_id=r["site_id"]):
            expected[(r["url"], c["chunk_ix"])] = c["chunked_data"]

    got = chunk_pages(crawled).collect()
    assert len(got) == len(expected)
    for g in got:
        assert g["chunked_data"] == expected[(g["url"], g["chunk_ix"])]
        assert g["is_summary"] is False
        assert g["metadata"]["href"] == g["url"]


def test_chunks_rehome_additional_snippets(spark, crawled):
    """Pages with hidden snippets get them spliced (X4) and the chunker
    must keep every fenced block — nothing lost end-to-end."""
    texts = {r["url"]: r["text"] for r in crawled.collect()}
    chunks = chunk_pages(crawled).collect()
    by_url = {}
    for c in chunks:
        by_url.setdefault(c["url"], []).append(c["chunked_data"])
    import re

    for url, text in texts.items():
        n_fences_in = len(re.findall(r"^```\w", text, re.MULTILINE))
        joined = "\n\n".join(by_url.get(url, []))
        n_fences_out = len(re.findall(r"^```\w", joined, re.MULTILINE))
        assert n_fences_in == n_fences_out, url


def test_summary_chunks_deterministic_top4(spark, crawled):
    got = {r["site_id"]: r for r in summary_chunks(crawled).collect()}
    pdf = crawled.select("site_id", "base_url", "url", "text").toPandas()
    for site_id, grp in pdf.groupby("site_id"):
        pages = sorted(
            zip(grp["url"], grp["text"]), key=lambda t: (-len(t[1]), t[0])
        )[:4]
        expected = summary_chunk(site_id, grp["base_url"].iloc[0],
                                 pages, top_n=4)
        g = got[site_id]
        assert g["chunked_data"] == expected["chunked_data"]
        assert g["is_summary"] is True


def test_normalize_metadata_rules(spark, crawled):
    chunks = all_chunks(crawled)
    norm = normalize_metadata(chunks)
    rows = norm.collect()
    # stable ids: unique, 64-hex
    ids = [r["id"] for r in rows]
    assert len(set(ids)) == len(ids)
    assert all(len(i) == 64 for i in ids)
    for r in rows:
        m = r["metadata"]
        # lowercase stringification (X9, upsert helper.py:37-155)
        assert m["has_code_snippet"] in ("true", "false")
        assert m["is_summary"] in ("true", "false")
        assert m["sdk_framework"] == m["sdk_framework"].lower()
        # empty version dropped
        assert m["version"] is None or m["version"].strip() != ""
        # chunked_data injected into metadata
        assert m["chunked_data"] == r["chunked_data"]
    # determinism: same input → same ids
    ids2 = [r["id"] for r in normalize_metadata(chunks).collect()]
    assert sorted(ids) == sorted(ids2)


def test_normalize_versions_and_supported_languages(spark):
    """X9 fidelity for the two reference fields added in r3
    (upsert_usecase/helper.py:59-117): exact sentinel drops
    (None/''/'none'/'null' — case-sensitive), lowercase
    stringification otherwise; supported_languages stringifies as
    str(list).lower() and drops when empty."""
    from doccrawler_spark.pipeline import CHUNKS_SCHEMA

    rows = [
        ("u0", "s", 0, "d", ("n", "b", "h", "sdk", False, "V2.1", "V1, V2",
                             ["Python", "JS"], [], []), False),
        ("u1", "s", 0, "d", ("n", "b", "h", "sdk", False, "", "none",
                             [], [], []), False),
        ("u2", "s", 0, "d", ("n", "b", "h", "sdk", False, "null", "None",
                             None, [], []), False),
    ]
    chunks = spark.createDataFrame(rows, CHUNKS_SCHEMA)
    got = {r["url"]: r["metadata"] for r in normalize_metadata(chunks).collect()}
    assert got["u0"]["version"] == "v2.1"
    assert got["u0"]["versions"] == "v1, v2"
    assert got["u0"]["supported_languages"] == "['python', 'js']"
    assert got["u1"]["version"] is None          # '' → dropped
    assert got["u1"]["versions"] is None         # 'none' → dropped
    assert got["u1"]["supported_languages"] is None  # [] → dropped
    assert got["u2"]["version"] is None          # 'null' → dropped
    assert got["u2"]["versions"] == "none"       # 'None' survives, lowered
    assert got["u2"]["supported_languages"] is None  # NULL → dropped


def test_embed_backend_executor_roundtrip(spark, crawled):
    """A custom registered backend must resolve INSIDE the executor
    Python workers (kernels/embed.py ship-code-not-weights contract):
    build_vectors with the dotted-path name runs the toy backend through
    a real pandas UDF and the vectors match driver-side recomputation."""
    from tests.toy_backend import toy_embed_batch

    chunks = chunk_pages(crawled).limit(20)
    vectors, _ = build_vectors(
        spark, chunks, dim=4, embed_backend="tests.toy_backend:toy_embed_batch"
    )
    rows = vectors.select("chunked_data", "values").collect()
    assert rows
    for r in rows:
        expected = toy_embed_batch([r["chunked_data"]], dim=4)[0]
        assert [round(float(x), 4) for x in r["values"]] == \
            [round(x, 4) for x in expected]


def test_full_pipeline_to_query(spark, crawled):
    from doccrawler_spark.query import hybrid_query

    chunks = all_chunks(crawled)
    vectors, stats = build_vectors(spark, chunks, dim=32)
    out = hybrid_query(vectors, "guide usage politeness", alpha=0.5,
                       top_k=10, top_n=5, stats=stats, dim=32)
    rows = out.collect()
    assert 0 < len(rows) <= 5
    scores = [r["rerank_score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
