"""Query-side equivalence: Spark hybrid top-k vs a pure-Python
brute-force oracle using the same kernels (SURVEY.md §5.2 item 3f)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from doccrawler_spark.kernels import embed as K
from doccrawler_spark.pipeline import build_vectors, fit_bm25_distributed
from doccrawler_spark.query import filters_to_predicates, hybrid_query

DOCS = [
    ("u0", "siteA", "spark shuffle partitions and broadcast joins", False),
    ("u1", "siteA", "vector database index upsert with sparse values", True),
    ("u2", "siteB", "python sdk quickstart install and run", False),
    ("u3", "siteB", "hybrid dense sparse retrieval alpha weighting", False),
    ("u4", "siteB", "robots politeness crawl delay frontier", True),
    ("u5", "siteA", "spark shuffle partitions tuning guide for joins", False),
]


@pytest.fixture(scope="module")
def vectors(spark):
    rows = [
        {
            "url": u, "site_id": s, "chunk_ix": 0, "chunked_data": t,
            "metadata": {
                "sdk_framework_name": s, "base_url": s, "href": u,
                "sdk_framework": "sdk" if code else "framework",
                "has_code_snippet": code, "version": None,
                "domains": [], "subdomains": [],
            },
            "is_summary": False,
        }
        for u, s, t, code in DOCS
    ]
    from doccrawler_spark.pipeline import CHUNKS_SCHEMA

    chunks = spark.createDataFrame(pd.DataFrame(rows), schema=CHUNKS_SCHEMA)
    vec, stats = build_vectors(spark, chunks, dim=32)
    return vec.cache(), stats


def _python_oracle(query, alpha, top_k, stats, dim=32, only=None):
    import numpy as np

    dq = K.dense_embed(query, dim)
    qi, qv = K.bm25_encode_query(query, stats)
    scored = []
    for u, s, t, code in DOCS:
        if only and not only(u, s, t, code):
            continue
        # the vectors table stores doc-side values as float32 — mirror
        # that storage rounding before the double-precision dot
        dd = np.asarray(K.dense_embed(t, dim), dtype=np.float32).astype(float)
        si, sv = K.bm25_encode_document(t, stats)
        sv = np.asarray(sv, dtype=np.float32).astype(float).tolist()
        scored.append((u, K.hybrid_score(dq, dd, qi, qv, si, sv, alpha)))
    scored.sort(key=lambda x: (-x[1], x[0]))
    return scored[:top_k]


@pytest.mark.parametrize("alpha", [0.0, 0.5, 1.0])
def test_hybrid_matches_python_oracle(spark, vectors, alpha):
    vec, stats = vectors
    q = "spark shuffle joins"
    got = hybrid_query(
        vec, q, alpha=alpha, top_k=4, stats=stats, dim=32, rerank=False
    ).collect()
    want = _python_oracle(q, alpha, 4, stats)
    assert [r["url"] for r in got] == [u for u, _ in want]
    for r, (_, score) in zip(got, want):
        assert abs(r["score"] - score) < 1e-9


def test_metadata_filters(spark, vectors):
    vec, stats = vectors
    # bool filter → lowercase string eq (X9 normalization)
    got = hybrid_query(
        vec, "sdk install", alpha=0.5, top_k=10,
        filters={"has_code_snippet": True}, stats=stats, dim=32, rerank=False,
    ).collect()
    assert {r["url"] for r in got} == {"u1", "u4"}
    # str filter → isin
    got = hybrid_query(
        vec, "anything", alpha=1.0, top_k=10,
        filters={"sdk_framework_name": "sitea"}, stats=stats, dim=32,
        rerank=False,
    ).collect()
    assert {r["url"] for r in got} == {"u0", "u1", "u5"}
    # None filter → isNull (version was normalized away)
    got = hybrid_query(
        vec, "anything", alpha=1.0, top_k=10, filters={"version": None},
        stats=stats, dim=32, rerank=False,
    ).collect()
    assert len(got) == len(DOCS)


def test_array_metadata_filters(spark):
    """Pinecone $in against a LIST-typed metadata field matches on
    element OVERLAP (query_usecase.py:41-62 builds {"$in": v} for
    lists) — not Column.isin, which is invalid on array columns."""
    from doccrawler_spark.pipeline import CHUNKS_SCHEMA

    rows = [
        {
            "url": u, "site_id": "s", "chunk_ix": 0, "chunked_data": t,
            "metadata": {
                "sdk_framework_name": "s", "base_url": "s", "href": u,
                "sdk_framework": "sdk", "has_code_snippet": False,
                "version": None, "domains": doms, "subdomains": [],
            },
            "is_summary": False,
        }
        for u, t, doms in [
            ("u0", "alpha text", ["ML", "Data"]),
            ("u1", "beta text", ["Web"]),
            ("u2", "gamma text", []),
        ]
    ]
    chunks = spark.createDataFrame(pd.DataFrame(rows), schema=CHUNKS_SCHEMA)
    vec, stats = build_vectors(spark, chunks, dim=32)
    # list filter → arrays_overlap (domains are lowercased by X9)
    got = hybrid_query(
        vec, "text", alpha=1.0, top_k=10,
        filters={"domains": ["ml", "search"]}, stats=stats, dim=32, rerank=False,
    ).collect()
    assert {r["url"] for r in got} == {"u0"}
    # str filter on an array field → array_contains
    got = hybrid_query(
        vec, "text", alpha=1.0, top_k=10,
        filters={"domains": "web"}, stats=stats, dim=32, rerank=False,
    ).collect()
    assert {r["url"] for r in got} == {"u1"}
    # no overlap → empty
    got = hybrid_query(
        vec, "text", alpha=1.0, top_k=10,
        filters={"domains": ["nosuch"]}, stats=stats, dim=32, rerank=False,
    ).collect()
    assert got == []


def test_rerank_ordering(spark, vectors):
    vec, stats = vectors
    q = "politeness crawl frontier"
    got = hybrid_query(
        vec, q, alpha=0.5, top_k=6, top_n=3, stats=stats, dim=32, rerank=True
    ).collect()
    assert len(got) == 3
    assert got[0]["url"] == "u4"  # all 3 query tokens present
    rr = [r["rerank_score"] for r in got]
    assert rr == sorted(rr, reverse=True)
    # engine rerank equals the kernel scorer
    for r in got:
        text = dict((u, t) for u, s, t, c in DOCS)[r["url"]]
        assert abs(r["rerank_score"] - K.rerank_score(q, text)) < 1e-9


def test_distributed_bm25_fit_matches_kernel(spark, vectors):
    vec, stats = vectors
    texts = [t for _, _, t, _ in DOCS]
    kstats = K.fit_bm25(texts)
    assert stats.n_docs == kstats.n_docs
    assert abs(stats.avgdl - kstats.avgdl) < 1e-9
    assert stats.idf == pytest.approx(kstats.idf)


def test_embed_backend_registry():
    K.register_embed_backend(
        "scaled", lambda texts, dim: [
            [2.0 * x for x in K.dense_embed(t, dim)] for t in texts
        ],
    )
    out = K.get_embed_backend("scaled")(["hello world"], 8)
    base = K.dense_embed("hello world", 8)
    assert out[0] == [2.0 * x for x in base]
    assert K.get_embed_backend() is K.dense_embed_batch
    with pytest.raises(ValueError, match="unknown embed backend"):
        K.get_embed_backend("nope")


def test_filter_dialect_shapes():
    preds = filters_to_predicates(
        {"a": "x", "b": ["x", "y"], "c": True, "d": None}
    )
    assert len(preds) == 4
