"""Similarity search over ``embeddings(vec_id, embedding ARRAY<FLOAT>,
label)``: brute-force cosine top-k (the exact baseline) and a
sign-bucketed LSH variant (the scale path).

Everything is JVM-native (zip_with/aggregate HOFs) — no Python in the
scoring loop.  At cluster scale the brute-force path is a single
map-side scan + TakeOrderedAndProject (per-partition top-k then merge,
which Catalyst emits for orderBy+limit automatically)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x,
    )


def _norm(c):
    return F.sqrt(
        F.aggregate(
            F.transform(c, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0), lambda a, x: a + x,
        )
    )


def cosine_topk(
    embeddings: DataFrame, query_vec: list[float], k: int = 10
) -> DataFrame:
    """Exact brute-force cosine top-k against a literal query vector."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    qn = sum(x * x for x in query_vec) ** 0.5
    cos = _dot(F.col("embedding"), q) / (F.lit(qn) * _norm(F.col("embedding")))
    return (
        embeddings.withColumn("cosine", F.round(cos, 6))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
        .select("vec_id", "label", "cosine")
    )


def sign_bucket(col, n_bits: int = 8, offset: int = 0):
    """LSH bucket = sign bits of dims [offset, offset+n_bits).

    Deterministic and portable (the DuckDB oracle computes the same
    key); a production variant would use seeded random hyperplanes —
    same plan shape, different projection.  F.get (not getItem): short
    vectors pad with "0" instead of throwing under ANSI."""
    return F.concat_ws(
        "",
        *[
            F.when(F.get(col, offset + i) >= 0, F.lit("1")).otherwise(F.lit("0"))
            for i in range(n_bits)
        ],
    )


def lsh_topk(
    embeddings: DataFrame, query_vec: list[float], k: int = 10,
    n_bits: int = 8, n_tables: int = 4,
) -> DataFrame:
    """Multi-table ANN top-k: table t buckets on the sign bits of dims
    [t·n_bits, (t+1)·n_bits); candidates = vectors matching the query's
    key in ANY table (standard OR-amplified LSH — recall rises with
    n_tables, candidate volume ≈ n_tables·n/2^n_bits), then exact
    cosine + TakeOrderedAndProject.

    Scale path: ONE scan with an OR-of-equalities predicate (codegen'd,
    no explode); with bucket keys as cluster/partition columns the scan
    prunes to n_tables buckets."""
    n_tables = max(1, min(n_tables, len(query_vec) // n_bits))

    def qkey(t: int) -> str:
        return "".join(
            "1" if x >= 0 else "0"
            for x in query_vec[t * n_bits:(t + 1) * n_bits]
        )

    pred = None
    for t in range(n_tables):
        p = sign_bucket(F.col("embedding"), n_bits, t * n_bits) == qkey(t)
        pred = p if pred is None else (pred | p)
    return cosine_topk(embeddings.filter(pred), query_vec, k)


def _argmax_cell(emb_col, centroids: list[list[float]]):
    """Cell id = index of the max-dot centroid (ties → smallest id).
    Centroids are L2-normalized literals folded into the plan, so the
    assignment is one codegen'd expression per row — no join."""
    scores = F.array(*[
        _dot(emb_col, F.array(*[F.lit(float(x)) for x in c]))
        for c in centroids
    ])
    return (F.array_position(scores, F.array_max(scores)) - 1).cast("int")


def ivf_topk(
    embeddings: DataFrame, query_vec: list[float], k: int = 10,
    n_cells: int = 8, n_probe: int = 2,
) -> DataFrame:
    """IVF ANN top-k: a coarse quantizer (data-sampled centroids — the
    first ``n_cells`` vectors by vec_id, L2-normalized) partitions the
    corpus into cells; the query scores only the ``n_probe`` cells whose
    centroids it is closest to.  Exact cosine + TakeOrderedAndProject
    inside the probed cells.

    Scale path: cell assignment is write-time work (the cell id is a
    partition/cluster column), so a query scans n_probe/n_cells of the
    data; centroids are a driver-side sample (bounded collect), the
    classic IVF train-on-sample pattern."""
    import math

    rows = embeddings.orderBy("vec_id").limit(n_cells).collect()
    cents = []
    for r in rows:
        v = [float(x) for x in r["embedding"]]
        n = math.sqrt(sum(x * x for x in v)) or 1.0
        cents.append([x / n for x in v])

    qscores = [sum(q * c for q, c in zip(query_vec, cc)) for cc in cents]
    probes = sorted(range(len(cents)), key=lambda j: (-qscores[j], j))[:n_probe]

    celled = embeddings.withColumn("cell", _argmax_cell(F.col("embedding"), cents))
    return cosine_topk(
        celled.filter(F.col("cell").isin(probes)), query_vec, k
    )


def knn_join(
    embeddings: DataFrame, queries: DataFrame, k: int = 5, n_bits: int = 4
) -> DataFrame:
    """Bulk ANN: for every query vector, its top-k neighbors from the
    corpus, joined within sign buckets then windowed per query.

    queries: (q_id, q_emb ARRAY<FLOAT>).  The bucket equi-join replaces
    the all-pairs cross join; the per-query top-k is a window over the
    bucket-joined candidates (bounded per query)."""
    from pyspark.sql import Window

    c = embeddings.withColumn("bucket", sign_bucket(F.col("embedding"), n_bits))
    q = queries.withColumn("bucket", sign_bucket(F.col("q_emb"), n_bits))
    cos = _dot(F.col("embedding"), F.col("q_emb")) / (
        _norm(F.col("embedding")) * _norm(F.col("q_emb"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        q.join(c, "bucket")
        .withColumn("cosine", F.round(cos, 6))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "vec_id", "rank", "cosine")
    )
