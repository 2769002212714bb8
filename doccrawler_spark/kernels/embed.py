"""Embedding kernels: deterministic dense embedder + BM25 sparse encoder.

Reference behaviors re-expressed:
  * dense: ``TextEmbedding('BAAI/bge-base-en-v1.5')`` batches of 24
    (src/app/services/embed_service.py:55-93).  The model itself is not
    in this container, so the default backend is a deterministic
    feature-hashing projection (classic hashing trick) with the same
    interface and a pluggable real-model hook; dim configurable
    (768 to mirror bge-base, 64 in fast tests).
  * sparse: ``BM25Encoder.encode_documents/encode_queries``
    (embed_service.py:25-53) → ``{indices, values}``.  Implemented as
    standard Okapi BM25 (k1=1.2, b=0.75) over a corpus-stats object
    that Spark broadcasts once (the reference pickles its fitted
    encoder, src/app/config/load_bm25.py:15-44).
  * hybrid alpha weighting: dense*α, sparse*(1-α)
    (src/app/services/pinecone_service.py:119-129).
"""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter

import numpy as np

_TOKEN_RE = re.compile(r"[a-z0-9]+")


def tokenize(text: str) -> list[str]:
    return _TOKEN_RE.findall(text.lower())


# ---------------------------------------------------------------- dense


# Per-process memo of token → (u32, sign): every hashing-trick consumer
# (dense slot, BM25 term id) derives from the SAME md5 prefix, so one
# digest per DISTINCT token per worker serves them all.  Capped so an
# adversarial unbounded vocabulary cannot grow worker memory without
# bound; past the cap tokens just hash uncached (correctness
# unchanged).  Worker processes are reused across tasks
# (spark.python.worker.reuse), so the memo amortizes across batches,
# tasks and queries.
_TOKEN_MEMO: dict[str, tuple[int, float]] = {}
_TOKEN_MEMO_CAP = 1 << 20


def _token_hash(token: str) -> tuple[int, float]:
    """(first-4-bytes-of-md5 as uint32, ±1.0 sign from byte 4)."""
    got = _TOKEN_MEMO.get(token)
    if got is not None:
        return got
    h = hashlib.md5(token.encode("utf-8")).digest()
    out = (int.from_bytes(h[:4], "big"), 1.0 if h[4] & 1 else -1.0)
    if len(_TOKEN_MEMO) < _TOKEN_MEMO_CAP:
        _TOKEN_MEMO[token] = out
    return out


def _token_slot(token: str, dim: int) -> tuple[int, float]:
    u32, sign = _token_hash(token)
    return u32 % dim, sign


def dense_embed(text: str, dim: int = 64) -> list[float]:
    """Deterministic hashing-trick embedding, L2-normalized."""
    v = np.zeros(dim, dtype=np.float64)
    for tok in tokenize(text):
        idx, sign = _token_slot(tok, dim)
        v[idx] += sign
    n = float(np.linalg.norm(v))
    if n > 0:
        v /= n
    return v.tolist()


def dense_embed_batch(texts, dim: int = 64) -> list[list[float]]:
    return [dense_embed(t, dim) for t in texts]


# ------------------------------------------------- pluggable backends
#
# The reference embeds with fastembed TextEmbedding
# ('BAAI/bge-base-en-v1.5', batches of 24, embed_service.py:55-93).
# That model isn't in this container, so the default backend is the
# deterministic hashing projection above; a real model plugs in by
# registering a batch fn under a name — executors resolve the backend
# BY NAME inside the pandas UDF (never pickle model weights into the
# plan; each Python worker loads/caches its own copy).

_EMBED_BACKENDS: dict = {"hashing": dense_embed_batch}


def register_embed_backend(name: str, batch_fn) -> None:
    """Register ``batch_fn(texts: list[str], dim: int) -> list[list
    [float]]`` as an embedding backend selectable by name.

    Registration must also run on the EXECUTORS (the UDF resolves by
    name in the worker process): put the ``register_embed_backend``
    call at module scope in a module your job imports and ship it via
    ``spark-submit --py-files`` with the rest of the package."""
    _EMBED_BACKENDS[name] = batch_fn


def get_embed_backend(name: str = "hashing"):
    """Resolve a backend by registered name, or by dotted path
    ``"pkg.module:attr"`` — the import runs in WHICHEVER process calls
    this (each executor's Python worker resolves its own copy), which
    is exactly the ship-code-not-weights contract: the driver never
    pickles a model into the plan, workers import it by name."""
    try:
        return _EMBED_BACKENDS[name]
    except KeyError:
        pass
    if ":" in name:
        import importlib

        mod_name, attr = name.split(":", 1)
        fn = getattr(importlib.import_module(mod_name), attr)
        _EMBED_BACKENDS[name] = fn  # per-process cache
        return fn
    raise ValueError(
        f"unknown embed backend {name!r}; registered: "
        f"{sorted(_EMBED_BACKENDS)} (or use 'pkg.module:attr')"
    )


def _fastembed_batch(texts, dim: int = 768) -> list[list[float]]:
    """Real-model backend (bge-base-en-v1.5 via fastembed), mirroring
    embed_service.py:55-93 — import-gated: available only where the
    fastembed wheel + model weights exist on the executors."""
    try:
        from fastembed import TextEmbedding  # type: ignore
    except ImportError as e:  # pragma: no cover - not in this container
        raise RuntimeError(
            "fastembed is not installed; use the 'hashing' backend or "
            "register a custom one via register_embed_backend()"
        ) from e
    model = _fastembed_batch.__dict__.setdefault(  # per-worker cache
        "_model", TextEmbedding("BAAI/bge-base-en-v1.5")
    )
    out = []
    for i in range(0, len(texts), 24):  # reference batch size
        out.extend(v.tolist() for v in model.embed(texts[i:i + 24]))
    return out


register_embed_backend("fastembed", _fastembed_batch)


# ---------------------------------------------------------------- BM25


class BM25Stats:
    """Corpus statistics for BM25 (fit once, broadcast to executors)."""

    __slots__ = ("idf", "avgdl", "k1", "b", "n_docs")

    def __init__(self, idf: dict[int, float], avgdl: float, n_docs: int,
                 k1: float = 1.2, b: float = 0.75) -> None:
        self.idf = idf
        self.avgdl = avgdl
        self.n_docs = n_docs
        self.k1 = k1
        self.b = b

    def to_dict(self) -> dict:
        return {"idf": self.idf, "avgdl": self.avgdl, "n_docs": self.n_docs,
                "k1": self.k1, "b": self.b}

    @classmethod
    def from_dict(cls, d: dict) -> "BM25Stats":
        return cls({int(k): v for k, v in d["idf"].items()},
                   d["avgdl"], d["n_docs"], d["k1"], d["b"])


def term_id(token: str) -> int:
    """Stable 31-bit term id (sparse vector index)."""
    return _token_hash(token)[0] & 0x7FFFFFFF


def embed_doc_hashing(
    text: str, dim: int, avgdl: float, k1: float = 1.2, b: float = 0.75,
) -> tuple[list[float], list[int], list[float]]:
    """One-pass dense + BM25 document encode (r9): tokenize ONCE,
    aggregate with Counter (C speed), then touch each DISTINCT token
    once through the md5 memo — the split dense/sparse UDFs tokenized
    and md5-hashed every token occurrence twice per doc.

    Bit-identical to ``dense_embed`` + ``bm25_encode_document``: the
    dense slot sums are exact small integers in float64 (adding
    sign·count equals adding sign count times in any order), the same
    ``np.linalg.norm`` normalizes, and the BM25 arithmetic is the
    same expression over the same integer tf."""
    toks = tokenize(text)
    dl = len(toks)
    v = np.zeros(dim, dtype=np.float64)
    tf: dict[int, int] = {}
    for tok, c in Counter(toks).items():
        u32, sign = _token_hash(tok)
        v[u32 % dim] += sign * c
        tid = u32 & 0x7FFFFFFF
        tf[tid] = tf.get(tid, 0) + c
    n = float(np.linalg.norm(v))
    if n > 0:
        v /= n
    norm = k1 * (1.0 - b + b * dl / avgdl)
    indices = sorted(tf)
    values = [tf[i] * (k1 + 1.0) / (tf[i] + norm) for i in indices]
    return v.tolist(), indices, values


def fit_bm25(texts) -> BM25Stats:
    """Fit document frequencies over a corpus (driver- or agg-side)."""
    df: dict[int, int] = {}
    total_len = 0
    n = 0
    for t in texts:
        toks = tokenize(t)
        total_len += len(toks)
        n += 1
        for tid in {term_id(tok) for tok in toks}:
            df[tid] = df.get(tid, 0) + 1
    idf = {
        tid: math.log((n - d + 0.5) / (d + 0.5) + 1.0) for tid, d in df.items()
    }
    return BM25Stats(idf, (total_len / n) if n else 1.0, n)


def bm25_encode_document(text: str, stats: BM25Stats) -> tuple[list[int], list[float]]:
    """Doc-side BM25 weights: tf-saturated, length-normalized."""
    toks = tokenize(text)
    dl = len(toks)
    tf: dict[int, int] = {}
    for tok in toks:
        tid = term_id(tok)
        tf[tid] = tf.get(tid, 0) + 1
    k1, b = stats.k1, stats.b
    norm = k1 * (1.0 - b + b * dl / stats.avgdl)
    indices = sorted(tf)
    values = [tf[i] * (k1 + 1.0) / (tf[i] + norm) for i in indices]
    return indices, values


def bm25_encode_query(text: str, stats: BM25Stats) -> tuple[list[int], list[float]]:
    """Query-side BM25 weights: idf per distinct term."""
    tids = sorted({term_id(tok) for tok in tokenize(text)})
    return tids, [stats.idf.get(t, 0.0) for t in tids]


# ---------------------------------------------------------------- hybrid


def sparse_dot(idx_a, val_a, idx_b, val_b) -> float:
    """Dot product of two sorted sparse vectors."""
    i = j = 0
    s = 0.0
    while i < len(idx_a) and j < len(idx_b):
        if idx_a[i] == idx_b[j]:
            s += val_a[i] * val_b[j]
            i += 1
            j += 1
        elif idx_a[i] < idx_b[j]:
            i += 1
        else:
            j += 1
    return s


def hybrid_score(dense_q, dense_d, sq_idx, sq_val, sd_idx, sd_val, alpha: float) -> float:
    """α·dense_dot + (1-α)·sparse_dot (pinecone_service.py:119-178)."""
    if not 0.0 <= alpha <= 1.0:
        raise ValueError("alpha must be in [0, 1]")
    dd = float(np.dot(np.asarray(dense_q), np.asarray(dense_d)))
    sd = sparse_dot(sq_idx, sq_val, sd_idx, sd_val)
    return alpha * dd + (1.0 - alpha) * sd


def rerank_score(query: str, doc: str) -> float:
    """Deterministic lexical-overlap reranker (Q6 stand-in for the Jina
    cross-encoder, src/app/services/jina_reranker_service.py:17-41)."""
    q = set(tokenize(query))
    if not q:
        return 0.0
    d = set(tokenize(doc))
    return len(q & d) / len(q)
