"""Toy embedding backend used by the executor-resolution round-trip
test (test_pipeline.py::test_embed_backend_executor_roundtrip).

Import side effect registers under the name 'toy' — the documented
production pattern for real models (kernels/embed.py:73-91): put the
``register_embed_backend`` call at module scope in a module the job
ships (--py-files), so every executor Python worker registers its own
copy at import time.  Resolution inside the UDF then works either via
the registered name (when the worker imported this module) or via the
dotted path ``tests.toy_backend:toy_embed_batch``.
"""

from doccrawler_spark.kernels.embed import register_embed_backend


def toy_embed_batch(texts, dim: int = 4):
    """Deterministic non-hashing embedder: [len, vowels, digits, 1]
    truncated/padded to dim — trivially recomputable in the test."""
    out = []
    for t in texts:
        t = t or ""
        v = [
            float(len(t)),
            float(sum(c in "aeiou" for c in t.lower())),
            float(sum(c.isdigit() for c in t)),
            1.0,
        ]
        out.append((v + [0.0] * dim)[:dim])
    return out


register_embed_backend("toy", toy_embed_batch)
