"""doccrawler_spark — a PySpark-native distributed crawl/analytics engine.

A from-scratch reimplementation of the query and data-processing
capabilities of the DocCrawler reference (FastAPI + asyncio doc-site
crawler; see SURVEY.md) as an idiomatic Spark engine:

* URL frontier + fetch scheduler as round-synchronous DataFrame jobs
  (frontier anti-join against a partitioned seen-set, per-host
  politeness quotas, skew salting for hot hosts).
* All Python confined to Arrow-vectorized pandas UDFs (extraction,
  link discovery, chunking, embeddings) — no per-row Python.
* Crawl state checkpointed as numbered parquet snapshots with atomic
  JSON manifests (Iceberg-shaped; the offline backend mirrors snapshot
  semantics so any round is resumable).
* Query side: hybrid (dense+sparse, alpha-weighted) top-k retrieval
  with metadata filters and a rerank stage.
* Training-data ops: exact/minhash/simhash dedup, ANN similarity
  search, text quality/language stats, multimodal column plumbing.
"""

__version__ = "0.1.0"
