"""Training-data pipeline operators over the generic corpus tables
(documents, embeddings): dedup families, similarity search, text
analysis, multimodal column plumbing.

These are first-class engine components for the 100 TB use case; each
has a ``queries()`` entry in __spark_entry__.py and (where ANSI-SQL
can express it) a DuckDB oracle."""
