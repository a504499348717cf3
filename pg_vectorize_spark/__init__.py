"""pg_vectorize_spark — a PySpark-native vector / full-text / hybrid search
and training-data-pipeline engine.

A ground-up re-design of the query and data-processing capabilities of
ChuckHend/pg_vectorize (a Postgres extension + REST server that generates SQL
for pgvector / tsvector search and runs an incremental embedding pipeline),
re-expressed on the Spark DataFrame/SQL stack:

- job catalog + per-job embeddings/search-tokens tables  -> parquet datasets
  (reference: core/src/query.rs:205-220, 322-357)
- incremental embedding pipeline (change detection, batching, provider calls,
  upsert)                                                -> DataFrame anti-joins,
  mapInPandas/JVM hashing embedder, merge-style parquet sinks
  (reference: core/src/init.rs:272-315, worker/src/executor.rs)
- semantic / full-text / hybrid-RRF search with typed filters
  (reference: core/src/query.rs:653-785)                 -> Catalyst plans with
  broadcast query vectors, row_number windows, full-outer rank fusion
- RAG: retrieve -> prompt render -> chat completion
  (reference: extension/src/chat/ops.rs:20-126)
- training-data-pipeline extensions (not in the reference, first-class here):
  exact / MinHash-LSH / SimHash / n-gram-Jaccard / embedding-cosine dedup,
  ANN search, language-ID, quality scoring, token counting, fingerprinting,
  chunking, multimodal binary-column plumbing.
"""

from pg_vectorize_spark.version import __version__


def __getattr__(name):
    # lazy import: keep `import pg_vectorize_spark` cheap (no SparkSession
    # machinery) while exposing the main entry points at top level
    if name == "VectorizeSession":
        from pg_vectorize_spark.engine import VectorizeSession

        return VectorizeSession
    if name == "Catalog":
        from pg_vectorize_spark.catalog import Catalog

        return Catalog
    if name == "JobRecord":
        from pg_vectorize_spark.catalog import JobRecord

        return JobRecord
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


__all__ = ["__version__", "VectorizeSession", "Catalog", "JobRecord"]
