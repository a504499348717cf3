from pg_vectorize_spark.streaming.incremental import RealtimePipeline

__all__ = ["RealtimePipeline"]
