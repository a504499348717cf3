from pg_vectorize_spark.sources.parquet_snapshot import SnapshotDataset

__all__ = ["SnapshotDataset"]
