"""Source reader — file-format dispatch for job source tables.

The reference's sources are Postgres relations (core/src/query.rs source
SQL); the Spark analog is any path the DataFrame reader understands, or a
registered table/view name. ``read_source`` dispatches:

- ``format='auto'`` (default): a registered table name if the path does
  not exist on disk; otherwise by extension — .csv -> csv (header +
  schema inference), .json/.jsonl/.ndjson -> json lines, .orc -> orc,
  anything else (including directories) -> parquet;
- explicit ``format='parquet'|'csv'|'json'|'orc'|'table'`` overrides
  inference.

CSV/JSON inference runs an extra pass at read time; production jobs over
big data should land parquet (columnar pruning + pushdown) — the text
formats exist for ingestion parity, and every downstream operator is
format-agnostic once the DataFrame exists.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from pg_vectorize_spark.errors import VectorizeError

_TEXT_JSON_EXTS = (".json", ".jsonl", ".ndjson")


def read_source(
    spark: SparkSession, path: str, source_format: str = "auto"
) -> DataFrame:
    fmt = (source_format or "auto").lower()
    if fmt == "table":
        return spark.table(path)
    if fmt == "auto":
        if not os.path.exists(path):
            return spark.table(path)
        lower = path.lower()
        if lower.endswith(".csv"):
            fmt = "csv"
        elif lower.endswith(_TEXT_JSON_EXTS):
            fmt = "json"
        elif lower.endswith(".orc"):
            fmt = "orc"
        else:
            fmt = "parquet"
    if fmt == "parquet":
        # plan-handle cache behind a RECURSIVE (externally-written
        # sources have no version pointer) freshness stamp — repeated
        # serving-path reads skip re-resolving an unchanged layout;
        # non-local or oversized trees stamp None and are never cached
        # (plan_cache module docstring; r13 optimization round)
        from pg_vectorize_spark.plan_cache import (
            cached_parquet_scan,
            tree_stamp,
        )

        return cached_parquet_scan(spark, path, tree_stamp(path))
    if fmt == "csv":
        return spark.read.csv(path, header=True, inferSchema=True)
    if fmt == "json":
        return spark.read.json(path)
    if fmt == "orc":
        return spark.read.orc(path)
    raise VectorizeError(
        f"unknown source format {source_format!r} "
        "(expected auto|parquet|csv|json|orc|table)"
    )
