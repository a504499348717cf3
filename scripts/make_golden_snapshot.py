"""Freeze a complete job workspace (catalog JSON + embeddings/tokens
snapshot parquet + source parquet) as a committed fixture, plus the exact
search results the current engine produces over it.

The cross-version pin the reference enforces with ``test_static``
(extension/tests/integration_tests.rs:390-481): a job created by an older
engine build must keep working — and keep returning the same results —
after an upgrade. tests/test_golden_snapshot.py opens this fixture with
the CURRENT engine and compares against expected.json; any change to the
storage layout, catalog schema, tokenizer, embedder, or scoring math fails
loudly. Regenerate (and commit the diff) only for INTENTIONAL format
changes: python scripts/make_golden_snapshot.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys

sys.path.insert(0, "/root/repo")

FIXTURE = "/root/repo/tests/fixtures/golden_job"

DOCS = [
    (1, "spark shuffles data between executors", "infra", 10.0),
    (2, "parquet stores columns not rows", "storage", 12.5),
    (3, "embeddings map text into vector space", "ml", 8.0),
    (4, "the catalyst optimizer rewrites query plans", "infra", 11.0),
    (5, "tokens feed the full text search index", "search", 7.5),
    (6, "vectors support cosine similarity search", "ml", 9.0),
    (7, "snapshots version the embedding table", "storage", 6.0),
    (8, "hybrid search fuses semantic and keyword ranks", "search", 13.0),
    (9, "broadcast joins avoid shuffling small tables", "infra", 5.5),
    (10, "reciprocal rank fusion combines result lists", "search", 14.0),
]

SEARCHES = {
    "semantic": dict(query="vector similarity search", num_results=5),
    "fts": dict(query="search index ranks", num_results=5),
    "hybrid": dict(query="semantic vector search", num_results=5),
}


def main() -> None:
    from pyspark.sql import SparkSession

    from pg_vectorize_spark.engine import VectorizeSession

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    shutil.rmtree(FIXTURE, ignore_errors=True)
    os.makedirs(FIXTURE)
    src = f"{FIXTURE}/source.parquet"
    spark.createDataFrame(
        DOCS, "doc_id int, text string, category string, price double"
    ).coalesce(1).write.parquet(src)

    sess = VectorizeSession(spark, workspace=f"{FIXTURE}/ws")
    sess.create_job(
        "golden", src, columns=["text"], primary_key="doc_id"
    )
    # the append-method wide layout is a distinct storage format — freeze
    # it too (cron schedule: realtime+append is rejected, as upstream)
    sess.create_job(
        "golden_append", src, columns=["text"], primary_key="doc_id",
        table_method="append", schedule="* * * * *",
    )

    expected = {
        "semantic": sess.search("golden", **SEARCHES["semantic"]),
        "fts": sess.full_text_search("golden", **SEARCHES["fts"]),
        "hybrid": sess.hybrid_search("golden", **SEARCHES["hybrid"]),
        "append_semantic": sess.search(
            "golden_append", **SEARCHES["semantic"]
        ),
    }
    with open(f"{FIXTURE}/expected.json", "w") as f:
        json.dump(expected, f, indent=1, sort_keys=True, default=str)
    print(f"froze golden job + {sum(len(v) for v in expected.values())} "
          "expected result rows")


if __name__ == "__main__":
    main()
