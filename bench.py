"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...}

The query set mirrors BASELINE.md's benchmark frame: (a) bulk embedding
pipeline, (b) semantic top-k, (c) full-text search, (d) hybrid RRF with
filters, (e) incremental change-detection scan — plus the training-data
pipeline headliners (dedup, knn join).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "8g")
        .appName("pg_vectorize_spark-bench")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    bench_names = [
        "embed_documents",
        "semantic_search_topk",
        "fts_search_topk",
        "hybrid_rrf_search",
        "semantic_search_filtered",
        "change_detection",
        "knn_join",
        "dedup_exact",
        "token_count",
        "quality_score",
        "dedup_ngram_jaccard",
        "dedup_minhash_lsh",
        "ann_ivf_topk",
        "ann_signbit_lsh_topk",
        "chunk_table",
        "events_windowed_agg",
        "sessionize_events",
        "hybrid_weighted",
        "orders_rollup",
        "fts_cover_density",
        "minhash_jaccard_estimate",
        "fts_bm25",
        "decontaminate",
        "asof_join_events",
        "attribution_window_join",
        "corpus_mix",
        "source_divergence",
        "unigram_logprob",
        "vocabulary_topk",
        "asof_join_bucketed",
        "dup_span_stats",
    ]

    # untimed warmup: absorb JVM/codegen/parquet-footer startup costs so the
    # first timed query measures execution, not session warmup
    qs["token_count"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    # best-of-3 per query with the spread recorded: single-shot timings on a
    # shared box swing ±20% from transient load; the min measures the
    # engine, and (max-min)/min tells the reader whether a cross-round
    # delta is signal or noise
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    timings: dict[str, float] = {}
    spreads: dict[str, float] = {}
    for name in bench_names:
        if name not in qs:
            continue
        fn = qs[name]
        runs = []
        for _ in range(n_runs):
            t0 = time.time()
            df = fn(spark, sf_dir)
            # noop sink forces FULL materialization of every column —
            # count() would let Catalyst prune the expensive projections
            # (embeddings, chunks) and understate the work
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.time() - t0)
        best = min(runs)
        timings[name] = round(best, 3)
        spreads[name] = round((max(runs) - best) / best, 3) if best else 0.0

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "spread": spreads,
                "n": n_runs,
                "sf": sf_val,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
