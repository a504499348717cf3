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


def _percentile(vals: list[float], p: float) -> float:
    """Nearest-rank percentile over a small sample."""
    s = sorted(vals)
    idx = min(len(s) - 1, max(0, int(round(p / 100.0 * (len(s) - 1)))))
    return s[idx]


def _stream_durations(q) -> list[float]:
    """Per-micro-batch triggerExecution seconds (input batches only)."""
    durs = []
    for prog in q.recentProgress:
        p = json.loads(prog.json) if hasattr(prog, "json") else prog
        if p.get("numInputRows", 0) > 0:
            durs.append(p["durationMs"]["triggerExecution"] / 1000.0)
    return durs


def _bench_streaming(spark, sf_dir: str) -> dict:
    """Micro-batch freshness probe (VERDICT r4 #7): the reference's
    implied realtime SLO is 2-5 s trigger-to-searchable
    (server/tests/tests.rs:74-103). Feeds N single-file micro-batches
    through both realtime modes and reports per-batch latency
    percentiles — the number a freshness claim needs.
    """
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from pg_vectorize_spark.engine import VectorizeSession
    from pg_vectorize_spark.streaming.incremental import (
        ChangeFeedPipeline,
        RealtimePipeline,
    )

    n_batches = 6
    all_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").alias("id"), F.col("text").alias("content")
    )
    # adapt to the table so every micro-batch has rows at any SF
    per_batch = max(20, min(200, all_docs.count() // n_batches))
    docs = all_docs.filter(F.col("id") < n_batches * per_batch)
    out: dict = {}
    root = tempfile.mkdtemp(prefix="pvs_bench_stream_")
    try:
        # ---- file-stream (snapshot) mode ------------------------------
        src1 = f"{root}/src1"
        feed1 = f"{root}/feed1"
        docs.filter("id < 0").write.parquet(src1)  # schema-only seed
        sess1 = VectorizeSession(spark, workspace=f"{root}/ws1")
        sess1.create_job(
            "bench_rt", src1, columns=["content"], primary_key="id",
            run_initial_load=False,
        )
        for i in range(n_batches):
            docs.filter(
                (F.col("id") >= i * per_batch)
                & (F.col("id") < (i + 1) * per_batch)
            ).coalesce(1).write.mode("append").parquet(feed1)
        pipe = RealtimePipeline(sess1, "bench_rt", max_files_per_trigger=1)
        q = pipe.start(source_dir=feed1, available_now=True)
        q.awaitTermination(300)
        durs = _stream_durations(q)
        if durs:
            out["file_stream"] = {
                "p50_sec": round(_percentile(durs, 50), 3),
                "p95_sec": round(_percentile(durs, 95), 3),
                "n_batches": len(durs),
                "rows_per_batch": per_batch,
            }

        # ---- CDF changelog mode (inserts + in-batch deletes) ----------
        src2 = f"{root}/src2"
        feed2 = f"{root}/feed2"
        docs.filter("id < 0").write.parquet(src2)
        sess2 = VectorizeSession(spark, workspace=f"{root}/ws2")
        sess2.create_job(
            "bench_cdf", src2, columns=["content"], primary_key="id",
            run_initial_load=False,
        )
        for i in range(n_batches):
            batch = docs.filter(
                (F.col("id") >= i * per_batch)
                & (F.col("id") < (i + 1) * per_batch)
            ).select(
                "id",
                "content",
                F.lit("insert").alias("_change_type"),
                F.lit(i).alias("_version"),
            )
            if i > 0:
                # each batch also deletes 10% of the PREVIOUS batch so the
                # probe times the in-batch cascade path, not insert-only
                dels = (
                    docs.filter(
                        (F.col("id") >= (i - 1) * per_batch)
                        & (F.col("id") < (i - 1) * per_batch + per_batch // 10)
                    )
                    .select(
                        "id",
                        F.lit(None).cast("string").alias("content"),
                        F.lit("delete").alias("_change_type"),
                        F.lit(i).alias("_version"),
                    )
                )
                batch = batch.unionByName(dels)
            batch.coalesce(1).write.mode("append").parquet(feed2)
        pipe2 = ChangeFeedPipeline(
            sess2, "bench_cdf", max_files_per_trigger=1,
            version_col="_version",
        )
        q2 = pipe2.start(source_dir=feed2, available_now=True)
        q2.awaitTermination(300)
        durs2 = _stream_durations(q2)
        if durs2:
            out["cdf"] = {
                "p50_sec": round(_percentile(durs2, 50), 3),
                "p95_sec": round(_percentile(durs2, 95), 3),
                "n_batches": len(durs2),
                "rows_per_batch": per_batch,
            }
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


# The headline subset printed on the final stdout line: one gate per
# BASELINE.md frame (embed pipeline, semantic/fts/hybrid search incl.
# index-backed, change scan) plus the training-pipeline headliners.
# Fixed size — adding registry queries must NOT grow the final line.
_HEADLINE_SUBSET = (
    "embed_documents",
    "semantic_search_topk",
    "semantic_search_indexed",
    "fts_search_topk",
    "fts_search_indexed",
    "hybrid_rrf_search",
    "hybrid_rrf_indexed",
    "change_detection",
    "dedup_minhash_lsh",
    "knn_join",
    "job_hybrid_e2e",
)


def _detail_path(cpus: str = "32") -> str:
    """Round-stamped detail file next to bench.py: BENCH_DETAIL_r<N>.json.

    Round number from $SPARK_GRAFT_ROUND when the driver exports it, else
    1 + the highest committed BENCH_r<N>.json (the driver writes that
    artifact at the END of round N, so during round N the max is N-1).

    Non-canonical core counts get a ``_c<cpus>`` suffix (VERDICT r13 #9):
    the driver's low-core scaling sweep runs the same bench with
    SPARK_GRAFT_CPUS=8, and without the suffix that sweep overwrote (or,
    under the fallback inference, squatted) the canonical 32-core detail
    file of the round.
    """
    import glob
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    rnd = os.environ.get("SPARK_GRAFT_ROUND")
    if not rnd:
        seen = [
            int(m.group(1))
            for p in glob.glob(os.path.join(here, "BENCH_r*.json"))
            if (m := re.match(r"BENCH_r(\d+)\.json$", os.path.basename(p)))
        ]
        rnd = str(max(seen, default=0) + 1)
    suffix = "" if str(cpus) == "32" else f"_c{int(cpus)}"
    return os.path.join(here, f"BENCH_DETAIL_r{int(rnd):02d}{suffix}.json")


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
    # EVERY registered query is benched (VERDICT r6 #3): perf regressions
    # in any operator are visible round-over-round, not only in a curated
    # headline subset. The indexed gates cache their index builds behind
    # a source fingerprint, so repeats time the probe path; at sf0.1 the
    # full 88-query sweep at best-of-5 costs a few minutes.
    bench_names = list(qs)

    # untimed warmup: absorb JVM/codegen/parquet-footer startup costs so the
    # first timed query measures execution, not session warmup
    qs["token_count"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    # best-of-N per query with the spread recorded: single-shot timings on
    # a shared box swing ±20% from transient load (observed spikes to
    # +200% under host-level noisy neighbors); the min measures the
    # engine, and (max-min)/min tells the reader whether a cross-round
    # delta is signal or noise. Default raised 3 -> 5: under sustained
    # external load even the min of 3 inflates, and the extra two runs
    # cost ~1 min at sf0.1.
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))
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

    # streaming freshness probe (p50/p95 micro-batch latency, both modes);
    # SPARK_GRAFT_BENCH_STREAMING=0 skips it for batch-only iteration
    streaming: dict = {}
    if os.environ.get("SPARK_GRAFT_BENCH_STREAMING", "1") != "0":
        try:
            streaming = _bench_streaming(spark, sf_dir)
        except Exception as exc:  # a probe failure must not kill the bench
            streaming = {"error": str(exc)[:200]}

    # The driver tail-captures ~2,000 chars of stdout and parses the LAST
    # JSON line. Both prior strategies overflowed it as the registry grew
    # (r5: one fat line; r7: the 91-query medians dict alone hit ~3.1 KB
    # and `parsed` came back null). The durable contract (VERDICT r7 #1):
    # write EVERYTHING — per-query best-of-N timings, spreads, run count,
    # streaming p50/p95 — to a committed-by-the-repo detail file, and keep
    # the final stdout line to a bounded handful of fields: the total, sf,
    # query count, a small fixed headline subset of per-query timings
    # (satisfies the driver's `queries` schema without unbounded growth),
    # and the detail-file pointer.
    detail_path = _detail_path(cpus)
    with open(detail_path, "w") as fh:
        json.dump(
            {
                "metric": "headline_queries_detail",
                "value": total,
                "unit": "sec",
                "sf": sf_val,
                "n_runs": n_runs,
                "queries": timings,
                "spread": spreads,
                "streaming_latency": streaming,
            },
            fh,
            indent=1,
            sort_keys=True,
        )
        fh.write("\n")
    headline = {
        k: timings[k] for k in _HEADLINE_SUBSET if k in timings
    }
    final = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": headline,
        "sf": sf_val,
        "n_queries": len(timings),
        "detail": os.path.basename(detail_path),
    }
    line = json.dumps(final, separators=(",", ":"))
    # hard guarantee, not a hope: if the line ever outgrows the capture
    # budget again, shed the headline subset rather than the parse
    if len(line) > 1800:
        final.pop("queries", None)
        line = json.dumps(final, separators=(",", ":"))
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
