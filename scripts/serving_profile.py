"""Serving-path latency profile (optimization round): where does one
engine query's wall-clock go?

Builds the same cached gate workspace the e2e gates use (hash embedder,
IVF index, postings index), then times repeated ``search`` /
``full_text_search`` / ``hybrid_search`` calls — per call: total
latency, Spark job count (statusTracker), and a driver-side phase
breakdown (catalog/meta reads, query analysis, probe construction,
collect). Quiet box, best-of-N; run standalone.
"""
import os
import sys
import time

# tree under test: $SERVE_TREE (worktree A/B) or this script's repo
sys.path.insert(
    0,
    os.environ.get(
        "SERVE_TREE",
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ),
)

from pyspark.sql import SparkSession  # noqa: E402

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "8g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as entry  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 7

sess = entry._cached_gate_session(
    spark,
    SF,
    "pvs_gate_ws",
    "gate",
    index_method="ivf",
    index_params={"n_centroids": 8, "nprobe": 8},
)
tracker = spark.sparkContext.statusTracker()


def jobs() -> int:
    return len(tracker.getJobIdsForGroup(None) or [])


def bench(label, fn):
    best, best_jobs = 1e9, None
    for _ in range(N):
        j0 = jobs()
        t0 = time.time()
        fn()
        dt = time.time() - t0
        nj = jobs() - j0
        if dt < best:
            best, best_jobs = dt, nj
    print(f"{label}: best {best*1000:.0f} ms, {best_jobs} jobs")


Q = entry.QUERY_TEXT
bench("search (semantic, indexed)", lambda: sess.search("gate", Q, num_results=10))
bench(
    "full_text_search (overlap, postings)",
    lambda: sess.full_text_search("gate", Q, num_results=10),
)
bench(
    "hybrid_search (rrf)",
    lambda: sess.hybrid_search(
        "gate", Q, num_results=10, window_size=50,
        return_columns=["doc_id", "lang"],
    ),
)

# phase breakdown of one hybrid_search, mirroring engine.hybrid_search
from pyspark.sql import functions as F  # noqa: E402


def phases():
    t = {}
    t0 = time.time()
    job = sess.catalog.get("gate")
    sess._check_rank_analyzer(job, "overlap")
    sess._check_analyzer_stamp(job)
    t["catalog+stamp"] = time.time() - t0

    t0 = time.time()
    sess._emb_ds("gate").exists()
    t["emb exists()"] = time.time() - t0

    t0 = time.time()
    qv = sess._query_vec(job, Q, None)
    t["query_vec"] = time.time() - t0

    t0 = time.time()
    tokens_df = (
        sess._tok_ds("gate").read()
        if sess._tok_ds("gate").exists()
        else None
    )
    t["tokens read()"] = time.time() - t0

    t0 = time.time()
    cand = sess._emb_candidates(job, qv, 50)
    t["emb_candidates (plan)"] = time.time() - t0

    t0 = time.time()
    fts = sess._fts_probe_scores(job, Q)
    t["fts_probe_scores (plan)"] = time.time() - t0

    from pg_vectorize_spark.engine import _hybrid_op

    t0 = time.time()
    df = _hybrid_op(
        sess._source_df(job), cand, job.primary_key, qv, Q,
        text_cols=job.src_columns, num_results=10, window_size=50,
        rrf_k=60, semantic_weight=1.0, fts_weight=1.0,
        return_columns=["doc_id", "lang"], filters=None, where_sql=None,
        pre_normalized=True, tokens_df=tokens_df,
        analyzer=sess._job_analyzer(job), rank="overlap",
        fts_scored_df=fts,
    )
    t["_hybrid_op (plan)"] = time.time() - t0

    t0 = time.time()
    j0 = jobs()
    rows = df.collect()
    t["collect"] = time.time() - t0
    t["_collect_jobs"] = jobs() - j0
    t["_rows"] = len(rows)
    return t


best = None
for _ in range(N):
    t = phases()
    tot = sum(v for k, v in t.items() if not k.startswith("_"))
    if best is None or tot < sum(
        v for k, v in best.items() if not k.startswith("_")
    ):
        best = t
print("--- hybrid_search phase breakdown (best-of-%d) ---" % N)
for k, v in best.items():
    if k.startswith("_"):
        print(f"  {k}: {v}")
    else:
        print(f"  {k}: {v*1000:.1f} ms")
spark.stop()
