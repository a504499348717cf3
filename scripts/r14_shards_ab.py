"""r14: corpus_to_shards fused dedup_pack A/B (VERDICT r13 #4).

A = the r13 two-step gate body (cleaned checkpoint -> dedup("minhash")
    -> curated checkpoint -> token_count -> sequence_pack), verbatim.
B = the current gate (fused dedup_pack).
Interleaved ABBA rounds, best-of-5, noop sink, bench.py session configs.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
RUNS = int(sys.argv[3]) if len(sys.argv) > 3 else 5

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.driver.memory", "8g")
    .appName("r14-shards-ab")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as entry  # noqa: E402
from pg_vectorize_spark import functions as _fns  # noqa: E402,F401
from pg_vectorize_spark.functions import text as T  # noqa: E402
from pg_vectorize_spark.operators.curate import (  # noqa: E402
    pack_blocks,
    sequence_pack,
)
from pg_vectorize_spark.pipelines import CorpusPipeline  # noqa: E402


def q_old(s, sf):
    docs = entry._t(s, sf, "documents").select(
        "doc_id", F.expr(entry._LINE_DEDUP_LINED).alias("text")
    )
    cleaned = (
        CorpusPipeline(s, docs, pkey="doc_id", text_col="text")
        .filter_quality(min_score=0.5)
        .dedup_lines()
        .normalize_text(strip_html=False)
        .df()
        .localCheckpoint(eager=False)
    )
    curated = (
        CorpusPipeline(s, cleaned, pkey="doc_id", text_col="text")
        .dedup("minhash")
        .df()
        .localCheckpoint(eager=False)
    )
    base = curated.select(
        "doc_id", T.token_count_expr(F.col("text")).alias("n_tokens")
    )
    packed = sequence_pack(
        base, "doc_id", "n_tokens", entry.PACK_BLOCK, order_buckets=64
    )
    return entry._block_manifest(pack_blocks(packed, entry.PACK_BLOCK))


q_new = entry.queries()["corpus_to_shards"]

ra = sorted(map(tuple, q_old(spark, SF).collect()))
rb = sorted(map(tuple, q_new(spark, SF).collect()))
assert ra == rb, f"parity FAILED: {len(ra)} vs {len(rb)}"
print(f"parity ok: {len(ra)} rows identical")


def best_of(fn):
    times = []
    for _ in range(RUNS):
        t0 = time.time()
        fn(spark, SF).write.format("noop").mode("overwrite").save()
        times.append(time.time() - t0)
    return min(times)


a_b, b_b = [], []
for r in range(ROUNDS):
    if r % 2 == 0:
        a_b.append(best_of(q_old)); b_b.append(best_of(q_new))
    else:
        b_b.append(best_of(q_new)); a_b.append(best_of(q_old))
    print(f"round {r}: A(two-step)={a_b[-1]:.3f}s  B(fused)={b_b[-1]:.3f}s")
ma, mb = min(a_b), min(b_b)
print(f"MIN: A={ma:.3f}s B={mb:.3f}s  B/A={mb/ma:.3f}")
spark.stop()
