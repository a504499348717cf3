"""Scale probe for the round-10 second-half operators: perplexity
buckets, UniMax sampling, and the training-shard sink, at sf0.1 (5k
docs) vs the tiled sf1.0 (50k docs).

Evidence question per docstring claim:
- perplexity_buckets: linear LM scoring + a rank that stays distributed
  (driver prefix sum is language-inventory sized) — expect ~10x time at
  10x rows, no blow-up.
- unimax_sample: one tiny aggregate + generator explode — expect ~10x.
- shards e2e (pack -> blocks -> materialize -> write + manifest):
  one uniform-key shuffle + clustered write — expect ~10x.

Writes results to /tmp/r10b_ops_scale.txt (the standing file-output
rule: Spark stderr progress bars corrupt grep filters).

Run exclusively (no concurrent Spark work):
  python scripts/r10b_ops_scale_probe.py
"""

from __future__ import annotations

import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

OUT = "/tmp/r10b_ops_scale.txt"
RUNS = 3


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    import __spark_entry__ as E

    out = open(OUT, "w", buffering=1)
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()

    def docs_of(sf_dir):
        return spark.read.parquet(f"{sf_dir}/documents.parquet")

    def probe(tag, sf_dir, fn):
        times = []
        for _ in range(RUNS):
            t0 = time.monotonic()
            fn(sf_dir)
            times.append(time.monotonic() - t0)
        print(
            f"PROBE {sf_dir.rstrip('/').split('/')[-1]} {tag} "
            f"best={min(times):.2f}s all={[round(t, 2) for t in times]}",
            file=out,
        )

    def ppl(sf_dir):
        qs["perplexity_buckets"](spark, sf_dir).write.format(
            "noop"
        ).mode("overwrite").save()

    def unimax(sf_dir):
        from pg_vectorize_spark.functions.text import (
            lang_id_expr,
            token_count_expr,
        )
        from pg_vectorize_spark.operators.curate import unimax_sample

        d = docs_of(sf_dir).select(
            "doc_id",
            lang_id_expr(F.col("text")).alias("lang"),
            token_count_expr(F.col("text")).alias("n_tokens"),
        )
        budget = int(
            d.agg(F.sum("n_tokens")).collect()[0][0] * 0.5
        )
        unimax_sample(
            d, "doc_id", "lang", "n_tokens", budget
        ).write.format("noop").mode("overwrite").save()

    def shards(sf_dir):
        from pg_vectorize_spark.functions.text import token_count_expr
        from pg_vectorize_spark.operators.curate import (
            pack_blocks,
            sequence_pack,
        )
        from pg_vectorize_spark.sources.training_shards import (
            materialize_blocks,
            write_training_shards,
        )

        d = docs_of(sf_dir)
        counts = d.select(
            "doc_id", token_count_expr(F.col("text")).alias("n_tokens")
        )
        # synthetic ids isolate the packing/materialize/write path from
        # tokenizer cost (bpe_token_count has its own decade row)
        ids = counts.select(
            "doc_id",
            F.sequence(
                F.lit(1).cast("long"), F.col("n_tokens")
            ).alias("token_ids"),
        ).filter(F.col("n_tokens") > 0)
        packed = sequence_pack(
            counts.filter(F.col("n_tokens") > 0),
            "doc_id",
            "n_tokens",
            2048,
        )
        mat = materialize_blocks(
            pack_blocks(packed, 2048), ids, "doc_id", "token_ids"
        )
        dst = "/tmp/r10b_shards_probe"
        shutil.rmtree(dst, ignore_errors=True)
        write_training_shards(mat, dst, blocks_per_shard=64)
        shutil.rmtree(dst, ignore_errors=True)

    for sf_dir in ["/root/testdata/sf0.1", "/root/repo/.scaling/sf1.0"]:
        probe("perplexity_buckets", sf_dir, ppl)
        probe("unimax_sample", sf_dir, unimax)
        probe("shards_e2e", sf_dir, shards)
    out.close()
    spark.stop()


if __name__ == "__main__":
    main()
