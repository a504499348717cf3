"""A/B probe: chunk_table_distributed window+groupBy (current, 2 keyed
exchanges of WORD-level rows) vs an in-row fold (ZERO shuffles).

Current shape: posexplode words -> Window(running sum of len+1) ->
groupBy(original_id, chunk_index) sorted collect = two exchanges whose
row count is the total word count of the corpus.

Candidate: per row, one `aggregate` fold over the words array carrying
(offset, chunk_index, current chunk, finished chunks); explode the
finished-chunks array. No exchange at all — chunk rows are produced in
the scan partitions.

Equality is asserted EXACTLY (collected tuples, sorted) on (a) an
adversarial local fixture covering empty/NULL text, multi-space runs,
words longer than max_chunk_size (chunk-index skip), exact-fit words,
many-chunk docs, and unicode, and (b) the real gate shape at sf0.1,
before any timing. Timing is interleaved WITHIN one session (variants
alternate each round) per the box-noise protocol.

Usage: python scripts/chunk_fold_probe.py [rounds]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS (32).

RESULT (r13 optimization round): REJECTED — keep the window form.
Equality holds everywhere, and at sf0.1 the fold reads ~4 % ahead
(0.527 -> 0.500 s best-of-7, fixed-overhead dominated). But on a
32x-replicated corpus (160k docs, ~8M words — the volume where shape
matters) the fold is 76 % WORSE: window 5.718 s vs fold 10.057 s
(best-of-5, interleaved). `aggregate` is CodegenFallback: the
per-word interpreted fold costs more than BOTH codegen'd word-level
exchanges it removes — the same verdict as the pool_embeddings
one-shuffle rewrite (scripts/pool_rewrite_probe.py).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pg_vectorize_spark.operators.chunk import chunk_table_distributed


def chunk_table_fold(
    df: DataFrame,
    text_col: str,
    pkey: str,
    max_chunk_size: int = 1000,
) -> DataFrame:
    """Zero-shuffle candidate: one fold over the words array per row."""
    if max_chunk_size < 1:
        raise ValueError(
            f"max_chunk_size must be >= 1, got {max_chunk_size}"
        )
    words = F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), r"\s+"),
        lambda x: x != "",
    )
    empty_done = F.array().cast(
        "array<struct<chunk_index:int,chunk:string>>"
    )
    init = F.struct(
        F.lit(0).cast("long").alias("offset"),
        F.lit(0).alias("idx"),
        F.lit("").alias("cur"),
        empty_done.alias("done"),
    )

    def step(acc, w):
        new_idx = F.floor(acc["offset"] / max_chunk_size).cast("int")
        fresh = acc["cur"] == ""
        same = new_idx == acc["idx"]
        return F.struct(
            (acc["offset"] + F.length(w) + 1).alias("offset"),
            F.when(fresh | ~same, new_idx)
            .otherwise(acc["idx"])
            .alias("idx"),
            F.when(fresh, w)
            .when(same, F.concat(acc["cur"], F.lit(" "), w))
            .otherwise(w)
            .alias("cur"),
            F.when(
                fresh | same, acc["done"]
            )
            .otherwise(
                F.concat(
                    acc["done"],
                    F.array(
                        F.struct(
                            acc["idx"].alias("chunk_index"),
                            acc["cur"].alias("chunk"),
                        )
                    ),
                )
            )
            .alias("done"),
        )

    def fin(acc):
        return F.when(acc["cur"] == "", acc["done"]).otherwise(
            F.concat(
                acc["done"],
                F.array(
                    F.struct(
                        acc["idx"].alias("chunk_index"),
                        acc["cur"].alias("chunk"),
                    )
                ),
            )
        )

    chunks = F.aggregate(words, init, step, fin)
    return (
        df.select(
            F.col(pkey).alias("original_id"),
            F.explode(chunks).alias("_c"),
        )
        .select(
            "original_id",
            F.col("_c.chunk_index").alias("chunk_index"),
            F.col("_c.chunk").alias("chunk"),
        )
    )


FIXTURE = [
    (1, "This is a test for chunking."),
    (2, None),
    (3, ""),
    (4, "   \t  \n "),
    (5, "word"),
    (6, "a" * 15),  # single word exactly max (max=15 case)
    (7, "a" * 40),  # word longer than max -> chunk-index skip
    (8, "aa " + "b" * 40 + " cc dd"),  # oversize mid-doc
    (9, "  multiple   spaces\tand\nnewlines  between   words "),
    (10, " ".join(f"w{i}" for i in range(400))),  # many chunks
    (11, "héllo wörld 机器 学习 模型 Привет мир"),
    (12, "x " * 200),  # trailing space run
    (13, "ab cd ef gh ij kl mn op"),  # exact-fit boundaries (max=5)
]


def collect_sorted(df: DataFrame):
    return sorted(
        (r["original_id"], r["chunk_index"], r["chunk"])
        for r in df.collect()
    )


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # -- equality: adversarial fixture, several max sizes ------------------
    fx = spark.createDataFrame(FIXTURE, "doc_id long, text string")
    for mx in (5, 15, 200, 1000):
        a = collect_sorted(chunk_table_distributed(fx, "text", "doc_id", mx))
        b = collect_sorted(chunk_table_fold(fx, "text", "doc_id", mx))
        assert a == b, f"fixture mismatch at max={mx}:\n{a[:5]}\n{b[:5]}"
    print("fixture equality OK (max=5,15,200,1000)")

    # -- equality: real gate shape at sf0.1 --------------------------------
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    a = collect_sorted(chunk_table_distributed(docs, "text", "doc_id", 200))
    b = collect_sorted(chunk_table_fold(docs, "text", "doc_id", 200))
    assert a == b, f"sf mismatch: {len(a)} vs {len(b)} rows"
    print(f"sf0.1 equality OK ({len(a)} chunk rows)")

    # -- interleaved timing ------------------------------------------------
    def run(fn) -> float:
        t0 = time.perf_counter()
        fn(docs, "text", "doc_id", 200).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.perf_counter() - t0

    variants = {
        "v0_window": chunk_table_distributed,
        "v1_fold": chunk_table_fold,
    }
    times: dict[str, list[float]] = {k: [] for k in variants}
    for k, fn in variants.items():  # warmup
        run(fn)
    for _ in range(rounds):
        for k, fn in variants.items():
            times[k].append(run(fn))
    for k, ts in times.items():
        print(
            f"{k}: best {min(ts):.3f}s  med {sorted(ts)[len(ts)//2]:.3f}s  "
            f"all {[round(t, 3) for t in ts]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
