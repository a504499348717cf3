"""A/B probe: pool_embeddings two-shuffle (current) vs one-shuffle rewrite.

Current shape: posexplode -> groupBy(group, pos) sorted fold -> groupBy(group)
reassemble = 2 keyed exchanges of group*dim rows.
Candidate: groupBy(group).collect_list(vec) = ONE exchange of whole vectors,
then the identical per-position sorted folds as in-row HOF work.

Equality is asserted BIT-FOR-BIT (float .hex()) on (a) an adversarial local
fixture covering every documented NULL/ragged edge case and (b) the two real
gate shapes at sf0.1, before any timing. Timing is interleaved WITHIN one
session (variants alternate each round) so box drift hits both equally —
the BENCH_NOTES/memory protocol.

Usage: python scripts/pool_rewrite_probe.py [rounds]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS (32).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def pool_current(df, group_col, vec_col, mode="mean"):
    """Verbatim copy of functions/vector.pool_embeddings (two shuffles)."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    exploded = df.select(F.col(group_col), F.posexplode(v).alias("_pos", "_val"))
    per_pos = exploded.groupBy(group_col, "_pos").agg(
        F.sort_array(F.collect_list("_val")).alias("_vals"),
        F.count(F.lit(1)).alias("_n"),
    )
    folded = F.aggregate(F.col("_vals"), F.lit(0.0), lambda acc, x: acc + x)
    divisor = F.col("_n") if mode == "mean" else F.lit(1)
    per_pos = per_pos.select(
        F.col(group_col),
        F.col("_pos"),
        (folded / divisor.cast("double")).alias("_v"),
        F.col("_n"),
    )
    return (
        per_pos.groupBy(group_col)
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("_pos"), F.col("_v")))
            ).alias("_pairs"),
            F.max("_n").alias("n_vectors"),
            F.min("_n").alias("n_vectors_min"),
        )
        .select(
            F.col(group_col),
            F.transform(F.col("_pairs"), lambda p: p["_v"]).alias("pooled"),
            F.col("n_vectors").cast("long").alias("n_vectors"),
            F.col("n_vectors_min").cast("long").alias("n_vectors_min"),
        )
    )


def pool_onepass(df, group_col, vec_col, mode="mean"):
    """One-shuffle candidate: collect vectors per group, fold per position
    in-row. Per (group, pos) the fold input is the SAME value-sorted
    non-null list divided by the SAME row count (null elements count in
    the divisor, null/absent positions don't), so values are bit-identical
    by construction."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    grouped = (
        df.select(F.col(group_col), v.alias("_vec"))
        .where(F.col("_vec").isNotNull())
        .groupBy(group_col)
        .agg(F.collect_list("_vec").alias("_vecs"))
    )
    max_size = F.array_max(F.transform(F.col("_vecs"), lambda a: F.size(a)))
    # groups whose vectors are all empty emit no row (posexplode parity)
    grouped = grouped.where(max_size > 0)

    def _pos_struct(p):
        # bind the "vectors having this position" sublist once per position
        def _from_having(having):
            vals = F.sort_array(
                F.filter(
                    F.transform(having, lambda a: F.get(a, p)),
                    lambda x: x.isNotNull(),
                )
            )
            folded = F.aggregate(vals, F.lit(0.0), lambda acc, x: acc + x)
            n = F.size(having)
            div = n.cast("double") if mode == "mean" else F.lit(1.0)
            return F.struct((folded / div).alias("v"), n.alias("n"))

        having = F.filter(F.col("_vecs"), lambda a: F.size(a) > p)
        return F.element_at(
            F.transform(F.array(having), _from_having), 1
        )

    pairs = F.transform(
        F.sequence(F.lit(0), max_size - 1), lambda p: _pos_struct(p)
    )
    return grouped.select(
        F.col(group_col),
        F.transform(pairs, lambda s: s["v"]).alias("pooled"),
        F.array_max(F.transform(pairs, lambda s: s["n"]))
        .cast("long")
        .alias("n_vectors"),
        F.array_min(F.transform(pairs, lambda s: s["n"]))
        .cast("long")
        .alias("n_vectors_min"),
    )


def canon(df: DataFrame, group_col: str):
    rows = df.collect()
    out = {}
    for r in rows:
        out[r[group_col]] = (
            tuple(float(x).hex() for x in r["pooled"]),
            r["n_vectors"],
            r["n_vectors_min"],
        )
    return out


def assert_equal(a, b, label):
    if a != b:
        only_a = {k: v for k, v in a.items() if b.get(k) != v}
        only_b = {k: v for k, v in b.items() if a.get(k) != v}
        raise AssertionError(
            f"{label}: MISMATCH\ncurrent-only: {list(only_a.items())[:3]}\n"
            f"candidate-only: {list(only_b.items())[:3]}"
        )
    print(f"  equality OK: {label} ({len(a)} groups)")


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "8g")
        .appName("pool-rewrite-probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # ---- 1. adversarial fixture: ragged, null elems, null vecs, empties
    adv = spark.createDataFrame(
        [
            ("g1", [1.0, 2.0, 3.0]),
            ("g1", [4.0, 5.0]),          # ragged: pos 2 has n=1
            ("g1", [7.0, None, 9.0]),    # null element: divisor counts it
            ("g2", None),                # null vector: invisible
            ("g2", [0.5, 0.25]),
            ("g3", None),                # all-null group: NO output row
            ("g4", []),                  # all-empty group: NO output row
            ("g5", []),                  # empty + real vec in one group
            ("g5", [2.5]),
        ],
        "grp string, vec array<double>",
    )
    for mode in ("mean", "sum"):
        assert_equal(
            canon(pool_current(adv, "grp", "vec", mode), "grp"),
            canon(pool_onepass(adv, "grp", "vec", mode), "grp"),
            f"adversarial/{mode}",
        )

    # ---- 2. real gate shapes at sf_dir
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).select(
        (F.col("vec_id") % 50).alias("grp"), "embedding"
    )
    assert_equal(
        canon(pool_current(emb, "grp", "embedding"), "grp"),
        canon(pool_onepass(emb, "grp", "embedding"), "grp"),
        "embedding_pool shape",
    )

    from pg_vectorize_spark.operators.chunk import chunk_table_distributed
    from pg_vectorize_spark.operators.embed import embed_bulk_pandas

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    chunks = chunk_table_distributed(docs, "text", "doc_id", max_chunk_size=200)
    cemb = embed_bulk_pandas(chunks, "chunk", "original_id", dim=64)
    assert_equal(
        canon(pool_current(cemb, "original_id", "embeddings"), "original_id"),
        canon(pool_onepass(cemb, "original_id", "embeddings"), "original_id"),
        "chunked_embed_pool shape",
    )

    # ---- 3. interleaved timing
    shapes = {
        "embedding_pool": lambda fn: fn(emb, "grp", "embedding"),
        "chunked_embed_pool": lambda fn: fn(cemb, "original_id", "embeddings"),
    }
    variants = {"current": pool_current, "onepass": pool_onepass}
    best: dict[str, dict[str, float]] = {
        s: {v: float("inf") for v in variants} for s in shapes
    }
    for shape, build in shapes.items():
        for fn in variants.values():  # untimed warmup
            build(fn).write.format("noop").mode("overwrite").save()
        for r in range(rounds):
            for vname, fn in variants.items():
                spark.sparkContext.setJobDescription(f"{shape}/{vname}/r{r}")
                t0 = time.time()
                build(fn).write.format("noop").mode("overwrite").save()
                dt = time.time() - t0
                best[shape][vname] = min(best[shape][vname], dt)
                print(f"  {shape:>20} {vname:>8} r{r}: {dt:.3f}s", flush=True)
    print("\nbest-of-interleaved:")
    for shape in shapes:
        c, o = best[shape]["current"], best[shape]["onepass"]
        print(f"  {shape}: current {c:.3f}s  onepass {o:.3f}s  ({o / c:.2f}x)")
    spark.stop()


if __name__ == "__main__":
    main()
