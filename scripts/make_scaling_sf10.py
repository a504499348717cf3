"""Tile the fourth decade for the persisted-index probes (VERDICT r8 #8):
.scaling/sf10 = 10 copies of .scaling/sf1.0's documents + embeddings
(500k docs / 200k vectors). Only those two tables — the three persisted
index families (IVF cells, postings buckets, band buckets) read nothing
else, and the full-table tiling lives in make_scaling_sf1.py.

Distinctness across copies (same rationale as sf1.0 — constant
duplication DENSITY, honest 10x):
- text: every word gets an ``r{ci}`` suffix on top of sf1.0's ``q{c}``
  markers, so copies stay textually disjoint;
- vectors: per-copy deterministic SIGN PATTERN (flip component j iff
  xxhash64(j:ci) is odd) — norms unchanged, directions distinct. A
  second ROTATION would collide with sf1.0's rotations (rot c then rot
  ci == rot c+ci, so different (c, ci) pairs produce EXACT duplicate
  vectors); sign patterns compose with rotations without collisions.

Gitignored; regenerate with this script (~1.2 GB). Feeds ONLY
scripts/index_decade_probe.py.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

SRC = "/root/repo/.scaling/sf1.0"
DST = "/root/repo/.scaling/sf10"
COPIES = 10


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .appName("make-scaling-sf10")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.isdir(SRC):
        raise SystemExit("generate .scaling/sf1.0 first (make_scaling_sf1.py)")
    os.makedirs(DST, exist_ok=True)

    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    doc_stride = docs.agg(F.max("doc_id")).first()[0] + 1

    def docs_copy(df, ci):
        if ci == 0:
            return df
        text = F.regexp_replace("text", r"([A-Za-z0-9]+)", rf"$1r{ci}")
        return df.select(
            (F.col("doc_id") + doc_stride * ci).alias("doc_id"),
            text.alias("text"),
            "lang",
            "source",
            F.length(text).cast("long").alias("n_chars"),
        )

    def emb_copy(df, ci):
        if ci == 0:
            return df
        flipped = F.transform(
            "embedding",
            lambda x, j: F.when(
                F.pmod(
                    F.xxhash64(
                        F.concat_ws(
                            ":", j.cast("string"), F.lit(str(ci))
                        )
                    ),
                    F.lit(2),
                )
                == 1,
                -x,
            ).otherwise(x),
        )
        return df.select(
            (F.col("vec_id") + doc_stride * ci).alias("vec_id"),
            flipped.cast("array<float>").alias("embedding"),
            "label",
        )

    for name, copier in (("documents", docs_copy), ("embeddings", emb_copy)):
        df = spark.read.parquet(f"{SRC}/{name}.parquet")
        out = copier(df, 0)
        for ci in range(1, COPIES):
            out = out.unionByName(copier(df, ci))
        out.repartition(32).write.mode("overwrite").parquet(
            f"{DST}/{name}.parquet"
        )
        print(f"{name}: {out.count()} rows", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
