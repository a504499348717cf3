"""Synthesize an sf1.0-scale dataset for the SCALING probe's third decade
(VERDICT r4 #4): the driver ships sf{0.001,0.01,0.1} only, so the 10x
step beyond sf0.1 is tiled locally into .scaling/sf1.0 (gitignored —
regenerate with this script; ~170 MB).

Construction: 10 copies of every sf0.1 table with per-copy key shifts
chosen so intra-copy join relationships are preserved (doc_id and vec_id
share one stride; orderkey/custkey/partkey/suppkey strides keep the
star-join FKs valid). Text and vectors are made DISTINCT per copy
(word-marker suffix / component rotation) so duplication DENSITY stays
constant — naive tiling would create cross-copy near-dup clusters and
make dedup pair volume grow ~45x instead of the honest 10x, misreporting
engine scaling as superlinear. Dimension tables (nation, region) are
shared, as in TPC-H.

This dataset feeds ONLY scripts/scaling_probe.py; the correctness gate
never reads it.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

SRC = "/root/testdata/sf0.1"
DST = "/root/repo/.scaling/sf1.0"
COPIES = 10


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .appName("make-scaling-sf1")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(DST, exist_ok=True)

    def stride_of(df, col):
        return df.agg(F.max(col)).first()[0] + 1

    def tile(name, build_copy):
        df = spark.read.parquet(f"{SRC}/{name}.parquet")
        parts = [build_copy(df, ci) for ci in range(COPIES)]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.repartition(8).write.mode("overwrite").parquet(
            f"{DST}/{name}.parquet"
        )
        print(f"{name}: {out.count()} rows")

    # shared stride for doc_id and vec_id: embeddings.vec_id is a subset of
    # documents.doc_id (orphan/knn queries rely on the overlap pattern)
    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    doc_stride = stride_of(docs, "doc_id")

    def docs_copy(df, ci):
        if ci == 0:
            return df
        # suffix every word with a copy marker: each copy is textually
        # disjoint, preserving per-copy dup structure at 10x volume
        text = F.regexp_replace("text", r"([A-Za-z0-9]+)", rf"$1q{ci}")
        return df.select(
            (F.col("doc_id") + doc_stride * ci).alias("doc_id"),
            text.alias("text"),
            "lang",
            "source",
            F.length(text).cast("long").alias("n_chars"),
        )

    emb0 = spark.read.parquet(f"{SRC}/embeddings.parquet")
    emb_dim = len(emb0.first()["embedding"])

    def emb_copy(df, ci):
        if ci == 0:
            return df
        # rotate components: distinct vectors, same norm/distribution
        rotated = F.concat(
            F.slice("embedding", ci + 1, emb_dim - ci),
            F.slice("embedding", 1, ci),
        )
        return df.select(
            (F.col("vec_id") + doc_stride * ci).alias("vec_id"),
            rotated.alias("embedding"),
            "label",
        ).withColumn("embedding", F.col("embedding").cast("array<float>"))

    ev = spark.read.parquet(f"{SRC}/events.parquet")
    ev_stride = stride_of(ev, "event_id")
    user_stride = stride_of(ev, "user_id")

    def events_copy(df, ci):
        if ci == 0:
            return df
        return df.withColumn(
            "event_id", F.col("event_id") + ev_stride * ci
        ).withColumn("user_id", F.col("user_id") + user_stride * ci)

    orders = spark.read.parquet(f"{SRC}/orders.parquet")
    order_stride = stride_of(orders, "o_orderkey")
    cust_stride = stride_of(
        spark.read.parquet(f"{SRC}/customer.parquet"), "c_custkey"
    )
    part_stride = stride_of(
        spark.read.parquet(f"{SRC}/part.parquet"), "p_partkey"
    )
    supp_stride = stride_of(
        spark.read.parquet(f"{SRC}/supplier.parquet"), "s_suppkey"
    )

    def shift(cols):
        def f(df, ci):
            if ci == 0:
                return df
            out = df
            for c, s in cols:
                out = out.withColumn(c, F.col(c) + s * ci)
            return out

        return f

    tile("documents", docs_copy)
    tile("embeddings", emb_copy)
    tile("events", events_copy)
    tile(
        "orders",
        shift([("o_orderkey", order_stride), ("o_custkey", cust_stride)]),
    )
    tile(
        "lineitem",
        shift(
            [
                ("l_orderkey", order_stride),
                ("l_partkey", part_stride),
                ("l_suppkey", supp_stride),
            ]
        ),
    )
    tile("customer", shift([("c_custkey", cust_stride)]))
    tile("supplier", shift([("s_suppkey", supp_stride)]))
    tile("part", shift([("p_partkey", part_stride)]))
    # dimension tables shared across copies (TPC-H semantics)
    for name in ("nation", "region"):
        spark.read.parquet(f"{SRC}/{name}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{DST}/{name}.parquet")
        print(f"{name}: copied")
    spark.stop()


if __name__ == "__main__":
    main()
