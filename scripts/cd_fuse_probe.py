"""Interleaved A/B for the fused inline cover_density path (r13
optimization round): OLD shape (overlap tokenize scan + positional
corpus scan) vs FUSED shape (one positional scan, overlap derived from
it), alternating within one session so box drift hits both equally.
Asserts exact row equality (float bits) before timing. Runs at the
sf0.1 gate size and at an 8x-replicated corpus where the corpus
tokenize pass dominates the wall-clock.

Usage: python scripts/cd_fuse_probe.py
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql import SparkSession


QUERY = None  # set in main from the gate's query text


def old_shape(docs, pkey, query, analyzer="english"):
    """The pre-change inline shape, byte-for-byte: query-scoped overlap
    tokenize + cover_density_scores' own corpus scan, joined."""
    from pg_vectorize_spark.functions.text import (
        fts_match_expr,
        fts_score_expr,
        query_scoped_tokens_expr,
    )
    from pg_vectorize_spark.operators.search import (
        _analyze,
        cover_density_scores,
    )
    from pg_vectorize_spark.operators.skew import ensure_min_partitions

    terms = _analyze(query, analyzer)
    concat = F.coalesce(F.col("text"), F.lit(""))
    scored = ensure_min_partitions(docs).withColumn(
        "search_tokens",
        query_scoped_tokens_expr(concat, terms, stem=True),
    )
    scored = scored.filter(
        fts_match_expr(F.col("search_tokens"), terms)
    ).withColumn("fts_score", fts_score_expr(F.col("search_tokens"), terms))
    cd = cover_density_scores(docs, pkey, query, ["text"], analyzer)
    scored = scored.join(cd, pkey, "left").withColumn(
        "cd_score", F.coalesce(F.col("cd_score"), F.lit(0.0))
    )
    scored = scored.withColumn(
        "rank_cd", F.col("fts_score") + F.col("cd_score")
    )
    return (
        scored.orderBy(F.desc("rank_cd"), F.asc(pkey))
        .select(pkey, "lang", "fts_score", "cd_score", "rank_cd")
        .limit(10)
    )


def fused_shape(docs, pkey, query):
    from pg_vectorize_spark.operators.search import full_text_search

    return full_text_search(
        docs,
        pkey,
        query,
        text_cols=["text"],
        num_results=10,
        return_columns=[pkey, "lang"],
        rank="cover_density",
    )


def rows_key(df):
    return [
        tuple(
            v.hex() if isinstance(v, float) else v
            for v in r.asDict().values()
        )
        for r in df.collect()
    ]


def main() -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "8g")
        .appName("cd-fuse-probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entry

    query = entry.QUERY_TEXT
    base_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang", "text"
    )

    for label, docs in (
        ("sf0.1", base_docs),
        (
            "8x",
            base_docs.crossJoin(
                spark.range(8).select(F.col("id").alias("_rep"))
            ).select(
                (F.col("doc_id") * 8 + F.col("_rep")).alias("doc_id"),
                "lang",
                "text",
            ),
        ),
    ):
        docs = docs.localCheckpoint()  # pin identical input both shapes
        assert rows_key(old_shape(docs, "doc_id", query)) == rows_key(
            fused_shape(docs, "doc_id", query)
        ), f"{label}: shapes diverge"
        times = {"old": [], "fused": []}
        for i in range(int(os.environ.get("N_ROUNDS", "8"))):
            order = (
                ("old", "fused") if i % 2 == 0 else ("fused", "old")
            )
            for variant in order:
                fn = old_shape if variant == "old" else fused_shape
                t0 = time.time()
                if variant == "old":
                    df = fn(docs, "doc_id", query)
                else:
                    df = fn(docs, "doc_id", query)
                df.write.format("noop").mode("overwrite").save()
                times[variant].append(time.time() - t0)
        for v in ("old", "fused"):
            ts = sorted(times[v])
            print(
                f"{label} {v}: best {ts[0]:.3f}s "
                f"median {statistics.median(ts):.3f}s "
                f"runs {[round(t, 3) for t in ts]}"
            )
    spark.stop()


if __name__ == "__main__":
    main()
