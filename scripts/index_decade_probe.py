"""Two-decade scaling for the three persisted index families (VERDICT
r8 #8): build / probe / per-batch maintenance at sf1.0 (50k docs, 20k
vectors) and sf10 (500k docs, 200k vectors — make_scaling_sf10.py), so
the "flat probe" claims extrapolate across two decades instead of one.

- vectors  -> IVF cells        (index_manager.JobIndexManager, ivf)
- terms    -> postings buckets (fts_index.JobFtsIndexManager)
- near-dup -> band buckets     (dedup_index.MinHashBandIndexManager)

Probe shapes mirror the engine's: IVF candidates for one query vector
(min_rows=10), postings probe_scores for the bench query's terms, band
probe for a fixed 200-doc batch. Maintenance = one 200-row micro-batch
through the same hooks the streaming pipeline calls (add for
inserts; the band upsert path includes the sidecar merge).

python scripts/index_decade_probe.py
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

SFS = [
    ("sf1.0", "/root/repo/.scaling/sf1.0"),
    ("sf10", "/root/repo/.scaling/sf10"),
]
BATCH = 200
BAND_PARAMS = {"num_hashes": 16, "bands": 4, "shingle_k": 3}


def _t(fn):
    t0 = time.time()
    out = fn()
    return time.time() - t0, out


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "8g")
        .appName("index-decade-probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pg_vectorize_spark.dedup_index import MinHashBandIndexManager
    from pg_vectorize_spark.fts_index import JobFtsIndexManager
    from pg_vectorize_spark.functions.text import analyze_query, tokens_expr
    from pg_vectorize_spark.index_manager import JobIndexManager

    import __spark_entry__ as entry

    terms = analyze_query(entry.QUERY_TEXT)
    print(
        f"{'sf':>6} {'family':>9} {'rows':>8} {'build_s':>8} "
        f"{'probe_s':>8} {'maint_s':>8}",
        flush=True,
    )
    for sf_name, sf_dir in SFS:
        if not os.path.isdir(sf_dir):
            print(f"{sf_name}: missing ({sf_dir}) — generate it first")
            continue
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "text"
        )
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
            F.col("vec_id").alias("doc_id"),
            F.col("embedding").cast("array<double>").alias("embeddings"),
        )
        n_docs, n_vecs = docs.count(), emb.count()
        qvec = emb.first()["embeddings"]

        # disjoint 200-row maintenance/probe batches
        doc_batch = docs.limit(BATCH).select(
            (F.col("doc_id") + 100_000_000).alias("doc_id"),
            F.concat_ws(" ", "text", F.lit("decade probe")).alias("text"),
        ).localCheckpoint()
        emb_batch = emb.limit(BATCH).select(
            (F.col("doc_id") + 100_000_000).alias("doc_id"),
            F.reverse("embeddings").alias("embeddings"),
        ).localCheckpoint()
        tok_batch = doc_batch.select(
            "doc_id", tokens_expr(F.col("text")).alias("search_tokens")
        ).localCheckpoint()

        # --- IVF ---------------------------------------------------------
        ivf = JobIndexManager(
            spark,
            tempfile.mkdtemp(prefix=f"dec_ivf_{sf_name}_"),
            "ivf",
            {"n_centroids": 16, "nprobe": 2, "train": "kmeans"},
        )
        b, _ = _t(lambda: ivf.build(emb, "doc_id"))
        # warm then best-of-2 probes
        ivf.candidates(qvec, min_rows=10).count()
        p = min(
            _t(lambda: ivf.candidates(qvec, min_rows=10).count())[0]
            for _ in range(2)
        )
        m, _ = _t(lambda: ivf.add(emb_batch, "doc_id"))
        print(
            f"{sf_name:>6} {'ivf':>9} {n_vecs:>8} {b:>8.1f} {p:>8.2f} "
            f"{m:>8.2f}",
            flush=True,
        )

        # --- FTS postings --------------------------------------------------
        fts = JobFtsIndexManager(
            spark, tempfile.mkdtemp(prefix=f"dec_fts_{sf_name}_")
        )
        tokens = docs.select(
            "doc_id", tokens_expr(F.col("text")).alias("search_tokens")
        )
        b, _ = _t(lambda: fts.build(tokens, "doc_id"))
        fts.probe_scores(terms).count()
        p = min(
            _t(lambda: fts.probe_scores(terms).count())[0]
            for _ in range(2)
        )
        m, _ = _t(lambda: fts.add(tok_batch, "doc_id"))
        print(
            f"{sf_name:>6} {'fts':>9} {n_docs:>8} {b:>8.1f} {p:>8.2f} "
            f"{m:>8.2f}",
            flush=True,
        )

        # --- MinHash band ---------------------------------------------------
        band = MinHashBandIndexManager(
            spark,
            tempfile.mkdtemp(prefix=f"dec_band_{sf_name}_"),
            BAND_PARAMS,
        )
        b, _ = _t(lambda: band.build(docs, "doc_id", "text"))
        band.probe(doc_batch, "doc_id", "text").count()
        p = min(
            _t(lambda: band.probe(doc_batch, "doc_id", "text").count())[0]
            for _ in range(2)
        )
        m, _ = _t(lambda: band.upsert(doc_batch, "doc_id", "text"))
        print(
            f"{sf_name:>6} {'band':>9} {n_docs:>8} {b:>8.1f} {p:>8.2f} "
            f"{m:>8.2f}",
            flush=True,
        )
        for mgr in (ivf, fts, band):
            mgr.drop()


if __name__ == "__main__":
    main()
