"""Hot-term postings-index probe (VERDICT r7 #4): worst-case behavior of
the GIN-analog postings index when a query term is stopword-grade.

The index prunes by term-hash bucket (fts_index.JobFtsIndexManager
PART_COL), so a high-df term selects ONE bucket but still aggregates its
full posting list — Postgres GIN has the same pathology, and its planner
falls back to a seqscan when the cost estimator says the posting lists
are too fat. This probe measures that regime at sf1.0 (50k docs):

  * the fixture's natural df spectrum tops out at ~8% (the sf1.0 tiling
    suffixes words per copy), so the stopword regime is SYNTHESIZED: a
    marker term is appended to 50% / 90% of documents and the index is
    rebuilt over that corpus,
  * probe-vs-full-scan wall time for the mid-df bench query, the
    synthetic 50%- and 90%-df terms alone, and hot+bench mixes,
  * postings rows entering the aggregate for each (the scan-fraction
    number SCALING.md reports).

Fairness: the full-scan baseline reads a PARQUET tokens snapshot (the
engine's _search_tokens dataset is stored parquet), not a memory-cached
frame; both paths pay their real I/O.

Output: a markdown table for SCALING.md's manual section plus the
decision input for "bounded, no action" vs a df-capped fallback.

python scripts/fts_hotterm_probe.py [sf_dir]   # default .scaling/sf1.0
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

HOT50 = "hotterm50"
HOT90 = "hotterm90"


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scaling/sf1.0"
    if not os.path.isdir(sf_dir):
        sys.exit(f"{sf_dir} missing — run scripts/make_scaling_sf1.py first")

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "8g")
        .appName("fts-hotterm-probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod
    from pg_vectorize_spark.fts_index import JobFtsIndexManager
    from pg_vectorize_spark.functions import text as T
    from pg_vectorize_spark.operators.search import full_text_search

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()

    root = tempfile.mkdtemp(prefix="pvs_hotterm_")
    try:
        # tokens snapshot WITH synthetic hot terms: HOT50 in 50% of docs,
        # HOT90 in 90% — appended to the token array (stored tokens are
        # distinct per doc; the markers collide with nothing)
        tok_path = f"{root}/tokens"
        base = docs.select(
            "doc_id", T.tokens_expr(F.col("text")).alias("search_tokens")
        )
        hot = base.select(
            "doc_id",
            F.when(
                F.col("doc_id") % 10 < 9,
                F.when(
                    F.col("doc_id") % 2 == 0,
                    F.concat(
                        "search_tokens", F.array(F.lit(HOT50), F.lit(HOT90))
                    ),
                ).otherwise(
                    F.concat("search_tokens", F.array(F.lit(HOT90)))
                ),
            )
            .otherwise(
                F.when(
                    F.col("doc_id") % 2 == 0,
                    F.concat("search_tokens", F.array(F.lit(HOT50))),
                ).otherwise(F.col("search_tokens"))
            )
            .alias("search_tokens"),
        )
        hot.write.parquet(tok_path)
        tokens = spark.read.parquet(tok_path)
        for t in (HOT50, HOT90):
            df_t = tokens.filter(
                F.array_contains("search_tokens", t)
            ).count()
            print(f"{t}: df={df_t} ({df_t/n_docs:.1%})")

        idx_dir = f"{root}/idx"
        mgr = JobFtsIndexManager(spark, idx_dir, {"term_buckets": 64})
        mgr.build(tokens, "doc_id")
        total_postings = spark.read.parquet(idx_dir).count()
        print(f"n_docs={n_docs} total postings rows: {total_postings}")

        bench_terms = entrymod.QUERY_TERMS
        cases = [
            ("bench 5-term (mid-df)", entrymod.QUERY_TEXT, bench_terms),
            (f"hot 50%-df alone", HOT50, [HOT50]),
            (f"hot 90%-df alone", HOT90, [HOT90]),
            (
                "hot 50% + bench terms",
                f"{HOT50} {entrymod.QUERY_TEXT}",
                [HOT50, *bench_terms],
            ),
            (
                "hot 90% + bench terms",
                f"{HOT90} {entrymod.QUERY_TEXT}",
                [HOT90, *bench_terms],
            ),
        ]

        def best_of(fn, n=3):
            best = float("inf")
            for _ in range(n):
                t0 = time.time()
                fn().write.format("noop").mode("overwrite").save()
                best = min(best, time.time() - t0)
            return best

        rows = []
        for label, qtext, qterms in cases:
            buckets = mgr.query_buckets(qterms)
            idx = spark.read.parquet(idx_dir)
            hit_rows = idx.filter(
                F.col(mgr.PART_COL).isin(buckets)
                & F.col("term").isin(list(qterms))
            ).count()

            t_idx = best_of(
                lambda: full_text_search(
                    docs.select("doc_id", "lang", "n_chars"),
                    "doc_id",
                    qtext,
                    text_cols=["text"],
                    num_results=10,
                    fts_scored_df=mgr.probe_scores(qterms),
                )
            )
            t_scan = best_of(
                lambda: full_text_search(
                    docs.select("doc_id", "lang", "n_chars"),
                    "doc_id",
                    qtext,
                    text_cols=["text"],
                    num_results=10,
                    tokens_df=spark.read.parquet(tok_path),
                )
            )
            frac = hit_rows / total_postings
            rows.append(
                (label, len(buckets), hit_rows, frac, t_idx, t_scan)
            )
            print(
                f"{label}: buckets={len(buckets)}/64 postings={hit_rows} "
                f"({frac:.1%}) indexed={t_idx:.2f}s scan={t_scan:.2f}s"
            )

        print("\nmarkdown:\n")
        print(
            "| query | buckets | postings rows (frac) | indexed "
            "| full scan | scan/indexed |"
        )
        print("|---|---|---|---|---|---|")
        for label, nb, hr, frac, t_idx, t_scan in rows:
            print(
                f"| {label} | {nb}/64 | {hr} ({frac:.1%}) | {t_idx:.2f} s "
                f"| {t_scan:.2f} s | {t_scan/t_idx:.2f}x |"
            )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
