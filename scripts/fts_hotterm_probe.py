"""Hot-term postings-index probe (VERDICT r7 #4): worst-case behavior of
the GIN-analog postings index when a query term is stopword-grade.

The index prunes by term-hash bucket (fts_index.JobFtsIndexManager
PART_COL), so a high-df term selects ONE bucket but still aggregates its
full posting list — Postgres GIN has the same pathology, and its planner
falls back to a seqscan when the cost estimator says the posting lists
are too fat. This probe measures that regime at sf1.0 (50k docs):

  * df spectrum of the fixture vocabulary (what "hot" means here),
  * probe-vs-full-scan wall time for the mid-df bench query, a
    deliberately hot ~50%-df term, and the hottest term in the corpus,
  * postings rows entering the aggregate for each (the scan-fraction
    number SCALING.md reports).

Output: a markdown table for SCALING.md's manual section plus the
decision input for "bounded, no action" vs a df-capped fallback.

python scripts/fts_hotterm_probe.py [sf_dir]   # default .scaling/sf1.0
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")


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
    from pg_vectorize_spark.functions import text as T
    from pg_vectorize_spark.operators.search import full_text_search

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()
    tokens = docs.select(
        "doc_id", T.tokens_expr(F.col("text")).alias("search_tokens")
    ).localCheckpoint()

    # ---- df spectrum: what does the fixture vocabulary look like? -----
    df_tbl = (
        tokens.select(F.explode("search_tokens").alias("term"))
        .groupBy("term")
        .count()
        .orderBy(F.desc("count"))
    )
    top = df_tbl.limit(12).collect()
    print(f"n_docs={n_docs}; top-df terms:")
    for r in top:
        print(f"  {r['term']!r}: df={r['count']} ({r['count']/n_docs:.1%})")

    hottest = top[0]["term"]
    # a term as close to 50% df as the fixture offers
    mid_hot = min(top, key=lambda r: abs(r["count"] / n_docs - 0.5))["term"]

    mgr = entrymod._fts_gate_index(spark, sf_dir)

    bench_terms = entrymod.QUERY_TERMS
    cases = [
        ("bench 5-term (mid-df)", entrymod.QUERY_TEXT, bench_terms),
        (f"hot ~50% ({mid_hot!r})", mid_hot, [mid_hot]),
        (f"hottest ({hottest!r})", hottest, [hottest]),
        (
            f"mixed (hottest + bench)",
            f"{hottest} {entrymod.QUERY_TEXT}",
            T.analyze_query(f"{hottest} {entrymod.QUERY_TEXT}"),
        ),
    ]

    total_postings = spark.read.parquet(mgr.index_dir).count()
    print(f"total postings rows: {total_postings}")

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
        idx = spark.read.parquet(mgr.index_dir)
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
                tokens_df=tokens,
            )
        )
        frac = hit_rows / total_postings
        rows.append((label, len(buckets), hit_rows, frac, t_idx, t_scan))
        print(
            f"{label}: buckets={len(buckets)}/64 postings={hit_rows} "
            f"({frac:.1%}) indexed={t_idx:.2f}s scan={t_scan:.2f}s"
        )

    print("\nmarkdown:\n")
    print(
        "| query | buckets | postings rows (frac) | indexed | full scan "
        "| ratio |"
    )
    print("|---|---|---|---|---|---|")
    for label, nb, hr, frac, t_idx, t_scan in rows:
        print(
            f"| {label} | {nb}/64 | {hr} ({frac:.1%}) | {t_idx:.2f} s "
            f"| {t_scan:.2f} s | {t_scan/t_idx:.2f}x |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
