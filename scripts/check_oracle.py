"""Self-check harness CLI: compare queries() vs oracle_sql() via DuckDB.

Usage: python scripts/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pg_vectorize_spark.oracle_check import run_checks  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or None

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .appName("oracle-check")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    results = run_checks(spark, sf_dir, names)
    n_pass = n_fail = n_skip = 0
    for r in results:
        if r.rows_only:
            print(f"SKIP {r.name}: no oracle (rows-only: {r.rows} rows)")
            n_skip += 1
        elif r.ok:
            print(f"PASS {r.name} ({r.seconds:.1f}s, {r.rows} rows)")
            n_pass += 1
        else:
            print(f"FAIL {r.name} ({r.seconds:.1f}s, {r.rows} rows):")
            for p in r.problems:
                print(f"   - {p}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} rows-only")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
