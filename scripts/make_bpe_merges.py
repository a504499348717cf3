"""Train the committed BPE merge fixture (tests/fixtures/bpe_merges.json).

Same pattern as scripts/make_pq_codebook.py: the model artifact is
trained ONCE, deterministically, and committed; the oracle gate then
verifies the distributed ENCODE under the committed merges bit-for-bit
(training itself is pinned by pytest parity in tests/test_bpe.py).

Run:  python scripts/make_bpe_merges.py
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

N_MERGES = 60
SF_DIR = "/root/testdata/sf0.001"
OUT = "/root/repo/tests/fixtures/bpe_merges.json"


def main() -> None:
    from pyspark.sql import SparkSession

    from pg_vectorize_spark.operators.bpe import bpe_train, bpe_word_counts

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    merges = bpe_train(bpe_word_counts(docs, "text"), N_MERGES)
    with open(OUT, "w") as f:
        json.dump(
            {"n_merges": len(merges), "sf_dir": SF_DIR, "merges": merges},
            f,
            indent=1,
        )
    print(f"wrote {OUT}: {len(merges)} merges, first 5 {merges[:5]}")
    spark.stop()


if __name__ == "__main__":
    main()
