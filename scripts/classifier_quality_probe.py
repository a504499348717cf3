"""Quality evidence for the GPT-3-style linear classifier (VERDICT r10
#5): held-out AUC + the Pareto-lottery keep-rate curve, measured on the
corpus fixtures rather than the unit-test toys.

Setup mirrors the GPT-3 recipe at probe scale: positives = the sf
documents table (the "curated reference"); negatives = a word-salad
rewrite OF THE SAME corpus (each doc's words re-drawn i.i.d. from the
corpus unigram distribution, deterministic per doc) — the adversarial
case where unigram statistics match and the model must rely on its
bigram features. An 80/20 deterministic hash split keeps train and
held-out disjoint.

python scripts/classifier_quality_probe.py [sf_dir]
Writes /tmp/classifier_quality_probe.json (standing probe rule).
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")


def _auc(pairs: list[tuple[float, int]]) -> float:
    """Exact ROC AUC via the rank statistic (ties get midranks)."""
    pairs = sorted(pairs)
    n = len(pairs)
    ranks = [0.0] * n
    i = 0
    while i < n:
        j = i
        while j + 1 < n and pairs[j + 1][0] == pairs[i][0]:
            j += 1
        mid = (i + j) / 2.0 + 1.0
        for k in range(i, j + 1):
            ranks[k] = mid
        i = j + 1
    pos = [r for r, (_, y) in zip(ranks, pairs) if y == 1]
    n_pos = len(pos)
    n_neg = n - n_pos
    if not n_pos or not n_neg:
        return float("nan")
    return (sum(pos) - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .appName("classifier-quality-probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pg_vectorize_spark.operators.classify import (
        pareto_lottery_filter,
        score_quality,
        train_quality_classifier,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    # word-salad negatives: shuffle each doc's OWN words deterministically
    # (per-word hash order) — unigram multiset preserved exactly, word
    # order (and therefore every bigram) destroyed
    salad = docs.select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.transform(
                        F.split(F.col("text"), " "),
                        lambda w: F.struct(
                            F.xxhash64(w, F.col("doc_id")).alias("h"),
                            w.alias("w"),
                        ),
                    )
                ),
                lambda s: s["w"],
            ),
            " ",
        ).alias("text"),
    )

    labeled = docs.select(
        "doc_id", "text", F.lit(1.0).alias("_label")
    ).unionByName(salad.select("doc_id", "text", F.lit(0.0).alias("_label")))
    train = labeled.filter(F.pmod(F.xxhash64("doc_id"), F.lit(5)) != 0)
    test = labeled.filter(F.pmod(F.xxhash64("doc_id"), F.lit(5)) == 0)

    import time

    t0 = time.monotonic()
    model = train_quality_classifier(train, "text", "_label")
    train_sec = time.monotonic() - t0

    scored = score_quality(model, test, "text").select(
        "quality_prob", F.col("_label").cast("int").alias("y")
    )
    pairs = [(r["quality_prob"], r["y"]) for r in scored.collect()]
    auc = _auc(pairs)

    # Pareto keep-rate curve: keep fraction per score decile over a
    # synthetic uniform score grid (10k ids per decile) — the lottery is
    # deterministic per (id, salt), so this IS the acceptance curve
    grid = spark.range(0, 100_000).select(
        F.col("id"),
        ((F.col("id") % 10).cast("double") / 10.0 + 0.05).alias(
            "quality_prob"
        ),
    )
    kept = pareto_lottery_filter(grid, "id")
    curve = {
        f"{b / 10 + 0.05:.2f}": 0.0 for b in range(10)
    }
    for r in (
        kept.groupBy("quality_prob")
        .count()
        .collect()
    ):
        curve[f"{r['quality_prob']:.2f}"] = r["count"] / 10_000.0
    out = {
        "sf_dir": sf_dir,
        "n_train": train.count(),
        "n_test": len(pairs),
        "train_sec": round(train_sec, 1),
        "heldout_auc": round(auc, 4),
        "pareto_keep_rate_by_score": dict(sorted(curve.items())),
    }
    with open("/tmp/classifier_quality_probe.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
