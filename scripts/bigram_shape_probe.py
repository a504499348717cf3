"""Interleaved A/B for bigram_logprob's bigram-formation shape (r13).

  v0 window — the prior form: posexplode words, keyed lead window over
              (pkey, pos) to pair adjacent words (one full exchange +
              sort of the corpus word stream)
  v1 zipwith — in-row pairs via zip_with+struct: REJECTED (the lambda
              makes it a higher-order function -> CodegenFallback; the
              interpreted per-word struct build measured slower than
              the window it replaced at 8x corpus)
  v2 shipped — in-row pairs via arrays_zip of two shifted slices (no
              lambda, stays in whole-stage codegen; no window, no
              exchange before the count aggregates)

Equality is asserted EXACTLY (sorted rows, float bits via hex) before
any timing; variants then alternate WITHIN one session, several rounds,
so box drift hits both equally.

Usage: python scripts/bigram_shape_probe.py [sf_dir] [repl] [rounds]
  repl   — replicate the docs fixture N times (scale the word stream)
  rounds — interleaved timing rounds (default 5)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, SparkSession, Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from pg_vectorize_spark.functions.text import raw_words_expr  # noqa: E402
from pg_vectorize_spark.operators.curate import (  # noqa: E402
    LOGPROB_SCALE,
    bigram_logprob,
)
from pg_vectorize_spark.operators.skew import (  # noqa: E402
    ensure_min_partitions,
)


def bigram_logprob_window(
    df: DataFrame, text_col: str, pkey: str, alpha: float = 0.5
) -> DataFrame:
    """The pre-rewrite form, verbatim (lead window bigram formation)."""
    import math as _math

    words = ensure_min_partitions(df).select(
        F.col(pkey),
        F.posexplode(raw_words_expr(F.col(text_col))).alias("_pos", "w1"),
    ).localCheckpoint(eager=False)
    wnd = Window.partitionBy(pkey).orderBy("_pos")
    big = (
        words.withColumn("w2", F.lead("w1").over(wnd))
        .filter(F.col("w2").isNotNull())
        .select(pkey, "w1", "w2")
        .localCheckpoint(eager=False)
    )
    c12 = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("_c12"))
    c1 = c12.groupBy("w1").agg(F.sum("_c12").alias("_c1"))
    vocab_size = words.agg(
        F.countDistinct("w1").cast("long").alias("_v")
    )
    _ln = F.pandas_udf(lambda s: s.map(_math.log), "double")
    lp = (
        c12.join(c1, "w1")
        .crossJoin(F.broadcast(vocab_size))
        .withColumn(
            "_lp9",
            F.floor(
                _ln(
                    (F.col("_c12").cast("double") + F.lit(float(alpha)))
                    / (
                        F.col("_c1").cast("double")
                        + F.lit(float(alpha)) * F.col("_v").cast("double")
                    )
                )
                * F.lit(float(LOGPROB_SCALE))
            ).cast("long"),
        )
        .select("w1", "w2", "_lp9")
    )
    per = (
        big.join(lp, ["w1", "w2"])
        .groupBy(pkey)
        .agg(
            F.sum("_lp9").alias("_s"),
            F.count(F.lit(1)).alias("n_bigrams"),
        )
    )
    return per.select(
        pkey,
        "n_bigrams",
        (
            (F.col("_s").cast("double") / F.lit(float(LOGPROB_SCALE)))
            / F.col("n_bigrams").cast("double")
        ).alias("mean_logprob"),
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repl = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "8g")
        .appName("bigram-shape-probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    if repl > 1:
        docs = (
            docs.crossJoin(
                spark.range(repl).select(F.col("id").alias("_r"))
            )
            .withColumn(
                "doc_id",
                F.col("doc_id") * repl + F.col("_r"),
            )
            .drop("_r")
        )
    docs = docs.select("doc_id", "text").localCheckpoint()
    print(f"docs: {docs.count()} rows (repl={repl})")

    def bigram_logprob_zipwith(df, text_col, pkey, alpha=0.5):
        """The REJECTED in-row form: zip_with+struct is a higher-order
        function -> CodegenFallback; the interpreted per-word struct
        build measured slower than the window it replaced. Kept as the
        negative record (the shipped form uses arrays_zip, which has no
        lambda and stays in codegen)."""
        import math as _math

        base = ensure_min_partitions(df).select(
            F.col(pkey), raw_words_expr(F.col(text_col)).alias("_ws")
        ).localCheckpoint(eager=False)
        ws = F.col("_ws")
        n = F.greatest(F.size(ws) - F.lit(1), F.lit(0))
        pairs = F.zip_with(
            F.slice(ws, 1, n),
            F.slice(ws, 2, n),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        )
        big = (
            base.select(F.col(pkey), F.explode(pairs).alias("_bg"))
            .select(pkey, "_bg.w1", "_bg.w2")
            .localCheckpoint(eager=False)
        )
        c12 = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("_c12"))
        c1 = c12.groupBy("w1").agg(F.sum("_c12").alias("_c1"))
        vocab_size = base.select(
            F.explode(F.array_distinct(ws)).alias("w1")
        ).agg(F.countDistinct("w1").cast("long").alias("_v"))
        _ln = F.pandas_udf(lambda s: s.map(_math.log), "double")
        lp = (
            c12.join(c1, "w1")
            .crossJoin(F.broadcast(vocab_size))
            .withColumn(
                "_lp9",
                F.floor(
                    _ln(
                        (F.col("_c12").cast("double") + F.lit(float(alpha)))
                        / (
                            F.col("_c1").cast("double")
                            + F.lit(float(alpha))
                            * F.col("_v").cast("double")
                        )
                    )
                    * F.lit(float(LOGPROB_SCALE))
                ).cast("long"),
            )
            .select("w1", "w2", "_lp9")
        )
        per = (
            big.join(lp, ["w1", "w2"])
            .groupBy(pkey)
            .agg(
                F.sum("_lp9").alias("_s"),
                F.count(F.lit(1)).alias("n_bigrams"),
            )
        )
        return per.select(
            pkey,
            "n_bigrams",
            (
                (F.col("_s").cast("double") / F.lit(float(LOGPROB_SCALE)))
                / F.col("n_bigrams").cast("double")
            ).alias("mean_logprob"),
        )

    variants = {
        "v0_window": lambda: bigram_logprob_window(docs, "text", "doc_id"),
        "v1_zipwith": lambda: bigram_logprob_zipwith(
            docs, "text", "doc_id"
        ),
        "v2_shipped": lambda: bigram_logprob(docs, "text", "doc_id"),
    }

    # ---- exact equality first (float bits) ----
    def canon(df):
        return sorted(
            (
                r["doc_id"],
                r["n_bigrams"],
                float(r["mean_logprob"]).hex(),
            )
            for r in df.collect()
        )

    base = canon(variants["v0_window"]())
    for name, make in variants.items():
        if name == "v0_window":
            continue
        assert canon(make()) == base, f"{name} differs — DO NOT TIME"
    print(f"equality: EXACT on {len(base)} rows (float bits), all variants")

    # ---- interleaved timing ----
    best: dict[str, float] = {}
    for rnd in range(rounds):
        for name, make in variants.items():
            t0 = time.monotonic()
            make().write.format("noop").mode("overwrite").save()
            dt = time.monotonic() - t0
            best[name] = min(best.get(name, 1e9), dt)
            print(f"round {rnd} {name}: {dt:.3f}s")
    print({k: round(v, 3) for k, v in best.items()})


if __name__ == "__main__":
    main()
