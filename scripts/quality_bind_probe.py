"""A/B probe: quality_score_expr in filter contexts (quality_filter gate,
engine min_quality curation filter, pipeline filter_quality).

The committed plan (plans/r13/quality_filter_after.txt) shows the FULL score
tree evaluated twice per row (Filter condition + Project output), and within
each evaluation the words split/filter subtree appears 4x. Variants:

  v0  current: flat expr, filter+project double eval
  v1  bound: words bound once inside the score (single-consumer bind),
      still double eval
  v2  bound + explode-over-singleton barrier: single eval of the score
  v3  flat + barrier

Pure-filter shape (engine curation gate): f0 flat vs f1 bound.

Exact row equality asserted for every variant before timing; variants
alternate WITHIN one session (box-noise protocol).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from pg_vectorize_spark.functions import text as T


def score_bound(text):
    t = F.coalesce(text, F.lit(""))
    words = F.filter(F.split(F.lower(t), "[^a-z0-9]+"), lambda x: x != "")

    def _score(ws):
        n_chars = F.length(t).cast("long")
        n_words = F.size(ws).cast("long")
        n_punct = F.length(F.regexp_replace(t, r"[A-Za-z0-9\s]", "")).cast(
            "long"
        )
        punct_ratio = F.when(
            n_chars > 0, n_punct.cast("double") / n_chars.cast("double")
        ).otherwise(F.lit(0.0))
        stop_hits = F.size(
            F.array_intersect(
                F.array_distinct(ws),
                F.array(*[F.lit(w) for w in T.STOP_WORDS]),
            )
        ).cast("long")
        stopword_ratio = F.when(
            n_words > 0, stop_hits.cast("double") / n_words.cast("double")
        ).otherwise(F.lit(0.0))
        len_term = F.least(n_chars.cast("double") / F.lit(500.0), F.lit(1.0))
        word_term = F.least(n_words.cast("double") / F.lit(50.0), F.lit(1.0))
        punct_term = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio * 5.0)
        stop_term = F.least(stopword_ratio * 2.0, F.lit(1.0))
        return (
            len_term * 0.25
            + word_term * 0.25
            + punct_term * 0.25
            + stop_term * 0.25
        )

    return T.bind_once_expr(words, _score)


def gate_v0(docs):
    return docs.select(
        "doc_id", "lang", T.quality_score_expr(F.col("text")).alias("quality_score")
    ).filter(F.col("quality_score") >= 0.5)


def gate_v1(docs):
    return docs.select(
        "doc_id", "lang", score_bound(F.col("text")).alias("quality_score")
    ).filter(F.col("quality_score") >= 0.5)


def _barrier_gate(docs, expr):
    return docs.select(
        "doc_id", "lang", F.explode(F.array(expr)).alias("quality_score")
    ).filter(F.col("quality_score") >= 0.5)


def gate_v2(docs):
    return _barrier_gate(docs, score_bound(F.col("text")))


def gate_v3(docs):
    return _barrier_gate(docs, T.quality_score_expr(F.col("text")))


def filt_f0(docs):
    return docs.filter(T.quality_score_expr(F.col("text")) >= 0.5).select(
        "doc_id"
    )


def filt_f1(docs):
    return docs.filter(score_bound(F.col("text")) >= 0.5).select("doc_id")


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "8g")
        .appName("quality-bind-probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))

    # equality (bit-exact incl. score value) across all gate variants
    def canon(df):
        return sorted(
            (r["doc_id"], r["lang"], float(r["quality_score"]).hex())
            for r in df.collect()
        )

    base = canon(gate_v0(docs))
    for name, fn in [("v1", gate_v1), ("v2", gate_v2), ("v3", gate_v3)]:
        got = canon(fn(docs))
        assert got == base, f"{name} MISMATCH"
        print(f"  equality OK: {name} ({len(got)} rows)")
    fbase = sorted(r["doc_id"] for r in filt_f0(docs).collect())
    fgot = sorted(r["doc_id"] for r in filt_f1(docs).collect())
    assert fgot == fbase, "f1 MISMATCH"
    print(f"  equality OK: f1 ({len(fgot)} rows)")

    shapes = {
        "gate": {"v0": gate_v0, "v1": gate_v1, "v2": gate_v2, "v3": gate_v3},
        "pure_filter": {"f0": filt_f0, "f1": filt_f1},
    }
    best = {s: {v: float("inf") for v in vs} for s, vs in shapes.items()}
    for shape, vs in shapes.items():
        for fn in vs.values():
            fn(docs).write.format("noop").mode("overwrite").save()
        for r in range(rounds):
            for vname, fn in vs.items():
                spark.sparkContext.setJobDescription(f"{shape}/{vname}/r{r}")
                t0 = time.time()
                fn(docs).write.format("noop").mode("overwrite").save()
                dt = time.time() - t0
                best[shape][vname] = min(best[shape][vname], dt)
                print(f"  {shape:>12} {vname} r{r}: {dt:.3f}s", flush=True)
    print("\nbest-of-interleaved:")
    for shape, vs in best.items():
        print(f"  {shape}: " + "  ".join(f"{v} {t:.3f}s" for v, t in vs.items()))
    spark.stop()


if __name__ == "__main__":
    main()
