"""A/B probe for the multilang analyzer hot path (r13 optimization).

Variants measured over the sf0.1 documents corpus replicated REPL times
(noop sink, best-of-3), each checked for EXACT result equality against
the current implementation before its timing is trusted:

  v0  current: lang_id_expr + multilang_tokens_expr (marker guard),
      explode-over-singleton barrier (the shape of
      q_unicode_multiscript_tokens today)
  v1  v0 with lang_id_expr2: marker argmax bound ONCE via a
      transform-over-singleton lambda (words evaluated once per row)
  v2  DataFrame-level materialization: ONE barrier projection computes
      (lang, expanded_tokens) per row, dispatch happens on the
      materialized columns (mirrors the oracle's own CTE structure)
  v3  v2 + lang from lang_id_expr2

Usage: python scripts/analyzer_perf_probe.py [sf_dir] [repl]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import Column, DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

import pg_vectorize_spark.functions.text as T  # noqa: E402


def lang_id_expr2(text: Column) -> Column:
    """Candidate rewrite of lang_id_expr: identical values, one
    evaluation of the tokenize subtree per row (bound via a
    transform-over-singleton lambda)."""
    t = F.coalesce(text, F.lit(""))

    def _argmax(words: Column) -> Column:
        # struct array_max: max score, tie -> first lang in sorted order
        langs = sorted(T.LANG_MARKERS)
        arr = F.array(
            *[
                F.struct(
                    F.size(
                        F.array_intersect(
                            words,
                            F.array(*[F.lit(w) for w in T.LANG_MARKERS[lng]]),
                        )
                    ).alias("s"),
                    F.lit(-i).alias("o"),
                    F.lit(lng).alias("l"),
                )
                for i, lng in enumerate(langs)
            ]
        )
        best = F.array_max(arr)
        return F.when(best["s"] > 0, best["l"]).otherwise(F.lit("unknown"))

    words = F.array_distinct(
        F.filter(
            F.split(F.lower(t), "[^a-z0-9]+"),
            lambda x: x != "",
        )
    )
    marker = F.element_at(
        F.transform(F.array(words), _argmax), 1
    )
    result = marker
    for lang, cls in reversed(T.SCRIPT_LANGS):
        result = F.when(t.rlike(cls), F.lit(lang)).otherwise(result)
    return result


def multilang_from_parts(lang: Column, expanded: Column) -> Column:
    """Dispatch on MATERIALIZED (lang, expanded-token) columns: only the
    stop/stem stage is per-branch; conditions are plain string compares."""
    def _branch(stem: bool, lng: str = "en") -> Column:
        stops = T.STOP_WORDS_BY_LANG[lng] if stem else T.STOP_WORDS
        kept = F.array_except(
            expanded, F.array(*[F.lit(w) for w in stops])
        )
        if stem:
            kept = F.transform(kept, lambda t: T.stem_token_expr(t, lng))
        return F.array_distinct(kept)

    out = _branch(False)
    for code in T.STEMMED_LANGS:
        out = F.when(lang == code, _branch(True, code)).otherwise(out)
    return out


def shape_v0(docs: DataFrame) -> DataFrame:
    lang = T.lang_id_expr(F.col("text"))
    toks = T.multilang_tokens_expr(
        F.col("text"), lang=lang, assume_lang_id=True
    )
    return docs.select(
        "doc_id",
        lang.alias("detected_lang"),
        F.explode(F.array(toks)).alias("_toks"),
    ).select(
        "doc_id",
        "detected_lang",
        F.array_join(F.array_sort("_toks"), " ").alias("search_tokens"),
        F.size("_toks").alias("n_terms"),
    )


def shape_v1(docs: DataFrame) -> DataFrame:
    lang = lang_id_expr2(F.col("text"))
    toks = T.multilang_tokens_expr(
        F.col("text"), lang=lang, assume_lang_id=True
    )
    return docs.select(
        "doc_id",
        lang.alias("detected_lang"),
        F.explode(F.array(toks)).alias("_toks"),
    ).select(
        "doc_id",
        "detected_lang",
        F.array_join(F.array_sort("_toks"), " ").alias("search_tokens"),
        F.size("_toks").alias("n_terms"),
    )


def shape_v2(docs: DataFrame, lang_fn) -> DataFrame:
    parts = F.struct(
        lang_fn(F.col("text")).alias("lang"),
        T.cjk_bigram_expand_expr(
            T.unicode_raw_words_expr(F.col("text"))
        ).alias("expanded"),
    )
    mat = docs.select(
        "doc_id", F.explode(F.array(parts)).alias("_p")
    ).select(
        "doc_id",
        F.col("_p.lang").alias("detected_lang"),
        F.col("_p.expanded").alias("_expanded"),
    )
    toks = multilang_from_parts(F.col("detected_lang"), F.col("_expanded"))
    # second barrier: search_tokens and n_terms both consume toks
    return mat.select(
        "doc_id",
        "detected_lang",
        F.explode(F.array(toks)).alias("_toks"),
    ).select(
        "doc_id",
        "detected_lang",
        F.array_join(F.array_sort("_toks"), " ").alias("search_tokens"),
        F.size("_toks").alias("n_terms"),
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repl = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("analyzer-probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs0 = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id"), F.col("text")
    )
    # replicate to amplify per-row costs; distinct doc_ids per replica
    docs = docs0
    for i in range(1, repl):
        docs = docs.unionByName(
            docs0.select(
                (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
                "text",
            )
        )
    docs = docs.repartition(8).localCheckpoint()  # pin input, isolate analyzer cost
    n = docs.count()
    print(f"rows: {n}")

    variants = {
        "v0_current": lambda: shape_v0(docs),
        "v1_langid2": lambda: shape_v1(docs),
        "v2_mat_langid1": lambda: shape_v2(docs, T.lang_id_expr),
        "v3_mat_langid2": lambda: shape_v2(docs, lang_id_expr2),
    }

    # correctness: exact row equality vs v0
    base = {
        r["doc_id"]: (r["detected_lang"], r["search_tokens"], r["n_terms"])
        for r in shape_v0(docs).collect()
    }
    for name, fn in variants.items():
        if name == "v0_current":
            continue
        got = {
            r["doc_id"]: (r["detected_lang"], r["search_tokens"], r["n_terms"])
            for r in fn().collect()
        }
        diff = {k for k in base if base[k] != got.get(k)}
        status = "OK" if not diff and len(got) == len(base) else f"MISMATCH {len(diff)} rows: {sorted(diff)[:3]}"
        print(f"equality {name}: {status}")
        if diff:
            for k in sorted(diff)[:3]:
                print(f"  base: {base[k]}")
                print(f"  got : {got.get(k)}")

    for name, fn in variants.items():
        runs = []
        for _ in range(3):
            t0 = time.time()
            fn().write.format("noop").mode("overwrite").save()
            runs.append(time.time() - t0)
        print(f"{name}: best {min(runs):.3f}s  runs {[round(r,3) for r in runs]}")

    spark.stop()


if __name__ == "__main__":
    main()
