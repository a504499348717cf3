"""Interleaved A/B for gopher_flags_exprs binding variants (r13).

The first measurement of per-flag binds came from two processes minutes
apart on a drifting box; this probe alternates variants WITHIN one
session, several rounds, so drift hits all variants equally.

  v0 flat      — current gopher_flags_exprs, all six columns projected
  v1 bound6    — per-flag bind_once_expr (the reverted experiment)
  v2 barrier   — ONE bound struct of all six flags behind an
                 explode-over-singleton barrier, fields extracted after
  p0/p1        — pass_gopher alone: flat vs single-bind

Usage: python scripts/gopher_bind_probe.py [sf_dir] [repl] [rounds]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import Column, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

import pg_vectorize_spark.functions.text as T  # noqa: E402


def _rules(ws: Column, t: Column, min_words=20):
    n_words = F.size(ws).cast("long")
    nw_d = n_words.cast("double")
    mean_word_len = F.when(
        n_words > 0,
        F.aggregate(
            ws, F.lit(0.0), lambda acc, w: acc + F.length(w).cast("double")
        )
        / nw_d,
    ).otherwise(F.lit(0.0))
    n_symbols = (
        F.length(t)
        - F.length(F.regexp_replace(t, "#", ""))
        + F.size(F.split(t, r"\.\.\."))
        - F.lit(1)
    ).cast("long")
    symbol_ratio = F.when(
        n_words > 0, n_symbols.cast("double") / nw_d
    ).otherwise(F.lit(0.0))
    n_alpha_words = F.size(
        F.filter(ws, lambda w: w.rlike("[a-z]"))
    ).cast("long")
    alpha_ratio = F.when(
        n_words > 0, n_alpha_words.cast("double") / nw_d
    ).otherwise(F.lit(0.0))
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(ws),
            F.array(*[F.lit(w) for w in T.GOPHER_STOPS]),
        )
    ).cast("long")
    return {
        "ok_word_count": (n_words >= min_words) & (n_words <= 100_000),
        "ok_mean_word_len": (mean_word_len >= F.lit(3.0))
        & (mean_word_len <= F.lit(10.0)),
        "ok_symbol_ratio": symbol_ratio <= F.lit(0.1),
        "ok_alpha_words": alpha_ratio >= F.lit(0.8),
        "ok_stop_words": stop_hits >= 2,
    }


NAMES = [
    "ok_word_count", "ok_mean_word_len", "ok_symbol_ratio",
    "ok_alpha_words", "ok_stop_words",
]


def _words(t: Column) -> Column:
    return F.filter(F.split(F.lower(t), "[^a-z0-9]+"), lambda x: x != "")


def v0_flat(docs):
    flags = T.gopher_flags_exprs(F.col("text"), min_words=20)
    return docs.select("doc_id", *[flags[k].alias(k) for k in sorted(flags)])


def v1_bound6(docs):
    t = F.coalesce(F.col("text"), F.lit(""))
    words = _words(t)

    def one(name):
        return lambda ws: _rules(ws, t)[name]

    def _pass(ws):
        r = _rules(ws, t)
        out = None
        for n in NAMES:
            out = r[n] if out is None else out & r[n]
        return out

    cols = {n: T.bind_once_expr(words, one(n)) for n in NAMES}
    cols["pass_gopher"] = T.bind_once_expr(words, _pass)
    return docs.select("doc_id", *[cols[k].alias(k) for k in sorted(cols)])


def v2_barrier(docs):
    t = F.coalesce(F.col("text"), F.lit(""))
    words = _words(t)

    def _struct(ws):
        r = _rules(ws, t)
        p = None
        for n in NAMES:
            p = r[n] if p is None else p & r[n]
        return F.struct(
            *[r[n].alias(n) for n in NAMES], p.alias("pass_gopher")
        )

    mat = docs.select(
        "doc_id",
        F.explode(F.array(T.bind_once_expr(words, _struct))).alias("_g"),
    )
    keys = sorted(NAMES + ["pass_gopher"])
    return mat.select("doc_id", *[F.col(f"_g.{k}").alias(k) for k in keys])


def p0_flat(docs):
    flags = T.gopher_flags_exprs(F.col("text"), min_words=20)
    return docs.select("doc_id", flags["pass_gopher"].alias("pass_gopher"))


def p1_bound(docs):
    t = F.coalesce(F.col("text"), F.lit(""))

    def _pass(ws):
        r = _rules(ws, t)
        out = None
        for n in NAMES:
            out = r[n] if out is None else out & r[n]
        return out

    return docs.select(
        "doc_id",
        T.bind_once_expr(_words(t), _pass).alias("pass_gopher"),
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repl = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("gopher-probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs0 = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    docs = docs0
    for i in range(1, repl):
        docs = docs.unionByName(
            docs0.select(
                (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
                "text",
            )
        )
    docs = docs.repartition(8).localCheckpoint()
    print("rows", docs.count())

    variants = {
        "v0_flat": v0_flat, "v1_bound6": v1_bound6, "v2_barrier": v2_barrier,
        "p0_flat": p0_flat, "p1_bound": p1_bound,
    }
    base = {r["doc_id"]: tuple(r)[1:] for r in v0_flat(docs).collect()}
    for name in ("v1_bound6", "v2_barrier"):
        got = {r["doc_id"]: tuple(r)[1:] for r in variants[name](docs).collect()}
        print(f"equality {name}:", "OK" if got == base else "MISMATCH")

    times: dict = {k: [] for k in variants}
    for _ in range(rounds):
        for name, fn in variants.items():
            t0 = time.time()
            fn(docs).write.format("noop").mode("overwrite").save()
            times[name].append(time.time() - t0)
    for name, runs in times.items():
        print(
            f"{name}: best {min(runs):.3f}s  runs {[round(r, 3) for r in runs]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
