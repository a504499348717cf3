"""Cross-path embedding parity: the numpy provider, the JVM expression, the
exploded groupBy path, and the pandas-UDF path must all produce identical
vectors — they are one spec with three execution strategies."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from pg_vectorize_spark.functions.vector import embed_expr
from pg_vectorize_spark.operators.embed import (
    embed_bulk_exploded,
    embed_bulk_pandas,
)
from pg_vectorize_spark.providers.local import LocalHashEmbedder

DIM = 64

TEXTS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "spark window merge batch data"),
    (2, "Hello, World! 42 times."),
    (3, ""),
    (4, None),
    (5, "a"),
    (6, "repeated repeated repeated words words"),
]


def _df(spark):
    return spark.createDataFrame(TEXTS, "id long, text string")


def _collect_map(df, vec_col):
    return {r["id"]: list(r[vec_col]) for r in df.collect()}


def test_exploded_matches_numpy(spark):
    emb = LocalHashEmbedder(dim=DIM)
    got = _collect_map(embed_bulk_exploded(_df(spark), "text", "id", DIM), "embeddings")
    for i, t in TEXTS:
        expect = emb.embed_one(t or "")
        assert got[i] == expect, f"row {i} mismatch"


def test_pandas_matches_numpy(spark):
    got = _collect_map(embed_bulk_pandas(_df(spark), "text", "id", dim=DIM), "embeddings")
    emb = LocalHashEmbedder(dim=DIM)
    for i, t in TEXTS:
        assert got[i] == emb.embed_one(t or ""), f"row {i} mismatch"


def test_expr_matches_numpy(spark):
    df = _df(spark).select("id", embed_expr(F.col("text"), DIM).alias("v"))
    got = _collect_map(df, "v")
    emb = LocalHashEmbedder(dim=DIM)
    for i, t in TEXTS:
        assert got[i] == emb.embed_one(t or ""), f"row {i} mismatch"


def test_vectors_are_unit_norm(spark):
    got = _collect_map(embed_bulk_exploded(_df(spark), "text", "id", DIM), "embeddings")
    for i, t in TEXTS:
        n = sum(x * x for x in got[i])
        if t:
            assert math.isclose(n, 1.0, rel_tol=1e-12)
        else:
            assert n == 0.0
