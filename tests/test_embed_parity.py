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


class TestDedupContentEmbed:
    """dedup_content=True: embed each distinct text once, join back —
    bit-identical output, provider sees only the distinct set."""

    def _df(self, spark):
        rows = [(i, f"template body {i % 5}") for i in range(40)]
        rows += [(100, None), (101, ""), (102, None)]
        return spark.createDataFrame(rows, "id long, txt string")

    def test_bit_parity_with_direct_path(self, spark):
        from pg_vectorize_spark.operators.embed import embed_bulk_pandas

        df = self._df(spark)
        direct = embed_bulk_pandas(df, "txt", "id", dim=16)
        deduped = embed_bulk_pandas(df, "txt", "id", dim=16, dedup_content=True)
        a = {r["id"]: tuple(r["embeddings"]) for r in direct.collect()}
        b = {r["id"]: tuple(r["embeddings"]) for r in deduped.collect()}
        assert a == b  # every key, bit-equal vectors (null == "" too)

    def test_provider_sees_distinct_only(self, spark, tmp_path):
        from pg_vectorize_spark.operators.embed import embed_bulk_pandas

        # the provider runs on executor workers: count its inputs via a
        # shared file (local mode = one filesystem); the class is
        # function-local so cloudpickle ships it by value
        log = str(tmp_path / "provider_inputs.log")

        class CountingProvider:
            def __init__(self, path, dim=16):
                from pg_vectorize_spark.providers.local import (
                    LocalHashEmbedder,
                )

                self.inner = LocalHashEmbedder(dim=dim)
                self.path = path

            def model_dim(self):
                return self.inner.model_dim()

            def generate_embedding(self, inputs):
                with open(self.path, "a") as f:
                    for t in inputs:
                        f.write(repr(t) + "\n")
                return self.inner.generate_embedding(inputs)

        df = self._df(spark)
        out = embed_bulk_pandas(
            df, "txt", "id", provider=CountingProvider(log),
            dedup_content=True,
        )
        assert out.count() == 43
        seen = open(log).read().splitlines()
        # 5 distinct templates + "" (nulls normalize to it) = 6 texts,
        # each embedded exactly once
        assert len(seen) == 6
        assert len(set(seen)) == 6

    def test_passthrough_cols_survive(self, spark):
        from pg_vectorize_spark.operators.embed import embed_bulk_pandas
        from pyspark.sql import functions as F

        df = self._df(spark).withColumn("fp", F.length(F.coalesce("txt", F.lit(""))))
        out = embed_bulk_pandas(
            df, "txt", "id", dim=16,
            passthrough_cols=["fp"], dedup_content=True,
        )
        got = {r["id"]: r["fp"] for r in out.collect()}
        want = {r["id"]: r["fp"] for r in df.collect()}
        assert got == want

    def test_engine_job_param(self, spark, tmp_path):
        from pg_vectorize_spark.engine import VectorizeSession
        from pyspark.sql import functions as F

        docs = spark.createDataFrame(
            [(i, f"repeated content {i % 3}") for i in range(30)],
            "id long, content string",
        )
        src = str(tmp_path / "dsrc")
        docs.write.parquet(src)
        sess = VectorizeSession(spark, workspace=str(tmp_path / "ws_d"))
        sess.create_job(
            "djob2", src, columns=["content"], primary_key="id",
            embed_dedup_content=True,
        )
        sess.scan_job("djob2")
        emb = sess._emb_ds("djob2").read()
        assert emb.count() == 30
        # all rows with the same content share one exact vector
        n_distinct = (
            emb.select(F.col("embeddings").cast("string")).distinct().count()
        )
        assert n_distinct == 3
        res = sess.search("djob2", "repeated content 1", num_results=3)
        assert len(res) == 3
