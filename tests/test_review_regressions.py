"""Regression tests for code-review findings: string primary keys through
every Arrow path, mixed streaming/batch writers on one job, REST parameter
validation, chunker input validation, import normalization."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from pg_vectorize_spark.engine import VectorizeSession
from pg_vectorize_spark.multimodal.binary import decode_media
from pg_vectorize_spark.operators.chunk import chunk_table_greedy, chunk_text_greedy
from pg_vectorize_spark.operators.embed import embed_bulk_pandas
from pg_vectorize_spark.streaming.incremental import RealtimePipeline


@pytest.fixture()
def sess(spark, tmp_path):
    return VectorizeSession(spark, workspace=str(tmp_path / "ws"))


class TestStringPrimaryKeys:
    def test_embed_bulk_pandas_string_pkey(self, spark):
        df = spark.createDataFrame(
            [("doc-1", "hello world"), ("doc-2", "spark engine")],
            "id string, text string",
        )
        out = embed_bulk_pandas(df, "text", "id", dim=16).collect()
        assert {r["id"] for r in out} == {"doc-1", "doc-2"}

    def test_chunk_table_greedy_string_pkey(self, spark):
        df = spark.createDataFrame(
            [("u-9", "This is a test for chunking.")], "id string, body string"
        )
        out = chunk_table_greedy(df, "body", "id", 20).collect()
        assert out[0]["original_id"] == "u-9"

    def test_decode_media_string_pkey(self, spark):
        df = spark.createDataFrame(
            [("img-1", bytearray(b"abc"))], "id string, content binary"
        )
        out = decode_media(df, "content", "id", fake=True).collect()
        assert out[0]["pkey"] == "img-1"

    def test_full_job_lifecycle_string_pkey(self, spark, sess, tmp_path):
        df = spark.createDataFrame(
            [("a1", "pizza with cheese"), ("b2", "pencil for writing")],
            "id string, content string",
        )
        src = str(tmp_path / "s.parquet")
        df.write.parquet(src)
        sess.create_job("strjob", src, columns=["content"], primary_key="id")
        out = sess.search("strjob", "pizza cheese", num_results=1)
        assert out[0]["id"] == "a1"


class TestMixedWriterPaths:
    def test_stream_then_scan_same_job(self, spark, sess, tmp_path):
        """Streaming writes content_fp; a later batch scan_job must merge
        cleanly into the same dataset (schemas unified)."""
        src = str(tmp_path / "mix_src")
        spark.createDataFrame(
            [(1, "first doc")], "id long, content string"
        ).coalesce(1).write.parquet(src)
        sess.create_job(
            "mix", src, columns=["content"], primary_key="id",
            run_initial_load=False,
        )
        pipe = RealtimePipeline(sess, "mix")
        q = pipe.start(available_now=True)
        q.awaitTermination(120)
        # batch path on top of the streaming-written dataset
        spark.createDataFrame(
            [(2, "second doc")], "id long, content string"
        ).coalesce(1).write.mode("append").parquet(src)
        assert sess.scan_job("mix") == 1
        cols = set(sess._emb_ds("mix").read().columns)
        assert "content_fp" in cols
        assert sess.search("mix", "second doc", num_results=1)[0]["id"] == 2

    def test_scan_then_stream_same_job(self, spark, sess, tmp_path):
        src = str(tmp_path / "mix2_src")
        spark.createDataFrame(
            [(1, "alpha text")], "id long, content string"
        ).coalesce(1).write.parquet(src)
        sess.create_job("mix2", src, columns=["content"], primary_key="id")
        # batch wrote first; the stream's diff guard must see content_fp
        spark.createDataFrame(
            [(1, "alpha text")], "id long, content string"
        ).coalesce(1).write.mode("append").parquet(src)
        v1 = sess._emb_ds("mix2").current_version()
        pipe = RealtimePipeline(sess, "mix2")
        q = pipe.start(available_now=True)
        q.awaitTermination(120)
        # identical content redelivered -> guard skips, no new snapshot
        assert sess._emb_ds("mix2").current_version() == v1


class TestValidationFixes:
    def test_chunk_text_rejects_nonpositive(self):
        with pytest.raises(ValueError):
            chunk_text_greedy("hello", 0)
        with pytest.raises(ValueError):
            chunk_text_greedy("hello", -3)

    def test_import_embeddings_normalized(self, spark, sess, tmp_path):
        src = str(tmp_path / "p.parquet")
        spark.createDataFrame(
            [(1, "a"), (2, "b")], "pid long, t string"
        ).write.parquet(src)
        sess.create_job(
            "normjob", src, columns=["t"], primary_key="pid",
            run_initial_load=False,
        )
        sess.catalog.get("normjob").dim = 3
        sess.catalog.create(sess.catalog.get("normjob"), replace=True)
        ext = spark.createDataFrame(
            [(1, [3.0, 0.0, 0.0]), (2, [0.0, 0.5, 0.0])],
            "pid long, vec array<double>",
        )
        ep = str(tmp_path / "vecs.parquet")
        ext.write.parquet(ep)
        sess.import_embeddings("normjob", ep, "pid", "vec")
        vecs = {
            r["pid"]: r["embeddings"]
            for r in sess._emb_ds("normjob").read().collect()
        }
        for v in vecs.values():
            assert math.isclose(sum(x * x for x in v), 1.0, rel_tol=1e-12)


def test_rest_invalid_limit_returns_400(spark, tmp_path):
    import json
    import urllib.error
    import urllib.request

    from pg_vectorize_spark.rest import run_in_thread

    sess = VectorizeSession(spark, workspace=str(tmp_path / "ws2"))
    server, _ = run_in_thread(sess)
    base = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        req = urllib.request.urlopen(
            f"{base}/api/v1/search?job_name=x&query=q&limit=abc"
        )
        code = req.status
    except urllib.error.HTTPError as e:
        code = e.code
        body = json.loads(e.read())
        assert "invalid parameter" in body["error"]
    finally:
        server.shutdown()
    assert code == 400
