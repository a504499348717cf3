"""Regression tests for the round-1 advisor findings (ADVICE.md):

1. delete_job must validate the job name BEFORE building filesystem paths —
   a '../..' name must never rmtree outside the workspace;
2. an HTTP-source model with an api_key but no configured endpoint must be
   rejected, and the hermetic fallback's dim must be the dim the job records;
3. REST POST /search must coerce JSON bools to the lowercase literals the
   filter parser types as boolean, and drop nulls;
4. import_embeddings on a table_method='append' job must be rejected (the
   narrow import shape would corrupt the wide append snapshot).
"""

from __future__ import annotations

import json
import urllib.error
import urllib.request

import pytest

from pg_vectorize_spark.engine import VectorizeSession
from pg_vectorize_spark.errors import (
    InvalidIdentifierError,
    ModelError,
    VectorizeError,
)
from pg_vectorize_spark.providers.local import LocalHashEmbedder
from pg_vectorize_spark.providers.registry import (
    get_provider,
    model_dim,
    parse_model,
)


@pytest.fixture()
def sess(spark, tmp_path):
    return VectorizeSession(spark, workspace=str(tmp_path / "ws"))


class TestDeleteJobTraversal:
    def test_traversal_name_rejected_before_any_path_io(self, sess, tmp_path):
        victim = tmp_path / "victim" / "embeddings"
        victim.mkdir(parents=True)
        (victim / "keep.txt").write_text("data")
        with pytest.raises(InvalidIdentifierError):
            sess.delete_job("../../victim")
        assert (victim / "keep.txt").exists()

    def test_rest_delete_invalid_name_400(self, spark, tmp_path):
        from pg_vectorize_spark.rest import run_in_thread

        s = VectorizeSession(spark, workspace=str(tmp_path / "ws2"))
        server, _ = run_in_thread(s)
        base = f"http://127.0.0.1:{server.server_address[1]}"
        try:
            req = urllib.request.Request(
                f"{base}/api/v1/table/..%2F..%2Fvictim", method="DELETE"
            )
            with pytest.raises(urllib.error.HTTPError) as exc:
                urllib.request.urlopen(req)
            assert exc.value.code == 400
        finally:
            server.shutdown()


class TestProviderFallback:
    def test_api_key_without_endpoint_raises(self, monkeypatch):
        monkeypatch.delenv("OPENAI_BASE_URL", raising=False)
        with pytest.raises(ModelError):
            get_provider("openai/text-embedding-3-small", api_key="sk-test")

    def test_fallback_dim_overrides_known_dims(self, monkeypatch):
        monkeypatch.delenv("OPENAI_BASE_URL", raising=False)
        provider = get_provider("openai/text-embedding-3-small")
        assert isinstance(provider, LocalHashEmbedder)
        assert getattr(provider, "is_fallback", False)
        # the job must record the dim of the vectors actually stored (64),
        # not the real service's 1536
        dim = model_dim(
            parse_model("openai/text-embedding-3-small"), probe=provider
        )
        assert dim == provider.model_dim() == 64

    def test_configured_endpoint_still_uses_known_dims(self, monkeypatch):
        monkeypatch.setenv("OPENAI_BASE_URL", "http://127.0.0.1:9")
        provider = get_provider("openai/text-embedding-3-small")
        assert not getattr(provider, "is_fallback", False)
        dim = model_dim(
            parse_model("openai/text-embedding-3-small"), probe=provider
        )
        assert dim == 1536


class TestRestPostCoercion:
    def test_post_bool_filter_matches_get(self, spark, tmp_path):
        from pg_vectorize_spark.rest import run_in_thread

        df = spark.createDataFrame(
            [
                (1, "red apple fruit", True),
                (2, "green apple fruit", False),
                (3, "yellow banana fruit", True),
            ],
            "id long, content string, in_stock boolean",
        )
        src = str(tmp_path / "fruits.parquet")
        df.write.parquet(src)
        s = VectorizeSession(spark, workspace=str(tmp_path / "ws3"))
        s.create_job("fruits", src, columns=["content"], primary_key="id")
        server, _ = run_in_thread(s)
        base = f"http://127.0.0.1:{server.server_address[1]}"
        try:
            get_resp = json.loads(
                urllib.request.urlopen(
                    f"{base}/api/v1/search?job_name=fruits&query=apple+fruit"
                    "&limit=10&in_stock=true"
                ).read()
            )
            body = json.dumps(
                {
                    "job_name": "fruits",
                    "query": "apple fruit",
                    "limit": 10,
                    "in_stock": True,  # JSON bool, not the string 'true'
                    "window_size": None,  # JSON null must be dropped
                }
            ).encode()
            req = urllib.request.Request(
                f"{base}/api/v1/search",
                data=body,
                headers={"Content-Type": "application/json"},
                method="POST",
            )
            post_resp = json.loads(urllib.request.urlopen(req).read())
        finally:
            server.shutdown()
        get_ids = sorted(r["id"] for r in get_resp)
        post_ids = sorted(r["id"] for r in post_resp)
        assert post_ids == get_ids
        assert 2 not in post_ids  # in_stock=false filtered out


class TestImportAppendRejected:
    def test_import_into_append_job_raises(self, spark, sess, tmp_path):
        src = str(tmp_path / "ap.parquet")
        spark.createDataFrame(
            [(1, "text one"), (2, "text two")], "pid long, t string"
        ).write.parquet(src)
        sess.create_job(
            "apjob", src, columns=["t"], primary_key="pid",
            table_method="append",
            schedule="* * * * *",
        )
        ext = spark.createDataFrame(
            [(1, [1.0] + [0.0] * 63)], "pid long, vec array<double>"
        )
        ep = str(tmp_path / "ext.parquet")
        ext.write.parquet(ep)
        with pytest.raises(VectorizeError, match="append"):
            sess.import_embeddings("apjob", ep, "pid", "vec")
