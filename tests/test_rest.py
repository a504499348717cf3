"""REST facade tests — the server integration-test themes
(server/tests/tests.rs:105-380, 501-688): search with flattened filter
params, error cases (unknown job 404, invalid operator 400), create/delete
lifecycle, health endpoints."""

from __future__ import annotations

import json
import urllib.error
import urllib.request

import pytest

from pg_vectorize_spark.engine import VectorizeSession
from pg_vectorize_spark.rest import run_in_thread


@pytest.fixture(scope="module")
def served(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("rest")
    rows = [
        (1, "pizza with cheese and tomato", "food", 12.0),
        (2, "pencil for writing", "office", 2.0),
        (3, "airplane model kit", "toys", 30.0),
    ]
    df = spark.createDataFrame(
        rows, "id int, content string, category string, price double"
    )
    src = str(tmp / "items.parquet")
    df.write.parquet(src)
    sess = VectorizeSession(spark, workspace=str(tmp / "ws"))
    server, thread = run_in_thread(sess)
    base = f"http://127.0.0.1:{server.server_address[1]}"
    yield base, src
    server.shutdown()


def _get(url):
    try:
        with urllib.request.urlopen(url) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _post(url, body):
    req = urllib.request.Request(
        url,
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _delete(url):
    req = urllib.request.Request(url, method="DELETE")
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_health_endpoints(served):
    base, _ = served
    for path in ("/health", "/health/live", "/health/ready"):
        code, body = _get(base + path)
        assert code == 200 and body == {"status": "ok"}


def test_full_lifecycle(served):
    base, src = served

    # create job
    code, body = _post(
        base + "/api/v1/table",
        {
            "job_name": "items",
            "src_path": src,
            "columns": ["content"],
            "primary_key": "id",
        },
    )
    assert code == 200 and body["dim"] == 64

    # duplicate -> 409
    code, _ = _post(
        base + "/api/v1/table",
        {
            "job_name": "items",
            "src_path": src,
            "columns": ["content"],
            "primary_key": "id",
        },
    )
    assert code == 409

    # GET search
    code, results = _get(
        base + "/api/v1/search?job_name=items&query=pizza+cheese&limit=2"
    )
    assert code == 200
    assert results[0]["id"] == 1
    assert "rrf_score" in results[0]

    # flattened filter param (category=eq.office)
    code, results = _get(
        base
        + "/api/v1/search?job_name=items&query=writing&category=eq.office"
    )
    assert code == 200
    assert {r["id"] for r in results} == {2}

    # numeric comparison filter
    code, results = _get(
        base + "/api/v1/search?job_name=items&query=anything&price=gt.10"
    )
    assert code == 200
    assert {r["id"] for r in results} <= {1, 3}

    # invalid operator value -> 400 (server/tests/tests.rs:357-380)
    code, body = _get(
        base + "/api/v1/search?job_name=items&query=x&price=gt.abc"
    )
    assert code == 400

    # POST search
    code, results = _post(
        base + "/api/v1/search",
        {"job_name": "items", "query": "airplane", "limit": 1},
    )
    assert code == 200 and results[0]["id"] == 3

    # delete
    code, _ = _delete(base + "/api/v1/table/items")
    assert code == 200
    code, _ = _delete(base + "/api/v1/table/items")
    assert code == 404
    code, _ = _get(base + "/api/v1/search?job_name=items&query=x")
    assert code == 404


def test_missing_params_400(served):
    base, _ = served
    code, _ = _get(base + "/api/v1/search?query=no_job")
    assert code == 400
    code, _ = _post(base + "/api/v1/table", {"job_name": "x"})
    assert code == 400


def test_unknown_route_404(served):
    base, _ = served
    code, _ = _get(base + "/api/v1/nope")
    assert code == 404


class TestEmbeddingService:
    """vector-serve surface parity: POST /v1/embeddings
    (transform.py:23-77) and GET /v1/info (info.py:19-42)."""

    def test_embeddings_batch_shape(self, served):
        base, _ = served
        texts = [f"sentence number {i}" for i in range(7)]
        code, body = _post(f"{base}/v1/embeddings", {"input": texts})
        assert code == 200
        assert body["model"] == "sentence-transformers/all-MiniLM-L6-v2"
        assert [d["index"] for d in body["data"]] == list(range(7))
        dims = {len(d["embedding"]) for d in body["data"]}
        assert len(dims) == 1  # uniform dim across the batch
        # deterministic: same input -> same vector
        code2, body2 = _post(
            f"{base}/v1/embeddings", {"input": [texts[0]]}
        )
        assert body2["data"][0]["embedding"] == body["data"][0]["embedding"]

    def test_embeddings_normalize(self, served):
        base, _ = served
        code, body = _post(
            f"{base}/v1/embeddings",
            {"input": ["normalize me"], "normalize": True},
        )
        assert code == 200
        v = body["data"][0]["embedding"]
        assert abs(sum(x * x for x in v) - 1.0) < 1e-9

    def test_embeddings_validation(self, served):
        base, _ = served
        for bad in [{}, {"input": []}, {"input": "not a list"},
                    {"input": [1, 2]}]:
            code, _body = _post(f"{base}/v1/embeddings", bad)
            assert code == 422, bad

    def test_info_dim_parity(self, served):
        base, _ = served
        # unconfigured HTTP-source model falls back to the 64-dim local
        # stand-in; /v1/info must report the dim jobs would actually record
        code, body = _get(
            f"{base}/v1/info/?model_name=all-MiniLM-L6-v2"
        )
        assert code == 200
        assert body["model"] == "sentence-transformers/all-MiniLM-L6-v2"
        assert body["max_seq_len"] == 256
        emb_code, emb = _post(
            f"{base}/v1/embeddings", {"input": ["dim check"]}
        )
        assert body["embedding_dimension"] == len(
            emb["data"][0]["embedding"]
        )
        # explicit local model reports its spec dim, no-trailing-slash works
        code, body = _get(
            f"{base}/v1/info?model_name=local/hash-embedder-384"
        )
        assert code == 200
        assert body["embedding_dimension"] == 384

    def test_info_requires_model_name(self, served):
        base, _ = served
        code, _body = _get(f"{base}/v1/info/")
        assert code == 422


def test_create_indexed_table_and_search(served):
    """POST /table accepts index_method/index_params; the indexed job's
    GET /search routes through the persisted index and still returns
    the exact ranking (full-coverage probe params)."""
    base, src = served
    code, body = _post(
        base + "/api/v1/table",
        {
            "job_name": "items_idx",
            "src_path": src,
            "columns": ["content"],
            "primary_key": "id",
            "index_method": "ivf",
            "index_params": {"n_centroids": 2, "nprobe": 2},
        },
    )
    assert code == 200, body
    code, brute = _post(
        base + "/api/v1/table",
        {
            "job_name": "items_brute",
            "src_path": src,
            "columns": ["content"],
            "primary_key": "id",
        },
    )
    assert code == 200, brute
    code, a = _get(base + "/api/v1/search?job_name=items_idx&query=pizza&limit=3")
    code2, b = _get(base + "/api/v1/search?job_name=items_brute&query=pizza&limit=3")
    assert code == 200 and code2 == 200
    assert [(r["id"], r["similarity_score"]) for r in a] == [
        (r["id"], r["similarity_score"]) for r in b
    ]
    code, _ = _post(
        base + "/api/v1/table",
        {
            "job_name": "bad_idx",
            "src_path": src,
            "columns": ["content"],
            "primary_key": "id",
            "index_method": "hnsw",
        },
    )
    assert code == 400


class TestJobsAndStats:
    def test_jobs_listing_and_stats(self, served):
        base, src = served
        code, body = _post(
            base + "/api/v1/table",
            {
                "job_name": "stats_job",
                "src_path": src,
                "columns": ["content"],
                "primary_key": "id",
                "index_method": "ivf",
                "index_params": {"n_centroids": 2, "nprobe": 2},
            },
        )
        assert code == 200, body
        code, body = _get(base + "/v1/jobs")
        assert code == 200 and "stats_job" in body["jobs"]
        code, stats = _get(base + "/v1/jobs/stats_job/stats")
        assert code == 200, stats
        assert stats["embeddings"]["exists"]
        assert stats["embeddings"]["rows"] == 3
        assert stats["index_method"] == "ivf"
        assert stats["ann_index"]["exists"]
        d = stats["ann_index"]["drift"]
        assert d["rows"] == 3 and d["built_rows"] == 3
        assert stats["ann_index"]["retrain_recommended"] is False
        assert stats["fts_index"]["exists"]
        assert stats["dedup_index"] == {
            "enabled": False,
            "has_data": False,
        }

    def test_stats_unknown_job_404(self, served):
        base, _ = served
        code, body = _get(base + "/v1/jobs/nope/stats")
        assert code == 404 and "not found" in body["error"]

    def test_maintain_route(self, served):
        """POST /v1/jobs/<name>/maintain — the VACUUM analog: forces a
        fold + compaction across the job's persisted structures and
        returns per-structure counts; unknown job is a 404."""
        base, src = served
        code, body = _post(
            base + "/api/v1/table",
            {
                "job_name": "maint_job",
                "src_path": src,
                "columns": ["content"],
                "primary_key": "id",
                "index_method": "ivf",
                "index_params": {"n_centroids": 2, "nprobe": 2},
            },
        )
        assert code == 200, body
        code, out = _post(base + "/v1/jobs/maint_job/maintain", {})
        assert code == 200, out
        assert out["job_name"] == "maint_job"
        assert "ann_index" in out and "postings_index" in out
        code, body = _post(base + "/v1/jobs/nope/maintain", {})
        assert code == 404 and "not found" in body["error"]


class TestDiversifyParams:
    def test_search_with_diversify(self, served):
        base, src = served
        code, body = _post(
            base + "/api/v1/table",
            {
                "job_name": "items_div",
                "src_path": src,
                "columns": ["content"],
                "primary_key": "id",
            },
        )
        assert code == 200, body
        code, body = _get(
            base
            + "/api/v1/search?job_name=items_div&query=pizza&limit=2&diversify=0.6"
        )
        assert code == 200, body
        assert len(body) == 2
        assert [r["mmr_rank"] for r in body] == [1, 2]

    def test_diversify_validation(self, served):
        base, _ = served
        # validation fires before job resolution, so no job needed
        code, body = _get(
            base + "/api/v1/search?job_name=items_div&query=x&diversify=1.5"
        )
        assert code == 400 and "diversify" in body["error"]
        code, body = _get(
            base
            + "/api/v1/search?job_name=items_div&query=x&diversify=0.5&diversify_pool=0"
        )
        assert code == 400 and "diversify_pool" in body["error"]
