"""Cross-version golden-snapshot pin — the ``test_static`` analog
(extension/tests/integration_tests.rs:390-481): a job workspace frozen by
an earlier engine build (committed under tests/fixtures/golden_job, see
scripts/make_golden_snapshot.py) must open under the CURRENT engine and
return byte-identical search results. Fails loudly on any storage-layout,
catalog-schema, tokenizer, embedder, or scoring change; regenerate the
fixture only for intentional format changes."""

from __future__ import annotations

import json

import pytest

from pg_vectorize_spark.engine import VectorizeSession

FIXTURE = "/root/repo/tests/fixtures/golden_job"


@pytest.fixture(scope="module")
def golden(spark):
    return VectorizeSession(spark, workspace=f"{FIXTURE}/ws")


def _expected():
    with open(f"{FIXTURE}/expected.json") as f:
        return json.load(f)


def _jsonify(rows):
    # same normalization the freeze used (default=str covers timestamps)
    return json.loads(json.dumps(rows, sort_keys=True, default=str))


def test_catalog_opens_and_describes_job(golden):
    job = golden.catalog.get("golden")
    assert job.primary_key == "doc_id"
    assert job.src_columns == ["text"]
    assert job.dim == 64


def test_frozen_storage_readable(golden):
    emb = golden._emb_ds("golden")
    tok = golden._tok_ds("golden")
    assert emb.read().count() == 10
    assert tok.read().count() == 10
    row = emb.read().head()
    assert len(row["embeddings"]) == 64
    assert {"doc_id", "embeddings"} <= set(emb.read().columns)


def test_search_results_identical(golden):
    from scripts.make_golden_snapshot import SEARCHES

    expected = _expected()
    got = {
        "semantic": golden.search("golden", **SEARCHES["semantic"]),
        "fts": golden.full_text_search("golden", **SEARCHES["fts"]),
        "hybrid": golden.hybrid_search("golden", **SEARCHES["hybrid"]),
        "append_semantic": golden.search(
            "golden_append", **SEARCHES["semantic"]
        ),
    }
    for kind in expected:
        assert _jsonify(got[kind]) == expected[kind], (
            f"{kind} search over the frozen job diverged from the committed "
            "golden results — storage format or scoring changed. If "
            "intentional, regenerate: python scripts/make_golden_snapshot.py"
        )


def test_frozen_job_still_scannable(golden, tmp_path):
    """An upgraded engine must also still WRITE the frozen job: scan_job
    over the unchanged source is a no-op cycle (no changes, no orphans,
    no snapshot churn)."""
    emb = golden._emb_ds("golden")
    v_before = emb.current_version()
    assert golden.scan_job("golden") == 0
    assert emb.current_version() == v_before
