"""ChangeFeedPipeline — CDF-style realtime source with IN-BATCH delete
propagation (the reference's transactional FK ON DELETE CASCADE,
core/src/query.rs:349-354, without the side-car scan cycle the snapshot
stream needs).

Agreement contract: feeding a job the change feed of a table's history
must converge the derived datasets to EXACTLY the state a batch
``scan_job`` produces over the table's final snapshot — including rows
that were deleted mid-stream."""

from __future__ import annotations

import pytest

from pg_vectorize_spark.engine import VectorizeSession
from pg_vectorize_spark.streaming.incremental import ChangeFeedPipeline

CDF_SCHEMA = "id long, content string, _change_type string, _version long"


@pytest.fixture()
def sess(spark, tmp_path):
    return VectorizeSession(spark, workspace=str(tmp_path / "ws"))


def _write_events(spark, path, rows, mode="append"):
    spark.createDataFrame(rows, CDF_SCHEMA).coalesce(1).write.mode(
        mode
    ).parquet(path)


def _run_available_now(pipe, cdf_dir):
    q = pipe.start(source_dir=cdf_dir, available_now=True)
    q.awaitTermination(120)


def _emb_state(sess, job):
    return {
        r["id"]: list(r["embeddings"])
        for r in sess._emb_ds(job).read().select("id", "embeddings").collect()
    }


def test_stream_equals_batch_including_deletes(spark, sess, tmp_path):
    """insert + update + delete through the feed == batch scan of the
    final snapshot (vectors bit-identical, key sets identical)."""
    src = str(tmp_path / "cdf_src")
    cdf = str(tmp_path / "cdf_events")
    # empty initial source (schema only)
    spark.createDataFrame([], "id long, content string").write.parquet(src)
    sess.create_job(
        "cdfjob", src, columns=["content"], primary_key="id",
        run_initial_load=False,
    )
    pipe = ChangeFeedPipeline(sess, "cdfjob")

    # batch 1: two inserts
    _write_events(
        spark, cdf,
        [(1, "pizza with cheese", "insert", 1),
         (2, "pencil case", "insert", 1)],
    )
    _run_available_now(pipe, cdf)
    assert set(_emb_state(sess, "cdfjob")) == {1, 2}

    # batch 2: update 1 (pre+post image), insert 3, DELETE 2 — the delete
    # must prune embeddings AND tokens inside this same micro-batch
    _write_events(
        spark, cdf,
        [(1, "pizza with cheese", "update_preimage", 2),
         (1, "margherita pizza slice", "update_postimage", 2),
         (3, "airplane wings and engines", "insert", 2),
         (2, None, "delete", 2)],
    )
    _run_available_now(pipe, cdf)
    stream_state = _emb_state(sess, "cdfjob")
    assert set(stream_state) == {1, 3}
    tok_ids = {
        r["id"] for r in sess._tok_ds("cdfjob").read().select("id").collect()
    }
    assert tok_ids == {1, 3}

    # batch equivalent: scan_job over the FINAL snapshot
    final_src = str(tmp_path / "final_src")
    spark.createDataFrame(
        [(1, "margherita pizza slice"), (3, "airplane wings and engines")],
        "id long, content string",
    ).write.parquet(final_src)
    sess.create_job(
        "batchjob", final_src, columns=["content"], primary_key="id"
    )
    batch_state = _emb_state(sess, "batchjob")
    assert stream_state == batch_state  # bit-identical vectors


def test_version_col_orders_same_key_events(spark, sess, tmp_path):
    """With version_col, the LATEST event per key wins within a batch:
    insert-then-delete nets out deleted, delete-then-insert survives."""
    src = str(tmp_path / "v_src")
    cdf = str(tmp_path / "v_events")
    spark.createDataFrame(
        [(5, "old row five"), (6, "old row six")], "id long, content string"
    ).write.parquet(src)
    sess.create_job(
        "vjob", src, columns=["content"], primary_key="id"
    )
    pipe = ChangeFeedPipeline(sess, "vjob", version_col="_version")
    _write_events(
        spark, cdf,
        [(5, "new row five", "insert", 10),
         (5, None, "delete", 11),          # later -> 5 deleted
         (6, None, "delete", 10),
         (6, "resurrected six", "insert", 11)],  # later -> 6 present
    )
    _run_available_now(pipe, cdf)
    state = _emb_state(sess, "vjob")
    assert 5 not in state
    assert 6 in state
    out = sess.search("vjob", "resurrected six", num_results=1)
    assert out[0]["id"] == 6


def test_unversioned_batch_delete_wins(spark, sess, tmp_path):
    """Without version_col, a key seeing both an upsert and a delete in
    one batch nets out deleted (documented conservative order)."""
    src = str(tmp_path / "u_src")
    cdf = str(tmp_path / "u_events")
    spark.createDataFrame(
        [(7, "row seven")], "id long, content string"
    ).write.parquet(src)
    sess.create_job("ujob", src, columns=["content"], primary_key="id")
    pipe = ChangeFeedPipeline(sess, "ujob")
    _write_events(
        spark, cdf,
        [(7, "updated seven", "update_postimage", None),
         (7, None, "delete", None)],
    )
    _run_available_now(pipe, cdf)
    assert 7 not in _emb_state(sess, "ujob")


def test_deleted_job_drops_feed_batch(spark, sess, tmp_path):
    """The reference's drop-message rule (worker/src/executor.rs:66-86)
    holds for the change feed too: a deleted job ignores pending events."""
    src = str(tmp_path / "d_src")
    cdf = str(tmp_path / "d_events")
    spark.createDataFrame(
        [(8, "row eight")], "id long, content string"
    ).write.parquet(src)
    sess.create_job("djob", src, columns=["content"], primary_key="id")
    pipe = ChangeFeedPipeline(sess, "djob")
    sess.delete_job("djob")
    _write_events(spark, cdf, [(9, "new nine", "insert", 1)])
    _run_available_now(pipe, cdf)  # must not raise, must not recreate data
    assert not sess._emb_ds("djob").exists()


def test_full_delete_guard_refuses_malformed_feed(spark, sess, tmp_path):
    """VERDICT r4 #8: a feed batch whose delete keys cover the ENTIRE
    derived dataset (at or above the guard floor) is refused with a
    warning; allow_full_delete=True opts real teardown flows back in."""
    src = str(tmp_path / "g_src")
    rows = [(i, f"guarded row number {i}") for i in range(10)]
    spark.createDataFrame(rows, "id long, content string").write.parquet(src)
    sess.create_job("gjob", src, columns=["content"], primary_key="id")
    assert len(_emb_state(sess, "gjob")) == 10

    wipe = spark.createDataFrame(
        [(i, None, "delete", 1) for i in range(10)], CDF_SCHEMA
    )
    pipe = ChangeFeedPipeline(sess, "gjob")
    with pytest.warns(UserWarning, match="refusing the full delete"):
        pipe.process_batch(wipe, 0)
    assert len(_emb_state(sess, "gjob")) == 10  # retained

    # refused keys are quarantined: a legitimate rotation converges via
    # the operator's explicit flush instead of diverging forever
    assert pipe._refused_ds().read().count() == 10
    assert pipe.flush_refused_deletes() == 10
    assert _emb_state(sess, "gjob") == {}
    assert pipe.flush_refused_deletes() == 0  # idempotent, quarantine gone

    # rebuild the job state for the partial/opt-in phases below
    sess.delete_job("gjob")
    sess.create_job("gjob", src, columns=["content"], primary_key="id")
    assert len(_emb_state(sess, "gjob")) == 10
    pipe = ChangeFeedPipeline(sess, "gjob")

    # partial deletes below full coverage pass through the guard
    partial = spark.createDataFrame(
        [(i, None, "delete", 2) for i in range(4)], CDF_SCHEMA
    )
    pipe.process_batch(partial, 1)
    assert set(_emb_state(sess, "gjob")) == set(range(4, 10))

    # explicit opt-in wipes the remainder
    wipe_rest = spark.createDataFrame(
        [(i, None, "delete", 3) for i in range(10)], CDF_SCHEMA
    )
    # remaining 6 rows are below no floor: still full coverage >= floor?
    # 6 < FULL_DELETE_GUARD_MIN_ROWS=8 -> tiny-dataset exemption applies
    pipe2 = ChangeFeedPipeline(sess, "gjob", allow_full_delete=True)
    pipe2.process_batch(wipe_rest, 2)
    assert _emb_state(sess, "gjob") == {}


def test_full_delete_guard_floor_exempts_tiny_datasets(spark, sess, tmp_path):
    """Below FULL_DELETE_GUARD_MIN_ROWS, deleting every key is ordinary
    churn and needs no opt-in (pins the documented floor semantics)."""
    src = str(tmp_path / "t_src")
    spark.createDataFrame(
        [(1, "tiny row one"), (2, "tiny row two")], "id long, content string"
    ).write.parquet(src)
    sess.create_job("tjob", src, columns=["content"], primary_key="id")
    wipe = spark.createDataFrame(
        [(1, None, "delete", 1), (2, None, "delete", 1)], CDF_SCHEMA
    )
    ChangeFeedPipeline(sess, "tjob").process_batch(wipe, 0)
    assert _emb_state(sess, "tjob") == {}
