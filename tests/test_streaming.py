"""Realtime pipeline tests — freshness + diff-guard + job-deleted-drop
semantics (R1-R5) over a parquet file-source stream."""

from __future__ import annotations

import time

import pytest

from pg_vectorize_spark.engine import VectorizeSession
from pg_vectorize_spark.streaming.incremental import RealtimePipeline


@pytest.fixture()
def sess(spark, tmp_path):
    return VectorizeSession(spark, workspace=str(tmp_path / "ws"))


def _write_batch(spark, path, rows, mode="append"):
    df = spark.createDataFrame(rows, "id long, content string")
    df.coalesce(1).write.mode(mode).parquet(path)


def test_realtime_insert_visibility(spark, sess, tmp_path):
    src = str(tmp_path / "stream_src")
    _write_batch(spark, src, [(1, "pizza"), (2, "pencil")])
    sess.create_job(
        "rt", src, columns=["content"], primary_key="id", run_initial_load=False
    )
    pipe = RealtimePipeline(sess, "rt")

    # one-shot availableNow run processes the backlog (cron analog R6)
    q = pipe.start(available_now=True)
    q.awaitTermination(120)
    out = sess.search("rt", "pizza", num_results=1)
    assert out[0]["id"] == 1

    # new file arrives -> new micro-batch -> searchable (R1)
    _write_batch(spark, src, [(3, "airplane wings and engines")])
    q = pipe.start(available_now=True)
    q.awaitTermination(120)
    out = sess.search("rt", "airplane wings engines", num_results=1)
    assert out[0]["id"] == 3


def test_diff_guard_skips_unchanged(spark, sess, tmp_path):
    src = str(tmp_path / "dg_src")
    _write_batch(spark, src, [(1, "same text")])
    sess.create_job(
        "dg", src, columns=["content"], primary_key="id", run_initial_load=False
    )
    pipe = RealtimePipeline(sess, "dg")
    q = pipe.start(available_now=True)
    q.awaitTermination(120)
    v1 = sess._emb_ds("dg").current_version()

    # re-deliver identical content: R2 guard -> no new snapshot
    _write_batch(spark, src, [(1, "same text")])
    q = pipe.start(available_now=True)
    q.awaitTermination(120)
    assert sess._emb_ds("dg").current_version() == v1

    # changed content -> re-embed
    _write_batch(spark, src, [(1, "different text")])
    q = pipe.start(available_now=True)
    q.awaitTermination(120)
    assert sess._emb_ds("dg").current_version() > v1


def test_continuous_trigger_freshness(spark, sess, tmp_path):
    """The reference's realtime SLO pattern (server/tests/tests.rs:74-103):
    insert a row while the stream runs continuously, poll search until it
    becomes visible (bounded wait)."""
    src = str(tmp_path / "cont_src")
    _write_batch(spark, src, [(1, "pizza with cheese"), (2, "pencil case")])
    sess.create_job(
        "cont", src, columns=["content"], primary_key="id",
        run_initial_load=False,
    )
    pipe = RealtimePipeline(sess, "cont")
    q = pipe.start()  # default continuous micro-batch trigger
    try:
        deadline = time.time() + 90
        seen_initial = False
        while time.time() < deadline and not seen_initial:
            try:
                out = sess.search("cont", "pizza cheese", num_results=1)
                seen_initial = bool(out) and out[0]["id"] == 1
            except Exception:
                pass
            if not seen_initial:
                time.sleep(1)
        assert seen_initial, "initial rows never became searchable"

        # live insert -> must become searchable while the stream runs
        _write_batch(spark, src, [(3, "airplane jet engine wings")])
        found = False
        deadline = time.time() + 90
        while time.time() < deadline and not found:
            out = sess.search("cont", "airplane jet engine", num_results=1)
            found = bool(out) and out[0]["id"] == 3
            if not found:
                time.sleep(1)
        assert found, "inserted row never became searchable"
    finally:
        q.stop()


def test_deleted_job_drops_batch(spark, sess, tmp_path):
    src = str(tmp_path / "del_src")
    _write_batch(spark, src, [(1, "hello")])
    sess.create_job(
        "dj", src, columns=["content"], primary_key="id", run_initial_load=False
    )
    pipe = RealtimePipeline(sess, "dj")
    sess.delete_job("dj")
    # worker rule: job lookup miss -> drop batch, no error
    q = pipe.start(
        source_dir=src,
        schema=spark.read.parquet(src).schema,
        available_now=True,
    )
    q.awaitTermination(120)
    assert not sess._emb_ds("dj").exists()
