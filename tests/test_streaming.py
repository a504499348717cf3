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
