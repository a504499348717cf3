"""Streaming checkpoint kill-and-resume (r13 — VERDICT r12 #4): a
query hard-stopped between micro-batches, and once WITHIN a batch (a
crash between the parallel embeddings and tokens branch commits), must
restart from the same checkpoint and converge the snapshot + dedup
band index + postings state to a never-killed twin's.

The within-batch crash exposed a real gap this round: foreachBatch is
at-least-once, but the R2 diff guard fingerprinted the replayed rows as
"unchanged" (their embeddings HAD committed) and skipped them — so the
tokens snapshot stayed blind to them forever. The fix is the R5
redelivery analog (worker/src/executor.rs:15-57): an attempt marker in
the checkpoint dir flags the replayed batch_id and the guard is
bypassed for that one batch; every sink is an idempotent keyed merge,
so re-application converges. test_crash_between_branch_commits is the
regression pin (it fails on the pre-fix code); the soak drives the
full multi-phase scenario with deletes + dedup index.
"""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from pg_vectorize_spark.engine import VectorizeSession
from pg_vectorize_spark.errors import VectorizeError
from pg_vectorize_spark.streaming.incremental import ChangeFeedPipeline

CDF_SCHEMA = "id long, content string, _change_type string, _version long"


def _write_events(spark, path, rows):
    spark.createDataFrame(rows, CDF_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)
    time.sleep(0.05)  # distinct mtimes keep file order deterministic


def _mk_sess(spark, tmp_path, name, dedup=False):
    sess = VectorizeSession(spark, workspace=str(tmp_path / f"ws_{name}"))
    src = str(tmp_path / f"src_{name}")
    spark.createDataFrame([], "id long, content string").write.parquet(src)
    kwargs = {}
    if dedup:
        kwargs["dedup_params"] = {"min_jaccard": 0.95}
    sess.create_job(
        "rjob", src, columns=["content"], primary_key="id",
        run_initial_load=False, **kwargs,
    )
    return sess


def _run(pipe, cdf_dir, expect_fail=False):
    q = pipe.start(source_dir=cdf_dir, available_now=True)
    if expect_fail:
        with pytest.raises(Exception):
            q.awaitTermination(180)
        return
    q.awaitTermination(180)
    assert q.exception() is None, q.exception()


def _state(sess):
    emb = {
        r["id"]: tuple(r["embeddings"])
        for r in sess._emb_ds("rjob").read().select(
            "id", "embeddings"
        ).collect()
    }
    tok = {
        r["id"]: tuple(sorted(r["search_tokens"]))
        for r in sess._tok_ds("rjob").read().select(
            "id", "search_tokens"
        ).collect()
    }
    return emb, tok


def _inject_tokens_crash(sess):
    """Make the NEXT _tokens_upsert raise, then self-heal — the crash
    window between the parallel embeddings and tokens commits."""
    real = sess._tokens_upsert
    state = {"armed": True}

    def boom(job, tokens_df, **kw):
        if state["armed"]:
            state["armed"] = False
            raise VectorizeError("injected tokens-branch crash")
        return real(job, tokens_df, **kw)

    sess._tokens_upsert = boom
    return lambda: setattr(sess, "_tokens_upsert", real)


B1 = [
    (1, "pizza with extra cheese and basil", "insert", 1),
    (2, "spark shuffle partitions tuning guide", "insert", 1),
    (3, "gardening tips for tomato plants", "insert", 1),
]
B2 = [
    (2, "spark shuffle partitions deep dive updated", "update_postimage", 2),
    (4, "new document about streaming checkpoints", "insert", 2),
]


@pytest.mark.slow
def test_crash_between_branch_commits(spark, tmp_path):
    """Regression pin for the redelivery fix: embeddings commit, tokens
    branch crashes, restart from the checkpoint — tokens must converge
    to the steady twin's (pre-fix: the diff guard skipped the replayed
    rows and the updated tokens were lost forever)."""
    cdf = str(tmp_path / "events")
    killed = _mk_sess(spark, tmp_path, "killed")
    steady = _mk_sess(spark, tmp_path, "steady")

    _write_events(spark, cdf, B1)
    kp = ChangeFeedPipeline(killed, "rjob", max_files_per_trigger=1)
    _run(kp, cdf)

    _write_events(spark, cdf, B2)
    restore = _inject_tokens_crash(killed)
    _run(kp, cdf, expect_fail=True)
    restore()
    # resume from the SAME checkpoint: Spark replays the failed epoch
    _run(ChangeFeedPipeline(killed, "rjob", max_files_per_trigger=1), cdf)

    sp = ChangeFeedPipeline(steady, "rjob", max_files_per_trigger=1)
    _run(sp, cdf)

    k_emb, k_tok = _state(killed)
    s_emb, s_tok = _state(steady)
    assert k_emb == s_emb
    assert k_tok == s_tok
    # the updated row's NEW tokens specifically (the lost-forever case)
    assert "deep" in dict(k_tok)[2] or any(
        "deep" in t for t in k_tok[2]
    )


def test_mark_attempt_semantics(spark, tmp_path):
    sess = _mk_sess(spark, tmp_path, "marker")
    pipe = ChangeFeedPipeline(sess, "rjob")
    assert pipe._mark_attempt(0) is False  # first attempt
    assert pipe._mark_attempt(0) is True   # replay of the same epoch
    assert pipe._mark_attempt(1) is False  # next epoch
    assert pipe._mark_attempt(2) is False
    assert pipe._mark_attempt(2) is True


@pytest.mark.soak
def test_kill_and_resume_soak(spark, tmp_path):
    """Multi-phase kill/resume with deletes and a dedup band index:
    stop between batches (twice), crash within a batch (once), restart
    from the same checkpoint each time; final embeddings, tokens,
    search results, and dedup job_stats must equal a never-killed
    twin's."""
    cdf = str(tmp_path / "events")
    killed = _mk_sess(spark, tmp_path, "killed", dedup=True)
    steady = _mk_sess(spark, tmp_path, "steady", dedup=True)

    phases = [
        [(i, f"document number {i} about topic {i % 5} with words", "insert", 1)
         for i in range(1, 21)],
        [(i, f"updated document {i} new content entirely {i}", "update_postimage", 2)
         for i in range(1, 6)]
        + [(i, None, "delete", 2) for i in range(15, 18)]
        + [(i, f"second wave doc {i} streaming text body", "insert", 2)
           for i in range(21, 31)],
        [(i, None, "delete", 3) for i in range(1, 4)]
        + [(15, "reinserted after delete fresh text", "insert", 3)]
        + [(i, f"third wave doc {i} checkpoint resume body", "insert", 3)
           for i in range(31, 41)],
    ]

    # killed: stop between every phase; crash inside phase 2
    _write_events(spark, cdf, phases[0])
    _run(ChangeFeedPipeline(killed, "rjob", max_files_per_trigger=1), cdf)

    _write_events(spark, cdf, phases[1])
    restore = _inject_tokens_crash(killed)
    _run(
        ChangeFeedPipeline(killed, "rjob", max_files_per_trigger=1),
        cdf,
        expect_fail=True,
    )
    restore()
    _run(ChangeFeedPipeline(killed, "rjob", max_files_per_trigger=1), cdf)

    _write_events(spark, cdf, phases[2])
    _run(ChangeFeedPipeline(killed, "rjob", max_files_per_trigger=1), cdf)

    # steady: one never-killed pass over the identical feed
    _run(ChangeFeedPipeline(steady, "rjob", max_files_per_trigger=1), cdf)

    k_emb, k_tok = _state(killed)
    s_emb, s_tok = _state(steady)
    assert set(k_emb) == set(s_emb)
    assert k_emb == s_emb
    assert k_tok == s_tok
    # deleted keys stay gone; the re-insert came back
    assert 16 not in k_emb and 1 not in k_emb and 15 in k_emb

    # search parity (fts + hybrid exercise tokens snapshot + indexes)
    for q in ("streaming checkpoint resume", "updated content"):
        kf = [(r["id"], r["fts_score"])
              for r in killed.full_text_search("rjob", q, num_results=10)]
        sf = [(r["id"], r["fts_score"])
              for r in steady.full_text_search("rjob", q, num_results=10)]
        assert kf == sf, q
    kh = [r["id"] for r in killed.hybrid_search(
        "rjob", "document topic words", num_results=10)]
    sh = [r["id"] for r in steady.hybrid_search(
        "rjob", "document topic words", num_results=10)]
    assert kh == sh

    # dedup band index converged too: identical probe answer for a
    # near-dup batch against each index
    probe = spark.createDataFrame(
        [(900, "document number 5 about topic 0 with words")],
        "id long, content string",
    )
    km = killed._dedup_mgr(killed.catalog.get("rjob"))
    sm = steady._dedup_mgr(steady.catalog.get("rjob"))
    kk = {r["id"] for r in km.near_dup_keys(probe, "id", "content").collect()}
    sk = {r["id"] for r in sm.near_dup_keys(probe, "id", "content").collect()}
    assert kk == sk
