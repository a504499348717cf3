"""Ingest-time quality gate (``curate_params`` -> engine._curate_filter):
jobs opt in to per-row curation rules applied on the scan AND streaming
ingest paths, over the same concatenated content the embedder sees."""

from __future__ import annotations

import pytest

from pg_vectorize_spark.engine import VectorizeSession
from pg_vectorize_spark.errors import VectorizeError

GOOD_EN = (
    "the quick brown fox jumps over the lazy dog and runs to the river "
    "with a friend for the afternoon in the warm sun that is shining"
)
GOOD_EN2 = (
    "a long essay about distributed systems and the consensus protocols "
    "that keep replicated state machines honest for years in production"
)
SHORT = "tiny"
SPANISH = (
    "el perro corre por la calle y los gatos duermen en las casas del "
    "pueblo que esta cerca de la montana por la manana"
)


def _write(spark, path, rows, mode="overwrite"):
    spark.createDataFrame(rows, "id long, content string").coalesce(
        1
    ).write.mode(mode).parquet(path)


@pytest.fixture()
def sess(spark, tmp_path):
    return VectorizeSession(spark, workspace=str(tmp_path / "ws"))


class TestCurateFilterScan:
    def _mk(self, spark, sess, tmp_path, rows, curate):
        src = str(tmp_path / "src")
        _write(spark, src, rows)
        sess.create_job(
            "cj",
            src,
            columns=["content"],
            primary_key="id",
            curate_params=curate,
        )
        return src

    def _ids(self, sess):
        return {
            r["id"] for r in sess._emb_ds("cj").read().select("id").collect()
        }

    def test_initial_load_applies_gate(self, spark, sess, tmp_path):
        self._mk(
            spark,
            sess,
            tmp_path,
            [(1, GOOD_EN), (2, SHORT), (3, GOOD_EN2)],
            {"min_tokens": 10},
        )
        assert self._ids(sess) == {1, 3}

    def test_lang_allowlist(self, spark, sess, tmp_path):
        self._mk(
            spark,
            sess,
            tmp_path,
            [(1, GOOD_EN), (2, SPANISH)],
            {"langs": ["en"]},
        )
        assert self._ids(sess) == {1}

    def test_degrading_update_keeps_previous_embedding(
        self, spark, sess, tmp_path
    ):
        src = self._mk(
            spark, sess, tmp_path, [(1, GOOD_EN)], {"min_tokens": 10}
        )
        v1 = sess._emb_ds("cj").current_version()
        # the doc degrades below the gate: scan skips it, old row stays
        _write(spark, src, [(1, SHORT)])
        sess.scan_job("cj")
        assert self._ids(sess) == {1}
        assert sess._emb_ds("cj").current_version() == v1

    def test_new_failing_row_never_ingested(self, spark, sess, tmp_path):
        src = self._mk(
            spark, sess, tmp_path, [(1, GOOD_EN)], {"min_tokens": 10}
        )
        _write(spark, src, [(1, GOOD_EN), (2, SHORT), (3, GOOD_EN2)])
        sess.scan_job("cj")
        assert self._ids(sess) == {1, 3}

    def test_composes_with_dedup_filter(self, spark, sess, tmp_path):
        src = str(tmp_path / "src")
        _write(spark, src, [(1, GOOD_EN)])
        sess.create_job(
            "cj",
            src,
            columns=["content"],
            primary_key="id",
            curate_params={"min_tokens": 10},
            dedup_params={"min_jaccard": 0.6},
        )
        near_dup = GOOD_EN.replace("lazy dog", "lazy cat")
        _write(spark, src, [(1, GOOD_EN), (2, near_dup), (3, SHORT)])
        sess.scan_job("cj")
        # 2 fails the dedup filter, 3 fails the quality gate
        assert self._ids(sess) == {1}

    def test_unknown_keys_rejected(self, spark, sess, tmp_path):
        src = str(tmp_path / "src")
        _write(spark, src, [(1, GOOD_EN)])
        with pytest.raises(VectorizeError, match="curate_params"):
            sess.create_job(
                "cj",
                src,
                columns=["content"],
                primary_key="id",
                curate_params={"min_token": 10},  # typo'd key
            )

    def test_catalog_roundtrip(self, spark, sess, tmp_path):
        self._mk(
            spark,
            sess,
            tmp_path,
            [(1, GOOD_EN)],
            {"min_tokens": 10, "langs": ["en"]},
        )
        fresh = VectorizeSession(
            spark, workspace=sess.workspace
        ).catalog.get("cj")
        assert fresh.curate_params == {"min_tokens": 10, "langs": ["en"]}


class TestCurateFilterStreaming:
    def test_stream_batches_apply_gate(self, spark, sess, tmp_path):
        from pg_vectorize_spark.streaming.incremental import RealtimePipeline

        src = str(tmp_path / "stream_src")
        _write(spark, src, [(1, GOOD_EN)], mode="append")
        sess.create_job(
            "cs",
            src,
            columns=["content"],
            primary_key="id",
            run_initial_load=False,
            curate_params={"min_tokens": 10},
        )
        pipe = RealtimePipeline(sess, "cs")
        q = pipe.start(available_now=True)
        q.awaitTermination(120)
        # a micro-batch mixing a passing and a failing row
        _write(spark, src, [(2, SHORT), (3, GOOD_EN2)], mode="append")
        q = pipe.start(available_now=True)
        q.awaitTermination(120)
        ids = {
            r["id"] for r in sess._emb_ds("cs").read().select("id").collect()
        }
        assert ids == {1, 3}


class TestClassifierGate:
    """curate_params classifier_path: a trained linear quality model at
    the ingest seam (scored on the gate content, keyed semi-join back)."""

    @pytest.mark.slow
    def test_classifier_gates_ingest(self, spark, tmp_path):
        from pg_vectorize_spark.engine import VectorizeSession
        from pg_vectorize_spark.operators.classify import (
            train_curation_classifier,
        )
        from pyspark.sql import functions as F

        clean = [
            f"the committee published report {i} on water policy analysis"
            for i in range(30)
        ]
        garble = [f"zzk{i} qqp lnx vvb kjh zxw ppo mmn bbv" for i in range(30)]
        cur = spark.createDataFrame(
            [(i, t) for i, t in enumerate(clean)], "id long, content string"
        )
        raw = spark.createDataFrame(
            [(i, t) for i, t in enumerate(garble)], "id long, content string"
        )
        model = train_curation_classifier(cur, raw, "content", hash_dim=1 << 14)
        mpath = str(tmp_path / "gate_model")
        model.write().overwrite().save(mpath)

        # corpus: 10 clean + 10 garble rows
        rows = [(i, clean[i]) for i in range(10)] + [
            (100 + i, garble[i]) for i in range(10)
        ]
        src = str(tmp_path / "gate_src")
        spark.createDataFrame(rows, "id long, content string").write.parquet(src)
        sess = VectorizeSession(spark, workspace=str(tmp_path / "ws_gate"))
        sess.create_job(
            "gjob",
            src,
            columns=["content"],
            primary_key="id",
            curate_params={
                "classifier_path": mpath,
                "classifier_min_prob": 0.5,
            },
        )
        sess.scan_job("gjob")
        emb_ids = {
            r["id"] for r in sess._emb_ds("gjob").read().select("id").collect()
        }
        assert emb_ids == set(range(10))  # garble never reached the embed

    def test_unknown_key_still_rejected(self, spark, tmp_path):
        from pg_vectorize_spark.engine import VectorizeSession
        from pg_vectorize_spark.errors import VectorizeError
        import pytest as _pytest

        df = spark.createDataFrame([(1, "x")], "id long, content string")
        src = str(tmp_path / "uk_src")
        df.write.parquet(src)
        sess = VectorizeSession(spark, workspace=str(tmp_path / "ws_uk"))
        with _pytest.raises(VectorizeError):
            sess.create_job(
                "ukjob", src, columns=["content"], primary_key="id",
                curate_params={"classifier_prob": 0.5},  # misspelled
            )
