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


@pytest.fixture()
def products_path(spark, products_df, tmp_path):
    path = str(tmp_path / "products.parquet")
    products_df.write.mode("overwrite").parquet(path)
    return path


class TestCleanupOrphansFullDeleteGuard:
    """Round-3 ADVICE #1 + round-4 ADVICE #3: a BROKEN source read (no
    data files) must not wipe every derived row, but a genuinely
    truncated source (readable, schema-bearing, zero rows) must cascade
    so the derived state converges — the reference's FK ON DELETE CASCADE
    always fires."""

    def test_valid_empty_overwrite_cascades(
        self, sess, spark, products_path, products_df
    ):
        """An intentional empty overwrite leaves a schema-bearing parquet
        file; that is a real truncate, and the cascade now converges
        instead of diverging forever behind a warning."""
        sess.create_job(
            "guardjob",
            products_path,
            columns=["product_name", "description"],
            primary_key="product_id",
        )
        from pg_vectorize_spark.sources.parquet_snapshot import SnapshotDataset

        emb = SnapshotDataset(sess.spark, sess._job_dir("guardjob", "embeddings"))
        n_before = emb.read().count()
        assert n_before == 14
        products_df.filter("product_id < 0").write.mode("overwrite").parquet(
            products_path
        )
        removed = sess.cleanup_orphans("guardjob")
        assert removed > 0
        assert emb.read().count() == 0

    def test_broken_source_refuses_full_delete(
        self, sess, spark, products_path, products_df, tmp_path
    ):
        """A source read yielding zero rows from a path with NO data files
        (mid-rewrite, bad mount) refuses the full cascade."""
        sess.create_job(
            "guardjob3",
            products_path,
            columns=["product_name", "description"],
            primary_key="product_id",
        )
        from pg_vectorize_spark.sources.parquet_snapshot import SnapshotDataset

        emb = SnapshotDataset(
            sess.spark, sess._job_dir("guardjob3", "embeddings")
        )
        n_before = emb.read().count()
        # the path now holds only non-data entries (a mid-rewrite state);
        # feed the empty frame directly since Spark refuses to even read it
        import os
        import shutil

        job = sess.catalog.get("guardjob3")
        broken = str(tmp_path / "broken_src")
        os.makedirs(broken)
        open(os.path.join(broken, "_SUCCESS"), "w").close()
        job.src_path = broken
        empty_src = products_df.filter("product_id < 0")
        with pytest.warns(UserWarning, match="Refusing the full delete"):
            removed = sess.cleanup_orphans("guardjob3", _src=empty_src)
        assert removed == 0
        assert emb.read().count() == n_before
        shutil.rmtree(broken)

    def test_full_cascade_legitimacy_rules(self, sess, spark, tmp_path):
        """Unit pin of the decision table: rows present -> True; table
        source -> True; schema-bearing empty path -> True; data-file-less
        dir or missing path -> False."""
        import os

        from pg_vectorize_spark.catalog import JobRecord

        df_rows = spark.range(3).withColumnRenamed("id", "k")
        df_empty = df_rows.filter("k < 0")

        def job_for(path, fmt="parquet"):
            return JobRecord(
                job_name="x", src_path=path, src_columns=["k"],
                primary_key="k", source_format=fmt,
            )

        good_dir = str(tmp_path / "good")
        df_empty.write.parquet(good_dir)  # schema-bearing empty file
        bare_dir = str(tmp_path / "bare")
        os.makedirs(bare_dir)
        open(os.path.join(bare_dir, "_SUCCESS"), "w").close()

        legit = sess._full_cascade_legitimate
        assert legit(job_for(bare_dir), df_rows) is True  # rows trump path
        assert legit(job_for("nope", fmt="table"), df_empty) is True
        assert legit(job_for(good_dir), df_empty) is True
        assert legit(job_for(bare_dir), df_empty) is False
        assert legit(job_for(str(tmp_path / "missing")), df_empty) is False

    def test_explicit_flag_allows_full_delete(
        self, sess, spark, products_path, products_df
    ):
        sess.create_job(
            "guardjob2",
            products_path,
            columns=["product_name", "description"],
            primary_key="product_id",
        )
        from pg_vectorize_spark.sources.parquet_snapshot import SnapshotDataset

        emb = SnapshotDataset(sess.spark, sess._job_dir("guardjob2", "embeddings"))
        products_df.filter("product_id < 0").write.mode("overwrite").parquet(
            products_path
        )
        removed = sess.cleanup_orphans("guardjob2", allow_full_delete=True)
        assert removed > 0
        assert emb.read().count() == 0

    def test_partial_delete_still_cascades(
        self, sess, spark, products_path, products_df
    ):
        sess.create_job(
            "guardjob3",
            products_path,
            columns=["product_name", "description"],
            primary_key="product_id",
        )
        from pg_vectorize_spark.sources.parquet_snapshot import SnapshotDataset

        emb = SnapshotDataset(sess.spark, sess._job_dir("guardjob3", "embeddings"))
        products_df.filter("product_id <= 10").write.mode("overwrite").parquet(
            products_path
        )
        assert sess.cleanup_orphans("guardjob3") == 8  # 4 emb + 4 tokens
        assert emb.read().count() == 10


class TestEmbedBatchSizeEnv:
    """Round-3 ADVICE #4: namespaced, validated, lazily-read batch size."""

    def test_default(self, monkeypatch):
        from pg_vectorize_spark import rest

        monkeypatch.delenv("SPARK_GRAFT_EMBED_BATCH_SIZE", raising=False)
        monkeypatch.delenv("BATCH_SIZE", raising=False)
        assert rest.embed_batch_size() == rest.DEFAULT_EMBED_BATCH_SIZE

    def test_namespaced_wins_over_bare(self, monkeypatch):
        from pg_vectorize_spark import rest

        monkeypatch.setenv("SPARK_GRAFT_EMBED_BATCH_SIZE", "7")
        monkeypatch.setenv("BATCH_SIZE", "99")
        assert rest.embed_batch_size() == 7

    def test_bare_parity_fallback(self, monkeypatch):
        from pg_vectorize_spark import rest

        monkeypatch.delenv("SPARK_GRAFT_EMBED_BATCH_SIZE", raising=False)
        monkeypatch.setenv("BATCH_SIZE", "42")
        assert rest.embed_batch_size() == 42

    @pytest.mark.parametrize("bad", ["0", "-3", "abc", ""])
    def test_invalid_values_fall_back(self, monkeypatch, bad):
        from pg_vectorize_spark import rest

        monkeypatch.setenv("SPARK_GRAFT_EMBED_BATCH_SIZE", bad)
        monkeypatch.delenv("BATCH_SIZE", raising=False)
        assert rest.embed_batch_size() == rest.DEFAULT_EMBED_BATCH_SIZE


class TestHammingBallClamp:
    """Round-3 ADVICE #5: radius beyond nbits is clamped; a probe set
    covering most of the bucket space warns that pruning is gone."""

    def test_radius_clamped_to_nbits(self):
        import warnings

        from pg_vectorize_spark.operators.ann import _hamming_ball

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            full = _hamming_ball(0b101, 3, 3)
            over = _hamming_ball(0b101, 3, 99)
        assert sorted(set(full)) == list(range(8))
        assert sorted(set(over)) == list(range(8))
        assert len(over) == len(full)  # no re-enumeration beyond the ball

    def test_degenerate_probe_warns(self):
        from pg_vectorize_spark.operators.ann import _hamming_ball

        with pytest.warns(UserWarning, match="no longer prunes"):
            _hamming_ball(0, 4, 4)

    def test_small_radius_silent(self):
        import warnings

        from pg_vectorize_spark.operators.ann import _hamming_ball

        with warnings.catch_warnings():
            warnings.simplefilter("error")
            out = _hamming_ball(0, 8, 1)
        assert len(out) == 9


class TestRound5AdviceFixes:
    """Round-5 advisor findings (ADVICE.md r5): mp4_metadata pkey typing,
    corrupted _INDEX_META, compact_index partition-name escaping, and
    pq_encode_pandas on empty batches."""

    def test_mp4_metadata_string_pkey(self, spark):
        from pg_vectorize_spark.multimodal.binary import mp4_metadata

        df = spark.createDataFrame(
            [("doc-a", b"\x00\x01"), ("doc-b", None)],
            "doc string, blob binary",
        )
        out = mp4_metadata(df, "blob", "doc")
        assert out.schema["pkey"].dataType.simpleString() == "string"
        rows = {r["pkey"]: r for r in out.collect()}
        assert set(rows) == {"doc-a", "doc-b"}
        assert rows["doc-a"]["brand"] is None  # non-MP4 -> NULL metadata

    def test_corrupted_index_meta_raises(self, tmp_path):
        from pg_vectorize_spark.operators.ann import _check_index_meta

        idx = tmp_path / "idx"
        idx.mkdir()
        (idx / "_INDEX_META").write_text('{"nbits": 8')  # truncated JSON
        with pytest.raises(ValueError, match="unreadable"):
            _check_index_meta(str(idx), {"nbits": 8})
        # a genuinely missing meta file stays legacy-permissive
        (idx / "_INDEX_META").unlink()
        _check_index_meta(str(idx), {"nbits": 8})

    def test_compact_index_escaped_partition_values(self, spark, tmp_path):
        from pg_vectorize_spark.operators.ann import compact_index

        idx = str(tmp_path / "idx")
        df = spark.createDataFrame(
            [(1, "a:b"), (2, "a:b"), (3, "plain")], "id long, grp string"
        )
        # two appends -> 2+ files in each partition; ':' is escaped to
        # %3A in the directory name, which the pre-fix matcher never
        # mapped back to the value
        for _ in range(2):
            df.coalesce(1).write.mode("append").partitionBy("grp").parquet(idx)
        n = compact_index(spark, idx, part_col="grp", max_files=1)
        assert n == 2  # BOTH partitions compacted, incl. the escaped one
        back = spark.read.parquet(idx)
        assert back.count() == 6
        assert set(r["grp"] for r in back.select("grp").distinct().collect()) == {
            "a:b",
            "plain",
        }

    def test_pq_encode_pandas_empty_input(self, spark):
        from pg_vectorize_spark.operators.pq import (
            pq_encode_expr,
            pq_encode_pandas,
        )
        import pyspark.sql.functions as F

        codebook = [
            [[0.0, 0.0], [1.0, 1.0]],
            [[0.0, 1.0], [1.0, 0.0]],
        ]
        df = spark.createDataFrame(
            [(1, [0.1, 0.2, 0.9, 0.1])], "id long, emb array<double>"
        ).filter(F.col("id") < 0)
        out = pq_encode_pandas(df, "id", "emb", codebook)
        assert out.collect() == []
        assert out.schema["pq_codes"].dataType.simpleString() == "array<int>"


class TestRound7AdviceFixes:
    """Round-7 advisor findings: non-positive index params, paragraph_dedup
    separator quoting, hard-negative top-k skew, span-store expiry bound."""

    def test_nonpositive_index_params_rejected(self, spark, tmp_path):
        from pg_vectorize_spark.index_manager import JobIndexManager

        for bad in ({"nprobe": 0}, {"n_centroids": -1}, {"nbits": 0},
                    {"pq_m": 0}, {"rerank_candidates": 0}):
            with pytest.raises(VectorizeError, match="must be >= 1"):
                JobIndexManager(spark, str(tmp_path / "i"), "ivf", bad)
        # probe_hamming=0 is a legitimate single-bucket probe
        mgr = JobIndexManager(
            spark, str(tmp_path / "i2"), "signbit", {"probe_hamming": 0}
        )
        assert mgr.probe_hamming == 0

    def test_paragraph_dedup_separator_with_quote_terminator(self, spark):
        from pg_vectorize_spark.operators.dedup import paragraph_dedup

        # a separator containing the literal sequence \E used to terminate
        # the \Q...\E quote early, leaving "|x" parsed as regex
        sep = "\\E|x"
        df = spark.createDataFrame(
            [(1, f"alpha{sep}beta{sep}alpha"), (2, f"beta{sep}gamma")],
            "id long, text string",
        )
        out = {r["id"]: r for r in paragraph_dedup(
            df, "text", "id", sep=sep
        ).collect()}
        # doc 1: alpha, beta, alpha -> alpha+beta kept (2nd alpha is a dup)
        assert out[1]["n_paras"] == 3 and out[1]["n_kept"] == 2
        assert out[1]["clean_text"] == f"alpha{sep}beta"
        # doc 2: beta already seen in doc 1; gamma survives
        assert out[2]["n_kept"] == 1
        assert out[2]["clean_text"] == "gamma"

    def test_paragraph_dedup_regex_metachar_separator(self, spark):
        from pg_vectorize_spark.operators.dedup import paragraph_dedup

        df = spark.createDataFrame(
            [(1, "a.*b.*a")], "id long, text string"
        )
        out = paragraph_dedup(df, "text", "id", sep=".*").collect()[0]
        assert out["n_paras"] == 3 and out["n_kept"] == 2
        assert out["clean_text"] == "a.*b"

    def test_hard_negative_topk_two_stage_matches_global(self, spark):
        """The salted two-stage top-k must be exactly the single-stage
        result (row_number determinism via the pkey tiebreaker)."""
        import random

        from pyspark.sql import Window
        from pyspark.sql import functions as F

        from pg_vectorize_spark.operators.ann import hard_negative_mining

        rng = random.Random(7)
        corpus = spark.createDataFrame(
            [
                (i, [rng.uniform(-1, 1) for _ in range(8)], i % 3)
                for i in range(200)
            ],
            "vec_id long, emb array<double>, label int",
        ).repartition(8)
        anchors = spark.createDataFrame(
            [
                (100 + j, [rng.uniform(-1, 1) for _ in range(8)], 0)
                for j in range(2)
            ],
            "anchor_id long, anchor_vec array<double>, anchor_label int",
        )
        out = hard_negative_mining(
            corpus, anchors, "vec_id", "emb", label_col="label", k=5
        )
        rows = out.orderBy("anchor_id", "rank").collect()
        assert len(rows) == 10
        # reference computation: plain global window
        from pg_vectorize_spark.functions.vector import cosine_similarity

        pairs = anchors.crossJoin(corpus).filter(
            (F.col("anchor_id") != F.col("vec_id"))
            & ~F.col("anchor_label").eqNullSafe(F.col("label"))
        )
        scored = pairs.select(
            "anchor_id",
            "vec_id",
            cosine_similarity(F.col("anchor_vec"), F.col("emb")).alias("sim"),
        )
        w = Window.partitionBy("anchor_id").orderBy(
            F.desc("sim"), F.asc("vec_id")
        )
        ref = (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 5)
            .orderBy("anchor_id", "rank")
            .collect()
        )
        assert [(r["anchor_id"], r["vec_id"], r["rank"]) for r in rows] == [
            (r["anchor_id"], r["vec_id"], r["rank"]) for r in ref
        ]

    def test_ts_lb_sidecar_roundtrip(self, tmp_path):
        import datetime as dt

        from pg_vectorize_spark.streaming.windows import (
            _ts_lb_load,
            _ts_lb_set,
            _ts_lb_update,
        )

        d = str(tmp_path / "store")
        assert _ts_lb_load(d) is None
        t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
        _ts_lb_update(d, t0)
        assert _ts_lb_load(d) == t0
        # update with a LATER ts must not raise the lower bound
        _ts_lb_update(d, t0 + dt.timedelta(hours=1))
        assert _ts_lb_load(d) == t0
        _ts_lb_update(d, t0 - dt.timedelta(hours=1))
        assert _ts_lb_load(d) == t0 - dt.timedelta(hours=1)
        # expiry raises the bound to the cutoff
        _ts_lb_set(d, t0)
        assert _ts_lb_load(d) == t0


class TestRound10AdviceFixes:
    """ADVICE.md round-10 findings (fixed r11): MMR join-back column
    ambiguity, classifier-gate no-join scoring with a non-colliding
    model column, REST stats robustness."""

    def test_diversify_with_embeddings_source_column(
        self, spark, tmp_path
    ):
        """A source table carrying its own ``embeddings`` column made
        the MMR join-back ambiguous (return_columns=None projects it
        into the pool, then the snapshot join added a second column of
        the same name). The snapshot vector now joins under a reserved
        internal name."""
        rows = [
            (i, f"document number {i} about topic {i % 3}", [float(i)])
            for i in range(12)
        ]
        src = str(tmp_path / "mmr_src")
        spark.createDataFrame(
            rows, "id long, content string, embeddings array<double>"
        ).write.parquet(src)
        sess = VectorizeSession(spark, workspace=str(tmp_path / "ws_mmr"))
        sess.create_job(
            "mjob", src, columns=["content"], primary_key="id"
        )
        got = sess.search(
            "mjob", "document about topic", num_results=4, diversify=0.6
        )
        assert len(got) == 4
        hyb = sess.hybrid_search(
            "mjob", "document about topic", num_results=4, diversify=0.6
        )
        assert len(hyb) == 4

    def test_classifier_gate_non_colliding_model_column(
        self, spark, tmp_path
    ):
        """Gate model trained on a column name the job does NOT have:
        the no-join scorer attaches the model input column directly
        (the colliding case is covered by test_curate_filter)."""
        from pg_vectorize_spark.operators.classify import (
            train_curation_classifier,
        )

        clean = [
            f"the committee published report {i} on water policy"
            for i in range(25)
        ]
        garble = [f"zzk{i} qqp lnx vvb kjh zxw ppo" for i in range(25)]
        cur = spark.createDataFrame(
            [(i, t) for i, t in enumerate(clean)], "id long, text string"
        )
        raw = spark.createDataFrame(
            [(i, t) for i, t in enumerate(garble)], "id long, text string"
        )
        model = train_curation_classifier(
            cur, raw, "text", hash_dim=1 << 14
        )
        mpath = str(tmp_path / "gate_model_nc")
        model.write().overwrite().save(mpath)
        rows = [(i, clean[i]) for i in range(8)] + [
            (100 + i, garble[i]) for i in range(8)
        ]
        src = str(tmp_path / "gate_src_nc")
        spark.createDataFrame(
            rows, "id long, content string"
        ).write.parquet(src)
        sess = VectorizeSession(
            spark, workspace=str(tmp_path / "ws_gate_nc")
        )
        sess.create_job(
            "gjob2",
            src,
            columns=["content"],
            primary_key="id",
            curate_params={
                "classifier_path": mpath,
                "classifier_min_prob": 0.5,
            },
        )
        sess.scan_job("gjob2")
        emb_ids = {
            r["id"]
            for r in sess._emb_ds("gjob2").read().select("id").collect()
        }
        assert emb_ids == set(range(8))
        # and the gate did not mutate the stored schema: embeddings
        # snapshot carries the usual columns only
        cols = set(sess._emb_ds("gjob2").read().columns)
        assert "text" not in cols and "quality_prob" not in cols

    def test_rest_stats_returns_json_500_on_internal_error(
        self, spark, tmp_path
    ):
        """Any non-Vectorize exception from job_stats (corrupt maint
        file etc.) must come back as a JSON 500, not a dropped
        connection; the path segment is URL-decoded."""
        from pg_vectorize_spark.rest import run_in_thread

        df = spark.createDataFrame([(1, "x")], "id long, content string")
        src = str(tmp_path / "rs_src")
        df.write.parquet(src)
        sess = VectorizeSession(spark, workspace=str(tmp_path / "ws_rs"))
        sess.create_job("rsjob", src, columns=["content"], primary_key="id")

        def boom(name):
            raise RuntimeError(f"corrupt maint file for {name}")

        sess.job_stats = boom
        server, thread = run_in_thread(sess)
        try:
            port = server.server_address[1]
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/v1/jobs/rsjob/stats"
            )
            with pytest.raises(urllib.error.HTTPError) as ei:
                urllib.request.urlopen(req, timeout=10)
            assert ei.value.code == 500
            body = json.loads(ei.value.read().decode())
            assert "corrupt maint file for rsjob" in body["error"]
            # URL-encoded name decodes before lookup (unknown job -> 404
            # mentioning the DECODED name)
            with pytest.raises(urllib.error.HTTPError) as ei2:
                urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/v1/jobs/no%5Fsuch/stats",
                    timeout=10,
                )
            assert ei2.value.code in (404, 500)
            body2 = json.loads(ei2.value.read().decode())
            assert "no_such" in body2["error"]
        finally:
            server.shutdown()
            thread.join(timeout=5)


class TestRound11AdviceFixes:
    """ADVICE.md round-11 findings (fixed r12): the classifier gate's
    score column clobbering a same-named source column; a rebuild that
    can't produce a skew baseline inheriting the previous build's."""

    def test_classifier_gate_quality_prob_source_column(
        self, spark, tmp_path
    ):
        """A source table carrying its OWN ``quality_prob`` column (and
        a ``content`` column colliding with the model's input name):
        the scoring pass must rename BOTH out of the way and restore
        them — previously the post-filter drop('quality_prob', ...)
        destroyed the source column and the gate-content concat over
        job.src_columns failed to resolve it."""
        from pg_vectorize_spark.operators.classify import (
            train_curation_classifier,
        )

        clean = [
            f"the committee published report {i} on water policy analysis"
            for i in range(30)
        ]
        garble = [
            f"zzk{i} qqp lnx vvb kjh zxw ppo mmn bbv" for i in range(30)
        ]
        cur = spark.createDataFrame(
            [(i, t) for i, t in enumerate(clean)],
            "id long, content string",
        )
        raw = spark.createDataFrame(
            [(i, t) for i, t in enumerate(garble)],
            "id long, content string",
        )
        model = train_curation_classifier(
            cur, raw, "content", hash_dim=1 << 14
        )
        mpath = str(tmp_path / "gate_model_qp")
        model.write().overwrite().save(mpath)

        # corpus rows carry a quality_prob SOURCE column that is also
        # part of the embedded content
        rows = [(i, clean[i], f"grade {i % 3}") for i in range(10)] + [
            (100 + i, garble[i], f"grade {i % 3}") for i in range(10)
        ]
        src = str(tmp_path / "gate_src_qp")
        spark.createDataFrame(
            rows, "id long, content string, quality_prob string"
        ).write.parquet(src)
        sess = VectorizeSession(
            spark, workspace=str(tmp_path / "ws_gate_qp")
        )
        sess.create_job(
            "gjobqp",
            src,
            columns=["content", "quality_prob"],
            primary_key="id",
            curate_params={
                "classifier_path": mpath,
                "classifier_min_prob": 0.5,
            },
        )
        sess.scan_job("gjobqp")
        emb_ids = {
            r["id"]
            for r in sess._emb_ds("gjobqp").read().select("id").collect()
        }
        assert emb_ids == set(range(10))  # garble gated, clean kept

    def test_rebuild_without_baseline_clears_stale_skew(
        self, spark, tmp_path
    ):
        """A kmeans build records built_skew; a rebuild over the same
        index dir whose quantizer can't produce one (train='first')
        must CLEAR it, not inherit a baseline from a different
        quantizer (maybe_compact's 1.05x comparison would otherwise
        run against stale state)."""
        import json as _json
        import os as _os

        from pg_vectorize_spark.index_manager import JobIndexManager

        def dup_heavy(lo, hi, n_distinct=4):
            rows = []
            for i in range(lo, hi):
                if i - lo < n_distinct:
                    v = [0.0] * 4
                    v[i % 4] = 1.0
                else:
                    v = [0.5, 0.5, 0.0, 0.0]
                rows.append((i, v))
            return spark.createDataFrame(
                rows, "id long, embeddings array<double>"
            )

        idx = str(tmp_path / "skewidx")
        mgr = JobIndexManager(
            spark,
            idx,
            "ivf",
            {"n_centroids": 4, "compact_every": 2, "train": "kmeans"},
        )
        mgr.build(dup_heavy(0, 40), "id")
        with open(_os.path.join(idx, "_MAINT.json")) as f:
            assert "built_skew" in _json.load(f)
        # same dir, untrained quantizer: the rebuild has no baseline
        mgr2 = JobIndexManager(
            spark, idx, "ivf", {"n_centroids": 4, "compact_every": 2}
        )
        mgr2.build(dup_heavy(0, 40), "id")
        with open(_os.path.join(idx, "_MAINT.json")) as f:
            state = _json.load(f)
        assert "built_skew" not in state
        assert state["built_rows"] == 40
        # compaction paths still inherit what the build recorded
        mgr2._reset_maint()
        with open(_os.path.join(idx, "_MAINT.json")) as f:
            assert _json.load(f)["built_rows"] == 40
