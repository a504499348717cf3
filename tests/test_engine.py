"""VectorizeSession lifecycle tests — the integration-test themes of the
reference (extension/tests/integration_tests.rs, server/tests/tests.rs):
create job -> search visibility; insert/update freshness via scan_job;
delete-job idempotency + source preservation; import_embeddings; table_from;
rag with the echo chat provider."""

from __future__ import annotations

import math

import pytest

from pg_vectorize_spark.engine import VectorizeSession
from pg_vectorize_spark.errors import (
    JobAlreadyExistsError,
    JobNotFoundError,
    VectorizeError,
)
from pg_vectorize_spark.providers.http_openai import EchoChat
from pg_vectorize_spark.sources.parquet_snapshot import SnapshotDataset


@pytest.fixture()
def workspace(tmp_path):
    return str(tmp_path / "ws")


@pytest.fixture()
def products_path(spark, products_df, tmp_path):
    p = str(tmp_path / "products.parquet")
    products_df.write.mode("overwrite").parquet(p)
    return p


@pytest.fixture()
def sess(spark, workspace):
    return VectorizeSession(spark, workspace=workspace, chat_provider=EchoChat())


def _create(sess, products_path, name="prods"):
    return sess.create_job(
        name,
        products_path,
        columns=["product_name", "description"],
        primary_key="product_id",
    )


class TestLifecycle:
    def test_create_and_search(self, sess, products_path):
        job = _create(sess, products_path)
        assert job.dim == 64
        out = sess.search("prods", "mobile phone charger devices", num_results=3)
        assert len(out) == 3
        names = [r["product_name"] for r in out]
        assert "Phone Charger" in names
        assert all("similarity_score" in r for r in out)

    def test_duplicate_job_rejected(self, sess, products_path):
        _create(sess, products_path)
        with pytest.raises(JobAlreadyExistsError):
            _create(sess, products_path)

    def test_search_unknown_job(self, sess):
        with pytest.raises(JobNotFoundError):
            sess.search("nope", "q")

    def test_scan_job_incremental_noop(self, sess, products_path):
        _create(sess, products_path)
        # second scan: nothing changed -> 0 rows embedded
        assert sess.scan_job("prods") == 0

    def test_insert_freshness(self, sess, spark, products_path, products_df):
        _create(sess, products_path)
        extra = spark.createDataFrame(
            [(99, "Apple Tree", "apples and apple trees", "garden", 19.99)],
            products_df.schema,
        )
        products_df.unionByName(extra).write.mode("overwrite").parquet(
            products_path
        )
        assert sess.scan_job("prods") == 1
        out = sess.search("prods", "apples and apple trees", num_results=1)
        assert out[0]["product_name"] == "Apple Tree"

    def test_hybrid_search_shape(self, sess, products_path):
        _create(sess, products_path)
        out = sess.hybrid_search("prods", "bluetooth speaker", num_results=3)
        top = out[0]
        assert top["product_name"] == "Bluetooth Speaker"
        for k in ("rrf_score", "semantic_rank", "fts_rank", "similarity_score"):
            assert k in top

    def test_hybrid_search_cover_density(self, sess, products_path):
        _create(sess, products_path)
        out = sess.hybrid_search(
            "prods", "bluetooth speaker", num_results=3, rank="cover_density"
        )
        assert out[0]["product_name"] == "Bluetooth Speaker"
        assert "rrf_score" in out[0]

    def test_full_text_search(self, sess, products_path):
        _create(sess, products_path)
        out = sess.full_text_search("prods", "wireless mouse", num_results=2)
        assert out[0]["product_name"] == "Wireless Mouse"

    def test_filters_through_api(self, sess, products_path):
        _create(sess, products_path)
        out = sess.search(
            "prods", "gadget", num_results=40,
            filters={"product_category": "eq.electronics"},
        )
        assert len(out) == 5

    def test_delete_job(self, sess, spark, products_path):
        _create(sess, products_path)
        assert sess.delete_job("prods") is True
        # idempotent (server delete tests: 404 then ok — here False)
        assert sess.delete_job("prods") is False
        with pytest.raises(JobNotFoundError):
            sess.search("prods", "q")
        # source table untouched
        assert spark.read.parquet(products_path).count() == 14

    def test_job_view(self, sess, spark, products_path):
        _create(sess, products_path)
        v = spark.table("prods_view")
        assert "embeddings" in v.columns
        assert "embeddings_updated_at" in v.columns
        assert v.count() == 14

    def test_delete_cascade(self, sess, spark, products_path, products_df):
        """ON DELETE CASCADE parity (core/src/query.rs:349-354; realtime
        relational integrity, integration_tests.rs:483-555): deleting
        source rows then scanning prunes their embeddings + tokens, and
        the view / knn surface shows no ghosts."""
        _create(sess, products_path)
        emb = SnapshotDataset(
            sess.spark, sess._job_dir("prods", "embeddings")
        )
        tok = SnapshotDataset(
            sess.spark, sess._job_dir("prods", "search_tokens")
        )
        assert emb.read().count() == 14
        # delete 4 source rows (keep product_id <= 10)
        products_df.filter("product_id <= 10").write.mode(
            "overwrite"
        ).parquet(products_path)
        # delete-only cycle: nothing to embed, cascade still fires
        assert sess.scan_job("prods") == 0
        assert emb.read().count() == 10
        assert tok.read().count() == 10
        ghost = emb.read().filter("product_id > 10").count()
        assert ghost == 0
        # view rebuilt over the pruned datasets has no ghosts either
        v = sess.job_view("prods")
        assert v.count() == 10
        # second scan: steady-state, no orphans -> no snapshot churn
        v_before = emb.current_version()
        assert sess.cleanup_orphans("prods") == 0
        assert emb.current_version() == v_before


class TestImportAndFrom:
    def test_import_embeddings(self, sess, spark, products_path, tmp_path):
        _create(sess, products_path)
        ext = spark.createDataFrame(
            [(1, [1.0] + [0.0] * 63)], "pid long, vec array<double>"
        )
        p = str(tmp_path / "ext.parquet")
        ext.write.parquet(p)
        assert sess.import_embeddings("prods", p, "pid", "vec") == 1

    def test_import_dim_mismatch_rejected(self, sess, spark, products_path, tmp_path):
        _create(sess, products_path)
        ext = spark.createDataFrame(
            [(1, [1.0, 2.0])], "pid long, vec array<double>"
        )
        p = str(tmp_path / "bad.parquet")
        ext.write.parquet(p)
        with pytest.raises(VectorizeError):
            sess.import_embeddings("prods", p, "pid", "vec")

    def test_create_job_from(self, sess, spark, products_path, tmp_path):
        vecs = spark.createDataFrame(
            [(i, [float(i)] * 8) for i in range(1, 15)],
            "pid long, vec array<double>",
        )
        p = str(tmp_path / "vecs.parquet")
        vecs.write.parquet(p)
        job = sess.create_job_from(
            "fromjob",
            products_path,
            ["product_name"],
            "product_id",
            emb_src_path=p,
            emb_src_pk="pid",
            emb_src_col="vec",
        )
        assert job.dim == 8
        view = sess.job_view("fromjob")
        assert view.filter(view.embeddings.isNotNull()).count() == 14


class TestRag:
    def test_rag_single_column_required(self, sess, products_path):
        _create(sess, products_path)
        with pytest.raises(VectorizeError):
            sess.rag("prods", "what is a pencil?")

    def test_rag_end_to_end(self, sess, products_path):
        sess.create_job(
            "ragjob",
            products_path,
            columns=["description"],
            primary_key="product_id",
        )
        res = sess.rag("ragjob", "what chargers exist?", num_context=2)
        assert len(res.context) == 2
        for c in res.context:
            assert set(c) == {"record_id", "content", "token_ct"}
            assert c["token_ct"] == len(c["content"].split())
        # echo provider proves query + context reached the completion call
        assert res.chat_response.startswith("ECHO[2 msgs]")
        assert "what chargers exist?" in res.chat_response or len(
            res.chat_response
        ) > 0

    def test_generate(self, sess):
        out = sess.generate("hello")
        assert out.startswith("ECHO[1 msgs]: hello")


class TestSnapshotDataset:
    def test_upsert_and_read(self, spark, tmp_path):
        ds = SnapshotDataset(spark, str(tmp_path / "ds"))
        df1 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
        ds.write_full(df1)
        df2 = spark.createDataFrame([(2, "B"), (3, "c")], "id long, v string")
        ds.merge_upsert(df2, "id")
        got = {r["id"]: r["v"] for r in ds.read().collect()}
        assert got == {1: "a", 2: "B", 3: "c"}

    def test_delete_keys(self, spark, tmp_path):
        ds = SnapshotDataset(spark, str(tmp_path / "ds2"))
        ds.write_full(
            spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
        )
        ds.delete_keys(spark.createDataFrame([(1,)], "id long"), "id")
        assert [r["id"] for r in ds.read().collect()] == [2]

    def test_gc_keeps_two(self, spark, tmp_path):
        import os

        root = str(tmp_path / "ds3")
        ds = SnapshotDataset(spark, root)
        df = spark.createDataFrame([(1, "a")], "id long, v string")
        for _ in range(4):
            ds.write_full(df)
        vers = [d for d in os.listdir(root) if d.startswith("v=")]
        assert len(vers) == 2
        assert ds.current_version() == 4


def test_full_text_search_cover_density(sess, products_path):
    sess.create_job(
        "cdjob", products_path,
        columns=["product_name", "description"], primary_key="product_id",
    )
    out = sess.full_text_search(
        "cdjob", "bluetooth speaker", num_results=3, rank="cover_density"
    )
    assert out[0]["product_name"] == "Bluetooth Speaker"
    assert {"fts_score", "cd_score", "rank_cd"} <= set(out[0])
    # adjacent phrase in the top hit -> positive proximity bonus
    assert out[0]["cd_score"] > 0


class TestIndexDistType:
    """IndexDist enum parity (core/src/types.rs:63-103): every reference
    value accepted and recorded; invalid values rejected like FromStr."""

    def test_valid_types_recorded(self, spark, tmp_path, products_df):
        import pytest

        from pg_vectorize_spark.errors import VectorizeError

        p = str(tmp_path / "p.parquet")
        products_df.write.parquet(p)
        sess = VectorizeSession(spark, workspace=str(tmp_path / "ws"))
        job = sess.create_job(
            "distl2", p, columns=["product_name"], primary_key="product_id",
            index_dist_type="pgv_hnsw_l2", run_initial_load=False,
        )
        assert job.index_dist_type == "pgv_hnsw_l2"
        for t in ("pgv_hnsw_ip", "pgv_hnsw_cosine", "vsc_diskann_cosine"):
            sess.create_job(
                f"dist_{t}", p, columns=["product_name"],
                primary_key="product_id", index_dist_type=t,
                run_initial_load=False,
            )
        with pytest.raises(VectorizeError, match="Invalid value for IndexDist"):
            sess.create_job(
                "distbad", p, columns=["product_name"],
                primary_key="product_id", index_dist_type="pgv_hnsw_hamming",
                run_initial_load=False,
            )
