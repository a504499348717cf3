"""Append table-method + mod_info parity tests
(extension/tests/integration_tests.rs:154-202 append-method theme)."""

from __future__ import annotations

import pytest

from pg_vectorize_spark.engine import VectorizeSession


@pytest.fixture()
def sess(spark, tmp_path):
    return VectorizeSession(spark, workspace=str(tmp_path / "ws"))


@pytest.fixture()
def products_path(spark, products_df, tmp_path):
    p = str(tmp_path / "products.parquet")
    products_df.write.mode("overwrite").parquet(p)
    return p


def test_append_method_search(sess, products_path):
    sess.create_job(
        "app",
        products_path,
        columns=["product_name", "description"],
        primary_key="product_id",
        table_method="append",
        schedule="* * * * *",
    )
    out = sess.search("app", "wooden pencil eraser", num_results=1)
    assert out[0]["product_name"] == "Pencil"


def test_append_method_wide_view(sess, spark, products_path):
    sess.create_job(
        "app2",
        products_path,
        columns=["product_name"],
        primary_key="product_id",
        table_method="append",
        schedule="* * * * *",
    )
    view = spark.table("app2_view")
    # wide snapshot: source columns + embeddings, no join needed
    assert "product_name" in view.columns
    assert "embeddings" in view.columns
    assert "embeddings_updated_at" in view.columns
    assert view.count() == 14


def test_append_incremental_noop(sess, products_path):
    sess.create_job(
        "app3",
        products_path,
        columns=["product_name"],
        primary_key="product_id",
        table_method="append",
        schedule="* * * * *",
    )
    assert sess.scan_job("app3") == 0


def test_mod_info(sess):
    info = sess.mod_info("local/hash-embedder-64")
    assert info == {
        "model": "local/hash-embedder-64",
        "source": "local",
        "dim": 64,
        "max_seq_len": 8192,
    }


def test_mod_info_default_model(sess):
    info = sess.mod_info()
    assert info["dim"] == 64


def test_catalog_df_and_view(sess, spark, products_path):
    sess.create_job(
        "catjob", products_path, columns=["product_name"],
        primary_key="product_id",
    )
    df = sess.catalog_df()
    rows = {r["job_name"]: r for r in df.collect()}
    assert rows["catjob"]["dim"] == 64
    assert rows["catjob"]["src_columns"] == ["product_name"]
    # queryable as a view
    assert (
        spark.sql(
            "SELECT model FROM vectorize_jobs WHERE job_name = 'catjob'"
        ).head()["model"]
        == "local/hash-embedder-64"
    )


def test_hybrid_extension_mode(sess, products_path):
    import math

    sess.create_job(
        "extjob", products_path,
        columns=["product_name", "description"], primary_key="product_id",
    )
    out = sess.hybrid_search_extension_mode(
        "extjob", "portable bluetooth speaker", num_results=3,
        semantic_weight=50,
    )
    top = out[0]
    assert top["product_name"] == "Bluetooth Speaker"
    # weights 0.5/0.5 at ranks 1/1 -> rrf = 0.5/61 + 0.5/61 = 1/61
    if top["semantic_rank"] == 1 and top["fts_rank"] == 1:
        assert math.isclose(top["rrf_score"], 1.0 / 61.0, rel_tol=1e-12)


def test_append_method_delete_cascade(sess, spark, products_path, products_df):
    """Cascade parity for append-mode wide rows: deleting source rows then
    scanning prunes their wide snapshot rows and tokens too (same
    realtime-relational-integrity behavior as the join method,
    integration_tests.rs:483-555)."""
    from pg_vectorize_spark.sources.parquet_snapshot import SnapshotDataset

    sess.create_job(
        "appdel",
        products_path,
        columns=["product_name"],
        primary_key="product_id",
        table_method="append",
        schedule="* * * * *",
    )
    emb = SnapshotDataset(sess.spark, sess._job_dir("appdel", "embeddings"))
    assert emb.read().count() == 14
    products_df.filter("product_id <= 9").write.mode("overwrite").parquet(
        products_path
    )
    assert sess.scan_job("appdel") == 0  # delete-only cycle
    assert emb.read().count() == 9
    assert emb.read().filter("product_id > 9").count() == 0
    v = sess.job_view("appdel")
    assert v.count() == 9


def test_realtime_append_rejected(sess, products_path):
    """realtime + append is not supported (search.rs:36-38;
    test_realtime_append_fail, integration_tests.rs:203-229)."""
    import pytest

    from pg_vectorize_spark.errors import VectorizeError

    with pytest.raises(VectorizeError, match="only compatible with the join"):
        sess.create_job(
            "rtapp",
            products_path,
            columns=["product_name"],
            primary_key="product_id",
            table_method="append",
            schedule="realtime",
        )
