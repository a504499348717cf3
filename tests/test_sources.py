"""Source-format dispatch: jobs over csv / json-lines / registered tables
behave identically to parquet jobs (the reference's Postgres-relation
source generalized to Spark's reader formats)."""

from __future__ import annotations

import pytest

from pg_vectorize_spark.engine import VectorizeSession
from pg_vectorize_spark.errors import VectorizeError
from pg_vectorize_spark.sources.reader import read_source

ROWS = [(1, "pizza with cheese"), (2, "wireless mouse device"), (3, "river bank walk")]


@pytest.fixture()
def sess(spark, tmp_path):
    return VectorizeSession(spark, workspace=str(tmp_path / "ws"))


def test_csv_job_end_to_end(spark, sess, tmp_path):
    p = str(tmp_path / "docs.csv")
    with open(p, "w") as f:
        f.write("id,content\n")
        for i, t in ROWS:
            f.write(f"{i},{t}\n")
    sess.create_job("csvjob", p, columns=["content"], primary_key="id")
    out = sess.search("csvjob", "pizza cheese", num_results=1)
    assert out[0]["id"] == 1


def test_jsonl_job_end_to_end(spark, sess, tmp_path):
    import json

    p = str(tmp_path / "docs.jsonl")
    with open(p, "w") as f:
        for i, t in ROWS:
            f.write(json.dumps({"id": i, "content": t}) + "\n")
    sess.create_job("jsonjob", p, columns=["content"], primary_key="id")
    out = sess.search("jsonjob", "wireless mouse", num_results=1)
    assert out[0]["id"] == 2


def test_orc_job_end_to_end(spark, sess, tmp_path):
    orc_dir = str(tmp_path / "docs.orc")
    spark.createDataFrame(ROWS, "id long, content string").coalesce(1).write.orc(
        orc_dir
    )
    sess.create_job("orcjob", orc_dir, columns=["content"], primary_key="id")
    out = sess.search("orcjob", "pizza cheese", num_results=1)
    assert out[0]["id"] == 1


def test_registered_table_source(spark, sess):
    spark.createDataFrame(ROWS, "id long, content string").createOrReplaceTempView(
        "tbl_src"
    )
    sess.create_job("tbljob", "tbl_src", columns=["content"], primary_key="id")
    out = sess.search("tbljob", "river bank", num_results=1)
    assert out[0]["id"] == 3


def test_explicit_format_override(spark, tmp_path):
    # a .dat extension with explicit csv format
    p = str(tmp_path / "docs.dat")
    with open(p, "w") as f:
        f.write("id,content\n1,hello world\n")
    df = read_source(spark, p, "csv")
    assert df.count() == 1 and set(df.columns) == {"id", "content"}


def test_unknown_format_rejected(spark):
    with pytest.raises(VectorizeError, match="unknown source format"):
        read_source(spark, "/nope", "xml")
