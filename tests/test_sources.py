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


def test_events_loader_schema_adaptive(spark, tmp_path):
    """The driver has shipped events.ts as TIMESTAMP(NANOS) and as
    TIMESTAMP(MICROS) in different rounds; the entry loader must decode
    both to identical timestamps (guard against testdata schema drift)."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    import __spark_entry__ as entrymod

    times = [
        dt.datetime(2026, 1, 1, 12, 0, 0, 250_000),
        dt.datetime(2026, 1, 2, 3, 4, 5, 6),
    ]
    base = {
        "event_id": pa.array([1, 2], pa.int64()),
        "user_id": pa.array([10, 20], pa.int64()),
        "event_type": pa.array(["click", "view"], pa.string()),
        "value": pa.array([1.5, 2.5], pa.float64()),
        "props": pa.array(["{}", "{}"], pa.string()),
    }
    out = {}
    for name, unit in (("nanos", "ns"), ("micros", "us")):
        d = tmp_path / name
        d.mkdir()
        pq.write_table(
            pa.table({**base, "ts": pa.array(times, pa.timestamp(unit))}),
            str(d / "events.parquet"),
        )
        df = entrymod._events(spark, str(d))
        assert dict(df.dtypes)["ts"] == "timestamp"
        out[name] = sorted(
            (r["event_id"], r["ts"]) for r in df.collect()
        )
    assert out["nanos"] == out["micros"]
    assert out["micros"][0][1].microsecond == 250_000
