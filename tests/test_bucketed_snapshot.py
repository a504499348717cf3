"""BucketedSnapshotDataset — partition-local MERGE on the versioned
pointer: correctness parity with the single-snapshot layout, hard-linked
untouched buckets (no data rewrite), and no resurrection when a bucket
empties."""

from __future__ import annotations

import os

import pytest

from pg_vectorize_spark.sources.parquet_snapshot import (
    BucketedSnapshotDataset,
    SnapshotDataset,
)


def _rows(ds):
    return {
        (r["k"], r["v"]) for r in ds.read().select("k", "v").collect()
    }


@pytest.fixture()
def base_df(spark):
    return spark.createDataFrame(
        [(i, f"v{i}") for i in range(40)], "k long, v string"
    )


def test_parity_with_classic(spark, tmp_path, base_df):
    """Same operation sequence -> identical final row sets."""
    classic = SnapshotDataset(spark, str(tmp_path / "classic"))
    bucketed = BucketedSnapshotDataset(
        spark, str(tmp_path / "bucketed"), n_buckets=8
    )
    upd = spark.createDataFrame(
        [(3, "NEW3"), (17, "NEW17"), (99, "NEW99")], "k long, v string"
    )
    dels = spark.createDataFrame([(5,), (99,)], "k long")
    for ds in (classic, bucketed):
        ds.write_full(base_df)
        ds.merge_upsert(upd, "k")
        ds.delete_keys(dels, "k")
    assert _rows(classic) == _rows(bucketed)
    got = _rows(bucketed)
    assert (3, "NEW3") in got and (17, "NEW17") in got
    assert not any(k in (5, 99) for k, _ in got)


def test_untouched_buckets_hard_linked(spark, tmp_path, base_df):
    """A merge touching one key rewrites only that key's bucket; every
    other bucket's files in the new version are the SAME inodes as the
    previous version (hard links, no data written)."""
    ds = BucketedSnapshotDataset(spark, str(tmp_path / "b"), n_buckets=8)
    ds.write_full(base_df)
    v1 = ds.current_version()

    def bucket_inodes(v):
        out = {}
        vdir = ds._version_dir(v)
        for d in os.listdir(vdir):
            if d.startswith(f"{ds.BUCKET_COL}="):
                out[d] = {
                    os.stat(os.path.join(vdir, d, f)).st_ino
                    for f in os.listdir(os.path.join(vdir, d))
                    if not f.startswith((".", "_"))
                }
        return out

    before = bucket_inodes(v1)
    one = spark.createDataFrame([(7, "CHANGED")], "k long, v string")
    ds.merge_upsert(one, "k")
    v2 = ds.current_version()
    after = bucket_inodes(v2)
    hit = {
        r["b"]
        for r in one.select(ds._bucket_expr("k").alias("b")).collect()
    }
    hit_dirs = {f"{ds.BUCKET_COL}={b}" for b in hit}
    assert len(hit_dirs) == 1
    rewritten = linked = 0
    for d, inodes in after.items():
        if d in hit_dirs:
            assert inodes.isdisjoint(before.get(d, set()))
            rewritten += 1
        else:
            assert inodes == before[d], f"{d} should be hard-linked"
            linked += 1
    assert rewritten == 1 and linked >= 5
    assert (7, "CHANGED") in _rows(ds)
    assert len(_rows(ds)) == 40


def test_bucket_emptied_by_delete_stays_empty(spark, tmp_path):
    """Deleting every row of a bucket must not hard-link the old files
    back (the resurrection bug the affected-set exclusion prevents)."""
    spark_df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(12)], "k long, v string"
    )
    ds = BucketedSnapshotDataset(spark, str(tmp_path / "e"), n_buckets=4)
    ds.write_full(spark_df)
    # delete EVERY key in one bucket
    bucket_of = {
        r["k"]: r["b"]
        for r in spark_df.select(
            "k", ds._bucket_expr("k").alias("b")
        ).collect()
    }
    target = bucket_of[0]
    doomed = [k for k, b in bucket_of.items() if b == target]
    ds.delete_keys(
        spark.createDataFrame([(k,) for k in doomed], "k long"), "k"
    )
    left = {k for k, _ in _rows(ds)}
    assert left.isdisjoint(doomed)
    assert left == {k for k, b in bucket_of.items() if b != target}


def test_combined_merge_delete_parity(spark, tmp_path, base_df):
    """merge_upsert(delete_keys_df=...) — the realtime micro-batch's
    single-write shape — must equal merge-then-delete on BOTH layouts,
    including a delete that empties a bucket no new row lands in."""
    # key sets must be disjoint (the documented combined-write contract;
    # the CDF pipeline's version-dedup guarantees it)
    upd = spark.createDataFrame(
        [(3, "NEW3"), (99, "NEW99")], "k long, v string"
    )
    dels = spark.createDataFrame([(5,), (17,)], "k long")

    classic2 = SnapshotDataset(spark, str(tmp_path / "c2"))
    classic2.write_full(base_df)
    classic2.merge_upsert(upd, "k")
    classic2.delete_keys(dels, "k")
    want = _rows(classic2)

    for name, ds in (
        ("classic", SnapshotDataset(spark, str(tmp_path / "c1"))),
        (
            "bucketed",
            BucketedSnapshotDataset(
                spark, str(tmp_path / "b1"), n_buckets=8
            ),
        ),
    ):
        ds.write_full(base_df)
        ds.merge_upsert(upd, "k", delete_keys_df=dels)
        assert _rows(ds) == want, name


def test_combined_delete_empties_bucket_no_resurrection(spark, tmp_path):
    """A combined write whose delete keys empty an entire bucket while
    every NEW row lands elsewhere: the emptied bucket must not link its
    old files back (the affected set must come from new ∪ delete keys,
    not from the written output)."""
    ds = BucketedSnapshotDataset(spark, str(tmp_path / "b"), n_buckets=64)
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    ds.write_full(base)
    # delete key 2 entirely; insert key 100 (hashing, with 64 buckets,
    # almost surely elsewhere — and deterministically so for this data)
    ds.merge_upsert(
        spark.createDataFrame([(100, "new")], "k long, v string"),
        "k",
        delete_keys_df=spark.createDataFrame([(2,)], "k long"),
    )
    assert _rows(ds) == {(1, "a"), (3, "c"), (100, "new")}
    # and the rewrite stayed partition-local: version advanced, read ok
    ds.merge_upsert(
        spark.createDataFrame([(2, "back")], "k long, v string"), "k"
    )
    assert (2, "back") in _rows(ds)


def test_engine_end_to_end_bucketed(spark, tmp_path):
    """The full engine path on bucketed storage: create -> scan ->
    incremental update -> search -> orphan cascade."""
    from pg_vectorize_spark.engine import VectorizeSession
    from pg_vectorize_spark.sources.parquet_snapshot import (
        BucketedSnapshotDataset,
    )

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(i, f"document number {i} about topic {i % 5}") for i in range(30)],
        "id long, content string",
    ).write.parquet(src)
    sess = VectorizeSession(
        spark, workspace=str(tmp_path / "ws"), storage_buckets=4
    )
    sess.create_job("bjob", src, columns=["content"], primary_key="id")
    assert isinstance(sess._emb_ds("bjob"), BucketedSnapshotDataset)
    assert sess._emb_ds("bjob").read().count() == 30

    # incremental: one NEW row arrives, re-scan embeds just it — the
    # merge rewrites only that key's bucket
    spark.createDataFrame(
        [(i, f"document number {i} about topic {i % 5}") for i in range(30)]
        + [(30, "brand new pizza document")],
        "id long, content string",
    ).write.mode("overwrite").parquet(src)
    n = sess.scan_job("bjob")
    assert n == 1
    hits = sess.search("bjob", "brand new pizza", num_results=3)
    assert hits[0]["id"] == 30

    # cascade: truncate-to-subset converges on bucketed storage too
    spark.createDataFrame(
        [(i, f"document number {i} about topic {i % 5}") for i in range(10)],
        "id long, content string",
    ).write.mode("overwrite").parquet(src)
    removed = sess.cleanup_orphans("bjob")
    assert removed > 0
    assert sess._emb_ds("bjob").read().count() == 10
    assert {
        r["id"] for r in sess._emb_ds("bjob").read().select("id").collect()
    } == set(range(10))


def test_layout_mismatch_rejected(spark, tmp_path, base_df):
    """Reopening with a different n_buckets (or key) must fail loudly —
    a mismatched merge would hard-link stale same-key rows back as
    duplicates. Opening an unbucketed root as bucketed fails too."""
    root = str(tmp_path / "layout")
    BucketedSnapshotDataset(spark, root, n_buckets=16).write_full(base_df)
    wrong = BucketedSnapshotDataset(spark, root, n_buckets=32)
    upd = spark.createDataFrame([(3, "X")], "k long, v string")
    with pytest.raises(ValueError, match="n_buckets=16"):
        wrong.merge_upsert(upd, "k")
    wrong_key = BucketedSnapshotDataset(spark, root, n_buckets=16)
    with pytest.raises(ValueError, match="bucketed on key"):
        wrong_key.merge_upsert(
            upd.withColumnRenamed("k", "kk"), "kk"
        )
    # correct reopen still works
    ok = BucketedSnapshotDataset(spark, root, n_buckets=16)
    ok.merge_upsert(upd, "k")
    assert (3, "X") in _rows(ok)

    plain_root = str(tmp_path / "plain")
    SnapshotDataset(spark, plain_root).write_full(base_df)
    as_bucketed = BucketedSnapshotDataset(spark, plain_root, n_buckets=8)
    with pytest.raises(ValueError, match="UNBUCKETED"):
        as_bucketed.merge_upsert(upd, "k")


class TestReadForKeys:
    def test_pruned_superset_and_plan(self, spark, tmp_path):
        import re

        from pyspark.sql import functions as F

        from pg_vectorize_spark.sources.parquet_snapshot import (
            BucketedSnapshotDataset,
            SnapshotDataset,
        )

        ds = BucketedSnapshotDataset(
            spark, str(tmp_path / "b"), n_buckets=16
        )
        df = spark.range(200).select(
            F.col("id"), (F.col("id") * 2).alias("v")
        )
        ds.write_full(df, "id")
        keys = spark.createDataFrame([(3,), (77,), (150,)], "id long")
        got = ds.read_for_keys(keys, "id")
        # superset: every requested key's row is present, exact after join
        joined = {r["id"] for r in got.join(keys, "id", "left_semi").collect()}
        assert joined == {3, 77, 150}
        # strictly pruned: fewer rows than the table (3 keys, 16 buckets)
        assert got.count() < 200
        plan = got._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        assert re.search(r"PartitionFilters: \[[^\]]*_kb", plan), plan
        # wrong key refused
        import pytest as _pytest

        with _pytest.raises(ValueError, match="prune incorrectly"):
            ds.read_for_keys(keys.withColumnRenamed("id", "v"), "v")
        # base layout: full (but correct) fallback
        base = SnapshotDataset(spark, str(tmp_path / "p"))
        base.write_full(df)
        assert base.read_for_keys(keys, "id").count() == 200


class TestCrashResidue:
    """A writer that dies after materializing (part of) v=N+1 but before
    the pointer flip leaves an orphan dir above _CURRENT. Every later
    write targets that same version number; the append-mode and
    link-loop paths must not inherit the orphan's files (resurrected /
    duplicated rows)."""

    def _plant_orphan(self, spark, ds):
        """Simulate the crash: materialize a would-be next version
        holding rows that were never committed."""
        import shutil

        cur = ds.current_version()
        orphan = ds._version_dir(cur + 1)
        ghost = spark.createDataFrame(
            [(7, "GHOST7"), (777, "GHOST777")], "k long, v string"
        )
        (
            ghost.withColumn(ds.BUCKET_COL, ds._bucket_expr("k"))
            .write.mode("overwrite")
            .partitionBy(ds.BUCKET_COL)
            .parquet(orphan)
        )
        assert os.path.isdir(orphan)
        return orphan

    def test_merge_after_crash_drops_orphan(self, spark, tmp_path, base_df):
        ds = BucketedSnapshotDataset(
            spark, str(tmp_path / "m"), n_buckets=8
        )
        ds.write_full(base_df)
        self._plant_orphan(spark, ds)
        upd = spark.createDataFrame([(3, "NEW3")], "k long, v string")
        ds.merge_upsert(upd, "k")
        got = _rows(ds)
        assert (3, "NEW3") in got
        assert not any(v.startswith("GHOST") for _, v in got)
        assert len(got) == 40

    def test_append_after_crash_drops_orphan(self, spark, tmp_path, base_df):
        ds = BucketedSnapshotDataset(
            spark, str(tmp_path / "a"), n_buckets=8
        )
        ds.write_full(base_df)
        self._plant_orphan(spark, ds)
        new = spark.createDataFrame([(100, "v100")], "k long, v string")
        ds.append_rows(new, "k")  # pure-insert fast path: no Spark
        # overwrite ever touches the orphan's other buckets
        got = _rows(ds)
        assert (100, "v100") in got
        assert not any(v.startswith("GHOST") for _, v in got)
        assert len(got) == 41

    def test_empty_affected_delete_after_crash(self, spark, tmp_path, base_df):
        """delete_keys with keys absent from the table writes no Spark
        output at all — historically the path with nothing to clear the
        orphan."""
        ds = BucketedSnapshotDataset(
            spark, str(tmp_path / "d"), n_buckets=8
        )
        ds.write_full(base_df)
        self._plant_orphan(spark, ds)
        miss = spark.createDataFrame([(5000,)], "k long")
        ds.delete_keys(miss, "k")
        got = _rows(ds)
        assert not any(v.startswith("GHOST") for _, v in got)
        assert len(got) == 40
