"""Change detection (S1/S2), record fetch (S3), batching (R3/R4)."""

from __future__ import annotations

from datetime import datetime

from pg_vectorize_spark.operators.change import (
    batch_by_count,
    batch_by_token_budget_distributed,
    concat_source_columns,
    detect_changes_append,
    detect_changes_join,
    fetch_by_ids,
    pack_by_token_budget,
)


def _src(spark):
    return spark.createDataFrame(
        [
            (1, "a", datetime(2024, 1, 10)),
            (2, "b", datetime(2024, 1, 20)),
            (3, "c", datetime(2024, 1, 30)),
        ],
        "id long, content string, updated_at timestamp",
    )


def _emb(spark):
    # id=1 embedded AFTER its update; id=2 embedded BEFORE its update; id=3 missing
    return spark.createDataFrame(
        [
            (1, [0.1], datetime(2024, 1, 15)),
            (2, [0.2], datetime(2024, 1, 15)),
        ],
        "id long, embeddings array<double>, updated_at timestamp",
    )


class TestChangeDetection:
    def test_join_method(self, spark):
        out = detect_changes_join(_src(spark), _emb(spark), "id", "updated_at")
        assert {r["id"] for r in out.collect()} == {2, 3}

    def test_join_method_no_update_col(self, spark):
        out = detect_changes_join(_src(spark), _emb(spark), "id", None)
        assert {r["id"] for r in out.collect()} == {3}

    def test_join_null_emb_timestamp_counts_as_stale(self, spark):
        emb = spark.createDataFrame(
            [(1, [0.1], None)],
            "id long, embeddings array<double>, updated_at timestamp",
        )
        out = detect_changes_join(_src(spark), emb, "id", "updated_at")
        # id=1 has NULL embedded-at -> COALESCE to min ts -> stale
        assert {r["id"] for r in out.collect()} == {1, 2, 3}

    def test_append_method(self, spark):
        src = spark.createDataFrame(
            [
                (1, datetime(2024, 1, 10), datetime(2024, 1, 15)),
                (2, datetime(2024, 1, 20), datetime(2024, 1, 15)),
                (3, datetime(2024, 1, 30), None),
            ],
            "id long, updated_at timestamp, job_updated_at timestamp",
        )
        out = detect_changes_append(src, "updated_at", "job_updated_at")
        assert {r["id"] for r in out.collect()} == {2, 3}

    def test_fetch_by_ids(self, spark):
        out = fetch_by_ids(_src(spark), "id", [1, 3, 99])
        assert {r["id"] for r in out.collect()} == {1, 3}


class TestConcat:
    def test_space_style_null_safe(self, spark):
        df = spark.createDataFrame(
            [(1, "name", None)], "id long, a string, b string"
        )
        out = df.select(
            concat_source_columns(["a", "b"]).alias("c")
        ).head()["c"]
        assert out == "name "

    def test_prefixed_style(self, spark):
        df = spark.createDataFrame(
            [(1, "x", "y")], "id long, a string, b string"
        )
        out = df.select(
            concat_source_columns(["a", "b"], style="prefixed").alias("c")
        ).head()["c"]
        assert out == "a: x b: y"


class TestBatching:
    def test_pack_greedy_reference_semantics(self):
        items = [("a", 4000), ("b", 4000), ("c", 4000), ("d", 1000)]
        assert pack_by_token_budget(items, 10_000) == [["a", "b"], ["c", "d"]]

    def test_pack_oversized_item_own_batch(self):
        items = [("a", 50_000), ("b", 10)]
        assert pack_by_token_budget(items, 10_000) == [["a"], ["b"]]

    def test_pack_empty(self):
        assert pack_by_token_budget([], 10_000) == []

    def test_batch_by_count(self, spark):
        df = spark.range(10).withColumnRenamed("id", "pk")
        out = batch_by_count(df, "pk", batch_size=4).collect()
        got = {r["pk"]: r["batch_id"] for r in out}
        assert got[0] == 0 and got[3] == 0 and got[4] == 1 and got[9] == 2

    def test_batch_by_token_budget_distributed(self, spark):
        df = spark.createDataFrame(
            [(1, 6000), (2, 6000), (3, 6000)], "pk long, toks long"
        )
        got = {
            r["pk"]: r["batch_id"]
            for r in batch_by_token_budget_distributed(
                df, "pk", "toks", 10_000
            ).collect()
        }
        # exclusive cumsum: 0, 6000, 12000 -> batches 0, 0, 1
        assert got == {1: 0, 2: 0, 3: 1}


class TestApplyChangeEvents:
    """Batch CDF apply (operators/change.apply_change_events) — the
    versioned path is oracle-gated (cdf_apply); these pin the unversioned
    conservative mode and preimage handling."""

    def test_unversioned_delete_wins(self, spark):
        base = spark.createDataFrame(
            [(1, "one"), (2, "two")], "id long, v string"
        )
        ev = spark.createDataFrame(
            [
                (2, "two-new", "update_postimage"),
                (2, None, "delete"),
                (3, "three", "insert"),
            ],
            "id long, v string, _change_type string",
        )
        from pg_vectorize_spark.operators.change import apply_change_events

        got = {
            r["id"]: r["v"]
            for r in apply_change_events(base, ev, "id").collect()
        }
        assert got == {1: "one", 3: "three"}  # 2 nets out deleted

    def test_preimages_never_apply(self, spark):
        base = spark.createDataFrame([(1, "one")], "id long, v string")
        ev = spark.createDataFrame(
            [(1, "OLD", "update_preimage", 5), (1, "NEW", "update_postimage", 5)],
            "id long, v string, _change_type string, _version long",
        )
        from pg_vectorize_spark.operators.change import apply_change_events

        got = apply_change_events(
            base, ev, "id", version_col="_version"
        ).collect()
        assert [(r["id"], r["v"]) for r in got] == [(1, "NEW")]

    def test_unversioned_multi_upsert_single_row_per_key(self, spark):
        """Review regression: several upsert payloads for one key in an
        unversioned log must collapse to ONE row (deterministic pick),
        never duplicate the primary key in the output snapshot."""
        base = spark.createDataFrame([(1, "one")], "id long, v string")
        ev = spark.createDataFrame(
            [
                (2, "two-a", "insert"),
                (2, "two-b", "update_postimage"),
                (3, "three", "insert"),
            ],
            "id long, v string, _change_type string",
        )
        from pg_vectorize_spark.operators.change import apply_change_events

        rows = apply_change_events(base, ev, "id").collect()
        ids = [r["id"] for r in rows]
        assert sorted(ids) == [1, 2, 3]  # no pkey duplicated
        got = {r["id"]: r["v"] for r in rows}
        assert got[2] == "two-b"  # lexicographically greatest payload
