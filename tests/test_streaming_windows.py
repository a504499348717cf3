"""Watermarked windowed aggregation + stateful sessionization tests."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from pg_vectorize_spark.streaming.windows import (
    sessionize_stateful,
    windowed_event_counts,
)


def _events_df(spark):
    base = datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    for i in range(200):
        rows.append(
            (
                i,
                base + timedelta(minutes=i * 7),
                i % 5,
                ["click", "view"][i % 2],
                float(i % 13) + 0.25,
            )
        )
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


def test_windowed_counts_batch_matches_manual(spark):
    df = _events_df(spark)
    out = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in windowed_event_counts(df).collect()
    }
    # manual: first hour (minutes 0..59 -> i in 0..8)
    first_hour = datetime(2024, 1, 1, 0, 0, 0)
    clicks = [i for i in range(9) if i % 2 == 0]
    n, s = out[(first_hour, "click")]
    assert n == len(clicks)
    assert abs(s - sum(float(i % 13) + 0.25 for i in clicks)) < 1e-9


def test_windowed_counts_streaming_matches_batch(spark, tmp_path):
    df = _events_df(spark)
    src = str(tmp_path / "ev_src")
    df.coalesce(2).write.parquet(src)

    batch = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in windowed_event_counts(spark.read.parquet(src)).collect()
    }

    stream = spark.readStream.schema(df.schema).parquet(src)
    q = (
        windowed_event_counts(stream)
        .writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    assert streamed == batch


def test_stateful_sessionize_closes_gapped_sessions(spark, tmp_path):
    base = datetime(2024, 1, 1)
    rows = [
        # user 1: two sessions separated by a 2-hour gap
        (1, base),
        (1, base + timedelta(minutes=10)),
        (1, base + timedelta(hours=3)),
        # user 2: one session
        (2, base + timedelta(minutes=5)),
        (2, base + timedelta(minutes=20)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    src = str(tmp_path / "sess_src")
    df.coalesce(1).write.parquet(src)

    stream = spark.readStream.schema(df.schema).parquet(src)
    q = (
        sessionize_stateful(stream, gap_seconds=1800)
        .writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM sessions_out").collect()
    # only CLOSED sessions are emitted: user 1's first session closed by the
    # 3-hour event; the open sessions stay in state
    closed = {(r["user_id"], r["n_events"]) for r in got}
    assert (1, 2) in closed
    by_key = {
        (r["user_id"], r["n_events"]): r for r in got
    }
    s = by_key[(1, 2)]
    assert s["session_start"] == base
    assert s["session_end"] == base + timedelta(minutes=10)


def test_streaming_dedup_drops_in_window_duplicates(spark, tmp_path):
    from datetime import datetime

    from pg_vectorize_spark.streaming.windows import streaming_dedup

    base = datetime(2024, 1, 1)
    rows = [
        (1, "alpha text", base),
        (2, "alpha text", base),        # dup within window -> dropped
        (3, "beta text", base),
        (4, "beta  text", base),        # different raw text, same tokens?
        (5, "gamma text", base),
    ]
    df = spark.createDataFrame(rows, "id long, text string, ts timestamp")
    src = str(tmp_path / "dd_src")
    df.coalesce(1).write.parquet(src)

    stream = spark.readStream.schema(df.schema).parquet(src)
    q = (
        streaming_dedup(stream)
        .writeStream.format("memory")
        .queryName("dd_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "dd_ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM dd_out").collect()
    texts = sorted(r["text"] for r in out)
    # fingerprint is over raw text, so 'beta text' and 'beta  text' differ
    assert len(out) == 4, out
    assert texts == ["alpha text", "beta  text", "beta text", "gamma text"]
    # batch fallback agrees on the survivor count
    batch = streaming_dedup(spark.read.parquet(src)).collect()
    assert len(batch) == 4


def test_streaming_asof_enrich_matches_batch(spark, tmp_path):
    """Stream==batch: per-micro-batch as-of enrichment is exact (stateless
    across events), so chopping the stream into batches changes nothing."""
    from datetime import datetime, timedelta

    from pg_vectorize_spark.operators.asof import asof_join
    from pg_vectorize_spark.streaming.windows import streaming_asof_enrich

    base = datetime(2024, 1, 1)
    ev_rows = [
        (i, f"u{i % 3}", base + timedelta(seconds=10 * i)) for i in range(30)
    ]
    dim_rows = [
        (100 + j, f"u{j % 3}", base + timedelta(seconds=25 * j), float(j))
        for j in range(12)
    ]
    events = spark.createDataFrame(ev_rows, "eid long, user string, ts timestamp")
    dims = spark.createDataFrame(
        dim_rows, "vid long, user string, ts timestamp, score double"
    )
    src = str(tmp_path / "ae_src")
    # two files -> at least the availableNow run sees multiple splits
    events.repartition(2).write.parquet(src)

    got = []
    stream = spark.readStream.schema(events.schema).parquet(src)
    q = streaming_asof_enrich(
        stream,
        dims,
        on="user",
        left_ts="ts",
        checkpoint_dir=str(tmp_path / "ae_ck"),
        sink=lambda df, bid: got.extend(df.collect()),
        right_cols=["score"],
        right_tie="vid",
        trigger_available_now=True,
    )
    q.awaitTermination(120)

    want = asof_join(
        events, dims, on="user", left_ts="ts",
        right_cols=["score"], right_tie="vid",
    ).collect()
    key = lambda r: (r["eid"], r["ts_right"], r["score"])  # noqa: E731
    assert sorted(map(key, got)) == sorted(map(key, want))
    assert len(got) == 30


@pytest.mark.slow
class TestStreamingDupSpanFilter:
    """Ingest-time exact-substring filter (streaming_dup_span_filter):
    stream == batch agreement under the arrival-order rule, independence
    from micro-batch splits, and watermark-bounded span state."""

    K = 5
    MAX_FRACTION = 0.5

    def _docs(self, spark):
        base = datetime(2024, 1, 1)
        shared = " ".join(f"w{i}" for i in range(30))
        half = " ".join(f"w{i}" for i in range(15))
        uniq3 = " ".join(f"u{i}" for i in range(15))
        uniq4 = " ".join(f"v{i}" for i in range(30))
        rows = [
            (1, base, shared),                           # first bearer: kept
            (2, base + timedelta(hours=1), shared),      # full copy: dropped
            (3, base + timedelta(hours=2), f"{half} {uniq3}"),  # ~0.42: kept
            (4, base + timedelta(hours=3), uniq4),       # unique: kept
        ]
        return spark.createDataFrame(rows, "doc_id long, ts timestamp, text string")

    def _run_stream(self, spark, tmp_path, tag, n_files, watermark=None):
        docs = self._docs(spark)
        src = str(tmp_path / f"src_{tag}")
        rows = docs.collect()
        import os

        os.makedirs(src, exist_ok=True)
        per_file = max(1, len(rows) // n_files)
        for fi in range(0, len(rows), per_file):
            chunk = spark.createDataFrame(rows[fi : fi + per_file], docs.schema)
            chunk.coalesce(1).write.mode("append").parquet(src)

        from pg_vectorize_spark.streaming.windows import (
            streaming_dup_span_filter,
        )

        kept_rows = []

        def sink(df, batch_id):
            kept_rows.extend(df.collect())

        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = streaming_dup_span_filter(
            stream,
            "text",
            "doc_id",
            "ts",
            store_dir=str(tmp_path / f"store_{tag}"),
            checkpoint_dir=str(tmp_path / f"ck_{tag}"),
            sink=sink,
            k=self.K,
            max_fraction=self.MAX_FRACTION,
            watermark_seconds=watermark,
            trigger_available_now=True,
        )
        q.awaitTermination(120)
        return kept_rows

    def _batch_expected(self, spark):
        from pg_vectorize_spark.operators.dedup import (
            arrival_order_span_stats,
        )

        stats = arrival_order_span_stats(
            self._docs(spark), "text", "doc_id", "ts", k=self.K
        )
        return {
            r["doc_id"]: (
                r["n_windows"],
                r["n_dup_windows"],
                r["dup_fraction"],
            )
            for r in stats.collect()
            if r["dup_fraction"] <= self.MAX_FRACTION
        }

    def test_batch_rule_arrival_asymmetry(self, spark):
        """First bearer innocent, replay fully dup, partial overlap in
        between — the asymmetric reading the batch audit cannot give."""
        expected = self._batch_expected(spark)
        assert set(expected) == {1, 3, 4}
        assert expected[1][2] == 0.0  # first bearer of the shared span
        n3, d3, f3 = expected[3]
        assert n3 == 26 and d3 == 11
        assert abs(f3 - 11 / 26) < 1e-12

    def test_stream_equals_batch_across_splits(self, spark, tmp_path):
        expected = self._batch_expected(spark)
        for tag, n_files in (("one", 1), ("perdoc", 4)):
            kept = self._run_stream(spark, tmp_path, tag, n_files)
            got = {
                r["doc_id"]: (
                    r["n_windows"],
                    r["n_dup_windows"],
                    r["dup_fraction"],
                )
                for r in kept
            }
            assert got == expected, f"split {tag}"

    def test_watermark_prunes_span_store(self, spark, tmp_path):
        """Span keys older than (max ts - watermark) are evicted, so the
        state is bounded; a replay arriving after eviction passes (the
        documented late-data caveat, same as streaming_dedup)."""
        from pg_vectorize_spark.sources.parquet_snapshot import (
            SnapshotDataset,
        )

        self._run_stream(
            spark, tmp_path, "wm", n_files=4, watermark=90 * 60
        )  # 1.5h: doc 1/2 spans (3h / 2h old) pruned, doc 3/4 retained
        store = SnapshotDataset(spark, str(tmp_path / "store_wm"))
        base = datetime(2024, 1, 1)
        kept_ts = {r["ts"] for r in store.read().select("ts").collect()}
        assert kept_ts == {
            base + timedelta(hours=2),
            base + timedelta(hours=3),
        }

    def test_late_arriving_copy_is_the_dropped_one(self, spark, tmp_path):
        """Review regression: a duplicate whose EVENT time predates the
        stored first-seen ts still loses — store rows outrank every batch
        row (processing order across batches), so an already-emitted
        document never retroactively becomes the dup and the stream never
        ingests both copies."""
        base = datetime(2024, 1, 1)
        shared = " ".join(f"w{i}" for i in range(30))
        docs = spark.createDataFrame(
            [(1, base + timedelta(hours=2), shared)],
            "doc_id long, ts timestamp, text string",
        )
        late = spark.createDataFrame(
            [(2, base, shared)],  # event-time EARLIER than doc 1
            "doc_id long, ts timestamp, text string",
        )
        src = str(tmp_path / "late_src")
        docs.coalesce(1).write.mode("append").parquet(src)

        from pg_vectorize_spark.streaming.windows import (
            streaming_dup_span_filter,
        )

        kept = []

        def sink(df, batch_id):
            kept.extend(r["doc_id"] for r in df.collect())

        def run():
            stream = (
                spark.readStream.schema(docs.schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(src)
            )
            q = streaming_dup_span_filter(
                stream,
                "text",
                "doc_id",
                "ts",
                store_dir=str(tmp_path / "late_store"),
                checkpoint_dir=str(tmp_path / "late_ck"),
                sink=sink,
                k=self.K,
                max_fraction=self.MAX_FRACTION,
                trigger_available_now=True,
            )
            q.awaitTermination(120)

        run()
        assert kept == [1]
        late.coalesce(1).write.mode("append").parquet(src)
        run()  # second availableNow run picks up the late file
        assert kept == [1]  # the late copy was dropped, not double-kept


@pytest.mark.slow
class TestDupSpanStoreBucketed:
    """VERDICT r5 #7: the span store is hash-bucketed — a micro-batch's
    fold rewrites only the buckets its new spans land in and hard-links
    the rest, instead of rewriting the whole store."""

    def test_store_layout_and_hardlinked_fold(self, spark, tmp_path):
        import os
        from datetime import datetime, timedelta

        from pg_vectorize_spark.streaming.windows import (
            streaming_dup_span_filter,
        )

        base = datetime(2024, 1, 1)
        # batch 0: a broad corpus seeds many buckets; batch 1: ONE doc
        big = [
            (i, base, " ".join(f"a{i}_{j}" for j in range(40)))
            for i in range(40)
        ]
        small = [(100, base + timedelta(hours=1), "z1 z2 z3 z4 z5 z6 z7")]
        schema = "doc_id long, ts timestamp, text string"
        src = str(tmp_path / "src")
        spark.createDataFrame(big, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        spark.createDataFrame(small, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

        store = str(tmp_path / "store")
        q = streaming_dup_span_filter(
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src),
            "text",
            "doc_id",
            "ts",
            store_dir=store,
            checkpoint_dir=str(tmp_path / "ck"),
            sink=lambda df, bid: df.count(),
            k=5,
            trigger_available_now=True,
            store_buckets=256,
        )
        q.awaitTermination(300)
        vers = sorted(d for d in os.listdir(store) if d.startswith("v="))
        assert len(vers) == 2  # one version per batch fold
        last = os.path.join(store, vers[-1])
        buckets = [d for d in os.listdir(last) if d.startswith("_kb=")]
        assert buckets, os.listdir(last)  # bucketed layout on disk
        # the single-doc batch (3 span keys) must hard-link most buckets
        new_b = linked_b = 0
        for dirp, _, files in os.walk(last):
            for f in files:
                st = os.stat(os.path.join(dirp, f))
                if st.st_nlink == 1:
                    new_b += st.st_size
                else:
                    linked_b += st.st_size
        assert linked_b > 0, "no hard-linked (untouched) buckets"
        assert new_b < (new_b + linked_b) * 0.25, (
            f"batch rewrote {new_b}/{new_b + linked_b} bytes"
        )

    def test_legacy_unbucketed_store_migrates_in_place(self, spark, tmp_path):
        """A span store written by the pre-bucketed filter version must
        migrate on stream start instead of bricking every batch; a
        restart with a different store_buckets must keep the persisted
        modulus."""
        import os
        from datetime import datetime, timedelta

        from pg_vectorize_spark.sources.parquet_snapshot import (
            BucketedSnapshotDataset,
            SnapshotDataset,
        )
        from pg_vectorize_spark.streaming.windows import (
            streaming_dup_span_filter,
        )

        base = datetime(2024, 1, 1)
        store = str(tmp_path / "store")
        # legacy store: (gkey, ts) written by the base class
        legacy = spark.createDataFrame(
            [(hash(f"s{i}") & 0x7FFFFFFF, base) for i in range(50)],
            "gkey long, ts timestamp",
        )
        SnapshotDataset(spark, store).write_full(legacy)
        legacy_keys = {r["gkey"] for r in legacy.collect()}

        schema = "doc_id long, ts timestamp, text string"
        src = str(tmp_path / "src")
        spark.createDataFrame(
            [(1, base + timedelta(hours=1), "q1 q2 q3 q4 q5 q6")], schema
        ).coalesce(1).write.parquet(src)
        q = streaming_dup_span_filter(
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src),
            "text",
            "doc_id",
            "ts",
            store_dir=store,
            checkpoint_dir=str(tmp_path / "ck"),
            sink=lambda df, bid: df.count(),
            k=5,
            trigger_available_now=True,
            store_buckets=32,
        )
        q.awaitTermination(300)
        migrated = BucketedSnapshotDataset(spark, store, n_buckets=32)
        got = {r["gkey"] for r in migrated.read().select("gkey").collect()}
        assert legacy_keys <= got  # legacy state survived the migration
        assert len(got) > len(legacy_keys)  # new batch's spans folded in
        # restart with a DIFFERENT bucket count: persisted layout wins
        src2 = str(tmp_path / "src2")
        spark.createDataFrame(
            [(2, base + timedelta(hours=2), "r1 r2 r3 r4 r5 r6")], schema
        ).coalesce(1).write.parquet(src2)
        q2 = streaming_dup_span_filter(
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src2),
            "text",
            "doc_id",
            "ts",
            store_dir=store,
            checkpoint_dir=str(tmp_path / "ck2"),
            sink=lambda df, bid: df.count(),
            k=5,
            trigger_available_now=True,
            store_buckets=999,  # mismatched on purpose
        )
        q2.awaitTermination(300)
        assert migrated._load_layout()["n_buckets"] == 32
