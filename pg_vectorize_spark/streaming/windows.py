"""Streaming windowed + stateful operators.

The reference has no stream processor (SURVEY.md §2.9 R9 — its only
incremental semantics is freshness scanning), so these are Spark-native
extensions for the training-data/event side of the engine:

- ``windowed_event_counts`` — event-time tumbling windows with a watermark:
  the canonical late-data-tolerant aggregation. Works on both batch and
  streaming DataFrames (same code path — run it over ``readStream`` for the
  realtime counts, over ``read`` for the backfill; results agree, which is
  what tests assert).
- ``sessionize_stateful`` — per-key session building with
  ``applyInPandasWithState``: custom state (open session start/end/count)
  with a processing-time timeout closing idle sessions. This is the pattern
  the built-in window functions can't express incrementally (session extent
  depends on arbitrary gaps), i.e. the documented use-case for stateful
  custom operators.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)


def _ts_lb_path(store_dir: str) -> str:
    import os

    return os.path.join(store_dir, "_TS_LB")


def _ts_lb_load(store_dir: str):
    """Conservative LOWER BOUND on the span store's minimum first-seen
    ts (underscore sidecar, invisible to the parquet reader). Bound
    maintenance is O(1) per batch: folds lower it to the batch min,
    expiry raises it to the cutoff (survivors are all >= cutoff). A
    missing/unreadable sidecar means 'unknown' — callers must scan."""
    import datetime as _dt
    import json

    try:
        with open(_ts_lb_path(store_dir)) as f:
            d = json.load(f)
    except (OSError, ValueError):
        return None
    if d.get("type") == "dt":
        try:
            return _dt.datetime.fromisoformat(d["v"])
        except ValueError:
            return None
    return d.get("v")


def _ts_lb_set(store_dir: str, value) -> None:
    import datetime as _dt
    import json
    import os

    if value is None:
        return
    os.makedirs(store_dir, exist_ok=True)
    if isinstance(value, _dt.datetime):
        d = {"type": "dt", "v": value.isoformat()}
    else:
        d = {"type": "num", "v": value}
    with open(_ts_lb_path(store_dir), "w") as f:
        json.dump(d, f)


def _ts_lb_update(store_dir: str, batch_min) -> None:
    """Lower the bound to include a just-folded batch's min ts."""
    if batch_min is None:
        return
    cur = _ts_lb_load(store_dir)
    if cur is None or batch_min < cur:
        _ts_lb_set(store_dir, batch_min)


def windowed_event_counts(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window counts+sums with late-data watermark.

    On a streaming frame the watermark bounds state (windows older than the
    mark are finalized and dropped); on a batch frame ``withWatermark`` is a
    no-op, so the same function serves backfill and verification.
    """
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(
            F.window(F.col(ts_col), window)["start"].alias("window_start"),
            F.col(key_col),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)"))
            .cast("double")
            .alias("sum_value"),
        )
    )


SESSION_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
        StructField("n_events", LongType()),
    ]
)

SESSION_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
    ]
)


def _session_fn(gap_us: int, idle_timeout_ms: int | None):
    def update(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        closed: list[tuple[int, int, int]] = []
        if state.hasTimedOut:
            if state.exists:
                s, e, n = state.get
                closed.append((s, e, n))
                state.remove()
        else:
            ts_list: list[int] = []
            for pdf in pdfs:
                ts_list.extend(
                    int(t.value) // 1000  # pandas ns -> us
                    for t in pd.to_datetime(pdf["ts"])
                )
            ts_list.sort()
            if state.exists:
                cur_s, cur_e, cur_n = state.get
            else:
                cur_s = cur_e = cur_n = None
            for us in ts_list:
                if cur_s is None:
                    cur_s, cur_e, cur_n = us, us, 1
                elif us - cur_e > gap_us:
                    closed.append((cur_s, cur_e, cur_n))
                    cur_s, cur_e, cur_n = us, us, 1
                else:
                    cur_e = us
                    cur_n += 1
            if cur_s is not None:
                state.update((cur_s, cur_e, cur_n))
                if idle_timeout_ms is not None:
                    state.setTimeoutDuration(idle_timeout_ms)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [
                        pd.Timestamp(s, unit="us") for s, _, _ in closed
                    ],
                    "session_end": [
                        pd.Timestamp(e, unit="us") for _, e, _ in closed
                    ],
                    "n_events": [n for _, _, n in closed],
                }
            )

    return update


def sessionize_stateful(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    idle_timeout_ms: int | None = None,
) -> DataFrame:
    """Custom stateful sessionization (applyInPandasWithState).

    Emits CLOSED sessions: a session closes when a later event for the same
    user arrives more than ``gap_seconds`` after it, or — when
    ``idle_timeout_ms`` is set — when the state times out with no new data.
    The open session per user lives in the state store (bounded by user
    cardinality, checkpointed, recoverable).

    Leave ``idle_timeout_ms`` unset for Trigger.AvailableNow backfills: with
    a processing-time timeout registered, an availableNow run keeps cycling
    micro-batches until every timeout fires (minutes of idle looping for a
    finite input). Set it on continuous streams so idle sessions flush.
    """
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return (
        df.select(F.col(user_col).alias("user_id"), F.col(ts_col).alias("ts"))
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn(gap_seconds * 1_000_000, idle_timeout_ms),
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=timeout,
        )
    )


def streaming_dedup(
    df: DataFrame,
    content_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
    by_fingerprint: bool = True,
) -> DataFrame:
    """Streaming exact dedup: keep the first arrival of each content value,
    bounding state with an event-time watermark.

    A batch corpus dedups with a groupBy (operators/dedup.exact_dedup); an
    ingest STREAM can't — the duplicate may arrive hours later, and
    unbounded `dropDuplicates` state grows forever at 100-TB ingest rates.
    `dropDuplicatesWithinWatermark` keeps a key's state only until the
    watermark passes it: duplicates arriving within the watermark window
    are dropped, state is evicted after, which is the documented
    late-data-bounded dedup pattern for Structured Streaming.

    ``by_fingerprint`` dedups on the polynomial content fingerprint
    (functions/text.fingerprint_expr) instead of the raw text — the same
    key the incremental embed pipeline's column-diff guard uses, so an
    ingest stream and the re-embed change scan agree on what "unchanged"
    means. Works on batch frames too (falls back to dropDuplicates
    semantics over the full frame) — tests assert batch/stream agreement.
    """
    from pg_vectorize_spark.functions.text import fingerprint_expr

    key = "_content_fp" if by_fingerprint else content_col
    out = df
    if by_fingerprint:
        out = out.withColumn(
            "_content_fp", fingerprint_expr(F.col(content_col))
        )
    if out.isStreaming:
        deduped = out.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            [key]
        )
    else:
        deduped = out.dropDuplicates([key])
    return deduped.drop("_content_fp") if by_fingerprint else deduped


def streaming_asof_enrich(
    stream_df: DataFrame,
    dim_df,
    on,
    left_ts: str,
    checkpoint_dir: str,
    sink,
    right_cols=None,
    tolerance_seconds: float | None = None,
    right_tie: str | None = None,
    query_name: str | None = None,
    trigger_available_now: bool = False,
):
    """Point-in-time stream enrichment: each event picks up the latest
    dimension version effective at its EVENT time (operators/asof.asof_join
    per micro-batch) — the feature-store lookup with no future leakage.

    Why foreachBatch: the as-of window (non-time partitionBy) is not a
    supported streaming operator, and stream-static joins are equi-only.
    Per-batch is semantically exact here because enrichment is stateless
    across events — each event's match depends only on (event, dimension
    table), never on other events, so micro-batch boundaries are invisible
    in the result (asserted stream==batch in tests).

    ``dim_df`` is a DataFrame or a zero-arg callable re-evaluated every
    batch (pass a callable to re-read a slowly-changing snapshot so
    mid-stream dimension updates take effect at the next batch).
    ``sink(enriched_df, batch_id)`` receives each enriched micro-batch.
    """
    from pg_vectorize_spark.operators.asof import asof_join

    def _batch(batch_df: DataFrame, batch_id: int) -> None:
        dims = dim_df() if callable(dim_df) else dim_df
        enriched = asof_join(
            batch_df,
            dims,
            on=on,
            left_ts=left_ts,
            right_cols=right_cols,
            tolerance_seconds=tolerance_seconds,
            right_tie=right_tie,
        )
        sink(enriched, batch_id)

    writer = stream_df.writeStream.foreachBatch(_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if query_name:
        writer = writer.queryName(query_name)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_dup_span_filter(
    stream_df: DataFrame,
    text_col: str,
    pkey: str,
    ts_col: str,
    store_dir: str,
    checkpoint_dir: str,
    sink,
    k: int = 20,
    max_fraction: float = 0.5,
    watermark_seconds: float | None = None,
    hash_ngrams: bool = True,
    query_name: str | None = None,
    trigger_available_now: bool = False,
    store_buckets: int = 64,
):
    """Ingest-time exact-substring contamination filter (VERDICT r3 #8 /
    r4 #3): the streaming analog of ``CorpusPipeline.filter_dup_spans``.
    Documents whose k-word windows duplicate spans already seen in
    EARLIER-arriving documents beyond ``max_fraction`` are dropped at
    ingest, instead of only in batch re-passes.

    Semantics are the arrival-order rule
    (operators/dedup.arrival_order_span_stats): the first bearer of a
    span passes; later bearers accumulate dup_fraction. Arrival order is
    PROCESSING order across batches (span keys in the store always
    outrank the incoming batch — an already-emitted document cannot
    retroactively become the duplicate) and event time ``(ts, pkey)``
    within a batch. For a feed delivered in event-time order the result
    is therefore independent of how it is split into micro-batches
    (stream == batch agreement, asserted in tests); a LATE-arriving copy
    is the one dropped, whatever its event time says.

    Why foreachBatch (not chained stateful built-ins): the per-doc dup
    FRACTION needs every window of a doc compared against global seen
    state, then aggregated per doc — a dropDuplicatesWithinWatermark →
    groupBy chain would only emit doc verdicts after the watermark
    closes, delaying ingest by the full watermark. Documents arrive
    whole in one batch, so the per-doc aggregate is batch-local and
    exact; only the SEEN-SPAN SET is cross-batch state, held in a
    hash-BUCKETED snapshot of (gkey, ts) rows — 16 bytes per distinct
    span with ``hash_ngrams``, keyed on gkey in ``store_buckets``
    buckets (BucketedSnapshotDataset), so each batch's fold rewrites
    ONLY the buckets its new spans land in and hard-links the rest —
    O(batch · store/n_buckets) write amplification instead of the full
    store per micro-batch (VERDICT r5 #7).

    ``watermark_seconds`` bounds that store: span keys whose first-seen
    ts falls behind (max ts seen - watermark) are pruned each batch via
    a bucket-local keyed delete, the same state-bounding contract as
    ``streaming_dedup``. Unset, the store grows with distinct-span
    cardinality (fine for bounded corpora; set it for unbounded feeds).

    Scale shape per batch: the batch's exploded windows (batch-sized)
    rank against the store via one keyed window on gkey; the store fold
    is an insert of keys whose first-seen ts improved (usually only the
    UNSEEN spans — arrival order means existing keys already hold an
    earlier-or-equal ts), merged into the affected buckets only.

    ``sink(kept_df, batch_id)`` receives the surviving documents with
    their dup stats attached (n_windows, n_dup_windows, dup_fraction).
    """
    from pg_vectorize_spark.operators.dedup import arrival_order_span_stats
    from pg_vectorize_spark.sources.parquet_snapshot import (
        BucketedSnapshotDataset,
    )

    from pg_vectorize_spark.operators.dedup import span_instances

    def _open_store(spark) -> BucketedSnapshotDataset:
        """The ON-DISK layout is authoritative: a deployment restarted
        with a different ``store_buckets`` must keep merging with the
        persisted modulus, not brick on a mismatch."""
        store = BucketedSnapshotDataset(
            spark, store_dir, n_buckets=store_buckets
        )
        layout = store._load_layout()
        if (
            layout is not None
            and layout.get("n_buckets") != store.n_buckets
        ):
            store = BucketedSnapshotDataset(
                spark, store_dir, n_buckets=layout["n_buckets"]
            )
        return store

    # one-time, crash-safe migration of a span store written by the
    # pre-bucketed version of this filter (full rewrite; every later
    # fold is bucket-local)
    _open_store(stream_df.sparkSession).migrate_from_unbucketed("gkey")

    def _batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        store = _open_store(spark)
        prior = store.read().select("gkey", "ts") if store.exists() else None
        # tokenize+explode once (the dominant cost); the stats pass and
        # the store fold both consume the materialized instance frame
        inst = span_instances(
            batch_df, text_col, pkey, ts_col, k, hash_ngrams
        ).localCheckpoint()
        stats = arrival_order_span_stats(
            batch_df,
            text_col,
            pkey,
            ts_col,
            k=k,
            hash_ngrams=hash_ngrams,
            prior_windows=prior,
            instances=inst,
        ).localCheckpoint()
        keep = stats.filter(F.col("dup_fraction") <= max_fraction)
        kept = batch_df.join(
            keep.select(pkey, "n_windows", "n_dup_windows", "dup_fraction"),
            pkey,
            "inner",
        )
        sink(kept, batch_id)

        # fold this batch's spans into the store, bucket-locally: the
        # semantics are still "min first-seen ts per gkey across
        # (prior ∪ batch)", but only keys whose min CHANGED (new spans,
        # plus late arrivals with an earlier event ts) are upserted —
        # so the rewrite touches O(changed-key buckets), not the store
        batch_wins = (
            inst.select("gkey", F.col("_ts").alias("ts"))
            .groupBy("gkey")
            .agg(F.min("ts").alias("ts"))
            .localCheckpoint()
        )
        # one tiny agg over the batch-sized wins frame maintains the
        # store's min-ts LOWER BOUND sidecar, letting the expiry below
        # skip its full-store scan when nothing can have expired
        brow = batch_wins.agg(F.min("ts").alias("m")).first()
        if prior is None:
            store.write_full(batch_wins, "gkey")
            _ts_lb_update(store_dir, brow["m"])
        else:
            improved = (
                batch_wins.join(
                    prior.withColumnRenamed("ts", "_prior_ts"),
                    "gkey",
                    "left",
                )
                .filter(
                    F.col("_prior_ts").isNull()
                    | (F.col("ts") < F.col("_prior_ts"))
                )
                .select("gkey", "ts")
                .localCheckpoint()
            )
            if improved.head(1):
                store.merge_upsert(improved, "gkey")
                _ts_lb_update(store_dir, brow["m"])
        if watermark_seconds is not None:
            horizon_row = (
                batch_df.agg(F.max(F.col(ts_col)).alias("m")).first()
            )
            horizon = horizon_row["m"]
            if horizon is not None:
                import datetime as _dt

                cutoff = (
                    horizon - _dt.timedelta(seconds=watermark_seconds)
                    if isinstance(horizon, _dt.datetime)
                    else horizon - watermark_seconds
                )
                # skip the expiry scan entirely when the sidecar lower
                # bound proves no stored span can be older than the
                # cutoff — the steady-state (nothing expired) cost is
                # then one file read, not a full-store scan per batch
                lb = _ts_lb_load(store_dir)
                if lb is None or lb < cutoff:
                    # bucket-local delete of expired span keys
                    expired = (
                        store.read()
                        .filter(F.col("ts") < F.lit(cutoff))
                        .select("gkey")
                        .localCheckpoint()
                    )
                    if expired.head(1):
                        store.delete_keys(expired, "gkey")
                    # every surviving ts is >= cutoff: raise the bound
                    _ts_lb_set(store_dir, cutoff)

    writer = stream_df.writeStream.foreachBatch(_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if query_name:
        writer = writer.queryName(query_name)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
