"""Realtime incremental pipeline — Structured Streaming over the source.

The reference's realtime mode is: statement-level triggers collect changed
pkeys -> pgmq message {job_name, record_ids} -> worker polls, re-fetches
rows, embeds, upserts (core/src/query.rs:448-537; worker/src/executor.rs).

Spark-native redesign (SURVEY.md §2.9): the queue disappears — Structured
Streaming micro-batches ARE the batching (R3), and checkpointing gives the
redelivery/visibility-timeout semantics (R5). A file-source stream watches
the source directory; each micro-batch runs the same per-batch pipeline as
the batch path via ``foreachBatch``:

- job lookup per batch; a deleted job drops the batch (the reference's
  drop-message rule, worker/src/executor.rs:66-86);
- update-diff guard (R2): rows whose content concat is UNCHANGED vs the
  current embeddings' source fingerprint are skipped — the trigger-level
  ``OLD IS DISTINCT FROM NEW`` check re-expressed as a fingerprint compare
  (we keep a content fingerprint column in the embeddings dataset for this);
- embed + merge-upsert + token refresh.

Cron mode (R6) is the same per-batch function invoked by an external
scheduler through ``VectorizeSession.scan_job`` or a
``Trigger.AvailableNow`` run of this stream.

Deletes: a file stream is append-only, so source-row deletion cannot
arrive as a micro-batch (the reference sees deletes via the FK ``ON
DELETE CASCADE``, core/src/query.rs:349-354). The cascade hook on a lake
is ``VectorizeSession.cleanup_orphans`` — run inside every
``scan_job``/cron cycle (and callable standalone), it anti-join-prunes
embeddings/tokens whose pkey left the source snapshot. Realtime
deployments that also delete should schedule a periodic scan cycle
alongside the stream, which is exactly the reference's
trigger+cron-coexistence deployment.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from pg_vectorize_spark.engine import VectorizeSession
from pg_vectorize_spark.functions.text import fingerprint_expr, tokens_expr
from pg_vectorize_spark.operators.change import concat_source_columns


class RealtimePipeline:
    def __init__(
        self,
        session: VectorizeSession,
        job_name: str,
        checkpoint_dir: str | None = None,
        max_files_per_trigger: int | None = None,
    ):
        self.session = session
        self.job_name = job_name
        self.checkpoint_dir = checkpoint_dir or os.path.join(
            session.workspace, "jobs", job_name, "_checkpoint"
        )
        self.max_files_per_trigger = max_files_per_trigger

    # -- the per-micro-batch pipeline (shared with cron mode) ---------------

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        sess = self.session
        # job lookup per batch — job deleted => drop the batch
        sess.catalog.refresh()
        if not sess.catalog.exists(self.job_name):
            return
        job = sess.catalog.get(self.job_name)
        pkey = job.primary_key
        content = concat_source_columns(job.src_columns)

        # R2 diff guard: skip rows whose content fingerprint is unchanged
        changed = batch_df
        emb_ds = sess._emb_ds(self.job_name)
        if emb_ds.exists():
            cur = emb_ds.read()
            if "content_fp" in cur.columns:
                unchanged = cur.select(F.col(pkey), F.col("content_fp"))
                changed = (
                    batch_df.withColumn(
                        "content_fp", fingerprint_expr(content)
                    )
                    .join(unchanged, [pkey, "content_fp"], "left_anti")
                    .drop("content_fp")
                )

        if changed.isEmpty():
            return
        # shared embed stage (api-key chain + request cap + checkpoint)
        embedded = sess._embed_changed(job, changed, api_key=None)
        emb_ds.merge_upsert(embedded, pkey)
        tokens = batch_df.select(
            F.col(pkey), tokens_expr(content).alias("search_tokens")
        ).withColumn("updated_at", F.current_timestamp())
        sess._tok_ds(self.job_name).merge_upsert(tokens, pkey)

    # -- stream wiring -------------------------------------------------------

    def start(
        self,
        source_dir: str | None = None,
        schema=None,
        available_now: bool = False,
    ) -> StreamingQuery:
        """Start the realtime stream over a parquet file source.

        ``available_now=True`` gives the cron/backfill one-shot run (R6).
        """
        sess = self.session
        # only consult the catalog when the caller didn't pin a source — the
        # stream itself must keep running across job deletion (the per-batch
        # lookup handles the drop rule)
        src_dir = source_dir or sess.catalog.get(self.job_name).src_path
        if schema is None:
            schema = sess.spark.read.parquet(src_dir).schema
        reader = (
            sess.spark.readStream.schema(schema)
            .option("latestFirst", "false")
        )
        if self.max_files_per_trigger:
            reader = reader.option(
                "maxFilesPerTrigger", self.max_files_per_trigger
            )
        stream = reader.parquet(src_dir)
        writer = (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", self.checkpoint_dir)
            .outputMode("update")
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()
