"""VectorizeSession — the engine's user-facing API (parity surface).

One class covering the reference's SQL + HTTP surface (SURVEY.md §2.10):

| reference                           | here                            |
|-------------------------------------|---------------------------------|
| vectorize.table() / POST /table     | create_job()                    |
| vectorize.search() / GET /search    | search()                        |
| vectorize.hybrid_search()           | hybrid_search()                 |
| (fts branch of hybrid)              | full_text_search()              |
| vectorize.rag()                     | rag()                           |
| vectorize.encode/transform_embeddings | encode()                     |
| vectorize.generate()                | generate()                      |
| vectorize.chunk_text/chunk_table    | chunk_text()/chunk_table()      |
| vectorize.import_embeddings         | import_embeddings()             |
| vectorize.table_from()              | create_job_from()               |
| vectorize.job_execute / scan        | scan_job()                      |
| DELETE /table/{job}                 | delete_job()                    |
| <job>_view                          | job_view() (temp view)          |

Per-job artifacts live under ``<workspace>/jobs/<job>/``:
``embeddings/`` and ``search_tokens/`` snapshot datasets — the
``_embeddings_<job>`` / ``_search_tokens_<job>`` tables
(core/src/query.rs:322-357).
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pg_vectorize_spark.catalog import Catalog, JobRecord
from pg_vectorize_spark.config import DEFAULT_CONFIG, Config
from pg_vectorize_spark.errors import VectorizeError
from pg_vectorize_spark.filters import parse_filters
from pg_vectorize_spark.functions.text import fingerprint_expr
from pg_vectorize_spark.index_manager import INDEX_METHODS, JobIndexManager
from pg_vectorize_spark.operators.change import (
    concat_source_columns,
    detect_changes_join,
    detect_orphans,
    fetch_by_ids,
)
from pg_vectorize_spark.operators.chunk import (
    chunk_table_greedy,
    chunk_text_greedy,
)
from pg_vectorize_spark.operators.embed import embed_bulk_pandas
from pg_vectorize_spark.operators.search import (
    full_text_search as _fts_op,
)
from pg_vectorize_spark.operators.search import (
    hybrid_search as _hybrid_op,
)
from pg_vectorize_spark.operators.search import (
    semantic_search as _semantic_op,
)
from pg_vectorize_spark.providers.base import ChatProvider
from pg_vectorize_spark.providers.registry import (
    get_chat_provider,
    get_provider,
    model_dim,
    parse_model,
)
from pg_vectorize_spark.prompts import PromptRegistry
from pg_vectorize_spark.rag import RagResult, run_rag
from pg_vectorize_spark.sources.parquet_snapshot import SnapshotDataset
from pg_vectorize_spark.sources.reader import read_source
from pg_vectorize_spark.validate import check_input

def _run_parallel(*thunks):
    """Run independent maintenance thunks on driver threads and return
    their results in order, propagating the first exception (a failed
    write still fails the batch/scan and the caller retries it).

    Spark job submission is thread-safe and PySpark pins each Python
    thread to its own JVM thread; every thunk passed here writes to a
    thread-distinct dataset path, and concurrent READS of a snapshot
    another thread is merging are safe by the snapshot contract (writes
    land in a new version dir; the pointer flips last). The serial
    chain of per-batch maintenance jobs was the measured realtime
    latency floor (VERDICT r8 #1)."""
    if len(thunks) == 1:
        return [thunks[0]()]
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=len(thunks)) as ex:
        futures = [ex.submit(t) for t in thunks]
        return [f.result() for f in futures]


#: the reference's IndexDist enum values (core/src/types.rs:63-103) plus
#: the bare "cosine" this engine has always defaulted to in its catalog
VALID_INDEX_DIST_TYPES = {
    "pgv_hnsw_l2",
    "pgv_hnsw_ip",
    "pgv_hnsw_cosine",
    "vsc_diskann_cosine",
    "cosine",
}

#: the ingest-time quality gate's accepted keys (_curate_filter)
CURATE_KEYS = {
    "min_tokens",
    "max_tokens",
    "min_quality",
    "langs",
    "require_c4",
    "c4_min_sentences",
    "classifier_path",
    "classifier_min_prob",
}


class VectorizeSession:
    def __init__(
        self,
        spark: SparkSession,
        workspace: str | None = None,
        config: Config | None = None,
        chat_provider: ChatProvider | None = None,
        storage_buckets: int | None = None,
    ):
        self.spark = spark
        self.config = config or DEFAULT_CONFIG
        self.workspace = workspace or self.config.workspace_dir
        self.catalog = Catalog(self.workspace)
        self.prompts = PromptRegistry(self.workspace)
        self._chat = chat_provider
        #: opt-in hash-bucketed derived storage: merges/deletes rewrite
        #: only the buckets a batch touches (BucketedSnapshotDataset) —
        #: the configuration an incremental 100-TB deployment runs with;
        #: None keeps the single-snapshot layout (existing workspaces)
        self.storage_buckets = storage_buckets
        #: per-job validated analyzer stamps (ADVICE r12) — avoids a
        #: stamp-file read per search; invalidated on delete_job
        self._stamp_ok: dict[str, str] = {}

    # ------------------------------------------------------------------ io

    def _job_dir(self, job_name: str, kind: str) -> str:
        return os.path.join(self.workspace, "jobs", job_name, kind)

    def _ds(self, job_name: str, kind: str) -> SnapshotDataset:
        from pg_vectorize_spark.sources.parquet_snapshot import (
            BucketedSnapshotDataset,
        )

        root = self._job_dir(job_name, kind)
        if self.storage_buckets:
            return BucketedSnapshotDataset(
                self.spark, root, n_buckets=self.storage_buckets
            )
        return SnapshotDataset(self.spark, root)

    def _emb_ds(self, job_name: str) -> SnapshotDataset:
        return self._ds(job_name, "embeddings")

    def _tok_ds(self, job_name: str) -> SnapshotDataset:
        return self._ds(job_name, "search_tokens")

    def _source_df(self, job: JobRecord) -> DataFrame:
        return read_source(
            self.spark, job.src_path, getattr(job, "source_format", "auto")
        )

    # --------------------------------------------------------------- index

    def _index_mgr(self, job: JobRecord) -> JobIndexManager | None:
        """The job's persisted-index manager, or None for brute jobs —
        the reference's per-job HNSW/DiskANN index re-expressed as a
        cell/bucket-partitioned parquet dataset (index_manager.py)."""
        method = getattr(job, "index_method", "brute") or "brute"
        if method == "brute":
            return None
        return JobIndexManager(
            self.spark,
            self._job_dir(job.job_name, "index"),
            method,
            getattr(job, "index_params", None),
        )

    def build_index(self, job_name: str) -> None:
        """(Re)build the job's persisted index from the embeddings
        snapshot — the CREATE INDEX step of job creation
        (extension/src/init.rs:55-146), also the recovery path after a
        crash mid-maintenance."""
        job = self.catalog.get(job_name)
        mgr = self._index_mgr(job)
        if mgr is None:
            return
        emb = self._emb_ds(job_name)
        if not emb.exists():
            raise VectorizeError(
                f"job {job_name} has no embeddings yet — run scan_job first"
            )
        mgr.build(emb.read(), job.primary_key)

    def _index_upsert(
        self,
        job: JobRecord,
        emb_new: DataFrame,
        delete_keys_df: DataFrame | None = None,
    ) -> None:
        """Keep the persisted index fresh after an embeddings-snapshot
        merge (the Postgres-maintains-the-index-on-INSERT analog). The
        FIRST data an indexed job sees triggers the build (trains the
        quantizer on the just-merged snapshot), so every ingest path —
        batch scan, id-update, import, streaming micro-batch —
        bootstraps the index without a separate CREATE INDEX call.

        ``delete_keys_df`` folds the batch's delete cascade into the
        same maintenance transaction: the incremental path covers it in
        ``upsert``'s one delete pass, and the build/retrain paths cover
        it for free (they rebuild from the post-merge snapshot, which
        already excludes the deleted keys) — EVERY path here leaves the
        deletes applied, so callers never issue a separate
        ``_index_delete`` alongside."""
        mgr = self._index_mgr(job)
        if mgr is None:
            return
        if not mgr.exists():
            mgr.build(
                self._emb_ds(job.job_name).read(), job.primary_key
            )
            return
        if mgr.retrain_recommended():
            # the compaction-cadence drift observation crossed the
            # growth/skew thresholds: the frozen quantizer no longer
            # describes the corpus, so retrain from the just-merged
            # snapshot (which already holds emb_new) instead of filing
            # the batch into stale cells. build() resets the baseline
            # and clears the flag.
            mgr.build(
                self._emb_ds(job.job_name).read(), job.primary_key
            )
            return
        mgr.upsert(
            emb_new.select(job.primary_key, "embeddings"),
            job.primary_key,
            delete_keys_df=delete_keys_df,
        )

    def _index_delete(self, job: JobRecord, keys: DataFrame) -> None:
        mgr = self._index_mgr(job)
        if mgr is not None and mgr.exists():
            mgr.delete(keys.select(job.primary_key), job.primary_key)

    # ----------------------------------------------------------- fts index

    def _fts_mgr(self, job: JobRecord):
        """The job's persisted FTS postings index, or None when disabled
        — the reference's GIN index on the tsvector table
        (core/src/query.rs:242-252) re-expressed as a term-bucketed
        postings dataset (fts_index.py)."""
        if not getattr(job, "fts_index", True):
            return None
        from pg_vectorize_spark.fts_index import JobFtsIndexManager

        return JobFtsIndexManager(
            self.spark,
            self._job_dir(job.job_name, "fts_index"),
            getattr(job, "fts_params", None),
        )

    def _tokens_upsert(
        self,
        job: JobRecord,
        tokens_df: DataFrame,
        known_new_keys: bool = False,
        delete_keys_df: DataFrame | None = None,
    ) -> None:
        """Merge a batch of (pkey, search_tokens, ...) rows into the
        tokens snapshot AND keep the postings index fresh — the single
        token-refresh hook every ingest path (batch scan, id-update,
        streaming micro-batch) routes through, mirroring _index_upsert
        for vectors. The updated keys' OLD terms are captured from the
        pre-merge snapshot so the index rewrite knows its affected term
        buckets from batch-sized data alone.

        ``known_new_keys=True`` asserts no batch key exists in the
        derived datasets yet (the caller checked the embeddings snapshot
        — valid because every write path merges embeddings before
        tokens, so tokens keys ⊆ embeddings keys at rest): the
        old-terms capture and its emptiness probe are skipped and the
        postings write takes the pure-insert append fast path. A crash
        BETWEEN an embeddings delete and its tokens delete can break the
        subset invariant until the next rebuild — the index's standing
        crash-recovery contract (rebuild from the tokens snapshot)
        already covers that window.

        ``delete_keys_df`` folds an in-batch delete cascade into the
        SAME maintenance pass (the CDF micro-batch shape): the snapshot
        takes ONE combined merge+delete rewrite, and a single pre-merge
        capture serves both the update rewrite's old terms and the
        delete's bucket hint. Delete keys must be disjoint from
        ``tokens_df``'s keys (the CDF version-dedup guarantees it)."""
        self._write_analyzer_stamp(job)
        pkey = job.primary_key
        tok_ds = self._tok_ds(job.job_name)
        mgr = self._fts_mgr(job)
        fast = mgr is not None and mgr.fastupdate
        live = mgr is not None and mgr.exists() and tok_ds.exists()
        # a live overlay absorbs every maintenance route (updates,
        # inserts, deletes — fts_index overlay-era invariant) and never
        # consults old terms, so both captures are skipped while it is
        overlay = live and mgr._overlay_live()
        # a delete-carrying batch takes the FORCED coalesced overlay
        # transaction (VERDICT r10 #1): one tombstone write + one
        # pending write replace the eager add/upsert + near-full-index
        # delete rewrite, and neither side consults old terms — both
        # captures are skipped. Requires only a live index with data
        # (the same condition overlay_ingest(force=True) checks).
        coalesce = (
            live
            and delete_keys_df is not None
            and mgr._load_meta().get("has_data", True)
        )
        need_old = (
            live
            and not fast
            and not known_new_keys
            and not overlay
            and not coalesce
        )
        need_del_hint = (
            live
            and not fast
            and not overlay
            and not coalesce
            and delete_keys_df is not None
        )
        old = del_hint = None
        if need_old or need_del_hint:
            # ONE pre-merge capture: read_for_keys prunes the scan to
            # the batch keys' buckets on a bucketed snapshot (O(batch
            # buckets), the 100-TB shape); the plain layout falls back
            # to a full read. fastupdate never needs it — updates and
            # deletes land in the pending/tombstone overlay regardless
            # of the keys' old terms.
            cap_keys = None
            if need_old:
                cap_keys = tokens_df.select(pkey)
            if need_del_hint:
                dk = delete_keys_df.select(pkey)
                cap_keys = (
                    dk if cap_keys is None else cap_keys.unionByName(dk)
                )
            cap = (
                tok_ds.read_for_keys(cap_keys, pkey)
                .join(cap_keys, pkey, "left_semi")
                .select(pkey, "search_tokens")
                .localCheckpoint()
            )
            if need_old:
                old = cap.join(tokens_df.select(pkey), pkey, "left_semi")
            if need_del_hint:
                del_hint = cap.join(
                    delete_keys_df.select(pkey), pkey, "left_semi"
                )
        if mgr is None:
            tok_ds.merge_upsert(
                tokens_df, pkey, delete_keys_df=delete_keys_df
            )
            return
        if not mgr.exists():
            # first token merge bootstraps the index from the full
            # just-merged snapshot (the CREATE INDEX step of job init);
            # the post-merge snapshot already excludes the delete keys
            tok_ds.merge_upsert(
                tokens_df, pkey, delete_keys_df=delete_keys_df
            )
            mgr.build(
                tok_ds.read().select(pkey, "search_tokens"), pkey
            )
            return

        def snapshot_merge():
            tok_ds.merge_upsert(
                tokens_df, pkey, delete_keys_df=delete_keys_df
            )

        def index_maint():
            # all inputs (tokens checkpoint, capture) are pre-merge
            # materializations — nothing here reads the tokens snapshot,
            # so the index maintenance runs CONCURRENTLY with its merge
            new_toks = tokens_df.select(pkey, "search_tokens")
            if delete_keys_df is not None and mgr.overlay_ingest(
                new_toks, pkey, delete_keys_df, force=True
            ):
                # both sides landed in ONE coalesced overlay transaction
                return
            if fast:
                mgr.upsert(new_toks, pkey, None)
            elif old is None or not old.head(1):
                # pure inserts (no key existed pre-merge): one
                # partitioned postings APPEND — the hot path of a
                # realtime insert stream, with no bucket rewrite at all
                mgr.add(new_toks, pkey)
            else:
                mgr.upsert(new_toks, pkey, old)
            if delete_keys_df is not None:
                self._fts_delete(
                    job, delete_keys_df, old_tokens=del_hint
                )

        _run_parallel(snapshot_merge, index_maint)

    def _tokens_delete(self, job: JobRecord, keys: DataFrame) -> None:
        """Delete-only cascade for the tokens snapshot + postings index
        (the no-upserts micro-batch shape; with upserts present the
        cascade folds into ``_tokens_upsert``'s combined rewrite)."""
        pkey = job.primary_key
        tok_ds = self._tok_ds(job.job_name)
        hint = None
        if tok_ds.exists():
            # pre-delete token capture -> bucket-pruned postings delete
            hint = self._capture_tokens_for_keys(job, keys)
            tok_ds.delete_keys(keys, pkey)
        self._fts_delete(job, keys, old_tokens=hint)

    def _fts_delete(
        self,
        job: JobRecord,
        keys: DataFrame,
        old_tokens: DataFrame | None = None,
    ) -> None:
        """Cascade a key delete into the postings index. ``old_tokens``
        (the keys' PRE-delete tokens rows) lets the rewrite derive its
        affected term buckets from batch-sized data; without it the
        index is scanned to locate the keys' buckets."""
        mgr = self._fts_mgr(job)
        if mgr is None or not mgr.exists():
            return
        pkey = job.primary_key
        if old_tokens is not None:
            mgr.delete_with_tokens(
                keys.select(pkey), pkey, old_tokens
            )
        else:
            mgr.delete(keys.select(pkey), pkey)

    def _capture_tokens_for_keys(
        self, job: JobRecord, keys: DataFrame
    ) -> DataFrame | None:
        """The keys' current tokens rows, materialized — captured BEFORE
        a cascade deletes them, so _fts_delete can prune its rewrite.
        None when the job has no live postings index (no capture cost)."""
        mgr = self._fts_mgr(job)
        tok_ds = self._tok_ds(job.job_name)
        if mgr is None or not mgr.exists() or not tok_ds.exists():
            return None
        if mgr.fastupdate:
            # tombstone-based deletes never consult old terms
            return None
        pkey = job.primary_key
        return (
            tok_ds.read_for_keys(keys.select(pkey), pkey)
            .join(keys.select(pkey), pkey, "left_semi")
            .select(pkey, "search_tokens")
            .localCheckpoint()
        )

    # ------------------------------------------------ analyzer stamping

    def _analyzer_stamp_path(self, job_name: str) -> str:
        return os.path.join(
            self._job_dir(job_name, "search_tokens"), "_ANALYZER"
        )

    def _expected_analyzer_stamp(self, job: JobRecord) -> str:
        from pg_vectorize_spark.operators.search import (
            ANALYZER_SPEC_VERSIONS,
        )

        analyzer = self._job_analyzer(job)
        return f"{analyzer}@{ANALYZER_SPEC_VERSIONS[analyzer]}"

    def _write_analyzer_stamp(self, job: JobRecord) -> None:
        """Stamp the analyzer name + spec version into the token
        snapshot dir at build time (ADVICE r12). Raises BEFORE a merge
        would mix two analyzers' tokens in one snapshot. A PRE-EXISTING
        snapshot with no stamp file is legacy 'english@1' (same reading
        as _check_analyzer_stamp — review r13: stamping it with the
        current spec here would silently merge mixed-spec tokens, the
        exact state the guard refuses)."""
        path = self._analyzer_stamp_path(job.job_name)
        expected = self._expected_analyzer_stamp(job)
        if os.path.exists(path):
            with open(path) as fh:
                current = fh.read().strip()
        elif self._tok_ds(job.job_name).exists():
            current = "english@1"  # pre-stamping snapshots were english
        else:
            current = expected  # fresh snapshot — stamp and go
        if current != expected:
            raise VectorizeError(
                f"job {job.job_name!r}: token snapshot was built "
                f"under analyzer spec {current!r} but the job now "
                f"analyzes under {expected!r} — refusing to merge "
                "mixed-analyzer tokens. Re-ingest (delete_job + "
                "create_job, or drop the fts_params analyzer key "
                "back to the stamped one)."
            )
        if not os.path.exists(path):
            os.makedirs(os.path.dirname(path), exist_ok=True)
            with open(path, "w") as fh:
                fh.write(expected)

    def _check_analyzer_stamp(self, job: JobRecord) -> None:
        """Query-time guard (ADVICE r12): the stored token snapshot /
        postings must have been built under the job's CURRENT analyzer
        spec. A pre-stamping snapshot (no _ANALYZER file) is legacy
        'english@1' — fine for english jobs, a loud VectorizeError for
        anything else (pre-r12 catalogs silently ignored the fts_params
        analyzer key; pre-r13 'multilang' snapshots predate the
        Unicode spec bump). Validated stamps are cached per job."""
        expected = self._expected_analyzer_stamp(job)
        if self._stamp_ok.get(job.job_name) == expected:
            return
        if not self._tok_ds(job.job_name).exists():
            return  # nothing stored yet — inline analysis only
        path = self._analyzer_stamp_path(job.job_name)
        if os.path.exists(path):
            with open(path) as fh:
                current = fh.read().strip()
        else:
            current = "english@1"  # pre-stamping snapshots were english
        if current != expected:
            raise VectorizeError(
                f"job {job.job_name!r}: stored search tokens were built "
                f"under analyzer spec {current!r}; the job now analyzes "
                f"under {expected!r}. Queries would silently lose "
                "recall — re-ingest (delete_job + create_job) to "
                "rebuild the token snapshot and postings index."
            )
        self._stamp_ok[job.job_name] = expected

    @staticmethod
    def _job_analyzer(job: JobRecord) -> str:
        """The job's FTS analyzer (``fts_params={"analyzer": ...}``,
        default 'english' — reference parity: core/src/query.rs:233
        hardcodes to_tsvector('english')). 'multilang' (r12) dispatches
        per DOCUMENT by lang_id at token-build time and per QUERY by
        detect_lang — the multilingual-corpus configuration.

        Migration note: before r12 an analyzer key in fts_params was
        accepted but IGNORED (tokens were always built with 'english').
        A catalog from that era carrying the key must re-ingest
        (delete_job + create_job, or scan_job over a fresh workspace)
        or drop the key — the stored token snapshot and postings index
        were built under 'english' and queries now analyze under the
        configured name."""
        return (getattr(job, "fts_params", None) or {}).get(
            "analyzer", "english"
        )

    def _check_rank_analyzer(self, job: JobRecord, rank: str) -> None:
        """cover_density / bm25 re-derive per-word document scores with
        expression-analyzer assumptions; the UDF and per-language
        analyzers can't feed them — fail HERE with the job-level
        contract error instead of a ValueError deep in the operator
        (review r12)."""
        from pg_vectorize_spark.operators.search import (
            EXPRESSION_ANALYZERS,
        )

        analyzer = self._job_analyzer(job)
        if rank != "overlap" and analyzer not in EXPRESSION_ANALYZERS:
            raise VectorizeError(
                f"rank={rank!r} requires an expression analyzer "
                f"({EXPRESSION_ANALYZERS}); job "
                f"{job.job_name!r} is configured with "
                f"analyzer={analyzer!r} — use rank='overlap' for this "
                "job or create it with an expression analyzer"
            )

    def _fts_probe_scores(
        self, job: JobRecord, query: str
    ) -> DataFrame | None:
        """(pkey, fts_score) off the postings index for a query string,
        or None when the job has no built index — the planner-picks-
        the-GIN-index analog. Lossless: the probe's matched set and
        overlap scores equal the full tokens-snapshot scan's exactly
        (unlike the ANN probe there is no approximation to widen)."""
        mgr = self._fts_mgr(job)
        if mgr is None or not mgr.exists():
            return None
        from pg_vectorize_spark.operators.search import analyze_query_for

        return mgr.probe_scores(
            analyze_query_for(query, self._job_analyzer(job))
        )

    # ---------------------------------------------------------- dedup index

    def _dedup_mgr(self, job: JobRecord):
        """The job's persisted MinHash band index, or None when the job
        has no ``dedup_params`` — the opt-in ingest-time near-dup filter
        (dedup_index.py; beyond reference parity, a training-data-
        pipeline capability)."""
        params = dict(getattr(job, "dedup_params", None) or {})
        if not params:
            return None
        from pg_vectorize_spark.dedup_index import MinHashBandIndexManager

        params.pop("min_jaccard", None)
        return MinHashBandIndexManager(
            self.spark,
            self._job_dir(job.job_name, "dedup_index"),
            params,
        )

    def _dedup_threshold(self, job: JobRecord) -> float:
        return float(
            (getattr(job, "dedup_params", None) or {}).get(
                "min_jaccard", 0.7
            )
        )

    def _curate_filter(self, job: JobRecord, changed: DataFrame) -> DataFrame:
        """Opt-in ingest-time quality gate (``curate_params``; beyond
        reference parity — the batch curation operators applied at the
        ingest seam): per-row predicates over the SAME null-safe
        concatenated content the embed stage sees, so rows failing any
        enabled rule never reach the provider. An update that degrades a
        doc below the gate is skipped — the previous embedding stays (a
        quality gate should not ingest garbage revisions). Pure
        whole-stage-codegen expressions: zero shuffle, identical
        semantics on batch scans and streaming micro-batches. Explicit
        ``handle_update`` id lists bypass it, like the dedup filter —
        a named-id command is an intentional user action."""
        params = dict(getattr(job, "curate_params", None) or {})
        if not params:
            return changed
        from pg_vectorize_spark.functions.text import (
            c4_flags_exprs,
            lang_id_expr,
            quality_score_bound_expr,
            token_count_expr,
        )

        content = concat_source_columns(job.src_columns)
        out = changed
        if "min_tokens" in params:
            out = out.filter(
                token_count_expr(content) >= int(params["min_tokens"])
            )
        if "max_tokens" in params:
            out = out.filter(
                token_count_expr(content) <= int(params["max_tokens"])
            )
        if "min_quality" in params:
            # single-consumer filter context: bound-words variant
            # (bit-identical values, scripts/quality_bind_probe.py)
            out = out.filter(
                quality_score_bound_expr(content)
                >= float(params["min_quality"])
            )
        if "langs" in params:
            out = out.filter(
                lang_id_expr(content).isin(
                    [str(lang) for lang in params["langs"]]
                )
            )
        if params.get("require_c4"):
            flags = c4_flags_exprs(
                content,
                min_sentences=int(params.get("c4_min_sentences", 3)),
            )
            out = out.filter(flags["pass_c4"])
        if "classifier_path" in params:
            # trained linear quality model (operators/classify.py) at
            # the ingest seam: score the gate content, keep rows at or
            # above classifier_min_prob (hard threshold — the Pareto
            # lottery is a corpus-curation device; an ingest gate should
            # be deterministic per doc CONTENT, not per doc id). The
            # scorer is a per-row map against broadcast coefficients,
            # so the gate stays shuffle-free like the expression rules.
            model = self._load_gate_classifier(params["classifier_path"])
            thr = float(params.get("classifier_min_prob", 0.5))
            from pg_vectorize_spark.operators.classify import (
                model_text_col,
                score_quality,
            )

            # attach the model's input column directly and filter on the
            # score — a pure per-row map, evaluated once, with NO join
            # (ADVICE r10: the earlier self-derived semi-join broadcast
            # the batch's entire surviving key set — on run_initial_load
            # that is the whole table's keys, past Spark's broadcast
            # limit at target scale — and re-evaluated the upstream scan
            # twice). The model's tokenizer input column is fixed at
            # training time and may collide with a source column; the
            # collision is side-stepped by renaming the source column
            # for the scoring pass and restoring it after.
            gate_col = model_text_col(model)
            # ADVICE r11: the scoring pass writes BOTH the model's
            # input column AND the score column 'quality_prob' — a
            # source column by EITHER name would be clobbered by the
            # scoring withColumn and destroyed by the post-filter
            # drop. Rename every colliding source column out of the
            # way for the scoring pass and restore it after.
            renames: dict[str, str] = {}
            scored_in = out
            for clash in {gate_col, "quality_prob"}:
                if clash in out.columns:
                    renames[clash] = f"__gate_src_{clash}"
                    scored_in = scored_in.withColumnRenamed(
                        clash, renames[clash]
                    )
            gate_content = content
            if renames:
                gate_content = concat_source_columns(
                    [renames.get(c, c) for c in job.src_columns]
                )
            out = (
                score_quality(
                    model,
                    scored_in.withColumn(gate_col, gate_content),
                    gate_col,
                )
                .filter(F.col("quality_prob") >= thr)
                .drop("quality_prob", gate_col)
            )
            for orig, tmp in renames.items():
                out = out.withColumnRenamed(tmp, orig)
        return out

    def _load_gate_classifier(self, path: str):
        """Load-and-cache the gate's PipelineModel (one JVM-side load
        per session per path, not per micro-batch)."""
        cache = getattr(self, "_gate_classifiers", None)
        if cache is None:
            cache = self._gate_classifiers = {}
        if path not in cache:
            from pyspark.ml import PipelineModel

            cache[path] = PipelineModel.load(path)
        return cache[path]

    def _dedup_filter_new(
        self,
        job: JobRecord,
        changed: DataFrame,
        prior_keys: DataFrame | None = None,
    ) -> tuple[DataFrame, DataFrame | None]:
        """Drop the batch's NEW keys that near-duplicate an already-
        ingested document (estimated Jaccard >= min_jaccard against the
        job's band index). EXISTING keys always pass: an update that
        happens to converge on another doc must still apply, or the
        stored row would go permanently stale. In-batch duplicates are
        the batch operators' concern (dedup_minhash_lsh); this filter
        guards the ingested-corpus boundary, so a filtered row simply
        never enters any derived dataset — it stays 'changed' on later
        scans and is re-probed at batch-bounded cost.

        Returns ``(filtered, sigs)``: the batch's MinHash signatures
        are computed ONCE here (over all batch keys, checkpointed) and
        handed back for the SAME batch's ``_dedup_upsert`` — the probe,
        the within-batch check, and the maintenance merge otherwise
        each re-run the shingle min-agg shuffle on identical text
        (measured 3x the filter's latency cost at 200-row
        micro-batches). ``sigs`` is None for jobs with no dedup index.

        ``prior_keys`` (the EXACT set of batch keys already present in
        the embeddings snapshot, materialized by the caller) replaces
        this method's own snapshot read for the new-key split — the
        streaming path computes it once for the R2 diff guard and
        shares it here.

        Small batches (≤ ``dedup_params.local_max_rows``, default 8192,
        bigint/string keys) take the DRIVER-SIDE path instead
        (dedup_local module): the batch text is collected once, its
        signatures/band rows/buckets are computed in-process, and the
        probe shrinks to two pruned parquet reads — the r9 measurement
        showed the Spark machinery (signature min-agg shuffle, probe
        scheduling) dominating the ~6 s/batch filter cost at 200-row
        micro-batches. Oversized batches pay one wasted LIMIT collect
        and fall back to the shuffle path, which is the shape that
        amortizes at bulk sizes."""
        mgr = self._dedup_mgr(job)
        if mgr is None:
            return changed, None
        pkey = job.primary_key
        emb_ds = self._emb_ds(job.job_name)
        content = concat_source_columns(job.src_columns)
        thr = self._dedup_threshold(job)
        all_rows = changed.select(F.col(pkey), content.alias("_dedup_text"))

        if not mgr.exists() and emb_ds.exists():
            # dedup enabled on an already-populated job (or index lost):
            # without an index THIS batch's near-dups of pre-enablement
            # docs would sail through before the bootstrap heals the
            # index — rebuild from source∩snapshot BEFORE probing
            # (VERDICT r9 #4). A gone source returns False; the filter
            # then passes everything, and _dedup_upsert's bootstrap
            # branch warns.
            self.rebuild_dedup_index(job.job_name)

        from pg_vectorize_spark.dedup_local import LOCAL_KEY_TYPES

        params = getattr(job, "dedup_params", None) or {}
        local_max = int(params.get("local_max_rows", 8192))
        pkey_type = changed.schema[pkey].dataType.simpleString()
        if local_max > 0 and pkey_type in LOCAL_KEY_TYPES:
            head = all_rows.limit(local_max + 1).collect()
            if len(head) <= local_max:
                return self._dedup_filter_new_local(
                    job, changed, head, pkey_type, prior_keys
                )

        sigs = mgr.signatures(
            all_rows, pkey, "_dedup_text"
        ).localCheckpoint()
        if prior_keys is not None:
            new_rows = changed.join(prior_keys, pkey, "left_anti")
        elif emb_ds.exists():
            existing = emb_ds.read_for_keys(
                changed.select(pkey), pkey
            ).select(pkey)
            new_rows = changed.join(existing, pkey, "left_anti")
        else:
            new_rows = changed  # initial load: every row is new
        probe_in = new_rows.select(F.col(pkey), content.alias("_dedup_text"))
        flagged = None
        if mgr.exists() and emb_ds.exists():
            flagged = mgr.near_dup_keys(
                probe_in, pkey, "_dedup_text", min_jaccard=thr, sigs=sigs
            )
        if (getattr(job, "dedup_params", None) or {}).get("within_batch"):
            # in-batch complement (opt-in): a batch of mutual near-dups
            # would otherwise all pass (none is indexed yet — including
            # the entire initial load) — lowest key survives, same
            # banding/threshold as the index probe. Runs over ALL new
            # keys, so a near-dup of a corpus-flagged row is dropped
            # too (conservative corpus hygiene).
            wb = mgr.within_batch_dup_keys(
                probe_in, pkey, "_dedup_text", min_jaccard=thr, sigs=sigs
            )
            flagged = wb if flagged is None else flagged.unionByName(wb)
        if flagged is None:
            return changed, sigs
        return changed.join(flagged, pkey, "left_anti"), sigs

    def _dedup_filter_new_local(
        self,
        job: JobRecord,
        changed: DataFrame,
        head: list,
        pkey_type: str,
        prior_keys: DataFrame | None,
    ) -> tuple[DataFrame, "LocalSigs"]:
        """Driver-side complement of ``_dedup_filter_new`` for a batch
        already collected as ``head`` [(pkey, text)]: same drop set
        (property-tested against the Spark path), returned LocalSigs
        carries EXACTLY the surviving keys' signatures plus the
        survivors already present in the snapshot, so the downstream
        ``_dedup_upsert`` needs no narrowing semi-join and pure-insert
        batches skip the old-band-row lookup."""
        from pg_vectorize_spark.dedup_local import LocalSigs

        mgr = self._dedup_mgr(job)
        pkey = job.primary_key
        emb_ds = self._emb_ds(job.job_name)
        thr = self._dedup_threshold(job)
        sig_rows = mgr.signatures_local([(r[0], r[1]) for r in head])
        if prior_keys is not None:
            existing = {r[0] for r in prior_keys.select(pkey).collect()}
        elif emb_ds.exists() and head:
            keys_df = self.spark.createDataFrame(
                [(k,) for k, _ in sig_rows], f"{pkey} {pkey_type}"
            )
            existing = {
                r[0]
                for r in emb_ds.read_for_keys(keys_df, pkey)
                .join(F.broadcast(keys_df), pkey, "left_semi")
                .select(pkey)
                .collect()
            }
        else:
            existing = set()
        new_sigs = [(k, s) for k, s in sig_rows if k not in existing]
        flagged: set = set()
        if mgr.exists() and emb_ds.exists():
            flagged = mgr.near_dup_keys_local(
                new_sigs, pkey, pkey_type, min_jaccard=thr
            )
        if (getattr(job, "dedup_params", None) or {}).get("within_batch"):
            flagged |= mgr.within_batch_dup_keys_local(
                new_sigs, min_jaccard=thr
            )
        survivors = tuple(
            (k, s) for k, s in sig_rows if k not in flagged
        )
        sigs = LocalSigs(
            rows=survivors,
            prior_keys=frozenset(
                k for k, _ in survivors if k in existing
            ),
            pkey_type=pkey_type,
        )
        if not flagged:
            return changed, sigs
        flagged_df = self.spark.createDataFrame(
            [(k,) for k in sorted(flagged)], f"{pkey} {pkey_type}"
        )
        return (
            changed.join(F.broadcast(flagged_df), pkey, "left_anti"),
            sigs,
        )

    def _dedup_upsert(
        self,
        job: JobRecord,
        ingested: DataFrame,
        sigs: DataFrame | None = None,
        delete_keys_df: DataFrame | None = None,
    ) -> None:
        """Keep the band index fresh with the batch's survivors — the
        _index_upsert/_tokens_upsert analog, called from every ingest
        path. The first ingest bootstraps the index (build); later
        batches take the sidecar-derived partition-local upsert. Pass
        the SAME batch's ``_dedup_filter_new`` signatures as ``sigs``
        to skip recomputing them (the mgr narrows them to ``ingested``'s
        keys); paths that never ran the filter compute afresh.

        ``sigs`` may also be the filter's driver-side ``LocalSigs``
        (small-batch path): its rows are already exactly the batch's
        survivors — i.e. ``ingested``'s keys — so the established index
        takes ``upsert_local`` (no narrowing join, pure-insert batches
        skip the old-row lookup) and the bootstrap branch converts the
        same values to a DataFrame for ``build``.

        ``delete_keys_df`` (batch-bounded) folds the micro-batch's
        delete cascade into the same maintenance transaction: on the
        LocalSigs path it rides upsert_local's combined rewrite; on the
        DataFrame path it is applied as the separate ``delete()`` the
        caller would otherwise issue."""
        from pg_vectorize_spark.dedup_local import LocalSigs

        mgr = self._dedup_mgr(job)
        if mgr is None:
            return
        pkey = job.primary_key
        if isinstance(sigs, LocalSigs) and mgr.exists():
            del_keys: list | None = None
            if delete_keys_df is not None:
                cap = int(
                    (getattr(job, "dedup_params", None) or {}).get(
                        "local_max_rows", 8192
                    )
                )
                head = delete_keys_df.select(pkey).limit(cap + 1).collect()
                if len(head) <= cap:
                    del_keys = [r[0] for r in head]
            mgr.upsert_local(
                list(sigs.rows),
                pkey,
                sigs.pkey_type,
                prior_keys=sigs.prior_keys,
                delete_keys=del_keys,
            )
            if del_keys is None and delete_keys_df is not None:
                # oversized delete set: fall back to the general path
                self._dedup_delete(job, delete_keys_df)
            return
        content = concat_source_columns(job.src_columns)
        rows = ingested.select(F.col(pkey), content.alias("_dedup_text"))
        if isinstance(sigs, LocalSigs):
            sigs = mgr.sigs_df_from_local(
                list(sigs.rows), pkey, sigs.pkey_type
            )
        if not mgr.exists():
            # coverage check (once, at bootstrap): if the embeddings
            # snapshot already holds keys beyond this batch (index lost
            # to a crash after an earlier merge, or dedup_params enabled
            # on a populated job), a batch-only build would silently
            # never cover them and their near-dups pass forever. The
            # older keys' TEXT isn't in the derived datasets (join-mode
            # snapshots store none), but the catalog knows the SOURCE —
            # rebuild the index from source∩snapshot automatically
            # (VERDICT r9 #4); the warning remains only for a gone
            # source.
            emb_ds = self._emb_ds(job.job_name)
            if emb_ds.exists():
                uncovered = (
                    emb_ds.read()
                    .select(pkey)
                    .join(rows.select(pkey), pkey, "left_anti")
                    .head(1)
                )
                if uncovered:
                    if self.rebuild_dedup_index(
                        job.job_name, _extra_rows=rows
                    ):
                        return
                    import warnings

                    warnings.warn(
                        f"dedup index for job {job.job_name!r} is being "
                        "bootstrapped from a batch while the embeddings "
                        "snapshot already holds other keys, and the "
                        "source table is unreadable so a full rebuild "
                        "is impossible — the index will only cover "
                        "documents from this batch onward. Restore the "
                        "source and call rebuild_dedup_index() to close "
                        "the gap.",
                        stacklevel=2,
                    )
            mgr.build(rows, pkey, "_dedup_text", sigs=sigs)
        else:
            mgr.upsert(rows, pkey, "_dedup_text", sigs=sigs)
        if delete_keys_df is not None:
            self._dedup_delete(job, delete_keys_df)

    def _dedup_delete(self, job: JobRecord, keys: DataFrame) -> None:
        mgr = self._dedup_mgr(job)
        if mgr is not None and mgr.exists():
            mgr.delete(keys.select(job.primary_key), job.primary_key)

    def rebuild_dedup_index(
        self, job_name: str, _extra_rows: DataFrame | None = None
    ) -> bool:
        """(Re)build the job's near-dup band index from the full INGESTED
        corpus: the source table restricted to keys present in the
        embeddings snapshot (rows the filter dropped never entered the
        corpus, so they must not enter the index either). Heals the
        bootstrap coverage gap (VERDICT r9 #4): enabling ``dedup_params``
        on an already-populated job, or losing the index to a crash,
        otherwise leaves pre-existing documents unindexed and their
        near-dups pass forever. The engine has everything it needs — the
        catalog's ``src_path``/``src_columns`` and the snapshot's key
        set — so this is called automatically from the bootstrap branch
        of ``_dedup_upsert``; it is also a public repair API.

        ``_extra_rows`` ((pkey, _dedup_text), internal): the in-flight
        batch's rows, unioned in with precedence so the rebuild covers
        the batch even on a call path that runs before the snapshot
        merge. Returns False (no build) when the job has no dedup
        config, no ingested corpus, or the source is gone — the caller
        falls back to the batch-only build + warning."""
        job = self.catalog.get(job_name)
        mgr = self._dedup_mgr(job)
        emb_ds = self._emb_ds(job.job_name)
        if mgr is None or not emb_ds.exists():
            return False
        pkey = job.primary_key
        content = concat_source_columns(job.src_columns)
        try:
            # source gone/unreadable surfaces here (path resolution +
            # schema access are eager); build errors after this point
            # propagate — a half-built index must not be papered over
            # by the batch-only fallback
            src = self._source_df(job)
            src.schema
        except Exception:
            return False
        corpus = src.select(
            F.col(pkey), content.alias("_dedup_text")
        ).join(emb_ds.read().select(pkey), pkey, "left_semi")
        if _extra_rows is not None:
            corpus = corpus.join(
                _extra_rows.select(pkey), pkey, "left_anti"
            ).unionByName(_extra_rows.select(pkey, "_dedup_text"))
        mgr.build(corpus, pkey, "_dedup_text")
        return True

    # ----------------------------------------------------------- lifecycle

    def _embed_changed(
        self,
        job: JobRecord,
        changed: DataFrame,
        api_key: str | None,
        with_tokens: bool = False,
    ) -> DataFrame:
        """Shared embed stage for batch scan / id-update / streaming paths:
        concat content + fingerprint -> provider embedding (fingerprint
        rides the Arrow batch, no join-back) -> localCheckpoint so the
        count + merge (whose plan reads new_df twice) never re-run the
        provider calls. Output: (pkey, embeddings, content_fp, updated_at).

        ``with_tokens=True`` adds a ``search_tokens`` column computed in
        the SAME pass (it rides the Arrow batch like the fingerprint), so
        the downstream token refresh consumes this one checkpoint instead
        of re-running the change-detection lineage over the source — one
        materialization per batch feeds every maintenance write.
        """
        pkey = job.primary_key
        content = concat_source_columns(job.src_columns)
        cols = [
            F.col(pkey),
            content.alias("_content"),
            fingerprint_expr(content).alias("content_fp"),
        ]
        passthrough = ["content_fp"]
        if with_tokens:
            # the job's configured analyzer decides the stored token
            # shape (fts_params={"analyzer": ...}); queries analyze
            # with the same config, so match semantics hold end-to-end
            from pg_vectorize_spark.operators.search import (
                doc_tokens_for,
            )

            cols.append(
                doc_tokens_for(content, self._job_analyzer(job)).alias(
                    "search_tokens"
                )
            )
            passthrough.append("search_tokens")
        work = changed.select(*cols)
        provider = get_provider(
            job.model, api_key=self._resolve_api_key(job, api_key)
        )
        embedded = embed_bulk_pandas(
            work,
            "_content",
            pkey,
            provider=provider,
            request_cap=self.config.provider_request_cap,
            passthrough_cols=passthrough,
            # embed each distinct content once and join back — worth the
            # extra exchanges exactly when the provider is metered HTTP
            dedup_content=bool(
                (job.params or {}).get("embed_dedup_content", False)
            ),
        ).withColumn("updated_at", F.current_timestamp())
        return embedded.localCheckpoint()

    def create_job(
        self,
        job_name: str,
        src_path: str,
        columns: Sequence[str],
        primary_key: str,
        update_time_col: str | None = None,
        model: str | None = None,
        table_method: str = "join",
        schedule: str = "realtime",
        api_key: str | None = None,
        run_initial_load: bool = True,
        source_format: str = "auto",
        index_dist_type: str = "pgv_hnsw_cosine",
        index_method: str = "brute",
        index_params: dict | None = None,
        fts_index: bool = True,
        fts_params: dict | None = None,
        dedup_params: dict | None = None,
        curate_params: dict | None = None,
        embed_dedup_content: bool = False,
    ) -> JobRecord:
        """vectorize.table(): catalog row + dim discovery + initial load +
        tokens backfill + view registration (core/src/init.rs:122-269).

        ``index_dist_type`` mirrors the reference's IndexDist enum
        (core/src/types.rs:63-103): it selects the physical index the
        reference builds (HNSW l2/ip/cosine or DiskANN,
        core/src/query.rs:359-396) — the READ path always scores cosine
        (``1 - (embeddings <=> $1)``, core/src/query.rs:681) regardless,
        and so does this engine. Here the value is validated, recorded,
        and maps to the index layout choice (IVF cells / sign-bit buckets
        are the Spark-side index analogs; metric-variant scoring lives in
        operators/ann.py for direct use)."""
        if index_dist_type not in VALID_INDEX_DIST_TYPES:
            raise VectorizeError(
                f"Invalid value for IndexDist: {index_dist_type} "
                f"(valid: {sorted(VALID_INDEX_DIST_TYPES)})"
            )
        if index_method not in INDEX_METHODS:
            raise VectorizeError(
                f"Invalid index_method: {index_method} "
                f"(valid: {INDEX_METHODS})"
            )
        unknown = set(curate_params or {}) - CURATE_KEYS
        if unknown:
            raise VectorizeError(
                f"Unknown curate_params keys: {sorted(unknown)} "
                f"(valid: {sorted(CURATE_KEYS)})"
            )
        from pg_vectorize_spark.operators.search import ANALYZERS

        if (fts_params or {}).get("analyzer", "english") not in ANALYZERS:
            raise VectorizeError(
                f"Unknown fts_params analyzer: "
                f"{(fts_params or {}).get('analyzer')!r} "
                f"(valid: {ANALYZERS})"
            )
        # realtime is trigger-driven on the reference and requires the
        # separate embeddings table (search.rs:36-38 errors on append);
        # pinned by its test_realtime_append_fail
        if schedule == "realtime" and table_method != "join":
            raise VectorizeError(
                "realtime schedule is only compatible with the join table "
                "method"
            )
        model = model or self.config.default_transformer
        # env fallback applies to the dim probe too (there is no job record
        # yet, so resolve arg -> env directly)
        probe_key = api_key or os.environ.get("VECTORIZE_API_KEY")
        provider = get_provider(model, api_key=probe_key)
        dim = model_dim(parse_model(model), probe=provider)
        job = JobRecord(
            job_name=job_name,
            src_path=src_path,
            src_columns=list(columns),
            primary_key=primary_key,
            update_time_col=update_time_col,
            model=model,
            dim=dim,
            table_method=table_method,
            schedule=schedule,
            source_format=source_format,
            index_dist_type=index_dist_type,
            index_method=index_method,
            index_params=dict(index_params or {}),
            # the reference creates the GIN index on the tsvector table
            # at EVERY job init (core/src/query.rs:242-252), so the
            # postings index defaults on; fts_index=False opts out
            fts_index=fts_index,
            fts_params=dict(fts_params or {}),
            # opt-in ingest-time near-dup filter (dedup_index.py): non-
            # empty => NEW rows near-duplicating an ingested doc are
            # skipped by every ingest path (min_jaccard default 0.7)
            dedup_params=dict(dedup_params or {}),
            # opt-in ingest-time quality gate (_curate_filter): rows
            # failing any enabled per-row rule never reach the embed stage
            curate_params=dict(curate_params or {}),
            # persisted like the reference's JobParams.api_key
            # (core/src/types.rs:118-131) so scheduled scans resolve it via
            # the arg -> params -> env chain
            params={
                **({"api_key": api_key} if api_key else {}),
                # embed each distinct content once per batch and join the
                # vector back (operators/embed.py dedup_content) — the
                # metered-HTTP-provider cost lever
                **(
                    {"embed_dedup_content": True}
                    if embed_dedup_content
                    else {}
                ),
            },
        )
        self.catalog.create(job)
        if run_initial_load:
            # for an indexed job the initial scan's _index_upsert hook
            # performs the CREATE INDEX step (the reference builds HNSW
            # at job init, extension/src/init.rs:55-146); later ingest
            # cycles keep it fresh incrementally
            self.scan_job(job_name, api_key=api_key)
        self.job_view(job_name)
        return job

    def scan_job(self, job_name: str, api_key: str | None = None) -> int:
        """vectorize.job_execute(): change detection -> embed -> upsert ->
        token refresh (core/src/init.rs:272-315). Returns rows embedded.

        table_method='join' stores (pkey, embeddings, updated_at) in its own
        dataset (the _embeddings_<job> table); 'append' stores the full
        source row + embeddings in one wide snapshot (the add-columns-to-
        source analog, extension/src/init.rs:148-169).
        """
        job = self.catalog.get(job_name)
        src = self._source_df(job)
        emb_ds = self._emb_ds(job_name)
        pkey = job.primary_key

        if emb_ds.exists():
            changed = detect_changes_join(
                src, emb_ds.read(), pkey, job.update_time_col
            )
        else:
            changed = src
        # opt-in ingest-time quality gate, then the near-dup filter: rows
        # failing either never reach the embed stage
        changed = self._curate_filter(job, changed)
        changed, dedup_sigs = self._dedup_filter_new(job, changed)
        # search tokens ride the embed checkpoint (one source-lineage
        # materialization feeds every maintenance write below)
        embedded = self._embed_changed(job, changed, api_key, with_tokens=True)

        n = embedded.count()
        if n > 0:
            emb_payload = embedded.drop("search_tokens")
            if job.table_method == "append":
                wide = changed.join(emb_payload, pkey, "inner")
                emb_ds.merge_upsert(wide, pkey)
            else:
                emb_ds.merge_upsert(emb_payload, pkey)
            tokens = embedded.select(pkey, "search_tokens", "updated_at")
            # token snapshot merge + postings-index freshness in one hook
            self._tokens_upsert(job, tokens)
            # index freshness: the re-embedded rows move cells/buckets
            self._index_upsert(job, emb_payload)
            # near-dup index freshness with the batch's survivors
            self._dedup_upsert(job, changed, sigs=dedup_sigs)
        # ON DELETE CASCADE parity (core/src/query.rs:349-354): rows whose
        # source pkey disappeared must leave the derived datasets too, even
        # on a scan that embedded nothing — a delete-only cycle is exactly
        # when the cascade fires.
        self.cleanup_orphans(job_name, _src=src)
        return n

    def cleanup_orphans(
        self,
        job_name: str,
        _src: DataFrame | None = None,
        allow_full_delete: bool = False,
    ) -> int:
        """Prune embeddings/search-tokens rows whose source row was deleted
        — the explicit-anti-join form of the reference's ``FOREIGN KEY ...
        ON DELETE CASCADE`` (core/src/query.rs:349-354; behavior pinned by
        the realtime-relational-integrity test,
        extension/tests/integration_tests.rs:483-555).

        Runs inside every ``scan_job`` cycle and is callable standalone.
        Returns the number of orphan rows removed across both datasets.
        Each dataset only rewrites when it actually holds orphans, so the
        steady-state (no deletes) cost is one keyed anti-join count per
        dataset, no snapshot churn.

        Unlike the reference's transactional FK cascade, a lake source can
        be transiently empty mid-rewrite (concurrent ``mode('overwrite')``,
        a misconfigured path) — and an anti-join against that would wipe
        every derived row. Guard: when the orphan set covers the ENTIRE
        derived dataset AND the source read is suspicious (zero rows from
        a path with no data files — i.e. probably mid-rewrite or broken),
        refuse to delete unless ``allow_full_delete=True``. A readable
        source that is genuinely empty (catalog table truncated, or a path
        that still holds a schema-bearing empty file) or that holds an
        entirely NEW key set cascades normally, so a legitimate truncate
        converges instead of diverging forever (reference semantics: FK ON
        DELETE CASCADE always fires).
        """
        job = self.catalog.get(job_name)
        src = _src if _src is not None else self._source_df(job)
        pkey = job.primary_key
        src_keys = src.select(pkey)
        removed = 0
        full_delete_checked = False
        full_delete_ok = allow_full_delete
        emb_ds = self._emb_ds(job_name)
        for ds in (emb_ds, self._tok_ds(job_name)):
            if not ds.exists():
                continue
            # materialize the (typically tiny) orphan key set once: without
            # it, the count for the no-churn guard AND delete_keys each
            # re-run the source + snapshot scans and the anti-join
            orphans = (
                detect_orphans(ds.read(), src_keys, pkey)
                .select(pkey)
                .localCheckpoint()
            )
            n = orphans.count()
            if n:
                if not full_delete_ok and n >= ds.read().count():
                    if not full_delete_checked:
                        full_delete_ok = self._full_cascade_legitimate(
                            job, src
                        )
                        full_delete_checked = True
                    if not full_delete_ok:
                        import warnings

                        warnings.warn(
                            f"cleanup_orphans({job_name!r}): every derived "
                            f"row ({n}) is orphaned and the source read "
                            "looks broken (zero rows, no data files — "
                            "concurrent overwrite? bad path?). Refusing "
                            "the full delete; pass allow_full_delete=True "
                            "to override.",
                            stacklevel=2,
                        )
                        continue
                if ds is emb_ds:
                    ds.delete_keys(orphans, pkey)
                    # cascade reaches the persisted indexes too — a deleted
                    # source row must stop being findable or matchable
                    self._index_delete(job, orphans)
                    self._dedup_delete(job, orphans)
                else:
                    # capture the orphans' tokens BEFORE they leave the
                    # snapshot: their terms locate the postings buckets,
                    # sparing the index-scan fallback
                    hint = self._capture_tokens_for_keys(job, orphans)
                    ds.delete_keys(orphans, pkey)
                    self._fts_delete(job, orphans, old_tokens=hint)
                removed += n
        return removed

    def _full_cascade_legitimate(self, job, src: DataFrame) -> bool:
        """Decide whether a full-dataset orphan cascade reflects a real
        source state rather than a broken read. Legitimate when the source
        still has rows (complete key replacement), is a catalog table
        (readable+empty == truncated), or is a path that holds at least
        one data file (an intentional empty overwrite still writes a
        schema-bearing file; a mid-rewrite/missing path does not)."""
        import os

        if not src.isEmpty():
            return True
        fmt = getattr(job, "source_format", "auto") or "auto"
        path = job.src_path
        if fmt == "table":
            return True
        if "://" in path:
            # remote store (s3a/hdfs/abfss/...): os.path always says "no",
            # which would refuse every legitimate remote truncate — ask
            # the Hadoop FileSystem the same question instead
            return self._remote_path_has_data_files(path)
        if os.path.isfile(path):
            return True
        if os.path.isdir(path):
            return any(
                not f.startswith((".", "_")) for f in os.listdir(path)
            )
        return False

    def _remote_path_has_data_files(self, path: str) -> bool:
        """Hadoop-FS version of the data-file check for URI sources."""
        try:
            jvm = self.spark._jvm
            hpath = jvm.org.apache.hadoop.fs.Path(path)
            fs = hpath.getFileSystem(
                self.spark._jsc.hadoopConfiguration()
            )
            if not fs.exists(hpath):
                return False
            if fs.getFileStatus(hpath).isFile():
                return True
            for st in fs.listStatus(hpath):
                name = st.getPath().getName()
                if not name.startswith((".", "_")):
                    return True
            return False
        except Exception:
            return False  # unreadable == suspicious: refuse the cascade

    def handle_update(
        self, job_name: str, record_ids: list, api_key: str | None = None
    ) -> int:
        """_handle_table_update(): re-embed an explicit id list (S3 path,
        core/src/query.rs:466-502)."""
        job = self.catalog.get(job_name)
        src = self._source_df(job)
        pkey = job.primary_key
        rows = fetch_by_ids(src, pkey, record_ids)
        embedded = self._embed_changed(job, rows, api_key, with_tokens=True)
        n = embedded.count()
        if n:
            emb_payload = embedded.drop("search_tokens")
            self._emb_ds(job_name).merge_upsert(emb_payload, pkey)
            tokens = embedded.select(pkey, "search_tokens", "updated_at")
            self._tokens_upsert(job, tokens)
            self._index_upsert(job, emb_payload)
            # id-update refreshes signatures too (keys already ingested,
            # so the new-key filter doesn't apply — updates always land)
            self._dedup_upsert(job, rows)
        return n

    def delete_job(self, job_name: str) -> bool:
        """DELETE /table/{job}: drop artifacts + catalog row, idempotent
        best-effort (core/src/init.rs:317-395).

        Validates the identifier BEFORE any path construction — job_name
        reaches rmtree'd filesystem paths, so an unchecked '../..' segment
        would escape the workspace (validate.py invariant).
        """
        check_input(job_name)
        self._stamp_ok.pop(job_name, None)
        self._emb_ds(job_name).drop()
        self._tok_ds(job_name).drop()
        import shutil

        shutil.rmtree(self._job_dir(job_name, "index"), ignore_errors=True)
        shutil.rmtree(
            self._job_dir(job_name, "fts_index"), ignore_errors=True
        )
        shutil.rmtree(
            self._job_dir(job_name, "dedup_index"), ignore_errors=True
        )
        try:
            self.spark.catalog.dropTempView(f"{job_name}_view")
        except Exception:  # noqa: BLE001 — view may not exist
            pass
        return self.catalog.delete(job_name)

    def catalog_df(self, register_view: bool = True) -> DataFrame:
        """The job catalog as a DataFrame (``SELECT * FROM vectorize.job``
        analog); registered as the ``vectorize_jobs`` temp view."""
        jobs = [self.catalog.get(name) for name in self.catalog.list_jobs()]
        rows = [
            (
                j.job_name,
                j.src_path,
                j.src_columns,
                j.primary_key,
                j.update_time_col,
                j.model,
                j.dim,
                j.table_method,
                j.schedule,
                getattr(j, "index_method", "brute") or "brute",
                j.created_at,
            )
            for j in jobs
        ]
        df = self.spark.createDataFrame(
            rows,
            "job_name string, src_path string, src_columns array<string>, "
            "primary_key string, update_time_col string, model string, "
            "dim int, table_method string, schedule string, "
            "index_method string, created_at string",
        )
        if register_view:
            df.createOrReplaceTempView("vectorize_jobs")
        return df

    def maintain(self, job_name: str) -> dict:
        """Force maintenance on every persisted structure of a job — the
        VACUUM analog (the reference leans on Postgres autovacuum +
        index maintenance; here the same hygiene runs on the op-count
        cadence automatically, and THIS is the explicit off-peak knob):
        fold deferred deletes (band-index tombstones, postings
        pending/tombstone overlay) and compact small files on the ANN /
        postings / band indexes and the snapshot datasets. Returns the
        per-structure compaction counts. Deployments whose realtime
        batches cannot absorb a cadence-triggered fold (the p95 cost
        documented in SCALING.md) call this from a scheduler instead and
        raise ``compact_every``."""
        job = self.catalog.get(job_name)
        out: dict = {"job_name": job_name}
        mgr = self._index_mgr(job)
        if mgr is not None and mgr.exists():
            out["ann_index"] = mgr.maybe_compact(force=True)
        fts = self._fts_mgr(job)
        if fts is not None and fts.exists():
            out["postings_index"] = fts.maybe_compact(force=True)
        dd = self._dedup_mgr(job)
        if dd is not None and dd.exists():
            # full fold: maintain() is the off-peak knob — it must
            # leave zero pending tombstones, not a bounded slice
            out["band_index"] = dd.maybe_compact(
                force=True, full_fold=True
            )
        for kind in ("embeddings", "search_tokens"):
            ds = self._ds(job_name, kind)
            if ds.exists() and hasattr(ds, "compact"):
                v = ds.compact()
                if v is not None:
                    out[f"{kind}_snapshot_version"] = v
        return out

    def job_stats(self, job_name: str) -> dict:
        """Operational snapshot of one job — the observability view a
        100-TB deployment watches (the reference's vectorize.job +
        pg_stat machinery rolled into one call): snapshot sizes and
        versions, the ANN index's drift stats + retrain flag, and which
        auxiliary indexes are live. Row counts are metadata-cheap scans
        (parquet footers), the drift block is one per-cell count
        aggregate — an ops call, not a hot-path one."""
        job = self.catalog.get(job_name)
        out: dict = {
            "job_name": job_name,
            "table_method": job.table_method,
            "index_method": getattr(job, "index_method", "brute")
            or "brute",
            "schedule": job.schedule,
        }
        emb = self._emb_ds(job_name)
        out["embeddings"] = {
            "exists": emb.exists(),
            "rows": emb.read().count() if emb.exists() else 0,
            "version": emb.current_version(),
        }
        tok = self._tok_ds(job_name)
        out["tokens"] = {
            "exists": tok.exists(),
            "rows": tok.read().count() if tok.exists() else 0,
            "version": tok.current_version(),
        }
        mgr = self._index_mgr(job)
        if mgr is not None and mgr.exists():
            drift = mgr.drift_stats() or {}
            # JSON-safe: growth is inf when the build baseline is unknown
            drift = {
                k: (None if v == float("inf") else v)
                for k, v in drift.items()
            }
            out["ann_index"] = {
                "exists": True,
                "drift": drift,
                "retrain_recommended": mgr.retrain_recommended(),
            }
        else:
            out["ann_index"] = {"exists": False}
        fts = self._fts_mgr(job)
        out["fts_index"] = {
            "exists": bool(fts is not None and fts.exists())
        }
        if fts is not None and fts.exists():
            # deferred-maintenance state (r11): a live pending/tombstone
            # overlay means probes pay the bounded overlay overhead
            # until the next fold — the signal an operator watches to
            # decide whether to call maintain() off-peak
            out["fts_index"]["overlay_live"] = fts._overlay_live()
        dd = self._dedup_mgr(job)
        out["dedup_index"] = {
            "enabled": dd is not None,
            "has_data": bool(
                dd is not None
                and dd.exists()
                and dd._load_meta().get("has_data", True)
            ),
        }
        if dd is not None and dd.exists():
            st = dd._load_tomb_state()
            out["dedup_index"]["pending_tombstones"] = len(st["keys"])
            if st["gen_remaining"] is not None:
                # a sliced fold is mid-generation: this many band
                # buckets remain before the generation's keys leave
                # the anti-join set
                out["dedup_index"]["fold_pending_buckets"] = len(
                    st["gen_remaining"]
                )
            lf = dd.last_fold()
            if lf is not None:
                # last observed fold cost — the number a deployment
                # sizes compact_every / fold_bucket_cap against its
                # p95 budget (VERDICT r11 stretch #7)
                out["dedup_index"]["last_fold"] = lf
        return out

    def job_view(self, job_name: str) -> DataFrame:
        """<job>_view: source ⋈ embeddings (core/src/query.rs:311-320)."""
        job = self.catalog.get(job_name)
        src = self._source_df(job)
        emb = self._emb_ds(job_name)
        if not emb.exists():
            view = src
        elif job.table_method == "append":
            # wide snapshot already carries the source columns
            view = emb.read().withColumnRenamed(
                "updated_at", "embeddings_updated_at"
            )
        else:
            e = emb.read().withColumnRenamed(
                "updated_at", "embeddings_updated_at"
            )
            view = src.join(e, job.primary_key, "left")
        view.createOrReplaceTempView(f"{job_name}_view")
        return view

    # ------------------------------------------------------------- queries

    @staticmethod
    def _resolve_api_key(job: JobRecord, arg: str | None) -> str | None:
        """api-key resolution chain: call arg -> job params -> environment
        (extension/src/search.rs:387-392's arg -> params -> GUC order)."""
        if arg:
            return arg
        from_params = job.params.get("api_key") if job.params else None
        if from_params:
            return str(from_params)
        return os.environ.get("VECTORIZE_API_KEY")

    def _query_vec(self, job: JobRecord, query: str, api_key: str | None):
        provider = get_provider(
            job.model, api_key=self._resolve_api_key(job, api_key)
        )
        return provider.generate_embedding([query])[0]

    def _emb_candidates(
        self, job: JobRecord, query_vec, num_results: int | None = None
    ) -> DataFrame:
        """(pkey, embeddings) frame the semantic scorer runs over: the
        persisted index probe when the job has one (partition-pruned
        scan — the reference's planner picking the HNSW index,
        core/src/query.rs:359-396), else the full snapshot. ivf/signbit
        indexes carry the vectors, so candidates come straight off the
        pruned partitions; ivfpq returns candidate KEYS whose float
        vectors are semi-joined from the primary store (constant
        ``rerank_candidates`` rows) for the exact rerank.
        ``num_results`` auto-widens a too-thin probe so a top-k search
        never returns fewer than k rows just because the query landed
        in a sparse cell (the reference's HNSW yields k whenever the
        corpus has them)."""
        pkey = job.primary_key
        mgr = self._index_mgr(job)
        if mgr is not None and mgr.exists():
            cand = mgr.candidates(query_vec, min_rows=num_results)
            if "embeddings" in cand.columns:
                # vector-carrying probe (ivf/signbit): the snapshot read
                # is never consumed — don't build it (r13 optimization
                # round: each DataFrameReader.parquet costs ~0.1 s of
                # driver/py4j layout resolution per query)
                return cand.select(pkey, "embeddings")
            return (
                self._emb_ds(job.job_name)
                .read()
                .select(pkey, "embeddings")
                .join(cand.select(pkey), pkey, "left_semi")
            )
        return (
            self._emb_ds(job.job_name).read().select(pkey, "embeddings")
        )

    def search(
        self,
        job_name: str,
        query: str,
        num_results: int = 10,
        return_columns: Sequence[str] | None = None,
        filters: dict[str, str] | None = None,
        where_sql: str | None = None,
        api_key: str | None = None,
        diversify: float | None = None,
        diversify_pool: int = 50,
    ) -> list[dict]:
        """vectorize.search(): semantic top-k, JSON-shaped rows.

        ``diversify=lambda`` (0..1) MMR-reranks: fetch a
        ``diversify_pool``-sized relevance pool (after filters), then
        greedily trade relevance against similarity-to-already-selected
        (operators/search.mmr_rerank) down to ``num_results``. lambda=1
        is pure relevance; ~0.5-0.8 de-duplicates near-identical hits."""
        job = self.catalog.get(job_name)
        if not self._emb_ds(job_name).exists():
            raise VectorizeError(f"job {job_name} has no embeddings yet")
        qv = self._query_vec(job, query, api_key)
        pool = (
            max(num_results, diversify_pool)
            if diversify is not None
            else num_results
        )
        pk = job.primary_key
        # the MMR join-back needs the key; if the caller's projection
        # omits it, carry it through the pool internally and drop it
        # from the final rows (the non-diversify contract allows
        # pkey-less return_columns)
        drop_pk = (
            diversify is not None
            and return_columns is not None
            and pk not in return_columns
        )
        pool_columns = (
            [pk, *return_columns] if drop_pk else return_columns
        )
        df = _semantic_op(
            self._source_df(job),
            self._emb_candidates(job, qv, pool),
            pk,
            qv,
            num_results=pool,
            return_columns=pool_columns,
            filters=parse_filters(filters) if filters else None,
            where_sql=where_sql,
            pre_normalized=True,
        )
        if diversify is not None:
            from pg_vectorize_spark.operators.search import mmr_rerank

            # the snapshot's vector column joins under a reserved name:
            # the pool projection may itself carry an "embeddings"
            # column (return_columns includes it, or return_columns=None
            # on a source table that has one) and the bare join would
            # make the rerank's column reference ambiguous (ADVICE r10)
            with_vecs = df.join(
                self._emb_ds(job_name)
                .read()
                .select(
                    F.col(pk),
                    F.col("embeddings").alias("__mmr_vec"),
                ),
                pk,
            )
            mmr = mmr_rerank(
                with_vecs,
                pk,
                "__mmr_vec",
                "similarity_score",
                num_results,
                lambda_=diversify,
            )
            df = (
                df.drop("similarity_score")
                .join(mmr, pk)
                .orderBy("mmr_rank")
            )
            if drop_pk:
                df = df.drop(pk)
        return [r.asDict(recursive=True) for r in df.collect()]

    def full_text_search(
        self,
        job_name: str,
        query: str,
        num_results: int = 10,
        return_columns: Sequence[str] | None = None,
        filters: dict[str, str] | None = None,
        rank: str = "overlap",
    ) -> list[dict]:
        """``rank='cover_density'`` re-ranks by overlap + positional
        proximity (the ts_rank_cd analog); ``rank='bm25'`` by Okapi BM25
        (tf over the token multiset + corpus idf/avgdl). The stored tokens
        table serves the overlap branch in all modes; for cover_density and
        bm25 it also prunes the per-document re-scoring pass down to the
        matched documents (BM25's corpus stats stay global)."""
        job = self.catalog.get(job_name)
        self._check_rank_analyzer(job, rank)
        self._check_analyzer_stamp(job)
        tokens_df = (
            self._tok_ds(job_name).read()
            if self._tok_ds(job_name).exists()
            else None
        )
        df = _fts_op(
            self._source_df(job),
            job.primary_key,
            query,
            text_cols=job.src_columns,
            num_results=num_results,
            return_columns=return_columns,
            filters=parse_filters(filters) if filters else None,
            tokens_df=tokens_df,
            analyzer=self._job_analyzer(job),
            rank=rank,
            # postings-index probe when the job has one (the planner-
            # picks-the-GIN-index analog): replaces the full tokens-
            # snapshot arrays_overlap scan with a term-bucket-pruned
            # postings aggregate — identical matched set and scores
            fts_scored_df=self._fts_probe_scores(job, query),
        )
        return [r.asDict(recursive=True) for r in df.collect()]

    def hybrid_search(
        self,
        job_name: str,
        query: str,
        num_results: int = 10,
        window_size: int | None = None,
        rrf_k: int = 60,
        semantic_weight: float = 1.0,
        fts_weight: float = 1.0,
        return_columns: Sequence[str] | None = None,
        filters: dict[str, str] | None = None,
        where_sql: str | None = None,
        api_key: str | None = None,
        rank: str = "overlap",
        diversify: float | None = None,
        diversify_pool: int = 50,
    ) -> list[dict]:
        """vectorize.hybrid_search() — server-side RRF shape.

        ``rank='cover_density'`` scores the FTS branch with the positional
        ts_rank_cd analog (core/src/query.rs:764-776) instead of plain
        term overlap before the RRF fusion; ``rank='bm25'`` scores it with
        Okapi BM25 (multiset tf + corpus idf/avgdl).

        ``diversify=lambda`` MMR-reranks a ``diversify_pool``-sized fused
        pool down to ``num_results`` (same contract as ``search()``; RRF
        scores are min-max normalized inside the trade-off since they
        live near 1/rrf_k)."""
        job = self.catalog.get(job_name)
        self._check_rank_analyzer(job, rank)
        self._check_analyzer_stamp(job)
        if not self._emb_ds(job_name).exists():
            raise VectorizeError(f"job {job_name} has no embeddings yet")
        qv = self._query_vec(job, query, api_key)
        tokens_df = (
            self._tok_ds(job_name).read()
            if self._tok_ds(job_name).exists()
            else None
        )
        pk = job.primary_key
        pool = (
            max(num_results, diversify_pool)
            if diversify is not None
            else num_results
        )
        drop_pk = (
            diversify is not None
            and return_columns is not None
            and pk not in return_columns
        )
        pool_columns = (
            [pk, *return_columns] if drop_pk else return_columns
        )
        df = _hybrid_op(
            self._source_df(job),
            # the semantic branch ranks its own top-window_size, so the
            # probe floor is the window (falls back to 5x num_results,
            # operators/search.py default) rather than num_results
            self._emb_candidates(job, qv, window_size or 5 * pool),
            pk,
            qv,
            query,
            text_cols=job.src_columns,
            num_results=pool,
            window_size=window_size,
            rrf_k=rrf_k,
            semantic_weight=semantic_weight,
            fts_weight=fts_weight,
            return_columns=pool_columns,
            filters=parse_filters(filters) if filters else None,
            where_sql=where_sql,
            pre_normalized=True,
            tokens_df=tokens_df,
            analyzer=self._job_analyzer(job),
            rank=rank,
            # both branches pruned for an indexed job: the semantic
            # branch via the ANN cell probe above, the FTS branch via
            # the postings index here (VERDICT r6 #2)
            fts_scored_df=self._fts_probe_scores(job, query),
        )
        if diversify is not None:
            from pg_vectorize_spark.operators.search import mmr_rerank

            # reserved vector-column name — same ambiguity guard as
            # search() (ADVICE r10)
            with_vecs = df.join(
                self._emb_ds(job_name)
                .read()
                .select(
                    F.col(pk),
                    F.col("embeddings").alias("__mmr_vec"),
                ),
                pk,
            )
            mmr = mmr_rerank(
                with_vecs,
                pk,
                "__mmr_vec",
                "rrf_score",
                num_results,
                lambda_=diversify,
                normalize_scores=True,
            )
            df = (
                df.drop("rrf_score")
                .join(mmr, pk)
                .orderBy("mmr_rank")
            )
            if drop_pk:
                df = df.drop(pk)
        return [r.asDict(recursive=True) for r in df.collect()]

    def hybrid_search_extension_mode(
        self,
        job_name: str,
        query: str,
        num_results: int = 10,
        semantic_weight: int = 50,
        api_key: str | None = None,
        **kwargs,
    ) -> list[dict]:
        """The extension's OLDER client-side fusion algorithm
        (extension/src/search.rs:279-369): candidate pools of 2x num_results
        per branch, weights semantic_weight/100 and (100-semantic_weight)/100.
        Same RRF shape — expressed through the server-side operator with the
        extension's parameters."""
        w = semantic_weight / 100.0
        return self.hybrid_search(
            job_name,
            query,
            num_results=num_results,
            window_size=2 * num_results,
            semantic_weight=w,
            fts_weight=1.0 - w,
            api_key=api_key,
            **kwargs,
        )

    # -------------------------------------------------------- SQL surface

    _SQL_FUNCTIONS = {
        "cosine_sim": """
CREATE OR REPLACE TEMPORARY FUNCTION cosine_sim(a ARRAY<DOUBLE>, b ARRAY<DOUBLE>)
RETURNS DOUBLE
RETURN CASE
  WHEN (sqrt(aggregate(a, 0.0D, (acc, x) -> acc + x*x))
        * sqrt(aggregate(b, 0.0D, (acc, x) -> acc + x*x))) > 0.0D
  THEN aggregate(zip_with(a, b, (x, y) -> x*y), 0.0D, (acc, x) -> acc + x)
       / (sqrt(aggregate(a, 0.0D, (acc, x) -> acc + x*x))
          * sqrt(aggregate(b, 0.0D, (acc, x) -> acc + x*x)))
  ELSE 0.0D END
""",
        "dot_sim": """
CREATE OR REPLACE TEMPORARY FUNCTION dot_sim(a ARRAY<DOUBLE>, b ARRAY<DOUBLE>)
RETURNS DOUBLE
RETURN aggregate(zip_with(a, b, (x, y) -> x*y), 0.0D, (acc, x) -> acc + x)
""",
    }

    def _ensure_sql_functions(self) -> None:
        if getattr(self, "_sql_fns_ready", False):
            return
        for ddl in self._SQL_FUNCTIONS.values():
            self.spark.sql(ddl)
        self._sql_fns_ready = True

    def sql(self, query: str) -> DataFrame:
        """Spark SQL with ``vectorize.embed('q','job')`` rewriting (F7).

        The proxy analog (proxy/src/embeddings.rs:66-182): embed calls are
        resolved to vector literals BEFORE planning; cosine_sim/dot_sim SQL
        UDFs (pure SQL-expression functions — still whole-stage codegen) are
        registered so rewritten queries can score against job views.
        """
        from pg_vectorize_spark.sql_rewrite import rewrite_embed_calls

        self._ensure_sql_functions()
        return self.spark.sql(rewrite_embed_calls(query, self))

    # ----------------------------------------------------------- functions

    def mod_info(self, model: str | None = None) -> dict:
        """vectorize.mod_info(): model metadata — dim + input caps
        (extension/src/transformers/http_handler.rs:11-58)."""
        name = model or self.config.default_transformer
        parsed = parse_model(name)
        provider = get_provider(name)
        return {
            "model": name,
            "source": parsed.source.value,
            "dim": model_dim(parsed, probe=provider),
            "max_seq_len": self.config.input_token_cap,
        }

    def encode(self, text: str, model: str | None = None, api_key: str | None = None):
        """vectorize.encode()/transform_embeddings(): one string -> vector."""
        provider = get_provider(model or self.config.default_transformer, api_key)
        return provider.generate_embedding([text])[0]

    def generate(
        self,
        input_text: str,
        chat: ChatProvider | None = None,
        chat_model: str | None = None,
        api_key: str | None = None,
    ) -> str:
        """vectorize.generate(): one-shot chat completion. ``chat_model``
        dispatches per-source (OpenAI schema / Ollama /api/generate /
        Portkey gateway), matching call_chat_completions
        (extension/src/chat/ops.rs:138-192)."""
        if chat is None and chat_model is not None:
            chat = get_chat_provider(chat_model, api_key=api_key)
        chat = chat or self._chat
        if chat is None:
            raise VectorizeError("no chat provider configured")
        return chat.generate_response([{"role": "user", "content": input_text}])

    def chunk_text(self, doc: str, max_chars: int) -> list[str]:
        return chunk_text_greedy(doc, max_chars)

    def chunk_table(
        self,
        src_path: str,
        column: str,
        primary_key: str,
        max_chunk_size: int = 1000,
        output_view: str = "chunked_data",
    ) -> DataFrame:
        """vectorize.chunk_table(): chunk a column table-wide; registers the
        output as a temp view (the reference writes a table)."""
        df = read_source(self.spark, src_path)
        out = chunk_table_greedy(df, column, primary_key, max_chunk_size)
        out.createOrReplaceTempView(output_view)
        return out

    def import_embeddings(
        self,
        job_name: str,
        src_path: str,
        src_pk: str,
        src_emb_col: str,
    ) -> int:
        """vectorize.import_embeddings(): copy user-supplied vectors into the
        job's embeddings dataset (extension/src/api.rs:250-326)."""
        job = self.catalog.get(job_name)
        if job.table_method == "append":
            # an append job's snapshot is the WIDE source row; upserting the
            # narrow (pkey, embeddings, ...) shape would break the next
            # append-mode merge on the missing source columns
            raise VectorizeError(
                "import_embeddings is not supported for table_method='append' "
                "jobs — import into a 'join' job or re-embed via scan_job"
            )
        src = read_source(self.spark, src_path)
        from pg_vectorize_spark.functions.vector import l2_normalize

        # normalize at import: the engine scores with pre_normalized dot
        # products, so imported vectors must be unit-length for cosine
        # semantics (the reference's <=> operator normalizes implicitly)
        incoming = src.select(
            F.col(src_pk).alias(job.primary_key),
            l2_normalize(F.col(src_emb_col)).alias("embeddings"),
            F.lit(None).cast("long").alias("content_fp"),
            F.current_timestamp().alias("updated_at"),
        ).localCheckpoint()  # count + dim-check + merge read this plan 3x
        n = incoming.count()
        dims = incoming.select(F.size("embeddings").alias("d")).distinct().collect()
        if len(dims) > 1 or (dims and dims[0]["d"] != job.dim):
            raise VectorizeError(
                f"imported vectors must all have dim {job.dim}, got "
                f"{sorted(r['d'] for r in dims)}"
            )
        self._emb_ds(job_name).merge_upsert(incoming, job.primary_key)
        self._index_upsert(job, incoming)
        return n

    def create_job_from(
        self,
        job_name: str,
        src_path: str,
        columns: Sequence[str],
        primary_key: str,
        emb_src_path: str,
        emb_src_pk: str,
        emb_src_col: str,
        update_time_col: str | None = None,
        model: str | None = None,
    ) -> JobRecord:
        """vectorize.table_from(): create a job seeded from existing
        embeddings instead of an initial embed run (extension/src/api.rs:328-390)."""
        job = self.create_job(
            job_name,
            src_path,
            columns,
            primary_key,
            update_time_col=update_time_col,
            model=model,
            run_initial_load=False,
        )
        # dimension comes from the imported table, not the model probe
        src = read_source(self.spark, emb_src_path)
        first = src.select(F.size(F.col(emb_src_col)).alias("d")).head()
        if first is not None:
            job.dim = int(first["d"])
            self.catalog.create(job, replace=True)
        self.import_embeddings(job_name, emb_src_path, emb_src_pk, emb_src_col)
        self.job_view(job_name)
        return job

    def rag(
        self,
        job_name: str,
        query: str,
        num_context: int = 2,
        task: str = "question_answer",
        chat_model: str = "openai/gpt-4o-mini",
        force_trim: bool = False,
        chat: ChatProvider | None = None,
        api_key: str | None = None,
    ) -> RagResult:
        """vectorize.rag(): search -> render -> complete (§2.12). Requires a
        single-column job (extension parity). ``task`` resolves through the
        workspace PromptRegistry, so user-registered templates
        (``sess.add_prompt(...)``, the vectorize.prompts INSERT analog) are
        first-class alongside the seeded question_answer."""
        job = self.catalog.get(job_name)
        if len(job.src_columns) != 1:
            raise VectorizeError(
                "rag() requires a job with exactly one source column "
                f"(got {job.src_columns})"
            )
        content_col = job.src_columns[0]
        results = self.search(
            job_name, query, num_results=num_context, api_key=api_key
        )
        chat = chat or self._chat
        if chat is None:
            # per-source dispatch on the requested chat model
            # (extension/src/chat/ops.rs:138-192)
            chat = get_chat_provider(chat_model, api_key=api_key)
        return run_rag(
            results,
            query,
            chat,
            content_col=content_col,
            pkey=job.primary_key,
            task=task,
            chat_model=chat_model,
            force_trim=force_trim,
            prompts=self.prompts.all(),
        )

    def add_prompt(
        self,
        task: str,
        sys_prompt: str,
        user_prompt: str,
        replace: bool = False,
    ) -> None:
        """Register a prompt template — INSERT INTO vectorize.prompts parity
        (extension/sql/meta.sql:9-13)."""
        self.prompts.add(task, sys_prompt, user_prompt, replace=replace)
