"""Job catalog — the ``vectorize.job`` table re-expressed.

Mirrors the reference's catalog schema (core/src/query.rs:205-220 server
form; extension/sql/meta.sql:1-7 extension form) and its in-memory
``job_cache`` with write-through (server/src/app_state.rs:22-31,
server/src/routes/search.rs:154-170). Persistence is a JSON file per
workspace (a driver-side singleton — the catalog is tiny; at cluster scale
it would live in a Delta table or metastore, reloaded on change like the
reference's LISTEN/NOTIFY invalidation, server/src/cache.rs:8-145).
"""

from __future__ import annotations

import json
import os
import tempfile
from dataclasses import asdict, dataclass, field
from datetime import datetime, timezone

from pg_vectorize_spark.errors import JobAlreadyExistsError, JobNotFoundError
from pg_vectorize_spark.validate import check_input


@dataclass
class JobRecord:
    """One job — source table -> embeddings/tokens datasets.

    Field names follow the server-mode schema (core/src/query.rs:205-220):
    src_table/src_columns/primary_key/update_time_col/model, plus the
    extension-mode extras (table_method, schedule, index_dist_type —
    core/src/types.rs:118-135).
    """

    job_name: str
    src_path: str  # parquet path or registered view name
    src_columns: list[str]
    primary_key: str
    update_time_col: str | None = None
    model: str = "local/hash-embedder-64"
    dim: int = 64
    table_method: str = "join"  # join | append (core/src/types.rs:109-115)
    schedule: str = "realtime"  # realtime | cron expr (core/src/types.rs:133-135)
    source_format: str = "auto"  # auto | parquet | csv | json | table
    index_dist_type: str = "cosine"
    #: physical index layout the job's search path probes (the Spark
    #: analog of the reference building an HNSW/DiskANN index per job,
    #: core/src/query.rs:359-396): brute | ivf | ivfpq | signbit
    index_method: str = "brute"
    index_params: dict = field(default_factory=dict)
    #: persisted FTS postings index (the reference's GIN index on the
    #: tsvector table, core/src/query.rs:242-252 — created at every job
    #: init there, so it defaults ON here too); False keeps the
    #: full-scan arrays_overlap path
    fts_index: bool = True
    fts_params: dict = field(default_factory=dict)
    #: opt-in ingest-time near-dup filter (beyond reference parity):
    #: non-empty => the job maintains a persisted MinHash band index
    #: (dedup_index.MinHashBandIndexManager) and NEW source rows whose
    #: estimated Jaccard vs an already-ingested doc >= min_jaccard
    #: (default 0.7) are skipped by every ingest path. Keys: min_jaccard,
    #: within_batch (also drop in-batch mutual near-dups, lowest key
    #: survives — covers the initial load, which the index probe can't),
    #: plus the manager's num_hashes/bands/shingle_k/band_buckets.
    dedup_params: dict = field(default_factory=dict)
    #: opt-in ingest-time quality gate (beyond reference parity): per-row
    #: predicates over the same null-safe concatenated content the embed
    #: stage sees; rows failing any enabled rule are skipped by the scan
    #: and streaming ingest paths (an update degrading below the gate
    #: keeps the doc's previous embedding). Keys: min_tokens, max_tokens,
    #: min_quality, langs, require_c4, c4_min_sentences,
    #: classifier_path + classifier_min_prob (a trained linear quality
    #: model — operators/classify.py — scored at the gate).
    curate_params: dict = field(default_factory=dict)
    params: dict = field(default_factory=dict)
    created_at: str = field(
        default_factory=lambda: datetime.now(timezone.utc).isoformat()
    )

    def __post_init__(self) -> None:
        check_input(self.job_name)
        check_input(self.primary_key)
        for c in self.src_columns:
            check_input(c)
        if self.update_time_col:
            check_input(self.update_time_col)


class Catalog:
    def __init__(self, workspace_dir: str):
        self.workspace_dir = workspace_dir
        self._path = os.path.join(workspace_dir, "catalog.json")
        self._cache: dict[str, JobRecord] | None = None

    def _load(self) -> dict[str, JobRecord]:
        if self._cache is None:
            try:
                with open(self._path) as f:
                    raw = json.load(f)
                self._cache = {k: JobRecord(**v) for k, v in raw.items()}
            except FileNotFoundError:
                self._cache = {}
        return self._cache

    def _save(self) -> None:
        os.makedirs(self.workspace_dir, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=self.workspace_dir, prefix="catalog.")
        with os.fdopen(fd, "w") as f:
            json.dump(
                {k: asdict(v) for k, v in self._load().items()}, f, indent=1
            )
        # params may carry provider api keys (JobParams.api_key parity) —
        # owner-only like the mkstemp default; don't widen it
        os.chmod(tmp, 0o600)
        os.replace(tmp, self._path)

    def create(self, job: JobRecord, replace: bool = False) -> None:
        jobs = self._load()
        if job.job_name in jobs and not replace:
            raise JobAlreadyExistsError(job.job_name)
        jobs[job.job_name] = job
        self._save()

    def get(self, job_name: str) -> JobRecord:
        jobs = self._load()
        if job_name not in jobs:
            raise JobNotFoundError(job_name)
        return jobs[job_name]

    def exists(self, job_name: str) -> bool:
        return job_name in self._load()

    def delete(self, job_name: str) -> bool:
        jobs = self._load()
        if job_name in jobs:
            del jobs[job_name]
            self._save()
            return True
        return False

    def list_jobs(self) -> list[str]:
        return sorted(self._load())

    def refresh(self) -> None:
        """Drop the in-memory cache (the LISTEN/NOTIFY analog)."""
        self._cache = None
