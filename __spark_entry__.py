"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry is a Spark implementation of an operator from
SURVEY.md §2 (or a training-data-pipeline extension); ``oracle_sql()`` holds
the equivalent DuckDB SQL. Column names and float math are aligned so the
driver's order-insensitive value-hash comparison passes bit-for-bit (see
pg_vectorize_spark/oracle.py for how).

Fixed query constants (vector = embedding of vec_id 0, text query below) keep
every run deterministic.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pg_vectorize_spark import oracle as O
from pg_vectorize_spark.filters import parse_filters
from pg_vectorize_spark.functions import text as T
from pg_vectorize_spark.functions import vector as V
from pg_vectorize_spark.operators.search import (
    full_text_search,
    hybrid_search,
    semantic_search,
)

# --------------------------------------------------------------------------
# fixed, deterministic query constants
# --------------------------------------------------------------------------
QUERY_TEXT = "spark window merge batch data"
# light-stemmed analyzer output == [spark, window, merg, batch, data]
QUERY_TERMS = T.analyze_query(QUERY_TEXT)
# inflected-forms query for the stemming-semantics check
STEM_QUERY_TEXT = "running merged windows batched"
FETCH_IDS = [3, 14, 159, 265, 358]
EMBED_DIM = 64


#: committed media fixture (real PNG/WAV blobs with closed-form content;
#: scripts/make_media_fixture.py regenerates it deterministically)
MEDIA_FIXTURE = "/root/repo/tests/fixtures/media_fixture.parquet"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-adaptive events loader: the driver has shipped ``ts`` both as
    TIMESTAMP(NANOS) (which Spark's reader rejects — read nanos as long and
    integer-divide to the exact microsecond DuckDB produces) and as a plain
    TIMESTAMP(MICROS)/NTZ column (use directly). Detect per-file."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts_type = raw.schema["ts"].dataType.typeName()
    if ts_type in ("long", "bigint"):
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def _query_vec(spark: SparkSession, sf_dir: str) -> list[float]:
    """The query vector: embedding of vec_id 0 (driver-side fetch, mirrors
    the reference's query-embedding-at-driver step)."""
    row = (
        _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") == 0).head()
    )
    return [float(x) for x in row["embedding"]]


# --------------------------------------------------------------------------
# queries
# --------------------------------------------------------------------------


def q_semantic_search_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1+A1+J1: brute-force cosine top-k over the embeddings table."""
    emb = _t(spark, sf_dir, "embeddings")
    qv = _query_vec(spark, sf_dir)
    src = emb.select("vec_id", "label")
    return semantic_search(
        src,
        emb.select("vec_id", F.col("embedding").alias("embeddings")),
        "vec_id",
        qv,
        num_results=10,
    )


def q_semantic_search_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-backed semantic search (VERDICT r5 #1): build the persisted
    IVF index and probe it — the exact path ``VectorizeSession.search()``
    takes for an ``index_method='ivf'`` job (engine._emb_candidates ->
    JobIndexManager.candidates: centroid probe driver-side, then a
    partition-pruned scan of the probed cells, then the exact cosine
    rerank). The ORACLE IS THE BRUTE-FORCE RANKING over the same data:
    the gate asserts the indexed path returns the exact top-k (the
    reference's planner swaps in the HNSW index without changing
    results, core/src/query.rs:359-396). Plan lock: PartitionFilters on
    the index scan (tests/test_index_backed.py).

    Exactness margin: brute parity under a PARTIAL probe is
    data-dependent; measured on the driver-generated fixtures the full
    top-10 is recovered at nprobe=2 at every SF (clustered embeddings,
    query = member vector). The gate probes 6 of 8 cells — a 3x margin
    over the measured requirement while the scan still prunes 25% of
    the index at the source."""
    full = _t(spark, sf_dir, "embeddings")
    mgr = _ann_gate_index(spark, sf_dir)
    qv = _query_vec(spark, sf_dir)
    return semantic_search(
        full.select("vec_id", "label"),
        mgr.candidates(qv).select("vec_id", "embeddings"),
        "vec_id",
        qv,
        num_results=10,
    )


def _ann_gate_index(spark: SparkSession, sf_dir: str):
    """Build (or reuse) the persisted IVF gate index over the embeddings
    fixture. Deterministic per-SF scratch dir; the build is skipped when
    the SOURCE FINGERPRINT (file names/sizes/mtimes) matches the one the
    existing index was built from — the deployment shape is build-once
    probe-many, and repeated invocations (bench best-of-N) should time
    the PROBE path, not a redundant rebuild. Any change to the fixture
    OR the index config changes the fingerprint and forces the rebuild.
    Shared by semantic_search_indexed and hard_negatives_indexed."""
    import os
    import tempfile

    from pg_vectorize_spark.index_manager import JobIndexManager

    sfname = os.path.basename(sf_dir.rstrip("/")) or "sf"
    idx_dir = os.path.join(
        tempfile.gettempdir(), f"pvs_gate_index_{sfname}"
    )
    index_cfg = {"n_centroids": 8, "nprobe": 6}
    mgr = JobIndexManager(spark, idx_dir, "ivf", index_cfg)
    fp = _source_fingerprint(os.path.join(sf_dir, "embeddings.parquet"))
    fp += repr(sorted(index_cfg.items()))
    fp_path = os.path.join(idx_dir, "_SOURCE_FP")
    fresh = False
    try:
        with open(fp_path) as fh:
            fresh = fh.read() == fp and mgr.exists()
    except OSError:
        pass
    if not fresh:
        emb = _t(spark, sf_dir, "embeddings").select(
            "vec_id", F.col("embedding").alias("embeddings")
        )
        mgr.build(emb, "vec_id")
        with open(fp_path, "w") as fh:
            fh.write(fp)
    return mgr


def q_semantic_search_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2/P3 placement parity: typed filter applied post-ranking."""
    emb = _t(spark, sf_dir, "embeddings")
    qv = _query_vec(spark, sf_dir)
    src = emb.select("vec_id", "label")
    return semantic_search(
        src,
        emb.select("vec_id", F.col("embedding").alias("embeddings")),
        "vec_id",
        qv,
        num_results=5,
        filters=parse_filters({"label": "eq.1"}),
    )


def q_fts_search_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1-F3+T3: analyzed term-overlap full-text search on documents."""
    docs = _t(spark, sf_dir, "documents")
    return full_text_search(
        docs.select("doc_id", "lang", "n_chars"),
        "doc_id",
        QUERY_TEXT,
        text_cols=["text"],
        num_results=10,
        tokens_df=docs.select(
            "doc_id", T.tokens_expr(F.col("text")).alias("search_tokens")
        ),
    )


def q_hybrid_rrf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1/W2+J3+A3+T2: server-side weighted-RRF hybrid search."""
    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), F.col("embedding").alias("embeddings")
    )
    qv = _query_vec(spark, sf_dir)
    return hybrid_search(
        docs.select("doc_id", "lang", "n_chars"),
        emb,
        "doc_id",
        qv,
        QUERY_TEXT,
        text_cols=["text"],
        num_results=10,
        window_size=50,
        rrf_k=60,
        tokens_df=docs.select(
            "doc_id", T.tokens_expr(F.col("text")).alias("search_tokens")
        ),
    )


def _source_fingerprint(src: str) -> str:
    """File names/sizes/mtimes digest of a parquet fixture — the
    build-once-probe-many cache key shared by the indexed gates."""
    import os

    if os.path.isdir(src):
        return repr(
            sorted(
                (f, st.st_size, st.st_mtime_ns)
                for f in os.listdir(src)
                if not f.startswith((".", "_"))
                for st in [os.stat(os.path.join(src, f))]
            )
        )
    st = os.stat(src)
    return repr((st.st_size, st.st_mtime_ns))


def _cached_gate_session(
    spark: SparkSession, sf_dir: str, ws_prefix: str, job_name: str, **job_kwargs
):
    """Fingerprint-cached VectorizeSession for the engine-lifecycle
    gates (job_hybrid_e2e, curate_job_search_e2e): the workspace is
    keyed per SF behind the documents fixture's fingerprint, so
    repeated invocations time the QUERY path like a deployed engine,
    and a changed fixture rebuilds the job. One definition — the
    cache-freshness logic cannot diverge between gates (review r12)."""
    import os
    import shutil
    import tempfile

    from pg_vectorize_spark.engine import VectorizeSession

    sfname = os.path.basename(sf_dir.rstrip("/")) or "sf"
    ws = os.path.join(tempfile.gettempdir(), f"{ws_prefix}_{sfname}")
    fp = _source_fingerprint(os.path.join(sf_dir, "documents.parquet"))
    fp_path = os.path.join(ws, "_SOURCE_FP")
    fresh = False
    try:
        with open(fp_path) as fh:
            fresh = fh.read() == fp
    except OSError:
        pass
    sess = VectorizeSession(spark, workspace=ws)
    if not (fresh and sess.catalog.exists(job_name)):
        shutil.rmtree(ws, ignore_errors=True)
        sess = VectorizeSession(spark, workspace=ws)
        sess.create_job(
            job_name,
            os.path.join(sf_dir, "documents.parquet"),
            columns=["text"],
            primary_key="doc_id",
            **job_kwargs,
        )
        with open(fp_path, "w") as fh:
            fh.write(fp)
    return sess


def _fts_gate_index(spark: SparkSession, sf_dir: str):
    """Build (or reuse) the persisted FTS postings index over the
    documents fixture — the per-SF scratch-dir + source-fingerprint
    pattern of the semantic indexed gate: repeated invocations (bench
    best-of-N) time the PROBE path, not a redundant rebuild."""
    import os
    import tempfile

    from pg_vectorize_spark.fts_index import JobFtsIndexManager

    sfname = os.path.basename(sf_dir.rstrip("/")) or "sf"
    idx_dir = os.path.join(
        tempfile.gettempdir(), f"pvs_gate_fts_index_{sfname}"
    )
    index_cfg = {"term_buckets": 64}
    mgr = JobFtsIndexManager(spark, idx_dir, index_cfg)
    fp = _source_fingerprint(os.path.join(sf_dir, "documents.parquet"))
    fp += repr(sorted(index_cfg.items()))
    fp_path = os.path.join(idx_dir, "_SOURCE_FP")
    fresh = False
    try:
        with open(fp_path) as fh:
            fresh = fh.read() == fp and mgr.exists()
    except OSError:
        pass
    if not fresh:
        docs = _t(spark, sf_dir, "documents")
        mgr.build(
            docs.select(
                "doc_id", T.tokens_expr(F.col("text")).alias("search_tokens")
            ),
            "doc_id",
        )
        with open(fp_path, "w") as fh:
            fh.write(fp)
    return mgr


def q_fts_search_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-backed full-text search (VERDICT r6 #1): the persisted
    term-bucketed postings index (fts_index.py — the GIN-index analog,
    core/src/query.rs:242-252 creates it at job init; the Postgres
    planner probes it per query) replaces the full tokens-snapshot
    arrays_overlap scan. The probe is LOSSLESS: the matched set and
    overlap scores are identical to the scan's by construction (stored
    tokens are distinct per document, so the pruned postings aggregate
    counts exactly the intersection the scan computes) — the ORACLE IS
    THE FULL-SCAN RANKING. Plan lock: PartitionFilters on tb
    (tests/test_fts_index.py); the scan reads |query term buckets| of
    64 partitions at the parquet source."""
    docs = _t(spark, sf_dir, "documents")
    mgr = _fts_gate_index(spark, sf_dir)
    return full_text_search(
        docs.select("doc_id", "lang", "n_chars"),
        "doc_id",
        QUERY_TEXT,
        text_cols=["text"],
        num_results=10,
        fts_scored_df=mgr.probe_scores(QUERY_TERMS),
    )


def _fts_overlay_gate_index(spark: SparkSession, sf_dir: str):
    """Gate index whose pending/tombstone OVERLAY is live — the r9
    adaptive wide-update/delete escape (fts_index.py): the doc_id%10==7
    cohort is built with deliberately-wrong tokens (reversed text) and
    overlay-UPSERTED to its true tokens; the doc_id%10==3 cohort is
    wide-DELETED into tombstones. Both maintenance batches span far
    more term buckets than term_buckets//2, so the adaptive escape
    routes them into the overlay (deterministic for the fixed fixture —
    xxhash bucket assignment is data-dependent, not run-dependent), and
    compact_every=99 keeps the fold from clearing it. Probes must serve
    the LOGICAL state: main minus tombstoned keys, union pending."""
    import os
    import tempfile

    from pg_vectorize_spark.fts_index import JobFtsIndexManager

    sfname = os.path.basename(sf_dir.rstrip("/")) or "sf"
    idx_dir = os.path.join(
        tempfile.gettempdir(), f"pvs_gate_fts_overlay_{sfname}"
    )
    index_cfg = {"term_buckets": 16, "compact_every": 99}
    mgr = JobFtsIndexManager(spark, idx_dir, index_cfg)
    fp = _source_fingerprint(os.path.join(sf_dir, "documents.parquet"))
    fp += repr(sorted(index_cfg.items())) + "|overlay-v1"
    fp_path = os.path.join(idx_dir, "_SOURCE_FP")
    fresh = False
    try:
        with open(fp_path) as fh:
            # the overlay must still be live, or the cached state no
            # longer exercises the read path this gate exists for
            fresh = fh.read() == fp and mgr.exists() and mgr._overlay_live()
    except OSError:
        pass
    if not fresh:
        docs = _t(spark, sf_dir, "documents")
        cohort7 = F.col("doc_id") % 10 == 7
        cohort3 = F.col("doc_id") % 10 == 3
        true_tokens = docs.select(
            "doc_id", T.tokens_expr(F.col("text")).alias("search_tokens")
        )
        stale_tokens = docs.select(
            "doc_id",
            T.tokens_expr(
                F.when(cohort7, F.reverse(F.col("text"))).otherwise(
                    F.col("text")
                )
            ).alias("search_tokens"),
        )
        mgr.build(stale_tokens, "doc_id")
        mgr.upsert(
            true_tokens.filter(cohort7),
            "doc_id",
            stale_tokens.filter(cohort7),
        )
        mgr.delete_with_tokens(
            docs.filter(cohort3).select("doc_id"),
            "doc_id",
            stale_tokens.filter(cohort3),
        )
        if not mgr._overlay_live():  # pragma: no cover - fixture guard
            raise RuntimeError(
                "overlay gate setup did not leave a live overlay — the "
                "adaptive escape threshold no longer fires on this "
                "fixture; adjust term_buckets"
            )
        with open(fp_path, "w") as fh:
            fh.write(fp)
    return mgr


def q_fts_search_overlay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-backed FTS while the postings index's pending/tombstone
    overlay is LIVE (the r9 adaptive maintenance escape): the probe
    overlays main∖tombstones∪pending, and its ranking must equal the
    full scan of the LOGICAL corpus — doc_id%10==3 deleted, %10==7 at
    its post-update text. A probe that served main directly would both
    resurrect the deleted cohort and score the updated cohort on its
    stale (reversed-text) tokens; the oracle recomputes the logical
    ranking from the raw fixture."""
    docs = _t(spark, sf_dir, "documents")
    mgr = _fts_overlay_gate_index(spark, sf_dir)
    return full_text_search(
        docs.select("doc_id", "lang", "n_chars"),
        "doc_id",
        QUERY_TEXT,
        text_cols=["text"],
        num_results=10,
        fts_scored_df=mgr.probe_scores(QUERY_TERMS),
    )


def q_hybrid_rrf_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid RRF with the FTS branch routed through the postings index
    (VERDICT r6 #2): same fusion semantics, same oracle as
    hybrid_rrf_search — the probe is lossless, so RRF ranks are
    bit-identical while the text branch scans a bounded partition
    subset instead of the tokens table. (The engine's
    ``hybrid_search`` on an index_method+fts_index job prunes BOTH
    branches; the semantic side's pruning is gated separately by
    semantic_search_indexed.)"""
    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), F.col("embedding").alias("embeddings")
    )
    qv = _query_vec(spark, sf_dir)
    mgr = _fts_gate_index(spark, sf_dir)
    return hybrid_search(
        docs.select("doc_id", "lang", "n_chars"),
        emb,
        "doc_id",
        qv,
        QUERY_TEXT,
        text_cols=["text"],
        num_results=10,
        window_size=50,
        rrf_k=60,
        fts_scored_df=mgr.probe_scores(QUERY_TERMS),
    )


def q_view_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: the <job>_view projection — source ⋈ embeddings on pkey."""
    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    return (
        docs.join(emb, docs["doc_id"] == emb["vec_id"], "inner")
        .select(
            "doc_id",
            "lang",
            "label",
            F.size("embedding").alias("dim"),
        )
    )


def q_change_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1/J2: new-row detection — source LEFT ANTI already-embedded set."""
    docs = _t(spark, sf_dir, "documents")
    embedded = (
        _t(spark, sf_dir, "embeddings")
        .filter(F.col("label") == 0)
        .select(F.col("vec_id").alias("doc_id"))
    )
    return docs.join(embedded, "doc_id", "left_anti").select("doc_id", "n_chars")


def q_record_fetch_by_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3/J6: fetch source rows by id list."""
    docs = _t(spark, sf_dir, "documents")
    return docs.filter(F.col("doc_id").isin(FETCH_IDS)).select(
        "doc_id", "text", "lang", "source", "n_chars"
    )


def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6/F13: token-count estimates per document."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        T.token_count_expr(F.col("text")).alias("n_tokens"),
        T.whitespace_token_count_expr(F.col("text")).alias("ws_tokens"),
    )


def q_embed_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8 (hermetic): deterministic hashed-BoW embedding via the
    Arrow-batched provider path (mapInPandas + numpy, memoized feature
    hashing) — a pure zero-shuffle map, measured ~2.5x faster than the
    JVM explode->groupBy path at sf0.1 (0.97s vs 2.55s) and the better
    100-TB shape (the exploded path shuffles every feature row twice; this
    shuffles nothing). Both strategies produce bit-identical vectors and
    are cross-checked in pytest; the exploded path remains for
    Python-worker-free deployments.

    Output is scalar-only (position-weighted checksum + nonzero count) so the
    driver's pandas canonicalizer can hash it; the raw vector is exercised by
    pytest and by every similarity query that consumes embeddings."""
    from pg_vectorize_spark.operators.embed import embed_bulk_pandas

    docs = _t(spark, sf_dir, "documents")
    emb = embed_bulk_pandas(docs, "text", "doc_id", dim=EMBED_DIM)
    checksum = F.aggregate(
        F.zip_with(
            F.col("embeddings"),
            F.sequence(F.lit(1), F.lit(EMBED_DIM)),
            lambda x, i: x * i.cast("double"),
        ),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    nnz = F.size(F.filter(F.col("embeddings"), lambda x: x != F.lit(0.0)))
    return emb.select(
        "doc_id",
        checksum.alias("checksum"),
        nnz.alias("nnz"),
    )


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint (rolling polynomial hash)."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", T.fingerprint_expr(F.col("text")).alias("fingerprint")
    )


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text-quality metrics + composite score."""
    docs = _t(spark, sf_dir, "documents")
    m = T.quality_metrics_exprs(F.col("text"))
    return docs.select(
        "doc_id",
        m["n_chars"].alias("n_chars_m"),
        m["n_words"].alias("n_words"),
        m["mean_word_len"].alias("mean_word_len"),
        m["punct_ratio"].alias("punct_ratio"),
        m["stopword_ratio"].alias("stopword_ratio"),
        T.quality_score_expr(F.col("text")).alias("quality_score"),
    )


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-marker language identification."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", T.lang_id_expr(F.col("text")).alias("lang_pred")
    )


def q_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style within-document repetition: duplicate word-bigram and
    word-trigram fractions, a standard pretraining-data quality signal.
    Pure JVM expressions (zip_with n-gram chain, no interpreted per-gram
    re-evaluation); the word split is projected ONCE and shared by both
    k values (two-projection form, see repetition_from_words_expr)."""
    docs = _t(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id", T.raw_words_expr(F.col("text")).alias("_w")
    )
    return base.select(
        "doc_id",
        T.repetition_from_words_expr(F.col("_w"), 2).alias("rep_2gram"),
        T.repetition_from_words_expr(F.col("_w"), 3).alias("rep_3gram"),
    )


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII/link scrub audit: per-doc URL/email occurrence counts plus the
    post-scrub text length. The synthetic corpus contains no URLs/emails
    (counts hash as zeros; scrubbed_len varies per doc) — the positive
    match/replace path is pinned by pytest on doped rows; patterns are
    RE2-safe so Java regex and the DuckDB oracle agree match-for-match."""
    docs = _t(spark, sf_dir, "documents")
    counts = T.pii_count_exprs(F.col("text"))
    return docs.select(
        "doc_id",
        counts["n_urls"].alias("n_urls"),
        counts["n_emails"].alias("n_emails"),
        F.length(T.scrub_pii_expr(F.col("text"))).alias("scrubbed_len"),
    )


def q_gopher_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher quality-filter rules (Rae et al. 2021 A1.1) as per-doc
    boolean flags + the pass conjunction. min_words lowered to 20 for the
    short synthetic docs so both outcomes appear; a pure per-row
    projection — no shuffle at any scale."""
    docs = _t(spark, sf_dir, "documents")
    flags = T.gopher_flags_exprs(F.col("text"), min_words=20)
    return docs.select(
        "doc_id", *[flags[k].alias(k) for k in sorted(flags)]
    )


_PARA_LINED = "replace(text, '. ', '.' || chr(10))"


def q_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide paragraph dedup (CCNet granularity, Wenzek et al.
    2020): the first bearer of each paragraph — ordered by (doc_id,
    position) — survives; documents are reassembled from surviving
    paragraphs (dedup.paragraph_dedup). Sentence boundaries synthesize
    the paragraphs (the corpus is single-line); the reassembled text is
    hash-compared."""
    from pg_vectorize_spark.operators.dedup import paragraph_dedup

    docs = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 400)
        .withColumn("_lined", F.expr(_PARA_LINED))
    )
    # exact-string window keys: the mode the oracle mirrors verbatim
    # (hash_keys=True is the production default — same result modulo
    # 64-bit collisions, which a hash oracle cannot express)
    out = paragraph_dedup(docs, "_lined", "doc_id", hash_keys=False)
    return out.select(
        "doc_id",
        "n_paras",
        "n_kept",
        F.md5("clean_text").alias("clean_hash"),
    )


_C4_LINED = (
    "CASE WHEN doc_id % 11 = 0 THEN "
    "replace(text, '. ', '.' || chr(10)) || chr(10) || 'if (x) { return }' "
    "WHEN doc_id % 13 = 0 THEN "
    "replace(text, '. ', '.' || chr(10)) || chr(10) || "
    "'and then Lorem ipsum dolor sit' "
    "ELSE replace(text, '. ', '.' || chr(10)) END"
)


def q_c4_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 cleaning rules (Raffel et al. 2020 §2.2): line-level terminal-
    punctuation + min-word filter, sentence-count floor, lorem-ipsum and
    code-brace page markers. The corpus is single-line, so sentence
    boundaries are turned into newlines first and marker lines injected
    deterministically (same SQL expression evaluated by both engines);
    the surviving clean_text is hash-compared."""
    docs = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 400)
        .withColumn("_lined", F.expr(_C4_LINED))
    )
    flags = T.c4_flags_exprs(F.col("_lined"), min_sentences=3)
    return docs.select(
        "doc_id",
        flags["n_lines"].alias("n_lines"),
        flags["n_kept_lines"].alias("n_kept_lines"),
        flags["n_sentences"].alias("n_sentences"),
        flags["has_lorem_ipsum"].alias("has_lorem_ipsum"),
        flags["has_brace"].alias("has_brace"),
        flags["pass_c4"].alias("pass_c4"),
        F.md5(flags["clean_text"]).alias("clean_hash"),
    )


def q_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment by key hash
    (operators/curate.hash_split): stable across reruns, cluster sizes and
    partitionings — the reproducibility property a training pipeline
    needs. Zero-shuffle per-row projection."""
    from pg_vectorize_spark.operators.curate import hash_split

    docs = _t(spark, sf_dir, "documents")
    return hash_split(docs.select("doc_id"), "doc_id")


PACK_BLOCK = 512


def q_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style sequence packing (operators/curate.sequence_pack): lay
    the corpus out in a deterministic hash-shuffle order, concatenate the
    token streams, chop into fixed 512-token training blocks, and report
    each doc's exact landing site (start_tok / first_block / offset /
    last_block). Distributed prefix sum — per-bucket windows over
    deterministic priority ranges + a driver-side prefix of the
    order_buckets bucket totals — never a single-partition global
    window. All-BIGINT arithmetic, bit-exact vs the SQL window oracle."""
    from pg_vectorize_spark.operators.curate import sequence_pack

    docs = _t(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id", T.token_count_expr(F.col("text")).alias("n_tokens")
    )
    return sequence_pack(base, "doc_id", "n_tokens", PACK_BLOCK, order_buckets=64)


def q_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact weighted sampling without replacement (operators/curate.
    sample_weighted, Efraimidis & Spirakis 2006): top-25 exponential-race
    draw weighted by token count. Per-row projection +
    TakeOrderedAndProject — never a full sort; libm-Arrow ln keeps the
    race keys bit-identical to DuckDB's."""
    from pg_vectorize_spark.operators.curate import sample_weighted

    docs = _t(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id", T.token_count_expr(F.col("text")).alias("w")
    )
    return sample_weighted(base, "doc_id", "w", 25)



def _block_manifest(m: DataFrame) -> DataFrame:
    """Per-training-block manifest aggregate shared by q_pack_manifest
    and q_corpus_to_shards: slice count, token total, and a hash of the
    ordered slice list. One agg on the uniform block_id key."""
    part = F.concat_ws(
        "",
        F.col("doc_id").cast("string"),
        F.lit(":"),
        F.col("doc_from").cast("string"),
        F.lit("-"),
        F.col("doc_to").cast("string"),
    )
    return (
        m.withColumn("_part", part)
        .groupBy("block_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("doc_to") - F.col("doc_from")).alias("block_tokens"),
            F.md5(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.sort_array(
                            F.collect_list(F.struct("offset_in_block", "_part"))
                        ),
                        lambda x: x["_part"],
                    ),
                )
            ).alias("manifest_hash"),
        )
    )


def q_pack_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The loader-side view of sequence packing (operators/curate.
    pack_blocks): explode each doc into the blocks it spans, then
    aggregate per training block — how many doc slices fill it, the
    token total (== block size except the final block by construction),
    and a hash of the ordered slice manifest. Generator explode (linear,
    no shuffle) + one agg on the uniform block_id key."""
    from pg_vectorize_spark.operators.curate import pack_blocks, sequence_pack

    docs = _t(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id", T.token_count_expr(F.col("text")).alias("n_tokens")
    )
    packed = sequence_pack(base, "doc_id", "n_tokens", PACK_BLOCK, order_buckets=64)
    return _block_manifest(pack_blocks(packed, PACK_BLOCK))




def q_corpus_to_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END training-data pipeline composite (VERDICT r10 #4): raw
    docs -> quality gate -> intra-doc line dedup -> whitespace
    normalization -> cross-corpus MinHash band dedup (min-key survives)
    -> GPT-style sequence packing -> per-block manifest — the
    `job_hybrid_e2e` analog for the corpus-curation side, driven through
    the fluent CorpusPipeline facade (pipelines.py) so the gate proves
    the COMPOSITION, not just each stage. The oracle replays every stage
    in one DuckDB statement and the manifest hash pins slice order, so a
    drift anywhere in the chain (filter predicate, line-keep rule,
    shingle hash, band key, pack order) breaks the gate. Scale shape:
    stages 1-3 are per-row expressions (zero shuffle); the dedup is the
    banded equi-join (never all-pairs); the pack is the distributed
    prefix sum — the same plans the standalone gates lock."""
    from pg_vectorize_spark.operators.curate import pack_blocks
    from pg_vectorize_spark.pipelines import CorpusPipeline

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_LINE_DEDUP_LINED).alias("text")
    )
    # r14 optimization round: the fused dedup_pack stage materializes the
    # cleaned corpus ONCE — (doc_id, text, n_tokens) behind one lazy
    # checkpoint feeding both the MinHash signature pass and the
    # survivor anti-join, with the pack consuming narrow (doc_id,
    # n_tokens) rows. The previous two-step chain checkpointed the
    # SURVIVORS with full text a second time and re-tokenized them
    # (guide §2.3: decide with small rows, move big rows once).
    # Row-identical to dedup("minhash") + pack (same token counts over
    # the same text, same anti-join key set) — pinned by the oracle
    # hash and tests/test_pipelines.py::TestDedupPackParity.
    packed = (
        CorpusPipeline(spark, docs, pkey="doc_id", text_col="text")
        .filter_quality(min_score=0.5)
        .dedup_lines()
        .normalize_text(strip_html=False)
        .dedup_pack(PACK_BLOCK, method="minhash", order_buckets=64)
    )
    return _block_manifest(pack_blocks(packed, PACK_BLOCK))



# Line-ify the single-line corpus (sentence boundaries -> newlines, the
# c4_flags fixture trick) and re-append the FIRST line on every 7th doc
# so both branches of the dedup are exercised; same SQL expression
# evaluated by both engines.
_LINE_DEDUP_LINED = (
    "CASE WHEN doc_id % 7 = 0 THEN "
    "replace(text, '. ', '.' || chr(10)) || chr(10) || "
    "split_part(replace(text, '. ', '.' || chr(10)), chr(10), 1) "
    "ELSE replace(text, '. ', '.' || chr(10)) END"
)


def q_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repeated-line removal (functions/text.
    line_dedup_exprs) — the CCNet/C4-style page cleanup (nav bars, cookie
    banners, footers repeat verbatim inside a page) that runs before any
    cross-corpus dedup. Pure per-row array expressions: zero shuffle,
    embarrassingly parallel; survivors rejoined and hash-compared."""
    docs = _t(spark, sf_dir, "documents").withColumn(
        "_lined", F.expr(_LINE_DEDUP_LINED)
    )
    ex = T.line_dedup_exprs(F.col("_lined"))
    return docs.select(
        "doc_id",
        ex["n_lines"].alias("n_lines"),
        ex["n_kept_lines"].alias("n_kept_lines"),
        ex["had_dup_lines"].alias("had_dup_lines"),
        F.md5(ex["clean_text"]).alias("clean_hash"),
    )


def _bpe_merges() -> list[tuple[str, str]]:
    """The committed BPE merge fixture (scripts/make_bpe_merges.py) —
    a model artifact like the PQ codebook: trained once, deterministic,
    committed; the gate verifies the distributed ENCODE under it."""
    import json

    with open("/root/repo/tests/fixtures/bpe_merges.json") as f:
        return [tuple(m) for m in json.load(f)["merges"]]


def q_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real learned-subword tokenization (operators/bpe.py, Sennrich et
    al. 2016) under the committed 60-merge fixture: per-doc word count,
    BPE token count, and the md5 of the whole token stream. Broadcast
    merges + mapInPandas with a per-batch word cache (Zipf: most word
    occurrences are cache hits) — Arrow-batched, zero shuffle. The
    oracle replays the encode as a recursive CTE (one left-to-right
    merge pass per rank, the pass-per-merge form that provably equals
    the canonical priority encode — operators/bpe.py docstring)."""
    from pg_vectorize_spark.operators.bpe import bpe_encode_counts

    docs = _t(spark, sf_dir, "documents")
    return bpe_encode_counts(docs, "doc_id", "text", _bpe_merges())



def q_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language tokenizer fertility (BPE tokens per word) and
    compression (chars per BPE token) under the committed 60-merge
    fixture — the multilingual-tokenizer health metric training teams
    track (a language whose fertility blows up is being byte-shredded
    and will train poorly; Chung et al. 2023 report exactly this table
    when setting UniMax budgets). One mapInPandas encode pass + one
    per-language aggregate — the encode cost is the corpus scan, the
    agg key is the (tiny) language inventory."""
    from pg_vectorize_spark.operators.bpe import bpe_encode_counts

    docs = _t(spark, sf_dir, "documents")
    enc = bpe_encode_counts(docs, "doc_id", "text", _bpe_merges())
    per = docs.select(
        "doc_id", "lang", F.length("text").cast("long").alias("_chars")
    ).join(enc.select("doc_id", "n_words", "n_bpe_tokens"), "doc_id")
    agg = per.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_words").alias("total_words"),
        F.sum("n_bpe_tokens").alias("total_bpe_tokens"),
        F.sum("_chars").alias("total_chars"),
    )
    return agg.select(
        "lang",
        "n_docs",
        "total_words",
        "total_bpe_tokens",
        "total_chars",
        F.when(
            F.col("total_words") > 0,
            F.col("total_bpe_tokens").cast("double")
            / F.col("total_words").cast("double"),
        ).alias("fertility"),
        F.when(
            F.col("total_bpe_tokens") > 0,
            F.col("total_chars").cast("double")
            / F.col("total_bpe_tokens").cast("double"),
        ).alias("chars_per_token"),
    )


def q_corpus_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted corpus mixing by language: en replicated
    2.5x (multi-epoch), fr/es downsampled, zh dropped. Zero-shuffle
    projection + generator explode (operators/curate.weighted_mix)."""
    from pg_vectorize_spark.operators.curate import weighted_mix

    docs = _t(spark, sf_dir, "documents")
    out = weighted_mix(
        docs.select("doc_id", "lang"), "doc_id", "lang", MIX_WEIGHTS
    )
    return out.select("doc_id", "lang", "copy_idx")


def q_vocabulary_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary top-100 (tokenizer-training word-count pre-pass):
    two-stage algebraic aggregate + deterministic TakeOrdered
    (operators/curate.vocabulary)."""
    from pg_vectorize_spark.operators.curate import vocabulary

    docs = _t(spark, sf_dir, "documents")
    return vocabulary(docs, "text", "doc_id", top_n=100)


def q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-style quality score: per-doc mean unigram log-likelihood
    under the corpus's own word distribution; libm logs in one Arrow
    batch + integer nano-log sums keep it bit-exact and shuffle-order
    free (operators/curate.unigram_logprob)."""
    from pg_vectorize_spark.operators.curate import unigram_logprob

    docs = _t(spark, sf_dir, "documents")
    return unigram_logprob(docs, "text", "doc_id")


def q_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style per-language perplexity terciles (Wenzek et al. 2020
    §4.3): unigram-LM score + lang-id, then head/middle/tail NTILE(3)
    within each language — the standard keep-head/middle curation step.
    Scale shape: distributed per-language rank over deterministic
    nano-score ranges (a few-hundred-row driver prefix sum), never a
    per-language single-task window; closed-form BIGINT NTILE matches
    SQL NTILE exactly (operators/curate.perplexity_buckets)."""
    from pg_vectorize_spark.operators.curate import perplexity_buckets

    docs = _t(spark, sf_dir, "documents")
    return perplexity_buckets(docs, "text", "doc_id")


def q_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-order-aware perplexity filter: per-doc mean CONDITIONAL
    bigram log-likelihood under the corpus's own add-0.5-smoothed bigram
    model (operators/curate.bigram_logprob) — one modeling step from
    unigram_logprob toward the CCNet/KenLM wikipedia-perplexity filter.
    Same float discipline: libm ln in one Arrow batch over the bigram
    table, integer nano-log doc sums."""
    from pg_vectorize_spark.operators.curate import bigram_logprob

    docs = _t(spark, sf_dir, "documents")
    return bigram_logprob(docs, "text", "doc_id")


PQ_CODEBOOK_PATH = "/root/repo/tests/fixtures/pq_codebook.json"


def _pq_fixture():
    """Committed codebook + FIXED query vector: both sides of the gate
    fold identical literals regardless of sf_dir (the committed-fixture
    analog of QUERY_TEXT)."""
    import json

    with open(PQ_CODEBOOK_PATH) as f:
        return json.load(f)


def q_pq_adc_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ADC search (operators/pq.py): vectors encode
    to m=8 four-bit codes against the committed codebook (32x smaller
    than float32); the query folds into per-subspace distance lookup
    tables as literals, so scoring is eight table lookups per row — the
    FAISS IVF-PQ scoring kernel re-expressed as Catalyst expressions.
    The oracle embeds the same codeword/table literals and mirrors the
    encode+score trees bit-for-bit."""
    from pg_vectorize_spark.operators.pq import (
        pq_adc_topk,
        pq_encode_pandas,
    )

    fix = _pq_fixture()
    cb = fix["codebook"]
    emb = _t(spark, sf_dir, "embeddings")
    # encode via the PRODUCTION (Arrow/numpy) path — bit-identical codes
    # to pq_encode_expr (asserted in tests/test_pq), so the oracle's
    # expression-mirroring encode still hash-matches transitively, and
    # the benched number reflects the deployment write path (~4x faster
    # than the interpreted expression fold at this SF)
    codes = pq_encode_pandas(emb, "vec_id", "embedding", cb)
    return pq_adc_topk(codes, "vec_id", fix["query_vec"], cb, k=10)


def q_pq_rerank_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PQ deployment shape under the gate (operators/pq.
    pq_adc_rerank_topk): compressed-scan ADC prunes to 50 candidates,
    a keyed semi-join pulls only those rows' float vectors, exact cosine
    reranks to top-10 — measured 0.90 recall@10 at 2.5% float reads on
    the clustered corpus at this candidate count (0.96 at top-100;
    SCALING.md table). Oracle composes the ADC CTE with the exact-cosine
    rerank in SQL."""
    from pg_vectorize_spark.operators.pq import (
        pq_adc_rerank_topk,
        pq_encode_pandas,
    )

    fix = _pq_fixture()
    cb = fix["codebook"]
    emb = _t(spark, sf_dir, "embeddings")

    # production Arrow encode — see q_pq_adc_search note
    codes = pq_encode_pandas(emb, "vec_id", "embedding", cb)
    return pq_adc_rerank_topk(
        codes, emb, "vec_id", "embedding", fix["query_vec"], cb,
        k=10, rerank_candidates=50,
    )


def q_maxsim_search_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best-matching-chunk retrieval (operators/ann.maxsim_topk): docs
    are scored by their best chunk vector, not a pooled average — the
    query-time counterpart of the chunk->embed ingest pipeline. Chunk
    grouping is synthesized as vec_id // 4 so the oracle is pure SQL
    over the embeddings table."""
    from pg_vectorize_spark.operators.ann import maxsim_topk

    emb = _t(spark, sf_dir, "embeddings").select(
        (F.col("vec_id") / 4).cast("long").alias("group_id"),
        F.col("embedding").alias("embeddings"),
    )
    qv = _query_vec(spark, sf_dir)
    return maxsim_topk(emb, "group_id", "embeddings", qv, k=10)


def q_quantized_search_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-k cosine over the int8-quantized embedding store
    (operators/ann.quantized_topk): integer codes + per-vector min/max
    replace the float vectors on the scan — the 4x-I/O storage layout a
    100-TB deployment persists. Dequantized scores mirror DuckDB
    tree-for-tree, so ranking parity is bit-exact under the gate."""
    from pg_vectorize_spark.operators.ann import quantized_topk

    emb = _t(spark, sf_dir, "embeddings")
    qt = V.quantize_table(emb, "embedding", keep_cols=["vec_id"]).drop("_vd")
    qv = _query_vec(spark, sf_dir)
    return quantized_topk(qt, "vec_id", qv, k=10)


def q_sample_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-k deterministic sample: 5 docs per language by hash priority
    (operators/curate.sample_exact) — the reproducible eval-subset draw."""
    from pg_vectorize_spark.operators.curate import sample_exact

    docs = _t(spark, sf_dir, "documents")
    out = sample_exact(docs.select("doc_id", "lang"), "doc_id", 5, "lang")
    return out.select("doc_id", "lang", "sample_rank")


def q_source_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source KL(source || corpus) over word distributions — corpus
    drift report (operators/curate.source_divergence); libm logs in one
    Arrow batch + pico-nat integer sums keep it bit-exact."""
    from pg_vectorize_spark.operators.curate import source_divergence

    docs = _t(spark, sf_dir, "documents")
    return source_divergence(docs, "text", "source")


def q_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document cap (operators/curate.domain_cap): at most 40
    docs per `source`, ranked by doc_id. The window shuffles on the domain
    key only; skew note in curate.py."""
    from pg_vectorize_spark.operators.curate import domain_cap

    docs = _t(spark, sf_dir, "documents")
    return domain_cap(
        docs.select("doc_id", "source"), "doc_id", "source", cap=40
    )


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (operators/curate.contamination_flags):
    flag corpus docs sharing any word 3-gram with the held-out benchmark
    slice (doc_id % 97 == 0). Inverted-index equi-join with the distinct
    benchmark grams broadcast — never a cross join."""
    from pg_vectorize_spark.operators.curate import contamination_flags

    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    return contamination_flags(corpus, bench, "doc_id", "text", k=3)


def q_embedding_truncate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka truncation 64->16 + renormalize
    (functions/vector.truncate_normalize_table); scalar projections
    (prefix norm, retained-energy fraction, unit-vector fold) so the
    harness hashes the normalized output."""
    emb = _t(spark, sf_dir, "embeddings")
    t = V.truncate_normalize_table(emb, "embedding", k=16, keep_cols=["vec_id"])
    sum_unit = F.when(
        F.col("norm_k") > 0,
        F.aggregate(
            F.col("unit"), F.lit(0.0), lambda acc, x: acc + x
        ),
    ).otherwise(F.lit(0.0))
    energy = F.when(
        F.col("norm_full") > 0, F.col("norm_k") / F.col("norm_full")
    ).otherwise(F.lit(0.0))
    return t.select(
        "vec_id",
        F.col("norm_k"),
        energy.alias("energy_frac"),
        sum_unit.alias("sum_unit"),
    )


def q_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar quantization of the embeddings table
    (functions/vector.quantize_exprs): per-vector affine codes — the 4x
    storage cut a 100-TB embedding store runs on. Output is scalar-only
    (min/max, integer code checksum, mean reconstruction error via
    left-fold) so the harness hashes it; a pure per-row projection."""
    emb = _t(spark, sf_dir, "embeddings")
    qt = V.quantize_table(emb, "embedding", keep_cols=["vec_id"])
    checksum = F.aggregate(
        F.col("codes"),
        F.lit(0).cast("long"),
        lambda acc, c: (acc * F.lit(31) + c.cast("long")) % F.lit(1_000_003),
    )
    err = V.quantization_error_expr(
        F.col("_vd"), F.col("codes"), F.col("mn"), F.col("mx")
    )
    return qt.select(
        "vec_id",
        F.col("mn"),
        F.col("mx"),
        checksum.alias("code_checksum"),
        err.alias("recon_err"),
    )


def q_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(source, lang) curation report (operators/curate.corpus_stats):
    exact integer sums + one post-aggregation division, so values are
    shuffle-order independent. Map-side partial agg -> one shuffle on the
    group keys."""
    from pg_vectorize_spark.operators.curate import corpus_stats

    docs = _t(spark, sf_dir, "documents")
    return corpus_stats(docs, ["source", "lang"], "text")


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: group identical texts, keep min doc_id."""
    docs = _t(spark, sf_dir, "documents")
    return docs.groupBy("text").agg(
        F.min("doc_id").alias("keep_id"),
        F.count(F.lit(1)).alias("n_copies"),
    ).select("keep_id", "n_copies")


def q_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine kNN join: top-3 neighbors for each of the first 10 vectors
    — the label_col=None form of ann.hard_negative_mining (one shared
    definition of the broadcast-anchors + per-anchor-rank shape, so the
    tie-break contract has a single home)."""
    from pg_vectorize_spark.operators.ann import hard_negative_mining

    emb = _t(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("probe_vec")
    )
    return hard_negative_mining(
        emb.select("vec_id", "embedding"),
        probes,
        "vec_id",
        "embedding",
        label_col=None,
        k=3,
        anchor_key="probe_id",
        anchor_vec="probe_vec",
    )


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-word-shingle Jaccard near-dup pairs via inverted index, with the
    stop-shingle frequency cap that bounds reducer fan-out on hot shingles
    (df > 50 shingles are boilerplate, not dedup signal)."""
    from pg_vectorize_spark.operators.dedup import ngram_jaccard_pairs

    docs = _t(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(
        docs, "text", "doc_id", k=3, threshold=0.2, max_shingle_df=50
    )


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(16) + 4x4 banded LSH candidate pairs."""
    from pg_vectorize_spark.operators.dedup import (
        minhash_lsh_candidates,
        minhash_signatures,
    )

    docs = _t(spark, sf_dir, "documents")
    # r13 optimization round: the collapse references the signature
    # pipeline from two differently-keyed exchanges (groupBy partial-agg
    # vs plain join side), which ReuseExchange cannot unify — checkpoint
    # so the shingle scan runs once (see q_dedup_minhash_unicode).
    sigs = minhash_signatures(
        docs, "text", "doc_id", num_hashes=16, k=3
    ).localCheckpoint(eager=False)
    return minhash_lsh_candidates(sigs, bands=4, rows_per_band=4)


def _mh_gate_index(spark: SparkSession, sf_dir: str):
    """Build (or reuse) the persisted MinHash band index over the
    CORPUS side of the documents fixture (doc_id % 20 != 7) — same
    scratch-dir + source-fingerprint pattern as the FTS/ANN indexed
    gates, so bench repeats time the PROBE, not a rebuild."""
    import os
    import tempfile

    from pg_vectorize_spark.dedup_index import MinHashBandIndexManager

    sfname = os.path.basename(sf_dir.rstrip("/")) or "sf"
    idx_dir = os.path.join(
        tempfile.gettempdir(), f"pvs_gate_mh_index_{sfname}"
    )
    cfg = {
        "num_hashes": 16,
        "bands": 4,
        "shingle_k": 3,
        "band_buckets": 64,
    }
    mgr = MinHashBandIndexManager(spark, idx_dir, cfg)
    fp = _source_fingerprint(os.path.join(sf_dir, "documents.parquet"))
    fp += repr(sorted(cfg.items()))
    fp_path = os.path.join(idx_dir, "_SOURCE_FP")
    fresh = False
    try:
        with open(fp_path) as fh:
            fresh = fh.read() == fp and mgr.exists()
    except OSError:
        pass
    if not fresh:
        corpus = _t(spark, sf_dir, "documents").filter(
            F.col("doc_id") % 20 != 7
        )
        mgr.build(corpus, "doc_id", "text")
        with open(fp_path, "w") as fh:
            fh.write(fp)
    return mgr


def q_neardup_index_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Online near-dup detection against the PERSISTED MinHash band
    index (dedup_index.MinHashBandIndexManager): an incoming batch
    (doc_id % 20 == 7, ~5% of docs) probes the corpus index and gets
    every indexed near-dup candidate with the MinHash Jaccard estimate
    attached — the "filter new ingest against everything already seen"
    shape a 100-TB pipeline runs per micro-batch. The probe is O(batch):
    batch signatures → band rows → broadcast equi-join against the
    band-bucket-pruned index scan (PartitionFilters on bb, plan-locked
    in tests/test_dedup_index.py) → signature compare via the stored
    sidecar. The ORACLE recomputes both sides' signatures and the band
    join from the raw fixture — identical pairs and estimates to the
    batch LSH pipeline by construction (pinned in
    tests/test_dedup_index.py::TestProbeParity)."""
    docs = _t(spark, sf_dir, "documents")
    mgr = _mh_gate_index(spark, sf_dir)
    batch = docs.filter(F.col("doc_id") % 20 == 7)
    return mgr.probe(batch, "doc_id", "text")


def q_neardup_probe_local(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The r10 DRIVER-SIDE probe path (dedup_local.py +
    MinHashBandIndexManager.probe_local): the same batch/corpus split as
    `neardup_index_probe`, but signatures, band rows, and partition
    buckets computed in-process (the small-micro-batch realtime shape —
    two pruned scans, no signature shuffle). SAME oracle as the Spark
    probe: the two paths are bit-parity by construction
    (tests/test_dedup_local.py), and this gate pins that equivalence
    against DuckDB every round."""
    docs = _t(spark, sf_dir, "documents")
    mgr = _mh_gate_index(spark, sf_dir)
    batch = [
        (r["doc_id"], r["text"])
        for r in docs.filter(F.col("doc_id") % 20 == 7)
        .select("doc_id", "text")
        .collect()
    ]
    rows = mgr.probe_local(
        mgr.signatures_local(batch), "doc_id", "bigint"
    )
    return spark.createDataFrame(
        rows, "doc_id bigint, match_doc_id bigint, est_jaccard double"
    )


def q_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures themselves (the write-time artifact)."""
    from pg_vectorize_spark.operators.dedup import minhash_signatures

    docs = _t(spark, sf_dir, "documents")
    sigs = minhash_signatures(docs, "text", "doc_id", num_hashes=16, k=3)
    # CSV-serialize the signature so the oracle harness can hash the column
    return sigs.select(
        F.col("_id").alias("doc_id"),
        F.array_join(
            F.transform(F.col("signature"), lambda x: x.cast("string")), ","
        ).alias("signature"),
    )


def q_minhash_jaccard_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH verify stage: estimated Jaccard (agreeing-component fraction)
    for every banded candidate pair — precision filter over the
    recall-oriented candidates, touching only fixed-size signatures."""
    from pg_vectorize_spark.operators.dedup import (
        minhash_jaccard_estimate,
        minhash_lsh_candidates,
        minhash_signatures,
    )

    docs = _t(spark, sf_dir, "documents")
    # r13 optimization round: five downstream consumers (collapse
    # groupBy/join, band rows, both estimate-join sides) — one
    # checkpoint = one shingle scan (see q_dedup_minhash_unicode).
    sigs = minhash_signatures(
        docs, "text", "doc_id", num_hashes=16, k=3
    ).localCheckpoint(eager=False)
    cands = minhash_lsh_candidates(sigs, bands=4, rows_per_band=4)
    return minhash_jaccard_estimate(sigs, cands, num_hashes=16)


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """20-bit SimHash fingerprint per document."""
    from pg_vectorize_spark.operators.dedup import simhash_expr

    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", simhash_expr(F.col("text"), bits=20).alias("simhash")
    )


def q_simhash_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs at hamming <= 6."""
    from pg_vectorize_spark.operators.dedup import simhash_pairs

    docs = _t(spark, sf_dir, "documents")
    return simhash_pairs(docs, "text", "doc_id", bits=20, max_hamming=3)


def q_dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs, sign-bit-LSH bucketed: candidates
    are pairs whose 8-bit sign buckets differ in <= 1 bit (hash equi-join,
    no CartesianProduct), exact cosine rescore. The oracle mirrors the
    bucket prefilter, so this checks the bucketed semantics bit-for-bit;
    recall vs the exact crossJoin is calibrated in tests/test_dedup.py."""
    from pg_vectorize_spark.operators.dedup import cosine_neardup_pairs_bucketed

    emb = _t(spark, sf_dir, "embeddings")
    # threshold sized to the synthetic corpus (max pairwise cosine ~0.51)
    return cosine_neardup_pairs_bucketed(
        emb, "vec_id", "embedding", threshold=0.35, nbits=8, probe_hamming=1
    )


def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training data: per anchor,
    the top-5 most-similar corpus vectors with a DIFFERENT label
    (ann.hard_negative_mining) — broadcast anchors x one corpus scan,
    per-anchor rank window."""
    from pg_vectorize_spark.operators.ann import hard_negative_mining

    emb = _t(spark, sf_dir, "embeddings")
    anchors = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("embedding").alias("anchor_vec"),
        F.col("label").alias("anchor_label"),
    )
    return hard_negative_mining(
        emb.select("vec_id", "embedding", "label"),
        anchors,
        "vec_id",
        "embedding",
        "label",
        k=5,
    )


def q_hard_negatives_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-probed hard-negative mining (VERDICT r6 #5) — the
    large-anchor-set shape ann.hard_negative_mining's docstring
    promises: anchors assign to their nprobe nearest cells of the
    PERSISTED index (the same one semantic_search_indexed probes), the
    scan prunes to those cells at the parquet source, and the pair
    space is the per-cell equi-join instead of anchors x corpus.

    THE ORACLE MIRRORS THE PROBE SEMANTICS INDEPENDENTLY IN SQL
    (first-8 centroids, argmax cell assignment, per-anchor top-6
    probed cells, ranking restricted to them) rather than sharing the
    broadcast variant's oracle: unlike same-cluster top-k search, the
    nearest DIFFERENT-label negative can legitimately live in an
    unprobed cell (measured: 1 of 25 rows differs from the broadcast
    ranking at nprobe=7 on sf0.01), so broadcast-exactness would
    require nprobe=8 — no pruning, a sham gate. The recall floor vs
    the broadcast ranking is pinned in tests/test_ann.py; the
    SCALING.md row measures the pair-space reduction at 10x anchors."""
    from pg_vectorize_spark.operators.ann import (
        hard_negative_mining_indexed,
    )

    emb = _t(spark, sf_dir, "embeddings")
    mgr = _ann_gate_index(spark, sf_dir)
    anchors = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("embedding").alias("anchor_vec"),
        F.col("label").alias("anchor_label"),
    )
    return hard_negative_mining_indexed(
        spark,
        mgr.index_dir,
        mgr.centroids_df(),
        anchors,
        "vec_id",
        "embeddings",
        labels_df=emb.select("vec_id", "label"),
        label_col="label",
        k=5,
        nprobe=6,
    )


def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-Flat: 8 deterministic centroids, probe 2 cells, exact rescore."""
    from pg_vectorize_spark.operators.ann import default_centroids, ivf_topk

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").alias("embeddings")
    )
    cents = default_centroids(emb, "vec_id", "embeddings", n_centroids=8)
    qv = _query_vec(spark, sf_dir)
    return ivf_topk(
        emb, cents, "vec_id", "embeddings", qv, k=10, nprobe=2
    )


def q_ann_signbit_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-bit LSH bucket pruning + exact rescore."""
    from pg_vectorize_spark.operators.ann import signbit_lsh_topk

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").alias("embeddings")
    )
    qv = _query_vec(spark, sf_dir)
    return signbit_lsh_topk(emb, "vec_id", "embeddings", qv, k=10, nbits=8)


def q_ann_multiprobe_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe sign-bit LSH: the Hamming-ball probe set (radius 2 over
    8 bits -> 37 buckets) recovers neighbors whose near-zero coordinates
    flipped sign — the recall/scan-fraction tradeoff measured in
    SCALING.md. Oracle side expresses the same ball as
    bit_count(xor(bucket, qbucket)) <= 2."""
    from pg_vectorize_spark.operators.ann import signbit_lsh_topk

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").alias("embeddings")
    )
    qv = _query_vec(spark, sf_dir)
    return signbit_lsh_topk(
        emb, "vec_id", "embeddings", qv, k=10, nbits=8, probe_hamming=2
    )


def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling plumbing over binary media: one row per
    stride-byte offset, frame bytes sliced JVM-side (posexplode over
    computed offsets — multimodal/binary.frame_sample)."""
    from pg_vectorize_spark.multimodal.binary import frame_sample

    docs = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 200)
        .select("doc_id", F.encode(F.col("text"), "utf-8").alias("content"))
    )
    frames = frame_sample(docs, "content", "doc_id", stride=256)
    return frames.select(
        "doc_id",
        "frame_idx",
        "offset",
        F.length("frame_bytes").cast("long").alias("frame_len"),
        F.md5("frame_bytes").alias("frame_hash"),
    )


def q_mp4_frame_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL MP4 frame extraction under the hash gate: per document a
    deterministic MP4 is assembled (codec.encode_mp4_with_samples —
    full stts/stss/stsc/stsz/stco sample tables + mdat payloads), then
    ``mp4_frame_sample`` walks the ISO-BMFF tables and slices each coded
    sample's exact byte range back out. The oracle recomputes offsets
    from the spec-derived closed form for the box sizes
    (payload_start = 441 + 4*(n + n_chunks + n_keyframes)), sizes/
    timestamps/keyframes from the generation laws, and the payload md5
    from the repeated-character law — independent arithmetic, not a
    re-run of the codec."""
    import pandas as pd

    from pg_vectorize_spark.multimodal.binary import mp4_frame_sample

    docs = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 40)
        .select("doc_id")
    )

    def build(batches):
        from pg_vectorize_spark.multimodal.codec import (
            encode_mp4_with_samples,
        )

        for pdf in batches:
            out = {"doc_id": [], "video": []}
            for d in pdf["doc_id"]:
                d = int(d)
                n = 3 + d % 5
                ke = 2 + d % 3
                samples = [
                    bytes([97 + (d + i) % 26]) * (10 + (d * 3 + i * 7) % 23)
                    for i in range(n)
                ]
                out["doc_id"].append(d)
                out["video"].append(
                    encode_mp4_with_samples(
                        samples,
                        samples_per_chunk=2,
                        fps=10,
                        keyframe_every=ke,
                    )
                )
            yield pd.DataFrame(out)

    blobs = docs.mapInPandas(build, schema="doc_id long, video binary")
    frames = mp4_frame_sample(blobs, "video", "doc_id")
    return frames.select(
        F.col("pkey").alias("doc_id"),
        "frame_idx",
        "offset",
        F.col("size").alias("frame_size"),
        "ts_seconds",
        "keyframe",
        F.md5("frame_bytes").alias("frame_hash"),
    )


def q_semantic_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-level benchmark decontamination
    (curate.semantic_contamination_flags): train docs at cosine >=
    threshold to ANY benchmark item are flagged — the semantic
    complement of the n-gram `decontaminate` gate, catching
    paraphrased leakage. Candidates via the sign-bit-LSH bucket
    equi-join (hamming <= 1 on 8 bits, no cartesian); the oracle
    mirrors the bucket prefilter + exact rescore + per-train argmax
    bit-for-bit, like dedup_embedding_cosine."""
    from pg_vectorize_spark.operators.curate import (
        semantic_contamination_flags,
    )

    emb = _t(spark, sf_dir, "embeddings")
    train = emb.filter(F.col("vec_id") >= 50).select(
        "vec_id", F.col("embedding").alias("emb")
    )
    bench = emb.filter(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("bid"), F.col("embedding").alias("bemb")
    )
    return semantic_contamination_flags(
        train, "vec_id", "emb", bench, "bid", "bemb", threshold=0.3
    )


def q_job_hybrid_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ENGINE-LIFECYCLE gate: the full ``VectorizeSession`` path —
    create_job on the documents fixture (hash-embedder model, persisted
    IVF ANN index AND FTS postings index built at init), scan_job
    (change detection -> Arrow embed -> snapshot merge -> token refresh
    -> index freshness hooks), then ``hybrid_search()`` — end-to-end
    under the hash gate, not just the operator layer pytest covers.

    Oracle: the hash-BoW embedder is SQL-expressible by design
    (providers/local.py: numpy ≡ Spark exprs ≡ DuckDB lambdas,
    bit-for-bit — bucket counts are exact integers so normalization
    order cannot diverge), so DuckDB recomputes document + query
    embeddings, the normalize-at-write dot-product scores, the token
    overlap branch, and the RRF fusion from the raw fixture alone. The
    ANN probe runs FULL-width (nprobe = n_centroids) so index results
    equal the brute ranking exactly (partial-probe pruning is gated
    separately by semantic_search_indexed); the FTS postings probe is
    lossless at any width. The workspace is cached per SF behind the
    source fingerprint (_cached_gate_session) — repeated invocations
    time the QUERY path, like a deployed engine."""
    sess = _cached_gate_session(
        spark,
        sf_dir,
        "pvs_gate_ws",
        "gate",
        index_method="ivf",
        index_params={"n_centroids": 8, "nprobe": 8},
    )
    rows = sess.hybrid_search(
        "gate",
        QUERY_TEXT,
        num_results=10,
        window_size=50,
        return_columns=["doc_id", "lang"],
    )
    return spark.createDataFrame(
        [
            (
                r["doc_id"],
                r["lang"],
                r["rrf_score"],
                r["semantic_rank"],
                r["fts_rank"],
                r["similarity_score"],
            )
            for r in rows
        ],
        "doc_id long, lang string, rrf_score double, semantic_rank int, "
        "fts_rank int, similarity_score double",
    )


def q_curate_job_search_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL-DATA-PATH seam gate (VERDICT r11 #4): raw docs ->
    ingest-time CURATION gate (curate_params: min_quality + min_tokens,
    engine._curate_filter) -> ingest-time MinHash DEDUP gate
    (dedup_params with within_batch=True — on the initial load every
    row is new, so the in-batch lowest-key-survives rule IS the corpus
    dedup, engine._dedup_filter_new) -> embed -> snapshot/index
    maintenance -> hybrid_search. `corpus_to_shards` proves the
    curation pipeline and `job_hybrid_e2e` the job lifecycle; this
    gate proves the SEAM a real deployment runs — curated survivors
    becoming the embedding job's corpus, search serving ONLY them.

    Oracle: DuckDB replays the survivor set (quality/token filter,
    then banded MinHash pairs at the same 16-hash/4-band parameters
    with est_jaccard >= threshold, smaller-key-survives greedy chain)
    and re-derives hash-BoW embeddings + FTS + RRF over the survivors
    alone — a hit for a filtered-out document anywhere in the top-10
    breaks the gate. Same full-width ANN probe rationale as
    job_hybrid_e2e (index ranking == brute, pruning gated separately).
    Workspace cached per SF behind the source fingerprint
    (_cached_gate_session)."""
    sess = _cached_gate_session(
        spark,
        sf_dir,
        "pvs_gate_cws",
        "cgate",
        index_method="ivf",
        index_params={"n_centroids": 8, "nprobe": 8},
        curate_params={"min_quality": 0.5, "min_tokens": 8},
        dedup_params={"min_jaccard": 0.7, "within_batch": True},
    )
    rows = sess.hybrid_search(
        "cgate",
        QUERY_TEXT,
        num_results=10,
        window_size=50,
        return_columns=["doc_id", "lang"],
    )
    return spark.createDataFrame(
        [
            (
                r["doc_id"],
                r["lang"],
                r["rrf_score"],
                r["semantic_rank"],
                r["fts_rank"],
                r["similarity_score"],
            )
            for r in rows
        ],
        "doc_id long, lang string, rrf_score double, semantic_rank int, "
        "fts_rank int, similarity_score double",
    )


def q_mp3_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL MPEG-audio frame-header parsing under the hash gate
    (codec.parse_mp3_frames / binary.mp3_metadata): per document a
    syntactically valid Layer-III stream is assembled from deterministic
    laws (version, sample-rate index, CBR/VBR bitrate sequence, padding
    bits, optional ID3v2 tag, optional CRC flag), then the parser walks
    the 4-byte headers — ID3 skip, sync check, per-frame length
    arithmetic — and reports the routing metadata an audio corpus pass
    needs. The oracle recomputes EVERYTHING analytically from the same
    laws (spec frame-length formula coef*kbps*1000 // sr + pad, spf
    1152/576, bitrate tables as list literals) — independent
    arithmetic, not a re-run of the parser. Payload decode stays an
    honest NotImplementedError (codec.py)."""
    import pandas as pd

    from pg_vectorize_spark.multimodal.binary import mp3_metadata

    docs = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 60)
        .select("doc_id")
    )

    def build(batches):
        from pg_vectorize_spark.multimodal.codec import encode_mp3_frames

        for pdf in batches:
            out = {"doc_id": [], "audio": []}
            for d in pdf["doc_id"]:
                d = int(d)
                version = "MPEG2" if d % 5 == 4 else "MPEG1"
                n = 4 + d % 6
                specs = [
                    (1 + ((d + 3 * i * (d % 2)) % 14), (d + i) % 2)
                    for i in range(n)
                ]
                out["doc_id"].append(d)
                out["audio"].append(
                    encode_mp3_frames(
                        specs,
                        version=version,
                        sr_idx=d % 3,
                        channel_mode=d % 4,
                        crc=(d % 7 == 0),
                        id3_size=(20 + d) if d % 3 == 0 else None,
                    )
                )
            yield pd.DataFrame(out)

    blobs = docs.mapInPandas(build, schema="doc_id long, audio binary")
    meta = mp3_metadata(blobs, "audio", "doc_id")
    return meta.select(
        F.col("pkey").alias("doc_id"),
        "version",
        "sample_rate",
        "channel_mode",
        "n_frames",
        "duration_seconds",
        "bitrate_kbps_mean",
        "is_vbr",
        "has_id3",
        "has_crc",
        "first_frame_offset",
        "stream_bytes",
    )


def q_dedup_semantic_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup (Abbas et al. 2023): coarse-cluster
    the embeddings (deterministic first-8 centroids — the IVF assignment
    stage), then mark rows with a lower-key same-cluster neighbor at
    cosine >= threshold as duplicates. Threshold sized to the synthetic
    corpus (max pairwise cosine ~0.51). The oracle replicates the
    argmax-cosine assignment (ties -> lowest centroid) and the pair rule
    in SQL."""
    from pg_vectorize_spark.operators.ann import default_centroids
    from pg_vectorize_spark.operators.dedup import semantic_cluster_dedup

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").alias("embeddings")
    )
    cents = default_centroids(emb, "vec_id", "embeddings", n_centroids=8)
    return semantic_cluster_dedup(
        emb, "vec_id", "embeddings", cents, threshold=0.35
    )


def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR hashed importance weights (Xie et al. 2023): every document
    scored by ln p_target/p_raw over hashed unigram buckets — target =
    the English slice, raw = the whole corpus, so positive weights read
    "more target-like than average". Per-bucket log-ratios are floored
    to integer nano-units (one Arrow libm batch), making the per-doc
    sum an exact BIGINT aggregate the oracle reproduces bit-for-bit."""
    from pg_vectorize_spark.operators.curate import dsir_log_weights

    docs = _t(spark, sf_dir, "documents")
    return dsir_log_weights(
        docs,
        docs.filter(F.col("lang") == "en"),
        "text",
        "doc_id",
        n_buckets=256,
    )


def q_batch_texts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R3 count batching: batch aggregates over documents (batch_size=100)."""
    from pg_vectorize_spark.operators.change import batch_by_count

    docs = _t(spark, sf_dir, "documents")
    batched = batch_by_count(docs, "doc_id", batch_size=100)
    return batched.groupBy("batch_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.min("doc_id").alias("first_id"),
        F.max("doc_id").alias("last_id"),
    )


def q_token_budget_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R4 distributed token-budget batching (running-sum spec, budget=5000)."""
    from pg_vectorize_spark.operators.change import (
        batch_by_token_budget_distributed,
    )

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", T.token_count_expr(F.col("text")).alias("n_tokens")
    )
    batched = batch_by_token_budget_distributed(
        docs, "doc_id", "n_tokens", budget=5000
    )
    return batched.groupBy("batch_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("batch_tokens"),
    )


def q_chunk_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5 distributed chunking (offset-bucket spec, 200 chars)."""
    from pg_vectorize_spark.operators.chunk import chunk_table_distributed

    docs = _t(spark, sf_dir, "documents")
    return chunk_table_distributed(docs, "text", "doc_id", max_chunk_size=200)


def q_where_sql_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4: raw where_sql filter via F.expr — identical text runs in both."""
    docs = _t(spark, sf_dir, "documents")
    return docs.filter(
        F.expr("n_chars > 200 AND lang = 'en'")
    ).select("doc_id", "lang", "n_chars")


def q_typed_filters_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2/P3 typed filters on the part table (numeric + string ops)."""
    from pg_vectorize_spark.filters import apply_filters, parse_filters

    part = _t(spark, sf_dir, "part")
    filters = parse_filters(
        {"p_retailprice": "gte.950.5", "p_size": "lt.25", "p_type": "eq.PROMO"}
    )
    return apply_filters(part, filters).select(
        "p_partkey", "p_name", "p_type", "p_size", "p_retailprice"
    )


def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing: text -> binary column -> typed metadata."""
    from pg_vectorize_spark.multimodal.binary import binary_metadata

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("content")
    )
    return binary_metadata(docs, "content").select(
        "doc_id", "byte_len", "content_hash"
    )


def q_events_windowed_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregation (streaming-shape batch check).

    Sums go through decimal(18,4) so they're order-independent and exact —
    double sums would be shuffle-order-dependent.
    """
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(
            F.window(F.col("ts"), "1 hour")["start"].alias("window_start"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)"))
            .cast("double")
            .alias("sum_value"),
        )
    )


def q_incremental_scan_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Freshness scan with pushdown-friendly predicates (S1-adjacent)."""
    ev = _events(spark, sf_dir)
    return ev.filter(
        (F.col("ts") > F.lit("2024-01-20 00:00:00").cast("timestamp"))
        & (F.col("event_type") == "click")
    ).select("event_id", "ts", "user_id", "value")


def q_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: per-user 30-min-gap sessions via lag + running sum."""
    ev = _events(spark, sf_dir)
    w_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = 30 * 60 * 1_000_000
    with_prev = ev.withColumn(
        "_prev_us", F.lag(F.unix_micros(F.col("ts"))).over(w_user)
    )
    flagged = with_prev.withColumn(
        "_new_session",
        F.when(
            F.col("_prev_us").isNull()
            | ((F.unix_micros(F.col("ts")) - F.col("_prev_us")) > gap_us),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sessions = flagged.withColumn(
        "session_id", F.sum("_new_session").over(w_run).cast("long")
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


def q_asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each click attached to the user's most recent prior
    purchase (point-in-time attribution). Single-shuffle union+window
    shape — never the O(n·m)-per-key range-join plan."""
    from pg_vectorize_spark.operators.asof import asof_join

    ev = _events(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value", "event_id"
    )
    out = asof_join(
        clicks,
        purchases,
        on="user_id",
        left_ts="ts",
        right_cols=["value"],
        right_tie="event_id",
    )
    # sentinel-fill the no-match rows: null timestamps hash/compare
    # inconsistently across engine->pandas paths (NaT != NaT)
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.coalesce(
            F.col("ts_right"), F.lit("1970-01-01 00:00:00").cast("timestamp")
        ).alias("purchase_ts"),
        F.coalesce(F.col("value"), F.lit(-1.0)).alias("purchase_value"),
    )


def q_asof_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hot-key-safe as-of shape: partitioned by (user, 1-day bucket)
    with cross-bucket carry-ins, plus a 6-hour staleness tolerance.
    Same semantics as `asof_join_events` restricted to fresh matches."""
    from pg_vectorize_spark.operators.asof import asof_join_bucketed

    ev = _events(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value", "event_id"
    )
    out = asof_join_bucketed(
        clicks,
        purchases,
        on="user_id",
        left_ts="ts",
        bucket_seconds=86_400.0,
        right_cols=["value"],
        right_tie="event_id",
        tolerance_seconds=6 * 3600.0,
    )
    # sentinel-fill the no-match rows: null timestamps hash/compare
    # inconsistently across engine->pandas paths (NaT != NaT)
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.coalesce(
            F.col("ts_right"), F.lit("1970-01-01 00:00:00").cast("timestamp")
        ).alias("purchase_ts"),
        F.coalesce(F.col("value"), F.lit(-1.0)).alias("purchase_value"),
    )


def q_attribution_window_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval (range) join: every click inside any purchase's 2-hour
    attribution window, per user. Bucketed equi-join on (user, 2h time
    bucket) + exact containment recheck — never a nested-loop pair scan
    (operators/asof.interval_join)."""
    from pg_vectorize_spark.operators.asof import interval_join

    ev = _events(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id"),
        F.col("event_id").alias("purchase_eid"),
        F.col("ts").alias("win_start"),
        (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("win_end"),
    )
    out = interval_join(
        clicks,
        purchases,
        on="user_id",
        point_ts="ts",
        start_ts="win_start",
        end_ts="win_end",
        bucket_seconds=7200.0,
    )
    gap = (
        F.unix_micros(F.col("ts")) - F.unix_micros(F.col("win_start"))
    ).cast("double") / F.lit(1_000_000.0)
    return out.select(
        "event_id", "purchase_eid", "user_id", gap.alias("gap_sec")
    )


def q_collect_changed_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: trigger-style array_agg of changed pkeys per micro-batch.

    Batches = 100-doc groups; each yields one row with the sorted id array
    (the JobMessage record_ids payload shape)."""
    from pg_vectorize_spark.operators.change import batch_by_count

    docs = _t(spark, sf_dir, "documents")
    changed = docs.filter(F.col("n_chars") > 250)
    batched = batch_by_count(changed, "doc_id", batch_size=100)
    record_ids = F.array_join(
        F.transform(
            F.sort_array(F.collect_list("doc_id")), lambda x: x.cast("string")
        ),
        ",",
    )
    return batched.groupBy("batch_id").agg(
        record_ids.alias("record_ids"),
        F.count(F.lit(1)).alias("n_ids"),
    )


def q_json_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F11/S9: to_jsonb(t)-style row shaping — results as JSON objects."""
    docs = _t(spark, sf_dir, "documents")
    return docs.filter(F.col("doc_id") < 50).select(
        "doc_id",
        F.to_json(F.struct("doc_id", "lang", "source", "n_chars")).alias(
            "row_json"
        ),
    )


def q_append_method_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2: append-method freshness scan — single-table predicate
    (updated > COALESCE(embedded_at, -infinity))."""
    from pg_vectorize_spark.operators.change import detect_changes_append

    ev = _events(spark, sf_dir)
    # synthesize the append-method column: every 3rd event already embedded
    # at its own ts; others pending
    wide = ev.withColumn(
        "emb_updated_at",
        F.when(F.col("event_id") % 3 == 0, F.col("ts")),
    )
    changed = detect_changes_append(wide, "ts", "emb_updated_at")
    return changed.select("event_id", "event_type")


def q_hybrid_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension-mode weighted fusion + post-fusion filter + where_sql."""
    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), F.col("embedding").alias("embeddings")
    )
    qv = _query_vec(spark, sf_dir)
    return hybrid_search(
        docs.select("doc_id", "lang", "n_chars"),
        emb,
        "doc_id",
        qv,
        QUERY_TEXT,
        text_cols=["text"],
        num_results=10,
        window_size=40,
        rrf_k=60,
        semantic_weight=0.25,
        fts_weight=0.75,
        filters=parse_filters({"lang": "eq.en"}),
        where_sql="n_chars > 100",
        tokens_df=docs.select(
            "doc_id", T.tokens_expr(F.col("text")).alias("search_tokens")
        ),
    )


def q_hybrid_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite gate (VERDICT r4 #6): BM25-ranked FTS branch INSIDE the
    RRF fusion path — ``hybrid_search(rank='bm25')``. The eager corpus
    stats collect inside bm25_scores runs at plan-build time; this pins
    its interaction with the union+hash-agg fusion and the broadcast
    join-back under the hash gate (fts_bm25 and hybrid_weighted are
    separately green; the composition was previously untested)."""
    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), F.col("embedding").alias("embeddings")
    )
    qv = _query_vec(spark, sf_dir)
    return hybrid_search(
        docs.select("doc_id", "lang", "n_chars", "text"),
        emb,
        "doc_id",
        qv,
        QUERY_TEXT,
        text_cols=["text"],
        num_results=10,
        window_size=50,
        rrf_k=60,
        return_columns=["doc_id", "lang", "n_chars"],
        tokens_df=docs.select(
            "doc_id", T.tokens_expr(F.col("text")).alias("search_tokens")
        ),
        rank="bm25",
    )


def q_cdf_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-equivalent of ChangeFeedPipeline (VERDICT r4 #5): a synthetic
    change-event log — preimage/postimage pairs, deletes, resurrection
    inserts, and SAME-VERSION insert+delete ties — applied over a base
    snapshot via operators/change.apply_change_events. Registers the
    latest-event-per-key + delete-wins + cascade semantics under the hash
    gate; the oracle is DuckDB QUALIFY row_number + anti-joins."""
    from pg_vectorize_spark.operators.change import apply_change_events

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    base = docs.filter(F.col("doc_id") < 300)
    ct = "_change_type"

    def ev(df, ctype, version, text_col):
        return df.select(
            "doc_id",
            text_col.alias("text"),
            F.lit(ctype).alias(ct),
            F.lit(version).alias("_version"),
        )

    upd = docs.filter((F.col("doc_id") >= 250) & (F.col("doc_id") < 350))
    sevens = docs.filter((F.col("doc_id") < 300) & (F.col("doc_id") % 7 == 0))
    fourteens = docs.filter(
        (F.col("doc_id") < 300) & (F.col("doc_id") % 14 == 0)
    )
    ties = docs.filter((F.col("doc_id") >= 100) & (F.col("doc_id") < 120))
    null_text = F.lit(None).cast("string")
    events = (
        ev(upd, "update_preimage", 10, F.col("text"))  # dropped by rule 1
        .unionByName(
            ev(upd, "update_postimage", 10, F.concat(F.lit("v2 "), "text"))
        )
        .unionByName(ev(sevens, "delete", 20, null_text))
        .unionByName(
            ev(fourteens, "insert", 30, F.concat(F.lit("back "), "text"))
        )
        .unionByName(
            ev(ties, "update_postimage", 40, F.concat(F.lit("tie "), "text"))
        )
        .unionByName(ev(ties, "delete", 40, null_text))  # tie: delete wins
    )
    return apply_change_events(
        base, events, "doc_id", change_type_col=ct, version_col="_version"
    )


def q_fts_stemmed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stemmed FTS via the default 'english' analyzer and the INLINE
    tokens path (no precomputed tokens_df) — "running" matches "run".
    Fully oracle-checked now that the light stemmer is SQL-expressible;
    the Porter UDF variant ('english_porter') stays pytest-golden-tested."""
    docs = _t(spark, sf_dir, "documents")
    return full_text_search(
        docs.select("doc_id", "lang", "text"),
        "doc_id",
        STEM_QUERY_TEXT,  # inflected forms only
        text_cols=["text"],
        num_results=10,
        return_columns=["doc_id", "lang"],
        analyzer="english",
    )


def q_fts_cover_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 ts_rank_cd analog: overlap score + positional cover-density bonus
    (min-gap 1/distance over matched term pairs, deterministic sorted fold).
    Re-ranks multi-term queries by proximity, like the reference's
    ts_rank_cd (core/src/query.rs:764-776)."""
    docs = _t(spark, sf_dir, "documents")
    return full_text_search(
        docs.select("doc_id", "lang", "text"),
        "doc_id",
        QUERY_TEXT,
        text_cols=["text"],
        num_results=10,
        return_columns=["doc_id", "lang"],
        rank="cover_density",
    )


def q_fts_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 rank option for FTS (operators/search.bm25_scores): tf
    from the analyzer token MULTISET, corpus stats (N, df, avgdl) via one
    map-side-combined aggregate broadcast back — no corpus shuffle. The
    reference ranks with ts_rank_cd (core/src/query.rs:764-776); BM25 is
    the published alternative exposed as rank='bm25'."""
    docs = _t(spark, sf_dir, "documents")
    return full_text_search(
        docs.select("doc_id", "lang", "text"),
        "doc_id",
        QUERY_TEXT,
        text_cols=["text"],
        num_results=10,
        return_columns=["doc_id", "lang"],
        rank="bm25",
    )


def q_orders_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-join rollup: revenue per region x order priority.

    Exercises the shuffle/broadcast strategy on the TPC-H-ish tables:
    lineitem ⋈ orders shuffles on the fact keys, the dimension chain
    (customer, nation, region) broadcasts. Money math in decimal so the
    result is shuffle-order independent.
    """
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        (
            F.col("l_extendedprice").cast("decimal(18,4)")
            * (F.lit(1).cast("decimal(18,4)") - F.col("l_discount").cast("decimal(18,4)"))
        ).alias("rev"),
    )
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    )
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    region = _t(spark, sf_dir, "region")
    joined = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
    )
    return joined.groupBy("r_name", "o_orderpriority").agg(
        F.sum("rev").cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


def q_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-gate filtering — the curation step that keeps docs above a
    composite-score threshold.

    r13 optimization round: the flat select+filter form evaluated the
    FULL score tree twice per row (Catalyst pushes the predicate below
    the Project, duplicating it into the Filter condition) with the
    words subtree 4x inside each evaluation. The bound score behind an
    explode-over-singleton barrier evaluates once per row; values are
    bit-identical (scripts/quality_bind_probe.py asserts exact equality;
    interleaved A/B 0.995 s -> 0.613 s)."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        "lang",
        F.explode(
            F.array(T.quality_score_bound_expr(F.col("text")))
        ).alias("quality_score"),
    ).filter(F.col("quality_score") >= 0.5)


def q_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-hop dedup resolution: drop the larger id of every jaccard
    pair >= threshold, keep everything else."""
    from pg_vectorize_spark.operators.dedup import (
        dedup_survivors,
        ngram_jaccard_pairs,
    )

    docs = _t(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, "text", "doc_id", k=3, threshold=0.2)
    return dedup_survivors(docs, "doc_id", pairs).select("doc_id", "n_chars")


def q_search_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/S6: the _search_tokens_<job> table itself — analyzer output
    (sorted for order-insensitive array comparison)."""
    docs = _t(spark, sf_dir, "documents")
    # r13 optimization round: explode-over-singleton barrier — both
    # output columns consume the analyzer chain (split + stop-words +
    # 7-rule stem transform per token, interpreted), and CollapseProject
    # would inline it into each; the Generate keeps it evaluated ONCE
    # per row (the q_fts_multilang_stemmed pattern).
    return docs.select(
        "doc_id",
        F.explode(F.array(T.tokens_expr(F.col("text")))).alias("_toks"),
    ).select(
        "doc_id",
        F.array_join(F.array_sort("_toks"), " ").alias("search_tokens"),
        F.size("_toks").alias("n_terms"),
    )


def q_fts_multilang_stemmed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multilingual stemmed-token table (r12 — VERDICT r11 #6): the
    analyzer dispatched per document by lang_id — Spanish, French, and
    German light-stem rule sets (the same three-engine regex spec pattern as
    the English set, functions/text.LIGHT_STEM_RULES_BY_LANG) with
    their own pinned stop-word lists; languages without a rule set
    (zh/unknown) take the UNSTEMMED analyzer, because wrong-language
    suffix stripping is worse than none. The reference hardcodes
    to_tsvector('english', ...) (core/src/query.rs:233) — §2 parity is
    the English default; this gate is the multilingual extension an
    LLM-data pipeline needs. Pure per-row expressions — but the
    analyzer chain is interpreted HOF work (regexp chains inside array
    lambdas never enter codegen), so parallelism == input splits: the
    single-file local fixture reads as ONE split and serializes the
    whole corpus onto one core (measured 3.0 s at sf0.1 vs 2.2 s at
    10x the rows with 8 splits). ensure_min_partitions fans out ONLY
    when splits < defaultParallelism — a no-op at scale, where a
    hardcoded repartition(N) would CAP parallelism at N and shuffle
    the whole corpus (review r12)."""
    from pg_vectorize_spark.operators.skew import ensure_min_partitions

    docs = ensure_min_partitions(_t(spark, sf_dir, "documents"))
    # r13 optimization round: materialize (lang, expanded tokens) ONCE
    # per row behind the explode barrier, then dispatch the per-language
    # stop/stem tail on the materialized columns — the inline
    # multilang_tokens_expr form re-derived lang_id per when-condition
    # and the tokenize subtree per branch (all interpreted; 6.4x
    # measured, scripts/analyzer_perf_probe.py). Mirrors the oracle's
    # own CTE structure (detected_lang materialized, CASE dispatch).
    mat = docs.select(
        "doc_id",
        F.explode(F.array(T.multilang_parts_expr(F.col("text")))).alias(
            "_p"
        ),
    ).select(
        "doc_id",
        F.col("_p.lang").alias("detected_lang"),
        F.col("_p.expanded").alias("_expanded"),
    )
    toks = T.multilang_tokens_from_parts(
        F.col("detected_lang"), F.col("_expanded")
    )
    # second explode barrier: search_tokens and n_terms both consume the
    # token array; the Generate keeps the stop/stem tail evaluated ONCE
    return mat.select(
        "doc_id",
        "detected_lang",
        F.explode(F.array(toks)).alias("_toks"),
    ).select(
        "doc_id",
        "detected_lang",
        F.array_join(F.array_sort("_toks"), " ").alias("search_tokens"),
        F.size("_toks").alias("n_terms"),
    )


#: non-Latin dope rows for the r13 Unicode gates (VERDICT r12 #3): the
#: parquet fixtures are 100% ASCII (their "zh" rows are romanized
#: pinyin), so real Han/kana/Hangul/Cyrillic coverage is injected as
#:  literal rows UNIONed into the gate expression on BOTH engines —
#: the same doping trick as _C4_LINED. No single quotes in the texts
#: (they embed directly into the oracle's VALUES list).
_UNICODE_DOPE_ROWS: list[tuple[int, str]] = [
    (90000001, "机器学习模型训练需要大量的数据"),
    (90000002, "Spark 处理大规模数据 very fast"),
    (90000003, "データ処理パイプラインの構築"),
    (90000004, "한국어 형태소 분석 시스템"),
    (90000005, "Обработка больших данных в распределенных системах"),
    (90000006, "été à Paris déjà vu naïve café"),
    (90000007, "GPU加速 deep learning 训练"),
    (90000008, "mixed язык text with русский and english words"),
    (90000009, "the quick brown foxes running over windows"),
    (90000010, "las luces de las ciudades grandes brillan"),
    (90000011, "les maisons et les journaux des villes rapidement"),
    # planted near-duplicates of 90000001 / 90000005 (one trailing
    # token differs) — the unicode MinHash gate must pair them on real
    # content; under the ASCII shingle spec every non-Latin row
    # degenerates to ONE shared empty shingle (identical signatures,
    # all mutual false duplicates — see word_shingles_expr)
    (90000012, "机器学习模型训练需要大量的数据集"),
    (90000013, "Обработка больших данных в распределенных кластерах"),
]


def _unicode_dope_sql() -> str:
    values = ", ".join(
        f"({i}, '{t}')" for i, t in _UNICODE_DOPE_ROWS
    )
    return f"(VALUES {values}) AS dope(doc_id, text)"


def _oracle_dedup_minhash_unicode() -> str:
    """Unicode-shingle MinHash verify stage over fixture + dope rows —
    same collapsed-cand structure as _MINHASH_SIG_BANDS_CTES, with the
    shingle stream swapped to the CJK-bigram-expanded Unicode tokens."""
    codes = (
        f"list_transform({O.sql_word_shingles('u.text', 3, unicode=True)}, "
        f"s -> {O.sql_poly_hash('s')})"
    )
    return f"""
WITH u AS MATERIALIZED (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id, text FROM {_unicode_dope_sql()}
),
c AS MATERIALIZED (
  SELECT u.doc_id, {codes} AS codes FROM u
),
sig AS MATERIALIZED (
  SELECT doc_id, {_MINHASH_SIG} AS signature FROM c WHERE len(codes) > 0
),
grp AS MATERIALIZED (
  SELECT signature, min(doc_id) AS rep FROM sig GROUP BY signature
),
bands AS (
  SELECT g.rep AS doc_id, t.band,
         array_to_string(
           list_transform(g.signature[(t.band*4 + 1):(t.band*4 + 4)],
                          x -> x::VARCHAR), ',') AS band_key
  FROM grp g, generate_series(0, 3) AS t(band)
),
cand AS (
  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
  FROM bands a
  JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
              AND a.doc_id < b.doc_id
  UNION
  SELECT g.rep AS a_id, s.doc_id AS b_id
  FROM sig s JOIN grp g ON s.signature = g.signature
  WHERE s.doc_id <> g.rep
)
SELECT cand.a_id, cand.b_id,
       len(list_filter(range(1, 17),
           i -> sa.signature[i::INT] = sb.signature[i::INT]))::DOUBLE / 16.0
         AS est_jaccard
FROM cand
JOIN sig sa ON cand.a_id = sa.doc_id
JOIN sig sb ON cand.b_id = sb.doc_id
"""


def _oracle_fts_multilang_indexed() -> str:
    """Full-scan ranking over the multilang token table (fixture +
    dope rows) for the two fixed probe queries — the lossless-probe
    oracle of q_fts_multilang_indexed."""
    from pg_vectorize_spark.operators.search import analyze_query_for

    terms_es = analyze_query_for(_ML_IDX_QUERY_ES, "multilang")
    terms_zh = analyze_query_for(_ML_IDX_QUERY_ZH, "multilang")
    whens = " ".join(
        f"WHEN detected_lang = '{lng}' THEN "
        f"{O.sql_unicode_tokens('text', True, lng)}"
        for lng in T.STEMMED_LANGS
    )
    return f"""
WITH u AS MATERIALIZED (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id, text FROM {_unicode_dope_sql()}
),
l AS MATERIALIZED (
  SELECT doc_id, text, {O.sql_lang_id('text')} AS detected_lang FROM u
),
t AS MATERIALIZED (
  SELECT doc_id,
         CASE {whens} ELSE {O.sql_unicode_tokens('text', False)} END AS toks
  FROM l
),
es AS (
  SELECT 'es' AS branch, doc_id,
         {O.sql_fts_score('toks', terms_es)} AS fts_score
  FROM t WHERE {O.sql_fts_match('toks', terms_es)}
  ORDER BY fts_score DESC, doc_id ASC LIMIT 5
),
zh AS (
  SELECT 'zh' AS branch, doc_id,
         {O.sql_fts_score('toks', terms_zh)} AS fts_score
  FROM t WHERE {O.sql_fts_match('toks', terms_zh)}
  ORDER BY fts_score DESC, doc_id ASC LIMIT 5
)
SELECT branch, doc_id, fts_score FROM es
UNION ALL
SELECT branch, doc_id, fts_score FROM zh
"""


def q_unicode_multiscript_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode/CJK analyzer gate (r13 — VERDICT r12 #3): the multilang
    analyzer over the fixture corpus PLUS real Han/kana/Hangul/Cyrillic
    dope rows. The \\p{L}\\p{N} token split + CJK character-bigram
    fallback (functions/text.unicode_tokens_expr) means non-Latin rows
    produce real token arrays — under the r12 [a-z0-9] analyzer every
    doped row came back EMPTY, which is exactly the silent corpus drop
    this gate pins against. Script-first lang-id (zh/ja/ko/ru by
    codepoint range) dispatches; stem rules stay [a-z]-anchored so
    Latin stemming is unchanged and non-Latin tokens pass through."""
    from pg_vectorize_spark.operators.skew import ensure_min_partitions

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    doped = spark.createDataFrame(
        _UNICODE_DOPE_ROWS, "doc_id long, text string"
    )
    allr = ensure_min_partitions(docs.unionByName(doped))
    # r13 optimization round: materialized (lang, expanded) dispatch —
    # see q_fts_multilang_stemmed (6.4x measured on this gate's shape,
    # scripts/analyzer_perf_probe.py)
    mat = allr.select(
        "doc_id",
        F.explode(F.array(T.multilang_parts_expr(F.col("text")))).alias(
            "_p"
        ),
    ).select(
        "doc_id",
        F.col("_p.lang").alias("detected_lang"),
        F.col("_p.expanded").alias("_expanded"),
    )
    toks = T.multilang_tokens_from_parts(
        F.col("detected_lang"), F.col("_expanded")
    )
    return mat.select(
        "doc_id",
        "detected_lang",
        F.explode(F.array(toks)).alias("_toks"),
    ).select(
        "doc_id",
        "detected_lang",
        F.array_join(F.array_sort("_toks"), " ").alias("search_tokens"),
        F.size("_toks").alias("n_terms"),
    )


#: fixed queries for the multilang POSTINGS-INDEX gate: one per-language
#: stemmed path (es) and one CJK-bigram path (zh) through the SAME
#: term space — terms are analyzed once at import so the oracle embeds
#: the identical literals
_ML_IDX_QUERY_ES = "las luces de la ciudad"
_ML_IDX_QUERY_ZH = "机器学习模型"


def _fts_multilang_gate_index(spark: SparkSession, sf_dir: str):
    """Persisted postings index built from MULTILANG tokens over the
    fixture corpus + the non-Latin dope rows — same scratch-dir +
    source-fingerprint reuse pattern as _fts_gate_index."""
    import os
    import tempfile

    from pg_vectorize_spark.fts_index import JobFtsIndexManager

    sfname = os.path.basename(sf_dir.rstrip("/")) or "sf"
    idx_dir = os.path.join(
        tempfile.gettempdir(), f"pvs_gate_fts_ml_index_{sfname}"
    )
    index_cfg = {"term_buckets": 64}
    mgr = JobFtsIndexManager(spark, idx_dir, index_cfg)
    from pg_vectorize_spark.operators.search import ANALYZER_SPEC_VERSIONS

    fp = _source_fingerprint(os.path.join(sf_dir, "documents.parquet"))
    fp += repr(sorted(index_cfg.items())) + repr(_UNICODE_DOPE_ROWS)
    # spec-versioned: a future multilang tokenizer bump must invalidate
    # the persisted gate index, not silently reuse old-spec postings
    fp += f"|multilang@{ANALYZER_SPEC_VERSIONS['multilang']}"
    fp_path = os.path.join(idx_dir, "_SOURCE_FP")
    fresh = False
    try:
        with open(fp_path) as fh:
            fresh = fh.read() == fp and mgr.exists()
    except OSError:
        pass
    if not fresh:
        docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
        doped = spark.createDataFrame(
            _UNICODE_DOPE_ROWS, "doc_id long, text string"
        )
        allr = docs.unionByName(doped)
        # r13 optimization round: materialized (lang, expanded) dispatch
        # for the build scan — see q_fts_multilang_stemmed
        mat = allr.select(
            "doc_id",
            F.explode(
                F.array(T.multilang_parts_expr(F.col("text")))
            ).alias("_p"),
        )
        mgr.build(
            mat.select(
                "doc_id",
                T.multilang_tokens_from_parts(
                    F.col("_p.lang"), F.col("_p.expanded")
                ).alias("search_tokens"),
            ),
            "doc_id",
        )
        with open(fp_path, "w") as fh:
            fh.write(fp)
    return mgr


def q_fts_multilang_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multilang analyzer AT THE POSTINGS INDEX (r13 — VERDICT r12 #6):
    the per-language stems and CJK bigrams live in ONE term space, so
    the term-bucketed probe must serve them exactly like the inline
    scan. Two branches through the SAME persisted index: a Spanish
    query (detected es -> es-stemmed terms probe es-stemmed postings)
    and a Han query (detected zh -> character-bigram terms probe bigram
    postings). The probe is lossless by construction, so the ORACLE is
    the full-scan ranking over the same multilang token table."""
    from pg_vectorize_spark.operators.search import analyze_query_for

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    doped = spark.createDataFrame(
        _UNICODE_DOPE_ROWS, "doc_id long, text string"
    )
    base = docs.unionByName(doped).select("doc_id")
    mgr = _fts_multilang_gate_index(spark, sf_dir)
    branches = (
        ("es", _ML_IDX_QUERY_ES),
        ("zh", _ML_IDX_QUERY_ZH),
    )
    # r13 optimization round: both branches probe the SAME index — one
    # shared pruned scan + aggregate over the union of term sets
    # (probe_scores_multi) instead of two. Per-set conditional counts
    # are exactly each branch's n_matched (distinct stored terms), so
    # scores are bit-identical; plan: 2 index scans -> 1.
    scored = mgr.probe_scores_multi(
        [analyze_query_for(q, "multilang") for _, q in branches]
    )
    out = []
    for (branch, query), branch_scores in zip(branches, scored):
        res = full_text_search(
            base,
            "doc_id",
            query,
            text_cols=["text"],
            num_results=5,
            analyzer="multilang",
            fts_scored_df=branch_scores,
        )
        out.append(res.select(F.lit(branch).alias("branch"), "doc_id", "fts_score"))
    return out[0].unionByName(out[1])


def q_dedup_minhash_unicode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash LSH dedup over the UNICODE shingle stream (r13): word
    shingles are built from \\p{L}\\p{N} tokens with CJK runs expanded
    to character bigrams, so non-Latin documents — which under the
    ASCII spec all degenerate to ONE shared empty shingle and would be
    marked mutual duplicates of each other — band, pair, and estimate
    on their real content like any other row. Corpus = fixture +
    dope rows incl. two planted CJK/Cyrillic near-duplicates; output =
    candidate pairs with the agreement estimate (the LSH verify
    stage). The polynomial hash is unchanged: ascii()/ord() return the
    codepoint identically in Spark, DuckDB, and Python."""
    from pg_vectorize_spark.operators.dedup import (
        minhash_jaccard_estimate,
        minhash_lsh_candidates,
        minhash_signatures,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    doped = spark.createDataFrame(
        _UNICODE_DOPE_ROWS, "doc_id long, text string"
    )
    allr = docs.unionByName(doped)
    # r13 optimization round: the signature pipeline (unicode shingle
    # explode + poly hash + 16-way min agg) is referenced by FIVE
    # consumers downstream (collapse groupBy, collapse join-back, band
    # rows, and both sides of the estimate join) with different shuffle
    # keys, so without a materialization each consumer re-ran the whole
    # shingle scan. One lazy local checkpoint = one corpus pass — the
    # same MATERIALIZED-CTE structure the oracle already uses.
    sigs = minhash_signatures(
        allr, "text", "doc_id", num_hashes=16, k=3, unicode=True
    ).localCheckpoint(eager=False)
    cands = minhash_lsh_candidates(sigs, bands=4, rows_per_band=4)
    return minhash_jaccard_estimate(sigs, cands, num_hashes=16)


def q_unicode_word_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode word metrics gate (r13): Gopher-style word-based quality
    signals computed with the \\p{L}\\p{N} word class
    (gopher_flags_exprs(unicode=True)) over fixture + doped non-Latin
    rows — word counts, mean word length, and the letter-bearing-word
    ratio read REAL nonzero values on Han/Cyrillic text (the r12
    [a-z0-9] class read 0 words, so every word-count rule
    vacuous-failed on non-Latin corpora). The Gopher stop-word rule is
    English by the paper's definition and intentionally keeps reading 0
    on non-English rows."""
    from pg_vectorize_spark.operators.skew import ensure_min_partitions

    docs = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 200)
        .select("doc_id", "text")
    )
    doped = spark.createDataFrame(
        _UNICODE_DOPE_ROWS, "doc_id long, text string"
    )
    allr = ensure_min_partitions(docs.unionByName(doped))
    words = T.unicode_raw_words_expr(F.col("text"))
    flags = T.gopher_flags_exprs(F.col("text"), unicode=True)
    return allr.select(
        "doc_id",
        F.size(words).alias("n_words"),
        F.size(
            F.filter(words, lambda w: w.rlike(r"\p{L}"))
        ).alias("n_alpha_words"),
        flags["ok_word_count"].alias("ok_word_count"),
        flags["ok_mean_word_len"].alias("ok_mean_word_len"),
        flags["ok_alpha_words"].alias("ok_alpha_words"),
    )


def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The GIN-index analog (SURVEY §4): term -> document-frequency +
    sorted posting list, built by explode + groupBy."""
    docs = _t(spark, sf_dir, "documents")
    postings = docs.select(
        "doc_id", F.explode(T.tokens_expr(F.col("text"))).alias("term")
    )
    postings_csv = F.array_join(
        F.transform(
            F.sort_array(F.collect_list("doc_id")), lambda x: x.cast("string")
        ),
        ",",
    )
    return postings.groupBy("term").agg(
        F.count(F.lit(1)).alias("doc_freq"),
        postings_csv.alias("postings"),
    )


def q_multimodal_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite multimodal flow: binary media -> fake decode (Arrow
    mapInPandas stub) -> feature near-dup pairs. The deterministic fake
    decode (byte-histogram features) is mirrored in DuckDB over the
    ASCII corpus, so the whole Arrow pipeline is hash-verified. The
    filter precedes the decode — mapInPandas is a pushdown barrier."""
    from pg_vectorize_spark.multimodal.binary import decode_media
    from pg_vectorize_spark.operators.dedup import cosine_neardup_pairs

    docs = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 100)
        .select("doc_id", F.encode(F.col("text"), "utf-8").alias("content"))
    )
    decoded = decode_media(docs, "content", "doc_id", fake=True, n_features=8)
    feats = decoded.select(F.col("pkey").alias("doc_id"), "features")
    return cosine_neardup_pairs(feats, "doc_id", "features", threshold=0.999)


def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL codec decode gate: PNG (zlib inflate + five-filter unfilter),
    JPEG (baseline AND progressive DCT: Huffman entropy decode, restart
    intervals, 4:4:4 and 4:2:0 sampling, SOF2 spectral-selection +
    successive-approximation scans, chroma upsample, JFIF YCbCr->RGB)
    and WAV (PCM)
    blobs from the committed fixture are decoded by the stdlib codec
    (multimodal/codec.py) and reduced to amplitude/intensity histograms.
    The fixture media follow closed-form pixel/sample laws (JPEG rows are
    block-constant with DC quant 8, making the lossy codec bit-exact on
    them), so the DuckDB oracle recomputes the histograms analytically
    from generate_series + the same floor(x+0.5) JFIF transform —
    verifying the decoder against independent math, not a re-run of
    itself."""
    from pg_vectorize_spark.multimodal.binary import decode_media

    media = spark.read.parquet(MEDIA_FIXTURE).select("media_id", "content")
    decoded = decode_media(
        media, "content", "media_id", fake=False, n_features=8
    )
    return decoded.select(
        F.col("pkey").alias("media_id"),
        "width",
        "height",
        "n_channels",
        F.posexplode("features").alias("bucket", "share"),
    )


def q_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-corpus text normalization: HTML-ish tag strip + entity decode
    + whitespace collapse, as pure JVM expressions (functions/text.py
    strip_html_expr). Markup is synthesized deterministically around the
    corpus text so the whole pass is oracle-verified, incl. the
    decode-one-level entity rule ('&amp;amp;' -> '&amp;')."""
    from pg_vectorize_spark.functions.text import strip_html_expr

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    html = F.concat(
        F.lit('<p class="x">'),
        F.col("text"),
        F.lit("</p>\n<br/>&amp;amp; &lt;tail&gt;\t end"),
    )
    clean = strip_html_expr(html)
    return docs.select(
        "doc_id",
        clean.alias("clean_text"),
        F.length(clean).cast("long").alias("clean_len"),
    )


def q_dup_span_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplication audit (Lee et al. 2022 hash-window
    form): per doc, the fraction of its 5-word windows appearing verbatim
    in another document. String-keyed path so the DuckDB oracle is
    bit-exact (production default hashes the windows to 8-byte keys)."""
    from pg_vectorize_spark.operators.dedup import duplicated_span_stats

    docs = _t(spark, sf_dir, "documents")
    return duplicated_span_stats(
        docs, "text", "doc_id", k=5, hash_ngrams=False
    )


def q_embedding_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk -> document vector pooling (functions/vector.pool_embeddings):
    element-wise mean per group with shuffle-order-free sorted folds, so
    the values match DuckDB bit-for-bit. Groups synthesized as vec_id % 50
    (the chunk->source relation shape).

    Output is scalar-only (position-weighted fold checksum + dim +
    first/last element), mirroring q_embedding_truncate: the driver's
    pandas canonicalizer cannot sort/hash a raw array<double> column
    (CORRECTNESS_r03 `embedding_pool` err). The raw pooled vector is
    exercised by pytest (test_quantize) and by q_chunked_embed_pool."""
    from pg_vectorize_spark.functions.vector import pool_embeddings

    emb = _t(spark, sf_dir, "embeddings").select(
        (F.col("vec_id") % 50).alias("grp"), "embedding"
    )
    pooled = pool_embeddings(emb, "grp", "embedding", mode="mean")
    wsum = F.aggregate(
        F.zip_with(
            F.col("pooled"),
            F.sequence(F.lit(1), F.size("pooled")),
            lambda v, i: v * i.cast("double"),
        ),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    return pooled.select(
        "grp",
        "n_vectors",
        F.size("pooled").cast("long").alias("dim"),
        wsum.alias("pos_weighted_sum"),
        F.element_at("pooled", 1).alias("first_val"),
        F.element_at("pooled", -1).alias("last_val"),
    )


def q_chunked_embed_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end RAG-ingest composite (F5 -> S8 -> pooling): chunk each
    document (offset-bucket spec, 200 chars), embed every chunk through
    the Arrow-batched provider path, then pool chunk vectors back to ONE
    document vector (element-wise mean). This is the composite shape the
    reference's chunking workflow produces (chunk_table -> embed ->
    store), verified here end-to-end rather than piecewise.

    Plan shape: chunking is explode + two keyed window/agg stages; embed
    is a pure zero-shuffle Arrow map; pooling is two keyed shuffles on
    (doc, pos) then doc. No driver collection, no row-at-a-time Python.
    Scalar projections of the pooled vector (driver canonicalizer cannot
    hash array columns)."""
    from pg_vectorize_spark.functions.vector import pool_embeddings
    from pg_vectorize_spark.operators.chunk import chunk_table_distributed
    from pg_vectorize_spark.operators.embed import embed_bulk_pandas

    docs = _t(spark, sf_dir, "documents")
    chunks = chunk_table_distributed(docs, "text", "doc_id", max_chunk_size=200)
    emb = embed_bulk_pandas(chunks, "chunk", "original_id", dim=EMBED_DIM)
    pooled = pool_embeddings(emb, "original_id", "embeddings", mode="mean")
    wsum = F.aggregate(
        F.zip_with(
            F.col("pooled"),
            F.sequence(F.lit(1), F.size("pooled")),
            lambda v, i: v * i.cast("double"),
        ),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    return pooled.select(
        F.col("original_id").alias("doc_id"),
        F.col("n_vectors").alias("n_chunks"),
        wsum.alias("pos_weighted_sum"),
        F.element_at("pooled", 1).alias("first_val"),
        F.element_at("pooled", -1).alias("last_val"),
    )


def q_dedup_transitive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive dedup closure over jaccard pairs — iterative label
    propagation on the Spark side, oracled by a DuckDB recursive CTE
    computing the same min-reachable-id fixpoint."""
    from pg_vectorize_spark.operators.dedup import (
        connected_components,
        ngram_jaccard_pairs,
    )

    docs = _t(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, "text", "doc_id", k=3, threshold=0.15)
    return connected_components(pairs).orderBy("id")


def q_orphan_cleanup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ON DELETE CASCADE parity (core/src/query.rs:349-354): embeddings
    rows whose source row was deleted are detected by a keyed anti-join
    and pruned (SURVEY.md §7 hard-part 2; engine.cleanup_orphans runs this
    inside every scan_job). Simulated delete: doc_id % 7 == 3 leaves the
    source; the result is the orphan set the cascade removes."""
    from pg_vectorize_spark.operators.change import detect_orphans

    src = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 7 != 3)
        .select("doc_id")
    )
    emb = _t(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    orphans = detect_orphans(emb, src, "doc_id")
    return orphans.select("doc_id", F.size("embedding").alias("dim"))


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    # Registry order IS the rotation policy (COVERAGE.md): the first 50
    # names are the driver's correctness window, asserted in
    # tests/test_registry.py::test_r13_window_names.
    # --- positions 1-4: the four names deferred from the r12 window
    # (3-round policy, COVERAGE.md rotation record) — their freshest
    # driver row is r10, so they MUST lead r13 ---
    "sample_exact": q_sample_exact,
    "c4_flags": q_c4_flags,
    "multimodal_meta": q_multimodal_meta,
    "vocabulary_topk": q_vocabulary_topk,
    # --- positions 5-6: NEW in r13 (Unicode/CJK analyzer + unicode
    # word metrics over doped non-Latin rows) — no driver row yet,
    # take window slots ahead of everything with existing evidence ---
    "unicode_multiscript_tokens": q_unicode_multiscript_tokens,
    "unicode_word_stats": q_unicode_word_stats,
    "fts_multilang_indexed": q_fts_multilang_indexed,
    "dedup_minhash_unicode": q_dedup_minhash_unicode,
    # --- positions 9-50: freshest driver row is r11 (the r12
    # rotated-out set returns, minus the names deferred to r14 —
    # the window is oversubscribed by the four r12-deferred leads
    # plus the new r13 gates — carried on this session's full
    # check_oracle run) ---
    "corpus_to_shards": q_corpus_to_shards,
    "tokenizer_fertility": q_tokenizer_fertility,
    "json_rows": q_json_rows,
    "collect_changed_ids": q_collect_changed_ids,
    "hash_split": q_hash_split,
    "token_count": q_token_count,
    "doc_fingerprint": q_doc_fingerprint,
    "lang_id": q_lang_id,
    "minhash_jaccard_estimate": q_minhash_jaccard_estimate,
    "view_join": q_view_join,
    "dedup_exact": q_dedup_exact,
    "record_fetch_by_ids": q_record_fetch_by_ids,
    "embed_documents": q_embed_documents,
    "embedding_pool": q_embedding_pool,
    "chunked_embed_pool": q_chunked_embed_pool,
    "knn_join": q_knn_join,
    "multimodal_decode": q_multimodal_decode,
    "bigram_logprob": q_bigram_logprob,
    "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    "embedding_quantize": q_embedding_quantize,
    "corpus_stats": q_corpus_stats,
    "domain_cap": q_domain_cap,
    "quality_filter": q_quality_filter,
    "inverted_index": q_inverted_index,
    "decontaminate": q_decontaminate,
    "ann_multiprobe_lsh_topk": q_ann_multiprobe_lsh_topk,
    "text_normalize": q_text_normalize,
    "orders_rollup": q_orders_rollup,
    "multimodal_pipeline": q_multimodal_pipeline,
    "dedup_survivors": q_dedup_survivors,
    "source_divergence": q_source_divergence,
    "dedup_transitive": q_dedup_transitive,
    "token_budget_batches": q_token_budget_batches,
    "chunk_table": q_chunk_table,
    "where_sql_filter": q_where_sql_filter,
    "typed_filters_part": q_typed_filters_part,
    "hard_negatives_indexed": q_hard_negatives_indexed,
    "mp3_metadata": q_mp3_metadata,
    "semantic_decontaminate": q_semantic_decontaminate,
    "semantic_search_topk": q_semantic_search_topk,
    "semantic_search_filtered": q_semantic_search_filtered,
    "hybrid_rrf_search": q_hybrid_rrf_search,
    # --- positions 51+: the r11-evidence names deferred to r14 —
    # four least load-bearing of their families (simhash covered by
    # simhash_neardup_pairs r12 row, frame sampling by
    # multimodal_decode/multimodal_pipeline/mp4_frame_extract,
    # truncation by embedding_quantize + the PQ gates, count batching
    # by token_budget_batches) plus the names displaced by the new
    # r13 gates (job_hybrid_e2e, fts_search_indexed — both covered by
    # this session's check_oracle run) — they lead the r14 window ---
    "dedup_simhash": q_dedup_simhash,
    "frame_sample": q_frame_sample,
    "embedding_truncate": q_embedding_truncate,
    "batch_texts": q_batch_texts,
    "job_hybrid_e2e": q_job_hybrid_e2e,
    "fts_search_indexed": q_fts_search_indexed,
    "orphan_cleanup": q_orphan_cleanup,
    "hybrid_weighted": q_hybrid_weighted,
    # --- tail: r12 driver rows (CORRECTNESS_r12.json, 50/50 green) —
    # the freshest evidence, so they sit out the r13 window ---
    "curate_job_search_e2e": q_curate_job_search_e2e,
    "fts_multilang_stemmed": q_fts_multilang_stemmed,
    "hybrid_rrf_indexed": q_hybrid_rrf_indexed,
    "search_tokens": q_search_tokens,
    "fts_search_topk": q_fts_search_topk,
    "dedup_semantic_cluster": q_dedup_semantic_cluster,
    "hard_negatives": q_hard_negatives,
    "fts_stemmed": q_fts_stemmed,
    "simhash_neardup_pairs": q_simhash_neardup_pairs,
    "dedup_embedding_cosine": q_dedup_embedding_cosine,
    "ann_ivf_topk": q_ann_ivf_topk,
    "ann_signbit_lsh_topk": q_ann_signbit_lsh_topk,
    "dup_span_stats": q_dup_span_stats,
    "gopher_flags": q_gopher_flags,
    "corpus_mix": q_corpus_mix,
    "unigram_logprob": q_unigram_logprob,
    "events_windowed_agg": q_events_windowed_agg,
    "sessionize_events": q_sessionize_events,
    "asof_join_events": q_asof_join_events,
    "asof_join_bucketed": q_asof_join_bucketed,
    "attribution_window_join": q_attribution_window_join,
    "quality_score": q_quality_score,
    "repetition_score": q_repetition_score,
    "pii_scrub": q_pii_scrub,
    "mp4_frame_extract": q_mp4_frame_extract,
    "dsir_weights": q_dsir_weights,
    "paragraph_dedup": q_paragraph_dedup,
    "change_detection": q_change_detection,
    "append_method_scan": q_append_method_scan,
    "quantized_search_topk": q_quantized_search_topk,
    "maxsim_search_topk": q_maxsim_search_topk,
    "pq_adc_search": q_pq_adc_search,
    "pq_rerank_search": q_pq_rerank_search,
    "fts_bm25": q_fts_bm25,
    "hybrid_bm25": q_hybrid_bm25,
    "fts_cover_density": q_fts_cover_density,
    "semantic_search_indexed": q_semantic_search_indexed,
    "neardup_index_probe": q_neardup_index_probe,
    "neardup_probe_local": q_neardup_probe_local,
    "dedup_minhash_lsh": q_dedup_minhash_lsh,
    "minhash_signatures": q_minhash_signatures,
    "cdf_apply": q_cdf_apply,
    "incremental_scan_events": q_incremental_scan_events,
    "fts_search_overlay": q_fts_search_overlay,
    "sequence_pack": q_sequence_pack,
    "pack_manifest": q_pack_manifest,
    "line_dedup": q_line_dedup,
    "bpe_token_count": q_bpe_token_count,
    "sample_weighted": q_sample_weighted,
    "perplexity_buckets": q_perplexity_buckets,
}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: hybrid RRF search on sf0.001."""
    return q_hybrid_rrf_search(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


# --------------------------------------------------------------------------
# oracle SQL
# --------------------------------------------------------------------------

_QV = "(SELECT embedding FROM embeddings WHERE vec_id = 0)"


def _oracle_semantic_topk() -> str:
    sim = O.sql_cosine("e.embedding", "q.qv")
    return f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
scored AS (
  SELECT e.vec_id, e.label, {sim} AS similarity_score
  FROM embeddings e CROSS JOIN q
)
SELECT vec_id, label, similarity_score
FROM scored
ORDER BY similarity_score DESC, vec_id ASC
LIMIT 10
"""


def _oracle_semantic_filtered() -> str:
    sim = O.sql_cosine("e.embedding", "q.qv")
    return f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
scored AS (
  SELECT e.vec_id, e.label, {sim} AS similarity_score
  FROM embeddings e CROSS JOIN q
)
SELECT vec_id, label, similarity_score
FROM scored
WHERE label = 1
ORDER BY similarity_score DESC, vec_id ASC
LIMIT 5
"""


def _oracle_fts_topk() -> str:
    toks = O.sql_tokens("d.text")
    match = O.sql_fts_match("search_tokens", QUERY_TERMS)
    score = O.sql_fts_score("search_tokens", QUERY_TERMS)
    return f"""
WITH tok AS (
  SELECT d.doc_id, d.lang, d.n_chars, {toks} AS search_tokens
  FROM documents d
)
SELECT doc_id, lang, n_chars, {score} AS fts_score
FROM tok
WHERE {match}
ORDER BY fts_score DESC, doc_id ASC
LIMIT 10
"""


def _oracle_fts_overlay() -> str:
    toks = O.sql_tokens("d.text")
    match = O.sql_fts_match("search_tokens", QUERY_TERMS)
    score = O.sql_fts_score("search_tokens", QUERY_TERMS)
    return f"""
WITH tok AS (
  SELECT d.doc_id, d.lang, d.n_chars, {toks} AS search_tokens
  FROM documents d
  WHERE d.doc_id % 10 <> 3
)
SELECT doc_id, lang, n_chars, {score} AS fts_score
FROM tok
WHERE {match}
ORDER BY fts_score DESC, doc_id ASC
LIMIT 10
"""


def _oracle_hybrid() -> str:
    sim = O.sql_cosine("e.embedding", "q.qv")
    toks = O.sql_tokens("d.text")
    match = O.sql_fts_match("search_tokens", QUERY_TERMS)
    score = O.sql_fts_score("search_tokens", QUERY_TERMS)
    return f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
sem AS (
  SELECT vec_id AS doc_id, similarity_score,
         ROW_NUMBER() OVER (ORDER BY similarity_score DESC, doc_id ASC)
           AS semantic_rank
  FROM (
    SELECT e.vec_id, {sim} AS similarity_score FROM embeddings e CROSS JOIN q
  )
  ORDER BY similarity_score DESC, doc_id ASC
  LIMIT 50
),
ftsb AS (
  SELECT doc_id, fts_score,
         ROW_NUMBER() OVER (ORDER BY fts_score DESC, doc_id ASC) AS fts_rank
  FROM (
    SELECT doc_id, {score} AS fts_score
    FROM (SELECT d.doc_id, {toks} AS search_tokens FROM documents d)
    WHERE {match}
  )
  ORDER BY fts_score DESC, doc_id ASC
  LIMIT 50
),
fused AS (
  SELECT COALESCE(sem.doc_id, ftsb.doc_id) AS doc_id,
         sem.similarity_score, sem.semantic_rank, ftsb.fts_rank,
         COALESCE(1.0 / (60 + sem.semantic_rank), 0.0)
         + COALESCE(1.0 / (60 + ftsb.fts_rank), 0.0) AS rrf_score
  FROM sem FULL OUTER JOIN ftsb ON sem.doc_id = ftsb.doc_id
)
SELECT d.doc_id, d.lang, d.n_chars, f.rrf_score,
       f.semantic_rank::INT AS semantic_rank, f.fts_rank::INT AS fts_rank,
       f.similarity_score
FROM documents d INNER JOIN fused f ON d.doc_id = f.doc_id
ORDER BY f.rrf_score DESC, d.doc_id ASC
LIMIT 10
"""


def _oracle_hybrid_weighted() -> str:
    sim = O.sql_cosine("e.embedding", "q.qv")
    toks = O.sql_tokens("d.text")
    match = O.sql_fts_match("search_tokens", QUERY_TERMS)
    score = O.sql_fts_score("search_tokens", QUERY_TERMS)
    return f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
sem AS (
  SELECT vec_id AS doc_id, similarity_score,
         ROW_NUMBER() OVER (ORDER BY similarity_score DESC, doc_id ASC)
           AS semantic_rank
  FROM (
    SELECT e.vec_id, {sim} AS similarity_score FROM embeddings e CROSS JOIN q
  )
  ORDER BY similarity_score DESC, doc_id ASC
  LIMIT 40
),
ftsb AS (
  SELECT doc_id, fts_score,
         ROW_NUMBER() OVER (ORDER BY fts_score DESC, doc_id ASC) AS fts_rank
  FROM (
    SELECT doc_id, {score} AS fts_score
    FROM (SELECT d.doc_id, {toks} AS search_tokens FROM documents d)
    WHERE {match}
  )
  ORDER BY fts_score DESC, doc_id ASC
  LIMIT 40
),
fused AS (
  SELECT COALESCE(sem.doc_id, ftsb.doc_id) AS doc_id,
         sem.similarity_score, sem.semantic_rank, ftsb.fts_rank,
         COALESCE(0.25 / (60 + sem.semantic_rank), 0.0)
         + COALESCE(0.75 / (60 + ftsb.fts_rank), 0.0) AS rrf_score
  FROM sem FULL OUTER JOIN ftsb ON sem.doc_id = ftsb.doc_id
)
SELECT d.doc_id, d.lang, d.n_chars, f.rrf_score,
       f.semantic_rank::INT AS semantic_rank, f.fts_rank::INT AS fts_rank,
       f.similarity_score
FROM documents d INNER JOIN fused f ON d.doc_id = f.doc_id
WHERE d.lang = 'en' AND d.n_chars > 100
ORDER BY f.rrf_score DESC, d.doc_id ASC
LIMIT 10
"""


def _oracle_embed_documents() -> str:
    # staged MATERIALIZED CTEs: the single-expression form re-evaluates the
    # bucket list per dimension (64x the work) — same blowup the Spark side
    # avoids via explode+groupBy.
    dim = EMBED_DIM
    checksum = (
        f"list_reduce(list_prepend(0.0::DOUBLE, "
        f"list_transform(range(1, {dim}+1), "
        f"i -> embedding[i::INT] * i::DOUBLE)), (a, x) -> a + x)"
    )
    nnz = "len(list_filter(embedding, x -> x <> 0.0))::INT"
    return f"""
WITH b AS MATERIALIZED (
  SELECT d.doc_id,
         list_transform({O.sql_features('d.text')},
                        f -> {O.sql_hash_bucket('f', dim)}) AS buckets
  FROM documents d
),
c AS MATERIALIZED (
  SELECT doc_id,
         list_transform(range(0, {dim}),
                        i -> len(list_filter(buckets, bk -> bk = i))::DOUBLE)
           AS counts
  FROM b
),
n AS MATERIALIZED (
  SELECT doc_id, counts,
         sqrt(list_reduce(list_prepend(0.0::DOUBLE,
              list_transform(counts, x -> x*x)), (a, x) -> a + x)) AS nrm
  FROM c
),
e AS MATERIALIZED (
  SELECT doc_id,
         CASE WHEN nrm > 0 THEN list_transform(counts, x -> x / nrm)
              ELSE counts END AS embedding
  FROM n
)
SELECT doc_id, {checksum} AS checksum, {nnz} AS nnz FROM e
"""


def _oracle_fts_stemmed() -> str:
    terms = T.analyze_query(STEM_QUERY_TEXT)  # [run, merg, window, batch]
    toks = O.sql_tokens("d.text")
    match = O.sql_fts_match("search_tokens", terms)
    score = O.sql_fts_score("search_tokens", terms)
    return f"""
WITH tok AS (
  SELECT d.doc_id, d.lang, {toks} AS search_tokens FROM documents d
)
SELECT doc_id, lang, {score} AS fts_score
FROM tok
WHERE {match}
ORDER BY fts_score DESC, doc_id ASC
LIMIT 10
"""


def _oracle_fts_cover_density() -> str:
    terms = QUERY_TERMS
    n_pairs = len(terms) * (len(terms) - 1) // 2
    words = O.sql_words("d.text")
    toks = O.sql_tokens("d.text")
    match = O.sql_fts_match("search_tokens", terms)
    score = O.sql_fts_score("search_tokens", terms)
    return f"""
WITH w AS MATERIALIZED (
  SELECT d.doc_id, {words} AS ws FROM documents d
),
pw AS (
  SELECT doc_id, unnest(list_transform(range(1, len(ws)+1),
                        i -> {{'pos': i, 'w': ws[i::INT]}})) AS u
  FROM w
),
px AS (SELECT doc_id, u.pos AS pos, u.w AS w FROM pw),
m AS MATERIALIZED (
  SELECT doc_id, pos, {O.sql_stem('w')} AS t
  FROM px
  WHERE NOT list_contains({O.sql_stop_words()}, w)
),
mt AS (
  SELECT doc_id, pos, t FROM m
  WHERE list_contains({O.sql_str_array(terms)}, t)
),
g AS (
  SELECT a.doc_id, a.t AS ta, b.t AS tb, min(abs(a.pos - b.pos)) AS gap
  FROM mt a JOIN mt b ON a.doc_id = b.doc_id AND a.t < b.t
  GROUP BY 1, 2, 3
),
cdagg AS (
  SELECT doc_id,
         list_reduce(list_prepend(0.0::DOUBLE,
             list_transform(list(gap ORDER BY ta, tb), x -> 1.0 / x)),
           (acc, y) -> acc + y) / {float(n_pairs)!r} AS cd_score
  FROM g GROUP BY doc_id
),
tok AS (
  SELECT d.doc_id, d.lang, {toks} AS search_tokens FROM documents d
),
sc AS (
  SELECT t.doc_id, t.lang, {score} AS fts_score,
         coalesce(c.cd_score, 0.0) AS cd_score
  FROM tok t LEFT JOIN cdagg c ON t.doc_id = c.doc_id
  WHERE {match}
)
SELECT doc_id, lang, fts_score, cd_score, fts_score + cd_score AS rank_cd
FROM sc
ORDER BY rank_cd DESC, doc_id ASC
LIMIT 10
"""


def _oracle_fts_bm25() -> str:
    terms = sorted(set(QUERY_TERMS))
    k1, b = 1.2, 0.75
    words = O.sql_words("d.text")
    stops = O.sql_stop_words()
    nonstop = f"list_filter({words}, w -> NOT list_contains({stops}, w))"
    stems = f"list_transform({nonstop}, w -> {O.sql_stem('w')})"
    tf_defs = ",\n         ".join(
        f"len(list_filter(stems, x -> x = '{t}'))::BIGINT AS tf{i}"
        for i, t in enumerate(terms)
    )
    df_defs = ",\n         ".join(
        f"sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END)::BIGINT AS df{i}"
        for i in range(len(terms))
    )
    # Mirrors bm25_scores' expression tree exactly (same literal doubles
    # via repr, same left-assoc adds) so the score hashes bit-for-bit.
    parts = []
    for i in range(len(terms)):
        idf = (
            f"ln(1.0 + (n::DOUBLE - df{i}::DOUBLE + 0.5) / "
            f"(df{i}::DOUBLE + 0.5))"
        )
        denom = (
            f"(tf{i}::DOUBLE + {k1!r} * ({1.0 - b!r} + {b!r} * "
            f"(dl::DOUBLE / (sumdl::DOUBLE / n::DOUBLE))))"
        )
        parts.append(f"({idf} * ((tf{i}::DOUBLE * {k1 + 1.0!r}) / {denom}))")
    score = " + ".join(parts)
    any_match = " OR ".join(f"tf{i} > 0" for i in range(len(terms)))
    toks = O.sql_tokens("d.text")
    fts_match = O.sql_fts_match("search_tokens", QUERY_TERMS)
    fts_score = O.sql_fts_score("search_tokens", QUERY_TERMS)
    return f"""
WITH base AS MATERIALIZED (
  SELECT d.doc_id, len({nonstop})::BIGINT AS dl, {stems} AS stems
  FROM documents d
),
tfd AS MATERIALIZED (
  SELECT doc_id, dl,
         {tf_defs}
  FROM base
),
stats AS (
  SELECT count(*)::BIGINT AS n, sum(dl)::BIGINT AS sumdl,
         {df_defs}
  FROM tfd
),
bm AS (
  SELECT doc_id, {score} AS bm25_score
  FROM tfd, stats
  WHERE {any_match}
),
tok AS (
  SELECT d.doc_id, d.lang, {toks} AS search_tokens FROM documents d
)
SELECT t.doc_id, t.lang, {fts_score} AS fts_score, bm.bm25_score
FROM tok t JOIN bm ON t.doc_id = bm.doc_id
WHERE {fts_match}
ORDER BY bm25_score DESC, t.doc_id ASC
LIMIT 10
"""


def _oracle_hybrid_bm25() -> str:
    """Hybrid RRF with the BM25-ranked FTS branch: the bm CTEs mirror
    _oracle_fts_bm25 (same literal doubles, same left-assoc fold), the
    fusion mirrors _oracle_hybrid."""
    terms = sorted(set(QUERY_TERMS))
    k1, b = 1.2, 0.75
    words = O.sql_words("d.text")
    stops = O.sql_stop_words()
    nonstop = f"list_filter({words}, w -> NOT list_contains({stops}, w))"
    stems = f"list_transform({nonstop}, w -> {O.sql_stem('w')})"
    tf_defs = ",\n         ".join(
        f"len(list_filter(stems, x -> x = '{t}'))::BIGINT AS tf{i}"
        for i, t in enumerate(terms)
    )
    df_defs = ",\n         ".join(
        f"sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END)::BIGINT AS df{i}"
        for i in range(len(terms))
    )
    parts = []
    for i in range(len(terms)):
        idf = (
            f"ln(1.0 + (n::DOUBLE - df{i}::DOUBLE + 0.5) / "
            f"(df{i}::DOUBLE + 0.5))"
        )
        denom = (
            f"(tf{i}::DOUBLE + {k1!r} * ({1.0 - b!r} + {b!r} * "
            f"(dl::DOUBLE / (sumdl::DOUBLE / n::DOUBLE))))"
        )
        parts.append(f"({idf} * ((tf{i}::DOUBLE * {k1 + 1.0!r}) / {denom}))")
    score = " + ".join(parts)
    any_match = " OR ".join(f"tf{i} > 0" for i in range(len(terms)))
    sim = O.sql_cosine("e.embedding", "q.qv")
    return f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
sem AS (
  SELECT vec_id AS doc_id, similarity_score,
         ROW_NUMBER() OVER (ORDER BY similarity_score DESC, doc_id ASC)
           AS semantic_rank
  FROM (
    SELECT e.vec_id, {sim} AS similarity_score FROM embeddings e CROSS JOIN q
  )
  ORDER BY similarity_score DESC, doc_id ASC
  LIMIT 50
),
bmbase AS MATERIALIZED (
  SELECT d.doc_id, len({nonstop})::BIGINT AS dl, {stems} AS stems
  FROM documents d
),
tfd AS MATERIALIZED (
  SELECT doc_id, dl,
         {tf_defs}
  FROM bmbase
),
stats AS (
  SELECT count(*)::BIGINT AS n, sum(dl)::BIGINT AS sumdl,
         {df_defs}
  FROM tfd
),
ftsb AS (
  SELECT doc_id, bm25_score,
         ROW_NUMBER() OVER (ORDER BY bm25_score DESC, doc_id ASC)
           AS fts_rank
  FROM (
    SELECT doc_id, {score} AS bm25_score
    FROM tfd, stats
    WHERE {any_match}
  )
  ORDER BY bm25_score DESC, doc_id ASC
  LIMIT 50
),
fused AS (
  SELECT COALESCE(sem.doc_id, ftsb.doc_id) AS doc_id,
         sem.similarity_score, sem.semantic_rank, ftsb.fts_rank,
         COALESCE(1.0 / (60 + sem.semantic_rank), 0.0)
         + COALESCE(1.0 / (60 + ftsb.fts_rank), 0.0) AS rrf_score
  FROM sem FULL OUTER JOIN ftsb ON sem.doc_id = ftsb.doc_id
)
SELECT d.doc_id, d.lang, d.n_chars, f.rrf_score,
       f.semantic_rank::INT AS semantic_rank, f.fts_rank::INT AS fts_rank,
       f.similarity_score
FROM documents d INNER JOIN fused f ON d.doc_id = f.doc_id
ORDER BY f.rrf_score DESC, d.doc_id ASC
LIMIT 10
"""


def _oracle_cdf_apply() -> str:
    return """
WITH docs AS (SELECT doc_id, text FROM documents),
base AS (SELECT * FROM docs WHERE doc_id < 300),
events AS (
  SELECT doc_id, text, 'update_preimage' AS _change_type, 10 AS _version
  FROM docs WHERE doc_id >= 250 AND doc_id < 350
  UNION ALL
  SELECT doc_id, 'v2 ' || text, 'update_postimage', 10
  FROM docs WHERE doc_id >= 250 AND doc_id < 350
  UNION ALL
  SELECT doc_id, NULL, 'delete', 20
  FROM docs WHERE doc_id < 300 AND doc_id % 7 = 0
  UNION ALL
  SELECT doc_id, 'back ' || text, 'insert', 30
  FROM docs WHERE doc_id < 300 AND doc_id % 14 = 0
  UNION ALL
  SELECT doc_id, 'tie ' || text, 'update_postimage', 40
  FROM docs WHERE doc_id >= 100 AND doc_id < 120
  UNION ALL
  SELECT doc_id, NULL, 'delete', 40
  FROM docs WHERE doc_id >= 100 AND doc_id < 120
),
ev AS (SELECT * FROM events WHERE _change_type != 'update_preimage'),
latest AS (
  SELECT * FROM ev
  QUALIFY row_number() OVER (
    PARTITION BY doc_id
    ORDER BY _version DESC, (_change_type = 'delete') DESC
  ) = 1
),
upserts AS (SELECT doc_id, text FROM latest WHERE _change_type != 'delete'),
dels AS (SELECT doc_id FROM latest WHERE _change_type = 'delete'),
untouched AS (
  SELECT b.doc_id, b.text FROM base b
  WHERE NOT EXISTS (SELECT 1 FROM ev WHERE ev.doc_id = b.doc_id)
),
unioned AS (
  SELECT * FROM untouched UNION ALL SELECT * FROM upserts
)
SELECT u.doc_id, u.text FROM unioned u
WHERE NOT EXISTS (SELECT 1 FROM dels WHERE dels.doc_id = u.doc_id)
"""


def _oracle_gopher_flags() -> str:
    flags = O.sql_gopher_flags("d.text", min_words=20)
    cols = ",\n       ".join(f"{flags[k]} AS {k}" for k in sorted(flags))
    return f"""
SELECT d.doc_id,
       {cols}
FROM documents d
"""


def _oracle_hash_split() -> str:
    splits = [("train", 0.8), ("val", 0.1), ("test", 0.1)]
    return f"""
SELECT d.doc_id, {O.sql_hash_split('d.doc_id', splits)} AS split
FROM documents d
"""


MIX_WEIGHTS = {"en": 2.5, "de": 1.0, "fr": 0.5, "es": 0.25, "zh": 0.0}


def _oracle_corpus_mix() -> str:
    copies = O.sql_mix_copies("d.doc_id", "d.lang", MIX_WEIGHTS)
    return f"""
WITH c AS (
  SELECT d.doc_id, d.lang, {copies} AS n_copies
  FROM documents d
)
SELECT doc_id, lang, unnest(range(1, n_copies + 1)) AS copy_idx
FROM c WHERE n_copies >= 1
"""


def _oracle_vocabulary_topk() -> str:
    return f"""
WITH w AS (
  SELECT d.doc_id, unnest({O.sql_words('d.text')}) AS word FROM documents d
)
SELECT word, count(*)::BIGINT AS n, count(DISTINCT doc_id)::BIGINT AS n_docs
FROM w GROUP BY word ORDER BY n DESC, word LIMIT 100
"""


def _oracle_unigram_logprob() -> str:
    # mirrors operators/curate.unigram_logprob: libm ln both sides,
    # floor into nano-log BIGINTs, exact integer doc sums
    return f"""
WITH w AS (
  SELECT d.doc_id, unnest({O.sql_words('d.text')}) AS word FROM documents d
),
v AS (SELECT word, count(*)::BIGINT AS n FROM w GROUP BY word),
tot AS (SELECT sum(n)::DOUBLE AS total FROM v),
lp AS (
  SELECT word,
         floor(ln(n::DOUBLE / total) * 1000000000.0)::BIGINT AS lp9
  FROM v, tot
),
per AS (
  SELECT w.doc_id, sum(lp9)::BIGINT AS s, count(*)::BIGINT AS n_words
  FROM w JOIN lp USING (word) GROUP BY w.doc_id
)
SELECT doc_id, n_words,
       ((s::DOUBLE / 1000000000.0) / n_words::DOUBLE) AS mean_logprob
FROM per
"""


def _oracle_perplexity_buckets() -> str:
    # mirrors operators/curate.perplexity_buckets: the unigram nano-log
    # score (same CTEs as _oracle_unigram_logprob), lang-id, then plain
    # SQL NTILE(3) per language — the Spark side's distributed rank +
    # closed-form BIGINT tile map must land on identical buckets
    return f"""
WITH w AS (
  SELECT d.doc_id, unnest({O.sql_words('d.text')}) AS word FROM documents d
),
v AS (SELECT word, count(*)::BIGINT AS n FROM w GROUP BY word),
tot AS (SELECT sum(n)::DOUBLE AS total FROM v),
lp AS (
  SELECT word,
         floor(ln(n::DOUBLE / total) * 1000000000.0)::BIGINT AS lp9
  FROM v, tot
),
per AS (
  SELECT w.doc_id, sum(lp9)::BIGINT AS s, count(*)::BIGINT AS n_words
  FROM w JOIN lp USING (word) GROUP BY w.doc_id
),
scored AS (
  SELECT p.doc_id, {O.sql_lang_id('d.text')} AS lang, p.n_words,
         ((s::DOUBLE / 1000000000.0) / n_words::DOUBLE) AS mean_logprob
  FROM per p JOIN documents d USING (doc_id)
)
SELECT doc_id, lang, n_words, mean_logprob,
       NTILE(3) OVER (
         PARTITION BY lang ORDER BY mean_logprob DESC, doc_id ASC
       )::INT AS bucket,
       CASE NTILE(3) OVER (
              PARTITION BY lang ORDER BY mean_logprob DESC, doc_id ASC)
         WHEN 1 THEN 'head' WHEN 3 THEN 'tail' ELSE 'middle'
       END AS ppl_bucket
FROM scored
"""


def _oracle_bigram_logprob() -> str:
    # mirrors operators/curate.bigram_logprob: index-paired bigrams over
    # the same word stream, add-0.5 smoothing with the same float op
    # order, libm ln, nano-log BIGINT doc sums
    return f"""
WITH wl AS (
  SELECT d.doc_id, {O.sql_words('d.text')} AS ws FROM documents d
),
big AS (
  SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2
  FROM (SELECT doc_id, ws, unnest(range(1, len(ws))) AS i FROM wl)
),
c12 AS (
  SELECT w1, w2, count(*)::BIGINT AS c12 FROM big GROUP BY w1, w2
),
c1 AS (SELECT w1, sum(c12)::BIGINT AS c1 FROM c12 GROUP BY w1),
allw AS (SELECT unnest(ws) AS word FROM wl),
v AS (SELECT count(DISTINCT word)::BIGINT AS v FROM allw),
lp AS (
  SELECT w1, w2,
         floor(ln((c12::DOUBLE + 0.5) / (c1::DOUBLE + 0.5 * v::DOUBLE))
               * 1000000000.0)::BIGINT AS lp9
  FROM c12 JOIN c1 USING (w1), v
),
per AS (
  SELECT b.doc_id, sum(lp9)::BIGINT AS s, count(*)::BIGINT AS n_bigrams
  FROM big b JOIN lp USING (w1, w2) GROUP BY b.doc_id
)
SELECT doc_id, n_bigrams,
       ((s::DOUBLE / 1000000000.0) / n_bigrams::DOUBLE) AS mean_logprob
FROM per
"""


def _oracle_sample_exact() -> str:
    prio = O.sql_sample_priority("d.doc_id")
    return f"""
SELECT doc_id, lang, rn::INT AS sample_rank FROM (
  SELECT d.doc_id, d.lang,
         row_number() OVER (PARTITION BY d.lang
                            ORDER BY {prio}, d.doc_id) AS rn
  FROM documents d
) WHERE rn <= 5
"""


def _oracle_source_divergence() -> str:
    # mirrors operators/curate.source_divergence: libm ln both sides,
    # floor into pico-nat BIGINTs, exact integer stratum sums
    return f"""
WITH w AS (
  SELECT d.source AS s, unnest({O.sql_words('d.text')}) AS word
  FROM documents d
),
sc AS (SELECT s, word, count(*)::BIGINT AS csw FROM w GROUP BY s, word),
cc AS (SELECT word, count(*)::BIGINT AS cw FROM w GROUP BY word),
st AS (SELECT s, count(*)::BIGINT AS ns FROM w GROUP BY s),
g AS (SELECT count(*)::BIGINT AS n FROM w),
terms AS (
  SELECT sc.s, st.ns,
         floor((sc.csw::DOUBLE / st.ns::DOUBLE)
               * ln((sc.csw::DOUBLE / st.ns::DOUBLE)
                    / (cc.cw::DOUBLE / g.n::DOUBLE))
               * 1000000000000.0)::BIGINT AS t12
  FROM sc JOIN cc USING (word) JOIN st USING (s) CROSS JOIN g
)
SELECT s AS source, min(ns)::BIGINT AS n_words,
       (sum(t12)::DOUBLE / 1000000000000.0) AS kl_nats
FROM terms GROUP BY s
"""


def _oracle_domain_cap() -> str:
    return """
SELECT doc_id, source, rn::INT AS domain_rank FROM (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
  FROM documents
) WHERE rn <= 40
"""


def _oracle_decontaminate() -> str:
    grams = f"list_distinct({O.sql_word_ngrams('d.text', 3)})"
    return f"""
WITH bg AS MATERIALIZED (
  SELECT DISTINCT unnest({grams}) AS gram
  FROM documents d WHERE d.doc_id % 97 = 0
),
pg AS (
  SELECT d.doc_id, unnest({grams}) AS gram
  FROM documents d WHERE d.doc_id % 97 <> 0
)
SELECT pg.doc_id, count(*)::BIGINT AS n_shared_grams
FROM pg JOIN bg USING (gram)
GROUP BY pg.doc_id
"""


def _oracle_dup_span_stats() -> str:
    """Same window pipeline: all 5-grams per doc (duplicates included for
    the totals), distinct (doc, gram) for the cross-doc frequency, windows
    whose gram appears in >= 2 docs counted back per doc."""
    grams = O.sql_word_ngrams("d.text", 5)
    return f"""
WITH w AS MATERIALIZED (
  SELECT d.doc_id, unnest({grams}) AS gram FROM documents d
),
tot AS (SELECT doc_id, count(*) AS n_windows FROM w GROUP BY 1),
dg AS (SELECT DISTINCT doc_id, gram FROM w),
dup AS (SELECT gram FROM dg GROUP BY gram HAVING count(*) >= 2),
dpd AS (
  SELECT w.doc_id, count(*) AS n_dup_windows
  FROM w JOIN dup USING (gram) GROUP BY 1
)
SELECT d.doc_id,
       coalesce(t.n_windows, 0)::BIGINT AS n_windows,
       coalesce(p.n_dup_windows, 0)::BIGINT AS n_dup_windows,
       CASE WHEN coalesce(t.n_windows, 0) > 0
            THEN coalesce(p.n_dup_windows, 0)::DOUBLE / t.n_windows::DOUBLE
            ELSE 0.0 END AS dup_fraction
FROM documents d
LEFT JOIN tot t ON t.doc_id = d.doc_id
LEFT JOIN dpd p ON p.doc_id = d.doc_id
"""


def _oracle_embedding_quantize() -> str:
    # mirrors quantize_exprs / quantization_error_expr tree-for-tree
    return """
WITH v AS MATERIALIZED (
  SELECT e.vec_id,
         list_transform(e.embedding, x -> x::DOUBLE) AS vd
  FROM embeddings e
),
mm AS MATERIALIZED (
  SELECT vec_id, vd,
         list_aggregate(vd, 'min') AS mn,
         list_aggregate(vd, 'max') AS mx
  FROM v
),
qc AS MATERIALIZED (
  SELECT vec_id, vd, mn, mx,
         list_transform(vd, x -> CASE WHEN (mx - mn) > 0
             THEN least(floor((x - mn) / (mx - mn) * 255.0)::INT, 255)
             ELSE 0 END) AS codes
  FROM mm
)
SELECT vec_id, mn, mx,
       list_reduce(list_prepend(0::BIGINT, list_transform(codes, c -> c::BIGINT)),
                   (acc, c) -> (acc * 31 + c) % 1000003) AS code_checksum,
       (CASE WHEN len(vd) > 0 THEN
          list_reduce(list_prepend(0.0::DOUBLE,
            list_transform(list_zip(vd, codes),
              p -> abs(p[1] - (mn + p[2]::DOUBLE / 255.0 * (mx - mn))))),
            (acc, x) -> acc + x) / len(vd)::DOUBLE
        ELSE 0.0 END) AS recon_err
FROM qc
"""


def _pq_adc_sql_parts() -> tuple[str, str]:
    """Shared ADC SQL fragments for both PQ oracles: (codes_sel — one
    cN argmin-encode expression per subspace; adc — the literal
    lookup-table distance sum). ONE definition: the encode/ADC
    expression contract must never diverge between the two gates."""
    fix = _pq_fixture()
    cb = fix["codebook"]
    m = len(cb)
    dsub = len(cb[0][0])

    def dist_expr(j, codeword):
        lits = ", ".join(f"{float(c)!r}::DOUBLE" for c in codeword)
        sub = (
            f"list_transform(e.embedding[{j*dsub+1}:{j*dsub+dsub}], "
            "x -> x::DOUBLE)"
        )
        return (
            "list_reduce(list_prepend(0.0::DOUBLE, "
            f"list_transform(list_zip({sub}, [{lits}]), "
            "p -> (p[1] - p[2]) * (p[1] - p[2]))), (acc, v) -> acc + v)"
        )

    code_exprs = []
    for j in range(m):
        dists = ", ".join(dist_expr(j, cw) for cw in cb[j])
        code_exprs.append(
            f"(list_position([{dists}], "
            f"list_aggregate([{dists}], 'min')) - 1) AS c{j}"
        )
    # ADC tables: recompute the SAME driver-side python floats from the
    # fixture's committed query vector (identical to what the Spark side
    # folded in, at every sf_dir)
    from pg_vectorize_spark.operators.pq import pq_distance_tables

    tables = pq_distance_tables(
        [float(x) for x in fix["query_vec"]], cb
    )
    terms = []
    for j, row in enumerate(tables):
        lits = ", ".join(f"{float(v)!r}::DOUBLE" for v in row)
        terms.append(f"[{lits}][c{j} + 1]")
    return ",\n         ".join(code_exprs), " + ".join(terms)


def _oracle_pq_adc_search() -> str:
    codes_sel, score = _pq_adc_sql_parts()
    return f"""
WITH codes AS MATERIALIZED (
  SELECT e.vec_id,
         {codes_sel}
  FROM embeddings e
)
SELECT vec_id, {score} AS adc_distance
FROM codes
ORDER BY adc_distance ASC, vec_id ASC
LIMIT 10
"""


def _oracle_pq_rerank_search() -> str:
    """ADC candidate CTE (shared fragments with _oracle_pq_adc_search)
    -> exact-cosine rerank against the committed query vector."""
    codes_sel, adc = _pq_adc_sql_parts()
    qv = [float(x) for x in _pq_fixture()["query_vec"]]
    qv_lits = ", ".join(f"{v!r}::DOUBLE" for v in qv)
    sim = O.sql_cosine("e.embedding", "q.qv")
    return f"""
WITH q AS (SELECT [{qv_lits}] AS qv),
codes AS MATERIALIZED (
  SELECT e.vec_id,
         {codes_sel}
  FROM embeddings e
),
cand AS (
  SELECT vec_id FROM (
    SELECT vec_id, {adc} AS adc_distance FROM codes
    ORDER BY adc_distance ASC, vec_id ASC
    LIMIT 50
  )
)
SELECT e.vec_id, {sim} AS similarity_score
FROM embeddings e CROSS JOIN q
WHERE e.vec_id IN (SELECT vec_id FROM cand)
ORDER BY similarity_score DESC, e.vec_id ASC
LIMIT 10
"""


def _oracle_maxsim_search_topk() -> str:
    sim = O.sql_cosine("e.embedding", "q.qv")
    return f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
sc AS (
  SELECT (e.vec_id // 4)::BIGINT AS group_id, {sim} AS s
  FROM embeddings e CROSS JOIN q
),
per AS (
  SELECT group_id, max(s) AS maxsim_score, count(*)::BIGINT AS n_chunks
  FROM sc GROUP BY group_id
)
SELECT group_id, maxsim_score, n_chunks
FROM per
ORDER BY maxsim_score DESC, group_id ASC
LIMIT 10
"""


def _oracle_quantized_search_topk() -> str:
    # quantize (same tree as _oracle_embedding_quantize) -> dequantize
    # (mn + c/255*(mx-mn), same op order as dequantize_expr) -> cosine
    deq = "list_transform(codes, c -> mn + c::DOUBLE / 255.0 * (mx - mn))"
    sim = O.sql_cosine(deq, "q.qv")
    return f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
v AS MATERIALIZED (
  SELECT e.vec_id, list_transform(e.embedding, x -> x::DOUBLE) AS vd
  FROM embeddings e
),
mm AS MATERIALIZED (
  SELECT vec_id, vd,
         list_aggregate(vd, 'min') AS mn,
         list_aggregate(vd, 'max') AS mx
  FROM v
),
qc AS MATERIALIZED (
  SELECT vec_id, mn, mx,
         list_transform(vd, x -> CASE WHEN (mx - mn) > 0
             THEN least(floor((x - mn) / (mx - mn) * 255.0)::INT, 255)
             ELSE 0 END) AS codes
  FROM mm
)
SELECT vec_id, {sim} AS similarity_score
FROM qc CROSS JOIN q
ORDER BY similarity_score DESC, vec_id ASC
LIMIT 10
"""


def _oracle_embedding_truncate() -> str:
    # mirrors truncate_normalize_table: same staged folds, same order
    sq = "list_reduce(list_prepend(0.0::DOUBLE, list_transform({v}, x -> x*x)), (a, x) -> a + x)"
    return f"""
WITH v AS MATERIALIZED (
  SELECT e.vec_id, list_transform(e.embedding, x -> x::DOUBLE) AS vd
  FROM embeddings e
),
s AS MATERIALIZED (
  SELECT vec_id, vd, vd[1:16] AS tv FROM v
),
n AS MATERIALIZED (
  SELECT vec_id, tv,
         sqrt({sq.format(v='tv')}) AS norm_k,
         sqrt({sq.format(v='vd')}) AS norm_full
  FROM s
)
SELECT vec_id, norm_k,
       (CASE WHEN norm_full > 0 THEN norm_k / norm_full ELSE 0.0 END)
         AS energy_frac,
       (CASE WHEN norm_k > 0 THEN
          list_reduce(list_prepend(0.0::DOUBLE,
            list_transform(tv, x -> x / norm_k)), (a, x) -> a + x)
        ELSE 0.0 END) AS sum_unit
FROM n
"""


def _oracle_chunked_embed_pool() -> str:
    # chunk CTE (mirrors _oracle_chunk_table) -> per-chunk hashed-BoW
    # embed (mirrors _oracle_embed_documents) -> per-doc pooling
    # (mirrors the embedding_pool oracle): value-sorted folds per
    # (doc, pos) keep every float op order-identical across engines.
    dim = EMBED_DIM
    words = _sql_ws_words("d.text")
    return f"""
WITH w AS MATERIALIZED (
  SELECT d.doc_id AS original_id, {words} AS words FROM documents d
),
pw AS (
  SELECT original_id,
         unnest(list_transform(range(1, len(words)+1),
                               i -> {{'pos': i, 'word': words[i::INT]}})) AS u
  FROM w
),
px AS (SELECT original_id, u.pos AS pos, u.word AS word FROM pw),
offs AS (
  SELECT original_id, pos, word,
         coalesce(sum(len(word) + 1) OVER (
           PARTITION BY original_id ORDER BY pos
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start
  FROM px
),
chunks AS MATERIALIZED (
  SELECT original_id, floor(start / 200)::INT AS chunk_index,
         string_agg(word, ' ' ORDER BY pos) AS chunk
  FROM offs GROUP BY original_id, floor(start / 200)
),
b AS MATERIALIZED (
  SELECT original_id, chunk_index,
         list_transform({O.sql_features('chunk')},
                        f -> {O.sql_hash_bucket('f', dim)}) AS buckets
  FROM chunks
),
c AS MATERIALIZED (
  SELECT original_id, chunk_index,
         list_transform(range(0, {dim}),
                        i -> len(list_filter(buckets, bk -> bk = i))::DOUBLE)
           AS counts
  FROM b
),
n AS MATERIALIZED (
  SELECT original_id, chunk_index, counts,
         sqrt(list_reduce(list_prepend(0.0::DOUBLE,
              list_transform(counts, x -> x*x)), (a, x) -> a + x)) AS nrm
  FROM c
),
e AS MATERIALIZED (
  SELECT original_id,
         CASE WHEN nrm > 0 THEN list_transform(counts, x -> x / nrm)
              ELSE counts END AS vd
  FROM n
),
pe AS (
  SELECT original_id,
         unnest(list_transform(range(1, len(vd) + 1),
                i -> {{'pos': i, 'val': vd[i::INT]}})) AS u
  FROM e
),
pxv AS (SELECT original_id, u.pos AS pos, u.val AS val FROM pe),
ps AS (
  SELECT original_id, pos,
         list_reduce(list_prepend(0.0::DOUBLE, list(val ORDER BY val)),
                     (a, x) -> a + x) AS s,
         COUNT(*) AS n
  FROM pxv GROUP BY 1, 2
),
pooled AS (
  SELECT original_id,
         list(s / n::DOUBLE ORDER BY pos) AS pooled,
         max(n)::BIGINT AS n_chunks
  FROM ps GROUP BY original_id
)
SELECT original_id AS doc_id, n_chunks,
       list_reduce(list_prepend(0.0::DOUBLE,
         list_transform(range(1, len(pooled) + 1),
                        i -> pooled[i::INT] * i::DOUBLE)),
         (a, x) -> a + x) AS pos_weighted_sum,
       pooled[1] AS first_val,
       pooled[len(pooled)] AS last_val
FROM pooled
"""


def _oracle_corpus_stats() -> str:
    tok = O.sql_token_count("d.text")
    flags = O.sql_gopher_flags("d.text", min_words=20)
    return f"""
WITH per AS (
  SELECT d.source, d.lang, {tok} AS tok,
         len(coalesce(d.text, ''))::BIGINT AS chars,
         (CASE WHEN {flags['pass_gopher']} THEN 1 ELSE 0 END)::BIGINT AS pass
  FROM documents d
)
SELECT source, lang,
       count(*)::BIGINT AS n_docs,
       sum(tok)::BIGINT AS total_tokens,
       sum(chars)::BIGINT AS total_chars,
       sum(pass)::BIGINT AS n_gopher_pass,
       (sum(tok)::DOUBLE / count(*)::DOUBLE) AS mean_tokens
FROM per
GROUP BY source, lang
"""


def _oracle_quality() -> str:
    m = O.sql_quality_metrics("d.text")
    score = O.sql_quality_score("d.text")
    return f"""
SELECT d.doc_id,
       {m['n_chars']} AS n_chars_m,
       {m['n_words']} AS n_words,
       {m['mean_word_len']} AS mean_word_len,
       {m['punct_ratio']} AS punct_ratio,
       {m['stopword_ratio']} AS stopword_ratio,
       {score} AS quality_score
FROM documents d
"""


def _oracle_knn_join() -> str:
    sim = O.sql_cosine("p.probe_vec", "e.embedding")
    return f"""
WITH probes AS (
  SELECT vec_id AS probe_id, embedding AS probe_vec
  FROM embeddings WHERE vec_id < 10
),
scored AS (
  SELECT p.probe_id, e.vec_id, {sim} AS sim
  FROM probes p CROSS JOIN embeddings e
  WHERE p.probe_id <> e.vec_id
),
ranked AS (
  SELECT probe_id, vec_id, sim,
         ROW_NUMBER() OVER (PARTITION BY probe_id
                            ORDER BY sim DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT probe_id, vec_id, sim, rank::INT AS rank FROM ranked WHERE rank <= 3
"""


def _sql_ws_words(text: str) -> str:
    """Whitespace word split preserving case/punct (chunking spec)."""
    return (
        f"list_filter(string_split_regex(coalesce({text}, ''), '\\s+'), "
        f"x -> x <> '')"
    )


def _sql_minhash_codes() -> str:
    return (
        f"list_transform({O.sql_word_shingles('d.text', 3)}, "
        f"s -> {O.sql_poly_hash('s')})"
    )


_MINHASH_SIG = (
    "list_transform(range(0, 16), i -> list_min(list_transform(codes, "
    f"x -> ((2*i + 3) * x + (5*i + 7)) % 999983)))"
)


def _sql_jaccard_ctes(threshold: float, max_df: int | None = None) -> str:
    """Shared CTE chain ending in ``jac(a_id, b_id, jaccard)`` >= threshold.

    ``max_df`` mirrors ngram_jaccard_pairs(max_shingle_df=...): shingles
    with document frequency above the cap are dropped before sizes and
    intersections (capped Jaccard over the reduced sets).
    """
    cap_ctes = (
        f"""
freq AS (SELECT shingle, count(*) AS df FROM inv0 GROUP BY shingle),
inv AS (
  SELECT i.doc_id, i.shingle FROM inv0 i
  JOIN freq f ON i.shingle = f.shingle
  WHERE f.df <= {max_df}
),"""
        if max_df is not None
        else """
inv AS (SELECT doc_id, shingle FROM inv0),"""
    )
    return f"""s AS MATERIALIZED (
  SELECT d.doc_id, {O.sql_word_shingles('d.text', 3)} AS sh FROM documents d
),
inv0 AS (SELECT doc_id, unnest(sh) AS shingle FROM s),{cap_ctes}
inter AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter
  FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
sizes AS (SELECT doc_id, count(*) AS sz FROM inv GROUP BY doc_id),
jac AS (
  SELECT i.a_id, i.b_id,
         i.inter::DOUBLE / (sa.sz + sb.sz - i.inter)::DOUBLE AS jaccard
  FROM inter i
  JOIN sizes sa ON i.a_id = sa.doc_id
  JOIN sizes sb ON i.b_id = sb.doc_id
  WHERE i.inter::DOUBLE / (sa.sz + sb.sz - i.inter)::DOUBLE >= {threshold}
)"""


def _oracle_ngram_jaccard() -> str:
    return f"""
WITH {_sql_jaccard_ctes(0.2, max_df=50)}
SELECT a_id, b_id, jaccard FROM jac
"""


def _oracle_dedup_transitive() -> str:
    """Min-label connected components as a recursive CTE: comp reaches id
    via edges -> component(id) = min reachable id (same fixpoint the Spark
    label-propagation loop computes)."""
    return f"""
WITH RECURSIVE {_sql_jaccard_ctes(0.15)},
edges AS MATERIALIZED (
  SELECT a_id AS src, b_id AS dst FROM jac
  UNION
  SELECT b_id AS src, a_id AS dst FROM jac
),
reach AS (
  SELECT src AS id, src AS comp FROM edges
  UNION
  SELECT e.dst AS id, r.comp AS comp
  FROM reach r JOIN edges e ON e.src = r.id
)
SELECT id, min(comp) AS component FROM reach GROUP BY id
"""


def _oracle_minhash_signatures() -> str:
    return f"""
WITH c AS MATERIALIZED (
  SELECT d.doc_id, {_sql_minhash_codes()} AS codes FROM documents d
)
SELECT doc_id,
       array_to_string(list_transform({_MINHASH_SIG}, x -> x::VARCHAR), ',')
         AS signature
FROM c WHERE len(codes) > 0
"""


_MINHASH_SIG_BANDS_CTES = f"""c AS MATERIALIZED (
  SELECT d.doc_id, {_sql_minhash_codes()} AS codes FROM documents d
),
sig AS MATERIALIZED (
  SELECT doc_id, {_MINHASH_SIG} AS signature FROM c WHERE len(codes) > 0
),
grp AS MATERIALIZED (
  SELECT signature, min(doc_id) AS rep FROM sig GROUP BY signature
),
bands AS (
  SELECT g.rep AS doc_id, t.band,
         array_to_string(
           list_transform(g.signature[(t.band*4 + 1):(t.band*4 + 4)],
                          x -> x::VARCHAR), ',') AS band_key
  FROM grp g, generate_series(0, 3) AS t(band)
),
cand AS (
  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
  FROM bands a
  JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
              AND a.doc_id < b.doc_id
  UNION
  SELECT g.rep AS a_id, s.doc_id AS b_id
  FROM sig s JOIN grp g ON s.signature = g.signature
  WHERE s.doc_id <> g.rep
)"""


def _oracle_corpus_to_shards() -> str:
    """Single-statement replay of the corpus->blocks composite: quality
    gate -> line dedup -> ws normalize -> MinHash band dedup -> pack ->
    manifest, each stage the exact SQL its standalone gate uses."""
    q = O.sql_quality_score("t0")
    lines = "string_split(t0, chr(10))"
    ws = "'[ ' || chr(9) || chr(13) || chr(10) || chr(12) || ']+'"
    return f"""
WITH lined AS (
  SELECT doc_id, ({_LINE_DEDUP_LINED}) AS t0 FROM documents
),
qual AS (
  SELECT doc_id, t0 FROM lined WHERE ({q}) >= 0.5
),
ld AS (
  SELECT doc_id,
    trim(regexp_replace(
      array_to_string(
        list_filter({lines},
          (x, i) -> list_position({lines}, x) = i),
        chr(10)),
      {ws}, ' ', 'g')) AS t
  FROM qual
),
c AS MATERIALIZED (
  SELECT doc_id,
         list_transform({O.sql_word_shingles("t", 3)},
                        s -> {O.sql_poly_hash("s")}) AS codes
  FROM ld
),
sig AS MATERIALIZED (
  SELECT doc_id, {_MINHASH_SIG} AS signature FROM c WHERE len(codes) > 0
),
bands AS (
  SELECT s.doc_id, tb.band,
         array_to_string(
           list_transform(s.signature[(tb.band*4 + 1):(tb.band*4 + 4)],
                          x -> x::VARCHAR), ',') AS band_key
  FROM sig s, generate_series(0, 3) AS tb(band)
),
cand AS (
  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
  FROM bands a
  JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
              AND a.doc_id < b.doc_id
),
surv AS (
  SELECT l.doc_id, l.t FROM ld l
  WHERE NOT EXISTS (SELECT 1 FROM cand WHERE cand.b_id = l.doc_id)
),
base AS (
  SELECT doc_id, {O.sql_token_count("t")} AS n_tokens,
         {O.sql_sample_priority("doc_id", "|pack")} AS prio
  FROM surv
),
pfx AS (
  SELECT doc_id, n_tokens,
    COALESCE(SUM(n_tokens) OVER (ORDER BY prio, doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
      AS start_tok
  FROM base WHERE n_tokens > 0
),
e AS (
  SELECT doc_id, n_tokens, start_tok,
    unnest(generate_series(start_tok // {PACK_BLOCK},
                           (start_tok + n_tokens - 1) // {PACK_BLOCK}))
      AS block_id
  FROM pfx
),
sl AS (
  SELECT block_id, doc_id,
    greatest(start_tok - block_id * {PACK_BLOCK}, 0) AS offset_in_block,
    greatest(block_id * {PACK_BLOCK} - start_tok, 0) AS doc_from,
    least(block_id * {PACK_BLOCK} + {PACK_BLOCK} - start_tok, n_tokens)
      AS doc_to
  FROM e
)
SELECT block_id, count(*) AS n_docs,
  sum(doc_to - doc_from)::BIGINT AS block_tokens,
  md5(string_agg(doc_id::VARCHAR || ':' || doc_from::VARCHAR || '-'
        || doc_to::VARCHAR, ',' ORDER BY offset_in_block))
    AS manifest_hash
FROM sl GROUP BY block_id
"""


def _oracle_minhash_lsh() -> str:
    return f"""
WITH {_MINHASH_SIG_BANDS_CTES}
SELECT a_id, b_id FROM cand
"""


def _oracle_neardup_index_probe() -> str:
    """Batch (doc_id%20==7) ↔ corpus (rest) band-collision pairs with
    the MinHash agreement estimate — the persisted band index's probe
    recomputed from the raw fixture (the index is lossless: its band
    rows ARE the signature slices, so the probe's matched set equals
    the cross-side band join's)."""
    return f"""
WITH {_MINHASH_SIG_BANDS_CTES_SPLIT}
SELECT cand.doc_id, cand.match_doc_id,
       len(list_filter(range(1, 17),
           i -> sa.signature[i::INT] = sb.signature[i::INT]))::DOUBLE / 16.0
         AS est_jaccard
FROM cand
JOIN sig sa ON cand.doc_id = sa.doc_id
JOIN sig sb ON cand.match_doc_id = sb.doc_id
"""


_MINHASH_SIG_BANDS_CTES_SPLIT = f"""c AS MATERIALIZED (
  SELECT d.doc_id, {_sql_minhash_codes()} AS codes FROM documents d
),
sig AS MATERIALIZED (
  SELECT doc_id, {_MINHASH_SIG} AS signature FROM c WHERE len(codes) > 0
),
bands AS (
  SELECT s.doc_id, t.band,
         array_to_string(
           list_transform(s.signature[(t.band*4 + 1):(t.band*4 + 4)],
                          x -> x::VARCHAR), ',') AS band_key
  FROM sig s, generate_series(0, 3) AS t(band)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_id, b.doc_id AS match_doc_id
  FROM bands a
  JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
  WHERE a.doc_id % 20 = 7 AND b.doc_id % 20 != 7
)"""


def _oracle_minhash_jaccard_estimate() -> str:
    return f"""
WITH {_MINHASH_SIG_BANDS_CTES}
SELECT cand.a_id, cand.b_id,
       len(list_filter(range(1, 17),
           i -> sa.signature[i::INT] = sb.signature[i::INT]))::DOUBLE / 16.0
         AS est_jaccard
FROM cand
JOIN sig sa ON cand.a_id = sa.doc_id
JOIN sig sb ON cand.b_id = sb.doc_id
"""


_SIMHASH_FROM_HASHES = """
list_reduce(list_prepend(0::BIGINT, list_transform(range(0, 20), j ->
  CASE WHEN list_reduce(list_prepend(0::BIGINT, list_transform(hashes, hh ->
         CASE WHEN (floor(hh / power(2, j))::BIGINT % 2) = 1
              THEN 1::BIGINT ELSE (-1)::BIGINT END)), (a, x) -> a + x) > 0
       THEN power(2, j)::BIGINT ELSE 0::BIGINT END)), (a, x) -> a + x)
"""


def _oracle_simhash() -> str:
    words = f"list_distinct({O.sql_words('d.text')})"
    return f"""
WITH h AS MATERIALIZED (
  SELECT d.doc_id,
         list_transform({words}, w -> {O.sql_poly_hash('w')}) AS hashes
  FROM documents d
)
SELECT doc_id, {_SIMHASH_FROM_HASHES} AS simhash FROM h
"""


def _oracle_simhash_pairs() -> str:
    # Mirrors the duplicate-cluster collapse (operators/dedup.simhash_pairs
    # collapse_identical=True): identical fingerprints contribute star
    # edges (rep = min id, hamming 0); distinct fingerprints pair at the
    # representative level (brute-force here — the Spark side's pigeonhole
    # band join is exact, so the sets agree).
    words = f"list_distinct({O.sql_words('d.text')})"
    return f"""
WITH h AS MATERIALIZED (
  SELECT d.doc_id,
         list_transform({words}, w -> {O.sql_poly_hash('w')}) AS hashes
  FROM documents d
),
s AS MATERIALIZED (
  SELECT doc_id, {_SIMHASH_FROM_HASHES} AS sh FROM h
),
grp AS MATERIALIZED (
  SELECT sh, min(doc_id) AS rep FROM s GROUP BY sh
)
SELECT g.rep AS a_id, s.doc_id AS b_id, 0::INT AS hamming
FROM s JOIN grp g ON s.sh = g.sh
WHERE s.doc_id <> g.rep
UNION ALL
SELECT a.rep AS a_id, b.rep AS b_id,
       bit_count(xor(a.sh, b.sh))::INT AS hamming
FROM grp a, grp b
WHERE a.rep < b.rep AND bit_count(xor(a.sh, b.sh)) <= 3
"""


def _oracle_embedding_cosine_pairs() -> str:
    # mirrors cosine_neardup_pairs_bucketed: 8-bit sign bucket, candidates
    # within bucket-hamming <= 1, exact cosine rescore
    bucket = (
        "list_reduce(list_prepend(0::BIGINT, list_transform(range(0, 8), "
        "j -> CASE WHEN embedding[(j+1)::INT] > 0 THEN power(2, j)::BIGINT "
        "ELSE 0::BIGINT END)), (a, x) -> a + x)"
    )
    cos = O.sql_cosine("a.embedding", "b.embedding")
    return f"""
WITH bk AS MATERIALIZED (
  SELECT vec_id, embedding, {bucket} AS bkt FROM embeddings
),
p AS (
  SELECT a.vec_id AS a_id, b.vec_id AS b_id, {cos} AS cosine
  FROM bk a JOIN bk b
    ON a.vec_id < b.vec_id AND bit_count(xor(a.bkt, b.bkt)) <= 1
)
SELECT a_id, b_id, cosine FROM p WHERE cosine >= 0.35
"""


def _oracle_ann_ivf() -> str:
    cos_assign = O.sql_cosine("e.embedding", "c.cvec")
    cos_probe = O.sql_cosine("c.cvec", "q.qv")
    cos_final = O.sql_cosine("a.embedding", "q.qv")
    return f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
cents AS (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS centroid_id,
         embedding AS cvec
  FROM embeddings ORDER BY vec_id LIMIT 8
),
assign AS (
  SELECT vec_id, embedding, cell FROM (
    SELECT e.vec_id, e.embedding, c.centroid_id AS cell,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
                              ORDER BY {cos_assign} DESC, c.centroid_id ASC)
             AS rn
    FROM embeddings e CROSS JOIN cents c
  ) WHERE rn = 1
),
probed AS (
  SELECT cell FROM (
    SELECT c.centroid_id AS cell, {cos_probe} AS qsim
    FROM cents c CROSS JOIN q
  ) ORDER BY qsim DESC, cell ASC LIMIT 2
)
SELECT a.vec_id, {cos_final} AS similarity_score
FROM assign a JOIN probed p ON a.cell = p.cell CROSS JOIN q
ORDER BY similarity_score DESC, a.vec_id ASC
LIMIT 10
"""


def _oracle_ann_signbit() -> str:
    def bucket(emb: str) -> str:
        return (
            f"list_reduce(list_prepend(0::BIGINT, list_transform(range(0, 8), "
            f"j -> CASE WHEN {emb}[(j+1)::INT] > 0 THEN power(2, j)::BIGINT "
            f"ELSE 0::BIGINT END)), (a, x) -> a + x)"
        )

    cos = O.sql_cosine("e.embedding", "q.qv")
    return f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
qb AS (SELECT {bucket('qv')} AS qbucket FROM q),
cand AS (
  SELECT e.vec_id, {cos} AS similarity_score
  FROM embeddings e, qb, q
  WHERE {bucket('e.embedding')} = qb.qbucket
)
SELECT vec_id, similarity_score FROM cand
ORDER BY similarity_score DESC, vec_id ASC
LIMIT 10
"""


def _oracle_ann_multiprobe() -> str:
    """Multi-probe variant: candidate buckets are the Hamming ball of
    radius 2 around the query bucket — bit_count(xor(b, qb)) <= 2."""

    def bucket(emb: str) -> str:
        return (
            f"list_reduce(list_prepend(0::BIGINT, list_transform(range(0, 8), "
            f"j -> CASE WHEN {emb}[(j+1)::INT] > 0 THEN power(2, j)::BIGINT "
            f"ELSE 0::BIGINT END)), (a, x) -> a + x)"
        )

    cos = O.sql_cosine("e.embedding", "q.qv")
    return f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
qb AS (SELECT {bucket('qv')} AS qbucket FROM q),
cand AS (
  SELECT e.vec_id, {cos} AS similarity_score
  FROM embeddings e, qb, q
  WHERE bit_count(xor({bucket('e.embedding')}, qb.qbucket)) <= 2
)
SELECT vec_id, similarity_score FROM cand
ORDER BY similarity_score DESC, vec_id ASC
LIMIT 10
"""


def _oracle_chunk_table() -> str:
    words = _sql_ws_words("d.text")
    return f"""
WITH w AS MATERIALIZED (
  SELECT d.doc_id AS original_id, {words} AS words FROM documents d
),
pw AS (
  SELECT original_id,
         unnest(list_transform(range(1, len(words)+1),
                               i -> {{'pos': i, 'word': words[i::INT]}})) AS u
  FROM w
),
px AS (SELECT original_id, u.pos AS pos, u.word AS word FROM pw),
offs AS (
  SELECT original_id, pos, word,
         coalesce(sum(len(word) + 1) OVER (
           PARTITION BY original_id ORDER BY pos
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start
  FROM px
)
SELECT original_id, floor(start / 200)::INT AS chunk_index,
       string_agg(word, ' ' ORDER BY pos) AS chunk
FROM offs GROUP BY original_id, floor(start / 200)
"""


def _bpe_enc_ctes(mvals: str, pass_expr: str, n: int) -> str:
    """The shared encode CTE chain (merges -> per-word recursive merge
    passes -> ``enc(word, s)``), reused by the bpe_token_count and
    tokenizer_fertility oracles."""
    return f"""m(rank, ma, mb) AS (SELECT * FROM (VALUES {mvals}) t(r, a, b)),
w AS (SELECT doc_id, {O.sql_words('text')} AS words FROM documents),
p AS (
  SELECT doc_id, unnest(words) AS word,
         generate_subscripts(words, 1) AS i
  FROM w
),
dw AS (SELECT DISTINCT word FROM p),
r(word, step, s) AS (
  SELECT word, 0,
    array_to_string(
      list_transform(range(1, len(word)+1), j -> word[j:j]) || ['</w>'],
      ' ')
  FROM dw
  UNION ALL
  SELECT r.word, r.step + 1, {pass_expr}
  FROM r JOIN m ON m.rank = r.step + 1
),
enc AS (SELECT word, s FROM r WHERE step = {n})"""


def _oracle_tokenizer_fertility() -> str:
    """Per-language tokenizer fertility under the committed merges:
    BPE tokens per word and characters per BPE token — the
    multilingual-tokenizer health metric (a language whose fertility
    blows up is being byte-shredded). Shares the recursive encode CTEs
    with the bpe_token_count oracle."""
    merges = _bpe_merges()
    mvals = ", ".join(
        f"({i + 1}, '{a}', '{b}')" for i, (a, b) in enumerate(merges)
    )
    n = len(merges)
    pass_expr = """
list_reduce(string_split(r.s, ' '), (acc, x) ->
  CASE WHEN x = m.mb AND (acc = m.ma OR acc LIKE '% ' || m.ma)
       THEN CASE WHEN acc = m.ma THEN m.ma || m.mb
                 ELSE left(acc, len(acc) - len(m.ma)) || m.ma || m.mb END
       ELSE acc || ' ' || x END)
"""
    return f"""
WITH RECURSIVE {_bpe_enc_ctes(mvals, pass_expr, n)},
perdoc AS (
  SELECT p.doc_id,
         count(*) AS n_words,
         sum(len(string_split(enc.s, ' ')))::BIGINT AS n_bpe
  FROM p JOIN enc ON p.word = enc.word
  GROUP BY p.doc_id
)
SELECT d.lang,
  count(*) AS n_docs,
  coalesce(sum(perdoc.n_words), 0)::BIGINT AS total_words,
  coalesce(sum(perdoc.n_bpe), 0)::BIGINT AS total_bpe_tokens,
  sum(len(d.text))::BIGINT AS total_chars,
  CASE WHEN coalesce(sum(perdoc.n_words), 0) > 0
       THEN coalesce(sum(perdoc.n_bpe), 0)::DOUBLE
            / sum(perdoc.n_words)::DOUBLE END AS fertility,
  CASE WHEN coalesce(sum(perdoc.n_bpe), 0) > 0
       THEN sum(len(d.text))::DOUBLE
            / sum(perdoc.n_bpe)::DOUBLE END AS chars_per_token
FROM documents d LEFT JOIN perdoc ON d.doc_id = perdoc.doc_id
GROUP BY d.lang
"""



def _oracle_bpe_token_count() -> str:
    """Replay the BPE encode under the committed merges as a recursive
    CTE: distinct words start as chars + '</w>'; step i applies merge i
    as ONE left-to-right greedy pass, expressed as a string-state
    list_reduce (the trailing-symbol test ``acc LIKE '% ' || a`` is
    exact because symbols never contain spaces or LIKE wildcards —
    alphabet is [a-z0-9] plus '</w>')."""
    merges = _bpe_merges()
    mvals = ", ".join(
        f"({i + 1}, '{a}', '{b}')" for i, (a, b) in enumerate(merges)
    )
    n = len(merges)
    pass_expr = """
list_reduce(string_split(r.s, ' '), (acc, x) ->
  CASE WHEN x = m.mb AND (acc = m.ma OR acc LIKE '% ' || m.ma)
       THEN CASE WHEN acc = m.ma THEN m.ma || m.mb
                 ELSE left(acc, len(acc) - len(m.ma)) || m.ma || m.mb END
       ELSE acc || ' ' || x END)
"""
    return f"""
WITH RECURSIVE {_bpe_enc_ctes(mvals, pass_expr, n)},
agg AS (
  SELECT p.doc_id,
         count(*) AS n_words,
         sum(len(string_split(enc.s, ' ')))::BIGINT AS n_bpe_tokens,
         md5(string_agg(enc.s, ' ' ORDER BY p.i)) AS token_hash
  FROM p JOIN enc ON p.word = enc.word
  GROUP BY p.doc_id
)
SELECT d.doc_id,
       coalesce(agg.n_words, 0) AS n_words,
       coalesce(agg.n_bpe_tokens, 0) AS n_bpe_tokens,
       coalesce(agg.token_hash, md5('')) AS token_hash
FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id
"""


ORACLE: dict[str, str] = {
    "semantic_search_topk": _oracle_semantic_topk(),
    # the indexed path must return the EXACT brute-force ranking — same
    # oracle as the full-scan gate, by design (VERDICT r5 #1)
    "semantic_search_indexed": _oracle_semantic_topk(),
    "semantic_search_filtered": _oracle_semantic_filtered(),
    "fts_search_topk": _oracle_fts_topk(),
    "hybrid_rrf_search": _oracle_hybrid(),
    # the postings-index probe is LOSSLESS (unlike the ANN probe), so the
    # indexed FTS/hybrid gates share the full-scan oracles bit-for-bit
    "fts_search_indexed": _oracle_fts_topk(),
    # the overlay gate's logical corpus: cohort 3 deleted, cohort 7 at
    # its true (post-update) text — the raw fixture text IS the truth
    "fts_search_overlay": _oracle_fts_overlay(),
    "hybrid_rrf_indexed": _oracle_hybrid(),
    "view_join": """
SELECT d.doc_id, d.lang, e.label, len(e.embedding)::INT AS dim
FROM documents d INNER JOIN embeddings e ON d.doc_id = e.vec_id
""",
    "change_detection": """
SELECT d.doc_id, d.n_chars
FROM documents d
WHERE NOT EXISTS (
  SELECT 1 FROM embeddings e WHERE e.label = 0 AND e.vec_id = d.doc_id
)
""",
    "record_fetch_by_ids": f"""
SELECT doc_id, text, lang, source, n_chars
FROM documents WHERE doc_id IN ({", ".join(str(i) for i in FETCH_IDS)})
""",
    "token_count": f"""
SELECT doc_id, {O.sql_token_count('text')} AS n_tokens,
       {O.sql_ws_token_count('text')} AS ws_tokens
FROM documents
""",
    "embed_documents": _oracle_embed_documents(),
    "doc_fingerprint": f"""
SELECT doc_id, {O.sql_fingerprint('text')} AS fingerprint FROM documents
""",
    "quality_score": _oracle_quality(),
    "lang_id": f"""
SELECT doc_id, {O.sql_lang_id('text')} AS lang_pred FROM documents
""",
    "repetition_score": f"""
SELECT doc_id,
       {O.sql_repetition_score('text', 2)} AS rep_2gram,
       {O.sql_repetition_score('text', 3)} AS rep_3gram
FROM documents
""",
    "pii_scrub": f"""
SELECT doc_id,
       {O.sql_pii_counts('text')['n_urls']} AS n_urls,
       {O.sql_pii_counts('text')['n_emails']} AS n_emails,
       length({O.sql_scrub_pii('text')})::INT AS scrubbed_len
FROM documents
""",
    "dedup_exact": """
SELECT min(doc_id) AS keep_id, count(*) AS n_copies
FROM documents GROUP BY text
""",
    "knn_join": _oracle_knn_join(),
    "dedup_ngram_jaccard": _oracle_ngram_jaccard(),
    "dedup_minhash_lsh": _oracle_minhash_lsh(),
    "neardup_index_probe": _oracle_neardup_index_probe(),
    # the driver-side path answers the SAME question as the Spark probe
    # (bit-parity pinned in tests/test_dedup_local.py) — identical oracle
    "neardup_probe_local": _oracle_neardup_index_probe(),
    "minhash_signatures": _oracle_minhash_signatures(),
    "minhash_jaccard_estimate": _oracle_minhash_jaccard_estimate(),
    "dedup_simhash": _oracle_simhash(),
    "simhash_neardup_pairs": _oracle_simhash_pairs(),
    "dedup_embedding_cosine": _oracle_embedding_cosine_pairs(),
    "ann_ivf_topk": _oracle_ann_ivf(),
    "ann_signbit_lsh_topk": _oracle_ann_signbit(),
    "ann_multiprobe_lsh_topk": _oracle_ann_multiprobe(),
    # same lexical pipeline: tag->space, entity decode (&amp; last, one
    # level), explicit-class whitespace collapse; RE2 and Java regex agree
    # on these patterns
    "text_normalize": r"""
WITH h AS (
  SELECT doc_id,
         '<p class="x">' || text || '</p>' || chr(10) ||
         '<br/>&amp;amp; &lt;tail&gt;' || chr(9) || ' end' AS html
  FROM documents WHERE doc_id < 300
),
s AS (SELECT doc_id, regexp_replace(html, '<[^>]*>', ' ', 'g') AS t FROM h),
e AS (
  SELECT doc_id,
         replace(replace(replace(replace(replace(replace(t,
           '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
           '&nbsp;', ' '), '&amp;', '&') AS t
  FROM s
),
c AS (
  SELECT doc_id,
         trim(regexp_replace(t, '[ ' || chr(9) || chr(13) || chr(10) ||
                                chr(12) || ']+', ' ', 'g')) AS clean_text
  FROM e
)
SELECT doc_id, clean_text, len(clean_text)::BIGINT AS clean_len FROM c
""",
    # corpus is ASCII (verified for multimodal_pipeline), so byte slicing
    # equals substr on text and md5(varchar) hashes the same bytes Spark's
    # md5(binary) sees
    "frame_sample": """
WITH d AS (
  SELECT doc_id, text, len(text) AS n FROM documents WHERE doc_id < 200
),
f AS (
  SELECT doc_id, text,
         unnest(range(0, greatest(CAST(ceil(n / 256.0) AS BIGINT), 1)))
           AS fi
  FROM d
)
SELECT doc_id,
       fi::INT AS frame_idx,
       (fi * 256)::BIGINT AS offset,
       len(substr(text, (fi * 256 + 1)::INT, 256))::BIGINT AS frame_len,
       md5(substr(text, (fi * 256 + 1)::INT, 256)) AS frame_hash
FROM f
""",
    # C4 rules over the SAME line-synthesis expression both engines
    # evaluate (_C4_LINED); list lambdas mirror the Spark filters
    "c4_flags": f"""
WITH lined AS MATERIALIZED (
  SELECT doc_id, {_C4_LINED} AS t
  FROM documents WHERE doc_id < 400
),
parts AS MATERIALIZED (
  SELECT doc_id, t,
    list_filter(string_split(t, chr(10)), x -> trim(x) <> '') AS lines,
    list_filter(string_split_regex(t, '[.!?]'),
                x -> trim(x) <> '') AS sentences
  FROM lined
),
kept AS MATERIALIZED (
  SELECT doc_id, t, lines, sentences,
    list_filter(lines, x ->
      (ends_with(trim(x), '.') OR ends_with(trim(x), '!')
       OR ends_with(trim(x), '?') OR ends_with(trim(x), '"'))
      AND len(list_filter(
            string_split_regex(lower(x), '[^a-z0-9]+'),
            w -> w <> '')) >= 3) AS keep_lines
  FROM parts
)
SELECT doc_id,
  len(lines)::BIGINT AS n_lines,
  len(keep_lines)::BIGINT AS n_kept_lines,
  len(sentences)::BIGINT AS n_sentences,
  contains(lower(t), 'lorem ipsum') AS has_lorem_ipsum,
  contains(t, '{{') AS has_brace,
  (len(sentences) >= 3 AND NOT contains(lower(t), 'lorem ipsum')
   AND NOT contains(t, '{{')) AS pass_c4,
  md5(coalesce(array_to_string(keep_lines, chr(10)), '')) AS clean_hash
FROM kept
""",
    "paragraph_dedup": f"""
WITH lined AS MATERIALIZED (
  SELECT doc_id, {_PARA_LINED} AS t
  FROM documents WHERE doc_id < 400
),
p AS MATERIALIZED (
  SELECT doc_id, i - 1 AS pos, string_split(t, chr(10))[i] AS para
  FROM lined, unnest(range(1, len(string_split(t, chr(10))) + 1)) AS r(i)
  WHERE trim(string_split(t, chr(10))[i]) <> ''
),
marked AS MATERIALIZED (
  SELECT doc_id, pos, para,
         ROW_NUMBER() OVER (
           PARTITION BY para ORDER BY doc_id, pos
         ) AS rn
  FROM p
)
SELECT doc_id,
       count(*)::BIGINT AS n_paras,
       sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END)::BIGINT AS n_kept,
       md5(coalesce(string_agg(CASE WHEN rn = 1 THEN para END,
                               chr(10) ORDER BY pos), '')) AS clean_hash
FROM marked GROUP BY doc_id
""",
    "hard_negatives": f"""
WITH a AS (
  SELECT vec_id AS anchor_id, embedding AS av, label AS al
  FROM embeddings WHERE vec_id < 5
),
scored AS (
  SELECT a.anchor_id, e.vec_id,
         {O.sql_cosine('a.av', 'e.embedding')} AS sim
  FROM a JOIN embeddings e
    ON e.vec_id <> a.anchor_id AND e.label IS DISTINCT FROM a.al
),
ranked AS (
  SELECT anchor_id, vec_id, sim,
         ROW_NUMBER() OVER (
           PARTITION BY anchor_id ORDER BY sim DESC, vec_id
         ) AS rank
  FROM scored
)
SELECT anchor_id, vec_id, sim, rank::INT AS rank
FROM ranked WHERE rank <= 5
""",
    # SemDeDup: argmax-cosine assignment to the first-8 centroids (ties
    # -> lowest centroid id, matching ann.assign_ivf_cells' window) +
    # lower-key same-cell neighbor rule
    "dedup_semantic_cluster": f"""
WITH e AS MATERIALIZED (SELECT vec_id, embedding FROM embeddings),
c AS MATERIALIZED (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS centroid_id,
         embedding AS cv
  FROM (SELECT * FROM e ORDER BY vec_id LIMIT 8)
),
scored AS (
  SELECT e.vec_id, c.centroid_id,
         {O.sql_cosine('e.embedding', 'c.cv')} AS cs
  FROM e CROSS JOIN c
),
assign AS MATERIALIZED (
  SELECT vec_id, centroid_id AS cell FROM (
    SELECT vec_id, centroid_id,
           ROW_NUMBER() OVER (
             PARTITION BY vec_id ORDER BY cs DESC, centroid_id
           ) AS rn
    FROM scored
  ) WHERE rn = 1
),
ea AS MATERIALIZED (
  SELECT a.vec_id, a.embedding, s.cell
  FROM e a JOIN assign s ON s.vec_id = a.vec_id
),
dups AS (
  SELECT DISTINCT b.vec_id
  FROM ea a JOIN ea b ON a.cell = b.cell AND a.vec_id < b.vec_id
  WHERE {O.sql_cosine('a.embedding', 'b.embedding')} >= 0.35
)
SELECT s.vec_id, s.cell::INT AS cell,
       (d.vec_id IS NOT NULL) AS is_dup
FROM assign s LEFT JOIN dups d ON d.vec_id = s.vec_id
""",
    # DSIR: add-1-smoothed hashed-unigram distributions, nano-unit
    # floored log-ratio per bucket, exact BIGINT doc sum
    "dsir_weights": f"""
WITH rw AS MATERIALIZED (
  SELECT doc_id, {O.sql_hash_bucket('w', 256)} AS b
  FROM (SELECT doc_id, unnest({O.sql_words('text')}) AS w
        FROM documents)
),
tb AS MATERIALIZED (
  SELECT {O.sql_hash_bucket('w', 256)} AS b
  FROM (SELECT unnest({O.sql_words('text')}) AS w
        FROM documents WHERE lang = 'en')
),
buckets AS (SELECT unnest(range(0, 256)) AS b),
counts AS (
  SELECT bk.b,
         coalesce(tc.n, 0) AS nt,
         coalesce(rc.n, 0) AS nr
  FROM buckets bk
  LEFT JOIN (SELECT b, count(*) AS n FROM tb GROUP BY b) tc ON tc.b = bk.b
  LEFT JOIN (SELECT b, count(*) AS n FROM rw GROUP BY b) rc ON rc.b = bk.b
),
tot AS (SELECT sum(nt) AS tt, sum(nr) AS tr FROM counts),
delta AS MATERIALIZED (
  SELECT b,
         floor((ln((nt::DOUBLE + 1.0) / (tt::DOUBLE + 256.0))
              - ln((nr::DOUBLE + 1.0) / (tr::DOUBLE + 256.0)))
               * 1000000000.0)::BIGINT AS d9
  FROM counts, tot
)
SELECT doc_id, count(*)::BIGINT AS n_tokens,
       (sum(d9)::DOUBLE / 1000000000.0) AS log_weight
FROM rw JOIN delta USING (b)
GROUP BY doc_id
""",
    # spec-derived closed form, independent of the codec code:
    # payload_start = 441 + 4*(n + n_chunks + n_keyframes) for the
    # minimal stts/stss/stsc/stsz/stco layout (constants re-added from
    # ISO/IEC 14496-12 box sizes by hand); sample i's offset adds the
    # cumulative sizes of earlier samples (chunks are contiguous in
    # mdat, so chunking cancels out of the offset)
    "mp4_frame_extract": """
WITH d AS (
  SELECT doc_id, 3 + doc_id % 5 AS n, 2 + doc_id % 3 AS ke
  FROM documents WHERE doc_id < 40
),
f AS (
  SELECT doc_id, n, ke, unnest(range(0, n)) AS i FROM d
),
sized AS (
  SELECT doc_id, n, ke, i,
         10 + (doc_id * 3 + i * 7) % 23 AS sz,
         chr((97 + (doc_id + i) % 26)::INT) AS ch
  FROM f
)
SELECT doc_id,
       i::INT AS frame_idx,
       (441 + 4 * (n + ((n + 1) // 2) + ((n - 1) // ke + 1))
        + coalesce(sum(sz) OVER (
            PARTITION BY doc_id ORDER BY i
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       )::BIGINT AS offset,
       sz::BIGINT AS frame_size,
       (i * 100) / 1000.0 AS ts_seconds,
       (i % ke) = 0 AS keyframe,
       md5(repeat(ch, sz::INT)) AS frame_hash
FROM sized
""",
    "batch_texts": """
WITH b AS (
  SELECT doc_id, n_chars,
         floor((ROW_NUMBER() OVER (ORDER BY doc_id) - 1) / 100)::BIGINT
           AS batch_id
  FROM documents
)
SELECT batch_id, count(*) AS n_docs, sum(n_chars)::BIGINT AS total_chars,
       min(doc_id) AS first_id, max(doc_id) AS last_id
FROM b GROUP BY batch_id
""",
    "token_budget_batches": f"""
WITH tk AS MATERIALIZED (
  SELECT doc_id, {O.sql_token_count('text')} AS n_tokens FROM documents
),
b AS (
  SELECT doc_id, n_tokens,
         floor(coalesce(sum(n_tokens) OVER (
             ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::DOUBLE
           / 5000)::BIGINT AS batch_id
  FROM tk
)
SELECT batch_id, count(*) AS n_docs, sum(n_tokens)::BIGINT AS batch_tokens
FROM b GROUP BY batch_id
""",
    "chunk_table": _oracle_chunk_table(),
    "where_sql_filter": """
SELECT doc_id, lang, n_chars FROM documents
WHERE n_chars > 200 AND lang = 'en'
""",
    "typed_filters_part": """
SELECT p_partkey, p_name, p_type, p_size, p_retailprice FROM part
WHERE p_retailprice >= 950.5 AND p_size < 25 AND p_type = 'PROMO'
""",
    "multimodal_meta": """
SELECT doc_id, octet_length(encode(text))::BIGINT AS byte_len,
       md5(text) AS content_hash
FROM documents
""",
    "events_windowed_agg": """
SELECT date_trunc('hour', ts) AS window_start, event_type,
       count(*) AS n_events,
       sum(value::DECIMAL(18,4))::DOUBLE AS sum_value
FROM events GROUP BY 1, 2
""",
    "incremental_scan_events": """
SELECT event_id, ts, user_id, value FROM events
WHERE ts > TIMESTAMP '2024-01-20 00:00:00' AND event_type = 'click'
""",
    "sessionize_events": """
WITH p AS (
  SELECT user_id, ts, event_id,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_us
  FROM events
),
f AS (
  SELECT user_id, ts, event_id,
         CASE WHEN prev_us IS NULL
                   OR (epoch_us(ts) - prev_us) > 1800000000
              THEN 1 ELSE 0 END AS new_s
  FROM p
),
s AS (
  SELECT user_id, ts,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                         )::BIGINT AS session_id
  FROM f
)
SELECT user_id, session_id, count(*) AS n_events,
       min(ts) AS session_start, max(ts) AS session_end
FROM s GROUP BY 1, 2
""",
    "asof_join_events": """
WITH l AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
), r AS (
  SELECT event_id AS rid, user_id, ts AS r_ts, value AS r_value
  FROM events WHERE event_type = 'purchase'
)
SELECT l.event_id, l.user_id, l.ts,
       coalesce(r.r_ts, TIMESTAMP '1970-01-01') AS purchase_ts,
       coalesce(r.r_value, -1.0) AS purchase_value
FROM l LEFT JOIN r ON l.user_id = r.user_id AND r.r_ts <= l.ts
QUALIFY row_number() OVER (
  PARTITION BY l.event_id
  ORDER BY r.r_ts DESC NULLS LAST, r.rid DESC NULLS LAST) = 1
""",
    "attribution_window_join": """
SELECT l.event_id, r.event_id AS purchase_eid, l.user_id,
       ((epoch_us(l.ts) - epoch_us(r.ts))::DOUBLE / 1000000.0) AS gap_sec
FROM events l JOIN events r
  ON l.user_id = r.user_id
 AND l.ts >= r.ts AND l.ts <= r.ts + INTERVAL 2 HOUR
WHERE l.event_type = 'click' AND r.event_type = 'purchase'
""",
    "asof_join_bucketed": """
WITH l AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
), r AS (
  SELECT event_id AS rid, user_id, ts AS r_ts, value AS r_value
  FROM events WHERE event_type = 'purchase'
)
SELECT l.event_id, l.user_id, l.ts,
       coalesce(r.r_ts, TIMESTAMP '1970-01-01') AS purchase_ts,
       coalesce(r.r_value, -1.0) AS purchase_value
FROM l LEFT JOIN r
  ON l.user_id = r.user_id AND r.r_ts <= l.ts
 AND r.r_ts >= l.ts - INTERVAL 6 HOUR
QUALIFY row_number() OVER (
  PARTITION BY l.event_id
  ORDER BY r.r_ts DESC NULLS LAST, r.rid DESC NULLS LAST) = 1
""",
    "collect_changed_ids": """
WITH c AS (
  SELECT doc_id,
         floor((ROW_NUMBER() OVER (ORDER BY doc_id) - 1) / 100)::BIGINT
           AS batch_id
  FROM documents WHERE n_chars > 250
)
SELECT batch_id, string_agg(doc_id::VARCHAR, ',' ORDER BY doc_id) AS record_ids,
       count(*) AS n_ids
FROM c GROUP BY batch_id
""",
    "json_rows": """
SELECT doc_id,
       to_json({'doc_id': doc_id, 'lang': lang, 'source': source,
                'n_chars': n_chars})::VARCHAR AS row_json
FROM documents WHERE doc_id < 50
""",
    "append_method_scan": """
WITH wide AS (
  SELECT event_id, event_type, ts,
         CASE WHEN event_id % 3 = 0 THEN ts END AS emb_updated_at
  FROM events
)
SELECT event_id, event_type FROM wide
WHERE emb_updated_at IS NULL
   OR ts > COALESCE(emb_updated_at, TIMESTAMP '0001-01-01 00:00:00')
""",
    "hybrid_weighted": _oracle_hybrid_weighted(),
    "fts_stemmed": _oracle_fts_stemmed(),
    "fts_cover_density": _oracle_fts_cover_density(),
    "fts_bm25": _oracle_fts_bm25(),
    "hybrid_bm25": _oracle_hybrid_bm25(),
    "cdf_apply": _oracle_cdf_apply(),
    "quantized_search_topk": _oracle_quantized_search_topk(),
    "maxsim_search_topk": _oracle_maxsim_search_topk(),
    "pq_adc_search": _oracle_pq_adc_search(),
    "pq_rerank_search": _oracle_pq_rerank_search(),
    "gopher_flags": _oracle_gopher_flags(),
    "hash_split": _oracle_hash_split(),
    "corpus_mix": _oracle_corpus_mix(),
    "vocabulary_topk": _oracle_vocabulary_topk(),
    "unigram_logprob": _oracle_unigram_logprob(),
    "perplexity_buckets": _oracle_perplexity_buckets(),
    "bigram_logprob": _oracle_bigram_logprob(),
    "sample_exact": _oracle_sample_exact(),
    "source_divergence": _oracle_source_divergence(),
    "domain_cap": _oracle_domain_cap(),
    "decontaminate": _oracle_decontaminate(),
    "dup_span_stats": _oracle_dup_span_stats(),
    # same two-stage pooling: per-(grp,pos) seeded fold over the
    # value-sorted list (the repo float-parity rule), mean after;
    # scalar projections (pos-weighted fold, first/last) because the
    # driver canonicalizer cannot hash array columns
    "embedding_pool": """
WITH v AS MATERIALIZED (
  SELECT vec_id % 50 AS grp,
         list_transform(embedding, x -> x::DOUBLE) AS vd
  FROM embeddings
),
pe AS (
  SELECT grp,
         unnest(list_transform(range(1, len(vd) + 1),
                i -> {'pos': i, 'val': vd[i::INT]})) AS u
  FROM v
),
px AS (SELECT grp, u.pos AS pos, u.val AS val FROM pe),
ps AS (
  SELECT grp, pos,
         list_reduce(list_prepend(0.0::DOUBLE, list(val ORDER BY val)),
                     (a, x) -> a + x) AS s,
         COUNT(*) AS n
  FROM px GROUP BY 1, 2
),
pooled AS (
  SELECT grp,
         list(s / n::DOUBLE ORDER BY pos) AS pooled,
         max(n)::BIGINT AS n_vectors
  FROM ps GROUP BY grp
)
SELECT grp, n_vectors,
       len(pooled)::BIGINT AS dim,
       list_reduce(list_prepend(0.0::DOUBLE,
         list_transform(range(1, len(pooled) + 1),
                        i -> pooled[i::INT] * i::DOUBLE)),
         (a, x) -> a + x) AS pos_weighted_sum,
       pooled[1] AS first_val,
       pooled[len(pooled)] AS last_val
FROM pooled
""",
    "chunked_embed_pool": _oracle_chunked_embed_pool(),
    "corpus_stats": _oracle_corpus_stats(),
    "embedding_quantize": _oracle_embedding_quantize(),
    "embedding_truncate": _oracle_embedding_truncate(),
    "quality_filter": f"""
WITH q AS (
  SELECT doc_id, lang, {O.sql_quality_score('text')} AS quality_score
  FROM documents
)
SELECT doc_id, lang, quality_score FROM q WHERE quality_score >= 0.5
""",
    "dedup_survivors": f"""
WITH {_sql_jaccard_ctes(0.2)},
losers AS (SELECT DISTINCT b_id AS doc_id FROM jac)
SELECT d.doc_id, d.n_chars FROM documents d
WHERE NOT EXISTS (SELECT 1 FROM losers l WHERE l.doc_id = d.doc_id)
""",
    "dedup_transitive": _oracle_dedup_transitive(),
    # cascade-delete parity: orphans = embeddings keys absent from the
    # post-delete source (doc_id % 7 == 3 simulated-deleted)
    "orphan_cleanup": """
SELECT e.vec_id AS doc_id, len(e.embedding)::INT AS dim
FROM embeddings e
WHERE NOT EXISTS (
  SELECT 1 FROM documents d
  WHERE d.doc_id = e.vec_id AND d.doc_id % 7 != 3
)
""",
    # REAL-decode verification: the fixture PNG/WAV blobs follow
    # px[y,x,c] = (3x+5y+7c+11*seed) % 256 and
    # s[i,c] = ((37i+13c+17*seed) % 4001) - 2000, so the expected intensity/
    # amplitude histograms are recomputed here from pure arithmetic —
    # independent of the zlib/unfilter/PCM code under test
    "multimodal_decode": """
WITH m AS MATERIALIZED (
  SELECT media_id, kind, width, height, channels, seed
  FROM read_parquet('/root/repo/tests/fixtures/media_fixture.parquet')
),
img0 AS (
  SELECT media_id, channels, seed, height,
         unnest(range(0, width)) AS x
  FROM m WHERE kind = 'png'
),
img1 AS (
  SELECT media_id, channels, seed, x, unnest(range(0, height)) AS y
  FROM img0
),
img2 AS (
  SELECT media_id, channels, x, y, seed, unnest(range(0, channels)) AS c
  FROM img1
),
img AS (
  SELECT media_id, channels, x, y,
         SUM((3*x + 5*y + 7*c + 11*seed) % 256) AS s
  FROM img2 GROUP BY 1, 2, 3, 4
),
img_b AS (
  SELECT media_id, (s * 8) // (256 * channels) AS bucket FROM img
),
wav0 AS (
  SELECT media_id, channels, seed, unnest(range(0, width)) AS i
  FROM m WHERE kind = 'wav'
),
wav1 AS (
  SELECT media_id, seed, i, unnest(range(0, channels)) AS c FROM wav0
),
wav_b AS (
  SELECT media_id,
         ((((37*i + 13*c + 17*seed) % 4001) - 2000 + 32768) * 8)
           // 65536 AS bucket
  FROM wav1
),
-- JPEG fixtures are block-constant (only DC coefficients, DC quant 8), so
-- the lossy codec is bit-exact on them and the laws below reproduce the
-- decoded pixels: Y=(17bx+29by+11s)%256 per 8x8 block, Cb/Cr per
-- chroma block (8 for 4:4:4, 16 for 4:2:0), then the JFIF inverse
-- transform with floor(x+0.5) rounding — same arithmetic as the decoder
jpgg0 AS (
  SELECT media_id, seed, height, unnest(range(0, width)) AS x
  FROM m WHERE kind IN ('jpg_gray', 'jpg_prog_gray')
),
jpgg1 AS (
  SELECT media_id, seed, x, unnest(range(0, height)) AS y FROM jpgg0
),
jpgg_b AS (
  SELECT media_id,
         (((17*(x//8) + 29*(y//8) + 11*seed) % 256) * 8) // 256 AS bucket
  FROM jpgg1
),
jpgc0 AS (
  SELECT media_id, seed, height,
         CASE WHEN kind IN ('jpg_420', 'jpg_prog_420') THEN 16 ELSE 8
           END AS cblk,
         unnest(range(0, width)) AS x
  FROM m WHERE kind IN ('jpg_444', 'jpg_420', 'jpg_prog_420')
),
jpgc1 AS (
  SELECT media_id, seed, cblk, x, unnest(range(0, height)) AS y FROM jpgc0
),
jpgc AS (
  SELECT media_id,
    ((17*(x//8) + 29*(y//8) + 11*seed) % 256)::DOUBLE AS yv,
    (((23*(x//cblk) + 7*(y//cblk) + 13*seed) % 256) - 128)::DOUBLE AS cbv,
    (((31*(x//cblk) + 19*(y//cblk) + 5*seed) % 256) - 128)::DOUBLE AS crv
  FROM jpgc1
),
jpgrgb AS (
  SELECT media_id,
    LEAST(255, GREATEST(0,
      floor(yv + 1.402::DOUBLE * crv + 0.5)))::BIGINT
  + LEAST(255, GREATEST(0,
      floor(yv - 0.344136::DOUBLE * cbv - 0.714136::DOUBLE * crv
            + 0.5)))::BIGINT
  + LEAST(255, GREATEST(0,
      floor(yv + 1.772::DOUBLE * cbv + 0.5)))::BIGINT AS s
  FROM jpgc
),
jpgc_b AS (
  SELECT media_id, (s * 8) // (256 * 3) AS bucket FROM jpgrgb
),
-- palette PNG: idx = (x + 2y + seed) % 64 expanded through the analytic
-- palette pal[i] = ((5i)%256, (7i+3)%256, (11i+1)%256)
pal0 AS (
  SELECT media_id, seed, height, unnest(range(0, width)) AS x
  FROM m WHERE kind = 'png_palette'
),
pal1 AS (
  SELECT media_id, seed, x, unnest(range(0, height)) AS y FROM pal0
),
pal_b AS (
  SELECT media_id,
         ((((5*i) % 256) + ((7*i + 3) % 256) + ((11*i + 1) % 256)) * 8)
           // (256 * 3) AS bucket
  FROM (SELECT media_id, (x + 2*y + seed) % 64 AS i FROM pal1)
),
allb AS (
  SELECT media_id, bucket FROM img_b
  UNION ALL SELECT media_id, bucket FROM wav_b
  UNION ALL SELECT media_id, bucket FROM jpgg_b
  UNION ALL SELECT media_id, bucket FROM jpgc_b
  UNION ALL SELECT media_id, bucket FROM pal_b
),
counts AS (
  SELECT media_id, bucket, COUNT(*) AS cnt FROM allb GROUP BY 1, 2
),
totals AS (SELECT media_id, SUM(cnt) AS tot FROM counts GROUP BY 1),
grid AS (
  SELECT media_id, unnest(range(0, 8)) AS bucket FROM m
)
SELECT g.media_id, m.width, m.height, m.channels AS n_channels,
       g.bucket::INT AS bucket,
       COALESCE(c.cnt, 0)::DOUBLE / t.tot::DOUBLE AS share
FROM grid g
JOIN m ON m.media_id = g.media_id
JOIN totals t ON t.media_id = g.media_id
LEFT JOIN counts c ON c.media_id = g.media_id AND c.bucket = g.bucket
""",
    # mirrors decode_media(fake=True): features = normalized histogram of
    # (byte % 8) over the utf-8 bytes; the corpus is ASCII so byte values
    # equal ascii codes (verified), making the Arrow stub SQL-expressible
    "multimodal_pipeline": f"""
WITH c AS MATERIALIZED (
  SELECT doc_id,
         list_transform(range(1, len(text)+1),
                        i -> ascii(substr(text, i::INT, 1))) AS codes
  FROM documents WHERE doc_id < 100
),
h AS MATERIALIZED (
  SELECT doc_id,
         list_transform(range(0, 8),
                        k -> len(list_filter(codes, b -> (b % 8) = k))::DOUBLE)
           AS hist,
         CASE WHEN len(codes) > 0 THEN len(codes)::DOUBLE ELSE 1.0 END AS total
  FROM c
),
f AS MATERIALIZED (
  SELECT doc_id, list_transform(hist, v -> v / total) AS features FROM h
),
p AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         {O.sql_cosine('a.features', 'b.features')} AS cosine
  FROM f a, f b
  WHERE a.doc_id < b.doc_id
)
SELECT a_id, b_id, cosine FROM p WHERE cosine >= 0.999
""",
    "search_tokens": f"""
SELECT doc_id,
       array_to_string(list_sort({O.sql_tokens('text')}), ' ') AS search_tokens,
       len({O.sql_tokens('text')})::INT AS n_terms
FROM documents
""",
    # multilang analyzer: the per-language CASE computed over a lang CTE
    # so sql_lang_id evaluates once per row; the WHEN list is GENERATED
    # from STEMMED_LANGS exactly like the Spark dispatch
    # (functions/text.multilang_tokens_expr iterates the same constant),
    # so adding a rule set updates both engines together; rule-set-less
    # languages take the unstemmed branch
    "fts_multilang_stemmed": f"""
WITH l AS MATERIALIZED (
  SELECT d.doc_id, d.text, {O.sql_lang_id('d.text')} AS detected_lang
  FROM documents d
),
t AS (
  SELECT doc_id, detected_lang,
         CASE
           {' '.join(f"WHEN detected_lang = '{lng}' THEN {O.sql_unicode_tokens('text', True, lng)}" for lng in T.STEMMED_LANGS)}
           ELSE {O.sql_unicode_tokens('text', False)}
         END AS toks
  FROM l
)
SELECT doc_id, detected_lang,
       array_to_string(list_sort(toks), ' ') AS search_tokens,
       len(toks)::INT AS n_terms
FROM t
""",
    # r13 Unicode gates: fixture corpus + the doped non-Latin rows,
    # same CASE generation as fts_multilang_stemmed but over the
    # unicode analyzer (sql_unicode_tokens)
    "unicode_multiscript_tokens": f"""
WITH u AS MATERIALIZED (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id, text FROM {_unicode_dope_sql()}
),
l AS MATERIALIZED (
  SELECT doc_id, text, {O.sql_lang_id('text')} AS detected_lang FROM u
),
t AS (
  SELECT doc_id, detected_lang,
         CASE
           {' '.join(f"WHEN detected_lang = '{lng}' THEN {O.sql_unicode_tokens('text', True, lng)}" for lng in T.STEMMED_LANGS)}
           ELSE {O.sql_unicode_tokens('text', False)}
         END AS toks
  FROM l
)
SELECT doc_id, detected_lang,
       array_to_string(list_sort(toks), ' ') AS search_tokens,
       len(toks)::INT AS n_terms
FROM t
""",
    # multilang postings-index gate: the oracle is the FULL-SCAN
    # ranking over the same multilang token table (probe lossless);
    # terms are the import-time _analyze results embedded as literals
    "fts_multilang_indexed": _oracle_fts_multilang_indexed(),
    "dedup_minhash_unicode": _oracle_dedup_minhash_unicode(),
    # words hoisted into ONE MATERIALIZED CTE (review r13): the five
    # output expressions otherwise each re-ran the \p{{L}}\p{{N}} split
    # per row
    "unicode_word_stats": f"""
WITH u AS MATERIALIZED (
  SELECT doc_id, text FROM documents WHERE doc_id < 200
  UNION ALL
  SELECT doc_id, text FROM {_unicode_dope_sql()}
),
w AS MATERIALIZED (
  SELECT doc_id, text, {O.sql_unicode_words('text')} AS uw FROM u
)
SELECT doc_id,
       len(uw)::INT AS n_words,
       len(list_filter(uw,
           x -> regexp_matches(x, '\\p{{L}}')))::INT AS n_alpha_words,
       {O.sql_gopher_flags('text', unicode=True, words_expr='uw')['ok_word_count']} AS ok_word_count,
       {O.sql_gopher_flags('text', unicode=True, words_expr='uw')['ok_mean_word_len']} AS ok_mean_word_len,
       {O.sql_gopher_flags('text', unicode=True, words_expr='uw')['ok_alpha_words']} AS ok_alpha_words
FROM w
""",
    "inverted_index": f"""
WITH tok AS MATERIALIZED (
  SELECT doc_id, {O.sql_tokens('text')} AS toks FROM documents
),
p AS (SELECT doc_id, unnest(toks) AS term FROM tok)
SELECT term, count(*) AS doc_freq,
       string_agg(doc_id::VARCHAR, ',' ORDER BY doc_id) AS postings
FROM p GROUP BY term
""",
    "orders_rollup": """
SELECT r.r_name, o.o_orderpriority,
       sum(l.l_extendedprice::DECIMAL(18,4)
           * (1::DECIMAL(18,4) - l.l_discount::DECIMAL(18,4)))::DOUBLE
         AS revenue,
       count(*) AS n_lines
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name, o.o_orderpriority
""",
    # the oracle states packing as the textbook single global window;
    # the Spark side computes the same prefix sum distributed
    "sequence_pack": f"""
WITH base AS (
  SELECT doc_id, {O.sql_token_count('text')} AS n_tokens,
         {O.sql_sample_priority('doc_id', '|pack')} AS prio
  FROM documents
), c AS (
  SELECT doc_id, n_tokens,
    COALESCE(SUM(n_tokens) OVER (ORDER BY prio, doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
      AS start_tok
  FROM base WHERE n_tokens > 0
)
SELECT doc_id, n_tokens, start_tok,
  (start_tok // {PACK_BLOCK})::BIGINT AS first_block,
  (start_tok % {PACK_BLOCK})::BIGINT AS offset_in_block,
  ((start_tok + n_tokens - 1) // {PACK_BLOCK})::BIGINT AS last_block,
  ((start_tok + n_tokens - 1) // {PACK_BLOCK}
    - start_tok // {PACK_BLOCK} + 1)::BIGINT AS n_blocks
FROM c
""",
    "pack_manifest": f"""
WITH base AS (
  SELECT doc_id, {O.sql_token_count('text')} AS n_tokens,
         {O.sql_sample_priority('doc_id', '|pack')} AS prio
  FROM documents
), c AS (
  SELECT doc_id, n_tokens,
    COALESCE(SUM(n_tokens) OVER (ORDER BY prio, doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
      AS start_tok
  FROM base WHERE n_tokens > 0
), e AS (
  SELECT doc_id, n_tokens, start_tok,
    unnest(generate_series(start_tok // {PACK_BLOCK},
                           (start_tok + n_tokens - 1) // {PACK_BLOCK}))
      AS block_id
  FROM c
), s AS (
  SELECT block_id, doc_id,
    greatest(start_tok - block_id * {PACK_BLOCK}, 0) AS offset_in_block,
    greatest(block_id * {PACK_BLOCK} - start_tok, 0) AS doc_from,
    least(block_id * {PACK_BLOCK} + {PACK_BLOCK} - start_tok, n_tokens)
      AS doc_to
  FROM e
)
SELECT block_id, count(*) AS n_docs,
  sum(doc_to - doc_from)::BIGINT AS block_tokens,
  md5(string_agg(doc_id::VARCHAR || ':' || doc_from::VARCHAR || '-'
        || doc_to::VARCHAR, ',' ORDER BY offset_in_block))
    AS manifest_hash
FROM s GROUP BY block_id
""",
    "line_dedup": f"""
WITH l AS (
  SELECT doc_id, ({_LINE_DEDUP_LINED}) AS lined FROM documents
), s AS (
  SELECT doc_id, string_split(lined, chr(10)) AS lines FROM l
), k AS (
  SELECT doc_id, lines,
    list_filter(lines, (x, i) -> list_position(lines, x) = i) AS kept
  FROM s
)
SELECT doc_id,
  len(lines)::BIGINT AS n_lines,
  len(kept)::BIGINT AS n_kept_lines,
  len(kept) < len(lines) AS had_dup_lines,
  md5(array_to_string(kept, chr(10))) AS clean_hash
FROM k
""",
    "corpus_to_shards": _oracle_corpus_to_shards(),
    "tokenizer_fertility": _oracle_tokenizer_fertility(),
    "bpe_token_count": _oracle_bpe_token_count(),
    "sample_weighted": f"""
WITH b AS (
  SELECT doc_id, ({O.sql_token_count('text')})::DOUBLE AS weight,
    (({O.sql_sample_priority('doc_id', '|wsample')} + 1)::DOUBLE
      / 4294967297.0) AS u
  FROM documents
), kx AS (
  SELECT doc_id, weight, (-ln(u)) / weight AS sample_key
  FROM b WHERE weight > 0
)
SELECT doc_id, weight, sample_key,
  row_number() OVER (ORDER BY sample_key, doc_id)::INT AS sample_rank
FROM kx ORDER BY sample_key, doc_id LIMIT 25
""",
}

# IVF-probed hard negatives (VERDICT r6 #5): the oracle INDEPENDENTLY
# recomputes the probe semantics in SQL — first-8 centroids, argmax cell
# assignment, per-anchor top-6 probed cells, ranking restricted to them —
# because, unlike same-cluster top-k search, the nearest DIFFERENT-label
# negative can legitimately live in an unprobed cell (measured: 1 of 25
# rows differs from the broadcast ranking at nprobe=7 on sf0.01), so
# sharing the broadcast oracle would force nprobe=8 (no pruning at all).
# The recall-vs-broadcast floor is pinned in tests/test_ann.py instead.
# Engine-lifecycle hybrid: DuckDB recomputes the hash-BoW embeddings of
# every document AND the query from the raw fixture (providers/local.py
# three-way determinism contract), scores the semantic branch with the
# engine's normalize-at-write dot product, the FTS branch with the token
# overlap, and fuses with RRF — verifying create_job -> scan_job ->
# hybrid_search end-to-end, not a re-run of any engine code.
def _hybrid_oracle_sql(base: str, prefix_ctes: str = "") -> str:
    """Shared engine-lifecycle hybrid oracle (job_hybrid_e2e and the
    curation seam gate differ ONLY in the corpus the search runs over).
    Staged MATERIALIZED CTEs for the embeddings (same reason as
    _oracle_embed_documents: the single-expression sql_embed form
    re-evaluates the bucket list once per dimension — measured 379 s
    vs ~8 s at sf0.01 for this query). ``base`` must expose
    (doc_id, text, lang); ``prefix_ctes`` (trailing comma + newline
    included) prepends the CTEs that derive it — ONE oracle body, so an
    RRF / embedding / tie-break fix cannot diverge between the gates
    (review r12)."""
    dim = EMBED_DIM
    qlit = "'" + QUERY_TEXT + "'"
    toks = O.sql_tokens("d.text")
    match = O.sql_fts_match("search_tokens", QUERY_TERMS)
    score = O.sql_fts_score("search_tokens", QUERY_TERMS)
    return f"""
WITH {prefix_ctes}b AS MATERIALIZED (
  SELECT d.doc_id,
         list_transform({O.sql_features('d.text')},
                        f -> {O.sql_hash_bucket('f', dim)}) AS buckets
  FROM {base} d
),
c AS MATERIALIZED (
  SELECT doc_id,
         list_transform(range(0, {dim}),
                        i -> len(list_filter(buckets, bk -> bk = i))::DOUBLE)
           AS counts
  FROM b
),
emb AS MATERIALIZED (
  SELECT doc_id,
         CASE WHEN nrm > 0 THEN list_transform(counts, x -> x / nrm)
              ELSE counts END AS ev
  FROM (
    SELECT doc_id, counts,
           sqrt(list_reduce(list_prepend(0.0::DOUBLE,
                list_transform(counts, x -> x*x)), (a, x) -> a + x)) AS nrm
    FROM c
  )
),
qb AS MATERIALIZED (
  SELECT list_transform({O.sql_features(qlit)},
                        f -> {O.sql_hash_bucket('f', dim)}) AS buckets
),
qc AS MATERIALIZED (
  SELECT list_transform(range(0, {dim}),
                        i -> len(list_filter(buckets, bk -> bk = i))::DOUBLE)
           AS counts
  FROM qb
),
q AS MATERIALIZED (
  SELECT CASE WHEN nrm > 0 THEN list_transform(counts, x -> x / nrm)
              ELSE counts END AS qv
  FROM (
    SELECT counts,
           sqrt(list_reduce(list_prepend(0.0::DOUBLE,
                list_transform(counts, x -> x*x)), (a, x) -> a + x)) AS nrm
    FROM qc
  )
),
sem AS (
  SELECT doc_id, similarity_score,
         ROW_NUMBER() OVER (ORDER BY similarity_score DESC, doc_id ASC)
           AS semantic_rank
  FROM (
    SELECT e.doc_id, {O.sql_dot('e.ev', 'q.qv')} AS similarity_score
    FROM emb e CROSS JOIN q
  )
  ORDER BY similarity_score DESC, doc_id ASC
  LIMIT 50
),
ftsb AS (
  SELECT doc_id, fts_score,
         ROW_NUMBER() OVER (ORDER BY fts_score DESC, doc_id ASC) AS fts_rank
  FROM (
    SELECT doc_id, {score} AS fts_score
    FROM (SELECT d.doc_id, {toks} AS search_tokens FROM {base} d)
    WHERE {match}
  )
  ORDER BY fts_score DESC, doc_id ASC
  LIMIT 50
),
fused AS (
  SELECT COALESCE(sem.doc_id, ftsb.doc_id) AS doc_id,
         sem.similarity_score, sem.semantic_rank, ftsb.fts_rank,
         COALESCE(1.0 / (60 + sem.semantic_rank), 0.0)
         + COALESCE(1.0 / (60 + ftsb.fts_rank), 0.0) AS rrf_score
  FROM sem FULL OUTER JOIN ftsb ON sem.doc_id = ftsb.doc_id
)
SELECT d.doc_id, d.lang, f.rrf_score,
       f.semantic_rank::INT AS semantic_rank, f.fts_rank::INT AS fts_rank,
       f.similarity_score
FROM {base} d INNER JOIN fused f ON d.doc_id = f.doc_id
ORDER BY f.rrf_score DESC, d.doc_id ASC
LIMIT 10
"""


ORACLE["job_hybrid_e2e"] = _hybrid_oracle_sql("documents")


# Curation -> job -> search seam: the survivor set (quality/token gate,
# then smaller-key-survives banded MinHash dedup at the job's
# threshold) is recomputed from the raw fixture, and the SHARED hybrid
# oracle body runs over the survivors alone — engine._curate_filter
# order (curate before dedup, engine.py scan path) is replayed exactly,
# so a doc that should have been filtered appearing in the top-10
# breaks the gate. The minhash CTEs carry an m- prefix to stay clear of
# the shared body's CTE names.
def _seam_survivor_ctes() -> str:
    return f"""qual AS MATERIALIZED (
  SELECT d.doc_id, d.text, d.lang FROM documents d
  WHERE ({O.sql_quality_score('d.text')}) >= 0.5
    AND ({O.sql_token_count('d.text')}) >= 8
),
mc AS MATERIALIZED (
  SELECT doc_id,
         list_transform({O.sql_word_shingles('text', 3)},
                        s -> {O.sql_poly_hash('s')}) AS codes
  FROM qual
),
msig AS MATERIALIZED (
  SELECT doc_id, {_MINHASH_SIG} AS signature FROM mc WHERE len(codes) > 0
),
mbands AS (
  SELECT s.doc_id, tb.band,
         array_to_string(
           list_transform(s.signature[(tb.band*4 + 1):(tb.band*4 + 4)],
                          x -> x::VARCHAR), ',') AS band_key
  FROM msig s, generate_series(0, 3) AS tb(band)
),
mcand AS (
  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
  FROM mbands a
  JOIN mbands b ON a.band = b.band AND a.band_key = b.band_key
              AND a.doc_id < b.doc_id
),
mdups AS (
  SELECT DISTINCT mcand.b_id AS doc_id
  FROM mcand
  JOIN msig sa ON mcand.a_id = sa.doc_id
  JOIN msig sb ON mcand.b_id = sb.doc_id
  WHERE len(list_filter(range(1, 17),
        i -> sa.signature[i::INT] = sb.signature[i::INT]))::DOUBLE / 16.0
        >= 0.7
),
surv AS MATERIALIZED (
  SELECT q.doc_id, q.text, q.lang FROM qual q
  WHERE NOT EXISTS (SELECT 1 FROM mdups WHERE mdups.doc_id = q.doc_id)
),
"""


ORACLE["curate_job_search_e2e"] = _hybrid_oracle_sql(
    "surv", prefix_ctes=_seam_survivor_ctes()
)

_sd_bucket = (
    "list_reduce(list_prepend(0::BIGINT, list_transform(range(0, 8), j -> CASE WHEN embedding[(j+1)::INT] > 0 THEN power(2, j)::BIGINT ELSE 0::BIGINT END)), (a, x) -> a + x)"
)
# semantic decontamination: same sign-bit bucket prefilter as
# dedup_embedding_cosine, cross-set, exact rescore, per-train argmax
# (ties -> highest bench id, matching Spark's max(struct(cos, bid)))
ORACLE["semantic_decontaminate"] = f"""
WITH bk AS MATERIALIZED (
  SELECT vec_id, embedding, {_sd_bucket} AS bkt FROM embeddings
),
cand AS (
  SELECT t.vec_id AS tid, b.vec_id AS bid,
         {O.sql_cosine('t.embedding', 'b.embedding')} AS c
  FROM bk t JOIN bk b
    ON t.vec_id >= 50 AND b.vec_id < 50
   AND bit_count(xor(t.bkt, b.bkt)) <= 1
),
best AS (
  SELECT tid, c, bid FROM (
    SELECT tid, bid, c,
           ROW_NUMBER() OVER (
             PARTITION BY tid ORDER BY c DESC, bid DESC
           ) AS rn
    FROM cand
  ) WHERE rn = 1
)
SELECT e.vec_id, COALESCE(best.c >= 0.3, FALSE) AS is_contaminated,
       best.c AS max_bench_cosine, best.bid AS bench_match
FROM (SELECT vec_id FROM embeddings WHERE vec_id >= 50) e
LEFT JOIN best ON best.tid = e.vec_id
"""

ORACLE["mp3_metadata"] = """
WITH d AS (
  SELECT doc_id AS d,
         CASE WHEN doc_id % 5 = 4 THEN 'MPEG2' ELSE 'MPEG1' END AS version,
         doc_id % 3 AS sr_idx,
         doc_id % 4 AS cm,
         (doc_id % 7 = 0) AS has_crc,
         (doc_id % 3 = 0) AS has_id3,
         4 + doc_id % 6 AS n
  FROM documents WHERE doc_id < 60
),
p AS MATERIALIZED (
  SELECT d.*,
         CASE version WHEN 'MPEG1'
           THEN list_extract([44100,48000,32000], sr_idx + 1)
           ELSE list_extract([22050,24000,16000], sr_idx + 1) END AS sr,
         CASE version WHEN 'MPEG1' THEN 1152 ELSE 576 END AS spf,
         CASE version WHEN 'MPEG1' THEN 144 ELSE 72 END AS coef
  FROM d
),
f AS (
  SELECT p.d, p.coef, p.sr,
         CASE p.version WHEN 'MPEG1'
           THEN list_extract([32,40,48,56,64,80,96,112,128,160,192,224,256,320],
                             1 + ((p.d + 3*i.i*(p.d % 2)) % 14))
           ELSE list_extract([8,16,24,32,40,48,56,64,80,96,112,128,144,160],
                             1 + ((p.d + 3*i.i*(p.d % 2)) % 14)) END AS kbps,
         (p.d + i.i) % 2 AS pad
  FROM p, (SELECT unnest(range(0, 10)) AS i) i
  WHERE i.i < p.n
),
agg AS (
  SELECT d, count(*) AS nf, sum(coef*kbps*1000 // sr + pad) AS body,
         sum(kbps) AS kbsum, count(DISTINCT kbps) AS nk
  FROM f GROUP BY d
)
SELECT p.d AS doc_id,
       p.version,
       p.sr::INT AS sample_rate,
       list_extract(['stereo','joint_stereo','dual_channel','mono'],
                    p.cm + 1) AS channel_mode,
       p.n::INT AS n_frames,
       (p.n * p.spf)::DOUBLE / p.sr AS duration_seconds,
       a.kbsum::DOUBLE / p.n AS bitrate_kbps_mean,
       (a.nk > 1) AS is_vbr,
       p.has_id3,
       p.has_crc,
       (CASE WHEN p.has_id3 THEN 30 + p.d ELSE 0 END)::BIGINT
         AS first_frame_offset,
       (CASE WHEN p.has_id3 THEN 30 + p.d ELSE 0 END + a.body)::BIGINT
         AS stream_bytes
FROM p JOIN agg a ON a.d = p.d
"""

ORACLE["hard_negatives_indexed"] = f"""
WITH e AS MATERIALIZED (SELECT vec_id, embedding, label FROM embeddings),
c AS MATERIALIZED (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS centroid_id,
         embedding AS cv
  FROM (SELECT * FROM e ORDER BY vec_id LIMIT 8)
),
cscored AS (
  SELECT e.vec_id, c.centroid_id,
         {O.sql_cosine('e.embedding', 'c.cv')} AS cs
  FROM e CROSS JOIN c
),
assign AS MATERIALIZED (
  SELECT vec_id, centroid_id AS cell FROM (
    SELECT vec_id, centroid_id,
           ROW_NUMBER() OVER (
             PARTITION BY vec_id ORDER BY cs DESC, centroid_id
           ) AS rn
    FROM cscored
  ) WHERE rn = 1
),
a AS MATERIALIZED (
  SELECT vec_id AS anchor_id, embedding AS av, label AS al
  FROM e WHERE vec_id < 5
),
aprobe AS MATERIALIZED (
  SELECT anchor_id, cell FROM (
    SELECT a.anchor_id, c.centroid_id AS cell,
           ROW_NUMBER() OVER (
             PARTITION BY a.anchor_id
             ORDER BY {O.sql_cosine('a.av', 'c.cv')} DESC, c.centroid_id
           ) AS rn
    FROM a CROSS JOIN c
  ) WHERE rn <= 6
),
scored AS (
  SELECT a.anchor_id, e.vec_id,
         {O.sql_cosine('a.av', 'e.embedding')} AS sim
  FROM a
  JOIN aprobe p ON p.anchor_id = a.anchor_id
  JOIN assign s ON s.cell = p.cell
  JOIN e ON e.vec_id = s.vec_id
  WHERE e.vec_id <> a.anchor_id AND e.label IS DISTINCT FROM a.al
),
ranked AS (
  SELECT anchor_id, vec_id, sim,
         ROW_NUMBER() OVER (
           PARTITION BY anchor_id ORDER BY sim DESC, vec_id
         ) AS rank
  FROM scored
)
SELECT anchor_id, vec_id, sim, rank::INT AS rank
FROM ranked WHERE rank <= 5
"""


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE)
