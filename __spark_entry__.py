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
QUERY_TERMS = T.analyze_query(QUERY_TEXT)  # == [spark, window, merge, batch, data]
FETCH_IDS = [3, 14, 159, 265, 358]
EMBED_DIM = 64


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


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
    """S8 (hermetic): deterministic hashed-BoW embedding, fully JVM-side via
    the explode -> hash -> partial-agg groupBy scale path."""
    from pg_vectorize_spark.operators.embed import embed_bulk_exploded

    docs = _t(spark, sf_dir, "documents")
    emb = embed_bulk_exploded(docs, "text", "doc_id", EMBED_DIM)
    checksum = F.aggregate(
        F.zip_with(
            F.col("embedding"),
            F.sequence(F.lit(1), F.lit(EMBED_DIM)),
            lambda x, i: x * i.cast("double"),
        ),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    return emb.select(
        "doc_id",
        F.col("embeddings").alias("embedding"),
    ).withColumn("checksum", checksum)


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


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: group identical texts, keep min doc_id."""
    docs = _t(spark, sf_dir, "documents")
    return docs.groupBy("text").agg(
        F.min("doc_id").alias("keep_id"),
        F.count(F.lit(1)).alias("n_copies"),
    ).select("keep_id", "n_copies")


def q_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine kNN join: top-3 neighbors for each of the first 10 vectors."""
    emb = _t(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("probe_vec")
    )
    pairs = F.broadcast(probes).crossJoin(emb).filter(
        F.col("probe_id") != F.col("vec_id")
    )
    scored = pairs.select(
        "probe_id",
        "vec_id",
        V.cosine_similarity(F.col("probe_vec"), F.col("embedding")).alias("sim"),
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("probe_id", "vec_id", "sim", "rank")
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "semantic_search_topk": q_semantic_search_topk,
    "semantic_search_filtered": q_semantic_search_filtered,
    "fts_search_topk": q_fts_search_topk,
    "hybrid_rrf_search": q_hybrid_rrf_search,
    "view_join": q_view_join,
    "change_detection": q_change_detection,
    "record_fetch_by_ids": q_record_fetch_by_ids,
    "token_count": q_token_count,
    "embed_documents": q_embed_documents,
    "doc_fingerprint": q_doc_fingerprint,
    "quality_score": q_quality_score,
    "lang_id": q_lang_id,
    "dedup_exact": q_dedup_exact,
    "knn_join": q_knn_join,
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
SELECT d.doc_id, d.lang, d.n_chars, f.rrf_score, f.semantic_rank, f.fts_rank,
       f.similarity_score
FROM documents d INNER JOIN fused f ON d.doc_id = f.doc_id
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
e AS (
  SELECT doc_id,
         CASE WHEN nrm > 0 THEN list_transform(counts, x -> x / nrm)
              ELSE counts END AS embedding
  FROM n
)
SELECT doc_id, embedding, {checksum} AS checksum FROM e
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


ORACLE: dict[str, str] = {
    "semantic_search_topk": _oracle_semantic_topk(),
    "semantic_search_filtered": _oracle_semantic_filtered(),
    "fts_search_topk": _oracle_fts_topk(),
    "hybrid_rrf_search": _oracle_hybrid(),
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
    "dedup_exact": """
SELECT min(doc_id) AS keep_id, count(*) AS n_copies
FROM documents GROUP BY text
""",
    "knn_join": _oracle_knn_join(),
}


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE)
