"""Bulk embedding operators — the heavy stage of the pipeline (S8).

The reference embeds via HTTP provider calls batched per queue message
(worker/src/executor.rs:102-160). Spark-side we provide three strategies,
all producing IDENTICAL vectors (the deterministic hashed-BoW spec in
providers/local.py):

1. ``embed_bulk_exploded`` — pure JVM: explode features -> polynomial-hash
   bucket -> two-level groupBy with map-side partial aggregation -> dense
   vector. No Python workers at all; shuffles are on (pkey, bucket) so they
   scale horizontally and AQE can coalesce. This is the 100-TB path.
2. ``embed_bulk_pandas`` — Arrow-batched pandas UDF calling an
   EmbeddingProvider (numpy hashing locally, or HTTP with request-cap
   batching). This is the path for real external models.
3. ``functions/vector.embed_expr`` — single-expression form for small or
   inline use (slowest per-row; interpreted higher-order functions).

All three are cross-checked for equality in tests.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pg_vectorize_spark.functions.vector import (
    features_expr,
    hash_bucket_expr,
)
from pg_vectorize_spark.providers.base import EmbeddingProvider
from pg_vectorize_spark.providers.local import LocalHashEmbedder


def embed_bulk_exploded(
    df: DataFrame,
    text_col: str,
    pkey: str,
    dim: int,
    normalize: bool = True,
    out_col: str = "embeddings",
) -> DataFrame:
    """JVM-only bulk embedding via explode + partial-aggregating groupBy.

    Plan shape: Scan -> Generate(explode) -> partial HashAggregate ->
    Exchange(pkey, bucket) -> HashAggregate -> Exchange(pkey) ->
    ObjectHashAggregate(map) -> Project(dense vector). Rows with no features
    (empty/NULL text) still produce a zero vector via the left join.
    """
    feats = df.select(
        F.col(pkey), F.explode(features_expr(F.col(text_col))).alias("_feat")
    )
    bucket_counts = (
        feats.select(
            F.col(pkey), hash_bucket_expr(F.col("_feat"), dim).alias("_bucket")
        )
        .groupBy(pkey, "_bucket")
        .agg(F.count(F.lit(1)).cast("double").alias("_cnt"))
    )
    # Σcnt² rides the same aggregation as the sparse map: Aggregate is an
    # optimizer barrier, so `_n2` is a REAL column — referencing it inside
    # the dense-building lambda costs a column read, not a re-evaluated
    # fold per element (expressions referenced inside higher-order lambdas
    # are re-evaluated per element after projection collapse). The sum of
    # squares of integer-valued counts is exact in any aggregation order,
    # so bit-parity with the oracle's left-to-right dense fold holds.
    sparse = bucket_counts.groupBy(pkey).agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("_bucket"), F.col("_cnt")))
        ).alias("_m"),
        F.sum(F.col("_cnt") * F.col("_cnt")).alias("_n2"),
    )
    joined = df.select(pkey).join(sparse, pkey, "left")
    zeros = F.array_repeat(F.lit(0.0), dim)
    if not normalize:
        dense = F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: F.coalesce(
                F.element_at(F.col("_m"), i.cast("long")), F.lit(0.0)
            ),
        )
        return joined.select(
            F.col(pkey), F.coalesce(dense, zeros).alias(out_col)
        )
    norm = F.sqrt(F.col("_n2"))
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.coalesce(
            F.element_at(F.col("_m"), i.cast("long")), F.lit(0.0)
        )
        / norm,
    )
    return joined.select(
        F.col(pkey),
        F.when(norm > 0, vec).otherwise(zeros).alias(out_col),
    )


def embed_bulk_pandas(
    df: DataFrame,
    text_col: str,
    pkey: str,
    provider: EmbeddingProvider | None = None,
    dim: int | None = None,
    normalize: bool = True,
    out_col: str = "embeddings",
    request_cap: int = 2_048,
    passthrough_cols: Sequence[str] = (),
    dedup_content: bool = False,
) -> DataFrame:
    """Arrow-batched bulk embedding through an EmbeddingProvider.

    One provider instance per Python worker; inputs are packed into
    <= ``request_cap`` chunks per provider call (the reference's 2048-input
    HTTP cap, openai.rs:88-100). With the default LocalHashEmbedder this is
    the fast local path (~100x quicker than interpreted array expressions).

    ``passthrough_cols`` ride through the Arrow batch unchanged (keeping
    e.g. a content fingerprint avoids re-evaluating the upstream plan with
    a join-back).

    ``dedup_content=True`` embeds each DISTINCT text once and joins the
    vector back to every key carrying it — crawl corpora repeat
    boilerplate heavily, and a metered HTTP provider bills per token
    either way. Exactness: the join key is the full text (no
    hash-collision exposure), and deterministic providers make the
    output bit-identical to the direct path. Trade-off: the pure
    zero-shuffle map becomes distinct + join-back (two exchanges) — off
    by default; worth it exactly when provider cost dominates shuffle
    cost, i.e. any real HTTP provider.
    """
    if provider is None:
        provider = LocalHashEmbedder(dim=dim or 64, normalize=normalize)
    vec_dim = provider.model_dim()

    # derive key/passthrough types from the input — jobs keyed by
    # string/uuid pkeys must round-trip through Arrow unchanged
    def _t(c: str) -> str:
        return df.schema[c].dataType.simpleString()

    schema_parts = [f"{pkey} {_t(pkey)}", f"{out_col} array<double>"]
    schema_parts += [f"{c} {_t(c)}" for c in passthrough_cols]
    schema = ", ".join(schema_parts)

    def embed_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts: Sequence[str] = pdf[text_col].fillna("").tolist()
            vecs: list[list[float]] = []
            for i in range(0, len(texts), request_cap):
                vecs.extend(provider.generate_embedding(texts[i : i + request_cap]))
            out = {pkey: pdf[pkey].values, out_col: vecs}
            for c in passthrough_cols:
                out[c] = pdf[c].values
            yield pd.DataFrame(out)

    _ = vec_dim  # dimension check is the provider's contract
    from pg_vectorize_spark.operators.skew import ensure_min_partitions

    if dedup_content:
        from pyspark.sql import functions as F

        # null and "" embed identically (fillna below) — normalize the
        # join key so they land on one representative
        keyed = df.select(
            *[pkey, *passthrough_cols],
            F.coalesce(F.col(text_col), F.lit("")).alias(text_col),
        )
        uniq = ensure_min_partitions(
            keyed.select(text_col).distinct()
        )

        def embed_uniq(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                texts = pdf[text_col].tolist()
                vecs: list[list[float]] = []
                for i in range(0, len(texts), request_cap):
                    vecs.extend(
                        provider.generate_embedding(
                            texts[i : i + request_cap]
                        )
                    )
                yield pd.DataFrame(
                    {text_col: pdf[text_col].values, out_col: vecs}
                )

        uniq_emb = uniq.mapInPandas(
            embed_uniq, schema=f"{text_col} string, {out_col} array<double>"
        )
        return keyed.join(uniq_emb, text_col).select(
            pkey, out_col, *passthrough_cols
        )

    cols = [pkey, text_col, *passthrough_cols]
    # pure map: fan narrow inputs out so one small file / one row group
    # doesn't serialize the whole embed onto a single task
    narrow = ensure_min_partitions(df.select(*cols))
    return narrow.mapInPandas(embed_partition, schema=schema)
