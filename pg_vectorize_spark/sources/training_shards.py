"""Training-shard sink: the loader-facing end of the packing pipeline.

``sequence_pack`` decides where every document's tokens land in the
concatenated stream; ``pack_blocks`` explodes that into per-(block, doc)
slices. This module finishes the job: ``materialize_blocks`` assembles
each block's actual token array from a token store, and
``write_training_shards`` lays the blocks out on disk as size-targeted
shards with a validating manifest — the artifact a training loader mounts
directly (one shard per reader task, blocks in order, checksums to catch
partial writes).

Scale shape: block assembly is ONE shuffle on the uniform block_id key
(blocks are fixed-size, so the key is skew-free by construction); the
shard write clusters on shard id so each task writes whole shards
(``blocks_per_shard`` controls shard size — pick so a shard ~ the
loader's read unit, e.g. 2048 blocks x 2048 tokens x 4 B ~ 16 MiB).
Checksums are order-free modular sums of per-block polynomial hashes, so
the manifest can be recomputed under ANY partitioning and compared
exactly.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pg_vectorize_spark.providers.local import HASH_MOD, HASH_MULT, HASH_SEED

SHARD_COL = "shard"
MANIFEST_DIR = "_MANIFEST"


def block_token_hash(tokens) -> "F.Column":
    """Polynomial-roll hash over a BIGINT token array (same (seed, mult,
    mod) family as the repo's string hash, applied to token ids)."""
    return F.aggregate(
        tokens,
        F.lit(HASH_SEED).cast("long"),
        lambda acc, t: (acc * F.lit(HASH_MULT) + t) % F.lit(HASH_MOD),
    )


def materialize_blocks(
    blocks: DataFrame,
    tokens_df: DataFrame,
    key_col: str,
    tokens_col: str,
) -> DataFrame:
    """Assemble each packed block's token array.

    ``blocks`` is ``pack_blocks`` output (block_id, <key>, offset_in_block,
    doc_from, doc_to); ``tokens_df`` maps <key> -> its full token array
    (BIGINT ids — ``bpe_encode_ids`` produces this shape). Each doc
    contributes ``tokens[doc_from:doc_to)`` at ``offset_in_block``;
    pieces concatenate in offset order. Every block except the stream's
    last holds exactly ``block_size`` tokens by ``sequence_pack``'s
    construction (asserted in tests, not re-checked here).

    One equi-join on the doc key, one shuffle on block_id. The in-block
    ordered concat is an array_sort over (offset, piece) structs —
    offsets are unique within a block, so the sort is total — then a
    flatten; no window, no Python.
    """
    piece = F.slice(
        F.col(tokens_col),
        F.col("doc_from").cast("int") + F.lit(1),
        (F.col("doc_to") - F.col("doc_from")).cast("int"),
    )
    per = blocks.join(
        tokens_df.select(key_col, tokens_col), key_col
    ).select(
        "block_id",
        F.struct(
            F.col("offset_in_block").alias("off"), piece.alias("piece")
        ).alias("p"),
    )
    out = per.groupBy("block_id").agg(
        F.flatten(
            F.transform(
                F.array_sort(F.collect_list("p")), lambda s: s["piece"]
            )
        ).alias("tokens"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    return out.select(
        "block_id",
        "n_docs",
        F.size("tokens").cast("long").alias("n_tokens"),
        block_token_hash(F.col("tokens")).alias("block_hash"),
        "tokens",
    )


def write_training_shards(
    blocks_mat: DataFrame,
    path: str,
    blocks_per_shard: int = 2048,
) -> DataFrame:
    """Write materialized blocks as shard-partitioned parquet plus a
    manifest, and return the manifest DataFrame.

    Layout::

        <path>/shard=S/*.parquet   blocks S*bps .. (S+1)*bps - 1
        <path>/_MANIFEST/*.parquet one row per shard

    Shard assignment is ``block_id div blocks_per_shard`` — deterministic,
    contiguous, loader-friendly (shard S alone reconstructs stream
    positions [S*bps*block_size, ...) with no lookup). The manifest row
    carries n_blocks, n_tokens, min/max block id and an order-free
    checksum (modular sum of per-block hashes) so a loader can verify a
    shard without trusting the writer's success path.
    """
    if blocks_per_shard < 1:
        raise ValueError(
            f"blocks_per_shard must be >= 1, got {blocks_per_shard}"
        )
    # the block lineage (pack + materialize shuffles) feeds THREE
    # consumers here — shard count, the data write, the manifest agg;
    # materialize it once instead of re-running the dominant cost 3x
    tagged = blocks_mat.withColumn(
        SHARD_COL, F.expr(f"block_id div {blocks_per_shard}")
    ).localCheckpoint()
    n_shards = tagged.select(SHARD_COL).distinct().count()
    (
        tagged.repartition(max(n_shards, 1), F.col(SHARD_COL))
        .sortWithinPartitions("block_id")
        .write.mode("overwrite")
        .partitionBy(SHARD_COL)
        .parquet(path)
    )
    manifest = (
        tagged.groupBy(SHARD_COL)
        .agg(
            F.count(F.lit(1)).alias("n_blocks"),
            F.sum("n_tokens").alias("n_tokens"),
            F.min("block_id").alias("min_block"),
            F.max("block_id").alias("max_block"),
            (F.sum("block_hash") % F.lit(HASH_MOD)).alias("checksum"),
        )
        .orderBy(SHARD_COL)
    )
    manifest.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, MANIFEST_DIR)
    )
    return manifest


def read_training_shard(
    spark: SparkSession, path: str, shard: int
) -> DataFrame:
    """One shard's blocks in block order — the loader's read unit. The
    shard=... filter is partition pruning, not a data scan."""
    return (
        spark.read.option("basePath", path)
        .parquet(path)
        .filter(F.col(SHARD_COL) == shard)
        .orderBy("block_id")
    )


def validate_shards(spark: SparkSession, path: str) -> DataFrame:
    """Recompute every shard's manifest row from the data files and diff
    against the written manifest. Returns the mismatching shards (empty
    = clean). Partial/corrupt shard writes surface here before a
    training job consumes them."""
    data = spark.read.option("basePath", path).parquet(path)
    recomputed = data.groupBy(SHARD_COL).agg(
        F.count(F.lit(1)).alias("n_blocks"),
        F.sum("n_tokens").alias("n_tokens"),
        F.min("block_id").alias("min_block"),
        F.max("block_id").alias("max_block"),
        (F.sum(block_token_hash(F.col("tokens"))) % F.lit(HASH_MOD)).alias(
            "checksum"
        ),
    )
    manifest = spark.read.parquet(os.path.join(path, MANIFEST_DIR))
    joined = manifest.alias("m").join(
        recomputed.alias("r"), SHARD_COL, "full_outer"
    )
    mismatch = joined.filter(
        ~(
            F.col("m.n_blocks").eqNullSafe(F.col("r.n_blocks"))
            & F.col("m.n_tokens").eqNullSafe(F.col("r.n_tokens"))
            & F.col("m.min_block").eqNullSafe(F.col("r.min_block"))
            & F.col("m.max_block").eqNullSafe(F.col("r.max_block"))
            & F.col("m.checksum").eqNullSafe(F.col("r.checksum"))
        )
    )
    return mismatch.select(
        SHARD_COL,
        F.col("m.checksum").alias("manifest_checksum"),
        F.col("r.checksum").alias("recomputed_checksum"),
    )
