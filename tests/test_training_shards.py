"""Training-shard sink — the loader-facing end of the packing pipeline:
block materialization exactness (every block except the last is exactly
block_size tokens, tokens tile each doc gaplessly in stream order),
shard layout + manifest round-trip, corruption detection, and the full
text -> BPE ids -> pack -> blocks -> shards path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pg_vectorize_spark.operators.curate import pack_blocks, sequence_pack
from pg_vectorize_spark.sources.training_shards import (
    materialize_blocks,
    read_training_shard,
    validate_shards,
    write_training_shards,
)

BLOCK = 16


@pytest.fixture()
def tokens_df(spark):
    # doc i holds tokens [i*1000, i*1000 + n_i) with varied lengths, so
    # any misplaced slice is immediately visible in the values
    rows = [
        (i, list(range(i * 1000, i * 1000 + (i % 29) + 3))) for i in range(40)
    ]
    return spark.createDataFrame(rows, "doc_id long, token_ids array<bigint>")


@pytest.fixture()
def blocks_mat(tokens_df):
    counts = tokens_df.select(
        "doc_id", F.size("token_ids").cast("long").alias("n_tokens")
    )
    packed = sequence_pack(counts, "doc_id", "n_tokens", BLOCK)
    blocks = pack_blocks(packed, BLOCK)
    return materialize_blocks(blocks, tokens_df, "doc_id", "token_ids")


class TestMaterializeBlocks:
    def test_blocks_are_exactly_block_size(self, blocks_mat):
        rows = blocks_mat.orderBy("block_id").collect()
        assert len(rows) > 3
        for r in rows[:-1]:
            assert r["n_tokens"] == BLOCK
            assert len(r["tokens"]) == BLOCK
        assert 0 < rows[-1]["n_tokens"] <= BLOCK

    def test_stream_is_a_permutation_free_tiling(self, tokens_df, blocks_mat):
        # concatenating all blocks in order reproduces each doc's tokens
        # contiguously, once, in doc order within the stream
        stream = []
        for r in blocks_mat.orderBy("block_id").collect():
            stream.extend(r["tokens"])
        expected = {
            r["doc_id"]: list(r["token_ids"]) for r in tokens_df.collect()
        }
        # every doc's run appears exactly once
        for doc, toks in expected.items():
            first = stream.index(toks[0])
            assert stream[first : first + len(toks)] == toks
        assert len(stream) == sum(len(t) for t in expected.values())

    def test_partition_invariance(self, tokens_df):
        counts = tokens_df.select(
            "doc_id", F.size("token_ids").cast("long").alias("n_tokens")
        )
        packed = sequence_pack(counts, "doc_id", "n_tokens", BLOCK)
        blocks = pack_blocks(packed, BLOCK)
        a = materialize_blocks(
            blocks.repartition(1), tokens_df.repartition(1), "doc_id", "token_ids"
        )
        b = materialize_blocks(
            blocks.repartition(16), tokens_df.repartition(7), "doc_id", "token_ids"
        )
        ka = {(r["block_id"], tuple(r["tokens"])) for r in a.collect()}
        kb = {(r["block_id"], tuple(r["tokens"])) for r in b.collect()}
        assert ka == kb


class TestShardWriter:
    def test_roundtrip_and_manifest(self, spark, tmp_path, blocks_mat):
        path = str(tmp_path / "shards")
        manifest = write_training_shards(blocks_mat, path, blocks_per_shard=4)
        man = {r["shard"]: r for r in manifest.collect()}
        assert all(r["n_blocks"] <= 4 for r in man.values())
        # shard ids contiguous from 0, block ranges match the div rule
        for s, r in man.items():
            assert r["min_block"] >= s * 4 and r["max_block"] < (s + 1) * 4
        # read one shard back: in order, bit-equal
        s0 = read_training_shard(spark, path, 0).collect()
        orig = (
            blocks_mat.filter(F.col("block_id") < 4).orderBy("block_id").collect()
        )
        assert [r["block_id"] for r in s0] == [r["block_id"] for r in orig]
        assert [list(r["tokens"]) for r in s0] == [
            list(r["tokens"]) for r in orig
        ]
        assert validate_shards(spark, path).count() == 0

    def test_validation_catches_corruption(self, spark, tmp_path, blocks_mat):
        import glob
        import os

        path = str(tmp_path / "shards")
        write_training_shards(blocks_mat, path, blocks_per_shard=4)
        # corrupt: drop one data file from a shard
        victims = sorted(glob.glob(f"{path}/shard=1/*.parquet"))
        assert victims
        os.remove(victims[0])
        bad = validate_shards(spark, path).collect()
        assert [r["shard"] for r in bad] == [1]

    def test_rejects_bad_shard_size(self, blocks_mat, tmp_path):
        with pytest.raises(ValueError):
            write_training_shards(blocks_mat, str(tmp_path / "x"), 0)


class TestBpeToShards:
    def test_text_to_shards_end_to_end(self, spark, tmp_path):
        from pg_vectorize_spark.operators.bpe import (
            bpe_encode_ids,
            bpe_train,
            bpe_vocab,
            bpe_word_counts,
            encode_text,
        )

        docs = spark.createDataFrame(
            [
                (i, f"the quick brown fox {i} jumps over the lazy dog {i % 3}")
                for i in range(12)
            ],
            "doc_id long, text string",
        )
        merges = bpe_train(bpe_word_counts(docs, "text"), 30)
        vocab = bpe_vocab(docs, "text", merges)
        ids = bpe_encode_ids(docs, "doc_id", "text", merges, vocab)
        # ids decode back to the canonical python encode
        vmap = dict(enumerate(vocab))
        got = {r["doc_id"]: [vmap[i] for i in r["token_ids"]] for r in ids.collect()}
        for r in docs.collect():
            assert got[r["doc_id"]] == list(encode_text(r["text"], merges))
        counts = ids.select(
            "doc_id", F.size("token_ids").cast("long").alias("n_tokens")
        )
        packed = sequence_pack(counts, "doc_id", "n_tokens", 32)
        blocks = pack_blocks(packed, 32)
        mat = materialize_blocks(blocks, ids, "doc_id", "token_ids")
        path = str(tmp_path / "bpe_shards")
        write_training_shards(mat, path, blocks_per_shard=2)
        assert validate_shards(spark, path).count() == 0
        total = mat.agg(F.sum("n_tokens")).collect()[0][0]
        assert total == counts.agg(F.sum("n_tokens")).collect()[0][0]

    def test_unk_id_for_oov(self, spark):
        from pg_vectorize_spark.operators.bpe import bpe_encode_ids

        docs = spark.createDataFrame([(1, "zz qq")], "doc_id long, text string")
        # no merges: chars + the </w> end-of-word marker per word
        out = bpe_encode_ids(
            docs, "doc_id", "text", [], ["</w>", "q", "z"], unk_id=-7
        )
        [r] = out.collect()
        assert list(r["token_ids"]) == [2, 2, 0, 1, 1, 0]
        out2 = bpe_encode_ids(docs, "doc_id", "text", [], ["q"], unk_id=-7)
        [r2] = out2.collect()
        assert list(r2["token_ids"]) == [-7, -7, -7, 0, 0, -7]
