"""Chunking tests — greedy goldens from the reference
(extension/tests/integration_tests.rs:87-152) + distributed-spec behavior."""

from __future__ import annotations

from pg_vectorize_spark.operators.chunk import (
    chunk_table_distributed,
    chunk_table_greedy,
    chunk_text_greedy,
)


class TestGreedyGoldens:
    def test_reference_golden(self):
        # extension/tests/integration_tests.rs:87-103
        assert chunk_text_greedy("This is a test for chunking.", 20) == [
            "This is a test for",
            "chunking.",
        ]

    def test_fits_in_one(self):
        assert chunk_text_greedy("short text", 100) == ["short text"]

    def test_every_chunk_within_limit(self):
        doc = "the quick brown fox jumps over the lazy dog " * 20
        for ch in chunk_text_greedy(doc, 25):
            assert len(ch) <= 25

    def test_oversized_word_hard_split(self):
        out = chunk_text_greedy("abcdefghij xy", 4)
        assert out == ["abcd", "efgh", "ij", "xy"]

    def test_empty_and_none(self):
        assert chunk_text_greedy("", 10) == []
        assert chunk_text_greedy(None, 10) == []
        assert chunk_text_greedy("   ", 10) == []

    def test_whitespace_normalized(self):
        assert chunk_text_greedy("a  b\tc\nd", 3) == ["a b", "c d"]


class TestChunkTable:
    def test_greedy_table(self, spark):
        df = spark.createDataFrame(
            [(1, "This is a test for chunking."), (2, "tiny")],
            "id long, body string",
        )
        out = chunk_table_greedy(df, "body", "id", 20).collect()
        got = {(r["original_id"], r["chunk_index"]): r["chunk"] for r in out}
        assert got[(1, 0)] == "This is a test for"
        assert got[(1, 1)] == "chunking."
        assert got[(2, 0)] == "tiny"

    def test_distributed_reassembles_text(self, spark):
        text = "the quick brown fox jumps over the lazy dog"
        df = spark.createDataFrame([(1, text)], "id long, body string")
        out = chunk_table_distributed(df, "body", "id", 15).collect()
        ordered = sorted(out, key=lambda r: r["chunk_index"])
        assert " ".join(r["chunk"] for r in ordered) == text

    def test_distributed_chunk_assignment(self, spark):
        # words at offsets 0,4,8 with max=8: "abc"(0)->0, "def"(4)->0, "ghi"(8)->1
        df = spark.createDataFrame([(1, "abc def ghi")], "id long, body string")
        out = {
            r["chunk_index"]: r["chunk"]
            for r in chunk_table_distributed(df, "body", "id", 8).collect()
        }
        assert out == {0: "abc def", 1: "ghi"}
