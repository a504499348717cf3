"""BPE tokenizer (operators/bpe.py): training on the classic Sennrich
corpus, encode semantics (pass-per-merge == canonical priority encode),
Spark/Python tokenization parity, and the distributed encode path."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from pg_vectorize_spark.operators.bpe import (
    EOW,
    bpe_encode_counts,
    bpe_train,
    bpe_word_counts,
    encode_text,
    encode_word,
    merge_pass,
    words_of,
)


class TestTrain:
    def test_sennrich_example(self):
        # Sennrich et al. 2016 §3.2 toy vocab: the first merges must
        # pick the most frequent pair, ties to the smallest pair
        vocab = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
        merges = bpe_train(vocab, 4)
        # pair counts round 1: (e,s)=9, (s,t)=9, (t,</w>)=9, (w,e)=8...
        # ties at 9 break lexicographically: ('e','s') first
        assert merges[0] == ("e", "s")
        assert merges[1] == ("es", "t")
        assert merges[2] == ("est", "</w>")
        assert merges[3] == ("l", "o")

    def test_early_stop_when_fully_merged(self):
        merges = bpe_train([("ab", 3)], 100)
        # 'a b </w>' offers at most 2 merges before one symbol remains
        assert len(merges) <= 2
        assert encode_word("ab", merges) == ("ab</w>",)

    def test_deterministic_over_input_order(self):
        v1 = [("low", 5), ("newest", 6), ("widest", 3)]
        v2 = list(reversed(v1))
        assert bpe_train(v1, 6) == bpe_train(v2, 6)

    def test_rejects_negative(self):
        with pytest.raises(ValueError):
            bpe_train([("a", 1)], -1)

    def test_distributed_word_count_feeds_training(self, spark):
        df = spark.createDataFrame(
            [(0, "low low lower"), (1, "newest widest newest")],
            "id long, t string",
        )
        wc = bpe_word_counts(df, "t")
        got = {(r["word"], r["n"]) for r in wc.collect()}
        assert got == {("low", 2), ("lower", 1), ("newest", 2), ("widest", 1)}
        # DataFrame input and the equivalent in-memory input learn the
        # same merges
        assert bpe_train(wc, 5) == bpe_train(sorted(got), 5)


class TestEncode:
    def test_merge_pass_left_to_right_self_overlap(self):
        assert merge_pass(("a", "a", "a"), "a", "a") == ("aa", "a")
        assert merge_pass(("a", "b", "a", "b"), "a", "b") == ("ab", "ab")
        assert merge_pass(("x",), "a", "b") == ("x",)

    def test_encode_matches_canonical_priority_encode(self):
        # canonical form: repeatedly merge the LOWEST-RANK pair present
        def canonical(word, merges):
            ranks = {p: i for i, p in enumerate(merges)}
            sym = tuple(word) + (EOW,)
            while True:
                pairs = [(ranks[p], p) for p in zip(sym, sym[1:]) if p in ranks]
                if not pairs:
                    return sym
                _, best = min(pairs)
                sym = merge_pass(sym, *best)

        vocab = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
        merges = bpe_train(vocab, 10)
        for w in ["low", "lower", "lowest", "newest", "wid", "unseen", "a"]:
            assert encode_word(w, merges) == canonical(w, merges), w

    def test_tokens_concatenate_back(self):
        merges = bpe_train([("hello", 3), ("help", 2)], 8)
        for w in ["hello", "help", "hell", "x"]:
            assert "".join(encode_word(w, merges)) == w + EOW

    def test_encode_text_word_order_and_empties(self):
        merges = [("a", "b")]
        assert encode_text("ab ba", merges) == ["ab", EOW, "b", "a", EOW]
        assert encode_text("", merges) == []
        assert encode_text(None, merges) == []

    @settings(max_examples=50, deadline=None)
    @given(st.text(alphabet="ab01", min_size=1, max_size=12))
    def test_property_lossless_and_stable(self, w):
        merges = bpe_train([(w, 2), ("abba", 3)], 6)
        enc = encode_word(w, merges)
        assert "".join(enc) == w + EOW
        assert encode_word(w, merges) == enc  # deterministic


class TestSparkParity:
    def test_words_of_mirrors_raw_words_expr(self, spark):
        texts = [
            "Hello, World!",
            "",
            None,
            "  a--b__c  9x ",
            "ALL CAPS 123",
            "émigré café",  # non-ascii splits
        ]
        from pg_vectorize_spark.functions.text import raw_words_expr

        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "id long, t string"
        )
        got = {
            r["id"]: r["w"]
            for r in df.select(
                "id", raw_words_expr(F.col("t")).alias("w")
            ).collect()
        }
        for i, t in enumerate(texts):
            assert got[i] == words_of(t), t

    def test_distributed_encode_matches_local(self, spark):
        texts = ["low lower", "newest, WIDEST!", "", None, "abba abba low"]
        vocab_df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        merges = bpe_train(
            bpe_word_counts(vocab_df, "text"), 8
        )
        out = {
            r["doc_id"]: (r["n_words"], r["n_bpe_tokens"], r["token_hash"])
            for r in bpe_encode_counts(
                vocab_df, "doc_id", "text", merges
            ).collect()
        }
        import hashlib

        for i, t in enumerate(texts):
            toks = encode_text(t, merges)
            want = (
                len(words_of(t)),
                len(toks),
                hashlib.md5(" ".join(toks).encode()).hexdigest(),
            )
            assert out[i] == want, t

    def test_committed_fixture_loads_and_encodes(self):
        import json

        with open("/root/repo/tests/fixtures/bpe_merges.json") as f:
            fx = json.load(f)
        merges = [tuple(m) for m in fx["merges"]]
        assert len(merges) == fx["n_merges"] == 60
        enc = encode_word("the", merges)
        assert "".join(enc) == "the" + EOW


class TestIncrementalTrainerParity:
    """bpe_train (incremental pair-index + lazy heap) must equal the
    naive full-recount trainer bit-for-bit, including tie-breaks."""

    @settings(max_examples=60, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.text(alphabet="abcd", min_size=1, max_size=8),
                st.integers(min_value=1, max_value=50),
            ),
            min_size=0,
            max_size=40,
        ),
        st.integers(min_value=0, max_value=25),
    )
    def test_property_identical_merges(self, vocab, n_merges):
        from pg_vectorize_spark.operators.bpe import _bpe_train_naive

        dedup = list({w: (w, c) for w, c in vocab}.values())
        assert bpe_train(dedup, n_merges) == _bpe_train_naive(
            dedup, n_merges
        )

    def test_committed_fixture_reproduces(self, spark):
        # the fixture was trained via bpe_word_counts on sf0.001; the
        # incremental trainer must regenerate it exactly
        import json

        from pg_vectorize_spark.operators.bpe import bpe_word_counts

        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        )
        merges = bpe_train(bpe_word_counts(docs, "text"), 60)
        with open("/root/repo/tests/fixtures/bpe_merges.json") as f:
            assert [tuple(m) for m in json.load(f)["merges"]] == merges


@pytest.mark.slow
class TestDistributedLearning:
    """bpe_learn_merges (r13 — VERDICT r12 #5): executor-held symbol
    state, per-iteration algebraic pair aggregate, driver holds only
    the merge list — must equal the driver trainer bit-for-bit."""

    @settings(max_examples=40, deadline=None)
    @given(
        words=st.lists(
            st.text(alphabet="abc", min_size=1, max_size=7),
            min_size=1,
            max_size=6,
        ),
        a=st.text(alphabet="abc", min_size=1, max_size=2),
        b=st.text(alphabet="abc", min_size=1, max_size=2),
    )
    def test_merge_pass_expr_matches_python(self, spark, words, a, b):
        """The greedy-last fold IS the left-to-right scan, on arbitrary
        symbol tuples including self-overlapping pairs."""
        from pg_vectorize_spark.operators.bpe import _merge_pass_expr

        rows = [(i, list(w) + [EOW]) for i, w in enumerate(words)]
        df = spark.createDataFrame(rows, "id long, syms array<string>")
        got = {
            r["id"]: tuple(r["m"])
            for r in df.select(
                "id", _merge_pass_expr(F.col("syms"), a, b).alias("m")
            ).collect()
        }
        for i, w in enumerate(words):
            assert got[i] == merge_pass(tuple(w) + (EOW,), a, b), (w, a, b)

    def test_fixture_reproduced_distributed(self, spark):
        """Self-proving gate: the committed fixture WAS generated by the
        driver trainer over sf0.001; the distributed learner must land
        on the identical 60 merges, tie-breaks included."""
        import json

        from pg_vectorize_spark.operators.bpe import bpe_learn_merges

        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        )
        merges = bpe_learn_merges(bpe_word_counts(docs, "text"), 60)
        with open("/root/repo/tests/fixtures/bpe_merges.json") as f:
            assert [tuple(m) for m in json.load(f)["merges"]] == merges

    def test_second_slice_parity_with_driver_trainer(self, spark):
        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        ).filter("doc_id % 3 = 1")
        wc = bpe_word_counts(docs, "text")
        from pg_vectorize_spark.operators.bpe import bpe_learn_merges

        assert bpe_learn_merges(wc, 25) == bpe_train(wc, 25)

    def test_early_stop_fully_merged(self, spark):
        from pg_vectorize_spark.operators.bpe import bpe_learn_merges

        wc = spark.createDataFrame(
            [("ab", 3)], "word string, n long"
        )
        got = bpe_learn_merges(wc, 50)
        # 'a b </w>' has 2 pairs -> 2 merges, then nothing left
        assert len(got) == 2
        assert got == bpe_train([("ab", 3)], 50)

    def test_rejects_negative(self, spark):
        from pg_vectorize_spark.operators.bpe import bpe_learn_merges

        wc = spark.createDataFrame([("ab", 1)], "word string, n long")
        with pytest.raises(ValueError):
            bpe_learn_merges(wc, -1)
