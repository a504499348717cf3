"""Corpus-curation operators: hash split, domain cap, decontamination,
Gopher flags (operators/curate.py, functions/text.gopher_flags_exprs)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pg_vectorize_spark.functions.text import gopher_flags_exprs
from pg_vectorize_spark.operators.curate import (
    contamination_flags,
    domain_cap,
    hash_split,
)


class TestHashSplit:
    def test_every_row_labeled_and_deterministic(self, spark):
        df = spark.range(0, 2000).withColumnRenamed("id", "k")
        out1 = hash_split(df, "k").collect()
        out2 = hash_split(df, "k").collect()
        assert sorted(out1) == sorted(out2)
        labels = {r["split"] for r in out1}
        assert labels <= {"train", "val", "test"}
        assert len(out1) == 2000

    def test_fractions_approximately_hold(self, spark):
        df = spark.range(0, 5000).withColumnRenamed("id", "k")
        counts = {
            r["split"]: r["count"]
            for r in hash_split(df, "k").groupBy("split").count().collect()
        }
        assert 0.75 < counts["train"] / 5000 < 0.85
        assert 0.06 < counts["val"] / 5000 < 0.14
        assert 0.06 < counts["test"] / 5000 < 0.14

    def test_membership_independent_of_partitioning(self, spark):
        """The property that matters at scale: repartitioning must not move
        any row between splits."""
        df = spark.range(0, 500).withColumnRenamed("id", "k")
        a = {(r["k"], r["split"]) for r in hash_split(df, "k").collect()}
        b = {
            (r["k"], r["split"])
            for r in hash_split(df.repartition(13), "k").collect()
        }
        assert a == b

    def test_bad_fractions_rejected(self, spark):
        df = spark.range(3).withColumnRenamed("id", "k")
        with pytest.raises(ValueError):
            hash_split(df, "k", [("a", 0.5), ("b", 0.2)])


class TestDomainCap:
    def test_caps_each_domain(self, spark):
        rows = [(i, "dom%d" % (i % 3)) for i in range(30)]
        df = spark.createDataFrame(rows, "id long, src string")
        out = domain_cap(df, "id", "src", cap=4)
        counts = out.groupBy("src").count().collect()
        assert all(r["count"] == 4 for r in counts)
        # deterministic: lowest ids survive
        kept = sorted(r["id"] for r in out.filter(F.col("src") == "dom0").collect())
        assert kept == [0, 3, 6, 9]

    def test_custom_order(self, spark):
        rows = [(1, "d", 5.0), (2, "d", 9.0), (3, "d", 1.0)]
        df = spark.createDataFrame(rows, "id long, src string, q double")
        out = domain_cap(df, "id", "src", cap=2, order_by=F.desc("q"))
        assert sorted(r["id"] for r in out.collect()) == [1, 2]

    def test_cap_validation(self, spark):
        df = spark.createDataFrame([(1, "d")], "id long, src string")
        with pytest.raises(ValueError):
            domain_cap(df, "id", "src", cap=0)


class TestDecontamination:
    def test_flags_known_overlap(self, spark):
        corpus = spark.createDataFrame(
            [
                (1, "the quick brown fox jumps over the lazy dog"),
                (2, "completely different words entirely here now"),
                (3, "quick brown fox appears again in this doc"),
            ],
            "id long, txt string",
        )
        bench = spark.createDataFrame(
            [(100, "watch the quick brown fox leap")], "id long, txt string"
        )
        out = {
            r["id"]: r["n_shared_grams"]
            for r in contamination_flags(corpus, bench, "id", "txt", k=3).collect()
        }
        assert set(out) == {1, 3}
        # doc 1 shares 'the quick brown' and 'quick brown fox'
        assert out[1] == 2
        assert out[3] == 1  # 'quick brown fox'

    def test_counts_distinct_grams_once(self, spark):
        corpus = spark.createDataFrame(
            [(1, "a b c a b c a b c")], "id long, txt string"
        )
        bench = spark.createDataFrame([(9, "a b c")], "id long, txt string")
        out = contamination_flags(corpus, bench, "id", "txt", k=3).collect()
        # 'a b c' repeats in the doc but counts once (distinct grams)
        shared = {r["id"]: r["n_shared_grams"] for r in out}
        assert shared[1] == 1

    def test_no_overlap_empty(self, spark):
        corpus = spark.createDataFrame([(1, "x y z w")], "id long, txt string")
        bench = spark.createDataFrame([(9, "p q r s")], "id long, txt string")
        assert contamination_flags(corpus, bench, "id", "txt", k=3).count() == 0


class TestGopherFlags:
    def _flags(self, spark, text, **kw):
        df = spark.createDataFrame([(text,)], "txt string")
        flags = gopher_flags_exprs(F.col("txt"), **kw)
        return df.select(
            *[v.alias(k) for k, v in flags.items()]
        ).collect()[0].asDict()

    def test_good_doc_passes(self, spark):
        text = (
            "the results of this study have shown that careful analysis "
            "with proper controls can be repeated and the findings have "
            "remained stable across many trials of the same experiment "
            "that we designed to validate the original hypothesis with care"
        )
        out = self._flags(spark, text, min_words=20)
        assert out["pass_gopher"], out

    def test_word_count_bounds(self, spark):
        out = self._flags(spark, "too short", min_words=20)
        assert not out["ok_word_count"] and not out["pass_gopher"]

    def test_symbol_ratio_cut(self, spark):
        text = "the data have # # # # # # symbols that push # ratio up with more"
        out = self._flags(spark, text, min_words=5)
        assert not out["ok_symbol_ratio"]

    def test_alpha_ratio_cut(self, spark):
        text = "1 2 3 4 5 6 7 8 9 10 11 12 13 14 15 16 17 18 19 20 the of"
        out = self._flags(spark, text, min_words=5)
        assert not out["ok_alpha_words"]

    def test_stop_word_rule(self, spark):
        text = " ".join(["datum"] * 30)
        out = self._flags(spark, text, min_words=5)
        assert not out["ok_stop_words"]

    def test_null_and_empty(self, spark):
        df = spark.createDataFrame([(None,), ("",)], "txt string")
        flags = gopher_flags_exprs(F.col("txt"), min_words=1)
        rows = df.select(flags["pass_gopher"].alias("p")).collect()
        assert [r["p"] for r in rows] == [False, False]


class TestCorpusStats:
    def test_groups_and_exact_sums(self, spark):
        from pg_vectorize_spark.operators.curate import corpus_stats

        df = spark.createDataFrame(
            [
                ("s1", "en", "one two three"),
                ("s1", "en", "four five"),
                ("s1", "de", "sechs"),
                ("s2", "en", None),
            ],
            "source string, lang string, text string",
        )
        out = {
            (r["source"], r["lang"]): r
            for r in corpus_stats(df, ["source", "lang"], "text").collect()
        }
        assert out[("s1", "en")]["n_docs"] == 2
        assert out[("s1", "en")]["total_tokens"] == 5
        assert out[("s1", "en")]["mean_tokens"] == 2.5
        assert out[("s2", "en")]["total_tokens"] == 0
        assert len(out) == 3

    def test_partitioning_invariant(self, spark):
        """Exact integer sums: repartitioning cannot change any value."""
        from pg_vectorize_spark.operators.curate import corpus_stats

        df = spark.createDataFrame(
            [("s%d" % (i % 3), "en", "w " * (i % 7)) for i in range(100)],
            "source string, lang string, text string",
        )
        a = sorted(map(tuple, corpus_stats(df, ["source"], "text").collect()))
        b = sorted(
            map(
                tuple,
                corpus_stats(df.repartition(17), ["source"], "text").collect(),
            )
        )
        assert a == b


class TestWeightedMix:
    def _docs(self, spark):
        rows = [(i, ["a", "b", "c"][i % 3]) for i in range(300)]
        return spark.createDataFrame(rows, "id long, stratum string")

    def test_multiplicity_bounds_and_expectation(self, spark):
        from pg_vectorize_spark.operators.curate import weighted_mix

        df = self._docs(spark)
        w = {"a": 2.5, "b": 0.5, "c": 0.0}
        out = weighted_mix(df, "id", "stratum", w)
        per = {
            r["stratum"]: r["n"]
            for r in out.groupBy("stratum").count().withColumnRenamed("count", "n").collect()
        }
        assert "c" not in per  # weight 0 drops the stratum
        # every 'a' row appears 2 or 3 times; expectation ~2.5 * 100
        a_counts = [
            r["n"]
            for r in out.filter("stratum = 'a'").groupBy("id").count()
            .withColumnRenamed("count", "n").collect()
        ]
        assert set(a_counts) <= {2, 3}
        assert 200 <= per["a"] <= 300
        # 'b' rows appear at most once, roughly half
        assert 25 <= per["b"] <= 75

    def test_deterministic_across_partitioning(self, spark):
        from pg_vectorize_spark.operators.curate import weighted_mix

        df = self._docs(spark)
        w = {"a": 1.5, "b": 0.25}
        one = weighted_mix(df.coalesce(1), "id", "stratum", w)
        many = weighted_mix(df.repartition(13), "id", "stratum", w)
        assert sorted(map(tuple, one.collect())) == sorted(map(tuple, many.collect()))

    def test_zero_shuffle_plan(self, spark):
        from pg_vectorize_spark.operators.curate import weighted_mix

        df = self._docs(spark)
        out = weighted_mix(df, "id", "stratum", {"a": 2.0})
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan

    def test_decorrelated_from_hash_split(self, spark):
        """A 0.5-weight sample must not align with split membership."""
        from pg_vectorize_spark.operators.curate import hash_split, weighted_mix

        df = self._docs(spark)
        sampled = weighted_mix(df, "id", "stratum", {}, default_weight=0.5)
        splits = hash_split(sampled, "id")
        frac_train = splits.filter("split = 'train'").count() / splits.count()
        assert 0.7 <= frac_train <= 0.9  # ~0.8, not 0 or 1

    def test_negative_weight_raises(self, spark):
        from pg_vectorize_spark.operators.curate import weighted_mix

        import pytest as _pytest

        with _pytest.raises(ValueError):
            weighted_mix(self._docs(spark), "id", "stratum", {"a": -1.0})


def test_hash_split_uniform_on_short_integer_keys(spark):
    """Regression: raw poly_hash % buckets concentrated 3-digit keys in
    one band (37% 'train' from an 80% cut); the Fibonacci-mixed bucket
    must hold fractions on exactly the key shapes the gate uses."""
    from pg_vectorize_spark.operators.curate import hash_split

    df = spark.range(300).withColumnRenamed("id", "k")
    frac = (
        hash_split(df, "k").filter("split = 'train'").count() / 300.0
    )
    assert 0.75 <= frac <= 0.85


class TestVocabularyAndLogprob:
    DOCS = [
        (1, "the cat sat on the mat the cat"),
        (2, "the dog sat on the log"),
        (3, "zyzzyva qwerty xylophone"),
        (4, ""),
    ]

    def _df(self, spark):
        return spark.createDataFrame(self.DOCS, "doc_id long, text string")

    def test_vocabulary_counts(self, spark):
        from pg_vectorize_spark.operators.curate import vocabulary

        v = {
            r["word"]: (r["n"], r["n_docs"])
            for r in vocabulary(self._df(spark), "text", "doc_id").collect()
        }
        assert v["the"] == (5, 2)
        assert v["cat"] == (2, 1)
        assert v["sat"] == (2, 2)
        assert v["zyzzyva"] == (1, 1)

    def test_vocabulary_topn_deterministic(self, spark):
        from pg_vectorize_spark.operators.curate import vocabulary

        top = vocabulary(self._df(spark), "text", "doc_id", top_n=3).collect()
        assert [r["word"] for r in top] == ["the", "cat", "on"]  # n desc, word asc

    def test_unigram_logprob_ranks_common_above_rare(self, spark):
        from pg_vectorize_spark.operators.curate import unigram_logprob

        out = {
            r["doc_id"]: r
            for r in unigram_logprob(self._df(spark), "text", "doc_id").collect()
        }
        assert 4 not in out  # zero-word doc absent
        # doc 3 is all hapaxes -> lowest mean log-likelihood
        assert out[3]["mean_logprob"] < out[1]["mean_logprob"]
        assert out[3]["mean_logprob"] < out[2]["mean_logprob"]
        assert out[1]["n_words"] == 8
        # all logprobs are negative (p < 1 for every word here)
        assert all(r["mean_logprob"] < 0 for r in out.values())

    def test_unigram_logprob_partition_invariant(self, spark):
        from pg_vectorize_spark.operators.curate import unigram_logprob

        df = self._df(spark)
        a = sorted(map(tuple, unigram_logprob(df.coalesce(1), "text", "doc_id").collect()))
        b = sorted(map(tuple, unigram_logprob(df.repartition(7), "text", "doc_id").collect()))
        assert a == b  # exact equality incl. float bits


class TestSampleExact:
    def _df(self, spark):
        rows = [(i, ["a", "b"][i % 2]) for i in range(100)]
        return spark.createDataFrame(rows, "id long, stratum string")

    def test_exact_counts_and_prefix_stability(self, spark):
        from pg_vectorize_spark.operators.curate import sample_exact

        df = self._df(spark)
        s5 = sample_exact(df, "id", 5, "stratum")
        per = {r["stratum"]: r["count"] for r in s5.groupBy("stratum").count().collect()}
        assert per == {"a": 5, "b": 5}
        # nested draws: k=3 is exactly the rank<=3 prefix of k=5
        s3 = sample_exact(df, "id", 3, "stratum")
        want = {(r["id"], r["sample_rank"]) for r in s5.filter("sample_rank <= 3").collect()}
        got = {(r["id"], r["sample_rank"]) for r in s3.collect()}
        assert got == want

    def test_small_stratum_returns_all(self, spark):
        from pg_vectorize_spark.operators.curate import sample_exact

        df = spark.createDataFrame([(1, "x"), (2, "x")], "id long, stratum string")
        assert sample_exact(df, "id", 10, "stratum").count() == 2

    def test_partition_invariant(self, spark):
        from pg_vectorize_spark.operators.curate import sample_exact

        df = self._df(spark)
        a = sorted(map(tuple, sample_exact(df.coalesce(1), "id", 7, "stratum").collect()))
        b = sorted(map(tuple, sample_exact(df.repartition(9), "id", 7, "stratum").collect()))
        assert a == b

    def test_global_sample_without_strata(self, spark):
        from pg_vectorize_spark.operators.curate import sample_exact

        assert sample_exact(self._df(spark), "id", 13).count() == 13


class TestSourceDivergence:
    def test_identical_strata_near_zero_and_outlier_large(self, spark):
        from pg_vectorize_spark.operators.curate import source_divergence

        rows = (
            [(i, "s1", "the cat sat on the mat") for i in range(10)]
            + [(100 + i, "s2", "the cat sat on the mat") for i in range(10)]
            + [(200 + i, "s3", "zorp blee qux flib zorp wug") for i in range(10)]
        )
        df = spark.createDataFrame(rows, "id long, source string, text string")
        kl = {r["source"]: r["kl_nats"] for r in source_divergence(df, "text", "source").collect()}
        # s1/s2 match each other (2/3 of corpus mass): small positive KL
        assert kl["s1"] == kl["s2"]
        # s3's vocabulary is disjoint: much larger divergence
        assert kl["s3"] > kl["s1"] * 2
        assert all(v >= -1e-9 for v in kl.values())  # KL >= 0 up to flooring

    def test_partition_invariant(self, spark):
        import random

        from pg_vectorize_spark.operators.curate import source_divergence

        rng = random.Random(3)
        vocab = ["alpha", "beta", "gamma", "delta", "eps"]
        rows = [
            (i, f"s{i % 3}", " ".join(rng.choice(vocab) for _ in range(20)))
            for i in range(60)
        ]
        df = spark.createDataFrame(rows, "id long, source string, text string")
        a = sorted(map(tuple, source_divergence(df.coalesce(1), "text", "source").collect()))
        b = sorted(map(tuple, source_divergence(df.repartition(11), "text", "source").collect()))
        assert a == b


class TestBigramLogprob:
    def test_order_awareness(self, spark):
        """The property unigram scoring cannot see: repeated fluent
        word ORDER scores above a doc whose words are the same multiset
        in a never-repeated shuffled order."""
        fluent = "the quick brown fox jumps over the lazy dog . " * 10
        words = fluent.split()
        import random

        rng = random.Random(5)
        shuffled_words = words[:]
        rng.shuffle(shuffled_words)
        shuffled = " ".join(shuffled_words)
        df = spark.createDataFrame(
            [(1, fluent), (2, shuffled)] + [(i, fluent) for i in range(3, 8)],
            "doc_id long, text string",
        )
        from pg_vectorize_spark.operators.curate import bigram_logprob

        got = {
            r["doc_id"]: r["mean_logprob"]
            for r in bigram_logprob(df, "text", "doc_id").collect()
        }
        assert got[1] > got[2]

    def test_short_docs_absent_and_counts(self, spark):
        df = spark.createDataFrame(
            [(1, "only"), (2, ""), (3, "two words"), (4, "a b c d")],
            "doc_id long, text string",
        )
        from pg_vectorize_spark.operators.curate import bigram_logprob

        rows = {r["doc_id"]: r for r in bigram_logprob(df, "text", "doc_id").collect()}
        assert set(rows) == {3, 4}  # <2-word docs absent
        assert rows[3]["n_bigrams"] == 1
        assert rows[4]["n_bigrams"] == 3


class TestDsirWeights:
    """DSIR hashed importance weights: target-like documents score
    higher; zero-token docs are absent; token counts are exact."""

    def test_target_like_docs_score_higher(self, spark):
        from pg_vectorize_spark.operators.curate import dsir_log_weights

        sci = "neural network gradient training model loss epoch"
        spam = "buy cheap now click here winner prize offer"
        rows = (
            [(i, f"{sci} doc {i}") for i in range(10)]
            + [(100 + i, f"{spam} doc {i}") for i in range(10)]
            + [(900, "   ")]  # zero tokens after tokenization? "   " -> none
        )
        raw = spark.createDataFrame(rows, "doc_id long, text string")
        target = spark.createDataFrame(
            [(i, f"{sci} reference {i}") for i in range(5)],
            "doc_id long, text string",
        )
        out = {
            r["doc_id"]: r
            for r in dsir_log_weights(
                raw, target, "text", "doc_id", n_buckets=64
            ).collect()
        }
        assert 900 not in out  # no tokens -> no row
        sci_w = [out[i]["log_weight"] for i in range(10)]
        spam_w = [out[100 + i]["log_weight"] for i in range(10)]
        assert min(sci_w) > max(spam_w)
        assert out[0]["n_tokens"] == 9  # 7 sci words + "doc" + "0"

    def test_weights_deterministic_across_partitionings(self, spark):
        from pg_vectorize_spark.operators.curate import dsir_log_weights

        docs = (
            spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .select("doc_id", "text", "lang")
            .filter("doc_id < 100")
        )
        tgt = docs.filter("lang = 'en'")
        a = {
            r["doc_id"]: r["log_weight"]
            for r in dsir_log_weights(
                docs, tgt, "text", "doc_id", n_buckets=128
            ).collect()
        }
        b = {
            r["doc_id"]: r["log_weight"]
            for r in dsir_log_weights(
                docs.repartition(7), tgt.repartition(3), "text", "doc_id",
                n_buckets=128,
            ).collect()
        }
        assert a == b  # integer nano-unit sums: shuffle-order-free

    def test_single_pass_matches_two_pass_bitwise(self, spark):
        """single_pass=True (one corpus explode, multiplicity-weighted
        BIGINT sum over the per-doc bucket histogram) must reproduce the
        explode-twice plan's rows exactly — integer nano-units make the
        two groupings bit-identical."""
        from pg_vectorize_spark.operators.curate import dsir_log_weights

        docs = (
            spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .select("doc_id", "text", "lang")
        )
        tgt = docs.filter("lang = 'en'")
        one = sorted(
            map(
                tuple,
                dsir_log_weights(
                    docs, tgt, "text", "doc_id", n_buckets=128,
                    single_pass=True,
                ).collect(),
            )
        )
        two = sorted(
            map(
                tuple,
                dsir_log_weights(
                    docs, tgt, "text", "doc_id", n_buckets=128,
                    single_pass=False,
                ).collect(),
            )
        )
        assert one == two


class TestSemanticContamination:
    def test_flags_match_exact_crossjoin(self, spark):
        """Bucketed candidates -> exact rescore must agree with the full
        crossJoin ground truth for pairs the buckets admit; near-identical
        vectors (the contamination case) always share sign patterns."""
        import random

        from pyspark.sql import functions as F

        from pg_vectorize_spark.operators.curate import (
            semantic_contamination_flags,
        )

        rng = random.Random(13)
        bench_rows = [
            (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(5)
        ]
        train_rows = []
        for i in range(40):
            if i < 5:
                # leaked: a tiny perturbation of bench item i
                v = [x + rng.uniform(-1e-3, 1e-3) for x in bench_rows[i][1]]
            else:
                v = [rng.uniform(-1, 1) for _ in range(8)]
            train_rows.append((100 + i, v))
        train = spark.createDataFrame(
            train_rows, "tid long, emb array<double>"
        )
        bench = spark.createDataFrame(
            bench_rows, "bid long, bemb array<double>"
        )
        out = semantic_contamination_flags(
            train, "tid", "emb", bench, "bid", "bemb", threshold=0.999
        )
        rows = {r["tid"]: r for r in out.collect()}
        assert len(rows) == 40  # cardinality preserved
        for i in range(5):  # every leaked doc flagged with its source
            r = rows[100 + i]
            assert r["is_contaminated"] and r["bench_match"] == i
            assert r["max_bench_cosine"] > 0.999
        # non-leaked random vectors at threshold .999: clean
        assert all(
            not rows[100 + i]["is_contaminated"] for i in range(5, 40)
        )

    def test_probe_hamming_cap(self, spark):
        import pytest as _pytest

        from pg_vectorize_spark.operators.curate import (
            semantic_contamination_flags,
        )

        df = spark.createDataFrame([(1, [1.0])], "id long, e array<double>")
        with _pytest.raises(ValueError, match="probe_hamming"):
            semantic_contamination_flags(
                df, "id", "e", df, "id", "e", probe_hamming=2
            )


class TestSequencePack:
    def _df(self, spark, n=200):
        # deterministic token counts 1..13, a few zero/null rows
        rows = [
            (i, None if i % 41 == 0 else (0 if i % 17 == 0 else 1 + i % 13))
            for i in range(n)
        ]
        return spark.createDataFrame(rows, "doc_id long, n long")

    def _pack(self, spark, df, block, buckets):
        from pg_vectorize_spark.operators.curate import sequence_pack

        return sorted(
            map(tuple, sequence_pack(df, "doc_id", "n", block, order_buckets=buckets).collect())
        )

    def test_stream_is_gapless_and_block_math_holds(self, spark):
        df = self._df(spark)
        out = self._pack(spark, df, 7, 8)
        # zero/null-count rows dropped
        kept = df.filter("n > 0").count()
        assert len(out) == kept
        rows = sorted(out, key=lambda r: r[2])  # by start_tok
        pos = 0
        for (doc, n, start, first, off, last, nb) in rows:
            assert start == pos, "concatenated stream has a gap/overlap"
            assert first == start // 7 and off == start % 7
            assert last == (start + n - 1) // 7
            assert nb == last - first + 1
            pos += n

    def test_bucket_count_invariant(self, spark):
        # the distributed prefix sum must not depend on how the priority
        # space is chopped: 1 bucket (fully sequential) == 64 buckets
        df = self._df(spark)
        assert self._pack(spark, df, 16, 1) == self._pack(spark, df, 16, 64)

    def test_partition_invariant(self, spark):
        df = self._df(spark)
        a = self._pack(spark, df.coalesce(1), 32, 8)
        b = self._pack(spark, df.repartition(13), 32, 8)
        assert a == b

    def test_salt_gives_independent_epoch_orders(self, spark):
        from pg_vectorize_spark.operators.curate import sequence_pack

        df = self._df(spark).filter("n > 0")
        a = {r["doc_id"]: r["start_tok"] for r in sequence_pack(df, "doc_id", "n", 8, salt="|e0").collect()}
        b = {r["doc_id"]: r["start_tok"] for r in sequence_pack(df, "doc_id", "n", 8, salt="|e1").collect()}
        assert a != b  # a different epoch order
        assert set(a) == set(b)  # over the same docs

    def test_rejects_bad_args(self, spark):
        from pg_vectorize_spark.operators.curate import sequence_pack

        df = self._df(spark)
        with pytest.raises(ValueError):
            sequence_pack(df, "doc_id", "n", 0)
        with pytest.raises(ValueError):
            sequence_pack(df, "doc_id", "n", 8, order_buckets=0)

    def test_empty_input(self, spark):
        df = self._df(spark).filter("n < 0")
        assert self._pack(spark, df, 8, 8) == []


class TestLineDedup:
    def _run(self, spark, texts):
        from pg_vectorize_spark.functions.text import line_dedup_exprs

        df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id long, t string")
        ex = line_dedup_exprs(F.col("t"))
        return {
            r["id"]: (r["n"], r["k"], r["d"], r["c"])
            for r in df.select(
                "id",
                ex["n_lines"].alias("n"),
                ex["n_kept_lines"].alias("k"),
                ex["had_dup_lines"].alias("d"),
                ex["clean_text"].alias("c"),
            ).collect()
        }

    def test_first_occurrence_survives_in_order(self, spark):
        out = self._run(spark, ["a\nb\na\nc\nb\na"])
        assert out[0] == (6, 3, True, "a\nb\nc")

    def test_no_dups_is_identity(self, spark):
        out = self._run(spark, ["x\ny\nz"])
        assert out[0] == (3, 3, False, "x\ny\nz")

    def test_empty_and_null(self, spark):
        out = self._run(spark, ["", None])
        assert out[0] == (1, 1, False, "")
        assert out[1] == (1, 1, False, "")


class TestPackBlocks:
    def _manifest(self, spark, block):
        from pg_vectorize_spark.operators.curate import pack_blocks, sequence_pack

        rows = [(i, 1 + (i * 7) % 23) for i in range(120)]
        df = spark.createDataFrame(rows, "doc_id long, n long")
        packed = sequence_pack(df, "doc_id", "n", block, order_buckets=8)
        return packed, pack_blocks(packed, block).collect()

    def test_blocks_full_and_slices_reassemble(self, spark):
        block = 16
        packed, m = self._manifest(spark, block)
        total = sum(r["n_tokens"] for r in packed.collect())
        last_block = (total - 1) // block
        # per-block token sums: exactly block_size except the last
        per_block = {}
        for r in m:
            per_block.setdefault(r["block_id"], 0)
            per_block[r["block_id"]] += r["doc_to"] - r["doc_from"]
        for b, s in per_block.items():
            want = total - last_block * block if b == last_block else block
            assert s == want, (b, s)
        # per-doc slices tile [0, n_tokens) in block order without gaps
        by_doc = {}
        for r in m:
            by_doc.setdefault(r["doc_id"], []).append(
                (r["block_id"], r["doc_from"], r["doc_to"])
            )
        n_of = {r["doc_id"]: r["n_tokens"] for r in packed.collect()}
        for doc, slices in by_doc.items():
            slices.sort()
            assert slices[0][1] == 0
            assert slices[-1][2] == n_of[doc]
            for (_, _, t0), (_, f1, _) in zip(slices, slices[1:]):
                assert t0 == f1, "gap inside a doc's slices"

    def test_offsets_are_block_local(self, spark):
        block = 16
        _, m = self._manifest(spark, block)
        for r in m:
            assert 0 <= r["offset_in_block"] < block
            assert 0 <= r["doc_from"] < r["doc_to"]

    def test_rejects_bad_block(self, spark):
        from pg_vectorize_spark.operators.curate import pack_blocks, sequence_pack

        df = spark.createDataFrame([(0, 5)], "doc_id long, n long")
        packed = sequence_pack(df, "doc_id", "n", 8)
        with pytest.raises(ValueError):
            pack_blocks(packed, 0)


class TestSampleWeighted:
    def _df(self, spark, n=400):
        # two weight tiers: heavy rows (w=50) vs light rows (w=1)
        rows = [(i, 50.0 if i % 4 == 0 else 1.0) for i in range(n)]
        return spark.createDataFrame(rows, "id long, w double")

    def test_weight_tilts_inclusion(self, spark):
        from pg_vectorize_spark.operators.curate import sample_weighted

        out = sample_weighted(self._df(spark), "id", "w", 40).collect()
        assert len(out) == 40
        heavy = sum(1 for r in out if r["id"] % 4 == 0)
        # heavy rows are 25% of the corpus at 50x weight; a uniform draw
        # would include ~10 — the race must strongly prefer them
        assert heavy > 25

    def test_prefix_stable_and_ranked(self, spark):
        from pg_vectorize_spark.operators.curate import sample_weighted

        df = self._df(spark)
        s10 = sample_weighted(df, "id", "w", 10).collect()
        s5 = sample_weighted(df, "id", "w", 5).collect()
        assert [r["id"] for r in s5] == [r["id"] for r in s10[:5]]
        assert [r["sample_rank"] for r in s10] == list(range(1, 11))
        keys = [r["sample_key"] for r in s10]
        assert keys == sorted(keys)

    def test_partition_invariant(self, spark):
        from pg_vectorize_spark.operators.curate import sample_weighted

        df = self._df(spark)
        a = [r["id"] for r in sample_weighted(df.coalesce(1), "id", "w", 15).collect()]
        b = [r["id"] for r in sample_weighted(df.repartition(11), "id", "w", 15).collect()]
        assert a == b

    def test_nonpositive_and_null_weights_excluded(self, spark):
        from pg_vectorize_spark.operators.curate import sample_weighted

        df = spark.createDataFrame(
            [(1, 2.0), (2, 0.0), (3, -1.0), (4, None), (5, 1.0)],
            "id long, w double",
        )
        got = {r["id"] for r in sample_weighted(df, "id", "w", 10).collect()}
        assert got == {1, 5}

    def test_rejects_bad_k(self, spark):
        from pg_vectorize_spark.operators.curate import sample_weighted

        with pytest.raises(ValueError):
            sample_weighted(self._df(spark), "id", "w", 0)


class TestPerplexityBuckets:
    """CCNet per-language perplexity terciles — the distributed rank +
    closed-form BIGINT NTILE must agree with SQL NTILE semantics on
    every shape: uneven tiles, fewer rows than tiles, tied scores, and
    any input partitioning."""

    def _docs(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_tile_sizes_follow_ntile(self, spark):
        from pg_vectorize_spark.operators.curate import perplexity_buckets

        # 8 docs, one language -> NTILE(3) sizes must be 3/3/2
        rows = [
            (i, "the and for with this " + " ".join(f"w{i}x{j}" for j in range(i + 1)))
            for i in range(8)
        ]
        out = perplexity_buckets(self._docs(spark, rows), "text", "doc_id")
        got = out.groupBy("bucket").count().collect()
        sizes = {r["bucket"]: r["count"] for r in got}
        assert sizes == {1: 3, 2: 3, 3: 2}

    def test_head_outranks_tail(self, spark):
        from pg_vectorize_spark.operators.curate import perplexity_buckets

        rows = [
            (i, "the and for with this " + " ".join(f"w{i}x{j}" for j in range(i + 1)))
            for i in range(9)
        ]
        out = perplexity_buckets(self._docs(spark, rows), "text", "doc_id")
        pdf = {r["doc_id"]: r for r in out.collect()}
        heads = [r["mean_logprob"] for r in pdf.values() if r["bucket"] == 1]
        tails = [r["mean_logprob"] for r in pdf.values() if r["bucket"] == 3]
        assert min(heads) >= max(tails)
        labels = {r["bucket"]: r["ppl_bucket"] for r in pdf.values()}
        assert labels == {1: "head", 2: "middle", 3: "tail"}

    def test_fewer_rows_than_tiles(self, spark):
        from pg_vectorize_spark.operators.curate import perplexity_buckets

        rows = [(0, "the cat"), (1, "the the the dog")]
        out = perplexity_buckets(self._docs(spark, rows), "text", "doc_id")
        got = sorted((r["bucket"]) for r in out.collect())
        assert got == [1, 2]  # NTILE: each row its own tile, no tile 3

    def test_partition_invariance(self, spark):
        from pg_vectorize_spark.operators.curate import perplexity_buckets

        rows = [
            (i, "le la et les une " + " ".join(f"m{i}n{j}" for j in range(i % 5 + 1)))
            for i in range(20)
        ] + [
            (100 + i, "the and for with " + " ".join(f"w{i}q{j}" for j in range(i % 7 + 1)))
            for i in range(20)
        ]
        df = self._docs(spark, rows)
        a = perplexity_buckets(df.repartition(1), "text", "doc_id")
        b = perplexity_buckets(df.repartition(16), "text", "doc_id")
        ka = {(r["doc_id"], r["lang"], r["bucket"]) for r in a.collect()}
        kb = {(r["doc_id"], r["lang"], r["bucket"]) for r in b.collect()}
        assert ka == kb
        assert len({lang for _, lang, _ in ka}) >= 2  # really per-language

    def test_narrow_rank_buckets_cross_boundaries(self, spark):
        from pg_vectorize_spark.operators.curate import perplexity_buckets

        # width=1 nano-unit forces every distinct score into its own
        # range — the driver prefix sum does ALL the ranking work
        rows = [
            (i, "the and for with this " + " ".join(f"w{i}x{j}" for j in range(i + 1)))
            for i in range(9)
        ]
        df = self._docs(spark, rows)
        wide = perplexity_buckets(df, "text", "doc_id")
        narrow = perplexity_buckets(df, "text", "doc_id", rank_buckets_width=1)
        assert {tuple(r) for r in wide.collect()} == {
            tuple(r) for r in narrow.collect()
        }

    def test_rejects_bad_buckets(self, spark):
        from pg_vectorize_spark.operators.curate import perplexity_buckets

        with pytest.raises(ValueError):
            perplexity_buckets(self._docs(spark, [(0, "x")]), "text", "doc_id", 0)


class TestUnimax:
    """UniMax budget waterfilling + deterministic sampled materialization
    (Chung et al. 2023)."""

    def test_waterfill_caps_low_resource(self):
        from pg_vectorize_spark.operators.curate import unimax_budgets

        # tiny language hits the 2-epoch cap; the rest split the
        # remainder uniformly
        eps = unimax_budgets(
            [("xx", 100), ("en", 10_000), ("fr", 10_000)],
            total_budget=10_200,
            max_epochs=2.0,
        )
        assert eps["xx"] == pytest.approx(2.0)
        assert eps["en"] == pytest.approx(0.5)
        assert eps["fr"] == pytest.approx(0.5)
        # budgets sum to the total
        sizes = {"xx": 100, "en": 10_000, "fr": 10_000}
        assert sum(eps[l] * sizes[l] for l in eps) == pytest.approx(10_200)

    def test_uniform_when_no_cap_binds(self):
        from pg_vectorize_spark.operators.curate import unimax_budgets

        eps = unimax_budgets(
            [("a", 1000), ("b", 2000)], total_budget=900, max_epochs=10.0
        )
        # uniform 450/450 tokens -> epochs inversely proportional to size
        assert eps["a"] == pytest.approx(0.45)
        assert eps["b"] == pytest.approx(0.225)

    def test_budget_exceeding_all_caps(self):
        from pg_vectorize_spark.operators.curate import unimax_budgets

        eps = unimax_budgets(
            [("a", 10), ("b", 20)], total_budget=10_000, max_epochs=3.0
        )
        assert eps == {"a": pytest.approx(3.0), "b": pytest.approx(3.0)}

    def test_rejects_bad_args(self):
        from pg_vectorize_spark.operators.curate import unimax_budgets

        with pytest.raises(ValueError):
            unimax_budgets([("a", 1)], -1)
        with pytest.raises(ValueError):
            unimax_budgets([("a", 1)], 10, max_epochs=0)

    def _corpus(self, spark):
        rows = (
            [(i, "en", 100) for i in range(200)]
            + [(1000 + i, "fr", 100) for i in range(40)]
            + [(2000 + i, "xx", 100) for i in range(2)]
        )
        return spark.createDataFrame(rows, "doc_id long, lang string, n_tokens long")

    def test_sample_tracks_budgets(self, spark):
        from pg_vectorize_spark.operators.curate import (
            unimax_budgets,
            unimax_sample,
        )

        df = self._corpus(spark)
        budget, cap = 12_000, 2.0
        out = unimax_sample(df, "doc_id", "lang", "n_tokens", budget, cap)
        got = {
            r["lang"]: r["tok"]
            for r in out.groupBy("lang")
            .agg(F.sum("n_tokens").alias("tok"))
            .collect()
        }
        eps = unimax_budgets(
            [("en", 20_000), ("fr", 4_000), ("xx", 200)], budget, cap
        )
        for lang, size in (("en", 20_000), ("fr", 4_000), ("xx", 200)):
            want = eps[lang] * size
            assert got[lang] == pytest.approx(want, rel=0.2), (lang, got)
        # full copies are exact: xx is capped at 2.0 epochs -> every doc
        # exactly twice, no coin involved
        xx = out.filter(F.col("lang") == "xx").collect()
        assert sorted((r["doc_id"], r["copy"]) for r in xx) == [
            (2000, 0), (2000, 1), (2001, 0), (2001, 1),
        ]

    def test_deterministic_and_partition_invariant(self, spark):
        from pg_vectorize_spark.operators.curate import unimax_sample

        df = self._corpus(spark)
        a = unimax_sample(df.repartition(1), "doc_id", "lang", "n_tokens", 9_000)
        b = unimax_sample(df.repartition(13), "doc_id", "lang", "n_tokens", 9_000)
        ka = {(r["doc_id"], r["copy"]) for r in a.collect()}
        kb = {(r["doc_id"], r["copy"]) for r in b.collect()}
        assert ka == kb
        # a different salt gives a different fractional-coin draw
        c = unimax_sample(
            df, "doc_id", "lang", "n_tokens", 9_000, salt="|unimax2"
        )
        kc = {(r["doc_id"], r["copy"]) for r in c.collect()}
        assert kc != ka

    def test_empty_input(self, spark):
        from pg_vectorize_spark.operators.curate import unimax_sample

        df = spark.createDataFrame([], "doc_id long, lang string, n_tokens long")
        out = unimax_sample(df, "doc_id", "lang", "n_tokens", 1000)
        assert out.count() == 0
