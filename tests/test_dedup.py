"""Dedup operator behavior tests: known duplicates must be found, LSH
candidates must cover true high-Jaccard pairs, survivors resolve correctly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pg_vectorize_spark.operators.dedup import (
    cosine_neardup_pairs,
    cosine_neardup_pairs_bucketed,
    dedup_survivors,
    exact_dedup,
    minhash_lsh_candidates,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_expr,
    simhash_pairs,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2, "the quick brown fox jumps over the lazy dog near the river bank"),  # exact dup of 1
    (3, "the quick brown fox jumps over the lazy dog near the river shore"),  # near dup of 1
    (4, "completely different content about spark query engines and shuffles"),
    (5, "pyspark dataframes optimize logical plans via catalyst rules"),
]


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_dedup(spark):
    out = exact_dedup(_df(spark), "text", "doc_id").collect()
    by_keep = {r["keep_id"]: r["n_copies"] for r in out}
    assert by_keep[1] == 2  # docs 1 and 2 collapse, min id kept
    assert by_keep[3] == 1 and by_keep[4] == 1 and by_keep[5] == 1


def test_ngram_jaccard_finds_near_dup(spark):
    pairs = ngram_jaccard_pairs(
        _df(spark), "text", "doc_id", k=3, threshold=0.5
    ).collect()
    got = {(r["a_id"], r["b_id"]): r["jaccard"] for r in pairs}
    assert got[(1, 2)] == 1.0  # identical docs
    assert (1, 3) in got and 0.5 <= got[(1, 3)] < 1.0
    assert (1, 4) not in got and (4, 5) not in got


def test_minhash_identical_docs_equal_sigs(spark):
    sigs = {
        r["_id"]: list(r["signature"])
        for r in minhash_signatures(_df(spark), "text", "doc_id").collect()
    }
    assert sigs[1] == sigs[2]
    assert sigs[1] != sigs[4]
    assert all(len(s) == 16 for s in sigs.values())


def test_lsh_candidates_cover_true_dups(spark):
    sigs = minhash_signatures(_df(spark), "text", "doc_id")
    cands = {
        (r["a_id"], r["b_id"])
        for r in minhash_lsh_candidates(sigs, bands=4, rows_per_band=4).collect()
    }
    assert (1, 2) in cands  # identical docs always share every band
    assert (1, 3) in cands  # near dup shares most minhashes


def test_simhash_pairs_rank_duplicates_closest(spark):
    pairs = simhash_pairs(
        _df(spark), "text", "doc_id", bits=20, max_hamming=20
    ).collect()
    ham = {(r["a_id"], r["b_id"]): r["hamming"] for r in pairs}
    assert ham[(1, 2)] == 0
    assert ham[(1, 3)] <= ham.get((1, 4), 20)


def test_cosine_neardup(spark):
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0]),
            (2, [0.999, 0.01, 0.0]),
            (3, [0.0, 1.0, 0.0]),
        ],
        "id long, vec array<double>",
    )
    pairs = cosine_neardup_pairs(emb, "id", "vec", threshold=0.95).collect()
    assert {(r["a_id"], r["b_id"]) for r in pairs} == {(1, 2)}


def test_simhash_banded_equals_bruteforce(spark):
    """The banded equi-join must return EXACTLY the n²-compare result
    (pigeonhole: hamming <= h implies >= 1 of h+1 bands equal)."""
    df = _df(spark)
    banded = {
        (r["a_id"], r["b_id"], r["hamming"])
        for r in simhash_pairs(
            df, "text", "doc_id", bits=20, max_hamming=3,
            collapse_identical=False,
        ).collect()
    }
    sh = df.select(
        F.col("doc_id").alias("_id"), simhash_expr(F.col("text"), 20).alias("_sh")
    )
    a = sh.select(F.col("_id").alias("a_id"), F.col("_sh").alias("_sha"))
    b = sh.select(F.col("_id").alias("b_id"), F.col("_sh").alias("_shb"))
    brute = {
        (r["a_id"], r["b_id"], r["hamming"])
        for r in a.crossJoin(b)
        .filter(F.col("a_id") < F.col("b_id"))
        .select(
            "a_id",
            "b_id",
            F.bit_count(F.col("_sha").bitwiseXOR(F.col("_shb"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= 3)
        .collect()
    }
    assert banded == brute


def test_simhash_pairs_one_row_per_pair(spark):
    """A pair agreeing on SEVERAL bands (identical docs agree on all
    four) must come back exactly once — the first-agreeing-band filter
    that replaced the .distinct() is exact, not set-lucky."""
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),  # identical
        (3, "the quick brown fox jumps over the lazy cat"),  # near-dup
        (4, "completely different text about spark shuffles"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = simhash_pairs(
        df, "text", "doc_id", bits=20, max_hamming=20,
        collapse_identical=False,
    )
    got = [(r["a_id"], r["b_id"]) for r in out.collect()]
    assert len(got) == len(set(got)), f"duplicate pair rows: {sorted(got)}"
    # max_hamming=20 admits every pair, each exactly once
    assert sorted(got) == [
        (a, b) for a in range(1, 5) for b in range(a + 1, 5)
    ]


def test_cosine_bucketed_subset_and_recall(spark):
    """Bucketed pairs ⊆ exact pairs, and true near-duplicates (cosine -> 1,
    sign patterns agree) are recalled."""
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.2, 0.1, -0.3]),
            (2, [0.99, 0.21, 0.1, -0.29]),  # near-dup of 1, same signs
            (3, [-1.0, 0.2, 0.1, -0.3]),  # sign-flipped dim 0
            (4, [0.0, 1.0, 0.0, 0.0]),
        ],
        "id long, vec array<double>",
    )
    exact = {
        (r["a_id"], r["b_id"])
        for r in cosine_neardup_pairs(emb, "id", "vec", threshold=0.9).collect()
    }
    bucketed = {
        (r["a_id"], r["b_id"])
        for r in cosine_neardup_pairs_bucketed(
            emb, "id", "vec", threshold=0.9, nbits=4, probe_hamming=1
        ).collect()
    }
    assert bucketed <= exact
    assert (1, 2) in bucketed  # identical sign pattern -> bucket-hamming 0


def test_cosine_bucketed_no_duplicate_pairs(spark):
    emb = spark.createDataFrame(
        [(i, [1.0, 1.0, 1.0, 1.0]) for i in range(6)],
        "id long, vec array<double>",
    )
    rows = cosine_neardup_pairs_bucketed(
        emb, "id", "vec", threshold=0.5, nbits=4, probe_hamming=1
    ).collect()
    pairs = [(r["a_id"], r["b_id"]) for r in rows]
    assert len(pairs) == len(set(pairs)) == 15  # C(6,2), each exactly once


def test_ngram_frequency_cap_drops_hot_shingles(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "alpha beta gamma delta epsilon"),
            (3, "alpha beta gamma zeta eta"),
        ],
        "doc_id long, text string",
    )
    uncapped = {
        (r["a_id"], r["b_id"]): r["jaccard"]
        for r in ngram_jaccard_pairs(
            docs, "text", "doc_id", k=3, threshold=0.2
        ).collect()
    }
    # 'alpha beta gamma' (df=3) links 1-3 without the cap
    assert (1, 3) in uncapped
    capped = {
        (r["a_id"], r["b_id"]): r["jaccard"]
        for r in ngram_jaccard_pairs(
            docs, "text", "doc_id", k=3, threshold=0.2, max_shingle_df=2
        ).collect()
    }
    # the hot shingle is dropped: 1-3 share nothing else; 1-2 still exact
    assert (1, 3) not in capped
    assert capped[(1, 2)] == 1.0


def test_dedup_survivors(spark):
    df = _df(spark)
    pairs = ngram_jaccard_pairs(df, "text", "doc_id", k=3, threshold=0.5)
    surv = dedup_survivors(df, "doc_id", pairs)
    ids = {r["doc_id"] for r in surv.collect()}
    # 2 and 3 lose to 1
    assert ids == {1, 4, 5}


def test_minhash_jaccard_estimate(spark):
    from pg_vectorize_spark.operators.dedup import minhash_jaccard_estimate

    sigs = minhash_signatures(_df(spark), "text", "doc_id", num_hashes=16)
    cands = minhash_lsh_candidates(sigs, bands=4, rows_per_band=4)
    est = {
        (r["a_id"], r["b_id"]): r["est_jaccard"]
        for r in minhash_jaccard_estimate(sigs, cands, num_hashes=16).collect()
    }
    assert est[(1, 2)] == 1.0  # identical docs agree on every component
    if (1, 3) in est:  # near-dup: high but below identical
        assert 0.5 <= est[(1, 3)] <= 1.0
    assert all(0.0 <= v <= 1.0 for v in est.values())


def test_quadratic_guard(spark, monkeypatch):
    """The exact n^2 baseline refuses corpus-sized inputs unless the caller
    explicitly opts in — pipeline users can't accidentally crossJoin 100 TB."""
    import pytest

    from pg_vectorize_spark.operators import dedup as dd

    emb = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(20)], "id long, vec array<double>"
    )
    monkeypatch.setattr(dd, "QUADRATIC_ROW_GUARD", 10)
    with pytest.raises(ValueError, match="n\\^2"):
        dd.cosine_neardup_pairs(emb, "id", "vec")
    # explicit opt-in still works
    assert dd.cosine_neardup_pairs(
        emb, "id", "vec", threshold=0.99, allow_quadratic=True
    ).count() >= 0
    # small inputs under the guard are unaffected
    small = emb.limit(5)
    assert dd.cosine_neardup_pairs(small, "id", "vec").count() >= 0


def test_duplicated_span_stats(spark):
    """Exact-substring audit: cross-doc verbatim windows counted, in-doc
    repetition NOT counted, short docs -> zeros, hash path == exact path."""
    from pg_vectorize_spark.operators.dedup import duplicated_span_stats

    boiler = "the quick brown fox jumps over the lazy dog tonight"
    df = spark.createDataFrame(
        [
            (1, f"intro one {boiler} closing words here"),
            (2, f"intro two {boiler} other ending text"),
            (3, "repeat me now repeat me now repeat me now repeat me now"),
            (4, "too short"),
            (5, "a completely different document with unique phrasing only"),
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in duplicated_span_stats(
            df, "text", "doc_id", k=5, hash_ngrams=False
        ).collect()
    }
    # docs 1+2 share the 10-word boilerplate -> 6 shared 5-grams each
    assert rows[1]["n_dup_windows"] == 6
    assert rows[2]["n_dup_windows"] == 6
    assert 0 < rows[1]["dup_fraction"] < 1
    # in-doc repetition alone is not cross-doc duplication
    assert rows[3]["n_dup_windows"] == 0
    # short doc: no windows at all
    assert rows[4]["n_windows"] == 0 and rows[4]["dup_fraction"] == 0.0
    assert rows[5]["n_dup_windows"] == 0
    # hashed keys give identical counts
    hashed = {
        r["doc_id"]: (r["n_windows"], r["n_dup_windows"], r["dup_fraction"])
        for r in duplicated_span_stats(
            df, "text", "doc_id", k=5, hash_ngrams=True
        ).collect()
    }
    exact = {
        d: (r["n_windows"], r["n_dup_windows"], r["dup_fraction"])
        for d, r in rows.items()
    }
    assert hashed == exact


class TestSemanticClusterDedup:
    """SemDeDup-style cluster-scoped dedup: near-dups inside a cluster
    are dropped (lowest key survives); an equal vector in a DIFFERENT
    cluster is untouched — the cluster scoping that bounds the pair
    join is also the semantic the paper specifies."""

    def test_cluster_scoped_rule(self, spark):
        import pyspark.sql.functions as F

        from pg_vectorize_spark.operators.dedup import (
            semantic_cluster_dedup,
        )

        def v(main, eps=0.0):
            x = [0.0] * 4
            x[main] = 1.0
            x[(main + 1) % 4] = eps
            return x

        rows = [
            (0, v(0)),          # cluster A representative
            (1, v(0, 0.01)),    # near-dup of 0 -> dropped
            (2, v(0, 0.02)),    # near-dup of 0 -> dropped
            (3, v(1)),          # cluster B representative
            (4, v(1, 0.3)),     # same cluster, below threshold -> kept
        ]
        emb = spark.createDataFrame(rows, "id long, emb array<double>")
        cents = spark.createDataFrame(
            [(0, v(0)), (1, v(1))],
            "centroid_id int, centroid_vec array<double>",
        )
        out = {
            r["id"]: r
            for r in semantic_cluster_dedup(
                emb, "id", "emb", cents, threshold=0.995
            ).collect()
        }
        assert not out[0]["is_dup"] and out[0]["cell"] == 0
        assert out[1]["is_dup"] and out[2]["is_dup"]
        assert not out[3]["is_dup"] and out[3]["cell"] == 1
        assert not out[4]["is_dup"]  # similar cluster, cosine too low


class TestParagraphDedup:
    def test_first_bearer_survives_and_reassembly(self, spark):
        from pg_vectorize_spark.operators.dedup import paragraph_dedup

        rows = [
            (1, "alpha one\nshared para\nbeta two"),
            (2, "shared para\ngamma three"),     # 'shared para' dropped
            (3, "shared para\n\n  \n"),          # everything seen/blank
            (4, None),                           # NULL text
            (5, ""),                             # empty text
        ]
        df = spark.createDataFrame(rows, "id long, text string")
        out = {r["id"]: r for r in paragraph_dedup(df, "text", "id").collect()}
        assert set(out) == {1, 2, 3, 4, 5}  # one row per INPUT doc
        for i in (4, 5):
            assert (out[i]["n_paras"], out[i]["n_kept"], out[i]["clean_text"]) == (0, 0, "")
        assert out[1]["n_paras"] == 3 and out[1]["n_kept"] == 3
        assert out[1]["clean_text"] == "alpha one\nshared para\nbeta two"
        assert out[2]["n_paras"] == 2 and out[2]["n_kept"] == 1
        assert out[2]["clean_text"] == "gamma three"
        assert out[3]["n_kept"] == 0 and out[3]["clean_text"] == ""

    def test_literal_separator_and_hash_keys_agree(self, spark):
        from pg_vectorize_spark.operators.dedup import paragraph_dedup

        # '||' is an empty-alternation regex — as a LITERAL separator it
        # must split on the two-char token, not between every character
        rows = [(1, "first para||second para"), (2, "second para||third")]
        df = spark.createDataFrame(rows, "id long, text string")
        out = {
            r["id"]: r
            for r in paragraph_dedup(df, "text", "id", sep="||").collect()
        }
        assert out[1]["clean_text"] == "first para||second para"
        assert out[2]["clean_text"] == "third"
        # hash-keyed (production) and exact-string windows agree
        a = sorted(
            map(tuple, paragraph_dedup(df, "text", "id", sep="||").collect())
        )
        b = sorted(
            map(
                tuple,
                paragraph_dedup(
                    df, "text", "id", sep="||", hash_keys=False
                ).collect(),
            )
        )
        assert a == b


class TestSemanticClusterAutoSize:
    """centroids_df=None auto-sizes k = ceil(n/target_cell_size) with
    kmeans centroids — the quadratic-footgun guard (VERDICT r6 #4)."""

    def _emb(self, spark, n):
        import random

        rng = random.Random(5)
        rows = []
        for i in range(n):
            base = [0.0] * 8
            base[i % 4] = 1.0
            rows.append(
                (i, [b + rng.uniform(-0.05, 0.05) for b in base])
            )
        return spark.createDataFrame(
            rows, "id long, emb array<double>"
        )

    def test_auto_covers_all_rows_and_flags_dups(self, spark):
        from pg_vectorize_spark.operators.dedup import (
            semantic_cluster_dedup,
        )

        emb = self._emb(spark, 200)
        out = semantic_cluster_dedup(
            emb, "id", "emb", threshold=0.995, target_cell_size=32
        )
        rows = out.collect()
        assert len(rows) == 200  # one verdict per input row
        # tight same-direction vectors must produce duplicates
        assert any(r["is_dup"] for r in rows)
        # auto k = ceil(200/32) = 7 cells
        assert len({r["cell"] for r in rows}) <= 7

    def test_auto_matches_explicit_kmeans(self, spark):
        """auto == hand-built centroid table at the same k and seed."""
        from pg_vectorize_spark.operators.ann import (
            train_ivf_centroids_kmeans,
        )
        from pg_vectorize_spark.operators.dedup import (
            semantic_cluster_dedup,
        )

        emb = self._emb(spark, 120)
        cents = train_ivf_centroids_kmeans(
            emb, "id", "emb", n_centroids=4, seed=42
        )
        manual = semantic_cluster_dedup(
            emb, "id", "emb", cents, threshold=0.99
        )
        auto = semantic_cluster_dedup(
            emb, "id", "emb", threshold=0.99, target_cell_size=30
        )
        m = {(r["id"], r["is_dup"]) for r in manual.collect()}
        a = {(r["id"], r["is_dup"]) for r in auto.collect()}
        assert m == a


@pytest.mark.slow
class TestSemanticClusterGemmParity:
    """pair_mode='gemm' (applyInPandas GEMM prefilter + exact sequential
    rescore) must return the exact row set of pair_mode='join' (the
    cosine_similarity-expression self-join the oracle mirrors) — every
    (id, cell, is_dup) identical, across thresholds, clustered/spread
    corpora, and zero vectors."""

    def _corpus(self, spark, n, dim=16, seed=3, with_zero=False):
        import random

        rng = random.Random(seed)
        rows = []
        for i in range(n):
            base = [0.0] * dim
            base[i % 4] = 1.0
            rows.append(
                (i, [b + rng.uniform(-0.2, 0.2) for b in base])
            )
        if with_zero:
            rows[0] = (0, [0.0] * dim)
            rows[1] = (1, [0.0] * dim)
        return spark.createDataFrame(rows, "id long, emb array<double>")

    def _parity(self, spark, emb, threshold, cents=None):
        from pg_vectorize_spark.operators.dedup import (
            semantic_cluster_dedup,
        )

        kw = dict(threshold=threshold, target_cell_size=40)
        g = semantic_cluster_dedup(
            emb, "id", "emb", cents, pair_mode="gemm", **kw
        )
        j = semantic_cluster_dedup(
            emb, "id", "emb", cents, pair_mode="join", **kw
        )
        gs = sorted(map(tuple, g.select("id", "cell", "is_dup").collect()))
        js = sorted(map(tuple, j.select("id", "cell", "is_dup").collect()))
        assert gs == js

    def test_thresholds(self, spark):
        emb = self._corpus(spark, 150)
        for thr in (0.999, 0.95, 0.7, 0.35):
            self._parity(spark, emb, thr)

    def test_zero_vectors(self, spark):
        # zero-norm rows score cosine 0.0 (never >= a positive threshold)
        # in BOTH paths — the expression's when(denom > 0) guard and the
        # numpy where(denom > 0) must agree
        emb = self._corpus(spark, 60, with_zero=True)
        self._parity(spark, emb, 0.9)

    def test_nan_vectors(self, spark):
        # Spark SQL compares NaN greater than everything: the expression
        # path MARKS a row whose pairing cosine is NaN; the gemm path
        # must mirror that, not apply IEEE never-true semantics
        emb = self._corpus(spark, 40)
        rows = emb.collect()
        import math

        poisoned = [
            (r["id"], [math.nan] + list(r["emb"][1:]))
            if r["id"] in (5, 17)
            else (r["id"], list(r["emb"]))
            for r in rows
        ]
        emb2 = spark.createDataFrame(poisoned, "id long, emb array<double>")
        self._parity(spark, emb2, 0.9)

    def test_gate_fixture_config(self, spark):
        # the exact sf0.001 gate shape: first-8 deterministic centroids,
        # threshold sized to the synthetic corpus
        from pg_vectorize_spark.operators.ann import default_centroids

        emb = (
            spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
            .selectExpr("vec_id as id", "embedding as emb")
        )
        cents = default_centroids(emb, "id", "emb", n_centroids=8)
        self._parity(spark, emb, 0.35, cents)

    def test_rejects_unknown_mode(self, spark):
        import pytest as _pytest

        from pg_vectorize_spark.operators.dedup import (
            semantic_cluster_dedup,
        )

        emb = self._corpus(spark, 10)
        with _pytest.raises(ValueError, match="pair_mode"):
            semantic_cluster_dedup(
                emb, "id", "emb", threshold=0.9, pair_mode="nope"
            )

    def test_cell_spanning_gemm_blocks(self, spark):
        # the gemm kernel processes a cell in 1024-row blocks; a cell
        # bigger than one block must still see EVERY lower-key neighbor,
        # including pairs whose two rows land in different blocks.
        # Construction: 1400 rows in ONE cell (single centroid), random
        # 64-dim unit-ish vectors (pairwise cosine ~N(0, 1/8), never near
        # 0.95), with exact copies planted so every cross/within-block
        # case occurs: (1100 copies 50) cross-block, (1030 copies 1025)
        # within block 2, (1399 copies 1023) boundary-adjacent cross,
        # (700 copies 10) within block 1.
        import random

        from pg_vectorize_spark.operators.ann import default_centroids
        from pg_vectorize_spark.operators.dedup import (
            semantic_cluster_dedup,
        )

        rng = random.Random(7)
        vecs = [
            [rng.gauss(0.0, 1.0) for _ in range(64)] for _ in range(1400)
        ]
        planted = {1100: 50, 1030: 1025, 1399: 1023, 700: 10}
        for dup, src in planted.items():
            vecs[dup] = list(vecs[src])
        emb = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vecs)],
            "id long, emb array<double>",
        )
        cents = default_centroids(emb, "id", "emb", n_centroids=1)
        out = semantic_cluster_dedup(
            emb, "id", "emb", cents, threshold=0.95, pair_mode="gemm"
        )
        marked = {
            r["id"] for r in out.collect() if r["is_dup"]
        }
        assert marked == set(planted)


class TestBucketedCosineRescoreParity:
    """rescore_mode='pandas' (Arrow prefilter + exact sequential rescore)
    must emit the exact rows AND the exact cosine bits of
    rescore_mode='expr' (the zip_with/aggregate expression the oracle
    mirrors)."""

    def _corpus(self, spark, n, dim=16, seed=11, with_zero=False):
        import random

        rng = random.Random(seed)
        rows = []
        for i in range(n):
            base = [0.0] * dim
            base[i % 3] = 1.0
            rows.append((i, [b + rng.uniform(-0.15, 0.15) for b in base]))
        if with_zero:
            rows[0] = (0, [0.0] * dim)
            rows[1] = (1, [0.0] * dim)
        return spark.createDataFrame(rows, "id long, vec array<double>")

    def _parity(self, spark, emb, threshold):
        from pg_vectorize_spark.operators.dedup import (
            cosine_neardup_pairs_bucketed,
        )

        p = cosine_neardup_pairs_bucketed(
            emb, "id", "vec", threshold=threshold, rescore_mode="pandas"
        )
        e = cosine_neardup_pairs_bucketed(
            emb, "id", "vec", threshold=threshold, rescore_mode="expr"
        )
        ps = sorted(
            (r["a_id"], r["b_id"], r["cosine"]) for r in p.collect()
        )
        es = sorted(
            (r["a_id"], r["b_id"], r["cosine"]) for r in e.collect()
        )
        # exact equality including the float bits of the cosine column
        assert ps == es

    def test_thresholds(self, spark):
        emb = self._corpus(spark, 120)
        for thr in (0.99, 0.9, 0.5):
            self._parity(spark, emb, thr)

    def test_zero_vectors(self, spark):
        self._parity(spark, self._corpus(spark, 50, with_zero=True), 0.9)

    def test_nan_vectors(self, spark):
        # NaN-cosine candidates pass Spark's >= filter and come back
        # with a NaN score from the expression path; the Arrow path
        # must emit the same rows (NaN == NaN treated as equal here)
        import math

        emb = self._corpus(spark, 30)
        rows = emb.collect()
        poisoned = [
            (r["id"], [math.nan] + list(r["vec"][1:]))
            if r["id"] == 3
            else (r["id"], list(r["vec"]))
            for r in rows
        ]
        emb2 = spark.createDataFrame(poisoned, "id long, vec array<double>")
        from pg_vectorize_spark.operators.dedup import (
            cosine_neardup_pairs_bucketed,
        )

        def norm(df):
            return sorted(
                (
                    r["a_id"],
                    r["b_id"],
                    "nan" if math.isnan(r["cosine"]) else r["cosine"],
                )
                for r in df.collect()
            )

        p = norm(
            cosine_neardup_pairs_bucketed(
                emb2, "id", "vec", threshold=0.9, rescore_mode="pandas"
            )
        )
        e = norm(
            cosine_neardup_pairs_bucketed(
                emb2, "id", "vec", threshold=0.9, rescore_mode="expr"
            )
        )
        assert p == e
        assert any(c == "nan" for _, _, c in p), (
            "fixture failed to produce a NaN-cosine candidate pair"
        )

    def test_gate_fixture(self, spark):
        from pg_vectorize_spark.operators.dedup import (
            cosine_neardup_pairs_bucketed,
        )

        emb = spark.read.parquet(
            "/root/testdata/sf0.001/embeddings.parquet"
        ).selectExpr("vec_id as id", "embedding as vec")
        self._parity(spark, emb, 0.35)

    def test_rejects_unknown_mode(self, spark):
        import pytest as _pytest

        from pg_vectorize_spark.operators.dedup import (
            cosine_neardup_pairs_bucketed,
        )

        with _pytest.raises(ValueError, match="rescore_mode"):
            cosine_neardup_pairs_bucketed(
                self._corpus(spark, 5), "id", "vec", rescore_mode="x"
            )


class TestRemoveDupSpans:
    """Exact-substring span removal (Lee et al. 2022 §4): first bearer
    keeps the span, later bearers lose exactly its word positions;
    untouched docs stay byte-identical."""

    SPAN = "alpha beta gamma delta epsilon"  # the shared 5-word span

    def _docs(self, spark):
        rows = [
            (1, f"one two {self.SPAN} three four"),     # first bearer
            (2, f"intro {self.SPAN} outro words here"), # loses the span
            (3, "totally unrelated text with no duplication at all"),
            (4, f"prefix padding {self.SPAN}"),          # loses it too
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def _clean(self, spark, k=5):
        from pg_vectorize_spark.operators.dedup import remove_dup_spans

        return {
            r["doc_id"]: r
            for r in remove_dup_spans(
                self._docs(spark), "text", "doc_id", k=k,
                hash_ngrams=False,
            ).collect()
        }

    def test_first_bearer_keeps_text_verbatim(self, spark):
        got = self._clean(spark)
        assert got[1]["clean_text"] == f"one two {self.SPAN} three four"
        assert not got[1]["was_rewritten"]
        assert got[1]["n_removed_words"] == 0

    def test_later_bearers_lose_exactly_the_span(self, spark):
        got = self._clean(spark)
        assert got[2]["clean_text"] == "intro outro words here"
        assert got[2]["was_rewritten"]
        assert got[2]["n_removed_words"] == 5
        assert got[4]["clean_text"] == "prefix padding"
        assert got[4]["n_removed_words"] == 5

    def test_untouched_doc_byte_identical(self, spark):
        got = self._clean(spark)
        assert (
            got[3]["clean_text"]
            == "totally unrelated text with no duplication at all"
        )
        assert not got[3]["was_rewritten"]

    def test_overlapping_windows_union_of_positions(self, spark):
        from pg_vectorize_spark.operators.dedup import remove_dup_spans

        # a 6-word shared run yields TWO overlapping 5-word windows in
        # each doc; removal must take the union (6 words), not 10
        run = "p q r s t u"
        rows = [
            (1, f"{run} tail"),
            (2, f"head {run}"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r["doc_id"]: r
            for r in remove_dup_spans(
                df, "text", "doc_id", k=5, hash_ngrams=False
            ).collect()
        }
        assert got[1]["n_removed_words"] == 0  # first bearer
        assert got[2]["clean_text"] == "head"
        assert got[2]["n_removed_words"] == 6

    def test_hashed_path_matches_exact_path(self, spark):
        from pg_vectorize_spark.operators.dedup import remove_dup_spans

        df = self._docs(spark)
        a = {
            r["doc_id"]: (r["clean_text"], r["n_removed_words"])
            for r in remove_dup_spans(
                df, "text", "doc_id", k=5, hash_ngrams=False
            ).collect()
        }
        b = {
            r["doc_id"]: (r["clean_text"], r["n_removed_words"])
            for r in remove_dup_spans(
                df.repartition(7), "text", "doc_id", k=5, hash_ngrams=True
            ).collect()
        }
        assert a == b

    def test_case_and_punctuation_survive_rewrite(self, spark):
        """Review finding: the rebuild must come from ORIGINAL tokens —
        a rewritten doc keeps its casing/punctuation in the surviving
        text; matching stays case/punct-insensitive."""
        from pg_vectorize_spark.operators.dedup import remove_dup_spans

        rows = [
            (1, "alpha beta gamma delta epsilon tail"),
            (2, 'Dr. Smith said: "Hello!" Alpha, Beta; GAMMA delta epsilon'),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r["doc_id"]: r
            for r in remove_dup_spans(
                df, "text", "doc_id", k=5, hash_ngrams=False
            ).collect()
        }
        # doc 2's normalized tokens match doc 1's span -> excised, but
        # the untouched prefix keeps every byte of case + punctuation
        assert got[2]["was_rewritten"]
        assert got[2]["clean_text"] == 'Dr. Smith said: "Hello!"'
        assert got[1]["clean_text"] == "alpha beta gamma delta epsilon tail"

    def test_chained_pipeline_rewrites_keep_schema(self, spark):
        from pg_vectorize_spark.pipelines import CorpusPipeline

        span = " ".join(f"s{i}" for i in range(8))
        df = spark.createDataFrame(
            [(1, f"{span} one"), (2, f"{span} two"), (3, "unrelated doc")],
            "doc_id long, text string",
        )
        out = (
            CorpusPipeline(spark, df, "doc_id", "text")
            .remove_dup_spans(k=5)
            .remove_dup_spans(k=4)
            .df()
        )
        assert out.columns.count("was_rewritten") == 1
        assert out.count() == 3
