"""Dedup operator behavior tests: known duplicates must be found, LSH
candidates must cover true high-Jaccard pairs, survivors resolve correctly."""

from __future__ import annotations

from pg_vectorize_spark.operators.dedup import (
    cosine_neardup_pairs,
    dedup_survivors,
    exact_dedup,
    minhash_lsh_candidates,
    minhash_signatures,
    ngram_jaccard_pairs,
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


def test_dedup_survivors(spark):
    df = _df(spark)
    pairs = ngram_jaccard_pairs(df, "text", "doc_id", k=3, threshold=0.5)
    surv = dedup_survivors(df, "doc_id", pairs)
    ids = {r["doc_id"] for r in surv.collect()}
    # 2 and 3 lose to 1
    assert ids == {1, 4, 5}
