"""Bit-parity of the driver-side MinHash path (dedup_local /
MinHashBandIndexManager.*_local) against the Spark expressions — the
test_fts_index.py:506 model applied to the ingest dedup filter: every
driver-computed value (signature, band key, partition bucket, probe
drop set, maintained index contents) must equal the DataFrame path's,
or the small-batch fast path would silently change which documents a
job ingests."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from pg_vectorize_spark.dedup_index import MinHashBandIndexManager
from pg_vectorize_spark.dedup_local import (
    LocalSigs,
    band_rows,
    key_bucket,
    signature_rows,
    within_batch_dup_keys,
)
from pg_vectorize_spark.operators.dedup import (
    minhash_jaccard_estimate,
    minhash_lsh_candidates,
    minhash_signatures,
)

# deterministic corpus spanning the edge regimes: empty/NULL text,
# below-k whole-text fallback, punctuation-only (empty word list),
# unicode case-mapping, very long tokens, heavy repetition
EDGE_TEXTS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, ""),
    (3, None),
    (4, "one two"),
    (5, "single"),
    (6, "İstanbul Şehir - CAFÉ naïve 42x9!!"),
    (7, "...!!! ---"),
    (8, "  spaces   everywhere   "),
    (9, "x" * 5000),
    (10, "a b c d e f g h a b c d"),
]


def _random_texts(seed: int, n: int, start_id: int = 100) -> list:
    rng = random.Random(seed)
    vocab = [
        "alpha", "beta", "gamma", "delta", "eps", "Zeta9", "THE", "a",
        "42", "naïve", "foo-bar", "x" * 30, "data", "pipeline",
    ]
    return [
        (
            start_id + i,
            " ".join(
                rng.choice(vocab) for _ in range(rng.randint(0, 40))
            ),
        )
        for i in range(n)
    ]


class TestExpressionParity:
    @pytest.mark.parametrize("num_hashes,k", [(16, 3), (8, 2), (4, 1)])
    def test_signatures_match_spark(self, spark, num_hashes, k):
        texts = EDGE_TEXTS + _random_texts(seed=k * 31 + num_hashes, n=40)
        df = spark.createDataFrame(texts, "id bigint, t string")
        want = {
            r["_id"]: list(r["signature"])
            for r in minhash_signatures(
                df, "t", "id", num_hashes=num_hashes, k=k
            ).collect()
        }
        got = dict(signature_rows(texts, num_hashes, k))
        assert got == want

    def test_band_rows_match_manager(self, spark, tmp_path):
        mgr = MinHashBandIndexManager(
            spark,
            str(tmp_path / "idx"),
            {"num_hashes": 16, "bands": 4, "band_buckets": 64},
        )
        texts = EDGE_TEXTS + _random_texts(seed=7, n=30)
        sig_rows = signature_rows(texts, 16, 3)
        sigs_df = spark.createDataFrame(
            [(k, v) for k, v in sig_rows],
            "id bigint, signature array<bigint>",
        )
        want = {
            (r["id"], r["band"], r["band_key"], r["bb"])
            for r in mgr._band_rows(sigs_df, "id").collect()
        }
        got = set(band_rows(sig_rows, 4, 4, 64))
        assert got == want

    def test_key_bucket_matches_spark_xxhash64(self, spark):
        longs = [0, 1, -1, 42, 7, 2**62, -(2**62), 999_999_999_999]
        want = {
            r["v"]: r["b"]
            for r in spark.createDataFrame(
                [(v,) for v in longs], "v bigint"
            )
            .select(
                "v",
                F.pmod(F.xxhash64("v"), F.lit(16)).cast("int").alias("b"),
            )
            .collect()
        }
        assert {v: key_bucket(v, 16) for v in longs} == want
        strs = ["", "a", "hello world", "ü" * 40, "x" * 100, "doc-1"]
        want_s = {
            r["v"]: r["b"]
            for r in spark.createDataFrame(
                [(v,) for v in strs], "v string"
            )
            .select(
                "v",
                F.pmod(F.xxhash64("v"), F.lit(16)).cast("int").alias("b"),
            )
            .collect()
        }
        assert {v: key_bucket(v, 16) for v in strs} == want_s

    def test_within_batch_matches_spark_pipeline(self, spark):
        # planted near-dup clusters + noise; compare drop sets at the
        # same banding/threshold as the manager's within-batch check
        base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        texts = [
            (1, base),
            (2, base + " extra"),
            (3, base.replace("gamma", "mu")),
            (4, "totally different words here nothing shared at all"),
            (5, base),
        ] + _random_texts(seed=3, n=20)
        sig_rows = signature_rows(texts, 16, 3)
        sigs_df = spark.createDataFrame(
            [(k, v) for k, v in sig_rows],
            "_id bigint, signature array<bigint>",
        )
        pairs = minhash_lsh_candidates(sigs_df, bands=4, rows_per_band=4)
        est = minhash_jaccard_estimate(sigs_df, pairs, num_hashes=16)
        want = {
            r["b_id"]
            for r in est.filter(F.col("est_jaccard") >= 0.5)
            .select("b_id")
            .distinct()
            .collect()
        }
        got = within_batch_dup_keys(
            sig_rows, bands=4, rows_per_band=4, num_hashes=16,
            min_jaccard=0.5,
        )
        assert got == want
        assert 5 in got  # exact dup of 1 must be dropped


@pytest.fixture()
def built_mgr(spark, tmp_path):
    """Index built (Spark path) over a 60-doc corpus with planted
    near-dup targets."""
    base = "the quick brown fox jumps over the lazy dog again and again"
    corpus = [
        (1, base),
        (2, "completely unrelated text about spark shuffles and joins"),
    ] + _random_texts(seed=9, n=58, start_id=10)
    df = spark.createDataFrame(corpus, "id bigint, t string")
    mgr = MinHashBandIndexManager(
        spark,
        str(tmp_path / "idx"),
        {"num_hashes": 16, "bands": 4, "band_buckets": 8},
    )
    mgr.build(df, "id", "t")
    return mgr, corpus


class TestProbeParity:
    def test_near_dup_keys_local_matches_spark(self, spark, built_mgr):
        mgr, corpus = built_mgr
        base = corpus[0][1]
        batch = [
            (1001, base),                      # exact dup of indexed 1
            (1002, base + " tail"),            # near dup
            (1003, "fresh novel content with no indexed neighbor xyz"),
            (1004, ""),                        # empty text
        ] + _random_texts(seed=21, n=15, start_id=1100)
        batch_df = spark.createDataFrame(batch, "id bigint, t string")
        want = {
            r["id"]
            for r in mgr.near_dup_keys(
                batch_df, "id", "t", min_jaccard=0.7
            ).collect()
        }
        sig_rows = mgr.signatures_local(batch)
        got = mgr.near_dup_keys_local(
            sig_rows, "id", "bigint", min_jaccard=0.7
        )
        assert got == want
        assert 1001 in got

    def test_pair_cap_fallback_same_rows(self, spark, built_mgr, monkeypatch):
        """Past LOCAL_PAIR_CAP candidate pairs, probe_local finishes the
        compare on the DataFrame path — the returned triples must be
        identical to the uncapped driver-side computation (both with
        and without a threshold)."""
        mgr, corpus = built_mgr
        base = corpus[0][1]
        batch = [
            (3001, base),
            (3002, base + " tail"),
            (3003, "fresh novel content with no indexed neighbor xyz"),
        ] + _random_texts(seed=33, n=10, start_id=3100)
        sig_rows = mgr.signatures_local(batch)
        for thr in (0.7, None):
            uncapped = sorted(
                mgr.probe_local(sig_rows, "id", "bigint", min_jaccard=thr)
            )
            assert uncapped  # the guard path must actually be exercised
            monkeypatch.setattr(
                MinHashBandIndexManager, "LOCAL_PAIR_CAP", 1
            )
            capped = sorted(
                mgr.probe_local(sig_rows, "id", "bigint", min_jaccard=thr)
            )
            monkeypatch.undo()
            assert capped == uncapped

    def test_probe_after_upsert_local_matches_spark_maintenance(
        self, spark, built_mgr, tmp_path
    ):
        """Maintain the index via upsert_local (inserts + an update)
        and via the Spark upsert on a copy — band rows and sidecar
        contents must be identical afterwards."""
        mgr, corpus = built_mgr
        import shutil

        twin_dir = str(tmp_path / "idx_twin")
        shutil.copytree(mgr.index_dir, twin_dir)
        twin = MinHashBandIndexManager(
            spark,
            twin_dir,
            {"num_hashes": 16, "bands": 4, "band_buckets": 8},
        )
        batch = [
            (2001, "brand new document number one about parquet"),
            (2002, "brand new document number two about arrow"),
            (1, "document ONE rewritten with different words now"),
        ]
        batch_df = spark.createDataFrame(batch, "id bigint, t string")
        twin.upsert(batch_df, "id", "t")
        mgr.upsert_local(
            mgr.signatures_local(batch),
            "id",
            "bigint",
            prior_keys=frozenset({1}),
        )

        def dump(m):
            idx = {
                (r["id"], r["band"], r["band_key"], r["bb"])
                for r in spark.read.parquet(m.index_dir).collect()
            }
            sigs = {
                (r["id"], tuple(r["signature"]))
                for r in m._sigs_ds().read().collect()
            }
            return idx, sigs

        assert dump(mgr) == dump(twin)


class TestCombinedDeleteParity:
    def test_upsert_local_with_deletes_matches_separate_ops(
        self, spark, built_mgr, tmp_path
    ):
        """upsert_local(delete_keys=...) (one combined maintenance
        transaction) must leave the index and sidecar identical to the
        Spark-path upsert followed by delete."""
        import shutil

        mgr, corpus = built_mgr
        twin_dir = str(tmp_path / "idx_twin_d")
        shutil.copytree(mgr.index_dir, twin_dir)
        twin = MinHashBandIndexManager(
            spark,
            twin_dir,
            {"num_hashes": 16, "bands": 4, "band_buckets": 8},
        )
        batch = [
            (3001, "new insert text about shuffle partitions"),
            (2, "document TWO rewritten completely differently now"),
        ]
        deleted = [10, 11]
        batch_df = spark.createDataFrame(batch, "id bigint, t string")
        del_df = spark.createDataFrame(
            [(k,) for k in deleted], "id bigint"
        )
        twin.upsert(batch_df, "id", "t")
        twin.delete(del_df, "id")
        mgr.upsert_local(
            mgr.signatures_local(batch),
            "id",
            "bigint",
            prior_keys=frozenset({2}),
            delete_keys=deleted,
        )

        def dump(m):
            idx = {
                (r["id"], r["band"], r["band_key"], r["bb"])
                for r in spark.read.parquet(m.index_dir).collect()
            }
            sigs = {
                (r["id"], tuple(r["signature"]))
                for r in m._sigs_ds().read().collect()
            }
            return idx, sigs

        # both paths DEFER the batch-sized delete identically (r11
        # tombstones) and leave identical physical state pre-fold ...
        assert (
            mgr._load_tombstones()
            == twin._load_tombstones()
            == set(deleted)
        )
        got, want = dump(mgr), dump(twin)
        assert got == want
        # ... and identical physical state after the compaction fold,
        # with the deleted keys' rows gone
        mgr.maybe_compact(force=True)
        twin.maybe_compact(force=True)
        got, want = dump(mgr), dump(twin)
        assert got == want
        assert not any(k in deleted for k, *_ in got[0])
        assert not any(k in deleted for k, _ in got[1])

    def test_upsert_local_delete_only_delegates(self, spark, built_mgr):
        mgr, corpus = built_mgr
        mgr.upsert_local([], "id", "bigint", delete_keys=[1])
        # deferred: logically gone at once, physically at the fold
        assert mgr._load_tombstones() == {1}
        mgr.maybe_compact(force=True)
        assert (
            spark.read.parquet(mgr.index_dir).filter("id = 1").count()
            == 0
        )
        assert mgr._sigs_ds().read().filter("id = 1").count() == 0


@pytest.mark.slow
class TestEnginePathParity:
    """The filter's drop decisions and the ingested corpus must be
    IDENTICAL whether the engine takes the driver-side path (default)
    or the Spark path (local_max_rows=0)."""

    @pytest.mark.parametrize("within_batch", [False, True])
    def test_streaming_ingest_same_survivors(
        self, spark, tmp_path, within_batch
    ):
        from pg_vectorize_spark.engine import VectorizeSession

        base = (
            "shared boilerplate text that should register as a "
            "near duplicate across batches of the ingest stream"
        )
        batches = [
            [(i, base if i % 5 == 0 else f"doc {i} unique words "
              + " ".join(f"tok{i}x{j}" for j in range(12)))
             for i in range(b * 20, (b + 1) * 20)]
            for b in range(3)
        ]
        results = {}
        for label, local_max in [("local", 8192), ("spark", 0)]:
            ws = str(tmp_path / f"ws_{label}")
            src = str(tmp_path / f"src_{label}")
            spark.createDataFrame(
                [r for b in batches for r in b], "id bigint, content string"
            ).filter("id < 0").write.parquet(src)
            sess = VectorizeSession(spark, workspace=ws)
            dedup = {"min_jaccard": 0.6, "local_max_rows": local_max}
            if within_batch:
                dedup["within_batch"] = True
            sess.create_job(
                "j",
                src,
                columns=["content"],
                primary_key="id",
                run_initial_load=False,
                dedup_params=dedup,
            )
            job = sess.catalog.get("j")
            for batch in batches:
                bdf = spark.createDataFrame(
                    batch, "id bigint, content string"
                )
                changed, sigs = sess._dedup_filter_new(job, bdf)
                if label == "local":
                    assert isinstance(sigs, LocalSigs)
                survivors = changed.localCheckpoint()
                sess._emb_ds("j").merge_upsert(
                    survivors.select(
                        "id",
                        F.col("content").alias("_t"),
                    ).withColumn("embeddings", F.array(F.lit(0.0))),
                    "id",
                )
                sess._dedup_upsert(job, survivors, sigs=sigs)
            results[label] = {
                r["id"] for r in sess._emb_ds("j").read().collect()
            }
        assert results["local"] == results["spark"]
        assert len(results["local"]) < 60  # something was filtered