"""Persisted MinHash band index (dedup_index.MinHashBandIndexManager):
probe parity with the batch LSH operators, maintenance equivalence
(add/upsert/delete vs rebuild), partition-pruned probe plan, and the
ingest-filter shape. The invariant everything hangs on: a probe against
an index over corpus C returns EXACTLY the batch↔corpus pairs the batch
operator pipeline (minhash_signatures → minhash_lsh_candidates →
minhash_jaccard_estimate) finds on C ∪ batch."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from pg_vectorize_spark.dedup_index import MinHashBandIndexManager
from pg_vectorize_spark.operators.dedup import (
    minhash_jaccard_estimate,
    minhash_lsh_candidates,
    minhash_signatures,
)

PARAMS = {"num_hashes": 16, "bands": 4, "shingle_k": 3, "band_buckets": 16}


@pytest.fixture()
def corpus(spark):
    """Deterministic docs with planted near-dup structure: 1/2/3 share a
    long run of shingles, 4 is unrelated, 5 short (whole-text-shingle
    fallback), 6 empty and 7 NULL (both collapse to the "" shingle and
    so duplicate each other — the fallback's edge semantics)."""
    rows = [
        (1, "the quick brown fox jumps over the lazy dog near the river"),
        (2, "the quick brown fox jumps over the lazy dog near the bridge"),
        (3, "a quick brown fox jumps over the lazy dog near the river"),
        (4, "completely different text about spark query planning today"),
        (5, "two words"),
        (6, ""),
        (7, None),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture()
def batch(spark):
    """Incoming batch: 101 duplicates corpus doc 1 almost verbatim, 102
    is unrelated, 103 is a near-dup of corpus doc 4."""
    rows = [
        (101, "the quick brown fox jumps over the lazy dog near the river"),
        (102, "unrelated incoming content with no shingle overlap at all"),
        (103, "completely different text about spark query planning here"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _batch_pipeline_cross_pairs(corpus, batch):
    """The batch-operator answer restricted to batch↔corpus pairs,
    re-keyed as (batch_id, corpus_id, est_jaccard)."""
    both = corpus.unionByName(batch)
    sigs = minhash_signatures(both, "text", "doc_id", num_hashes=16, k=3)
    # uncapped: this helper reconstructs the batch<->corpus CROSS-pair
    # ground truth the index probe must match; the duplicate-cluster
    # collapse would reroute member pairs through group representatives
    pairs = minhash_lsh_candidates(
        sigs, bands=4, rows_per_band=4, collapse_identical=False
    )
    est = minhash_jaccard_estimate(sigs, pairs, num_hashes=16)
    batch_ids = {r[0] for r in batch.select("doc_id").collect()}
    out = set()
    for r in est.collect():
        a, b, j = r["a_id"], r["b_id"], r["est_jaccard"]
        if (a in batch_ids) != (b in batch_ids):
            bk, ck = (a, b) if a in batch_ids else (b, a)
            out.add((bk, ck, round(j, 9)))
    return out


def _probe_set(df):
    return {
        (r["doc_id"], r["match_doc_id"], round(r["est_jaccard"], 9))
        for r in df.collect()
    }


def _mgr(spark, tmp_path, params=None):
    return MinHashBandIndexManager(
        spark, str(tmp_path / "mh_idx"), params or PARAMS
    )


class TestProbeParity:
    def test_probe_equals_batch_pipeline(self, spark, tmp_path, corpus, batch):
        mgr = _mgr(spark, tmp_path)
        mgr.build(corpus, "doc_id", "text")
        got = _probe_set(mgr.probe(batch, "doc_id", "text"))
        want = _batch_pipeline_cross_pairs(corpus, batch)
        assert got == want and len(want) > 0

    def test_self_key_excluded(self, spark, tmp_path, corpus):
        """A key present in both index and batch must not match itself
        (the re-scan-of-already-ingested-rows shape)."""
        mgr = _mgr(spark, tmp_path)
        mgr.build(corpus, "doc_id", "text")
        res = mgr.probe(corpus.filter("doc_id = 1"), "doc_id", "text")
        assert all(r["match_doc_id"] != 1 for r in res.collect())
        # ...but it still matches its planted near-dups
        assert {r["match_doc_id"] for r in res.collect()} >= {2}

    def test_min_jaccard_and_near_dup_keys(
        self, spark, tmp_path, corpus, batch
    ):
        mgr = _mgr(spark, tmp_path)
        mgr.build(corpus, "doc_id", "text")
        all_pairs = _probe_set(mgr.probe(batch, "doc_id", "text"))
        thr = 0.7
        want_keys = {p[0] for p in all_pairs if p[2] >= thr}
        got_keys = {
            r["doc_id"]
            for r in mgr.near_dup_keys(
                batch, "doc_id", "text", min_jaccard=thr
            ).collect()
        }
        assert got_keys == want_keys
        # 101 is a verbatim-ish dup of 1 — must be flagged at 0.7
        assert 101 in got_keys
        # 102 shares nothing — must never appear even unfiltered
        assert 102 not in {p[0] for p in all_pairs}

    def test_within_batch_dup_keys(self, spark, tmp_path, corpus):
        """The in-batch complement: among a batch holding an exact dup
        pair (30, 31) and a novel row, only the larger key of the pair
        is flagged — lowest key survives."""
        mgr = _mgr(spark, tmp_path)
        mgr.build(corpus, "doc_id", "text")
        dup_text = "twin rows sharing every single shingle in the batch"
        batch = spark.createDataFrame(
            [
                (30, dup_text),
                (31, dup_text),
                (32, "a novel row with nothing in common with its peers"),
            ],
            "doc_id long, text string",
        )
        got = {
            r["doc_id"]
            for r in mgr.within_batch_dup_keys(
                batch, "doc_id", "text", min_jaccard=0.7
            ).collect()
        }
        assert got == {31}

    def test_empty_index_probe(self, spark, tmp_path, batch):
        mgr = _mgr(spark, tmp_path)
        mgr.build(
            batch.filter("doc_id < 0"), "doc_id", "text"
        )  # zero rows
        res = mgr.probe(batch, "doc_id", "text")
        assert res.count() == 0
        assert set(res.columns) == {"doc_id", "match_doc_id", "est_jaccard"}


class TestMaintenance:
    def test_add_then_probe_matches_rebuild(
        self, spark, tmp_path, corpus, batch
    ):
        """Incremental adds must leave the index probe-equivalent to a
        one-shot build over the union."""
        inc = _mgr(spark, tmp_path)
        inc.build(corpus.filter("doc_id <= 3"), "doc_id", "text")
        inc.add(corpus.filter("doc_id > 3"), "doc_id", "text")
        full = MinHashBandIndexManager(
            spark, str(tmp_path / "full_idx"), PARAMS
        )
        full.build(corpus, "doc_id", "text")
        got = _probe_set(inc.probe(batch, "doc_id", "text"))
        want = _probe_set(full.probe(batch, "doc_id", "text"))
        assert got == want and len(want) > 0

    def test_upsert_replaces_band_rows(self, spark, tmp_path, corpus):
        """Re-writing doc 2 with unrelated text removes its old matches
        and creates its new ones."""
        mgr = _mgr(spark, tmp_path)
        mgr.build(corpus, "doc_id", "text")
        probe1 = corpus.filter("doc_id = 1")
        assert 2 in {
            r["match_doc_id"]
            for r in mgr.probe(probe1, "doc_id", "text").collect()
        }
        changed = spark.createDataFrame(
            [(2, "completely different text about spark query planning now")],
            "doc_id long, text string",
        )
        mgr.upsert(changed, "doc_id", "text")
        assert 2 not in {
            r["match_doc_id"]
            for r in mgr.probe(probe1, "doc_id", "text").collect()
        }
        probe4 = corpus.filter("doc_id = 4")
        assert 2 in {
            r["match_doc_id"]
            for r in mgr.probe(probe4, "doc_id", "text").collect()
        }

    def test_upsert_to_empty_text_still_tracked(self, spark, tmp_path, corpus):
        """A doc re-written to empty text keeps a signature (the
        whole-text-shingle fallback means EVERY row has one — there is
        no sig-less case), its old near-dup matches disappear, and it
        now matches the corpus's other empty doc (id 6) instead."""
        mgr = _mgr(spark, tmp_path)
        mgr.build(corpus, "doc_id", "text")
        mgr.upsert(
            spark.createDataFrame([(2, "")], "doc_id long, text string"),
            "doc_id",
            "text",
        )
        probe1 = corpus.filter("doc_id = 1")
        assert 2 not in {
            r["match_doc_id"]
            for r in mgr.probe(probe1, "doc_id", "text").collect()
        }
        assert mgr._sigs_ds().read().filter("doc_id = 2").count() == 1
        probe_empty = spark.createDataFrame(
            [(200, "")], "doc_id long, text string"
        )
        assert {2, 6} <= {
            r["match_doc_id"]
            for r in mgr.probe(probe_empty, "doc_id", "text").collect()
        }

    def test_delete_removes_matches(self, spark, tmp_path, corpus):
        """Batch-sized deletes DEFER (tombstones, r11): probes exclude
        the keys immediately, while the physical band/sidecar rows
        leave at the compaction fold — one bucket rewrite per
        compact_every batches instead of one per delete."""
        mgr = _mgr(spark, tmp_path)
        mgr.build(corpus, "doc_id", "text")
        mgr.delete(
            spark.createDataFrame([(2,), (3,)], "doc_id long"), "doc_id"
        )
        res = mgr.probe(corpus.filter("doc_id = 1"), "doc_id", "text")
        assert {r["match_doc_id"] for r in res.collect()} == set()
        # deferred: rows still physical, suppressed by the tombstones
        assert mgr._load_tombstones() == {2, 3}
        idx = spark.read.parquet(mgr.index_dir)
        assert idx.filter("doc_id in (2, 3)").count() > 0
        # the fold applies the physical delete and clears the store
        mgr.maybe_compact(force=True)
        assert mgr._load_tombstones() == set()
        idx = spark.read.parquet(mgr.index_dir)
        assert idx.filter("doc_id in (2, 3)").count() == 0
        assert (
            mgr._sigs_ds().read().filter("doc_id in (2, 3)").count() == 0
        )
        res = mgr.probe(corpus.filter("doc_id = 1"), "doc_id", "text")
        assert {r["match_doc_id"] for r in res.collect()} == set()

    @pytest.mark.slow
    def test_tombstoned_key_reinsert_before_fold(
        self, spark, tmp_path, corpus
    ):
        """The deferral's hardest invariant: a key deleted (tombstoned)
        and re-inserted BEFORE the fold must (a) lose its tombstone,
        (b) have its STALE physical band rows evicted (the sidecar row
        that survived deferral locates them), so only the new text
        matches — on both the local and the Spark upsert path."""
        for path in ("local", "spark"):
            mgr = _mgr(spark, tmp_path / path)
            mgr.build(corpus, "doc_id", "text")
            mgr.delete(
                spark.createDataFrame([(2,)], "doc_id long"), "doc_id"
            )
            assert mgr._load_tombstones() == {2}
            new_text = (
                "entirely new replacement text with zero old overlap"
            )
            re_df = spark.createDataFrame(
                [(2, new_text)], "doc_id long, text string"
            )
            if path == "local":
                mgr.upsert_local(
                    mgr.signatures_local([(2, new_text)]),
                    "doc_id",
                    "bigint",
                )
            else:
                mgr.upsert(re_df, "doc_id", "text")
            assert mgr._load_tombstones() == set()
            # old text must no longer find 2 (stale rows evicted) ...
            old_probe = spark.createDataFrame(
                [(200, corpus.collect()[1]["text"])],
                "doc_id long, text string",
            )
            assert 2 not in {
                r["match_doc_id"]
                for r in mgr.probe(old_probe, "doc_id", "text").collect()
            }
            # ... while the new text does
            new_probe = spark.createDataFrame(
                [(201, new_text)], "doc_id long, text string"
            )
            assert 2 in {
                r["match_doc_id"]
                for r in mgr.probe(new_probe, "doc_id", "text").collect()
            }

    def test_probe_local_excludes_tombstones(
        self, spark, tmp_path, corpus
    ):
        mgr = _mgr(spark, tmp_path)
        mgr.build(corpus, "doc_id", "text")
        probe_rows = [(101, corpus.collect()[0]["text"])]
        sig_rows = mgr.signatures_local(probe_rows)
        before = {
            m
            for _, m, _ in mgr.probe_local(sig_rows, "doc_id", "bigint")
        }
        assert {1, 2, 3} <= before
        mgr.delete(
            spark.createDataFrame([(2,), (3,)], "doc_id long"), "doc_id"
        )
        after = {
            m
            for _, m, _ in mgr.probe_local(sig_rows, "doc_id", "bigint")
        }
        assert after == before - {2, 3}

    def test_delete_all_keys_then_probe_and_refill(
        self, spark, tmp_path, corpus, batch
    ):
        """Deleting every remaining key can empty EVERY band bucket; the
        index dir then holds only underscore metadata, and a subsequent
        probe/compact must take the empty-index path instead of failing
        parquet schema inference (ADVICE r8). A later upsert must bring
        the index back to life."""
        mgr = _mgr(spark, tmp_path)
        mgr.build(corpus, "doc_id", "text")
        mgr.delete(corpus.select("doc_id"), "doc_id")
        # deferred delete: the (full) fold applies the physical removal
        # and flips has_data when it empties every bucket — a cadence
        # slice would take ceil(footprint/fold_bucket_cap) calls, so a
        # delete-everything teardown uses the maintain() knob
        mgr.maybe_compact(force=True, full_fold=True)
        assert mgr._load_meta()["has_data"] is False
        # probe + near_dup_keys + compact on the emptied index: no crash
        assert mgr.probe(batch, "doc_id", "text").count() == 0
        assert (
            mgr.near_dup_keys(batch, "doc_id", "text", min_jaccard=0.5)
            .count()
            == 0
        )
        assert mgr.maybe_compact(force=True) == 0
        # refill via upsert: index serves again
        mgr.upsert(corpus, "doc_id", "text")
        assert mgr._load_meta()["has_data"] is True
        got = _probe_set(mgr.probe(batch, "doc_id", "text"))
        assert got == _batch_pipeline_cross_pairs(corpus, batch)

    def test_meta_param_guard(self, spark, tmp_path, corpus):
        mgr = _mgr(spark, tmp_path)
        mgr.build(corpus, "doc_id", "text")
        other = MinHashBandIndexManager(
            spark,
            str(tmp_path / "mh_idx"),
            {**PARAMS, "band_buckets": 32},
        )
        with pytest.raises(ValueError, match="band_buckets"):
            other.add(corpus.limit(1), "doc_id", "text")

    def test_pkey_guard(self, spark, tmp_path, corpus):
        mgr = _mgr(spark, tmp_path)
        mgr.build(corpus, "doc_id", "text")
        with pytest.raises(ValueError, match="keyed on"):
            mgr.probe(
                corpus.withColumnRenamed("doc_id", "other_id"),
                "other_id",
                "text",
            )


class TestEngineDedupFilter:
    """Jobs created with ``dedup_params`` skip NEW near-dup rows on
    every ingest path and keep the band index fresh/cascaded, without
    touching jobs that didn't opt in."""

    SRC_ROWS = [
        (1, "the quick brown fox jumps over the lazy dog near the river"),
        (2, "completely different text about spark query planning today"),
        (3, "an unrelated essay on distributed systems and consensus"),
    ]

    def _mk_job(self, spark, tmp_path, dedup=True):
        from pg_vectorize_spark.engine import VectorizeSession

        src = str(tmp_path / "src.parquet")
        spark.createDataFrame(
            self.SRC_ROWS, "id long, content string"
        ).write.mode("overwrite").parquet(src)
        sess = VectorizeSession(spark, workspace=str(tmp_path / "ws"))
        sess.create_job(
            "dj",
            src,
            columns=["content"],
            primary_key="id",
            dedup_params=(
                {"min_jaccard": 0.6, **PARAMS} if dedup else None
            ),
        )
        return sess, src

    def _emb_ids(self, sess):
        return {
            r["id"] for r in sess._emb_ds("dj").read().select("id").collect()
        }

    def test_initial_load_builds_index_and_ingests_all(
        self, spark, tmp_path
    ):
        sess, _ = self._mk_job(spark, tmp_path)
        job = sess.catalog.get("dj")
        assert sess._dedup_mgr(job).exists()
        assert self._emb_ids(sess) == {1, 2, 3}

    def test_new_near_dup_filtered_novel_ingested(self, spark, tmp_path):
        sess, src = self._mk_job(spark, tmp_path)
        extra = [
            # 10 near-duplicates doc 1; 11 is novel
            (10, "the quick brown fox jumps over the lazy dog near a river"),
            (11, "a brand new subject entirely unrelated to previous rows"),
        ]
        spark.createDataFrame(
            self.SRC_ROWS + extra, "id long, content string"
        ).write.mode("overwrite").parquet(src)
        sess.scan_job("dj")
        ids = self._emb_ids(sess)
        assert 11 in ids and 10 not in ids
        # tokens snapshot mirrors the filter (no searchable ghost rows)
        tok_ids = {
            r["id"] for r in sess._tok_ds("dj").read().select("id").collect()
        }
        assert 11 in tok_ids and 10 not in tok_ids
        # the survivor joined the band index; the filtered row didn't
        idx = spark.read.parquet(
            sess._dedup_mgr(sess.catalog.get("dj")).index_dir
        )
        assert idx.filter("id = 11").count() > 0
        assert idx.filter("id = 10").count() == 0

    def test_existing_key_update_always_lands(self, spark, tmp_path):
        """An update that converges on another doc must still apply —
        only NEW keys are filtered."""
        sess, src = self._mk_job(spark, tmp_path)
        rewritten = [
            (1, self.SRC_ROWS[0][1]),
            # doc 2 becomes a near-dup of doc 3
            (2, "an unrelated essay on distributed systems and paxos"),
            (3, self.SRC_ROWS[2][1]),
        ]
        spark.createDataFrame(
            rewritten, "id long, content string"
        ).write.mode("overwrite").parquet(src)
        sess.handle_update("dj", [2])
        # the update landed in embeddings AND refreshed the signature:
        # probing doc 2's new text finds doc 3 as its near-dup
        job = sess.catalog.get("dj")
        mgr = sess._dedup_mgr(job)
        probe = spark.createDataFrame(
            [(200, rewritten[1][1])], "id long, content string"
        ).selectExpr("id", "content as _dedup_text")
        matches = {
            r["match_id"]
            for r in mgr.probe(probe, "id", "_dedup_text").collect()
        }
        assert {2, 3} <= matches

    def test_delete_cascades_to_dedup_index(self, spark, tmp_path):
        sess, src = self._mk_job(spark, tmp_path)
        spark.createDataFrame(
            self.SRC_ROWS[:2], "id long, content string"
        ).write.mode("overwrite").parquet(src)
        sess.scan_job("dj")
        assert self._emb_ids(sess) == {1, 2}
        mgr = sess._dedup_mgr(sess.catalog.get("dj"))
        # the cascade defers batch-sized deletes (tombstones, r11):
        # logically gone at once — no probe can match id=3 ...
        assert 3 in mgr._load_tombstones()
        probe = spark.createDataFrame(
            [(300, self.SRC_ROWS[2][1])], "id long, content string"
        ).selectExpr("id", "content as _dedup_text")
        assert 3 not in {
            r["match_id"]
            for r in mgr.probe(probe, "id", "_dedup_text").collect()
        }
        # ... and physically gone at the compaction fold
        mgr.maybe_compact(force=True)
        idx = spark.read.parquet(mgr.index_dir)
        assert idx.filter("id = 3").count() == 0
        assert mgr._sigs_ds().read().filter("id = 3").count() == 0

    def test_bootstrap_over_populated_snapshot_rebuilds_from_source(
        self, spark, tmp_path
    ):
        """Index lost after the corpus was ingested (crash between the
        embeddings merge and the first build): the bootstrap now
        REBUILDS from source∩snapshot automatically (VERDICT r9 #4), so
        the older keys are covered — a later near-dup of a pre-crash
        doc is filtered, not silently ingested."""
        import shutil
        import warnings

        sess, src = self._mk_job(spark, tmp_path)
        mgr = sess._dedup_mgr(sess.catalog.get("dj"))
        shutil.rmtree(mgr.index_dir, ignore_errors=True)
        assert not mgr.exists()
        extra = self.SRC_ROWS + [
            (20, "a brand new subject entirely unrelated to previous rows"),
        ]
        spark.createDataFrame(
            extra, "id long, content string"
        ).write.mode("overwrite").parquet(src)
        with warnings.catch_warnings():
            warnings.simplefilter("error")  # the gap must NOT warn now
            sess.scan_job("dj")
        mgr = sess._dedup_mgr(sess.catalog.get("dj"))
        assert mgr.exists()
        # pre-crash keys are back in the rebuilt index
        idx = spark.read.parquet(mgr.index_dir)
        assert idx.filter("id = 1").count() > 0
        # ...so a near-dup of a PRE-CRASH doc is filtered on the next scan
        spark.createDataFrame(
            extra
            + [(30, "the quick brown fox jumps over the lazy dog by a river")],
            "id long, content string",
        ).write.mode("overwrite").parquet(src)
        sess.scan_job("dj")
        assert 30 not in self._emb_ids(sess)

    def test_enable_dedup_on_populated_job_covers_old_docs(
        self, spark, tmp_path
    ):
        """dedup_params enabled AFTER ingest (the VERDICT r9 #4 'done'
        bar): the first dedup-aware scan rebuilds the index from the
        full source corpus, so a near-dup of a PRE-ENABLEMENT document
        is filtered."""
        from pg_vectorize_spark.engine import VectorizeSession

        src = str(tmp_path / "late_src.parquet")
        spark.createDataFrame(
            self.SRC_ROWS, "id long, content string"
        ).write.parquet(src)
        sess = VectorizeSession(spark, workspace=str(tmp_path / "late_ws"))
        sess.create_job(
            "dj", src, columns=["content"], primary_key="id"
        )  # NO dedup_params: plain populated job
        assert self._emb_ids(sess) == {1, 2, 3}
        # enable dedup on the populated job
        job = sess.catalog.get("dj")
        job.dedup_params = {"min_jaccard": 0.6, **PARAMS}
        sess.catalog.create(job, replace=True)
        spark.createDataFrame(
            self.SRC_ROWS
            + [
                # near-dup of PRE-ENABLEMENT doc 1 + a novel doc
                (40, "the quick brown fox jumps over the lazy dog at dawn"),
                (41, "completely novel text about columnar shuffle services"),
            ],
            "id long, content string",
        ).write.mode("overwrite").parquet(src)
        sess.scan_job("dj")
        ids = self._emb_ids(sess)
        assert 41 in ids and 40 not in ids

    def test_bootstrap_gap_warns_only_when_source_gone(
        self, spark, tmp_path
    ):
        """The batch-only-coverage warning survives exactly for the case
        a rebuild cannot fix: the source table is unreadable."""
        import shutil

        sess, src = self._mk_job(spark, tmp_path)
        job = sess.catalog.get("dj")
        mgr = sess._dedup_mgr(job)
        shutil.rmtree(mgr.index_dir, ignore_errors=True)
        batch = spark.createDataFrame(
            [(50, "some fresh batch row text")], "id long, content string"
        )
        shutil.rmtree(src, ignore_errors=True)  # source gone
        with pytest.warns(UserWarning, match="only cover documents"):
            sess._dedup_upsert(job, batch)
        assert sess._dedup_mgr(job).exists()

    def test_within_batch_filters_initial_load(self, spark, tmp_path):
        """dedup_params={'within_batch': True}: the INITIAL load already
        drops in-batch exact dups (lowest key survives) — the regime the
        index probe can't cover because nothing is indexed yet."""
        from pg_vectorize_spark.engine import VectorizeSession

        dup = "identical crawl page fetched twice under different ids"
        src = str(tmp_path / "wb_src.parquet")
        spark.createDataFrame(
            [(1, dup), (2, dup), (3, "something else entirely unrelated")],
            "id long, content string",
        ).write.parquet(src)
        sess = VectorizeSession(spark, workspace=str(tmp_path / "wb_ws"))
        sess.create_job(
            "wb",
            src,
            columns=["content"],
            primary_key="id",
            dedup_params={"min_jaccard": 0.7, "within_batch": True, **PARAMS},
        )
        ids = {
            r["id"] for r in sess._emb_ds("wb").read().select("id").collect()
        }
        assert ids == {1, 3}
        # the survivor (not the dropped twin) joined the band index
        idx = spark.read.parquet(
            sess._dedup_mgr(sess.catalog.get("wb")).index_dir
        )
        assert idx.filter("id = 1").count() > 0
        assert idx.filter("id = 2").count() == 0

    def test_within_batch_and_corpus_filters_compose(self, spark, tmp_path):
        """A later scan batch drops BOTH the corpus near-dup and the
        in-batch twin; the novel row lands."""
        from pg_vectorize_spark.engine import VectorizeSession

        src = str(tmp_path / "wc_src.parquet")
        spark.createDataFrame(
            self.SRC_ROWS, "id long, content string"
        ).write.parquet(src)
        sess = VectorizeSession(spark, workspace=str(tmp_path / "wc_ws"))
        sess.create_job(
            "wc",
            src,
            columns=["content"],
            primary_key="id",
            dedup_params={"min_jaccard": 0.7, "within_batch": True, **PARAMS},
        )
        twin = "a freshly crawled page duplicated within one batch"
        extra = [
            (40, self.SRC_ROWS[0][1]),  # exact dup of ingested doc 1
            (41, twin),
            (42, twin),
            (43, "and one genuinely new document about catalysts"),
        ]
        spark.createDataFrame(
            self.SRC_ROWS + extra, "id long, content string"
        ).write.mode("overwrite").parquet(src)
        sess.scan_job("wc")
        ids = {
            r["id"] for r in sess._emb_ds("wc").read().select("id").collect()
        }
        assert 43 in ids and 41 in ids
        assert 40 not in ids and 42 not in ids

    def test_opt_out_job_has_no_manager(self, spark, tmp_path):
        sess, _ = self._mk_job(spark, tmp_path, dedup=False)
        assert sess._dedup_mgr(sess.catalog.get("dj")) is None

    def test_delete_job_drops_dedup_index(self, spark, tmp_path):
        import os

        sess, _ = self._mk_job(spark, tmp_path)
        ddir = sess._job_dir("dj", "dedup_index")
        assert os.path.isdir(ddir)
        sess.delete_job("dj")
        assert not os.path.isdir(ddir)

    def test_streaming_batch_filters_near_dups(self, spark, tmp_path):
        """The realtime micro-batch path runs the same filter: a batch
        containing a near-dup of an ingested doc drops it before any
        derived dataset sees it."""
        from pg_vectorize_spark.streaming.incremental import (
            RealtimePipeline,
        )

        sess, _ = self._mk_job(spark, tmp_path)
        feed = str(tmp_path / "feed")
        batch = [
            # exact text of ingested doc 1: every band agrees, so the
            # flag is deterministic (a one-word edit may leave no fully-
            # agreeing band at 4x4 banding — that recall tradeoff is the
            # operator's documented semantics, not the filter's)
            (20, self.SRC_ROWS[0][1]),
            (21, "genuinely novel streaming content about watermarks"),
        ]
        spark.createDataFrame(
            batch, "id long, content string"
        ).coalesce(1).write.mode("append").parquet(feed)
        pipe = RealtimePipeline(sess, "dj", max_files_per_trigger=1)
        q = pipe.start(source_dir=feed, available_now=True)
        q.awaitTermination(120)
        ids = self._emb_ids(sess)
        assert 21 in ids and 20 not in ids
        idx = spark.read.parquet(
            sess._dedup_mgr(sess.catalog.get("dj")).index_dir
        )
        assert idx.filter("id = 21").count() > 0
        assert idx.filter("id = 20").count() == 0


class TestProbePlan:
    @staticmethod
    def _fmt(spark, df):
        return df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )

    def test_candidate_scan_partition_prunes(
        self, spark, tmp_path, corpus, batch
    ):
        """The candidate stage's index scan must prune at the parquet
        source (PartitionFilters on bb) — the plan that touches |batch
        band buckets| of the corpus at 100 TB. Locked on the LAZY
        _candidate_pairs frame: probe() materializes it (via the
        sidecar bucket collect), so the scan is invisible in the final
        plan."""
        mgr = _mgr(spark, tmp_path)
        mgr.build(corpus, "doc_id", "text")
        sigs = mgr.signatures(batch, "doc_id", "text")
        cand = mgr._candidate_pairs(sigs, "doc_id", "match_doc_id")
        plan = self._fmt(spark, cand)
        assert re.search(r"PartitionFilters: \[[^\]]*bb", plan), plan

    def test_probe_sidecar_partition_prunes(
        self, spark, tmp_path, corpus, batch
    ):
        """The signature-compare stage reads the BUCKETED sidecar
        pruned to the candidates' key buckets (PartitionFilters on
        _kb in the returned plan) — a probe against a 100-TB corpus
        must not scan the whole signature table."""
        mgr = _mgr(spark, tmp_path)
        mgr.build(corpus, "doc_id", "text")
        df = mgr.probe(batch, "doc_id", "text")
        plan = self._fmt(spark, df)
        assert re.search(r"PartitionFilters: \[[^\]]*_kb", plan), plan

    def test_probe_construction_job_count(
        self, spark, tmp_path, corpus, batch
    ):
        """probe()'s checkpoints are LAZY (r13 optimization round): the
        signature/band-row/candidate materializations fuse into the two
        driver collects the probe already pays (band-bucket list, then
        sidecar key-bucket list) instead of each running a dedicated
        synchronous job first. On this fixture the lazy form constructs
        in 9 jobs where the eager form took 12 — pin a bound that a
        regression to eager checkpoints (back to +3 jobs) would break.
        The result itself is pinned bit-identical by TestProbeParity."""
        mgr = _mgr(spark, tmp_path)
        mgr.build(corpus, "doc_id", "text")
        tracker = spark.sparkContext.statusTracker()
        mgr.probe(batch, "doc_id", "text").collect()  # warm caches
        before = set(tracker.getJobIdsForGroup(None) or [])
        mgr.probe(batch, "doc_id", "text")
        after = set(tracker.getJobIdsForGroup(None) or [])
        assert len(after - before) <= 10, (
            f"probe() construction launched {len(after - before)} jobs "
            "— expected <= 10 (lazy-fused checkpoints measure 9; the "
            "eager form measured 12)"
        )


class TestSigsBucketsDerivation:
    """The bytes-per-bucket rule encoded (VERDICT r9 #7): bucket count
    stays at the measured-optimal floor for everything local-scale and
    grows linearly only once a bucket would exceed the ~GB rewrite
    unit."""

    def test_floor_holds_through_the_measured_regimes(self):
        from pg_vectorize_spark.dedup_index import MinHashBandIndexManager

        d = MinHashBandIndexManager.derive_sigs_buckets
        # sf1.0 (50k), sf10 (500k), and far beyond all stay at 64 —
        # raising earlier measured 2-4x worse (SCALING.md)
        assert d(50_000) == 64
        assert d(500_000) == 64
        assert d(100_000_000) == 64

    def test_grows_linearly_at_the_rewrite_unit(self):
        from pg_vectorize_spark.dedup_index import MinHashBandIndexManager

        d = MinHashBandIndexManager.derive_sigs_buckets
        row = 16 * 8 + 24
        keys_per_bucket = (1 << 30) // row
        assert d(keys_per_bucket * 64) == 64
        assert d(keys_per_bucket * 200) in (200, 201)
        # 100-TB-ish corpus (1e11 keys): thousands of buckets, bounded
        assert 9000 < d(100_000_000_000) < 15000

    def test_build_derives_and_reopen_adopts(self, spark, tmp_path):
        """Default-config build applies the rule (floor at local scale,
        so the meta matches today's 64); reopening an index whose
        stored count differs ADOPTS it when the caller didn't pin one,
        and still refuses an explicit mismatch."""
        from pg_vectorize_spark.dedup_index import MinHashBandIndexManager

        df = spark.createDataFrame(
            [(i, f"document number {i} with some words") for i in range(20)],
            "doc_id bigint, text string",
        )
        idx = str(tmp_path / "idx")
        built = MinHashBandIndexManager(
            spark, idx, {"num_hashes": 16, "bands": 4, "sigs_buckets": 7}
        )
        built.build(df, "doc_id", "text")
        # non-explicit reopen adopts the stored 7 and probes fine
        reopened = MinHashBandIndexManager(
            spark, idx, {"num_hashes": 16, "bands": 4}
        )
        got = reopened.near_dup_keys_local(
            reopened.signatures_local([(999, "document number 3 with some words")]),
            "doc_id",
            "bigint",
            min_jaccard=0.5,
        )
        assert reopened.sigs_buckets == 7
        assert 999 in got
        # explicit mismatch still refuses mixed-parameter maintenance
        import pytest as _pytest

        wrong = MinHashBandIndexManager(
            spark, idx, {"num_hashes": 16, "bands": 4, "sigs_buckets": 9}
        )
        with _pytest.raises(ValueError, match="sigs_buckets"):
            wrong._check_meta("doc_id")
        # a default-config BUILD derives (floor == 64 at this scale)
        idx2 = str(tmp_path / "idx2")
        fresh = MinHashBandIndexManager(spark, idx2, {"num_hashes": 16, "bands": 4})
        fresh.build(df, "doc_id", "text")
        assert fresh.sigs_buckets == 64
        assert fresh._load_meta()["sigs_buckets"] == 64


class TestLocalReadCap:
    def test_probe_local_same_rows_under_either_read_path(
        self, spark, tmp_path, corpus
    ):
        """The byte-capped driver-local parquet read (r11) must be
        invisible: forcing the cap to 0 (Spark-scan fallback) yields
        bit-identical probe rows, including after a deferred delete."""
        mgr = _mgr(spark, tmp_path)
        mgr.build(corpus, "doc_id", "text")
        mgr.delete(
            spark.createDataFrame([(3,)], "doc_id long"), "doc_id"
        )
        sig_rows = mgr.signatures_local(
            [(101, corpus.collect()[0]["text"])]
        )
        fast = sorted(mgr.probe_local(sig_rows, "doc_id", "bigint"))
        try:
            mgr.LOCAL_READ_CAP_BYTES = 0
            slow = sorted(mgr.probe_local(sig_rows, "doc_id", "bigint"))
        finally:
            del mgr.LOCAL_READ_CAP_BYTES
        assert fast == slow and fast
        assert all(m != 3 for _, m, _ in fast)

    def test_tombstoned_unindexed_key_reinsert_spark_path(
        self, spark, tmp_path, corpus
    ):
        """Review r11: a delete cascade may tombstone a key that never
        entered the index (filtered before ingest). Re-inserting it via
        the SPARK upsert path must clear the tombstone even though no
        sidecar row exists — otherwise the key stays probe-invisible
        and the next fold physically deletes its fresh rows."""
        mgr = _mgr(spark, tmp_path)
        mgr.build(corpus, "doc_id", "text")
        # key 999 was never indexed; the cascade tombstones it anyway
        mgr.delete_local([999], "doc_id", "bigint")
        assert 999 in mgr._load_tombstones()
        text = "a brand new document about tombstone regression tests"
        mgr.upsert(
            spark.createDataFrame(
                [(999, text)], "doc_id long, text string"
            ),
            "doc_id",
            "text",
        )
        assert 999 not in mgr._load_tombstones()
        probe = spark.createDataFrame(
            [(500, text)], "doc_id long, text string"
        )
        assert 999 in {
            r["match_doc_id"]
            for r in mgr.probe(probe, "doc_id", "text").collect()
        }
        # and the fold must NOT remove its rows
        mgr.maybe_compact(force=True)
        assert 999 in {
            r["match_doc_id"]
            for r in mgr.probe(probe, "doc_id", "text").collect()
        }

    def test_tombstones_cleared_when_index_empties(
        self, spark, tmp_path, corpus
    ):
        """Review r11: an emptied index (oversized eager delete) must
        not keep orphaned tombstones that would shadow a refill."""
        mgr = _mgr(spark, tmp_path)
        mgr.build(corpus, "doc_id", "text")
        mgr.delete_local([1, 2], "doc_id", "bigint")
        # oversized-path eager delete of everything
        cap = mgr.TOMB_BATCH_CAP
        try:
            mgr.TOMB_BATCH_CAP = -1  # force the eager path
            mgr.delete(corpus.select("doc_id"), "doc_id")
        finally:
            mgr.TOMB_BATCH_CAP = cap
        assert mgr._load_meta()["has_data"] is False
        assert mgr._load_tombstones() == set()
        # refill: previously-tombstoned keys serve again
        mgr.upsert(corpus, "doc_id", "text")
        probe = corpus.filter("doc_id = 1")
        assert 2 in {
            r["match_doc_id"]
            for r in mgr.probe(probe, "doc_id", "text").collect()
        }

    def test_engine_maintain_folds_tombstones(self, spark, tmp_path):
        """VectorizeSession.maintain() (the VACUUM analog / off-peak
        fold knob): deferred band-index deletes fold physically and the
        tombstone store clears."""
        from pg_vectorize_spark.engine import VectorizeSession

        rows = [
            (i, f"document number {i} about maintenance and folding")
            for i in range(6)
        ]
        src = str(tmp_path / "m_src")
        spark.createDataFrame(
            rows, "id long, content string"
        ).write.parquet(src)
        sess = VectorizeSession(spark, workspace=str(tmp_path / "m_ws"))
        sess.create_job(
            "mj", src, columns=["content"], primary_key="id",
            dedup_params={"min_jaccard": 0.7},
        )
        job = sess.catalog.get("mj")
        mgr = sess._dedup_mgr(job)
        sess._dedup_delete(
            job, spark.createDataFrame([(1,), (2,)], "id long")
        )
        assert mgr._load_tombstones() == {1, 2}
        out = sess.maintain("mj")
        assert out["job_name"] == "mj" and "band_index" in out
        assert mgr._load_tombstones() == set()
        idx = spark.read.parquet(mgr.index_dir)
        assert idx.filter("id in (1, 2)").count() == 0


@pytest.mark.slow
class TestDeferralEquivalence:
    def test_probe_with_tombstones_equals_eager_delete(
        self, spark, tmp_path, corpus, batch
    ):
        """The deferral's external contract: an index with PENDING
        tombstones must be probe-indistinguishable (both paths, exact
        est values) from a twin whose deletes were applied eagerly —
        for every delete subset of the planted near-dup corpus."""
        import itertools
        import shutil

        base = _mgr(spark, tmp_path / "base")
        base.build(corpus, "doc_id", "text")
        batch_rows = [(r["doc_id"], r["text"]) for r in batch.collect()]
        for i, subset in enumerate(
            [(2,), (1, 3), (2, 3, 4), (1, 2, 3, 4, 5, 6, 7)]
        ):
            # deferred twin
            d_dir = str(tmp_path / f"d{i}")
            shutil.copytree(base.index_dir, d_dir)
            deferred = MinHashBandIndexManager(spark, d_dir, PARAMS)
            deferred.delete_local(list(subset), "doc_id", "bigint")
            assert deferred._load_tombstones() == set(subset)
            # eager twin (force past the tombstone escape)
            e_dir = str(tmp_path / f"e{i}")
            shutil.copytree(base.index_dir, e_dir)
            eager = MinHashBandIndexManager(spark, e_dir, PARAMS)
            cap = eager.TOMB_BATCH_CAP
            try:
                eager.TOMB_BATCH_CAP = -1
                eager.delete(
                    spark.createDataFrame(
                        [(k,) for k in subset], "doc_id long"
                    ),
                    "doc_id",
                )
            finally:
                eager.TOMB_BATCH_CAP = cap
            assert eager._load_tombstones() == set()
            if not eager._load_meta().get("has_data", True):
                # full wipe: the deferred twin must also probe empty
                got = deferred.probe(batch, "doc_id", "text").count()
                assert got == 0
                continue
            want = _probe_set(eager.probe(batch, "doc_id", "text"))
            got = _probe_set(deferred.probe(batch, "doc_id", "text"))
            assert got == want, subset
            sig_rows = deferred.signatures_local(batch_rows)
            got_local = {
                (a, b, round(j, 9))
                for a, b, j in deferred.probe_local(
                    sig_rows, "doc_id", "bigint"
                )
            }
            assert got_local == want, subset

    def test_partial_fold_states_probe_equivalent(
        self, spark, tmp_path, corpus, batch
    ):
        """Sliced-fold extension (VERDICT r11 #2): with
        fold_bucket_cap=1, EVERY intermediate fold state — mid-
        generation, generation boundary, fully folded — must stay
        probe-indistinguishable (both paths) from the eager twin, and
        the fold must converge to zero pending tombstones."""
        import shutil

        params = dict(PARAMS, fold_bucket_cap=1)
        base = _mgr(spark, tmp_path / "base", params)
        base.build(corpus, "doc_id", "text")
        subset = (1, 3, 4)
        # eager twin (force past the tombstone escape)
        e_dir = str(tmp_path / "eager")
        shutil.copytree(base.index_dir, e_dir)
        eager = MinHashBandIndexManager(spark, e_dir, params)
        cap = eager.TOMB_BATCH_CAP
        try:
            eager.TOMB_BATCH_CAP = -1
            eager.delete(
                spark.createDataFrame(
                    [(k,) for k in subset], "doc_id long"
                ),
                "doc_id",
            )
        finally:
            eager.TOMB_BATCH_CAP = cap
        want = _probe_set(eager.probe(batch, "doc_id", "text"))
        batch_rows = [(r["doc_id"], r["text"]) for r in batch.collect()]

        deferred = base
        deferred.delete_local(list(subset), "doc_id", "bigint")
        assert deferred._load_tombstones() == set(subset)
        seen_states = 0
        for _ in range(80):  # hard stop far above any real fold length
            if not deferred._load_tombstones():
                break
            deferred.maybe_compact(force=True)  # one cap-bounded slice
            st = deferred._load_tomb_state()
            assert st["gen_keys"] <= st["keys"]
            got = _probe_set(deferred.probe(batch, "doc_id", "text"))
            assert got == want, f"spark probe diverged at state {st}"
            sig_rows = deferred.signatures_local(batch_rows)
            got_local = {
                (a, b, round(j, 9))
                for a, b, j in deferred.probe_local(
                    sig_rows, "doc_id", "bigint"
                )
            }
            assert got_local == want, f"local probe diverged at {st}"
            seen_states += 1
        assert deferred._load_tombstones() == set()
        assert seen_states >= 2  # cap=1 must take multiple slices
        # fully folded store equals the eager twin physically too:
        # sidecar rows for the folded keys are gone
        sigs = deferred._sidecar_sigs_for_keys_local(
            sorted(subset), "doc_id", "bigint"
        )
        assert sigs == {}
        # fold observability landed in the maint state
        import json as _json

        with open(deferred._maint_path) as f:
            lf = _json.load(f)["last_fold"]
        assert lf["buckets_rewritten"] >= 1
        assert lf["pending_keys"] == 0

    def test_reinsert_mid_generation_survives_fold(
        self, spark, tmp_path, corpus, batch
    ):
        """A key re-inserted while its generation is mid-fold must (a)
        leave the tombstone set AND the generation, (b) keep its fresh
        rows through the remaining slices, and (c) the store must still
        converge to zero pending."""
        params = dict(PARAMS, fold_bucket_cap=1)
        mgr = _mgr(spark, tmp_path, params)
        mgr.build(corpus, "doc_id", "text")
        mgr.delete_local([1, 2, 4], "doc_id", "bigint")
        # advance ONE slice — generation now in flight
        mgr.maybe_compact(force=True)
        st = mgr._load_tomb_state()
        assert st["gen_remaining"] is not None
        # re-insert key 1 with text near-duplicating the batch's 101
        re_rows = [
            (1, "the quick brown fox jumps over the lazy dog near the river")
        ]
        mgr.upsert_local(
            mgr.signatures_local(re_rows),
            "doc_id",
            "bigint",
            prior_keys=frozenset([1]),
        )
        assert 1 not in mgr._load_tombstones()
        assert 1 not in mgr._load_tomb_state()["gen_keys"]
        # fold to completion
        for _ in range(80):
            if not mgr._load_tombstones():
                break
            mgr.maybe_compact(force=True)
        assert mgr._load_tombstones() == set()
        # 101 must still match the re-inserted key 1 (fresh rows kept);
        # 2 and 4 must not match anything (folded away)
        got = _probe_set(mgr.probe(batch, "doc_id", "text"))
        assert (101, 1, 1.0) in got
        assert not any(m in (2, 4) for _, m, _ in got)

    def test_full_fold_clears_mid_generation_state(
        self, spark, tmp_path, corpus, batch
    ):
        """maintain()'s full_fold=True must finish an in-flight
        generation AND everything tombstoned after it, in one call."""
        params = dict(PARAMS, fold_bucket_cap=1)
        mgr = _mgr(spark, tmp_path, params)
        mgr.build(corpus, "doc_id", "text")
        mgr.delete_local([1, 2], "doc_id", "bigint")
        mgr.maybe_compact(force=True)  # one slice: gen in flight
        mgr.delete_local([4], "doc_id", "bigint")  # arrives mid-gen
        mgr.maybe_compact(force=True, full_fold=True)
        assert mgr._load_tombstones() == set()
        got = _probe_set(mgr.probe(batch, "doc_id", "text"))
        assert not any(m in (1, 2, 4) for _, m, _ in got)
