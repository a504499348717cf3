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
    pairs = minhash_lsh_candidates(sigs, bands=4, rows_per_band=4)
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
        mgr = _mgr(spark, tmp_path)
        mgr.build(corpus, "doc_id", "text")
        mgr.delete(
            spark.createDataFrame([(2,), (3,)], "doc_id long"), "doc_id"
        )
        res = mgr.probe(corpus.filter("doc_id = 1"), "doc_id", "text")
        assert {r["match_doc_id"] for r in res.collect()} == set()
        idx = spark.read.parquet(mgr.index_dir)
        assert idx.filter("doc_id in (2, 3)").count() == 0

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


class TestProbePlan:
    def test_probe_partition_prunes(self, spark, tmp_path, corpus, batch):
        """The probe's index scan must prune at the parquet source
        (PartitionFilters on bb) — the plan that touches |batch band
        buckets| of the corpus at 100 TB."""
        mgr = _mgr(spark, tmp_path)
        mgr.build(corpus, "doc_id", "text")
        df = mgr.probe(batch, "doc_id", "text")
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        assert re.search(r"PartitionFilters: \[[^\]]*bb", plan), plan
