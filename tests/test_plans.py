"""Physical-plan regression tests: lock in the plan shapes that make the
headline queries scale (SURVEY.md §4's 'iterate on .explain' discipline)."""

from __future__ import annotations

import pytest

from pg_vectorize_spark.plans.inspect import plan_report
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def entrymod():
    import __spark_entry__ as m

    return m


def test_semantic_topk_is_take_ordered_no_sort_no_shuffle(spark, entrymod):
    df = entrymod.queries()["semantic_search_topk"](spark, SF_SMOKE)
    rep = plan_report(df)
    assert rep.has_take_ordered, rep.summary()
    # scoring scan -> broadcast join -> takeOrdered; no shuffle exchange
    assert rep.n_exchanges == 0, rep.text
    assert rep.n_broadcasts >= 1


def test_semantic_topk_prunes_columns(spark, entrymod):
    df = entrymod.queries()["semantic_search_topk"](spark, SF_SMOKE)
    rep = plan_report(df)
    # the scoring scan must read only (vec_id, embedding); never label/text
    assert any(
        "embedding" in s and "label" not in s for s in rep.read_schemas
    ), rep.read_schemas


def test_pushdown_reaches_scan(spark, entrymod):
    df = entrymod.queries()["incremental_scan_events"](spark, SF_SMOKE)
    rep = plan_report(df)
    assert any("EqualTo(event_type,click)" in p for p in rep.pushed_filters), (
        rep.pushed_filters
    )
    assert rep.n_exchanges == 0


def test_hybrid_broadcasts_candidate_join(spark, entrymod):
    df = entrymod.queries()["hybrid_rrf_search"](spark, SF_SMOKE)
    rep = plan_report(df)
    # fused candidate set (<= window rows) must broadcast against the source
    assert rep.n_broadcasts >= 1, rep.summary()
    assert rep.has_take_ordered
    # rank fusion is union + partial-aggregating groupBy, never a
    # sort-merge full-outer join of the two tiny rank lists
    assert "SortMergeJoin" not in rep.text, rep.summary()


def test_embed_documents_is_pure_map(spark, entrymod):
    """The Arrow provider path is a pure map: scan -> mapInPandas ->
    project. The only exchange permitted is the small-input fan-out
    (skew.ensure_min_partitions round-robin), which disappears at scale;
    there must be no key-hash shuffle and no aggregate."""
    df = entrymod.queries()["embed_documents"](spark, SF_SMOKE)
    rep = plan_report(df)
    # n_exchanges counts tree + detail lines: one physical exchange = 2
    assert rep.n_exchanges <= 2, rep.text
    assert "hashpartitioning" not in rep.text.lower(), rep.text
    assert "HashAggregate" not in rep.text, rep.text
    assert "MapInPandas" in rep.text, rep.summary()


def test_embed_exploded_uses_partial_aggregation(spark, entrymod):
    """The JVM fallback path keeps its bounded-shuffle shape: explode ->
    partial HashAggregate -> exchange on (pkey, bucket)."""
    from pg_vectorize_spark.operators.embed import embed_bulk_exploded

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    rep = plan_report(embed_bulk_exploded(docs, "text", "doc_id", 64))
    assert "HashAggregate" in rep.text
    assert rep.n_exchanges <= 4, rep.summary()


def test_ivf_broadcasts_probe_side(spark, entrymod):
    df = entrymod.queries()["ann_ivf_topk"](spark, SF_SMOKE)
    rep = plan_report(df)
    assert rep.n_broadcasts >= 1
    assert rep.has_take_ordered


def test_simhash_pairs_no_cartesian(spark, entrymod):
    """Banded simhash pairs must plan as a hash join on band keys — never
    CartesianProduct / BroadcastNestedLoopJoin (the n² shapes)."""
    df = entrymod.queries()["simhash_neardup_pairs"](spark, SF_SMOKE)
    rep = plan_report(df)
    assert "CartesianProduct" not in rep.text, rep.summary()
    assert "BroadcastNestedLoopJoin" not in rep.text, rep.summary()


def test_cosine_neardup_no_cartesian(spark, entrymod):
    df = entrymod.queries()["dedup_embedding_cosine"](spark, SF_SMOKE)
    rep = plan_report(df)
    assert "CartesianProduct" not in rep.text, rep.summary()
    assert "BroadcastNestedLoopJoin" not in rep.text, rep.summary()


def test_default_centroids_take_ordered_not_global_window(spark):
    from pg_vectorize_spark.operators.ann import default_centroids
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").select(
        "vec_id", F.col("embedding").alias("embeddings")
    )
    df = default_centroids(emb, "vec_id", "embeddings", n_centroids=8)
    rep = plan_report(df)
    # the table-wide scan must reduce via TakeOrdered; the only window runs
    # over the 8-row result
    assert rep.has_take_ordered, rep.summary()


def test_filtered_search_pushes_nothing_extra(spark, entrymod):
    # post-ranking filter placement keeps ranking over ALL rows; the filter
    # may push to the label scan but the embedding scan must stay unfiltered
    df = entrymod.queries()["semantic_search_filtered"](spark, SF_SMOKE)
    rep = plan_report(df)
    emb_scans = [
        (p, s)
        for p, s in zip(rep.pushed_filters, rep.read_schemas)
        if "embedding" in s
    ]
    assert emb_scans, rep.read_schemas
    for pushed, _ in emb_scans:
        assert "label" not in pushed


def test_bm25_literal_stats_no_corpus_shuffle(spark, entrymod):
    """BM25's corpus stats reduce to ONE driver-collected row folded back
    as literals (r4: replaced the broadcast cross join + per-query Arrow
    idf stage that dominated repeat-query latency, BENCH r3). The scoring
    plan must therefore have NO join of any kind, NO Python/Arrow eval
    stage, and a TakeOrdered top-k — the corpus is read once, scored with
    pure JVM expressions."""
    df = entrymod.queries()["fts_bm25"](spark, SF_SMOKE)
    rep = plan_report(df)
    assert rep.has_take_ordered, rep.summary()
    assert "CartesianProduct" not in rep.text
    assert "BroadcastNestedLoopJoin" not in rep.text, rep.summary()
    assert "SortMergeJoin" not in rep.text, rep.summary()
    assert "ArrowEvalPython" not in rep.text, rep.summary()
    assert "BatchEvalPython" not in rep.text, rep.summary()


def test_hash_split_zero_shuffle(spark, entrymod):
    """Split assignment is a pure projection — no exchange anywhere."""
    df = entrymod.queries()["hash_split"](spark, SF_SMOKE)
    rep = plan_report(df)
    assert rep.n_exchanges == 0, rep.text


def test_decontaminate_broadcasts_bench_grams(spark, entrymod):
    """The benchmark gram set broadcasts; the corpus is never cross- or
    self-joined."""
    df = entrymod.queries()["decontaminate"](spark, SF_SMOKE)
    rep = plan_report(df)
    assert rep.n_broadcasts >= 1, rep.summary()
    assert "CartesianProduct" not in rep.text


def test_orphan_cleanup_broadcast_anti_join_no_shuffle(spark, entrymod):
    """The cascade anti-join must be a keyed (here broadcast) anti-join
    with both scans column-pruned — never a shuffle of the derived table's
    payload columns beyond the join itself."""
    df = entrymod.queries()["orphan_cleanup"](spark, SF_SMOKE)
    rep = plan_report(df)
    assert "LeftAnti" in rep.text, rep.summary()
    assert rep.n_exchanges == 0, rep.summary()
    assert rep.n_broadcasts >= 1
    # the source side reads ONLY the key column
    assert any(s == "struct<doc_id:bigint>" for s in rep.read_schemas), (
        rep.read_schemas
    )


def test_multiprobe_lsh_no_shuffle_take_ordered(spark, entrymod):
    """Multi-probe LSH is a scan-filter + exact rescore + TakeOrdered:
    no exchange, no join — the probe set is a literal IN list (which
    partition-prunes when the bucket is a write-time partition key)."""
    df = entrymod.queries()["ann_multiprobe_lsh_topk"](spark, SF_SMOKE)
    rep = plan_report(df)
    assert rep.has_take_ordered, rep.summary()
    assert rep.n_exchanges == 0, rep.summary()


def test_domain_cap_two_phase_windows(spark, entrymod):
    """Skew-safe cap: the plan carries TWO window passes (salted pre-cap,
    then the exact per-domain window) — the second one's input is bounded
    by buckets*cap per domain."""
    df = entrymod.queries()["domain_cap"](spark, SF_SMOKE)
    rep = plan_report(df)
    assert rep.text.count("RunningWindowFunction") >= 2 or (
        rep.text.count("Window") >= 2
    ), rep.summary()


def test_hybrid_bm25_composite_plan(spark, entrymod):
    """VERDICT r4 #6: hybrid_search(rank='bm25') — the BM25 branch's
    literal-folded stats must survive composition with the RRF fusion
    path: no Python/Arrow stage anywhere in the composite plan, fusion
    stays union + hash-agg (no SortMergeJoin of the rank lists), and the
    fused candidate set broadcasts back against the source."""
    df = entrymod.queries()["hybrid_bm25"](spark, SF_SMOKE)
    rep = plan_report(df)
    assert rep.has_take_ordered, rep.summary()
    assert rep.n_broadcasts >= 1, rep.summary()
    assert "SortMergeJoin" not in rep.text, rep.summary()
    assert "ArrowEvalPython" not in rep.text, rep.summary()
    assert "BatchEvalPython" not in rep.text, rep.summary()
    assert "CartesianProduct" not in rep.text, rep.summary()


def test_cdf_apply_keyed_exchanges_only(spark, entrymod):
    """Batch CDF apply: the event-log window and the anti-joins shuffle
    on the pkey only — no cartesian/nested-loop fan-out, no Python
    stage; safe when the event log is change-log-sized at 100 TB."""
    df = entrymod.queries()["cdf_apply"](spark, SF_SMOKE)
    rep = plan_report(df)
    assert "CartesianProduct" not in rep.text, rep.summary()
    assert "BroadcastNestedLoopJoin" not in rep.text, rep.summary()
    assert "ArrowEvalPython" not in rep.text, rep.summary()
    assert "BatchEvalPython" not in rep.text, rep.summary()


def test_bigram_logprob_keyed_shuffles_only(spark, entrymod):
    """Bigram LM scoring: in-row bigram formation (zipped shifted
    slices — no keyed window) + keyed count aggregates + equi scoring
    join; the only broadcast is the one-row vocabulary stats — no
    cartesian/nested-loop fan-out beyond it."""
    df = entrymod.queries()["bigram_logprob"](spark, SF_SMOKE)
    rep = plan_report(df)
    assert "CartesianProduct" not in rep.text, rep.summary()
    # the only nested-loop join is the ONE-ROW vocabulary-size cross
    # (IdentityBroadcastMode build). formatted-explain spells each op
    # twice (tree + details), so count the unique detail headers.
    n_bnlj = rep.text.count(") BroadcastNestedLoopJoin")
    assert n_bnlj <= 1, rep.summary()
    assert "IdentityBroadcastMode" in rep.text, rep.summary()


def test_maxsim_partial_agg_take_ordered(spark, entrymod):
    """Best-chunk retrieval: scan-score + map-side-combined MAX keyed on
    the doc + TakeOrdered; no window, no join."""
    df = entrymod.queries()["maxsim_search_topk"](spark, SF_SMOKE)
    rep = plan_report(df)
    assert rep.has_take_ordered, rep.summary()
    assert "partial_max" in rep.text or "HashAggregate" in rep.text
    assert "SortMergeJoin" not in rep.text, rep.summary()
    assert "CartesianProduct" not in rep.text, rep.summary()


def test_perplexity_buckets_distributed_rank(spark, entrymod):
    """CCNet bucketing: the per-language rank must run per (lang,
    score-range) — a Window partitioned by BOTH keys — never a
    per-language (single-task-per-language) or global window; no
    cartesian fan-out."""
    df = entrymod.queries()["perplexity_buckets"](spark, SF_SMOKE)
    rep = plan_report(df)
    assert "CartesianProduct" not in rep.text, rep.summary()
    # exactly one window, and its partition spec carries the range id
    assert rep.text.count("windowspecdefinition") >= 1
    assert "_rid" in rep.text.split("windowspecdefinition")[1][:80], (
        "rank window lost the score-range partitioning key:\n"
        + rep.summary()
    )
    assert "windowspecdefinition()" not in rep.text, (
        "global (empty-partition) window found:\n" + rep.summary()
    )
